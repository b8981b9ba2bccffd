"""Iceberg read-shim probes: build a real v2 metadata tree from the nation
fixture, read it through sources/iceberg.py, oracle the surviving rows with
plain SQL over the same source table.

The table encodes the full v2 merge-on-read story (reference:
plugin/trino-iceberg, iceberg-core DeleteFileIndex semantics):
- seq 1: one data file = all nation rows ordered by n_nationkey;
- seq 2: a position-delete file removing the rows where
  n_nationkey % 5 = 0 (positions are the sorted ranks), plus an
  equality-delete file on n_nationkey IN (7, 19);
- seq 3: a data file re-inserting the n_nationkey = 7 row (CDC upsert) —
  the seq-2 equality delete must NOT touch it.

Survivors: every key with key % 5 <> 0 except 19 (7 survives via the
re-insert), which is exactly SQL-expressible for the oracle.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.queries import probe
from trino_private_spark.sources.iceberg import read_iceberg
from trino_private_spark.sources.iceberg_testing import (
    build_table,
    write_parquet_with_ids,
)

_FIELD_IDS = {
    "n_nationkey": 1, "n_name": 2, "n_regionkey": 3,
}
_POS_DEL_IDS = {"file_path": 2147483546, "pos": 2147483545}


def _build(sf_dir: str) -> str:
    import pyarrow as pa

    loc = tempfile.mkdtemp(prefix="tps_iceberg_")
    src = pq.read_table(os.path.join(sf_dir, "nation.parquet"))
    cols = [c for c in src.column_names if c in _FIELD_IDS]
    src = src.select(cols).sort_by("n_nationkey").combine_chunks()
    keys = src.column("n_nationkey").to_pylist()
    key_type = src.schema.field("n_nationkey").type

    # pass typed arrow arrays through (NOT python lists, which would
    # re-infer int64 and break the driver's schema-parity check)
    d1 = os.path.join(loc, "d1.parquet")
    write_parquet_with_ids(d1, {c: src.column(c) for c in cols}, _FIELD_IDS)

    pd1 = os.path.join(loc, "pd1.parquet")
    hit = [i for i, k in enumerate(keys) if k % 5 == 0]
    write_parquet_with_ids(
        pd1, {"file_path": [d1] * len(hit), "pos": hit}, _POS_DEL_IDS
    )

    ed1 = os.path.join(loc, "ed1.parquet")
    write_parquet_with_ids(
        ed1, {"n_nationkey": pa.array([7, 19], type=key_type)},
        {"n_nationkey": 1},
    )

    d2 = os.path.join(loc, "d2.parquet")
    i7 = keys.index(7)
    write_parquet_with_ids(
        d2, {c: src.column(c).slice(i7, 1) for c in cols}, _FIELD_IDS
    )

    fields = [
        (1, "n_nationkey", "long"), (2, "n_name", "string"),
        (3, "n_regionkey", "long"),
    ]
    build_table(
        loc, fields,
        [
            {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
            {"id": 11, "ts": 2000, "seq": 2, "files": [
                {"path": pd1, "content": 1},
                {"path": ed1, "content": 2, "equality_ids": [1]},
            ]},
            {"id": 12, "ts": 3000, "seq": 3, "files": [{"path": d2}]},
        ],
    )
    return loc


@probe(
    "p_iceberg_read",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_nationkey % 5 <> 0 AND n_nationkey <> 19
    ORDER BY n_nationkey
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Current-snapshot read with sequence-scoped position + equality
    deletes and a CDC re-insert (module docstring has the layout)."""
    loc = _build(sf_dir)
    return read_iceberg(spark, loc).orderBy("n_nationkey")


@probe(
    "p_iceberg_time_travel",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    ORDER BY n_nationkey
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOR TIMESTAMP AS OF before any delete was committed: the full
    seq-1 data file, no delete application (IcebergMetadata.java
    snapshot-log resolution)."""
    loc = _build(sf_dir)
    return read_iceberg(spark, loc, as_of_ms=1500).orderBy("n_nationkey")


@probe(
    "p_iceberg_write_roundtrip",
    oracle="""
    WITH base AS (
      SELECT n_nationkey, n_name, n_regionkey FROM nation
      UNION ALL
      SELECT n_nationkey + 100, n_name, n_regionkey FROM nation
    )
    SELECT n_nationkey, n_name, n_regionkey FROM base
    WHERE n_nationkey % 3 <> 0
    ORDER BY n_nationkey
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_write_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE path round-trip (sources/iceberg_write.py; reference
    IcebergMetadata.java:397 beginCreateTable, :418 beginInsert, :611
    executeDelete): CTAS from nation -> append a shifted copy -> DELETE
    key%3=0 via position-delete files -> read the final snapshot back
    through the shim. Three commits, three metadata versions, real Avro
    manifests; oracle is the same algebra in plain SQL."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg_write import (
        iceberg_append,
        iceberg_create,
        iceberg_delete,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_w_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    iceberg_create(nation, loc)
    iceberg_append(
        nation.withColumn("n_nationkey", F.col("n_nationkey") + 100), loc
    )
    iceberg_delete(spark, loc, "n_nationkey % 3 = 0")
    return read_iceberg(spark, loc).orderBy("n_nationkey")


@probe(
    "p_iceberg_partition_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           1 AS scanned_files, 8 AS candidate_files
    FROM orders WHERE o_custkey % 8 = 3
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_partition_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level partition pruning (reference: split pruning from
    manifest partition data, plugin/trino-iceberg IcebergSplitSource.java;
    specs via PartitionSpecParser). An identity-partitioned CTAS yields one
    data file per partition value; a partition_filter on the read must
    open exactly ONE of the 8 files — the scan-planning counts are part of
    the probed result, so a regression to O(table) scanning hash-fails."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import iceberg_create

    loc = tempfile.mkdtemp(prefix="tps_iceberg_pp_") + "/t"
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", (F.col("o_custkey") % 8).alias("grp"), "o_totalprice"
    )
    iceberg_create(orders, loc, partition_by=["grp"])
    t = IcebergTable(loc)
    out = t.read(spark, partition_filter=[("grp", "=", 3)])
    scan = t.last_scan
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select(
        "n",
        "total",
        F.lit(scan["scanned_data_files"]).alias("scanned_files"),
        F.lit(scan["candidate_data_files"]).alias("candidate_files"),
    )


@probe(
    "p_iceberg_bucket_prune",
    oracle="""
    SELECT n_nationkey, n_name, 1 AS scanned_files
    FROM nation WHERE n_name = 'NATION_7'
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_bucket_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bucket[N] transform pruning: the spec's murmur3_x86_32 bucket
    (verified against Iceberg spec Appendix B vectors) computed by the
    writer must agree with the reader's python-side transform, so an
    equality filter opens exactly one of the N bucket files."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import iceberg_create

    loc = tempfile.mkdtemp(prefix="tps_iceberg_bp_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    iceberg_create(nation, loc, partition_by=[("n_name", "bucket[4]")])
    t = IcebergTable(loc)
    out = t.read(spark, partition_filter=[("n_name", "=", "NATION_7")]).where(
        F.col("n_name") == "NATION_7"
    )
    return out.select(
        "n_nationkey",
        "n_name",
        F.lit(t.last_scan["scanned_data_files"]).alias("scanned_files"),
    )


@probe(
    "p_iceberg_orc",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_regionkey = 2 ORDER BY n_nationkey
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC data files (spec data_file.file_format; the reference
    dispatches per file format in IcebergPageSourceProvider): a
    partitioned ORC CTAS read back through the shim with identity
    pruning."""
    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import iceberg_create

    loc = tempfile.mkdtemp(prefix="tps_iceberg_orc_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    iceberg_create(nation, loc, partition_by=["n_regionkey"], file_format="ORC")
    t = IcebergTable(loc)
    return t.read(spark, partition_filter=[("n_regionkey", "=", 2)]).orderBy(
        "n_nationkey"
    )


@probe(
    "p_iceberg_atomic_update",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN n_nationkey % 5 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_updated,
           2 AS n_snapshots,
           CAST(COUNT(*) AS BIGINT) AS rows_at_v1
    FROM nation
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_atomic_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE as ONE atomic RowDelta snapshot (reference:
    IcebergMetadata finishWrite commits deletes + appends together): after
    create + update there are exactly TWO snapshots, the first still holds
    every original row (no intermediate deleted-but-not-reinserted state
    is ever visible to time travel), and the updated rows are present."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import (
        iceberg_create,
        iceberg_update,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_au_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    iceberg_create(nation, loc)
    iceberg_update(
        spark, loc, {"n_regionkey": "99"}, "n_nationkey % 5 = 0"
    )
    t = IcebergTable(loc)
    snaps = t.snapshots()
    cur = t.read(spark)
    v1_rows = t.read(spark, snapshot_id=snaps[0]["snapshot-id"]).count()
    return cur.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("n_regionkey") == 99).cast("long")).alias("n_updated"),
    ).select(
        "n_rows",
        "n_updated",
        F.lit(len(snaps)).alias("n_snapshots"),
        F.lit(v1_rows).cast("long").alias("rows_at_v1"),
    )


@probe(
    "p_iceberg_write_time_travel",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    ORDER BY n_nationkey
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_write_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot isolation across the writer's own commits: after append +
    delete, FOR VERSION AS OF the first commit still reads the original
    CTAS contents (metadata versions v1..v3 all on disk)."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import (
        iceberg_append,
        iceberg_create,
        iceberg_delete,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_tt_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    iceberg_create(nation, loc)
    iceberg_append(
        nation.withColumn("n_nationkey", F.col("n_nationkey") + 100), loc
    )
    iceberg_delete(spark, loc, "n_nationkey % 3 = 0")
    first = IcebergTable(loc).snapshots()[0]["snapshot-id"]
    return read_iceberg(spark, loc, snapshot_id=first).orderBy("n_nationkey")


@probe(
    "p_iceberg_partitions_table",
    oracle="""
    SELECT '{"n_regionkey": ' || CAST(n_regionkey AS VARCHAR) || '}'
               AS partition,
           CAST(1 AS BIGINT) AS file_count,
           CAST(COUNT(*) AS BIGINT) AS record_count
    FROM nation GROUP BY n_regionkey ORDER BY partition
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_partitions_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The $partitions metadata table (reference: plugin/trino-iceberg
    PartitionTable): per-partition file/record counts straight from the
    manifests — no data file is opened. One file per partition by
    construction (the writer repartitions on the tuple), so file_count=1
    pins the one-partition-per-file invariant in the hash."""
    from trino_private_spark.sources.iceberg import read_iceberg
    from trino_private_spark.sources.iceberg_write import iceberg_create

    loc = tempfile.mkdtemp(prefix="tps_iceberg_pt_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    iceberg_create(nation, loc, partition_by=["n_regionkey"])
    return (
        read_iceberg(spark, loc + "$partitions")
        .select("partition", "file_count", "record_count")
        .orderBy("partition")
    )


@probe(
    "p_iceberg_where_prune",
    oracle="""
    SELECT n_nationkey, n_name, 1 AS scanned_files
    FROM nation WHERE n_regionkey = 2 AND n_nationkey >= 5
    ORDER BY n_nationkey
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_where_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE-string reads (read_iceberg(where=...)): prunable conjunctive
    terms derive the partition filter (the reference's enforced/residual
    predicate split), the full predicate still applies row-level, and the
    scan opens exactly one of the five region files — the scanned count
    rides in the hashed result."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IO_SCAN_INFO, read_iceberg
    from trino_private_spark.sources.iceberg_write import iceberg_create

    loc = tempfile.mkdtemp(prefix="tps_iceberg_wp_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    iceberg_create(nation, loc, partition_by=["n_regionkey"])
    out = read_iceberg(
        spark, loc, where="n_regionkey = 2 AND n_nationkey >= 5"
    )
    scanned = IO_SCAN_INFO[loc]["scanned_data_files"]
    return out.select(
        "n_nationkey",
        "n_name",
        F.lit(scanned).alias("scanned_files"),
    ).orderBy("n_nationkey")


@probe(
    "p_iceberg_snapshots_table",
    oracle="""
    SELECT * FROM (VALUES (1, 'append', CAST(1 AS BIGINT)),
                          (2, 'append', CAST(2 AS BIGINT)),
                          (3, 'delete', CAST(3 AS BIGINT)))
        AS t(snapshot_id, operation, sequence_number)
    ORDER BY snapshot_id
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_snapshots_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The $snapshots metadata table (SnapshotsTable analogue): the
    commit history of create -> append -> delete with operations and
    sequence numbers, read from the snapshot log alone."""
    from pyspark.sql import functions as _F

    from trino_private_spark.sources.iceberg import read_iceberg
    from trino_private_spark.sources.iceberg_write import (
        iceberg_append,
        iceberg_create,
        iceberg_delete,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_st_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    iceberg_create(nation, loc)
    iceberg_append(
        nation.withColumn("n_nationkey", nation.n_nationkey + 100), loc
    )
    iceberg_delete(spark, loc, "n_nationkey % 7 = 0")
    return (
        read_iceberg(spark, loc + "$snapshots")
        .select(
            _F.col("snapshot_id").cast("int").alias("snapshot_id"),
            "operation",
            "sequence_number",
        )
        .orderBy("snapshot_id")
    )


@probe(
    "p_iceberg_schema_evolution",
    oracle="""
    SELECT n_nationkey, nation_name, note FROM (
      SELECT n_nationkey, n_name AS nation_name, CAST(NULL AS VARCHAR) AS note
      FROM nation
      UNION ALL
      SELECT n_nationkey + 1000, n_name, 'post' FROM nation
    ) ORDER BY n_nationkey
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution read (reference: IcebergPageSourceProvider
    resolves column handles BY FIELD ID per file): create -> ALTER ADD
    COLUMN note + RENAME n_name -> nation_name -> append post-evolution
    rows. Files written before the ALTER lack the new column (null-filled
    by id projection) and carry the old name for the renamed one (selected
    by id, aliased to the current name) — never unionByName."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg_write import (
        iceberg_alter,
        iceberg_append,
        iceberg_create,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_se_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    iceberg_create(nation, loc)
    iceberg_alter(
        loc,
        add_columns={"note": "string"},
        rename_columns={"n_name": "nation_name"},
    )
    iceberg_append(
        nation.select(
            (F.col("n_nationkey") + 1000).alias("n_nationkey"),
            F.col("n_name").alias("nation_name"),
            F.lit("post").alias("note"),
        ),
        loc,
    )
    return read_iceberg(spark, loc).orderBy("n_nationkey")


@probe(
    "p_iceberg_schema_evolution_tt",
    oracle="""
    SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_schema_evolution_tt(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Time travel TO A PRE-EVOLUTION snapshot reads the snapshot's own
    recorded schema (spec: snapshots carry schema-id) — the original
    column names and no later-added columns, even though the table has
    since been altered and appended to."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import (
        iceberg_alter,
        iceberg_append,
        iceberg_create,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_sett_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    iceberg_create(nation, loc)
    iceberg_alter(
        loc, add_columns={"note": "string"},
        rename_columns={"n_name": "nation_label"},
    )
    iceberg_append(
        nation.select(
            (F.col("n_nationkey") + 1000).alias("n_nationkey"),
            F.col("n_name").alias("nation_label"),
            F.lit("post").alias("note"),
        ),
        loc,
    )
    first = IcebergTable(loc).snapshots()[0]["snapshot-id"]
    return read_iceberg(spark, loc, snapshot_id=first).orderBy("n_nationkey")


@probe(
    "p_iceberg_metrics_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(o_totalprice), 2) AS total,
           1 AS scanned_files, 4 AS candidate_files
    FROM orders
    WHERE o_orderkey < (SELECT CAST(FLOOR(MAX(o_orderkey) / 8.0) AS BIGINT)
                        FROM orders)
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_metrics_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-metrics (min/max) file pruning on an UNPARTITIONED column
    (reference: IcebergSplitSource.fileMatchesPredicate over the metrics
    domain; bounds in spec Appendix-D single-value serialization): four
    disjoint o_orderkey range slices are committed as separate files, and
    a range predicate must open exactly ONE from the manifest bounds
    alone — the scan counts ride in the hashed result so a regression to
    O(table) scanning hash-fails."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import (
        iceberg_append,
        iceberg_create,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_mp_") + "/t"
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_totalprice"
    )
    mx = orders.agg(F.max("o_orderkey")).collect()[0][0]
    q = mx // 4 + 1  # slice width; 4 disjoint key ranges
    base = orders.where(F.col("o_orderkey") < q).coalesce(1)
    iceberg_create(base, loc)
    for i in (1, 2, 3):
        iceberg_append(
            orders.where(
                (F.col("o_orderkey") >= i * q)
                & (F.col("o_orderkey") < (i + 1) * q)
            ).coalesce(1),
            loc,
        )
    t = IcebergTable(loc)
    cut = mx // 8  # inside slice 0 only
    out = t.read(spark, partition_filter=[("o_orderkey", "<", cut)]).where(
        F.col("o_orderkey") < cut
    )
    scan = t.last_scan
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    ).select(
        "n",
        "total",
        F.lit(scan["scanned_data_files"]).alias("scanned_files"),
        F.lit(scan["candidate_data_files"]).alias("candidate_files"),
    )


@probe(
    "p_iceberg_history_refs",
    oracle="""
    SELECT * FROM (VALUES
        (1, CAST(NULL AS BIGINT), TRUE, 'main', 'BRANCH', 3),
        (2, CAST(1 AS BIGINT),    TRUE, 'main', 'BRANCH', 3),
        (3, CAST(2 AS BIGINT),    TRUE, 'main', 'BRANCH', 3))
      AS t(snapshot_id, parent_id, is_current_ancestor,
           ref_name, ref_type, ref_snapshot)
    ORDER BY snapshot_id
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_history_refs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$history and $refs metadata tables (reference: plugin/trino-iceberg
    TableType.java; shapes from HistoryTable/RefsTable): after create ->
    append -> delete the history is a linear ancestry chain of three
    snapshots (parent pointers recorded per spec) and the implicit main
    branch ref points at the head."""
    from pyspark.sql import functions as _F

    from trino_private_spark.sources.iceberg_write import (
        iceberg_append,
        iceberg_create,
        iceberg_delete,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_hr_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    iceberg_create(nation, loc)
    iceberg_append(
        nation.withColumn("n_nationkey", nation.n_nationkey + 100), loc
    )
    iceberg_delete(spark, loc, "n_nationkey % 7 = 0")
    hist = read_iceberg(spark, loc + "$history").select(
        _F.col("snapshot_id").cast("int").alias("snapshot_id"),
        "parent_id",
        "is_current_ancestor",
    )
    refs = read_iceberg(spark, loc + "$refs").select(
        _F.col("name").alias("ref_name"),
        _F.col("type").alias("ref_type"),
        _F.col("snapshot_id").cast("int").alias("ref_snapshot"),
    )
    return hist.crossJoin(refs).orderBy("snapshot_id")


@probe(
    "p_iceberg_properties_table",
    oracle="""
    SELECT * FROM (VALUES ('fmt', 'demo'), ('write.owner', 'tps'))
        AS t(key, value) ORDER BY key
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_properties_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$properties metadata table (PropertiesTable shape: key, value) —
    table properties recorded at create come back verbatim."""
    from trino_private_spark.sources.iceberg_write import iceberg_create

    loc = tempfile.mkdtemp(prefix="tps_iceberg_props_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey"
    )
    iceberg_create(
        nation, loc, properties={"fmt": "demo", "write.owner": "tps"}
    )
    return read_iceberg(spark, loc + "$properties").orderBy("key")


@probe(
    "p_iceberg_view_reprune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n, 1 AS scanned_files
    FROM orders WHERE o_custkey % 8 = 3
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_view_reprune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query re-pruning THROUGH sql(): an iceberg CTAS registered as a
    view re-derives manifest pruning from each statement's own WHERE
    (api._reprune_iceberg_views) — the same pruned counts a direct
    read_iceberg(where=...) shows, instead of one frozen full read at
    registration time."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_vr_") + "/t"
    eng.ctas(
        "ice_reprune_orders",
        "SELECT o_orderkey, o_custkey % 8 AS grp FROM orders",
        path=loc,
        fmt="iceberg",
        partition_by=["grp"],
    )
    out = eng.sql(
        "SELECT COUNT(*) AS n FROM ice_reprune_orders WHERE grp = 3"
    ).localCheckpoint(eager=True)
    scanned = IO_SCAN_INFO[loc]["scanned_data_files"]
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.lit(scanned).alias("scanned_files"),
    )


@probe(
    "p_iceberg_optimize",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           ROUND(SUM(o_totalprice), 2) AS total,
           1 AS files_after, 0 AS deletes_after
    FROM orders WHERE o_orderkey % 3 <> 0
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE compaction (the reference's ALTER TABLE ... EXECUTE
    optimize; iceberg_maintenance.iceberg_optimize): a fragmented table
    (8-file create + DELETE's position-delete files) rewrites to ONE
    size-targeted file in a replace snapshot — merge-on-read deletes
    absorbed, rows bit-identical, file counts pinned in the hash."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_maintenance import (
        iceberg_optimize,
    )
    from trino_private_spark.sources.iceberg_write import (
        iceberg_create,
        iceberg_delete,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_opt_") + "/t"
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_totalprice"
    )
    iceberg_create(orders.repartition(8), loc)
    iceberg_delete(spark, loc, "o_orderkey % 3 = 0")
    iceberg_optimize(spark, loc)
    t = IcebergTable(loc)
    files = t.data_files()
    return (
        read_iceberg(spark, loc)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            "n_rows",
            "total",
            F.lit(len([f for f in files if f.content == 0])).alias(
                "files_after"
            ),
            F.lit(len([f for f in files if f.content == 1])).alias(
                "deletes_after"
            ),
        )
    )


@probe(
    "p_iceberg_expire_snapshots",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           1 AS snapshots_left, 2 AS snapshots_expired
    FROM nation WHERE n_nationkey % 5 <> 0
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_expire_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """expire_snapshots (ExpireSnapshotsProcedure analogue): after
    create -> append -> delete, keep_last=1 drops the two old snapshot
    entries (their manifest-list files become unreachable and are
    removed) while the current state stays bit-identical."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_maintenance import (
        iceberg_expire_snapshots,
    )
    from trino_private_spark.sources.iceberg_write import (
        iceberg_append,
        iceberg_create,
        iceberg_delete,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_exp_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    half = nation.where("n_nationkey < 12")
    iceberg_create(half, loc)
    iceberg_append(nation.where("n_nationkey >= 12"), loc)
    iceberg_delete(spark, loc, "n_nationkey % 5 = 0")
    res = iceberg_expire_snapshots(loc, keep_last=1)
    left = len(IcebergTable(loc).snapshots())
    return (
        read_iceberg(spark, loc)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            "n_rows",
            F.lit(left).alias("snapshots_left"),
            F.lit(res["expired_snapshots"]).alias("snapshots_expired"),
        )
    )


@probe(
    "p_iceberg_sorted_write",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           1 AS scanned_files, 8 AS candidate_files
    FROM orders
    WHERE o_orderkey <= (SELECT CAST(FLOOR(MAX(o_orderkey) / 16.0) AS BIGINT)
                         FROM orders)
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_sorted_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sorted_by write order (spec §Sort Orders; the reference's sorted_by
    table property): a HASH-distributed input — every file would span the
    whole key range — range-redistributes on the sort key at write time,
    so per-file min/max bounds are tight and a key predicate opens 1 of 8
    files from metadata alone. The scan counts ride in the hash."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import iceberg_create

    loc = tempfile.mkdtemp(prefix="tps_iceberg_srt_") + "/t"
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey"
    )
    iceberg_create(
        orders.repartition(8, "o_orderkey"), loc, sorted_by=["o_orderkey"]
    )
    t = IcebergTable(loc)
    mx = orders.agg(F.max("o_orderkey")).collect()[0][0]
    cut = mx // 16
    out = t.read(spark, partition_filter=[("o_orderkey", "<=", cut)]).where(
        F.col("o_orderkey") <= cut
    )
    return out.agg(F.count(F.lit(1)).alias("n")).select(
        "n",
        F.lit(t.last_scan["scanned_data_files"]).alias("scanned_files"),
        F.lit(t.last_scan["candidate_data_files"]).alias("candidate_files"),
    )


@probe(
    "p_iceberg_files_metrics",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS record_count,
           CAST(MIN(n_nationkey) AS BIGINT) AS lo,
           CAST(MAX(n_nationkey) AS BIGINT) AS hi,
           CAST(0 AS BIGINT) AS nulls
    FROM nation
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_files_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$files metadata-table column metrics (FilesTable shape with
    value/null counts and READABLE min/max bounds deserialized per the
    schema's field types): a one-file table's recorded bounds equal the
    data's true MIN/MAX — read from the manifest alone, no data IO."""
    import json as _json

    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg_write import iceberg_create

    loc = tempfile.mkdtemp(prefix="tps_iceberg_fm_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    iceberg_create(nation.coalesce(1), loc)
    row = read_iceberg(spark, loc + "$files").collect()[0]
    lo = _json.loads(row.lower_bounds)["1"]
    hi = _json.loads(row.upper_bounds)["1"]
    nulls = _json.loads(row.null_value_counts)["1"]
    return spark.createDataFrame(
        [(row.record_count, lo, hi, nulls)],
        "record_count long, lo long, hi long, nulls long",
    )


@probe(
    "p_iceberg_manifest_prune",
    oracle="""
    WITH grp AS (
      SELECT o_custkey % 8 AS g, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(o_orderkey) AS BIGINT) AS s
      FROM orders GROUP BY 1)
    SELECT n, s,
           8 AS manifests_total, 1 AS manifests_opened,
           1 AS scanned_files
    FROM grp WHERE g = 5
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_manifest_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-LIST field_summary pruning: whole manifests are skipped
    without being opened when their per-partition-field [lower, upper]
    summaries exclude the predicate (iceberg-core ManifestGroup over
    ManifestFile.partitions(); the reference consumes them in
    IcebergSplitSource split planning). Eight single-partition commits ->
    eight manifests; an equality predicate must open exactly ONE. The
    manifest counts ride in the hashed result, so a regression to
    O(manifests) metadata IO hash-fails — the difference between
    O(matching) and O(all) metadata reads per query at 100 TB."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import (
        iceberg_append,
        iceberg_create,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_mlp_") + "/t"
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", (F.col("o_custkey") % 8).alias("g")
    )
    # grp 0 seeds the table; grps 1..7 arrive as separate APPEND commits
    # -> one single-partition manifest each (the post-DML shape of a real
    # table before compaction)
    iceberg_create(orders.where("g = 0").coalesce(1), loc, partition_by=["g"])
    for g in range(1, 8):
        iceberg_append(orders.where(F.col("g") == g).coalesce(1), loc)
    t = IcebergTable(loc)
    out = t.read(spark, partition_filter=[("g", "=", 5)]).where("g = 5")
    scan = dict(t.last_scan)
    return out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("o_orderkey").cast("long").alias("s"),
    ).select(
        "n",
        "s",
        F.lit(scan["manifests_total"]).alias("manifests_total"),
        F.lit(scan["manifests_opened"]).alias("manifests_opened"),
        F.lit(scan["scanned_data_files"]).alias("scanned_files"),
    )


@probe(
    "p_iceberg_join_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(o.o_totalprice) AS DOUBLE) IS NOT NULL AS has_total,
           1 AS o_scanned, 1 AS c_scanned
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_custkey % 8 = 3 AND c.c_custkey % 4 = 3
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_join_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-shaped per-query Iceberg pruning (the reference's
    PushPredicateIntoTableScan -> applyFilter): a join over TWO
    registered Iceberg views prunes BOTH scans, each by its own
    alias-qualified WHERE conjuncts — both per-table scanned-file counts
    ride in the hashed result, so a regression to full reads on either
    side hash-fails."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc_o = tempfile.mkdtemp(prefix="tps_iceberg_jpo_") + "/t"
    loc_c = tempfile.mkdtemp(prefix="tps_iceberg_jpc_") + "/t"
    eng.ctas(
        "ice_jp_orders",
        "SELECT o_orderkey, o_custkey, o_totalprice, o_custkey % 8 AS grp "
        "FROM orders",
        path=loc_o, fmt="iceberg", partition_by=["grp"],
    )
    eng.ctas(
        "ice_jp_cust",
        "SELECT c_custkey, c_custkey % 4 AS seg FROM customer",
        path=loc_c, fmt="iceberg", partition_by=["seg"],
    )
    out = eng.sql(
        "SELECT COUNT(*) AS n, SUM(o.o_totalprice) IS NOT NULL AS has_total "
        "FROM ice_jp_orders o JOIN ice_jp_cust c "
        "ON o.o_custkey = c.c_custkey "
        "WHERE o.grp = 3 AND c.seg = 3"
    ).localCheckpoint(eager=True)
    return out.select(
        F.col("n").cast("long").alias("n"),
        "has_total",
        F.lit(IO_SCAN_INFO[loc_o]["scanned_data_files"]).alias("o_scanned"),
        F.lit(IO_SCAN_INFO[loc_c]["scanned_data_files"]).alias("c_scanned"),
    )


@probe(
    "p_iceberg_or_in_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n, 2 AS scanned_files
    FROM orders WHERE o_custkey % 8 IN (2, 5)
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_or_in_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same-column parenthesized OR prunes as an IN-list (the reference's
    TupleDomain union): `(grp = 2 OR grp = 5)` through sql() opens
    exactly the two matching partitions — the count rides in the hashed
    result."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_oip_") + "/t"
    eng.ctas(
        "ice_orin_orders",
        "SELECT o_orderkey, o_custkey % 8 AS grp FROM orders",
        path=loc, fmt="iceberg", partition_by=["grp"],
    )
    out = eng.sql(
        "SELECT COUNT(*) AS n FROM ice_orin_orders "
        "WHERE (grp = 2 OR grp = 5)"
    ).localCheckpoint(eager=True)
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.lit(IO_SCAN_INFO[loc]["scanned_data_files"]).alias(
            "scanned_files"
        ),
    )


@probe(
    "p_iceberg_spec_evolution",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_custkey % 8 = 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_grp3,
           CAST(SUM(CASE WHEN o_orderkey % 5 = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_seg2,
           6 AS grp_scanned, 9 AS seg_scanned
    FROM orders
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_spec_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-spec EVOLUTION (Iceberg spec §"Partition Evolution";
    reference ALTER TABLE ... SET PROPERTIES partitioning ->
    IcebergMetadata.setTableProperties): old files keep their spec and
    stay prunable under it, new appends lay out under the new default
    spec, and a mixed-spec read prunes each manifest under ITS OWN
    spec. grp filter: 1 of 8 old files + all 5 new (unprunable by grp)
    = 6 scanned; seg filter: 8 old + 1 of 5 new = 9. Both counts ride
    in the hashed result."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import iceberg_append

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_se_") + "/t"
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey",
        (F.col("o_custkey") % 8).alias("grp"),
        (F.col("o_orderkey") % 5).alias("seg"),
    )
    eng.ctas(
        "ice_se_orders",
        "SELECT o_orderkey, o_custkey % 8 AS grp, o_orderkey % 5 AS seg "
        "FROM orders WHERE o_orderkey % 2 = 0",
        path=loc, fmt="iceberg", partition_by=["grp"],
    )
    eng.sql(
        "ALTER TABLE ice_se_orders SET PROPERTIES partitioning = "
        "ARRAY['seg']"
    )
    iceberg_append(orders.where("o_orderkey % 2 = 1"), loc)
    t = IcebergTable(loc)
    g = t.read(spark, partition_filter=[("grp", "=", 3)])
    n_grp3 = g.where("grp = 3").count()
    grp_scanned = t.last_scan["scanned_data_files"]
    s = t.read(spark, partition_filter=[("seg", "=", 2)])
    n_seg2 = s.where("seg = 2").count()
    seg_scanned = t.last_scan["scanned_data_files"]
    return spark.createDataFrame(
        [(n_grp3, n_seg2, grp_scanned, seg_scanned)],
        "n_grp3 long, n_seg2 long, grp_scanned int, seg_scanned int",
    )


@probe(
    "p_iceberg_branch_tag",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_tag,
           CAST(2 * COUNT(*) AS BIGINT) AS n_head,
           CAST(COUNT(*) AS BIGINT) AS n_after_expire
    FROM nation
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_branch_tag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named refs (spec §"Snapshot References"; the reference resolves
    FOR VERSION AS OF 'name' through the metadata refs map and honors
    refs in snapshot retention): a TAG created before an append keeps
    reading the old snapshot, the head reads both, and expire_snapshots
    keeps the tag-pinned snapshot alive."""
    from trino_private_spark.sources.iceberg_maintenance import (
        iceberg_create_ref,
        iceberg_expire_snapshots,
    )
    from trino_private_spark.sources.iceberg_write import (
        iceberg_append,
        iceberg_create,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_bt_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    iceberg_create(nation, loc)
    iceberg_create_ref(loc, "v1", ref_type="tag")
    iceberg_append(nation.selectExpr("n_nationkey + 1000 AS n_nationkey",
                                     "n_name"), loc)
    n_tag = read_iceberg(spark, loc, ref="v1").count()
    n_head = read_iceberg(spark, loc).count()
    iceberg_expire_snapshots(loc, keep_last=1)
    n_after = read_iceberg(spark, loc, ref="v1").count()
    return spark.createDataFrame(
        [(n_tag, n_head, n_after)],
        "n_tag long, n_head long, n_after_expire long",
    )


@probe(
    "p_iceberg_sql_dml",
    oracle="""
    WITH base AS (SELECT o_orderkey, o_custkey % 8 AS grp FROM orders),
    after_del AS (SELECT * FROM base WHERE grp <> 3)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM base WHERE grp = 3)
               AS deleted,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM after_del WHERE grp = 5)
               AS updated,
           (SELECT CAST(SUM(CASE WHEN grp = 5
                            THEN o_orderkey + 1000000
                            ELSE o_orderkey END) AS BIGINT)
            FROM after_del) AS key_sum,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS tt_rows
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE / UPDATE as SQL text through Engine.sql (SqlBase.g4:61,
    160-162; the reference's executeDelete + RowDelta UPDATE): DELETE
    writes position-delete files, UPDATE commits deletes + replacement
    rows in one atomic snapshot, and FOR VERSION AS OF still reads the
    pre-DML state — row counts and the post-DML key sum ride in the
    hashed result."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_dml_") + "/t"
    eng.ctas(
        "ice_dml_orders",
        "SELECT o_orderkey, o_custkey % 8 AS grp FROM orders",
        path=loc, fmt="iceberg", partition_by=["grp"],
    )
    deleted = eng.sql(
        "DELETE FROM ice_dml_orders WHERE grp = 3"
    ).collect()[0].rows
    updated = eng.sql(
        "UPDATE ice_dml_orders SET o_orderkey = o_orderkey + 1000000 "
        "WHERE grp = 5"
    ).collect()[0].rows
    key_sum = (
        spark.table("ice_dml_orders")
        .agg(F.sum("o_orderkey").cast("long").alias("s"))
        .collect()[0].s
    )
    tt_rows = eng.sql(
        "SELECT COUNT(*) AS c FROM ice_dml_orders FOR VERSION AS OF 1"
    ).collect()[0].c
    return spark.createDataFrame(
        [(deleted, updated, key_sum, tt_rows)],
        "deleted long, updated long, key_sum long, tt_rows long",
    )


@probe(
    "p_iceberg_sql_ctas_insert",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) + 25 AS n_total,
           CAST(25 AS BIGINT) AS n_inserted,
           1 AS scanned_files
    FROM orders
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_sql_ctas_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-text Iceberg DDL/DML round trip: CREATE TABLE ... WITH
    (format='ICEBERG', partitioning=ARRAY[...]) AS <query> commits a
    real v2 tree and registers the view; INSERT INTO <view> appends a
    prunable snapshot (beginInsert); a pruned per-query read confirms
    the table stays partition-aligned end-to-end."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_ci_") + "/t"
    eng.sql(
        f"CREATE TABLE ice_ci_orders WITH (format = 'ICEBERG', "
        f"partitioning = ARRAY['grp'], location = '{loc}') AS "
        "SELECT o_orderkey, o_custkey % 8 AS grp FROM orders"
    )
    ins = eng.sql(
        "INSERT INTO ice_ci_orders "
        "SELECT CAST(90000000 + n AS BIGINT) AS o_orderkey, "
        "CAST(3 AS BIGINT) AS grp "
        "FROM UNNEST(SEQUENCE(1, 25)) AS t(n)"
    ).collect()[0].rows
    total = spark.table("ice_ci_orders").count()
    eng.sql("SELECT COUNT(*) AS c FROM ice_ci_orders WHERE grp = 5")
    scanned = IO_SCAN_INFO[loc]["scanned_data_files"]
    return spark.createDataFrame(
        [(total, ins, scanned)],
        "n_total long, n_inserted long, scanned_files int",
    )


@probe(
    "p_iceberg_metadata_log",
    oracle="""
    SELECT * FROM (VALUES
        (CAST(1 AS BIGINT), CAST(0 AS INT), FALSE),
        (CAST(2 AS BIGINT), CAST(1 AS INT), FALSE),
        (CAST(3 AS BIGINT), CAST(1 AS INT), TRUE))
        AS t(latest_snapshot_id, latest_schema_id, is_current)
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_metadata_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$metadata_log_entries (MetadataLogEntriesTable.java; spec
    "metadata-log"): one row per previous metadata.json version plus the
    current state, each carrying the snapshot/schema ids current AT that
    version — so the log shows snapshot 1, 2, 3 and the schema flip
    after an ALTER."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg_write import (
        iceberg_alter,
        iceberg_append,
        iceberg_create,
    )

    loc = tempfile.mkdtemp(prefix="tps_iceberg_mle_") + "/t"
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", "n_name"
    )
    iceberg_create(nation, loc)
    iceberg_append(nation.limit(3), loc)
    iceberg_alter(loc, add_columns={"note": "string"})
    iceberg_append(nation.limit(1), loc)
    out = read_iceberg(spark, loc + "$metadata_log_entries")
    # the ALTER writes a metadata version with the SAME snapshot id as
    # the append before it; keep one row per snapshot id (latest wins)
    # to make the probe robust to that interleaving
    from pyspark.sql import Window

    w = Window.partitionBy("latest_snapshot_id").orderBy(
        F.col("timestamp_ms").desc(),
        F.col("latest_schema_id").desc(),
    )
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select(
            "latest_snapshot_id",
            "latest_schema_id",
            (F.col("file") == "(current)").alias("is_current"),
        )
        .orderBy("latest_snapshot_id")
    )


@probe(
    "p_iceberg_rewrite_manifests",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum,
           4 AS manifests_before, 2 AS manifests_after,
           CAST(COUNT(*) AS BIGINT) AS tt_rows
    FROM nation WHERE n_nationkey % 7 <> 0
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_rewrite_manifests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rewrite_manifests via CALL system.rewrite_manifests (iceberg-core
    RewriteManifests registered as a procedure by plugin/trino-iceberg):
    create + 2 appends + a position-delete commit accrete 4 manifests;
    the rewrite folds them to 2 (one data group, one delete group) in a
    METADATA-ONLY replace snapshot. Pinned in the hash: row count and
    key sum unchanged (delete applicability preserved — rewritten
    entries carry their resolved sequence numbers), manifest counts
    before/after, and pre-rewrite time travel still serving the same
    rows from the OLD manifest list."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import (
        iceberg_append,
        iceberg_create,
        iceberg_delete,
    )

    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet")).select(
        "n_nationkey", (F.col("n_nationkey") % 4).alias("grp")
    )
    loc = tempfile.mkdtemp(prefix="tps_iceberg_rwm_") + "/t"
    iceberg_create(nation.where("n_nationkey < 10"), loc, partition_by=["grp"])
    iceberg_append(
        nation.where("n_nationkey >= 10 AND n_nationkey < 20"), loc
    )
    iceberg_append(nation.where("n_nationkey >= 20"), loc)
    iceberg_delete(spark, loc, "n_nationkey % 7 = 0")
    t = IcebergTable(loc)
    t.data_files()
    before = t.last_manifest_scan["manifests_total"]
    pre_snap = t.current_snapshot()["snapshot-id"]

    eng = Engine(spark)
    eng.sql(f"CALL system.rewrite_manifests('{loc}')")

    t2 = IcebergTable(loc)
    rows = t2.read(spark)
    after = t2.last_manifest_scan["manifests_total"]
    tt_rows = t2.read(spark, snapshot_id=pre_snap).count()
    return rows.agg(
        F.count("*").alias("n_rows"),
        F.sum("n_nationkey").alias("key_sum"),
        F.lit(before).alias("manifests_before"),
        F.lit(after).alias("manifests_after"),
        F.lit(tt_rows).cast("long").alias("tt_rows"),
    )


@probe(
    "p_iceberg_entries_all_manifests",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           4 AS n_entries, 2 AS n_del_entries, 8 AS seq_sum,
           6 AS n_all_manifests, 68 AS ref_sum
    FROM nation WHERE n_nationkey % 5 <> 0 AND n_nationkey <> 19
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_entries_all_manifests(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """$entries + $all_manifests metadata tables (the reference's
    EntriesTable / AllManifestsTable, plugin/trino-iceberg
    TableType.ENTRIES / ALL_MANIFESTS). On the deterministic 3-snapshot
    fixture: the current snapshot's manifests hold 4 entries (data d1,
    pos-delete pd1, eq-delete ed1, data d2) with inherited sequence
    numbers 1+2+2+3=8 and 2 delete-content entries; $all_manifests
    unions 1+2+3 manifest rows across the 3 snapshots with
    reference_snapshot_id sum 10+2*11+3*12=68. The row count ties the
    fixture's delete semantics to the nation oracle."""
    from pyspark.sql import functions as F

    loc = _build(sf_dir)
    n_rows = read_iceberg(spark, loc).count()
    e = read_iceberg(spark, loc + "$entries")
    am = read_iceberg(spark, loc + "$all_manifests")
    return (
        e.agg(
            F.count("*").alias("n_entries"),
            F.sum((F.col("content") > 0).cast("int")).alias(
                "n_del_entries"
            ),
            F.sum("sequence_number").alias("seq_sum"),
        )
        .crossJoin(
            am.agg(
                F.count("*").alias("n_all_manifests"),
                F.sum("reference_snapshot_id").alias("ref_sum"),
            )
        )
        .select(
            F.lit(n_rows).cast("long").alias("n_rows"),
            F.col("n_entries").cast("int"),
            F.col("n_del_entries").cast("int"),
            F.col("seq_sum").cast("int"),
            F.col("n_all_manifests").cast("int"),
            F.col("ref_sum").cast("int"),
        )
    )


@probe(
    "p_iceberg_show_stats",
    oracle="""
    WITH kept AS (SELECT * FROM nation WHERE n_nationkey % 5 <> 0)
    SELECT 'n_nationkey' AS column_name,
           (SELECT CAST(COUNT(DISTINCT n_nationkey) AS DOUBLE) FROM kept)
             AS ndv,
           0.0 AS nulls_fraction, CAST(NULL AS DOUBLE) AS row_count,
           CAST(MIN(n_nationkey) AS VARCHAR) AS low_value,
           CAST(MAX(n_nationkey) AS VARCHAR) AS high_value
    FROM nation
    UNION ALL
    SELECT 'n_regionkey',
           (SELECT CAST(COUNT(DISTINCT n_regionkey) AS DOUBLE) FROM kept),
           0.0, NULL,
           CAST(MIN(n_regionkey) AS VARCHAR),
           CAST(MAX(n_regionkey) AS VARCHAR)
    FROM nation
    UNION ALL
    SELECT 'n_name',
           (SELECT CAST(COUNT(DISTINCT n_name) AS DOUBLE) FROM kept),
           0.0, NULL, MIN(n_name), MAX(n_name)
    FROM nation
    UNION ALL
    SELECT NULL, NULL, NULL, CAST(COUNT(*) AS DOUBLE), NULL, NULL
    FROM kept
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_show_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE + SHOW STATS on an Iceberg table (the reference's
    TableStatisticsReader / TableStatisticsWriter,
    plugin/trino-iceberg): row count, null fractions, and min/max
    bounds come from MANIFEST METRICS ALONE (zero data IO): the row
    count subtracts position-delete record counts, while bounds stay
    WRITE-TIME — deletes never narrow file metrics, exactly the
    reference's estimate semantics. NDVs come from the
    ANALYZE-committed statistics file (spec §"Table Statistics") over
    the CURRENT rows. The result is the reference's ShowStatsRewrite
    shape minus the encoding-dependent data_size column; the oracle
    mirrors the split (bounds over all written rows, counts/NDVs over
    survivors)."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_st_") + "/t"
    eng.ctas(
        "ice_stats_nation",
        "SELECT n_nationkey, n_regionkey, n_name FROM nation",
        path=loc, fmt="iceberg",
    )
    eng.sql("DELETE FROM ice_stats_nation WHERE n_nationkey % 5 = 0")
    eng.sql("ANALYZE ice_stats_nation")
    return eng.sql("SHOW STATS FOR ice_stats_nation").select(
        "column_name",
        F.col("distinct_values_count").alias("ndv"),
        "nulls_fraction",
        "row_count",
        "low_value",
        "high_value",
    )


@probe(
    "p_iceberg_partial_optimize",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN o_custkey % 8 = 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_g3,
           16 AS files_before, 15 AS files_after, 1 AS g3_files,
           1 AS g3_scanned
    FROM orders
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_partial_optimize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARTIAL OPTIMIZE (the reference's `ALTER TABLE ... EXECUTE
    optimize ... WHERE <partition predicate>`, OptimizeTableProcedure):
    an identity-partitioned CTAS (8 files) + an append (8 more) leaves
    2 files per grp; optimize WHERE grp = 3 rewrites ONLY that
    partition's pair into one file — every other data file carries over
    as an EXISTING entry byte-identically (16 -> 15 files, grp-3 reads
    open exactly 1). Row count and the grp-3 count tie the carried-over
    content to the orders oracle."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IcebergTable
    from trino_private_spark.sources.iceberg_write import iceberg_append

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_po_") + "/t"
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", (F.col("o_custkey") % 8).alias("grp")
    )
    eng.ctas(
        "ice_po_orders",
        "SELECT o_orderkey, o_custkey % 8 AS grp FROM orders "
        "WHERE o_orderkey % 2 = 0",
        path=loc, fmt="iceberg", partition_by=["grp"],
    )
    iceberg_append(orders.where("o_orderkey % 2 = 1"), loc)
    t = IcebergTable(loc)
    files_before = len([f for f in t.data_files() if f.content == 0])
    eng.sql("ALTER TABLE ice_po_orders EXECUTE optimize WHERE grp = 3")
    t2 = IcebergTable(loc)
    data = [f for f in t2.data_files() if f.content == 0]
    g3_files = len(
        [f for f in data if dict(f.partition or ()).get("grp") == 3]
    )
    out = t2.read(spark, partition_filter=[("grp", "=", 3)])
    n_g3 = out.where("grp = 3").count()
    g3_scanned = t2.last_scan["scanned_data_files"]
    n_total = t2.read(spark).count()
    return spark.createDataFrame(
        [
            (
                n_total,
                n_g3,
                files_before,
                len(data),
                g3_files,
                g3_scanned,
            )
        ],
        "n_total long, n_g3 long, files_before int, files_after int, "
        "g3_files int, g3_scanned int",
    )


@probe(
    "p_iceberg_truncate",
    oracle="""
    SELECT CAST(0 AS BIGINT) AS n_after,
           CAST(COUNT(*) AS BIGINT) AS n_before,
           CAST(COUNT(*) AS BIGINT) AS n_travel
    FROM nation
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUNCATE TABLE on an Iceberg view (the reference's truncate
    support; executeDelete-all shape): commits a REPLACE snapshot with
    ZERO data files — the table reads as empty, while the pre-truncate
    snapshot stays fully time-travelable. All three counts ride in one
    hashed row."""
    from pyspark.sql import functions as F  # noqa: F401

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IcebergTable

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_tr_") + "/t"
    eng.ctas(
        "ice_tr_nation",
        "SELECT n_nationkey, n_name FROM nation",
        path=loc, fmt="iceberg",
    )
    t = IcebergTable(loc)
    n_before = t.read(spark).count()
    pre = t.current_snapshot()["snapshot-id"]
    eng.sql("TRUNCATE TABLE ice_tr_nation")
    t2 = IcebergTable(loc)
    n_after = t2.read(spark).count()
    n_travel = t2.read(spark, snapshot_id=pre).count()
    return spark.createDataFrame(
        [(n_after, n_before, n_travel)],
        "n_after long, n_before long, n_travel long",
    )


@probe(
    "p_iceberg_create_rollback",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_inserted,
           CAST(0 AS BIGINT) AS n_rolled_back,
           CAST(COUNT(*) AS BIGINT) AS n_forward,
           CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_create_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain CREATE TABLE (cols) + positional INSERT coercion +
    rollback_to_snapshot (the reference's no-AS CREATE TABLE,
    StatementAnalyzer insert coercion, RollbackToSnapshotProcedure):
    the empty-table commit is snapshot 1, the insert snapshot 2;
    rolling back to 1 reads empty METADATA-ONLY (both snapshots kept),
    rolling forward to 2 restores every row bit-identically — the key
    sum ties the round trip to the nation oracle."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IcebergTable

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_cr_") + "/t"
    eng.sql(
        f"CREATE TABLE ice_cr_t (k bigint, v varchar) WITH ("
        f"format='ICEBERG', location = '{loc}')"
    )
    eng.sql("INSERT INTO ice_cr_t SELECT n_nationkey, n_name FROM nation")
    snaps = IcebergTable(loc).snapshots()
    n_inserted = spark.table("ice_cr_t").count()
    eng.sql(
        f"CALL system.rollback_to_snapshot('ice_cr_t', "
        f"{snaps[0]['snapshot-id']})"
    )
    n_rolled = eng.sql("SELECT COUNT(*) AS c FROM ice_cr_t").collect()[0].c
    eng.sql(
        f"CALL system.rollback_to_snapshot('ice_cr_t', "
        f"{snaps[1]['snapshot-id']})"
    )
    fwd = eng.sql(
        "SELECT COUNT(*) AS c, SUM(k) AS s FROM ice_cr_t"
    ).collect()[0]
    return spark.createDataFrame(
        [(n_inserted, n_rolled, fwd.c, fwd.s)],
        "n_inserted long, n_rolled_back long, n_forward long, "
        "key_sum long",
    )


@probe(
    "p_iceberg_comment_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n, 1 AS scanned_files
    FROM orders WHERE o_custkey % 4 = 3 AND o_orderkey % 8 = 1
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_comment_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL comments are lexer-skipped BEFORE partition pruning (the
    reference's SqlBase.g4 SIMPLE_COMMENT/BRACKETED_COMMENT skip; round-8
    audit found a commented-out conjunct becoming a live prune term and
    silently dropping rows). The statement carries a commented-out
    ``AND seg = 5`` (must NOT prune), a block comment, and a live
    ``seg = 1`` conjunct (MUST still prune to 1 of 8 partition files) —
    both the row count and the scanned-file count ride in the hash."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_cmt_") + "/t"
    eng.ctas(
        "ice_cmt_orders",
        "SELECT o_orderkey, o_custkey % 4 AS grp, o_orderkey % 8 AS seg "
        "FROM orders",
        path=loc, fmt="iceberg", partition_by=["seg"],
    )
    out = eng.sql(
        "SELECT COUNT(*) AS n FROM ice_cmt_orders\n"
        "WHERE grp = 3 -- AND seg = 5\n"
        " AND /* live conjunct follows */ seg = 1"
    ).localCheckpoint(eager=True)
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.lit(IO_SCAN_INFO[loc]["scanned_data_files"]).alias(
            "scanned_files"
        ),
    )


@probe(
    "p_iceberg_analyze_cbo",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_analyzed,
           CAST(SUM(o_orderkey) AS BIGINT) AS key_sum,
           CAST(COUNT(*) + 1 AS BIGINT) AS n_after_insert,
           TRUE AS has_row_stats
    FROM orders
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_analyze_cbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE feeds Catalyst's CBO (r9): a clean Iceberg table promotes
    to a stats-bearing catalog table (DESC EXTENDED shows a rowCount
    Statistics line — rides in the hash as has_row_stats), statements
    keep returning exact results THROUGH the promotion, and a write
    after ANALYZE must drop the promotion and serve fresh rows (the
    staleness pin). Reference: ANALYZE -> TableStatisticsWriter, stats
    consumed by ReorderJoins/DetermineJoinDistributionType."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_cbo_") + "/t"
    eng.ctas(
        "ice_cbo_probe",
        "SELECT o_orderkey, o_custkey FROM orders",
        path=loc, fmt="iceberg",
    )
    eng.sql("ANALYZE ice_cbo_probe")
    has_stats = any(
        r.col_name == "Statistics" and "rows" in (r.data_type or "")
        for r in spark.sql("DESC EXTENDED ice_cbo_probe").collect()
    )
    agg = eng.sql(
        "SELECT COUNT(*) AS n, SUM(o_orderkey) AS s FROM ice_cbo_probe"
    ).collect()[0]
    eng.sql(
        "INSERT INTO ice_cbo_probe SELECT -1 AS o_orderkey, -1 AS o_custkey"
    )
    n_after = eng.sql(
        "SELECT COUNT(*) AS n FROM ice_cbo_probe"
    ).collect()[0]["n"]
    return spark.createDataFrame(
        [(int(agg["n"]), int(agg["s"]), int(n_after), bool(has_stats))],
        "n_analyzed long, key_sum long, n_after_insert long, "
        "has_row_stats boolean",
    )


@probe(
    "p_iceberg_stats_bounds",
    oracle="""
    SELECT CAST(COUNT(*) - SUM(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0
                END) AS BIGINT) AS row_count,
           FALSE AS is_exact,
           CAST(COUNT(*) - SUM(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0
                END) AS BIGINT) AS row_low,
           CAST(COUNT(*) AS BIGINT) AS row_high
    FROM orders
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_stats_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW STATS honesty under merge-on-read churn (r9): after a
    position-delete DELETE, row_count is a flagged ESTIMATE with a
    [low, high] bound — low = data minus delete rows, high = data rows
    (deletes only remove) — all zero-data-IO from manifests
    (TableStatisticsReader's metadata path, which silently ignores
    un-applied deletes in the reference)."""
    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg_stats import table_stats

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_sb_") + "/t"
    eng.ctas(
        "ice_sb_orders",
        "SELECT o_orderkey FROM orders",
        path=loc, fmt="iceberg",
    )
    eng.sql("DELETE FROM ice_sb_orders WHERE o_orderkey % 7 = 0")
    st = table_stats(loc)
    return spark.createDataFrame(
        [(
            int(st["row_count"]),
            bool(st["row_count_is_exact"]),
            int(st["row_count_low"]),
            int(st["row_count_high"]),
        )],
        "row_count long, is_exact boolean, row_low long, row_high long",
    )


@probe(
    "p_iceberg_null_prune",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_orderkey % 5 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_null,
           CAST(SUM(CASE WHEN o_orderkey % 5 <> 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_notnull,
           1 AS null_scanned, 4 AS notnull_scanned
    FROM orders
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_null_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL pruning (r9; the reference's TupleDomain
    onlyNull/notNull over contains_null + partition tuples): a table
    partitioned on a NULLABLE column scans exactly the null partition
    for IS NULL (1 of 5 files) and exactly the non-null partitions for
    IS NOT NULL (4 of 5) — counts and scanned files both ride in the
    hash."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_np_") + "/t"
    eng.ctas(
        "ice_np_orders",
        "SELECT o_orderkey, CASE WHEN o_orderkey % 5 = 0 THEN NULL "
        "ELSE o_orderkey % 5 END AS seg FROM orders",
        path=loc, fmt="iceberg", partition_by=["seg"],
    )
    n_null = eng.sql(
        "SELECT COUNT(*) AS n FROM ice_np_orders WHERE seg IS NULL"
    ).collect()[0]["n"]
    null_scanned = IO_SCAN_INFO[loc]["scanned_data_files"]
    n_notnull = eng.sql(
        "SELECT COUNT(*) AS n FROM ice_np_orders WHERE seg IS NOT NULL"
    ).collect()[0]["n"]
    notnull_scanned = IO_SCAN_INFO[loc]["scanned_data_files"]
    return spark.createDataFrame(
        [(int(n_null), int(n_notnull), null_scanned, notnull_scanned)],
        "n_null long, n_notnull long, null_scanned int, "
        "notnull_scanned int",
    )


@probe(
    "p_iceberg_like_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n, 1 AS scanned_files
    FROM orders WHERE o_orderpriority LIKE '1-%'
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_like_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE-'prefix%' pruning (r9; the reference's DomainTranslator
    derives a [prefix, next(prefix)) range): a table partitioned with
    truncate[1] on o_orderpriority scans exactly the '1' partition for
    LIKE '1-%' — 1 of 5 files, count + scanned in the hash."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_lp_") + "/t"
    eng.ctas(
        "ice_lp_orders",
        "SELECT o_orderkey, o_orderpriority FROM orders",
        path=loc, fmt="iceberg",
        partition_by=[("o_orderpriority", "truncate[1]")],
    )
    out = eng.sql(
        "SELECT COUNT(*) AS n FROM ice_lp_orders "
        "WHERE o_orderpriority LIKE '1-%'"
    ).localCheckpoint(eager=True)
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.lit(IO_SCAN_INFO[loc]["scanned_data_files"]).alias(
            "scanned_files"
        ),
    )


@probe(
    "p_iceberg_subquery_prune",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_orderkey % 8 = 3 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_derived,
           CAST(SUM(CASE WHEN o_orderkey % 8 = 5 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_cte,
           1 AS derived_scanned, 1 AS cte_scanned
    FROM orders
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_subquery_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block pruning (r9; PushPredicateIntoTableScan recursion): a
    derived table's WHERE and a CTE body's WHERE each prune THEIR OWN
    Iceberg scan to 1 of 8 partition files — both scanned counts ride
    in the hash alongside the row counts."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_sqp_") + "/t"
    eng.ctas(
        "ice_sqp_orders",
        "SELECT o_orderkey, o_orderkey % 8 AS seg FROM orders",
        path=loc, fmt="iceberg", partition_by=["seg"],
    )
    n_derived = eng.sql(
        "SELECT COUNT(*) AS n FROM "
        "(SELECT * FROM ice_sqp_orders WHERE seg = 3) t"
    ).collect()[0]["n"]
    derived_scanned = IO_SCAN_INFO[loc]["scanned_data_files"]
    n_cte = eng.sql(
        "WITH c AS (SELECT * FROM ice_sqp_orders WHERE seg = 5) "
        "SELECT COUNT(*) AS n FROM c"
    ).collect()[0]["n"]
    cte_scanned = IO_SCAN_INFO[loc]["scanned_data_files"]
    return spark.createDataFrame(
        [(int(n_derived), int(n_cte), derived_scanned, cte_scanned)],
        "n_derived long, n_cte long, derived_scanned int, cte_scanned int",
    )


@probe(
    "p_iceberg_metadata_sql",
    oracle="""
    SELECT CAST(2 AS BIGINT) AS n_snapshots,
           CAST(8 AS BIGINT) AS n_files,
           CAST(COUNT(*) AS BIGINT) AS rec_total
    FROM orders
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_metadata_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata tables through the reference's SQL suffix syntax
    (SELECT ... FROM "t$snapshots" / "t$files" — TableType handles in
    IcebergMetadata.getTableHandle): snapshot count after CTAS+INSERT,
    live file count of the 8-partition layout, and the $files
    record_count sum tying back to the orders oracle."""
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_mt_") + "/t"
    eng.ctas(
        "ice_mt_orders",
        "SELECT o_orderkey, o_orderkey % 8 AS seg FROM orders "
        "WHERE o_orderkey % 2 = 0",
        path=loc, fmt="iceberg", partition_by=["seg"],
    )
    eng.sql(
        "INSERT INTO ice_mt_orders SELECT o_orderkey, o_orderkey % 8 "
        "FROM orders WHERE o_orderkey % 2 = 1"
    )
    row = eng.sql(
        'SELECT (SELECT COUNT(*) FROM "ice_mt_orders$snapshots") AS '
        "n_snapshots, "
        '(SELECT COUNT(*) FROM "ice_mt_orders$files" WHERE content = 0) '
        "AS n_files, "
        '(SELECT SUM(record_count) FROM "ice_mt_orders$files" '
        "WHERE content = 0) AS rec_total"
    ).collect()[0]
    return spark.createDataFrame(
        [(int(row["n_snapshots"]), int(row["n_files"]),
          int(row["rec_total"]))],
        "n_snapshots long, n_files long, rec_total long",
    )


@probe(
    "p_iceberg_snapshot_summary",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS added_first,
           CAST(COUNT(*) AS BIGINT) AS total_after_insert,
           CAST(COUNT(*) AS BIGINT) AS total_after_optimize
    FROM orders
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_snapshot_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spec §Snapshot Summary metrics (iceberg-core SnapshotSummary
    discipline): added-records on the CTAS snapshot, total-records
    tracked incrementally across an INSERT, and recomputed exactly by a
    replace commit (OPTIMIZE) — all read back through the $snapshots
    summary column and tied to the orders oracle."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import read_iceberg

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_ss_") + "/t"
    eng.ctas(
        "ice_ss_orders",
        "SELECT o_orderkey FROM orders WHERE o_orderkey % 2 = 0",
        path=loc, fmt="iceberg",
    )
    eng.sql(
        "INSERT INTO ice_ss_orders SELECT o_orderkey FROM orders "
        "WHERE o_orderkey % 2 = 1"
    )
    eng.sql("ALTER TABLE ice_ss_orders EXECUTE optimize")
    snaps = (
        read_iceberg(spark, loc + "$snapshots")
        .orderBy("snapshot_id")
        .select(
            F.get_json_object("summary", "$['added-records']").alias("ar"),
            F.get_json_object("summary", "$['total-records']").alias("tr"),
            "operation",
        )
        .collect()
    )
    return spark.createDataFrame(
        [(
            int(snaps[0]["ar"]),
            int(snaps[1]["tr"]),
            int(snaps[2]["tr"]),
        )],
        "added_first long, total_after_insert long, "
        "total_after_optimize long",
    )


@probe(
    "p_iceberg_insert_columns",
    oracle="""
    SELECT CAST(n_nationkey AS BIGINT) AS k, n_name AS v,
           CAST(NULL AS BIGINT) AS w
    FROM nation ORDER BY n_nationkey
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_insert_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT INTO t (a, b) <query> (SqlBase.g4 insertInto
    columnAliases; StatementAnalyzer insert column mapping): listed
    columns take the query's outputs, unlisted columns null-fill —
    full-hash against nation with the null w column in the frame."""
    from pyspark.sql import functions as F

    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_iceberg_insc_") + "/t"
    eng.sql(
        f"CREATE TABLE ice_insc (k bigint, v varchar, w bigint) "
        f"WITH (format='ICEBERG', location='{loc}')"
    )
    eng.sql(
        "INSERT INTO ice_insc (k, v) SELECT n_nationkey, n_name "
        "FROM nation"
    )
    return spark.table("ice_insc").orderBy("k")
