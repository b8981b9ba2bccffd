"""Iceberg v2 WRITE path: CTAS / INSERT (append) / DELETE emitting real
Iceberg metadata trees that the read shim (sources/iceberg.py) — and any
spec-conforming reader — can consume.

Reference parity: plugin/trino-iceberg IcebergMetadata.java:397
(beginCreateTable), :418 (beginInsert), :611 (executeDelete via
position-delete files). Commits follow the spec's append model: every
write produces

  1. field-id-annotated parquet data (or position-delete) files under
     ``<location>/data/``, written DISTRIBUTED via ``mapInArrow`` — one
     file per non-empty partition, no driver materialization, so the
     path scales to arbitrarily large appends;
  2. one Avro manifest for the new files;
  3. a new manifest LIST carrying every prior manifest plus the new one
     (append-style history, exactly what iceberg_testing.build_table
     emits and the shim's DeleteFileIndex-scoped reader expects);
  4. a new ``v<N+1>.metadata.json`` with the snapshot appended,
     ``last-sequence-number`` bumped and ``current-snapshot-id`` moved —
     old metadata versions stay on disk, so FOR VERSION/TIMESTAMP AS OF
     time travel keeps working across writes.

DELETE writes position-delete files (content=1, file_path/pos with the
spec's reserved field ids 2147483546/2147483545) for the CURRENTLY
VISIBLE rows matching the predicate — matched via the read shim's
lineage columns — at the next sequence number, so earlier snapshots are
untouched and re-inserted rows (CDC) survive per the spec's
sequence-number scoping.

UPDATE commits its position deletes and replacement rows ATOMICALLY in a
single snapshot (two manifests, one manifest list, one metadata swing) —
the reference's RowDelta (IcebergMetadata.finishWrite): no reader or
time-travel query can observe a state where the updated rows are absent.

Partitioned tables: ``partition_by`` on create records a real partition
spec (identity/bucket/truncate/year/month/day/hour); every write computes
the partition tuple per row (bucket via the spec's murmur3_x86_32),
repartitions so each emitted file holds exactly one tuple, and stores the
tuple in the manifest entry — the metadata read-side pruning keys on.
Appends and updates re-apply the table's default spec automatically.
Data files may be PARQUET (default) or ORC.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.sources.iceberg import (
    IcebergTable,
    read_avro_container,
    write_avro_container,
)
from trino_private_spark.sources.iceberg_testing import (
    MANIFEST_ENTRY_SCHEMA,
    MANIFEST_LIST_SCHEMA,
)

POS_DELETE_IDS = {"file_path": 2147483546, "pos": 2147483545}

_SPARK_TO_ICEBERG = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "binary": "binary",
}


def _iceberg_type(spark_type: str) -> str:
    t = spark_type.lower()
    if t in _SPARK_TO_ICEBERG:
        return _SPARK_TO_ICEBERG[t]
    if t.startswith("decimal"):
        return t  # decimal(p, s) spells the same
    if t.startswith("timestamp"):
        return "timestamp"
    raise ValueError(f"unsupported Iceberg column type: {spark_type}")


def _write_files_distributed(
    df: DataFrame,
    out_dir: str,
    field_ids: dict[str, int],
    part_cols: list[str] | None = None,
    file_format: str = "PARQUET",
) -> list[dict]:
    """Write one field-id-annotated parquet (or ORC) file per non-empty
    Spark partition of ``df`` under ``out_dir`` (executor-side pyarrow
    writers, Arrow batches — nothing is collected to the driver) and
    return per-file stats rows {path, record_count, file_size_in_bytes,
    partition}.

    ``part_cols`` names precomputed partition-VALUE columns (``__pv__*``):
    the caller has already ``repartition``-ed on them so same-tuple rows
    co-locate; each task then splits its batch per distinct tuple so every
    emitted file belongs to exactly ONE Iceberg partition (the invariant
    manifest-level pruning relies on). The pv columns are stripped from
    the stored data and recorded in the stats row instead."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    ids = dict(field_ids)
    pvs = list(part_cols or [])
    fmt = file_format.upper()
    if fmt not in ("PARQUET", "ORC"):
        raise ValueError(f"unsupported write format {file_format!r}")
    ext = fmt.lower()

    def write_partition(batches):
        import pyarrow as pa  # noqa: PLC0415 (executor-side import)

        collected = [b for b in batches if b.num_rows]
        if not collected:
            return
        table = pa.Table.from_batches(collected)

        def emit_one(tbl, part_json):
            data = tbl.drop_columns(pvs) if pvs else tbl
            fields = []
            for name in data.schema.names:
                f = data.schema.field(name)
                meta = {b"PARQUET:field_id": str(ids[name]).encode()}
                fields.append(pa.field(name, f.type, metadata=meta))
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.{ext}")
            cast = data.cast(pa.schema(fields))
            if fmt == "ORC":
                from pyarrow import orc  # noqa: PLC0415

                # ORC carries no parquet field ids; names are the contract
                orc.write_table(data, path)
            else:
                import pyarrow.parquet as pq  # noqa: PLC0415

                pq.write_table(cast, path)
            return pa.RecordBatch.from_pydict(
                {
                    "path": [path],
                    "record_count": [data.num_rows],
                    "file_size_in_bytes": [os.path.getsize(path)],
                    "partition_json": [part_json],
                }
            )

        if not pvs:
            yield emit_one(table, None)
            return
        pdf = table.to_pandas()
        for key, grp in pdf.groupby(pvs, dropna=False, sort=True):
            key = key if isinstance(key, tuple) else (key,)
            part = {
                c[len("__pv__") :]: (None if _is_na(v) else _plain(v))
                for c, v in zip(pvs, key)
            }
            yield emit_one(
                pa.Table.from_pandas(grp, preserve_index=False),
                json.dumps(part),
            )

    stats = df.mapInArrow(
        write_partition,
        "path string, record_count long, file_size_in_bytes long, "
        "partition_json string",
    ).collect()
    return [
        {
            "path": r["path"],
            "record_count": r["record_count"],
            "file_size_in_bytes": r["file_size_in_bytes"],
            "partition": (
                json.loads(r["partition_json"])
                if r["partition_json"] is not None
                else None
            ),
        }
        for r in stats
    ]


def _is_na(v) -> bool:
    import pandas as pd

    try:
        return v is None or bool(pd.isna(v))
    except (TypeError, ValueError):
        return False


def _plain(v):
    """numpy scalar -> plain Python (json/avro-encodable)."""
    import numpy as np

    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    return v


def _latest_version(location: str) -> int:
    import glob
    import re

    best = 0
    for p in glob.glob(os.path.join(location, "metadata", "*.metadata.json")):
        m = re.match(r"v?(\d+)", os.path.basename(p))
        if m:
            best = max(best, int(m.group(1)))
    return best


def _entry_schema(partition_avro: list[tuple[str, str]] | None) -> dict:
    """Manifest-entry Avro schema, extended with the table's partition
    record when the table is partitioned (spec: data_file.partition,
    field 102)."""
    import copy

    schema = copy.deepcopy(MANIFEST_ENTRY_SCHEMA)
    if partition_avro:
        part_rec = {
            "type": "record",
            "name": "r102",
            "fields": [
                {"name": n, "type": ["null", t]} for n, t in partition_avro
            ],
        }
        data_file = next(
            f for f in schema["fields"] if f["name"] == "data_file"
        )
        df_fields = data_file["type"]["fields"]
        at = next(
            i for i, f in enumerate(df_fields) if f["name"] == "file_format"
        )
        df_fields.insert(at + 1, {"name": "partition", "type": ["null", part_rec]})
    return schema


def _commit_snapshot(
    location: str,
    groups: list[tuple[list[dict], int]],
    *,
    operation: str,
    schema_fields: list[tuple[int, str, str]] | None = None,
    partition_spec: list[dict] | None = None,
    file_format: str = "PARQUET",
) -> int:
    """Commit ONE snapshot referencing every file group in ``groups``
    (``[(files, content), ...]``) — one manifest per group, all at the
    same sequence number, in one manifest list, in one metadata swing.
    This is the reference's atomic RowDelta shape
    (IcebergMetadata.finishWrite commits deletes + appends together); a
    crash before the final metadata.json write leaves only unreferenced
    orphan files, never an intermediate visible state. Creates the table
    metadata if this is the first commit (``schema_fields`` required;
    ``partition_spec`` optional spec fields
    ``[{name, transform, source-id, field-id}]``). Returns the new
    snapshot id."""
    md_dir = os.path.join(location, "metadata")
    os.makedirs(md_dir, exist_ok=True)
    version = _latest_version(location)
    if version == 0:
        if schema_fields is None:
            raise ValueError("new table needs schema_fields")
        metadata = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, location)),
            "location": location,
            "last-sequence-number": 0,
            "last-updated-ms": 0,
            "current-schema-id": 0,
            "schemas": [
                {
                    "type": "struct",
                    "schema-id": 0,
                    "fields": [
                        {"id": i, "name": n, "required": False, "type": t}
                        for i, n, t in schema_fields
                    ],
                }
            ],
            "default-spec-id": 0,
            "partition-specs": [
                {"spec-id": 0, "fields": partition_spec or []}
            ],
            "current-snapshot-id": -1,
            "snapshots": [],
        }
        prior_manifests: list[dict] = []
    else:
        metadata = IcebergTable(location).metadata
        cur = None
        cur_id = metadata.get("current-snapshot-id", -1)
        for s in metadata.get("snapshots", []):
            if s["snapshot-id"] == cur_id:
                cur = s
        prior_manifests = (
            read_avro_container(cur["manifest-list"]) if cur else []
        )

    spec_id = int(metadata.get("default-spec-id", 0))
    spec_fields = next(
        (
            s.get("fields", [])
            for s in metadata.get("partition-specs", [])
            if s.get("spec-id") == spec_id
        ),
        [],
    )
    part_avro = _partition_avro_fields(metadata, spec_fields)
    entry_schema = _entry_schema(part_avro)

    seq = int(metadata.get("last-sequence-number", 0)) + 1
    snap_id = (
        max(
            (s["snapshot-id"] for s in metadata.get("snapshots", [])),
            default=0,
        )
        + 1
    )
    now_ms = int(time.time() * 1000)

    new_manifests: list[dict] = []
    for gi, (new_files, content) in enumerate(groups):
        manifest_path = os.path.join(
            md_dir, f"manifest-{snap_id}-{gi}.avro"
        )
        entries = []
        for f in new_files:
            data_file = {
                "content": content,
                "file_path": f["path"],
                "file_format": f.get("file_format", file_format).upper(),
                "record_count": f["record_count"],
                "file_size_in_bytes": f["file_size_in_bytes"],
                "equality_ids": f.get("equality_ids"),
            }
            if part_avro:
                part = f.get("partition") or {}
                data_file["partition"] = {
                    n: part.get(n) for n, _ in part_avro
                }
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    # inherited from the manifest list
                    "sequence_number": None,
                    "data_file": data_file,
                }
            )
        write_avro_container(manifest_path, entry_schema, entries)
        new_manifests.append(
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": spec_id,
                "content": 0 if content == 0 else 1,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
            }
        )
    manifest_list_path = os.path.join(md_dir, f"snap-{snap_id}.avro")
    write_avro_container(
        manifest_list_path,
        MANIFEST_LIST_SCHEMA,
        list(prior_manifests) + new_manifests,
    )
    metadata["snapshots"] = list(metadata.get("snapshots", [])) + [
        {
            "snapshot-id": snap_id,
            "timestamp-ms": now_ms,
            "sequence-number": seq,
            "manifest-list": manifest_list_path,
            "summary": {"operation": operation},
        }
    ]
    metadata["current-snapshot-id"] = snap_id
    metadata["last-sequence-number"] = seq
    metadata["last-updated-ms"] = now_ms
    with open(os.path.join(md_dir, f"v{version + 1}.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    return snap_id


def _partition_avro_fields(
    metadata: dict, spec_fields: list[dict]
) -> list[tuple[str, str]]:
    """(name, avro primitive type) per partition field — the manifest
    partition-record layout implied by transform + source type."""
    if not spec_fields:
        return []
    by_id: dict[int, str] = {}
    cur = metadata.get("current-schema-id")
    schema = next(
        (s for s in metadata.get("schemas", []) if s.get("schema-id") == cur),
        {},
    )
    for fld in schema.get("fields", []):
        t = fld.get("type")
        by_id[fld["id"]] = t if isinstance(t, str) else "string"
    out: list[tuple[str, str]] = []
    for f in spec_fields:
        tr = f.get("transform", "identity").lower()
        src_t = by_id.get(f.get("source-id"), "string")
        if tr.startswith("bucket") or tr in (
            "year", "years", "month", "months", "hour", "hours",
        ):
            avro_t = "int"
        elif tr in ("day", "days"):
            avro_t = "int"  # days from epoch
        elif tr.startswith("truncate"):
            avro_t = "string" if src_t == "string" else "long"
        elif tr == "void":
            avro_t = "int"
        else:  # identity
            avro_t = {
                "int": "int", "long": "long", "string": "string",
                "double": "double", "float": "float",
                "boolean": "boolean", "date": "int",
            }.get(src_t, "string")
        out.append((f["name"], avro_t))
    return out


def _bucket_pv(n: int, source_type: str):
    """Arrow pandas UDF computing the spec's bucket partition value —
    murmur3_x86_32 over canonical bytes (iceberg_partition.bucket_hash),
    NOT Spark's F.hash (seed 42, 4-byte ints: a different layout)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    def conv(v):
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        return v

    def run(s):  # annotation-free: hints would need module-global resolution
        from trino_private_spark.sources.iceberg_partition import bucket_hash

        return s.map(
            lambda v: None
            if v is None or (isinstance(v, float) and pd.isna(v))
            else (bucket_hash(conv(v), source_type) & 0x7FFFFFFF) % n
        )

    from pyspark.sql.functions import PandasUDFType

    return pandas_udf(run, IntegerType(), PandasUDFType.SCALAR)


def _pv_expr(source_col: str, transform: str, source_type: str):
    """Spark Column computing an Iceberg partition transform, JVM-side for
    everything but bucket (which needs the spec's exact murmur3)."""
    import re as _re

    from pyspark.sql import functions as F

    c = F.col(source_col)
    t = transform.lower()
    if t == "identity":
        if source_type == "date":
            return F.datediff(c, F.lit("1970-01-01")).cast("int")
        return c
    if t == "void":
        return F.lit(None).cast("int")
    m = _re.fullmatch(r"bucket\[(\d+)\]", t)
    if m:
        return _bucket_pv(int(m.group(1)), source_type)(c)
    m = _re.fullmatch(r"truncate\[(\d+)\]", t)
    if m:
        w = int(m.group(1))
        if source_type == "string":
            return F.substring(c, 1, w)
        return (c - F.pmod(c, F.lit(w))).cast("long")
    if t in ("year", "years"):
        return (F.year(c) - 1970).cast("int")
    if t in ("month", "months"):
        return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("int")
    if t in ("day", "days"):
        return F.datediff(c.cast("date"), F.lit("1970-01-01")).cast("int")
    if t in ("hour", "hours"):
        return F.floor(F.unix_micros(c) / 3_600_000_000).cast("int")
    raise ValueError(f"unknown partition transform {transform!r}")


def _normalize_partition_by(
    partition_by, schema_fields: list[tuple[int, str, str]]
) -> list[dict]:
    """User spec (['col'] or [('col', 'bucket[16]')]) -> metadata.json
    partition-spec fields [{name, transform, source-id, field-id}]."""
    by_name = {n: (i, t) for i, n, t in schema_fields}
    out = []
    for k, item in enumerate(partition_by or []):
        col, transform = item if isinstance(item, tuple) else (item, "identity")
        if col not in by_name:
            raise ValueError(f"partition column {col!r} not in schema")
        suffix = {
            "identity": "", "void": "_null",
        }.get(transform, "_" + transform.split("[")[0])
        out.append(
            {
                "name": f"{col}{suffix}",
                "transform": transform,
                "source-id": by_name[col][0],
                "field-id": 1000 + k,
            }
        )
    return out


def _apply_spec(df: DataFrame, spec_fields: list[dict], schema) -> tuple:
    """Append __pv__ columns per spec field and repartition on them so
    same-partition rows co-locate (one file per partition tuple)."""
    from pyspark.sql import functions as F

    if not spec_fields:
        return df, []
    by_id = {f["id"]: (f["name"], f["type"]) for f in schema.get("fields", [])}
    pv_cols = []
    for f in spec_fields:
        src_name, src_type = by_id[f["source-id"]]
        pv = f"__pv__{f['name']}"
        df = df.withColumn(
            pv,
            _pv_expr(
                src_name,
                f.get("transform", "identity"),
                src_type if isinstance(src_type, str) else "string",
            ),
        )
        pv_cols.append(pv)
    return df.repartition(*[F.col(c) for c in pv_cols]), pv_cols


def iceberg_create(
    df: DataFrame,
    location: str,
    partition_by: list | None = None,
    file_format: str = "PARQUET",
) -> None:
    """CTAS: materialize ``df`` as a brand-new Iceberg v2 table
    (IcebergMetadata.beginCreateTable + finishCreateTable analogue).

    ``partition_by``: columns / (column, transform) pairs — identity,
    bucket[N], truncate[W], year, month, day, hour — recorded as the
    table's partition spec; every data file then belongs to one partition
    tuple and manifest entries carry the tuple for scan pruning."""
    if _latest_version(location):
        raise ValueError(f"Iceberg table already exists at {location}")
    fields = [
        (i + 1, f.name, _iceberg_type(f.dataType.simpleString()))
        for i, f in enumerate(df.schema.fields)
    ]
    field_ids = {n: i for i, n, _ in fields}
    spec_fields = _normalize_partition_by(partition_by, fields)
    schema = {
        "fields": [
            {"id": i, "name": n, "type": t} for i, n, t in fields
        ]
    }
    df, pv_cols = _apply_spec(df, spec_fields, schema)
    files = _write_files_distributed(
        df,
        os.path.join(location, "data"),
        field_ids,
        part_cols=pv_cols,
        file_format=file_format,
    )
    _commit_snapshot(
        location,
        [(files, 0)],
        operation="append",
        schema_fields=fields,
        partition_spec=spec_fields,
        file_format=file_format,
    )


def iceberg_append(
    df: DataFrame, location: str, file_format: str = "PARQUET"
) -> None:
    """INSERT INTO (append snapshot; IcebergMetadata.beginInsert). A
    partitioned table's default spec is applied automatically — appended
    files stay one-partition-per-file and prunable."""
    table = IcebergTable(location)
    schema = table._current_schema()  # noqa: SLF001
    field_ids = {f["name"]: f["id"] for f in schema.get("fields", [])}
    missing = [c for c in df.columns if c not in field_ids]
    if missing:
        raise ValueError(f"columns not in table schema: {missing}")
    df = df.select(*[f["name"] for f in schema.get("fields", [])])
    spec_id = int(table.metadata.get("default-spec-id", 0))
    spec_fields = next(
        (
            s.get("fields", [])
            for s in table.metadata.get("partition-specs", [])
            if s.get("spec-id") == spec_id
        ),
        [],
    )
    df, pv_cols = _apply_spec(df, spec_fields, schema)
    files = _write_files_distributed(
        df,
        os.path.join(location, "data"),
        field_ids,
        part_cols=pv_cols,
        file_format=file_format,
    )
    _commit_snapshot(
        location, [(files, 0)], operation="append", file_format=file_format
    )


def iceberg_delete(
    spark: SparkSession, location: str, condition: str
) -> int:
    """DELETE FROM ... WHERE: write position-delete files for the
    currently visible rows matching ``condition`` and commit them as a
    delete snapshot (IcebergMetadata.executeDelete analogue). Returns the
    number of rows deleted."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import parse_partition_predicate

    table = IcebergTable(location)
    # the DELETE predicate prunes its own scan: conjunctive prunable terms
    # skip non-matching partitions at the manifest level (conservative —
    # a pruned file provably holds no matching row), so a partition-
    # scoped DELETE on a 100 TB table reads only the matching partitions
    matches = (
        table.read(
            spark,
            with_lineage=True,
            partition_filter=parse_partition_predicate(condition) or None,
        )
        .where(condition)
        .select(
            F.col("__file").alias("file_path"),
            F.col("__pos").cast("long").alias("pos"),
        )
    )
    files = _write_files_distributed(
        matches, os.path.join(location, "data"), POS_DELETE_IDS
    )
    deleted = sum(f["record_count"] for f in files)
    if files:
        _commit_snapshot(location, [(files, 1)], operation="delete")
    return deleted


def iceberg_update(
    spark: SparkSession,
    location: str,
    assignments: dict[str, str],
    condition: str,
) -> int:
    """UPDATE ... SET ... WHERE as merge-on-read: materialize the updated
    versions of the matching rows, then commit the position-delete files
    for the originals AND the appended new versions in ONE snapshot — two
    manifests (content=deletes, content=data) in one manifest list at the
    same sequence number, exactly the reference's atomic RowDelta
    (IcebergMetadata finishWrite). There is no intermediate visible state:
    readers and time travel see either the pre-update snapshot or the
    fully-updated one, and a crash mid-write leaves only unreferenced
    orphan files. The deletes cannot touch the new rows even though both
    carry the same sequence number: position deletes name (file, pos)
    pairs of the OLD files only. Returns the number of rows updated.

    The updated rows are localCheckpoint'ed BEFORE anything commits —
    they are defined against the pre-update table read, and a lazy
    re-evaluation after the commit would see them changed already.
    """
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import parse_partition_predicate

    table = IcebergTable(location)
    # UPDATE's matching scan prunes from its own predicate, like DELETE
    cur = table.read(
        spark,
        with_lineage=True,
        partition_filter=parse_partition_predicate(condition) or None,
    ).localCheckpoint(eager=True)
    matched = cur.where(condition)
    upd = matched
    for c, expr in assignments.items():
        upd = upd.withColumn(c, F.expr(expr))
    data_cols = [c for c in cur.columns if c not in ("__file", "__pos")]
    upd = upd.select(*data_cols).localCheckpoint(eager=True)
    n = upd.count()
    if n == 0:
        return 0
    positions = matched.select(
        F.col("__file").alias("file_path"),
        F.col("__pos").cast("long").alias("pos"),
    )
    del_files = _write_files_distributed(
        positions, os.path.join(location, "data"), POS_DELETE_IDS
    )
    # new data files follow the table's partition spec like any append
    schema = table._current_schema()  # noqa: SLF001
    field_ids = {f["name"]: f["id"] for f in schema.get("fields", [])}
    spec_id = int(table.metadata.get("default-spec-id", 0))
    spec_fields = next(
        (
            s.get("fields", [])
            for s in table.metadata.get("partition-specs", [])
            if s.get("spec-id") == spec_id
        ),
        [],
    )
    upd, pv_cols = _apply_spec(upd, spec_fields, schema)
    data_files = _write_files_distributed(
        upd, os.path.join(location, "data"), field_ids, part_cols=pv_cols
    )
    _commit_snapshot(
        location,
        [(del_files, 1), (data_files, 0)],
        operation="overwrite",
    )
    return n
