"""Round-10 probes: SQL-text function reachability (round-9 VERDICT
What's missing #1 — the starts_with class), dialect-aware string lexing
in the pruning plane (What's wrong #1), Trino literal-backslash
semantics through translate() (What's missing #3), and the reference-
shaped $snapshots table (What's missing #2, SnapshotsTable.java:53-58).

DuckDB is a near-ideal oracle for the dialect probes: its string
literals treat backslash as an ordinary character (Trino semantics) and
it ships isodow/dayofyear/isoyear/hamming/starts_with with the same
definitions the reference documents (functions/datetime.rst,
functions/string.rst)."""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


@probe(
    "p_sql_starts_with_prune",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n, TRUE AS pruned
    FROM nation WHERE n_name LIKE 'A%'
    """,
    tags=("dialect", "iceberg", "pruning"),
)
def p_sql_starts_with_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """starts_with(col, 'p') written as SQL TEXT resolves (translate
    rename -> Spark startswith) AND drives partition pruning (the
    iceberg.py prefix-domain branch the round-9 verdict found dead on
    the SQL-text path). The scanned<candidate file-count fact rides in
    the hash."""
    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO, _local

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_swprune_") + "/t"
    eng.ctas(
        "ice_sw_nation",
        "SELECT n_nationkey, n_name, substr(n_name, 1, 1) AS ini "
        "FROM nation",
        path=loc, fmt="iceberg", partition_by=["ini"],
    )
    out = eng.sql(
        "SELECT COUNT(*) AS n FROM ice_sw_nation "
        "WHERE starts_with(n_name, 'A')"
    ).localCheckpoint(eager=True)
    scan = IO_SCAN_INFO[_local(loc)]
    pruned = bool(
        scan["pruned_data_files"] > 0
        and scan["scanned_data_files"] < scan["candidate_data_files"]
    )
    return out.select(
        F.col("n").cast("long").alias("n"), F.lit(pruned).alias("pruned")
    )


@probe(
    "p_sql_dialect_escape_or",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_spark,
           CAST(0 AS BIGINT) AS n_trino
    FROM nation WHERE n_regionkey = 1
    """,
    tags=("dialect", "iceberg", "pruning"),
)
def p_sql_dialect_escape_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-9 wrong-results attack as a permanent probe: in
    dialect='spark', ``seg = 'a\\'--b' OR grp = 1`` lexes the literal by
    Spark's rule — the OR branch stays live and the depth-0-OR guard
    keeps the predicate unprunable (n_spark = the OR result). The SAME
    text in trino dialect means literal ``a\\`` then a comment — zero
    matching rows (n_trino = 0)."""
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_escor_") + "/t"
    eng.ctas(
        "ice_esc_nation",
        "SELECT n_nationkey, n_regionkey AS grp, "
        "substr(n_name, 1, 1) AS seg FROM nation",
        path=loc, fmt="iceberg", partition_by=["seg"],
    )
    n_spark = eng.sql(
        r"SELECT COUNT(*) AS n FROM ice_esc_nation "
        r"WHERE seg = 'a\'--b' OR grp = 1",
        dialect="spark",
    ).collect()[0]["n"]
    n_trino = eng.sql(
        r"SELECT COUNT(*) AS n FROM ice_esc_nation "
        r"WHERE seg = 'a\'--b' OR grp = 1"
    ).collect()[0]["n"]
    return spark.createDataFrame(
        [(int(n_spark), int(n_trino))], "n_spark long, n_trino long"
    )


@probe(
    "p_sql_backslash_literals",
    oracle=r"""
    SELECT n_nationkey,
           n_name || '\n' AS tagged,
           length(n_name || chr(92)) AS len_bs
    FROM nation ORDER BY n_nationkey
    """,
    tags=("dialect",),
)
def p_sql_backslash_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    r"""Trino string literals have NO backslash escapes (SqlBase.g4
    STRING): '\n' is backslash-n, two characters. translate() doubles
    backslashes so Spark's parser preserves that. DuckDB shares Trino's
    rule for plain literals — '\n' concatenated verbatim — making it an
    exact oracle (chr(92) spells the lone backslash there — DuckDB plain
    literals, like Trino's, have no backslash escapes)."""
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    t = T(spark, sf_dir)
    t.nation.createOrReplaceTempView("v_r10_nation")
    return eng.sql(
        r"SELECT n_nationkey, n_name || '\n' AS tagged, "
        r"length(n_name || '\') AS len_bs "
        r"FROM v_r10_nation ORDER BY n_nationkey"
    )


@probe(
    "p_sql_fn_shims_datetime",
    oracle="""
    SELECT n_nationkey,
           CAST(isodow(DATE '1995-01-01' + INTERVAL (n_nationkey) DAY) AS BIGINT) AS dow,
           CAST(dayofyear(DATE '1995-01-01' + INTERVAL (n_nationkey) DAY) AS BIGINT) AS doy_v,
           CAST(isoyear(DATE '1995-01-01' + INTERVAL (n_nationkey) DAY) AS BIGINT) AS yow_v,
           CAST(hamming(substr(n_name, 1, 3), 'ABC') AS BIGINT) AS hd,
           CAST(n_nationkey | 8 AS BIGINT) AS bor,
           CAST(xor(n_nationkey, 5) AS BIGINT) AS bxor
    FROM nation ORDER BY n_nationkey
    """,
    tags=("functions", "dialect"),
)
def p_sql_fn_shims_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry functions previously unreachable from SQL text, now
    resolved via session SQL-UDF shims (functions/sql_shims.py) and
    renames, checked against DuckDB's same-definition builtins: ISO
    day_of_week (DateTimeFunctions.java dow = isodow), day_of_year,
    ISO year_of_week (= isoyear), character hamming_distance
    (StringFunctions.java), non-mod-64 bitwise or/xor
    (BitwiseFunctions.java)."""
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    t = T(spark, sf_dir)
    t.nation.createOrReplaceTempView("v_r10_nation")
    return eng.sql(
        "SELECT n_nationkey, "
        "day_of_week(date_add('day', n_nationkey, DATE '1995-01-01')) AS dow, "
        "day_of_year(date_add('day', n_nationkey, DATE '1995-01-01')) AS doy_v, "
        "year_of_week(date_add('day', n_nationkey, DATE '1995-01-01')) AS yow_v, "
        "hamming_distance(substr(n_name, 1, 3), 'ABC') AS hd, "
        "bitwise_or(n_nationkey, 8) AS bor, "
        "bitwise_xor(n_nationkey, 5) AS bxor "
        "FROM v_r10_nation ORDER BY n_nationkey"
    )


@probe(
    "p_sql_fn_shims_strings",
    oracle="""
    SELECT n_nationkey,
           starts_with(n_name, 'A') AS sw,
           lpad(upper(to_hex(ascii(substr(n_name, 1, 1)))), 4, '0') AS hx,
           replace(replace(to_base64(encode(n_name)), '+', '-'), '/', '_') AS b64u,
           CAST(json_array_length(json_extract('{"a": [1,2,3]}', '$.a')) AS BIGINT) AS js,
           n_name AS rt
    FROM nation ORDER BY n_nationkey
    """,
    tags=("functions", "dialect"),
)
def p_sql_fn_shims_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/JSON/binary shim family end-to-end over nation:
    starts_with (StringFunctions.java), char2hexint
    (TeradataStringFunctions.java), base64url + utf8 round-trips
    (VarbinaryFunctions.java), json_size (JsonFunctions.java)."""
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    t = T(spark, sf_dir)
    t.nation.createOrReplaceTempView("v_r10_nation")
    return eng.sql(
        "SELECT n_nationkey, "
        "starts_with(n_name, 'A') AS sw, "
        "char2hexint(substr(n_name, 1, 1)) AS hx, "
        "to_base64url(to_utf8(n_name)) AS b64u, "
        "json_size('{\"a\": [1,2,3]}', '$.a') AS js, "
        "from_utf8(to_utf8(n_name)) AS rt "
        "FROM v_r10_nation ORDER BY n_nationkey"
    )


@probe(
    "p_iceberg_snapshots_ref_schema",
    oracle="""
    SELECT * FROM (VALUES
        (1, 'append', TRUE,  TRUE),
        (2, 'append', FALSE, TRUE),
        (3, 'delete', FALSE, TRUE))
      AS t(seq, operation, parent_is_null, committed_at_ok)
    ORDER BY seq
    """,
    tags=("sources", "iceberg"),
)
def p_iceberg_snapshots_ref_schema(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """$snapshots carries the reference's column set
    (SnapshotsTable.java:53-58): committed_at TIMESTAMP (ordering the
    history), parent_id BIGINT (null only for the root snapshot), in
    the reference's column order."""
    from trino_private_spark.api import Engine
    from trino_private_spark.sources.iceberg import read_iceberg

    eng = Engine(spark)
    eng.attach(sf_dir)
    loc = tempfile.mkdtemp(prefix="tps_snapref_") + "/t"
    eng.ctas(
        "ice_snapref",
        "SELECT n_nationkey AS k FROM nation",
        path=loc, fmt="iceberg",
    )
    eng.sql("INSERT INTO ice_snapref SELECT n_nationkey + 100 FROM nation")
    eng.sql("DELETE FROM ice_snapref WHERE k % 7 = 0")
    df = read_iceberg(spark, loc + "$snapshots")
    assert df.columns[:6] == [
        "committed_at", "snapshot_id", "parent_id", "operation",
        "manifest_list", "summary",
    ], df.columns
    rows = eng.sql(
        'SELECT sequence_number, operation, parent_id, committed_at, '
        'snapshot_id FROM "ice_snapref$snapshots" ORDER BY committed_at'
    ).collect()
    by_id = {r["snapshot_id"]: r for r in rows}
    out = [
        (
            int(r["sequence_number"]),
            r["operation"],
            r["parent_id"] is None,
            # committed_at orders consistently with sequence_number and
            # parent pointers resolve to the previous snapshot
            r["parent_id"] is None or r["parent_id"] in by_id,
        )
        for r in rows
    ]
    return spark.createDataFrame(
        out, "seq int, operation string, parent_is_null boolean, "
        "committed_at_ok boolean",
    )
