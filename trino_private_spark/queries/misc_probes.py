"""Remaining scalar-family probes: URL extraction, sequences/ranges,
format_string, greatest/least, concat_ws, null-handling helpers
(SURVEY §2.5 families not yet oracle-probed)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe

_URLS = [
    (1, "https://example.com:8080/path/x?k=v&z=1#frag"),
    (2, "http://data.example.org/a/b/c?q=spark"),
    (3, "https://example.net/?only=1"),
    (4, "ftp://files.example.com/pub/file.txt"),
    (5, "https://sub.domain.example.com/deep/path"),
]
_URL_VALUES = ", ".join(f"({i}, '{u}')" for i, u in _URLS)


@probe(
    "p_url",
    oracle=f"""
    WITH u(id, url) AS (VALUES {_URL_VALUES})
    SELECT id,
           regexp_extract(url, '^([a-z]+)://', 1) AS proto,
           regexp_extract(url, '^[a-z]+://([^/:?#]+)', 1) AS host,
           COALESCE(NULLIF(regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1), ''), '/') AS path,
           regexp_extract(url, 'k=([^&#]*)', 1) AS k_param
    FROM u ORDER BY id
    """,
    tags=("functions",),
)
def p_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL family (UrlFunctions.java: url_extract_protocol/host/path/
    parameter) via parse_url; DuckDB oracle decomposes with regexes.
    Path normalization: parse_url returns '' for a bare-host URL with
    trailing slash handling folded to '/' on both sides."""
    df = spark.createDataFrame(_URLS, "id int, url string")
    u = F.col("url")
    return df.select(
        "id",
        F.parse_url(u, F.lit("PROTOCOL")).alias("proto"),
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.coalesce(
            F.nullif(F.parse_url(u, F.lit("PATH")), F.lit("")), F.lit("/")
        ).alias("path"),
        F.coalesce(F.parse_url(u, F.lit("QUERY"), F.lit("k")), F.lit("")).alias(
            "k_param"
        ),
    ).orderBy("id")


@probe(
    "p_sequence",
    oracle="""
    SELECT n_nationkey,
           len(range(1, n_nationkey + 2)) AS seq_len,
           (SELECT CAST(SUM(x) AS BIGINT) FROM UNNEST(range(1, n_nationkey + 2)) AS t(x)) AS seq_sum
    FROM nation WHERE n_nationkey BETWEEN 1 AND 10 ORDER BY n_nationkey
    """,
    tags=("functions",),
)
def p_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequence() generation + aggregation over it (SequenceFunction.java;
    DuckDB range(a,b) is exclusive-stop, Spark sequence inclusive — aligned
    via +2/+1 bounds)."""
    t = T(spark, sf_dir)
    seq = F.sequence(F.lit(1).cast("bigint"), (F.col("n_nationkey") + 1).cast("bigint"))
    return (
        t.nation.where(F.col("n_nationkey").between(1, 10))
        .select(
            "n_nationkey",
            F.size(seq).cast("bigint").alias("seq_len"),
            F.aggregate(
                seq, F.lit(0).cast("bigint"), lambda acc, x: acc + x
            ).alias("seq_sum"),
        )
        .orderBy("n_nationkey")
    )


@probe(
    "p_format_greatest",
    oracle="""
    SELECT o_orderkey,
           printf('%s|%.2f', o_orderstatus, ROUND(o_totalprice, 2)) AS tag,
           GREATEST(o_orderkey, o_custkey) AS g,
           LEAST(o_orderkey, o_custkey) AS l,
           concat_ws('-', o_orderstatus, o_orderpriority) AS cw
    FROM orders ORDER BY o_orderkey LIMIT 500
    """,
    tags=("functions",),
)
def p_format_greatest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """format (FormatFunction.java -> format_string/printf), greatest/least
    (Greatest.java), concat_ws."""
    t = T(spark, sf_dir)
    return (
        t.orders.select(
            "o_orderkey",
            F.format_string(
                "%s|%.2f", F.col("o_orderstatus"), F.round(F.col("o_totalprice"), 2)
            ).alias("tag"),
            F.greatest("o_orderkey", "o_custkey").alias("g"),
            F.least("o_orderkey", "o_custkey").alias("l"),
            F.concat_ws("-", "o_orderstatus", "o_orderpriority").alias("cw"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@probe(
    "p_is_distinct",
    oracle="""
    SELECT COUNT(*) FILTER (WHERE o_orderstatus IS DISTINCT FROM 'O') AS not_open,
           COUNT(*) FILTER (WHERE o_orderstatus IS NOT DISTINCT FROM 'F') AS is_final
    FROM orders
    """,
    tags=("functions",),
)
def p_is_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] DISTINCT FROM (null-safe comparison; GenericDistinctFrom
    operators -> Spark's <=> / eqNullSafe)."""
    t = T(spark, sf_dir)
    return t.orders.agg(
        F.count_if(~F.col("o_orderstatus").eqNullSafe(F.lit("O"))).alias("not_open"),
        F.count_if(F.col("o_orderstatus").eqNullSafe(F.lit("F"))).alias("is_final"),
    )


@probe(
    "p_show_stats_query",
    oracle="""
    WITH q AS (
      SELECT o_orderstatus AS st,
             CASE WHEN o_custkey % 10 = 0 THEN NULL ELSE o_custkey END AS ck,
             CAST(o_orderdate AS DATE) AS od
      FROM orders
    )
    SELECT 'st' AS column_name,
           CAST(sum(length(st)) AS DOUBLE) AS data_size,
           CAST(count(DISTINCT st) AS DOUBLE) AS distinct_values_count,
           CAST(count(*) - count(st) AS DOUBLE) / count(*) AS nulls_fraction,
           CAST(NULL AS DOUBLE) AS row_count,
           CAST(min(st) AS VARCHAR) AS low_value,
           CAST(max(st) AS VARCHAR) AS high_value
    FROM q
    UNION ALL
    SELECT 'ck', NULL, CAST(count(DISTINCT ck) AS DOUBLE),
           CAST(count(*) - count(ck) AS DOUBLE) / count(*), NULL,
           CAST(min(ck) AS VARCHAR), CAST(max(ck) AS VARCHAR) FROM q
    UNION ALL
    SELECT 'od', NULL, CAST(count(DISTINCT od) AS DOUBLE),
           CAST(count(*) - count(od) AS DOUBLE) / count(*), NULL,
           CAST(min(od) AS VARCHAR), CAST(max(od) AS VARCHAR) FROM q
    UNION ALL
    SELECT NULL, NULL, NULL, NULL, CAST(count(*) AS DOUBLE), NULL, NULL
    FROM q
    """,
    tags=("ddl",),
)
def p_show_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHOW STATS FOR (query) — SqlBase.g4:139, the query branch of
    ShowStatsRewrite.java. Engine.show_stats_for_query computes the
    reference's 7-column result shape from the query itself in one
    aggregation pass (exact distincts, so fully hash-oracled; the table
    form p_* reads ANALYZE catalog stats instead)."""
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    return eng.sql(
        "SHOW STATS FOR (SELECT o_orderstatus AS st, "
        "CASE WHEN o_custkey % 10 = 0 THEN NULL ELSE o_custkey END AS ck, "
        "CAST(o_orderdate AS DATE) AS od FROM orders)"
    )
