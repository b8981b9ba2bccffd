"""Edge-semantics probes: outer unnest, numeric RANGE frames, null join
keys, multi-percentile arrays — the corner cases the reference's test suites
(AbstractTestQueries/AbstractTestJoinQueries) cover heavily."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


@probe(
    "p_unnest_outer",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN []
                  ELSE string_split(substr(text, 1, 20), ' ') END AS toks
      FROM documents WHERE doc_id < 30)
    SELECT doc_id, COALESCE(w, '<empty>') AS w
    FROM d LEFT JOIN LATERAL (SELECT UNNEST(toks) AS w) u ON TRUE
    ORDER BY doc_id, w
    """,
    tags=("core",),
)
def p_unnest_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT JOIN UNNEST (outer unnest: empty arrays keep their row with NULL
    element) -> explode_outer. Ref: operator/unnest/UnnestOperator.java
    (outer flag on UnnestNode)."""
    t = T(spark, sf_dir)
    toks = F.when(F.col("doc_id") % 3 == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.substring(F.col("text"), 1, 20), " ")
    )
    return (
        t.documents.where(F.col("doc_id") < 30)
        .select("doc_id", F.explode_outer(toks).alias("w"))
        .select("doc_id", F.coalesce(F.col("w"), F.lit("<empty>")).alias("w"))
        .orderBy("doc_id", "w")
    )


@probe(
    "p_range_numeric",
    oracle="""
    SELECT o_orderkey,
           COUNT(*) OVER (ORDER BY o_totalprice
                          RANGE BETWEEN 1000.0 PRECEDING AND 1000.0 FOLLOWING) AS near
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("core",),
)
def p_range_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame (value-based neighborhood count).
    Ref: operator/window/RangeFraming.java."""
    t = T(spark, sf_dir)
    w = Window.orderBy("o_totalprice").rangeBetween(-1000, 1000)
    return (
        t.orders.select(
            "o_orderkey", F.count(F.lit(1)).over(w).alias("near")
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@probe(
    "p_join_null_keys",
    oracle="""
    WITH l AS (SELECT o_orderkey, NULLIF(o_custkey % 7, 0) AS k FROM orders WHERE o_orderkey < 2000),
         r AS (SELECT NULLIF(c_custkey % 7, 0) AS k, c_custkey FROM customer WHERE c_custkey < 100)
    SELECT
      (SELECT COUNT(*) FROM l JOIN r ON l.k = r.k) AS inner_n,
      (SELECT COUNT(*) FROM l LEFT JOIN r ON l.k = r.k) AS left_n,
      (SELECT COUNT(*) FROM l JOIN r ON l.k IS NOT DISTINCT FROM r.k) AS nullsafe_n
    """,
    tags=("core",),
)
def p_join_null_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL join-key semantics: equi-join drops NULL keys; null-safe
    (IS NOT DISTINCT FROM / <=>) matches them. The reference covers this in
    AbstractTestJoinQueries; at scale NULL-heavy keys are also the classic
    skew source (see operators/skew.salted_join)."""
    t = T(spark, sf_dir)
    l = t.orders.where(F.col("o_orderkey") < 2000).select(
        "o_orderkey", F.nullif(F.col("o_custkey") % 7, F.lit(0)).alias("lk")
    )
    r = t.customer.where(F.col("c_custkey") < 100).select(
        F.nullif(F.col("c_custkey") % 7, F.lit(0)).alias("rk"), "c_custkey"
    )
    inner_n = l.join(r, l["lk"] == r["rk"]).count()
    left_n = l.join(r, l["lk"] == r["rk"], "left").count()
    nullsafe_n = l.join(r, l["lk"].eqNullSafe(r["rk"])).count()
    return spark.createDataFrame(
        [(inner_n, left_n, nullsafe_n)], "inner_n bigint, left_n bigint, nullsafe_n bigint"
    )


@probe(
    "p_percentile_array",
    oracle="""
    SELECT ROUND(q[1], 4) AS p25, ROUND(q[2], 4) AS p50, ROUND(q[3], 4) AS p75
    FROM (SELECT quantile_cont(o_totalprice, [0.25, 0.5, 0.75]) AS q FROM orders)
    """,
    tags=("functions",),
)
def p_percentile_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-quantile in one pass (Trino approx_percentile(x, ARRAY[...])
    shape, computed exactly). Ref: FunctionRegistry.java:435-443."""
    t = T(spark, sf_dir)
    q = F.percentile("o_totalprice", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)))
    return t.orders.agg(q.alias("q")).select(
        F.round(F.element_at("q", 1), 4).alias("p25"),
        F.round(F.element_at("q", 2), 4).alias("p50"),
        F.round(F.element_at("q", 3), 4).alias("p75"),
    )


@probe(
    "p_unnest_multi",
    oracle="""
    WITH u AS (
      SELECT n_nationkey,
             unnest(range(1, n_nationkey % 4 + 2)) AS v1,
             unnest(range(10, 11 + n_nationkey % 3)) AS v2
      FROM nation)
    SELECT n_nationkey,
           CAST(COALESCE(v1, v2 - 9) AS BIGINT) AS ord,
           CAST(v1 AS BIGINT) AS v1, CAST(v2 AS BIGINT) AS v2
    FROM u ORDER BY n_nationkey, ord
    """,
    tags=("relational",),
)
def p_unnest_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-argument UNNEST(a1, a2) WITH ORDINALITY — the reference zips
    arrays positionally, null-padding to the longest
    (operator/unnest/UnnestOperator.java multi-channel unnesters).  Spark:
    arrays_zip + posexplode.  DuckDB's parallel unnest has identical
    zip semantics, so the probe carries a full hash oracle."""
    t = T(spark, sf_dir)
    base = t.nation.select(
        "n_nationkey",
        F.sequence(F.lit(1), F.col("n_nationkey") % 4 + 1).alias("a1"),
        F.sequence(F.lit(10), F.col("n_nationkey") % 3 + 10).alias("a2"),
    )
    z = base.select(
        "n_nationkey", F.posexplode(F.arrays_zip("a1", "a2")).alias("pos", "z")
    )
    return z.select(
        "n_nationkey",
        (F.col("pos") + 1).cast("long").alias("ord"),
        F.col("z.a1").cast("long").alias("v1"),
        F.col("z.a2").cast("long").alias("v2"),
    ).orderBy("n_nationkey", "ord")


@probe(
    "p_unnest_map",
    oracle="""
    WITH u AS (
      SELECT n_nationkey, unnest(range(1, n_nationkey % 4 + 2)) AS k
      FROM nation)
    SELECT n_nationkey, CAST(k AS BIGINT) AS k,
           CAST(k * 100 + n_nationkey AS BIGINT) AS v
    FROM u ORDER BY n_nationkey, k
    """,
    tags=("relational",),
)
def p_unnest_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST(map) -> (key, value) rows (MapUnnester in
    operator/unnest/).  Spark: explode over a map column; the map is built
    per row with map_from_arrays so DuckDB reproduces the pairs
    relationally."""
    t = T(spark, sf_dir)
    keys = F.sequence(F.lit(1), F.col("n_nationkey") % 4 + 1)
    vals = F.transform(keys, lambda k: k * 100 + F.col("n_nationkey"))
    base = t.nation.select(
        "n_nationkey", F.map_from_arrays(keys, vals).alias("m")
    )
    return (
        base.select("n_nationkey", F.explode("m").alias("k", "v"))
        .select(
            "n_nationkey", F.col("k").cast("long").alias("k"), F.col("v").cast("long").alias("v")
        )
        .orderBy("n_nationkey", "k")
    )


@probe(
    "p_row_comparison",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE (o_orderstatus, o_orderpriority) > ('O', '3-MEDIUM')
      AND o_orderkey <= 2000
    ORDER BY o_orderkey
    """,
    tags=("relational",),
)
def p_row_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-value constructor comparison (SqlBase.g4 rowConstructor;
    GenericComparisonOperators over ROW types): lexicographic (a, b) >
    (x, y).  Spark compares structs lexicographically, DuckDB compares
    row constructors the same way."""
    t = T(spark, sf_dir)
    return (
        t.orders.where(
            (F.struct("o_orderstatus", "o_orderpriority") > F.struct(
                F.lit("O").alias("o_orderstatus"),
                F.lit("3-MEDIUM").alias("o_orderpriority"),
            ))
            & (F.col("o_orderkey") <= 2000)
        )
        .select("o_orderkey", "o_orderstatus", "o_orderpriority")
        .orderBy("o_orderkey")
    )


@probe(
    "p_between_symmetric",
    oracle="""
    SELECT o_orderkey,
           CAST(o_totalprice BETWEEN 100000 AND 200000 AS BOOLEAN) AS plain,
           CAST(o_totalprice BETWEEN LEAST(200000, 100000) AND GREATEST(200000, 100000) AS BOOLEAN) AS sym_swapped
    FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey
    """,
    tags=("relational",),
)
def p_between_symmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BETWEEN SYMMETRIC (SqlBase.g4 predicate; the reference normalizes
    the bounds) — Spark has no SYMMETRIC keyword, so the engine rewrite is
    least/greatest normalization, checked against DuckDB computing both
    the plain and the swapped-bounds form."""
    t = T(spark, sf_dir)
    lo, hi = F.lit(200000), F.lit(100000)  # deliberately reversed
    return (
        t.orders.where(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.col("o_totalprice").between(100000, 200000).alias("plain"),
            F.col("o_totalprice")
            .between(F.least(lo, hi), F.greatest(lo, hi))
            .alias("sym_swapped"),
        )
        .orderBy("o_orderkey")
    )


@probe(
    "p_ordinal_group_order",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS c
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("relational",),
)
def p_ordinal_group_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY / ORDER BY ordinals (SqlBase.g4 sortItem/groupBy INTEGER;
    the reference resolves positions in the analyzer, Spark via
    groupByOrdinal/orderByOrdinal which the engine session keeps on)."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("ord_probe_orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c
        FROM ord_probe_orders GROUP BY 1, 2 ORDER BY 1, 2
        """
    )


@probe(
    "p_having_no_groupby",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS c, CAST(SUM(o_totalprice) AS DOUBLE) AS s
    FROM orders HAVING COUNT(*) > 10
    """,
    tags=("relational",),
)
def p_having_no_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING without GROUP BY — a global aggregate filtered on itself
    (the reference's analyzer treats it as a single implicit group)."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("having_probe_orders")
    return spark.sql(
        """
        SELECT COUNT(*) AS c, CAST(SUM(o_totalprice) AS DOUBLE) AS s
        FROM having_probe_orders HAVING COUNT(*) > 10
        """
    )


@probe(
    "p_interval_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus_3m,
           strftime(o_orderdate - INTERVAL 45 DAY, '%Y-%m-%d') AS minus_45d,
           strftime(o_orderdate + INTERVAL 1 YEAR + INTERVAL 2 MONTH, '%Y-%m-%d') AS plus_14m,
           CAST(date_diff('day', o_orderdate, o_orderdate + INTERVAL 10 WEEK) AS BIGINT) AS ten_weeks_days
    FROM orders WHERE o_orderkey <= 1000 ORDER BY o_orderkey
    """,
    tags=("temporal",),
)
def p_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval literal arithmetic (IntervalYearMonthType /
    IntervalDayTimeType operators): date +- year-month and day-time
    intervals, rendered as ISO dates so month-end clamping semantics are
    compared engine-to-engine."""
    t = T(spark, sf_dir)
    d = F.col("o_orderdate")
    return (
        t.orders.where(F.col("o_orderkey") <= 1000)
        .select(
            "o_orderkey",
            F.date_format(F.expr("o_orderdate + INTERVAL 3 MONTH"), "yyyy-MM-dd").alias("plus_3m"),
            F.date_format(F.expr("o_orderdate - INTERVAL 45 DAY"), "yyyy-MM-dd").alias("minus_45d"),
            F.date_format(
                F.expr("o_orderdate + INTERVAL 1 YEAR + INTERVAL 2 MONTH"), "yyyy-MM-dd"
            ).alias("plus_14m"),
            F.datediff(
                F.expr("o_orderdate + INTERVAL 10 WEEK"), d
            ).cast("long").alias("ten_weeks_days"),
        )
        .orderBy("o_orderkey")
    )


@probe(
    "p_array_sort_comparator",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents WHERE doc_id <= 100),
    u AS (SELECT doc_id, unnest(toks) AS w FROM t),
    d AS (SELECT DISTINCT doc_id, w FROM u)
    SELECT doc_id,
           array_to_string(array_agg(w ORDER BY length(w), w), ',') AS by_len
    FROM d GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("functions",),
)
def p_array_sort_comparator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_sort with a CUSTOM COMPARATOR lambda (ArraySortComparatorFunction
    in the reference; Spark HOF comparator): sort distinct tokens by length
    then lexicographically.  DuckDB expresses the same order relationally
    with array_agg(ORDER BY length, value)."""
    t = T(spark, sf_dir)

    def cmp(x, y):
        lx, ly = F.length(x), F.length(y)
        return (
            F.when(lx < ly, -1)
            .when(lx > ly, 1)
            .when(x < y, -1)
            .when(x > y, 1)
            .otherwise(0)
        )

    toks = F.array_distinct(F.split(F.col("text"), " "))
    return (
        t.documents.where(F.col("doc_id") <= 100)
        .select(
            "doc_id",
            F.array_join(F.array_sort(toks, cmp), ",").alias("by_len"),
        )
        .orderBy("doc_id")
    )
