"""Window-function probes: ranking, value, frames (ROWS/RANGE/GROUPS).

Covers SURVEY.md §2.1 #19-21 and §2.4. Spark's WindowExec sorts within
partitions after a hash shuffle on the PARTITION BY keys — same dataflow as
the reference's WindowOperator.java:1 (PagesIndex sort per group). GROUPS
frames (window/GroupsFraming.java) have no Spark builtin; the engine
provides a rewrite in operators/window_ext.py, probed here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.relational import dround


@probe(
    "p_window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run
    FROM orders ORDER BY o_custkey, o_orderkey LIMIT 1000
    """,
    tags=("bench", "core"),
)
def p_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with explicit ROWS frame.
    Ref: operator/WindowOperator.java:1 + window/RowsFraming.java."""
    t = T(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.orders.select(
            "o_custkey",
            "o_orderkey",
            dround(F.sum("o_totalprice").over(w), 2).alias("run"),
        )
        .orderBy("o_custkey", "o_orderkey")
        .limit(1000)
    )


@probe(
    "p_topnranking",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) t
    WHERE rn <= 2 ORDER BY o_custkey, rn LIMIT 1000
    """,
    tags=("bench", "core"),
)
def p_topnranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-N per group via row_number + filter; Spark 3.5+ rewrites this to
    WindowGroupLimit (per-partition heaps before the shuffle) — the analogue
    of the reference's GroupedTopNRankAccumulator.java.
    Ref: operator/TopNRankingOperator.java:1."""
    t = T(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t.orders.select(
            "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
        )
        # filter on the raw row_number so the WindowGroupLimit rewrite still
        # pattern-matches; widen to bigint (oracle dtype) afterwards
        .where(F.col("rn") <= 2)
        .withColumn("rn", F.col("rn").cast("bigint"))
        .orderBy("o_custkey", "rn")
        .limit(1000)
    )


@probe(
    "p_ranking",
    oracle="""
    SELECT o_orderkey, RANK() OVER (ORDER BY o_totalprice DESC) AS r,
           DENSE_RANK() OVER (ORDER BY o_totalprice DESC) AS dr
    FROM orders ORDER BY r, o_orderkey LIMIT 100
    """,
    tags=("core",),
)
def p_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank over a global (unpartitioned) window.
    Ref: operator/window/RankFunction.java, DenseRankFunction.java."""
    t = T(spark, sf_dir)
    w = Window.orderBy(F.col("o_totalprice").desc())
    return (
        t.orders.select(
            "o_orderkey",
            F.rank().over(w).cast("bigint").alias("r"),
            F.dense_rank().over(w).cast("bigint").alias("dr"),
        )
        .orderBy("r", "o_orderkey")
        .limit(100)
    )


@probe(
    "p_lag",
    oracle="""
    SELECT o_orderkey,
           LAG(ROUND(o_totalprice, 2), 1, 0.0) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey) AS prev,
           LEAD(ROUND(o_totalprice, 2), 1, 0.0) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey) AS next
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("core",),
)
def p_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead with default values.
    Ref: operator/window/LagFunction.java, LeadFunction.java."""
    t = T(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    price = F.round(F.col("o_totalprice"), 2)
    return (
        t.orders.select(
            "o_orderkey",
            F.lag(price, 1, 0.0).over(w).alias("prev"),
            F.lead(price, 1, 0.0).over(w).alias("next"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@probe(
    "p_ntile_cume",
    oracle="""
    SELECT o_orderkey, NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS q,
           ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS pr,
           ROUND(CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey), 6) AS cd
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("core",),
)
def p_ntile_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist (deterministic total order).
    Ref: operator/window/NTileFunction.java, PercentRankFunction.java,
    CumulativeDistributionFunction.java."""
    t = T(spark, sf_dir)
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        t.orders.select(
            "o_orderkey",
            F.ntile(4).over(w).cast("bigint").alias("q"),
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@probe(
    "p_firstlast",
    oracle="""
    SELECT o_orderkey,
           FIRST_VALUE(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS first_k,
           LAST_VALUE(o_orderkey) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_k,
           NTH_VALUE(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_k
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("core",),
)
def p_firstlast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value with full-partition frame.
    Ref: operator/window/FirstValueFunction.java … NthValueFunction.java."""
    t = T(spark, sf_dir)
    order = [F.col("o_orderdate"), F.col("o_orderkey")]
    w_def = Window.partitionBy("o_custkey").orderBy(*order)
    w_full = w_def.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        t.orders.select(
            "o_orderkey",
            F.first("o_orderkey").over(w_def).alias("first_k"),
            F.last("o_orderkey").over(w_full).alias("last_k"),
            F.nth_value("o_orderkey", 2).over(w_full).alias("second_k"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@probe(
    "p_range_frame",
    oracle="""
    SELECT o_orderkey, COUNT(*) OVER (
      ORDER BY o_orderdate RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS c
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("core",),
)
def p_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame with interval offset over a timestamp ordering.
    Ref: operator/window/RangeFraming.java."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, COUNT(*) OVER (
          ORDER BY o_orderdate
          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW) AS c
        FROM orders ORDER BY o_orderkey LIMIT 1000
        """
    )


@probe(
    "p_rownumber_nosort",
    oracle="""
    SELECT o_orderstatus, COUNT(*) AS n_rows, COUNT(DISTINCT rn) AS n_distinct_rn,
           MIN(rn) AS min_rn, MAX(rn) AS max_rn
    FROM (SELECT o_orderstatus,
                 ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey) AS rn
          FROM orders)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("core",),
)
def p_rownumber_nosort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number per partition; verified via its defining invariants
    (dense 1..n numbering). Ref: operator/RowNumberOperator.java:1."""
    t = T(spark, sf_dir)
    w = Window.partitionBy("o_orderstatus").orderBy("o_orderkey")
    inner = t.orders.select("o_orderstatus", F.row_number().over(w).cast("bigint").alias("rn"))
    return (
        inner.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("rn").alias("n_distinct_rn"),
            F.min("rn").cast("bigint").alias("min_rn"),
            F.max("rn").cast("bigint").alias("max_rn"),
        )
        .orderBy("o_orderstatus")
    )


@probe(
    "p_agg_as_window",
    oracle="""
    SELECT o_orderkey,
           ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey), 2)
             / COUNT(*) OVER (PARTITION BY o_custkey) AS cust_avg,
           COUNT(*) OVER (PARTITION BY o_custkey) AS cust_n
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("core",),
)
def p_agg_as_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Any aggregate as a window function (unordered full-partition frame).
    Ref: operator/window/AggregateWindowFunction.java.
    avg computed as round(sum,2)/count: the 2-decimal source data makes the
    rounded sum exact (integer cents) on both engines, so the division is
    bit-identical — immune to ROUND-at-half boundary flips that a rounded
    AVG hits when group sums terminate exactly at the rounding digit."""
    t = T(spark, sf_dir)
    w = Window.partitionBy("o_custkey")
    return (
        t.orders.select(
            "o_orderkey",
            (
                dround(F.sum("o_totalprice").over(w), 2)
                / F.count(F.lit(1)).over(w)
            ).alias("cust_avg"),
            F.count(F.lit(1)).over(w).alias("cust_n"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@probe(
    "p_groups_frame",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_orderstatus,
             DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_orderdate) AS dr
      FROM orders)
    SELECT o_orderkey,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY dr
                          RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS c
    FROM t ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("core", "custom"),
)
def p_groups_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPS frame — missing from Spark; implemented by the engine's
    groups_frame_agg rewrite (dense_rank as the peer-group axis, then a
    RANGE frame over it). Ref: operator/window/GroupsFraming.java."""
    from trino_private_spark.operators.window_ext import groups_frame_count

    t = T(spark, sf_dir)
    return (
        groups_frame_count(
            t.orders,
            partition_by=["o_orderstatus"],
            order_by=["o_orderdate"],
            preceding=1,
            following=0,
            out_col="c",
        )
        .select("o_orderkey", "c")
        .orderBy("o_orderkey")
        .limit(1000)
    )


@probe(
    "p_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS d
      FROM orders WHERE o_custkey <= 300),
    grp AS (
      SELECT o_custkey, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY d) AS INT) AS anchor
      FROM days),
    islands AS (
      SELECT o_custkey, anchor, CAST(COUNT(*) AS BIGINT) AS len
      FROM grp GROUP BY o_custkey, anchor)
    SELECT o_custkey,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_islands
    FROM islands GROUP BY o_custkey
    ORDER BY o_custkey
    """,
    tags=("window",),
)
def p_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: consecutive-day activity streaks via the
    date-minus-row_number anchor trick — one window + one aggregation,
    the canonical islands detection every reference-engine user writes
    (grammar-only shape; no dedicated operator exists in either engine)."""
    t = T(spark, sf_dir)
    days = (
        t.orders.where(F.col("o_custkey") <= 300)
        .select("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .distinct()
    )
    w = Window.partitionBy("o_custkey").orderBy("d")
    grp = days.withColumn(
        "anchor", F.date_sub(F.col("d"), F.row_number().over(w))
    )
    islands = grp.groupBy("o_custkey", "anchor").agg(
        F.count("*").cast("long").alias("len")
    )
    return (
        islands.groupBy("o_custkey")
        .agg(
            F.max("len").cast("long").alias("longest_streak"),
            F.count("*").cast("long").alias("n_islands"),
        )
        .orderBy("o_custkey")
    )
