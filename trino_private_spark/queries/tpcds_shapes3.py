"""TPC-DS signature shapes, third tranche (q36, q39, q90, q98, q99).

Continues tpcds_shapes2.py over the reference's TPC-DS benchmark corpus
(testing/trino-benchto-benchmarks/src/main/resources/benchmarks/presto/
tpcds.yaml). Shapes distinct from the earlier tranches:

- GROUPING()-keyed rank inside a ROLLUP ("lochierarchy", q36/q70/q86)
- coefficient-of-variation filter + consecutive-period self-join (q39),
  with the cov test rearranged to exact integer math
- ratio of two time-band counts as a single scalar row (q90)
- per-row revenue share of the class total via a window sum (q98/q12/q20)
- ship-delay bucket matrix: four day-difference band counts (q99/q62)

Same hash-parity discipline as tranche two: thresholds in integer cents /
integer quantities; DuckDB integer SUMs cast back to BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q36_grouping_rank",
    oracle="""
    SELECT lochierarchy, n_name, o_orderpriority, margin,
           RANK() OVER (PARTITION BY lochierarchy,
                          CASE WHEN lochierarchy = 0 THEN n_name END
                        ORDER BY margin DESC, o_orderpriority NULLS FIRST)
             AS rank_within
    FROM (
      SELECT n_name, o_orderpriority,
             GROUPING(n_name) + GROUPING(o_orderpriority) AS lochierarchy,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               / 100.0 AS margin
      FROM orders
        JOIN customer ON c_custkey = o_custkey
        JOIN nation ON n_nationkey = c_nationkey
      GROUP BY ROLLUP (n_name, o_orderpriority))
    ORDER BY lochierarchy DESC, n_name NULLS FIRST,
             o_orderpriority NULLS FIRST, rank_within
    """,
    tags=("tpcds",),
)
def p_ds_q36_grouping_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q36/q70/q86 shape: ROLLUP levels distinguished by GROUPING()
    ("lochierarchy"), then RANK partitioned by the grouping level itself —
    detail rows rank within their nation, subtotal rows rank against other
    subtotals. Exercises Expand metadata flowing into window partition
    keys. Ref corpus: tpcds.yaml q36, q70, q86."""
    t = T(spark, sf_dir)
    base = (
        t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .select("n_name", "o_orderpriority", _cents(F.col("o_totalprice")).alias("cents"))
    )
    agg = (
        base.rollup("n_name", "o_orderpriority")
        .agg(
            (F.grouping("n_name") + F.grouping("o_orderpriority")).cast("bigint").alias(
                "lochierarchy"
            ),
            (F.sum("cents") / 100.0).alias("margin"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy",
        F.when(F.col("lochierarchy") == 0, F.col("n_name")),
    ).orderBy(F.col("margin").desc(), F.col("o_orderpriority").asc_nulls_first())
    return (
        agg.withColumn("rank_within", F.rank().over(w).cast("bigint"))
        .orderBy(
            F.col("lochierarchy").desc(),
            F.col("n_name").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
            "rank_within",
        )
    )


@probe(
    "p_ds_q39_cov_pairs",
    oracle="""
    WITH stats AS (
      SELECT l_suppkey, EXTRACT(MONTH FROM l_shipdate) AS mon,
             COUNT(*) AS n,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS s,
             CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)
                      * CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS ss
      FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
      GROUP BY l_suppkey, EXTRACT(MONTH FROM l_shipdate)
      HAVING COUNT(*) > 1),
    flagged AS (
      SELECT * FROM stats
      WHERE 4 * n * (n * ss - s * s) > (n - 1) * s * s)
    SELECT a.l_suppkey, a.mon AS mon1, a.n AS n1, a.s AS qty1,
           b.mon AS mon2, b.n AS n2, b.s AS qty2
    FROM flagged a JOIN flagged b
      ON a.l_suppkey = b.l_suppkey AND b.mon = a.mon + 1
    ORDER BY a.l_suppkey, a.mon
    """,
    tags=("tpcds",),
)
def p_ds_q39_cov_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q39 shape: per (supplier, month) quantity statistics, keep
    groups whose coefficient of variation exceeds a threshold, then
    self-join consecutive months. cov = stdev/mean > 0.5 is rearranged to
    exact integers: with sum s, sum-of-squares ss, count n, sample variance
    (n*ss - s^2)/(n(n-1)) and mean s/n give 4*n*(n*ss - s^2) > (n-1)*s^2.
    (Integer-exact at fixture scale; s^2 would need decimal past ~3e9 total
    quantity per group — far beyond any real (supplier,month) cell.)
    Ref corpus: tpcds.yaml q39."""
    t = T(spark, sf_dir)
    q = F.round(F.col("l_quantity")).cast("long")
    stats = (
        t.lineitem.where(F.year("l_shipdate") == 1997)
        .groupBy(
            "l_suppkey", F.month("l_shipdate").cast("bigint").alias("mon")
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(q).alias("s"),
            F.sum(q * q).alias("ss"),
        )
        .where(F.col("n") > 1)
    )
    flagged = stats.where(
        4 * F.col("n") * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
        > (F.col("n") - 1) * F.col("s") * F.col("s")
    )
    a, b = flagged.alias("a"), flagged.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_suppkey") == F.col("b.l_suppkey"))
            & (F.col("b.mon") == F.col("a.mon") + 1),
        )
        .select(
            F.col("a.l_suppkey").alias("l_suppkey"),
            F.col("a.mon").alias("mon1"),
            F.col("a.n").alias("n1"),
            F.col("a.s").alias("qty1"),
            F.col("b.mon").alias("mon2"),
            F.col("b.n").alias("n2"),
            F.col("b.s").alias("qty2"),
        )
        .orderBy("l_suppkey", "mon1")
    )


@probe(
    "p_ds_q90_band_ratio",
    oracle="""
    SELECT am_cnt, pm_cnt,
           CASE WHEN pm_cnt > 0 THEN am_cnt * 1.0 / pm_cnt END AS am_pm_ratio
    FROM (
      SELECT COUNT(CASE WHEN EXTRACT(HOUR FROM ts) BETWEEN 6 AND 11
                        THEN 1 END) AS am_cnt,
             COUNT(CASE WHEN EXTRACT(HOUR FROM ts) BETWEEN 12 AND 17
                        THEN 1 END) AS pm_cnt
      FROM events WHERE event_type = 'click')
    """,
    tags=("tpcds",),
)
def p_ds_q90_band_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q90 shape: the ratio of two time-band counts computed in one
    scan and reduced to a single scalar row — two FILTERed counts, then a
    derived division (exact bigints in, deterministic double out).
    Ref corpus: tpcds.yaml q90."""
    t = T(spark, sf_dir)
    h = F.hour("ts")
    agg = t.events.where(F.col("event_type") == "click").agg(
        F.count(F.when(h.between(6, 11), 1)).alias("am_cnt"),
        F.count(F.when(h.between(12, 17), 1)).alias("pm_cnt"),
    )
    return agg.select(
        "am_cnt",
        "pm_cnt",
        F.when(F.col("pm_cnt") > 0, F.col("am_cnt") * 1.0 / F.col("pm_cnt")).alias(
            "am_pm_ratio"
        ),
    )


@probe(
    "p_ds_q98_class_share",
    oracle="""
    SELECT p_partkey, p_brand, revenue,
           revenue * 100.0 / brand_total AS brand_share_pct
    FROM (
      SELECT p_partkey, p_brand,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               / 100.0 AS revenue,
             CAST(SUM(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                           AS BIGINT))
                    OVER (PARTITION BY p_brand) AS BIGINT) / 100.0
               AS brand_total
      FROM lineitem JOIN part ON p_partkey = l_partkey
      GROUP BY p_partkey, p_brand)
    WHERE brand_total > 0
    ORDER BY p_brand, p_partkey
    """,
    tags=("tpcds",),
)
def p_ds_q98_class_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q98/q12/q20 shape: each item's revenue as a share of its
    class total, the class total computed by a window SUM over the grouped
    aggregate (agg feeding window, no re-join). Share is a division of two
    exact cent-sums. Ref corpus: tpcds.yaml q98, q12, q20."""
    t = T(spark, sf_dir)
    agg = (
        t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_partkey", "p_brand")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("rev_cents"))
    )
    w = Window.partitionBy("p_brand")
    return (
        agg.withColumn("brand_cents", F.sum("rev_cents").over(w))
        .where(F.col("brand_cents") > 0)
        .select(
            "p_partkey",
            "p_brand",
            (F.col("rev_cents") / 100.0).alias("revenue"),
            (F.col("rev_cents") * 100.0 / F.col("brand_cents")).alias(
                "brand_share_pct"
            ),
        )
        .orderBy("p_brand", "p_partkey")
    )


@probe(
    "p_ds_q99_delay_buckets",
    oracle="""
    SELECT l_linestatus, o_orderpriority,
           COUNT(CASE WHEN delay <= 30 THEN 1 END) AS d30,
           COUNT(CASE WHEN delay > 30 AND delay <= 60 THEN 1 END) AS d60,
           COUNT(CASE WHEN delay > 60 AND delay <= 90 THEN 1 END) AS d90,
           COUNT(CASE WHEN delay > 90 THEN 1 END) AS d90plus
    FROM (
      SELECT l_linestatus, o_orderpriority,
             DATE_DIFF('day', o_orderdate, l_shipdate) AS delay
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey)
    GROUP BY l_linestatus, o_orderpriority
    ORDER BY l_linestatus, o_orderpriority
    """,
    tags=("tpcds",),
)
def p_ds_q99_delay_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q99/q62 shape: order-to-ship delay bucketed into 30/60/90+
    day bands, a matrix of FILTERed counts per (status, priority) — the
    canonical "aging report" computed in one scan + one shuffle.
    Ref corpus: tpcds.yaml q99, q62."""
    t = T(spark, sf_dir)
    joined = t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        joined.select("l_linestatus", "o_orderpriority", delay.alias("delay"))
        .groupBy("l_linestatus", "o_orderpriority")
        .agg(
            F.count(F.when(F.col("delay") <= 30, 1)).alias("d30"),
            F.count(F.when((F.col("delay") > 30) & (F.col("delay") <= 60), 1)).alias(
                "d60"
            ),
            F.count(F.when((F.col("delay") > 60) & (F.col("delay") <= 90), 1)).alias(
                "d90"
            ),
            F.count(F.when(F.col("delay") > 90, 1)).alias("d90plus"),
        )
        .orderBy("l_linestatus", "o_orderpriority")
    )
