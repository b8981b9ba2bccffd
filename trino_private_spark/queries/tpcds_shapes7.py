"""TPC-DS signature shapes, seventh tranche (q4, q14, q78).

- q4: per-customer year-over-year growth compared ACROSS channels — the
  same aggregate viewed per (customer, channel, year), self-joined, with
  the growth-ratio comparison done by exact integer cross-multiplication
  (r2*c1 > r1*c2) so no float division enters the predicate.
- q14: cross-channel INTERSECT key set + a shared scalar threshold reused
  by every arm (the "avg over union of channels" scalar subquery).
- q78: per-key yearly aggregates LEFT-JOINed from secondary channels with
  COALESCE'd absent sides and a ratio ordered output.

Ref corpus: testing/trino-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpcds.yaml. Fixture-adapted (returnflag slices act as
channels), integer-cents discipline throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q4_growth_across_channels",
    oracle="""
    WITH yr AS (
      SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'pri'
                  ELSE 'std' END AS chan,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2, 3)
    SELECT p1.o_custkey AS custkey,
           p1.cents / 100.0 AS pri_1995, p2.cents / 100.0 AS pri_1996,
           s1.cents / 100.0 AS std_1995, s2.cents / 100.0 AS std_1996
    FROM yr p1 JOIN yr p2 ON p1.o_custkey = p2.o_custkey
               JOIN yr s1 ON p1.o_custkey = s1.o_custkey
               JOIN yr s2 ON p1.o_custkey = s2.o_custkey
    WHERE p1.chan = 'pri' AND p1.yr = 1995 AND p2.chan = 'pri' AND p2.yr = 1996
      AND s1.chan = 'std' AND s1.yr = 1995 AND s2.chan = 'std' AND s2.yr = 1996
      AND p2.cents * s1.cents > p1.cents * s2.cents
    ORDER BY custkey
    """,
    tags=("tpcds",),
)
def p_ds_q4_growth_across_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q4 shape: one (customer, channel, year) aggregate consumed
    four times by alias; customers kept when priority-channel growth
    exceeds standard-channel growth, with the ratio comparison
    cross-multiplied in exact integers. Ref corpus: tpcds.yaml q4."""
    t = T(spark, sf_dir)
    yr = (
        t.orders.where(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.when(
                F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "pri"
            )
            .otherwise("std")
            .alias("chan"),
        )
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("cents"))
    )

    def slice_(chan: str, year: int, alias: str) -> DataFrame:
        return yr.where((F.col("chan") == chan) & (F.col("yr") == year)).select(
            F.col("o_custkey").alias(f"k_{alias}"), F.col("cents").alias(alias)
        )

    p1, p2 = slice_("pri", 1995, "p1"), slice_("pri", 1996, "p2")
    s1, s2 = slice_("std", 1995, "s1"), slice_("std", 1996, "s2")
    return (
        p1.join(p2, F.col("k_p1") == F.col("k_p2"))
        .join(s1, F.col("k_p1") == F.col("k_s1"))
        .join(s2, F.col("k_p1") == F.col("k_s2"))
        .where(F.col("p2") * F.col("s1") > F.col("p1") * F.col("s2"))
        .select(
            F.col("k_p1").alias("custkey"),
            (F.col("p1") / 100.0).alias("pri_1995"),
            (F.col("p2") / 100.0).alias("pri_1996"),
            (F.col("s1") / 100.0).alias("std_1995"),
            (F.col("s2") / 100.0).alias("std_1996"),
        )
        .orderBy("custkey")
    )


@probe(
    "p_ds_q14_cross_channel_intersect",
    oracle="""
    WITH common AS (
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'N'
      INTERSECT
      SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
    threshold AS (
      SELECT AVG(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS avg_cents
      FROM lineitem),
    per AS (
      SELECT l_returnflag, l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents,
             COUNT(*) AS n
      FROM lineitem
      WHERE l_partkey IN (SELECT l_partkey FROM common)
      GROUP BY l_returnflag, l_partkey)
    SELECT l_returnflag, l_partkey, cents / 100.0 AS revenue, n
    FROM per WHERE cents > 20 * (SELECT avg_cents FROM threshold)
    ORDER BY l_returnflag, l_partkey
    """,
    tags=("tpcds",),
)
def p_ds_q14_cross_channel_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q14 shape: the INTERSECT of three channel key sets gates a
    per-(channel, key) aggregate, filtered by a scalar threshold computed
    once over all channels and reused by every arm.
    Ref corpus: tpcds.yaml q14."""
    t = T(spark, sf_dir)
    li = t.lineitem

    def keys(flag: str) -> DataFrame:
        return li.where(F.col("l_returnflag") == flag).select("l_partkey")

    common = keys("A").intersect(keys("N")).intersect(keys("R"))
    avg_cents = li.agg(
        F.avg(_cents(F.col("l_extendedprice"))).alias("a")
    ).collect()[0].a
    per = (
        li.join(F.broadcast(common), "l_partkey", "left_semi")
        .groupBy("l_returnflag", "l_partkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).alias("cents"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per.where(F.col("cents") > 20 * F.lit(avg_cents))
        .select(
            "l_returnflag",
            "l_partkey",
            (F.col("cents") / 100.0).alias("revenue"),
            "n",
        )
        .orderBy("l_returnflag", "l_partkey")
    )


@probe(
    "p_ds_q78_channel_ratio_left",
    oracle="""
    WITH pri AS (
      SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS pc,
             COUNT(*) AS pn
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey),
    low AS (
      SELECT o_custkey, CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS lc,
             COUNT(*) AS ln
      FROM orders WHERE o_orderpriority = '5-LOW'
      GROUP BY o_custkey)
    SELECT pri.o_custkey AS custkey, pc / 100.0 AS pri_amt, pn,
           COALESCE(lc, 0) / 100.0 AS low_amt, COALESCE(ln, 0) AS low_n,
           ROUND(CAST(COALESCE(lc, 0) AS DOUBLE) / pc, 4) AS ratio
    FROM pri LEFT JOIN low ON pri.o_custkey = low.o_custkey
    WHERE pn >= 3
    ORDER BY custkey
    """,
    tags=("tpcds",),
)
def p_ds_q78_channel_ratio_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q78 shape: a primary-channel aggregate LEFT-JOINed to a
    secondary channel whose rows may be absent — COALESCE'd amounts and a
    per-key cross-channel ratio. Ref corpus: tpcds.yaml q78."""
    t = T(spark, sf_dir)
    pri = (
        t.orders.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_custkey")
        .agg(
            F.sum(_cents(F.col("o_totalprice"))).alias("pc"),
            F.count(F.lit(1)).alias("pn"),
        )
    )
    low = (
        t.orders.where(F.col("o_orderpriority") == "5-LOW")
        .groupBy(F.col("o_custkey").alias("lk"))
        .agg(
            F.sum(_cents(F.col("o_totalprice"))).alias("lc"),
            F.count(F.lit(1)).alias("ln"),
        )
    )
    return (
        pri.join(low, pri["o_custkey"] == low["lk"], "left")
        .where(F.col("pn") >= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            (F.col("pc") / 100.0).alias("pri_amt"),
            "pn",
            (F.coalesce(F.col("lc"), F.lit(0)) / 100.0).alias("low_amt"),
            F.coalesce(F.col("ln"), F.lit(0)).alias("low_n"),
            F.round(
                F.coalesce(F.col("lc"), F.lit(0)).cast("double") / F.col("pc"), 4
            ).alias("ratio"),
        )
        .orderBy("custkey")
    )
