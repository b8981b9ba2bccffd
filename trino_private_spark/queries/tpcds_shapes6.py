"""TPC-DS signature shapes, sixth tranche (q68/q79, q85, q91, q96).

- q68/q79: per-(customer, day) trip rollup with a priority gate, joined to
  the customer dim and ranked — the "trip" two-level aggregation where the
  inner grouping key contains the outer one.
- q85: multi-band ratio matrix — disjoint value bands each contributing a
  count and an exact-cents refund average, computed in ONE scan via
  FILTERed aggregates.
- q91: loss attribution — returned revenue per (segment, nation) with a
  HAVING gate, dims broadcast, ordered by the loss.
- q96: narrow-band count — a scalar COUNT under a stack of selective
  conjunctive predicates (the pushdown showcase; the whole disjunction
  reaches the parquet scan).

Ref corpus: testing/trino-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpcds.yaml. Fixture-adapted, integer-cents discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q79_customer_trips",
    oracle="""
    WITH trips AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey, CAST(o_orderdate AS DATE)
      HAVING COUNT(*) >= 2)
    SELECT c_name, CAST(d AS VARCHAR) AS day, n_orders,
           spend_cents / 100.0 AS spend
    FROM trips JOIN customer ON c_custkey = o_custkey
    ORDER BY spend_cents DESC, c_name, day
    LIMIT 100
    """,
    tags=("tpcds",),
)
def p_ds_q79_customer_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q68/q79 shape: per-(customer, day) trip aggregate gated by a
    priority filter and a HAVING floor, then the dim join AFTER the
    aggregation (join |trips| rows, not |orders|) with the dim broadcast.
    Ref corpus: tpcds.yaml q68, q79."""
    t = T(spark, sf_dir)
    trips = (
        t.orders.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_custkey", F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).alias("spend_cents"),
        )
        .where(F.col("n_orders") >= 2)
    )
    return (
        trips.join(
            F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey")
        )
        .select(
            "c_name",
            F.col("d").cast("string").alias("day"),
            "n_orders",
            (F.col("spend_cents") / 100.0).alias("spend"),
            "spend_cents",
        )
        .orderBy(F.col("spend_cents").desc(), "c_name", "day")
        .limit(100)
        .drop("spend_cents")
    )


@probe(
    "p_ds_q85_band_matrix",
    oracle="""
    SELECT
      COUNT(*) FILTER (WHERE l_quantity < 10)                        AS n_small,
      COUNT(*) FILTER (WHERE l_quantity >= 10 AND l_quantity < 30)   AS n_mid,
      COUNT(*) FILTER (WHERE l_quantity >= 30)                       AS n_large,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
           FILTER (WHERE l_quantity < 10) AS BIGINT)                 AS cents_small,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
           FILTER (WHERE l_quantity >= 10 AND l_quantity < 30) AS BIGINT) AS cents_mid,
      CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
           FILTER (WHERE l_quantity >= 30) AS BIGINT)                AS cents_large
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    tags=("tpcds",),
)
def p_ds_q85_band_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q85 shape: disjoint bands each yielding count + sum from ONE
    scan of the returned rows via FILTERed aggregates (no per-band
    re-scan, no union). Ref corpus: tpcds.yaml q85; reference FILTER
    support: ImplementFilteredAggregations.java."""
    t = T(spark, sf_dir)
    q = F.col("l_quantity")
    cents = _cents(F.col("l_extendedprice"))
    small, mid, large = q < 10, (q >= 10) & (q < 30), q >= 30
    return t.lineitem.where(F.col("l_returnflag") == "R").agg(
        F.count(F.when(small, 1)).alias("n_small"),
        F.count(F.when(mid, 1)).alias("n_mid"),
        F.count(F.when(large, 1)).alias("n_large"),
        F.sum(F.when(small, cents)).alias("cents_small"),
        F.sum(F.when(mid, cents)).alias("cents_mid"),
        F.sum(F.when(large, cents)).alias("cents_large"),
    )


@probe(
    "p_ds_q91_loss_attribution",
    oracle="""
    SELECT c_mktsegment, n_name,
           COUNT(*) AS n_returned,
           CAST(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 100)
                AS BIGINT)) AS BIGINT) / 100.0 AS lost_revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation   ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_mktsegment, n_name
    HAVING COUNT(*) >= 50
    ORDER BY c_mktsegment, n_name
    """,
    tags=("tpcds",),
)
def p_ds_q91_loss_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q91 shape: returned-revenue loss attributed across two dim
    axes with a HAVING floor; the dim chain (customer -> nation) is
    broadcast so the fact table never shuffles for the joins — only the
    final 2-key aggregation exchanges. Ref corpus: tpcds.yaml q91."""
    t = T(spark, sf_dir)
    loss_cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100
    ).cast("long")
    return (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.customer), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_returned"),
            (F.sum(loss_cents) / 100.0).alias("lost_revenue"),
        )
        .where(F.col("n_returned") >= 50)
        .orderBy("c_mktsegment", "n_name")
    )


@probe(
    "p_ds_q96_narrow_band_count",
    oracle="""
    SELECT COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity BETWEEN 20 AND 25
      AND l_discount BETWEEN 0.02 AND 0.06
      AND l_returnflag = 'N'
      AND l_linestatus = 'O'
      AND l_shipdate >= TIMESTAMP '1995-01-01'
    """,
    tags=("tpcds",),
)
def p_ds_q96_narrow_band_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q96 shape: scalar COUNT under stacked selective conjuncts.
    The value is the plan: every predicate reaches the parquet scan as a
    PushedFilter (asserted in test_plans), so at 100 TB row groups outside
    the bands never leave storage. Ref corpus: tpcds.yaml q96."""
    t = T(spark, sf_dir)
    return t.lineitem.where(
        F.col("l_quantity").between(20, 25)
        & F.col("l_discount").between(0.02, 0.06)
        & (F.col("l_returnflag") == "N")
        & (F.col("l_linestatus") == "O")
        & (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
    ).agg(F.count(F.lit(1)).alias("n"))
