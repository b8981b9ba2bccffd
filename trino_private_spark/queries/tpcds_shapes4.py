"""TPC-DS signature shapes, fourth tranche (q65, q76).

- q65: "cheapest supplier per brand" — an aggregate joined back to the
  per-group MIN of itself. Spark-first that's a window MIN over the
  grouped aggregate + filter (one shuffle), never a second aggregation
  re-joined (plan-asserted in test_plans).
- q76: UNION ALL of heterogeneous channel projections — each arm NULLs a
  different column — counted per (channel, attr) bucket. Exercises union
  type reconciliation and grouping on NULL-bearing keys.

Ref corpus: testing/trino-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpcds.yaml. Same integer-cents hash discipline as the
earlier tranches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q65_min_supplier",
    oracle="""
    SELECT p_brand, l_suppkey, rev_cents / 100.0 AS revenue
    FROM (
      SELECT p_brand, l_suppkey, rev_cents,
             MIN(rev_cents) OVER (PARTITION BY p_brand) AS min_cents
      FROM (
        SELECT p_brand, l_suppkey,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS rev_cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
        GROUP BY p_brand, l_suppkey))
    WHERE rev_cents = min_cents
    ORDER BY p_brand, l_suppkey
    """,
    tags=("tpcds",),
)
def p_ds_q65_min_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q65 shape: the row(s) achieving the per-group MIN of a
    grouped aggregate. One aggregation, one window — the naive form
    (aggregate twice, join back on the min) would re-shuffle the same
    data; the window reuses the aggregate's partitioning. Ties at the
    min all survive, deterministically on both engines.
    Ref corpus: tpcds.yaml q65."""
    t = T(spark, sf_dir)
    agg = (
        t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "l_suppkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("rev_cents"))
    )
    w = Window.partitionBy("p_brand")
    return (
        agg.withColumn("min_cents", F.min("rev_cents").over(w))
        .where(F.col("rev_cents") == F.col("min_cents"))
        .select(
            "p_brand", "l_suppkey", (F.col("rev_cents") / 100.0).alias("revenue")
        )
        .orderBy("p_brand", "l_suppkey")
    )


@probe(
    "p_ds_q76_hetero_union",
    oracle="""
    SELECT channel, prio, status, COUNT(*) AS cnt,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS amount
    FROM (
      SELECT 'urgent' AS channel, o_orderpriority AS prio,
             CAST(NULL AS VARCHAR) AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      UNION ALL
      SELECT 'open' AS channel, CAST(NULL AS VARCHAR) AS prio,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT 'other' AS channel, o_orderpriority AS prio,
             o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
      WHERE o_orderstatus <> 'O'
        AND o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
    GROUP BY channel, prio, status
    ORDER BY channel, prio NULLS FIRST, status NULLS FIRST
    """,
    tags=("tpcds",),
)
def p_ds_q76_hetero_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q76 shape: UNION ALL of channel slices whose projections
    NULL different columns, then one aggregation over the union — the
    union must reconcile to one schema and the grouping must treat the
    injected NULLs as ordinary key values. Ref corpus: tpcds.yaml q76."""
    t = T(spark, sf_dir)
    cents = _cents(F.col("o_totalprice")).alias("cents")
    null_str = F.lit(None).cast("string")
    urgent = t.orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(
        F.lit("urgent").alias("channel"),
        F.col("o_orderpriority").alias("prio"),
        null_str.alias("status"),
        cents,
    )
    open_ = t.orders.where(F.col("o_orderstatus") == "O").select(
        F.lit("open").alias("channel"),
        null_str.alias("prio"),
        F.col("o_orderstatus").alias("status"),
        cents,
    )
    other = t.orders.where(
        (F.col("o_orderstatus") != "O")
        & ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(
        F.lit("other").alias("channel"),
        F.col("o_orderpriority").alias("prio"),
        F.col("o_orderstatus").alias("status"),
        cents,
    )
    return (
        urgent.unionAll(open_)
        .unionAll(other)
        .groupBy("channel", "prio", "status")
        .agg(
            F.count("*").alias("cnt"),
            (F.sum("cents") / 100.0).alias("amount"),
        )
        .orderBy(
            "channel",
            F.col("prio").asc_nulls_first(),
            F.col("status").asc_nulls_first(),
        )
    )
