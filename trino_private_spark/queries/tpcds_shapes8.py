"""TPC-DS signature shapes, eighth tranche (q87, q21, q41, q43, q92, q73).

- q87: three-way EXCEPT over per-period customer key sets, reduced to one
  COUNT — set subtraction as a first-class plan shape.
- q21: before/after pivot-date quantity split per (supplier-ish, part) with
  the keep-band ratio test cross-multiplied into exact integers.
- q41: EXISTS over an OR-of-AND attribute disjunction on part, emitting
  DISTINCT names — the existence-join + dedup shape.
- q43: day-of-week pivot — seven conditional sums in one scan.
- q92: "excess discount": rows above 1.3x the per-key average, the
  correlated scalar decorrelated into a join and the 1.3x comparison
  rearranged to integer cross-multiplication (10*qty*cnt > 13*sum).
- q73: per-customer order-count bucket filter joined back to customer
  attributes (the "frequent shopper trip bucket" shape).

Ref corpus: testing/trino-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpcds.yaml (q01-q99). Fixture-adapted to the TPC-H-ish
driver tables; integer-exact predicates throughout so no float boundary
can flip a row between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q87_except_count",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_lost
    FROM (
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
      EXCEPT
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) = 1997
    )
    """,
    tags=("tpcds", "setop"),
)
def p_ds_q87_except_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q87 shape: chained EXCEPT of period key-sets collapsed to one
    scalar count (customers active in 1995 but gone both following years).
    Ref corpus: tpcds.yaml q87."""
    t = T(spark, sf_dir)

    def keys(year: int) -> DataFrame:
        return (
            t.orders.where(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    lost = keys(1995).exceptAll(keys(1996)).exceptAll(keys(1997))
    # exceptAll on distinct inputs == set EXCEPT; stays a hash anti join
    return lost.agg(F.count("*").cast("long").alias("n_lost"))


@probe(
    "p_ds_q21_before_after_band",
    oracle="""
    WITH split AS (
      SELECT l_suppkey, l_partkey,
             CAST(SUM(CASE WHEN l_shipdate <  DATE '1995-06-01'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_before,
             CAST(SUM(CASE WHEN l_shipdate >= DATE '1995-06-01'
                           THEN CAST(l_quantity AS BIGINT) ELSE 0 END) AS BIGINT) AS qty_after
      FROM lineitem
      WHERE l_shipdate BETWEEN DATE '1995-04-01' AND DATE '1995-08-01'
      GROUP BY l_suppkey, l_partkey)
    SELECT l_suppkey, l_partkey, qty_before, qty_after
    FROM split
    WHERE qty_before > 0
      AND 2 * qty_after >= qty_before
      AND qty_after <= 2 * qty_before
    ORDER BY l_suppkey, l_partkey
    """,
    tags=("tpcds",),
)
def p_ds_q21_before_after_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q21 shape: per-key quantity split around a pivot date, kept
    when the after/before ratio lies in [0.5, 2] — the band test stated in
    integers (2*after >= before AND after <= 2*before).
    Ref corpus: tpcds.yaml q21."""
    t = T(spark, sf_dir)
    pivot = F.lit("1995-06-01").cast("date")
    split = (
        t.lineitem.where(
            F.col("l_shipdate").between(F.lit("1995-04-01"), F.lit("1995-08-01"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(F.col("l_shipdate") < pivot, F.col("l_quantity").cast("long"))
                .otherwise(F.lit(0))
            ).cast("long").alias("qty_before"),
            F.sum(
                F.when(F.col("l_shipdate") >= pivot, F.col("l_quantity").cast("long"))
                .otherwise(F.lit(0))
            ).cast("long").alias("qty_after"),
        )
    )
    return (
        split.where(
            (F.col("qty_before") > 0)
            & (2 * F.col("qty_after") >= F.col("qty_before"))
            & (F.col("qty_after") <= 2 * F.col("qty_before"))
        )
        .orderBy("l_suppkey", "l_partkey")
    )


@probe(
    "p_ds_q41_exists_or_distinct",
    oracle="""
    SELECT DISTINCT p1.p_brand
    FROM part p1
    WHERE p1.p_size BETWEEN 2 AND 12
      AND EXISTS (
        SELECT 1 FROM part p2
        WHERE p2.p_brand = p1.p_brand
          AND ((p2.p_type LIKE 'STANDARD%' AND p2.p_size BETWEEN 2 AND 6)
            OR (p2.p_type LIKE 'LARGE%' AND p2.p_size BETWEEN 8 AND 12)))
    ORDER BY p_brand
    """,
    tags=("tpcds", "subquery"),
)
def p_ds_q41_exists_or_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q41 shape: EXISTS carrying an OR-of-AND attribute disjunction,
    output deduplicated — compiled to a left-semi join on the brand key with
    the disjunction pushed into the build side. Ref corpus: tpcds.yaml q41."""
    t = T(spark, sf_dir)
    p = t.part
    qualifying = p.where(
        (F.col("p_type").like("STANDARD%") & F.col("p_size").between(2, 6))
        | (F.col("p_type").like("LARGE%") & F.col("p_size").between(8, 12))
    ).select(F.col("p_brand").alias("q_brand")).distinct()
    return (
        p.where(F.col("p_size").between(2, 12))
        .join(F.broadcast(qualifying), F.col("p_brand") == F.col("q_brand"), "left_semi")
        .select("p_brand")
        .distinct()
        .orderBy("p_brand")
    )


@probe(
    "p_ds_q43_weekday_pivot",
    oracle="""
    SELECT c.c_nationkey,
           CAST(SUM(CASE WHEN dayofweek(o.o_orderdate) = 0 THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS sun_sales,
           CAST(SUM(CASE WHEN dayofweek(o.o_orderdate) = 1 THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS mon_sales,
           CAST(SUM(CASE WHEN dayofweek(o.o_orderdate) = 2 THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS tue_sales,
           CAST(SUM(CASE WHEN dayofweek(o.o_orderdate) = 3 THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS wed_sales,
           CAST(SUM(CASE WHEN dayofweek(o.o_orderdate) = 4 THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS thu_sales,
           CAST(SUM(CASE WHEN dayofweek(o.o_orderdate) = 5 THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS fri_sales,
           CAST(SUM(CASE WHEN dayofweek(o.o_orderdate) = 6 THEN CAST(ROUND(o.o_totalprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS sat_sales
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    tags=("tpcds", "pivot"),
)
def p_ds_q43_weekday_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q43 shape: seven day-of-week conditional sums in a single
    scan+aggregate over the fact-dim join (no union of seven scans).
    Spark dayofweek() is 1=Sunday..7=Saturday; DuckDB dayofweek() is
    0=Sunday..6=Saturday — the probe aligns them by subtracting 1.
    Ref corpus: tpcds.yaml q43."""
    t = T(spark, sf_dir)
    j = (
        t.orders.where(F.year("o_orderdate") == 1995)
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("dow", F.dayofweek("o_orderdate") - 1)
        .withColumn("cents", _cents(F.col("o_totalprice")))
    )
    names = ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
    aggs = [
        (
            F.sum(F.when(F.col("dow") == i, F.col("cents")).otherwise(F.lit(0)))
            .cast("long") / 100.0
        ).alias(f"{nm}_sales")
        for i, nm in enumerate(names)
    ]
    return j.groupBy("c_nationkey").agg(*aggs).orderBy("c_nationkey")


@probe(
    "p_ds_q92_excess_quantity",
    oracle="""
    WITH stats AS (
      SELECT l_partkey AS sp, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qsum,
             CAST(COUNT(*) AS BIGINT) AS qcnt
      FROM lineitem WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
      GROUP BY l_partkey)
    SELECT CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS excess_qty,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem JOIN stats ON l_partkey = sp
    WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
      AND 10 * CAST(l_quantity AS BIGINT) * qcnt > 13 * qsum
    """,
    tags=("tpcds", "subquery"),
)
def p_ds_q92_excess_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q92 shape ("excess discount amount"): rows above 1.3x their
    key's average, with the correlated AVG decorrelated into a join against
    a one-pass (sum, count) aggregate and the 1.3x test cross-multiplied to
    exact integers: 10*qty*cnt > 13*sum. Ref corpus: tpcds.yaml q92."""
    t = T(spark, sf_dir)
    in_window = t.lineitem.where(
        F.col("l_shipdate").between(F.lit("1995-01-01"), F.lit("1995-12-31"))
    ).select("l_partkey", F.col("l_quantity").cast("long").alias("qty"))
    stats = in_window.groupBy(F.col("l_partkey").alias("sp")).agg(
        F.sum("qty").cast("long").alias("qsum"),
        F.count("*").cast("long").alias("qcnt"),
    )
    return (
        in_window.join(stats, F.col("l_partkey") == F.col("sp"))
        .where(10 * F.col("qty") * F.col("qcnt") > 13 * F.col("qsum"))
        .agg(
            F.sum("qty").cast("long").alias("excess_qty"),
            F.count("*").cast("long").alias("n_rows"),
        )
    )


@probe(
    "p_ds_q73_trip_buckets",
    oracle="""
    WITH trips AS (
      SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY o_custkey
      HAVING COUNT(*) BETWEEN 8 AND 12)
    SELECT c.c_custkey, c.c_name, c.c_mktsegment, t.n_orders
    FROM trips t JOIN customer c ON t.o_custkey = c.c_custkey
    ORDER BY t.n_orders DESC, c.c_custkey
    """,
    tags=("tpcds",),
)
def p_ds_q73_trip_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q73 shape: per-customer trip counts banded by HAVING, then
    joined back to customer attributes — aggregate-then-broadcast-join,
    never join-then-aggregate. Ref corpus: tpcds.yaml q73."""
    t = T(spark, sf_dir)
    trips = (
        t.orders.where(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_custkey")
        .agg(F.count("*").cast("long").alias("n_orders"))
        .where(F.col("n_orders").between(8, 12))
    )
    return (
        trips.join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment", "n_orders")
        .orderBy(F.col("n_orders").desc(), "c_custkey")
    )
