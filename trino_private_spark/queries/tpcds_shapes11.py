"""TPC-DS signature shapes, eleventh tranche (q5, q57, q64, q72).

- q5: heterogeneous channel blocks (sales vs returns as negations)
  UNION ALL'd, then ROLLUP'd to channel + grand totals — the
  union-then-rollup two-level shape.
- q57: centered moving-average deviation — a ROWS BETWEEN 1 PRECEDING
  AND 1 FOLLOWING window, detail rows kept when they stray from their
  centered mean (stated in exact integers: |3*x - windowsum| > windowsum).
- q64: the same (customer, part) pair observed in two different years,
  paired by a self-join of a pre-collapsed aggregate — detail columns
  from both sides.
- q72: a date-offset join — fact rows matched to a calendar key shifted
  by a fixed interval (ship five days after order), the
  join-on-date-arithmetic shape.

Ref corpus: testing/trino-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpcds.yaml (q01-q99). Fixture-adapted; exact-integer
predicates throughout.  With this tranche the corpus covers 61 distinct
TPC-DS plan signatures; the remaining forty-odd queries reuse these
shapes with different dimension columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q5_union_rollup",
    oracle="""
    WITH blocks AS (
      SELECT 'order' AS channel, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
      UNION ALL
      SELECT 'return' AS channel, CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr,
             -CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem WHERE l_returnflag = 'R'
        AND EXTRACT(YEAR FROM l_shipdate) IN (1995, 1996))
    SELECT channel, yr, CAST(SUM(cents) AS BIGINT) / 100.0 AS net,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM blocks
    GROUP BY ROLLUP (channel, yr)
    ORDER BY channel NULLS FIRST, yr NULLS FIRST
    """,
    tags=("tpcds", "rollup", "setop"),
)
def p_ds_q5_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q5 shape: per-channel blocks (returns enter negated) stacked
    with UNION ALL and rolled up to channel and grand totals in one
    aggregation. Ref corpus: tpcds.yaml q5."""
    t = T(spark, sf_dir)
    sales = t.orders.where(F.year("o_orderdate").isin(1995, 1996)).select(
        F.lit("order").alias("channel"),
        F.year("o_orderdate").cast("long").alias("yr"),
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    returns = t.lineitem.where(
        (F.col("l_returnflag") == "R") & F.year("l_shipdate").isin(1995, 1996)
    ).select(
        F.lit("return").alias("channel"),
        F.year("l_shipdate").cast("long").alias("yr"),
        (-_cents(F.col("l_extendedprice"))).alias("cents"),
    )
    return (
        sales.unionByName(returns)
        .rollup("channel", "yr")
        .agg(
            (F.sum("cents").cast("long") / 100.0).alias("net"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy(F.col("channel").asc_nulls_first(), F.col("yr").asc_nulls_first())
    )


@probe(
    "p_ds_q57_centered_window",
    oracle="""
    WITH monthly AS (
      SELECT o_custkey,
             CAST(EXTRACT(YEAR FROM o_orderdate) * 12 + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS ym,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2),
    win AS (
      SELECT o_custkey, ym, cents,
             CAST(SUM(cents) OVER (PARTITION BY o_custkey ORDER BY ym
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS wsum,
             CAST(COUNT(*) OVER (PARTITION BY o_custkey ORDER BY ym
                  ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS wn
      FROM monthly)
    SELECT o_custkey, ym, cents / 100.0 AS sales
    FROM win
    WHERE wn = 3 AND 2 * 3 * cents > 3 * wsum
    ORDER BY o_custkey, ym
    """,
    tags=("tpcds", "window"),
)
def p_ds_q57_centered_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q57 shape: per-entity monthly series with a CENTERED moving
    window (ROWS 1 PRECEDING..1 FOLLOWING); rows kept when the value
    exceeds twice the centered average, cross-multiplied to integers
    (2*3*x > 3*wsum == x > 2*avg3). Ref corpus: tpcds.yaml q57."""
    t = T(spark, sf_dir)
    monthly = (
        t.orders.groupBy(
            "o_custkey",
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long")
            .alias("ym"),
        )
        .agg(F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("cents"))
    )
    w = Window.partitionBy("o_custkey").orderBy("ym").rowsBetween(-1, 1)
    return (
        monthly.withColumn("wsum", F.sum("cents").over(w))
        .withColumn("wn", F.count("*").over(w))
        .where((F.col("wn") == 3) & (2 * 3 * F.col("cents") > 3 * F.col("wsum")))
        .select("o_custkey", "ym", (F.col("cents") / 100.0).alias("sales"))
        .orderBy("o_custkey", "ym")
    )


@probe(
    "p_ds_q64_two_period_pair",
    oracle="""
    WITH cp AS (
      SELECT o.o_custkey, l.l_partkey,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE EXTRACT(YEAR FROM o.o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2, 3)
    SELECT a.o_custkey AS custkey, a.l_partkey AS partkey,
           a.cents / 100.0 AS sales_1995, b.cents / 100.0 AS sales_1996
    FROM cp a JOIN cp b
      ON a.o_custkey = b.o_custkey AND a.l_partkey = b.l_partkey
    WHERE a.yr = 1995 AND b.yr = 1996 AND b.cents > a.cents
    ORDER BY custkey, partkey
    """,
    tags=("tpcds",),
)
def p_ds_q64_two_period_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q64 shape: the same (customer, part) pair observed in two
    years, paired by a self-join of one pre-collapsed aggregate on the
    composite key, detail measures from both sides with a growth filter.
    Ref corpus: tpcds.yaml q64."""
    t = T(spark, sf_dir)
    cp = (
        t.lineitem.join(
            t.orders.where(F.year("o_orderdate").isin(1995, 1996)).select(
                "o_orderkey", "o_custkey", F.year("o_orderdate").cast("long").alias("yr")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey", "l_partkey", "yr")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )
    a = cp.where(F.col("yr") == 1995).alias("a")
    b = cp.where(F.col("yr") == 1996).alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.l_partkey") == F.col("b.l_partkey")),
        )
        .where(F.col("b.cents") > F.col("a.cents"))
        .select(
            F.col("a.o_custkey").alias("custkey"),
            F.col("a.l_partkey").alias("partkey"),
            (F.col("a.cents") / 100.0).alias("sales_1995"),
            (F.col("b.cents") / 100.0).alias("sales_1996"),
        )
        .orderBy("custkey", "partkey")
    )


@probe(
    "p_ds_q72_date_offset_join",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_quick,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + INTERVAL 5 DAY
    """,
    tags=("tpcds",),
)
def p_ds_q72_date_offset_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q72 shape: a join predicate built from date arithmetic
    (shipped within five days of ordering) — the key+interval condition
    rides the equi-join on orderkey so it stays a hash join with a
    residual, never a theta-only join. Ref corpus: tpcds.yaml q72."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(
            F.col("l_shipdate").cast("date")
            <= F.date_add(F.col("o_orderdate").cast("date"), 5)
        )
        .agg(
            F.count("*").cast("long").alias("n_quick"),
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"),
        )
    )
