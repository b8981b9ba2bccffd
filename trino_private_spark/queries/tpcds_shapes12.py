"""TPC-DS signature shapes, twelfth tranche (q3, q6, q7, q12, q19, q20,
q22, q42, q52, q55) — the reporting family: filtered fact-dim joins,
share-of-category windows, rollup averages, and brand leaderboards.

Ref corpus: testing/trino-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpcds.yaml (q01-q99). Fixture-adapted; money as exact
integer cents, ratios emitted as ROUND(x, 6) of exact-integer divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q3_brand_month",
    oracle="""
    SELECT p.p_brand,
           CAST(EXTRACT(MONTH FROM l.l_shipdate) AS BIGINT) AS mo,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sales
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE EXTRACT(YEAR FROM l.l_shipdate) = 1995 AND p.p_size < 10
    GROUP BY 1, 2 ORDER BY p_brand, mo
    """,
    tags=("tpcds",),
)
def p_ds_q3_brand_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q3 shape: date-window fact scan joined to a filtered item
    dim, grouped by (brand, month). Ref corpus: tpcds.yaml q3."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.where(F.year("l_shipdate") == 1995)
        .join(F.broadcast(t.part.where(F.col("p_size") < 10)),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", F.month("l_shipdate").cast("long").alias("mo"))
        .agg((F.sum(_cents(F.col("l_extendedprice"))).cast("long") / 100.0).alias("sales"))
        .orderBy("p_brand", "mo")
    )


@probe(
    "p_ds_q6_above_category_avg",
    oracle="""
    WITH cat AS (
      SELECT split_part(p_type, ' ', 1) AS category,
             CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS BIGINT) AS csum,
             CAST(COUNT(*) AS BIGINT) AS cn
      FROM part GROUP BY 1),
    pricey AS (
      SELECT p.p_partkey
      FROM part p JOIN cat c ON split_part(p.p_type, ' ', 1) = c.category
      WHERE 100 * CAST(ROUND(p.p_retailprice * 100) AS BIGINT) * c.cn > 105 * c.csum)
    SELECT s.s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN pricey ON l.l_partkey = pricey.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey HAVING COUNT(*) >= 10
    ORDER BY s_nationkey
    """,
    tags=("tpcds",),
)
def p_ds_q6_above_category_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q6 shape: items priced over 1.05x their category average
    (integer cross-multiplied), counted by geography with HAVING.
    Ref corpus: tpcds.yaml q6."""
    t = T(spark, sf_dir)
    part = t.part.withColumn("category", F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)))
    cat = part.groupBy("category").agg(
        F.sum(_cents(F.col("p_retailprice"))).cast("long").alias("csum"),
        F.count("*").cast("long").alias("cn"),
    )
    pricey = (
        part.join(F.broadcast(cat), "category")
        .where(100 * _cents(F.col("p_retailprice")) * F.col("cn") > 105 * F.col("csum"))
        .select("p_partkey")
    )
    return (
        t.lineitem.join(F.broadcast(pricey), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(F.count("*").cast("long").alias("n_lines"))
        .where(F.col("n_lines") >= 10)
        .orderBy("s_nationkey")
    )


@probe(
    "p_ds_q7_avg_pivot",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
           CAST(SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_returnflag = 'N' AND l.l_linestatus = 'O'
    GROUP BY p.p_brand ORDER BY p_brand
    """,
    tags=("tpcds",),
)
def p_ds_q7_avg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q7 shape: four averages by item for a demographic slice —
    carried as exact (sum, count) pairs. Ref corpus: tpcds.yaml q7."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.where((F.col("l_returnflag") == "N") & (F.col("l_linestatus") == "O"))
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty_sum"),
            F.count("*").cast("long").alias("n"),
            F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("price_cents"),
            F.sum(_cents(F.col("l_discount"))).cast("long").alias("disc_cents"),
        )
        .orderBy("p_brand")
    )


@probe(
    "p_ds_q12_category_share",
    oracle="""
    WITH rev AS (
      SELECT split_part(p.p_type, ' ', 1) AS category, p.p_brand,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate BETWEEN DATE '1995-02-01' AND DATE '1995-03-31'
      GROUP BY 1, 2)
    SELECT category, p_brand, cents / 100.0 AS sales,
           ROUND(CAST(cents AS DOUBLE) * 100 /
                 SUM(cents) OVER (PARTITION BY category), 6) AS share_pct
    FROM rev ORDER BY category, p_brand
    """,
    tags=("tpcds", "window"),
)
def p_ds_q12_category_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q12 shape: revenue share within category via a window total
    over the aggregate — one shuffle for the group-by, one for the window.
    Ref corpus: tpcds.yaml q12."""
    t = T(spark, sf_dir)
    rev = (
        t.lineitem.where(
            F.col("l_shipdate").between(F.lit("1995-02-01"), F.lit("1995-03-31"))
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("category", F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)))
        .groupBy("category", "p_brand")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )
    w = Window.partitionBy("category")
    return rev.select(
        "category",
        "p_brand",
        (F.col("cents") / 100.0).alias("sales"),
        F.round(F.col("cents").cast("double") * 100 / F.sum("cents").over(w), 6).alias(
            "share_pct"
        ),
    ).orderBy("category", "p_brand")


@probe(
    "p_ds_q19_brand_geo",
    oracle="""
    SELECT p.p_brand, n.n_name,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sales
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size BETWEEN 5 AND 15 AND EXTRACT(MONTH FROM l.l_shipdate) = 12
    GROUP BY 1, 2 ORDER BY p_brand, n_name
    """,
    tags=("tpcds",),
)
def p_ds_q19_brand_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q19 shape: brand revenue by geography for one month, three
    broadcast dims on one fact scan. Ref corpus: tpcds.yaml q19."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.where(F.month("l_shipdate") == 12)
        .join(F.broadcast(t.part.where(F.col("p_size").between(5, 15))),
              F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("p_brand", "n_name")
        .agg((F.sum(_cents(F.col("l_extendedprice"))).cast("long") / 100.0).alias("sales"))
        .orderBy("p_brand", "n_name")
    )


@probe(
    "p_ds_q20_type_share",
    oracle="""
    WITH rev AS (
      SELECT p.p_type,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_shipdate BETWEEN DATE '1995-06-01' AND DATE '1995-07-31'
      GROUP BY 1)
    SELECT p_type, cents / 100.0 AS sales,
           ROUND(CAST(cents AS DOUBLE) * 100 / (SELECT SUM(cents) FROM rev), 6) AS share_pct
    FROM rev ORDER BY p_type
    """,
    tags=("tpcds",),
)
def p_ds_q20_type_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q20 shape: share of a GLOBAL total (scalar subquery over the
    same aggregate) rather than q12's per-category window.
    Ref corpus: tpcds.yaml q20."""
    t = T(spark, sf_dir)
    rev = (
        t.lineitem.where(
            F.col("l_shipdate").between(F.lit("1995-06-01"), F.lit("1995-07-31"))
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_type")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )
    w = Window.partitionBy()
    return rev.select(
        "p_type",
        (F.col("cents") / 100.0).alias("sales"),
        F.round(F.col("cents").cast("double") * 100 / F.sum("cents").over(w), 6).alias(
            "share_pct"
        ),
    ).orderBy("p_type")


@probe(
    "p_ds_q22_rollup_avg_qoh",
    oracle="""
    SELECT p.p_brand, split_part(p.p_type, ' ', 1) AS category,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY ROLLUP (p.p_brand, split_part(p.p_type, ' ', 1))
    ORDER BY p_brand NULLS FIRST, category NULLS FIRST
    """,
    tags=("tpcds", "rollup"),
)
def p_ds_q22_rollup_avg_qoh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q22 shape: average quantity-on-hand over a product rollup
    hierarchy, carried as exact (sum, count). Ref corpus: tpcds.yaml q22."""
    t = T(spark, sf_dir)
    j = (
        t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("category", F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)))
        .select("p_brand", "category", F.col("l_quantity").cast("long").alias("q"))
    )
    return (
        j.rollup("p_brand", "category")
        .agg(
            F.sum("q").cast("long").alias("qty_sum"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy(F.col("p_brand").asc_nulls_first(), F.col("category").asc_nulls_first())
    )


@probe(
    "p_ds_q42_year_category",
    oracle="""
    SELECT CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS yr,
           split_part(p.p_type, ' ', 1) AS category,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sales
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE EXTRACT(MONTH FROM l.l_shipdate) = 11
    GROUP BY 1, 2 ORDER BY yr, category
    """,
    tags=("tpcds",),
)
def p_ds_q42_year_category(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q42 shape: one-month revenue by (year, category).
    Ref corpus: tpcds.yaml q42."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.where(F.month("l_shipdate") == 11)
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("category", F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)))
        .groupBy(F.year("l_shipdate").cast("long").alias("yr"), "category")
        .agg((F.sum(_cents(F.col("l_extendedprice"))).cast("long") / 100.0).alias("sales"))
        .orderBy("yr", "category")
    )


@probe(
    "p_ds_q52_brand_leaderboard",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sales
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE EXTRACT(YEAR FROM l.l_shipdate) = 1996 AND EXTRACT(MONTH FROM l.l_shipdate) = 3
    GROUP BY p.p_brand
    ORDER BY sales DESC, p_brand
    LIMIT 25
    """,
    tags=("tpcds",),
)
def p_ds_q52_brand_leaderboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q52 shape: single-month brand revenue leaderboard (ORDER BY
    the measure DESC with a deterministic tiebreak + LIMIT -> TopK).
    Ref corpus: tpcds.yaml q52."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.where((F.year("l_shipdate") == 1996) & (F.month("l_shipdate") == 3))
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg((F.sum(_cents(F.col("l_extendedprice"))).cast("long") / 100.0).alias("sales"))
        .orderBy(F.col("sales").desc(), "p_brand")
        .limit(25)
    )


@probe(
    "p_ds_q55_brand_slice",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sales
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
      AND EXTRACT(YEAR FROM l.l_shipdate) = 1995 AND EXTRACT(MONTH FROM l.l_shipdate) = 6
    GROUP BY p.p_brand ORDER BY sales DESC, p_brand LIMIT 100
    """,
    tags=("tpcds",),
)
def p_ds_q55_brand_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q55 shape: brand revenue for one (manager-analog, month)
    slice — q52 with an extra fact-side dimension gate.
    Ref corpus: tpcds.yaml q55."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.where((F.year("l_shipdate") == 1995) & (F.month("l_shipdate") == 6))
        .join(
            t.orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg((F.sum(_cents(F.col("l_extendedprice"))).cast("long") / 100.0).alias("sales"))
        .orderBy(F.col("sales").desc(), "p_brand")
        .limit(100)
    )
