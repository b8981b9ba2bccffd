"""TPC-DS signature shapes, tenth tranche (q10, q18, q28, q33, q94, q95).

- q10: per-entity spend above 1.2x its group's average — the correlated
  group-average comparison decorrelated into a window, stated in exact
  integers (10 * spend * n > 12 * group_sum).
- q18: multi-measure ROLLUP — several exact averages (sum/count pairs)
  over a two-level hierarchy in one aggregation.
- q28: six value-band statistics (avg / count / count distinct) from ONE
  scan via FILTERed aggregates — the reference query's six self-joined
  subqueries collapse into a single pass.
- q33: three channel-restricted aggregates UNION ALL'd then re-aggregated
  — the two-level aggregate-of-union shape.
- q94: multi-supplier fulfillment gate: >= 2 distinct suppliers AND no
  returned line, with distinct-count + sum in one output row.
- q95: keys whose line set spans BOTH of two specific partner sets —
  conditional-presence flags folded into one aggregation (no self-join).

Ref corpus: testing/trino-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpcds.yaml (q01-q99). Fixture-adapted; exact-integer
predicates throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q10_above_group_avg_detail",
    oracle="""
    WITH spend AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995
      GROUP BY c.c_custkey, c.c_nationkey),
    nat AS (
      SELECT c_nationkey,
             CAST(SUM(cents) AS BIGINT) AS nat_cents,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM spend GROUP BY c_nationkey)
    SELECT s.c_custkey, s.c_nationkey, s.cents / 100.0 AS spend
    FROM spend s JOIN nat t ON s.c_nationkey = t.c_nationkey
    WHERE 10 * s.cents * t.n > 12 * t.nat_cents
    ORDER BY s.c_custkey
    """,
    tags=("tpcds", "window"),
)
def p_ds_q10_above_group_avg_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q10 shape: entities above 1.2x their group's average,
    detail rows out.  One aggregation + one window (sum/count over the
    nation partition) — no re-join of a separate averages table; the
    1.2x test is the exact-integer cross-multiplication
    10*spend*n > 12*group_sum. Ref corpus: tpcds.yaml q10."""
    t = T(spark, sf_dir)
    spend = (
        t.orders.where(F.year("o_orderdate") == 1995)
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("cents"))
    )
    w = Window.partitionBy("c_nationkey")
    return (
        spend.withColumn("nat_cents", F.sum("cents").over(w))
        .withColumn("n", F.count("*").over(w))
        .where(10 * F.col("cents") * F.col("n") > 12 * F.col("nat_cents"))
        .select("c_custkey", "c_nationkey", (F.col("cents") / 100.0).alias("spend"))
        .orderBy("c_custkey")
    )


@probe(
    "p_ds_q18_rollup_avgs",
    oracle="""
    SELECT c.c_nationkey,
           CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS yr,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE EXTRACT(YEAR FROM o.o_orderdate) IN (1995, 1996)
    GROUP BY ROLLUP (c.c_nationkey, EXTRACT(YEAR FROM o.o_orderdate))
    ORDER BY c_nationkey NULLS FIRST, yr NULLS FIRST
    """,
    tags=("tpcds", "rollup"),
)
def p_ds_q18_rollup_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q18 shape: several exact averages over a ROLLUP hierarchy in
    one aggregation — averages carried as (sum_cents, count) pairs so every
    level is integer-exact and the division happens at render time.
    Ref corpus: tpcds.yaml q18."""
    t = T(spark, sf_dir)
    j = (
        t.orders.where(F.year("o_orderdate").isin(1995, 1996))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_nationkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            _cents(F.col("o_totalprice")).alias("pc"),
            _cents(F.col("c_acctbal")).alias("bc"),
        )
    )
    return (
        j.rollup("c_nationkey", "yr")
        .agg(
            F.sum("pc").cast("long").alias("price_cents"),
            F.count("*").cast("long").alias("n"),
            F.sum("bc").cast("long").alias("bal_cents"),
        )
        .orderBy(
            F.col("c_nationkey").asc_nulls_first(), F.col("yr").asc_nulls_first()
        )
    )


@probe(
    "p_ds_q28_six_band_stats",
    oracle="""
    SELECT
      CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS b1_cents,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 END) AS BIGINT) AS b1_n,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 1 AND 10 THEN l_partkey END) AS BIGINT) AS b1_parts,
      CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS b2_cents,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 END) AS BIGINT) AS b2_n,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 11 AND 20 THEN l_partkey END) AS BIGINT) AS b2_parts,
      CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS b3_cents,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN 1 END) AS BIGINT) AS b3_n,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 21 AND 30 THEN l_partkey END) AS BIGINT) AS b3_parts,
      CAST(SUM(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS b4_cents,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 31 AND 40 THEN 1 END) AS BIGINT) AS b4_n,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 31 AND 40 THEN l_partkey END) AS BIGINT) AS b4_parts,
      CAST(SUM(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS b5_cents,
      CAST(COUNT(CASE WHEN l_quantity BETWEEN 41 AND 50 THEN 1 END) AS BIGINT) AS b5_n,
      CAST(COUNT(DISTINCT CASE WHEN l_quantity BETWEEN 41 AND 50 THEN l_partkey END) AS BIGINT) AS b5_parts,
      CAST(SUM(CASE WHEN l_discount = 0 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS b6_cents,
      CAST(COUNT(CASE WHEN l_discount = 0 THEN 1 END) AS BIGINT) AS b6_n,
      CAST(COUNT(DISTINCT CASE WHEN l_discount = 0 THEN l_partkey END) AS BIGINT) AS b6_parts
    FROM lineitem
    """,
    tags=("tpcds",),
)
def p_ds_q28_six_band_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q28 shape: six band statistics (sum / count / count distinct)
    in ONE scan with FILTERed aggregates — the reference query's six
    cross-joined subqueries collapse into a single pass; only the six
    distinct-counts expand the aggregation. Ref corpus: tpcds.yaml q28."""
    t = T(spark, sf_dir)
    li = t.lineitem
    bands = [
        ("b1", F.col("l_quantity").between(1, 10)),
        ("b2", F.col("l_quantity").between(11, 20)),
        ("b3", F.col("l_quantity").between(21, 30)),
        ("b4", F.col("l_quantity").between(31, 40)),
        ("b5", F.col("l_quantity").between(41, 50)),
        ("b6", F.col("l_discount") == 0),
    ]
    aggs = []
    for nm, cond in bands:
        aggs.append(
            F.sum(F.when(cond, _cents(F.col("l_extendedprice")))).cast("long").alias(f"{nm}_cents")
        )
        aggs.append(F.count(F.when(cond, F.lit(1))).cast("long").alias(f"{nm}_n"))
        aggs.append(
            F.countDistinct(F.when(cond, F.col("l_partkey"))).cast("long").alias(f"{nm}_parts")
        )
    return li.agg(*aggs)


@probe(
    "p_ds_q33_union_reagg",
    oracle="""
    WITH per_channel AS (
      SELECT p.p_brand, l.l_returnflag,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_returnflag IN ('A', 'N', 'R')
      GROUP BY p.p_brand, l.l_returnflag)
    SELECT p_brand, CAST(SUM(cents) AS BIGINT) / 100.0 AS total_sales
    FROM per_channel
    GROUP BY p_brand
    HAVING COUNT(*) = 3
    ORDER BY p_brand
    """,
    tags=("tpcds",),
)
def p_ds_q33_union_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q33 shape: per-channel aggregates re-aggregated to a total
    (the UNION ALL of three channel arms becomes one two-level aggregate);
    brands kept only when every channel contributed.
    Ref corpus: tpcds.yaml q33."""
    t = T(spark, sf_dir)
    per = (
        t.lineitem.where(F.col("l_returnflag").isin("A", "N", "R"))
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "l_returnflag")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )
    return (
        per.groupBy("p_brand")
        .agg(
            (F.sum("cents").cast("long") / 100.0).alias("total_sales"),
            F.count("*").alias("_nch"),
        )
        .where(F.col("_nch") == 3)
        .drop("_nch")
        .orderBy("p_brand")
    )


@probe(
    "p_ds_q94_multi_supplier_clean",
    oracle="""
    WITH per_order AS (
      SELECT l_orderkey,
             CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
             CAST(MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS returned,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS total_price
    FROM per_order
    WHERE n_supp >= 2 AND returned = 0
    """,
    tags=("tpcds",),
)
def p_ds_q94_multi_supplier_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q94 shape: orders fulfilled by >= 2 distinct suppliers with
    zero returned lines — the EXISTS(other supplier)/NOT EXISTS(return)
    pair collapsed into one per-order aggregate (distinct count + flag
    max), then one scalar rollup. Ref corpus: tpcds.yaml q94."""
    t = T(spark, sf_dir)
    per = t.lineitem.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").cast("long").alias("n_supp"),
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("long")
        .alias("returned"),
        F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"),
    )
    return per.where((F.col("n_supp") >= 2) & (F.col("returned") == 0)).agg(
        F.count("*").cast("long").alias("n_orders"),
        (F.sum("cents").cast("long") / 100.0).alias("total_price"),
    )


@probe(
    "p_ds_q95_both_partner_sets",
    oracle="""
    WITH flags AS (
      SELECT l.l_orderkey,
             CAST(MAX(CASE WHEN s.s_nationkey < 5 THEN 1 ELSE 0 END) AS BIGINT) AS from_low,
             CAST(MAX(CASE WHEN s.s_nationkey >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS from_high
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY l.l_orderkey)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_spanning
    FROM flags WHERE from_low = 1 AND from_high = 1
    """,
    tags=("tpcds",),
)
def p_ds_q95_both_partner_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q95 shape: keys whose line set touches BOTH of two partner
    populations — two EXISTS subqueries folded into conditional-presence
    flags in a single aggregation (no self-join of the fact).
    Ref corpus: tpcds.yaml q95."""
    t = T(spark, sf_dir)
    flags = (
        t.lineitem.join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.max(F.when(F.col("s_nationkey") < 5, 1).otherwise(0))
            .cast("long")
            .alias("from_low"),
            F.max(F.when(F.col("s_nationkey") >= 20, 1).otherwise(0))
            .cast("long")
            .alias("from_high"),
        )
    )
    return flags.where((F.col("from_low") == 1) & (F.col("from_high") == 1)).agg(
        F.count("*").cast("long").alias("n_spanning")
    )