"""TPC-DS signature shapes, fifth tranche (q44, q45, q58, q59, q83).

- q44: best AND worst performers — twin asc/desc ranks over one grouped
  aggregate, unioned, then a dim join for names. One aggregation, two
  windows over the same partitioning, one broadcast join.
- q45: disjunction of a local predicate and an IN-subquery membership —
  the ExistenceJoin shape (Catalyst compiles the OR'd IN to an existence
  flag, not a blind semi join).
- q58: "equal revenue bands" — per-key aggregates over two periods joined
  and mutually banded within ±10%, expressed in exact integer arithmetic
  (10*a BETWEEN 9*b AND 11*b) so no float boundary can flip the hash.
- q59: week-over-week ratio — same aggregate over two adjacent years
  self-joined on week number.
- q83: three-channel return counts joined on one key, each channel's
  share of the three-way total.

Ref corpus: testing/trino-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpcds.yaml (q01-q99). Adapted to the driver fixtures
(orders/lineitem/part) with the integer-cents hash discipline of the
earlier tranches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q44_best_worst",
    oracle="""
    WITH perf AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, rev_cents,
             ROW_NUMBER() OVER (ORDER BY rev_cents ASC,  l_partkey) AS rnk_worst,
             ROW_NUMBER() OVER (ORDER BY rev_cents DESC, l_partkey) AS rnk_best
      FROM perf),
    picks AS (
      SELECT 'best' AS side, rnk_best AS rnk, l_partkey, rev_cents
      FROM ranked WHERE rnk_best <= 10
      UNION ALL
      SELECT 'worst' AS side, rnk_worst AS rnk, l_partkey, rev_cents
      FROM ranked WHERE rnk_worst <= 10)
    SELECT side, rnk, p_name, rev_cents / 100.0 AS revenue
    FROM picks JOIN part ON p_partkey = l_partkey
    ORDER BY side, rnk
    """,
    tags=("tpcds",),
)
def p_ds_q44_best_worst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q44 shape: top-10 best and worst by one aggregate — two
    ROW_NUMBER windows (asc/desc, key tiebreak) over a single grouped
    aggregate, union of the two slices, broadcast dim join for names.
    Ref corpus: tpcds.yaml q44."""
    t = T(spark, sf_dir)
    perf = t.lineitem.groupBy("l_partkey").agg(
        F.sum(_cents(F.col("l_extendedprice"))).alias("rev_cents")
    )
    w_worst = Window.orderBy(F.col("rev_cents").asc(), F.col("l_partkey"))
    w_best = Window.orderBy(F.col("rev_cents").desc(), F.col("l_partkey"))
    ranked = perf.withColumn(
        "rnk_worst", F.row_number().over(w_worst).cast("long")
    ).withColumn("rnk_best", F.row_number().over(w_best).cast("long"))
    best = ranked.where(F.col("rnk_best") <= 10).select(
        F.lit("best").alias("side"),
        F.col("rnk_best").alias("rnk"),
        "l_partkey",
        "rev_cents",
    )
    worst = ranked.where(F.col("rnk_worst") <= 10).select(
        F.lit("worst").alias("side"),
        F.col("rnk_worst").alias("rnk"),
        "l_partkey",
        "rev_cents",
    )
    return (
        best.unionAll(worst)
        .join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "side", "rnk", "p_name", (F.col("rev_cents") / 100.0).alias("revenue")
        )
        .orderBy("side", "rnk")
    )


@probe(
    "p_ds_q45_existence_or",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS amount
    FROM orders
    WHERE o_orderkey % 10 = 3
       OR o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    tags=("tpcds",),
)
def p_ds_q45_existence_or(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q45 shape: a local predicate OR'd with IN-subquery
    membership. A plain semi join cannot express the disjunction;
    Catalyst compiles it to an ExistenceJoin producing a boolean flag
    that feeds the OR — declared in SQL so the rewrite applies.
    Ref corpus: tpcds.yaml q45 (zip-list OR item-subquery)."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("__q45_orders")
    t.customer.createOrReplaceTempView("__q45_customer")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 / CAST(100.0 AS DOUBLE) AS amount
        FROM __q45_orders
        WHERE o_orderkey % 10 = 3
           OR o_custkey IN (SELECT c_custkey FROM __q45_customer WHERE c_acctbal > 9000)
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """
    )


@probe(
    "p_ds_q58_equal_bands",
    oracle="""
    WITH a AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1995-01-01'
                      AND l_shipdate <  TIMESTAMP '1996-01-01'
      GROUP BY l_partkey),
    b AS (
      SELECT l_partkey,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                      AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey)
    SELECT a.l_partkey, a.rev / 100.0 AS rev_a, b.rev / 100.0 AS rev_b
    FROM a JOIN b ON a.l_partkey = b.l_partkey
    WHERE 10 * a.rev BETWEEN 9 * b.rev AND 11 * b.rev
      AND 10 * b.rev BETWEEN 9 * a.rev AND 11 * a.rev
    ORDER BY a.l_partkey
    """,
    tags=("tpcds",),
)
def p_ds_q58_equal_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q58 shape: per-key revenue in two periods, keys kept only
    when each period is within ±10% of the other — banding done in exact
    integer arithmetic (10a BETWEEN 9b AND 11b) so the filter cannot
    straddle a float rounding boundary. Ref corpus: tpcds.yaml q58."""
    t = T(spark, sf_dir)

    def year_rev(y: int) -> DataFrame:
        return (
            t.lineitem.where(
                (F.col("l_shipdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .groupBy("l_partkey")
            .agg(F.sum(_cents(F.col("l_extendedprice"))).alias(f"rev_{y}c"))
        )

    a, b = year_rev(1995), year_rev(1996)
    ac, bc = F.col("rev_1995c"), F.col("rev_1996c")
    return (
        a.join(b, on="l_partkey")
        .where(
            (10 * ac).between(9 * bc, 11 * bc) & (10 * bc).between(9 * ac, 11 * ac)
        )
        .select(
            "l_partkey",
            (ac / 100.0).alias("rev_a"),
            (bc / 100.0).alias("rev_b"),
        )
        .orderBy("l_partkey")
    )


@probe(
    "p_ds_q59_wow_ratio",
    oracle="""
    WITH wk AS (
      SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CAST(EXTRACT(WEEK FROM o_orderdate) AS BIGINT) AS wk,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev
      FROM orders GROUP BY 1, 2)
    SELECT a.wk,
           a.rev / 100.0 AS rev_a,
           b.rev / 100.0 AS rev_b,
           ROUND(CAST(b.rev AS DOUBLE) / a.rev, 4) AS ratio
    FROM wk a JOIN wk b ON a.wk = b.wk AND a.yr = 1995 AND b.yr = 1996
    WHERE a.rev > 0
    ORDER BY a.wk
    """,
    tags=("tpcds",),
)
def p_ds_q59_wow_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q59 shape: one weekly aggregate self-joined across two
    adjacent years on week number, ratio per week. The aggregate is
    computed once and reused by alias — two scans collapse into one
    shuffle per side of the self-join. Ref corpus: tpcds.yaml q59.
    NOTE EXTRACT(WEEK) is ISO week in both Spark and DuckDB."""
    t = T(spark, sf_dir)
    wk = t.orders.groupBy(
        F.year("o_orderdate").cast("long").alias("yr"),
        F.weekofyear("o_orderdate").cast("long").alias("wk"),
    ).agg(F.sum(_cents(F.col("o_totalprice"))).alias("rev"))
    a = wk.where(F.col("yr") == 1995).select("wk", F.col("rev").alias("rev_a"))
    b = wk.where(F.col("yr") == 1996).select("wk", F.col("rev").alias("rev_b"))
    return (
        a.join(b, on="wk")
        .where(F.col("rev_a") > 0)
        .select(
            "wk",
            (F.col("rev_a") / 100.0).alias("rev_a"),
            (F.col("rev_b") / 100.0).alias("rev_b"),
            F.round(F.col("rev_b").cast("double") / F.col("rev_a"), 4).alias("ratio"),
        )
        .orderBy("wk")
    )


@probe(
    "p_ds_q83_channel_share",
    oracle="""
    WITH r AS (SELECT l_partkey, COUNT(*) AS n_r FROM lineitem
               WHERE l_returnflag = 'R' GROUP BY l_partkey),
         a AS (SELECT l_partkey, COUNT(*) AS n_a FROM lineitem
               WHERE l_returnflag = 'A' GROUP BY l_partkey),
         n AS (SELECT l_partkey, COUNT(*) AS n_n FROM lineitem
               WHERE l_returnflag = 'N' GROUP BY l_partkey)
    SELECT r.l_partkey, n_r, n_a, n_n,
           ROUND(100.0 * n_r / (n_r + n_a + n_n), 4) AS share_r
    FROM r JOIN a ON r.l_partkey = a.l_partkey
           JOIN n ON r.l_partkey = n.l_partkey
    WHERE n_r + n_a + n_n >= 12
    ORDER BY r.l_partkey
    """,
    tags=("tpcds",),
)
def p_ds_q83_channel_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q83 shape: per-key counts from three channel slices joined
    on the key, each expressed as a share of the three-way total. Counts
    are exact integers; only the final share is floating (rounded).
    Ref corpus: tpcds.yaml q83."""
    t = T(spark, sf_dir)

    def flag_counts(flag: str, alias: str) -> DataFrame:
        return (
            t.lineitem.where(F.col("l_returnflag") == flag)
            .groupBy("l_partkey")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    r = flag_counts("R", "n_r")
    a = flag_counts("A", "n_a")
    n = flag_counts("N", "n_n")
    total = F.col("n_r") + F.col("n_a") + F.col("n_n")
    return (
        r.join(a, on="l_partkey")
        .join(n, on="l_partkey")
        .where(total >= 12)
        .select(
            "l_partkey",
            "n_r",
            "n_a",
            "n_n",
            F.round(F.lit(100.0) * F.col("n_r") / total, 4).alias("share_r"),
        )
        .orderBy("l_partkey")
    )
