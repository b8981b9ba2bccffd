"""TPC-DS signature shapes, thirteenth tranche (q8, q9, q11, q16, q17,
q24, q26, q29, q30, q32).

Highlights: dual semi-join gate (q8), CASE-over-aggregate scalar report
(q9), two-channel growth-ratio comparison on lineitem channels (q11),
per-key flag folding for EXISTS/NOT-EXISTS counts (q16), three-phase
all-present stats with integer variance (q17), HAVING against a global
scalar (q24), demographic average pivot (q26), consecutive-month flow
(q29), above-group-average returns detail (q30), 1.3x-average excess on a
second measure (q32).

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
    "p_ds_q8_dual_semi_gate",
    oracle="""
    WITH rich AS (SELECT DISTINCT c_nationkey FROM customer
                  WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 800000),
    building AS (SELECT DISTINCT c_nationkey FROM customer
                 WHERE c_mktsegment = 'BUILDING')
    SELECT c.c_nationkey,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sales
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1996
      AND c.c_nationkey IN (SELECT c_nationkey FROM rich)
      AND c.c_nationkey IN (SELECT c_nationkey FROM building)
    GROUP BY c.c_nationkey ORDER BY c_nationkey
    """,
    tags=("tpcds", "subquery"),
)
def p_ds_q8_dual_semi_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q8 shape: a geography kept only if present in BOTH derived
    key sets — two left-semi joins on the same dimension column.
    Ref corpus: tpcds.yaml q8."""
    t = T(spark, sf_dir)
    rich = (
        t.customer.where(_cents(F.col("c_acctbal")) > 800000)
        .select("c_nationkey")
        .distinct()
    )
    building = (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .select("c_nationkey")
        .distinct()
    )
    return (
        t.orders.where(F.year("o_orderdate") == 1996)
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(rich), "c_nationkey", "left_semi")
        .join(F.broadcast(building), "c_nationkey", "left_semi")
        .groupBy("c_nationkey")
        .agg((F.sum(_cents(F.col("o_totalprice"))).cast("long") / 100.0).alias("sales"))
        .orderBy("c_nationkey")
    )


@probe(
    "p_ds_q9_case_report",
    oracle="""
    WITH b AS (
      SELECT
        CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS s1,
        CAST(COUNT(CASE WHEN l_quantity BETWEEN 1 AND 10 THEN 1 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS s2,
        CAST(COUNT(CASE WHEN l_quantity BETWEEN 11 AND 20 THEN 1 END) AS BIGINT) AS n2,
        CAST(SUM(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS s3,
        CAST(COUNT(CASE WHEN l_quantity BETWEEN 21 AND 30 THEN 1 END) AS BIGINT) AS n3
      FROM lineitem)
    SELECT CASE WHEN s1 > 3000000 * n1 THEN 'high' ELSE 'low' END AS band1,
           CASE WHEN s2 > 3000000 * n2 THEN 'high' ELSE 'low' END AS band2,
           CASE WHEN s3 > 3000000 * n3 THEN 'high' ELSE 'low' END AS band3
    FROM b
    """,
    tags=("tpcds",),
)
def p_ds_q9_case_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q9 shape: a scalar CASE report over band aggregates — the
    reference's 15 scalar subqueries collapse into ONE scan producing the
    band (sum, count) pairs, the CASEs evaluated on the single row with
    the avg>threshold test cross-multiplied. Ref corpus: tpcds.yaml q9."""
    t = T(spark, sf_dir)
    bands = [(1, 10), (11, 20), (21, 30)]
    aggs = []
    for i, (lo, hi) in enumerate(bands, 1):
        cond = F.col("l_quantity").between(lo, hi)
        aggs.append(
            F.sum(F.when(cond, _cents(F.col("l_extendedprice")))).cast("long").alias(f"s{i}")
        )
        aggs.append(F.count(F.when(cond, F.lit(1))).cast("long").alias(f"n{i}"))
    b = t.lineitem.agg(*aggs)
    return b.select(
        *[
            F.when(F.col(f"s{i}") > 3000000 * F.col(f"n{i}"), "high")
            .otherwise("low")
            .alias(f"band{i}")
            for i in range(1, 4)
        ]
    )


@probe(
    "p_ds_q11_channel_growth_ratio",
    oracle="""
    WITH ch AS (
      SELECT o.o_custkey,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS BIGINT) AS yr,
             l.l_linestatus AS chan,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE EXTRACT(YEAR FROM l.l_shipdate) IN (1995, 1996)
      GROUP BY 1, 2, 3)
    SELECT f1.o_custkey AS custkey
    FROM ch f1 JOIN ch f2 ON f1.o_custkey = f2.o_custkey
               JOIN ch o1 ON f1.o_custkey = o1.o_custkey
               JOIN ch o2 ON f1.o_custkey = o2.o_custkey
    WHERE f1.chan = 'F' AND f1.yr = 1995 AND f2.chan = 'F' AND f2.yr = 1996
      AND o1.chan = 'O' AND o1.yr = 1995 AND o2.chan = 'O' AND o2.yr = 1996
      AND f2.cents * o1.cents > f1.cents * o2.cents
    ORDER BY custkey
    """,
    tags=("tpcds",),
)
def p_ds_q11_channel_growth_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q11 shape: customers whose growth in one channel outpaces the
    other, with the ratio comparison cross-multiplied in exact integers —
    q4's structure on a different channel axis (linestatus).
    Ref corpus: tpcds.yaml q11."""
    t = T(spark, sf_dir)
    ch = (
        t.lineitem.where(F.year("l_shipdate").isin(1995, 1996))
        .join(t.orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "o_custkey",
            F.year("l_shipdate").cast("long").alias("yr"),
            F.col("l_linestatus").alias("chan"),
        )
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )

    def slice_(chan, yr, nm):
        return ch.where((F.col("chan") == chan) & (F.col("yr") == yr)).select(
            F.col("o_custkey").alias("custkey"), F.col("cents").alias(nm)
        )

    f1, f2 = slice_("F", 1995, "f1"), slice_("F", 1996, "f2")
    o1, o2 = slice_("O", 1995, "o1"), slice_("O", 1996, "o2")
    return (
        f1.join(f2, "custkey").join(o1, "custkey").join(o2, "custkey")
        .where(F.col("f2") * F.col("o1") > F.col("f1") * F.col("o2"))
        .select("custkey")
        .orderBy("custkey")
    )


@probe(
    "p_ds_q16_flag_fold_count",
    oracle="""
    WITH per_order AS (
      SELECT l.l_orderkey,
             CAST(MAX(CASE WHEN s.s_nationkey < 10 THEN 1 ELSE 0 END) AS BIGINT) AS has_low,
             CAST(MAX(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS has_ret,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY 1)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) / 100.0 AS total
    FROM per_order WHERE has_low = 1 AND has_ret = 0
    """,
    tags=("tpcds",),
)
def p_ds_q16_flag_fold_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q16 shape: EXISTS(nation-set supplier) AND NOT EXISTS(return)
    folded into per-order presence flags in one aggregate, then a scalar
    count+sum. Ref corpus: tpcds.yaml q16."""
    t = T(spark, sf_dir)
    per = (
        t.lineitem.join(
            F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.max(F.when(F.col("s_nationkey") < 10, 1).otherwise(0))
            .cast("long").alias("has_low"),
            F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long").alias("has_ret"),
            F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"),
        )
    )
    return per.where((F.col("has_low") == 1) & (F.col("has_ret") == 0)).agg(
        F.count("*").cast("long").alias("n_orders"),
        (F.sum("cents").cast("long") / 100.0).alias("total"),
    )


@probe(
    "p_ds_q17_three_phase_stats",
    oracle="""
    WITH ph AS (
      SELECT l_partkey, l_returnflag,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qsum,
             CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS BIGINT) AS qsq,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY 1, 2)
    SELECT a.l_partkey AS partkey,
           a.qsum AS qty_a, n.qsum AS qty_n, r.qsum AS qty_r,
           a.n * a.qsq - a.qsum * a.qsum AS var_num_a
    FROM ph a JOIN ph n ON a.l_partkey = n.l_partkey
              JOIN ph r ON a.l_partkey = r.l_partkey
    WHERE a.l_returnflag = 'A' AND n.l_returnflag = 'N' AND r.l_returnflag = 'R'
      AND a.n >= 3 AND n.n >= 3 AND r.n >= 3
    ORDER BY partkey LIMIT 500
    """,
    tags=("tpcds",),
)
def p_ds_q17_three_phase_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q17 shape: three phases of the same item (sold / kept /
    returned) all present with minimum support, plus an exact-integer
    variance numerator (n*Sum(q^2) - Sum(q)^2) replacing stddev.
    Ref corpus: tpcds.yaml q17."""
    t = T(spark, sf_dir)
    q = F.col("l_quantity").cast("long")
    ph = t.lineitem.groupBy("l_partkey", "l_returnflag").agg(
        F.sum(q).cast("long").alias("qsum"),
        F.sum(q * q).cast("long").alias("qsq"),
        F.count("*").cast("long").alias("n"),
    )

    def sl(flag, pre):
        return ph.where(F.col("l_returnflag") == flag).select(
            F.col("l_partkey").alias("partkey"),
            F.col("qsum").alias(f"{pre}_qsum"),
            F.col("qsq").alias(f"{pre}_qsq"),
            F.col("n").alias(f"{pre}_n"),
        )

    a, n_, r = sl("A", "a"), sl("N", "n"), sl("R", "r")
    return (
        a.join(n_, "partkey").join(r, "partkey")
        .where((F.col("a_n") >= 3) & (F.col("n_n") >= 3) & (F.col("r_n") >= 3))
        .select(
            "partkey",
            F.col("a_qsum").alias("qty_a"),
            F.col("n_qsum").alias("qty_n"),
            F.col("r_qsum").alias("qty_r"),
            (F.col("a_n") * F.col("a_qsq") - F.col("a_qsum") * F.col("a_qsum")).alias(
                "var_num_a"
            ),
        )
        .orderBy("partkey")
        .limit(500)
    )


@probe(
    "p_ds_q24_global_scalar_having",
    oracle="""
    WITH spend AS (
      SELECT o.o_custkey, p.p_brand,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS allc, CAST(COUNT(*) AS BIGINT) AS n FROM spend)
    SELECT s.o_custkey AS custkey, s.p_brand, s.cents / 100.0 AS spend
    FROM spend s, tot
    WHERE 20 * s.cents * tot.n > tot.allc
    ORDER BY custkey, p_brand
    """,
    tags=("tpcds", "subquery"),
)
def p_ds_q24_global_scalar_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q24 shape: per-(customer, brand) spend kept when above 5% of
    the GLOBAL average — the scalar subquery broadcast against every group,
    the 0.05x test cross-multiplied (20*spend*n > total).
    Ref corpus: tpcds.yaml q24."""
    t = T(spark, sf_dir)
    spend = (
        t.lineitem.join(t.orders.select("o_orderkey", "o_custkey"),
                        F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("o_custkey", "p_brand")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )
    tot = spend.agg(
        F.sum("cents").cast("long").alias("allc"), F.count("*").cast("long").alias("n")
    )
    return (
        spend.crossJoin(F.broadcast(tot))
        .where(20 * F.col("cents") * F.col("n") > F.col("allc"))
        .select(
            F.col("o_custkey").alias("custkey"),
            "p_brand",
            (F.col("cents") / 100.0).alias("spend"),
        )
        .orderBy("custkey", "p_brand")
    )


@probe(
    "p_ds_q26_demographic_avgs",
    oracle="""
    SELECT p.p_brand,
           CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
           CAST(SUM(CAST(ROUND(l.l_tax * 100) AS BIGINT)) AS BIGINT) AS tax_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE c.c_mktsegment = 'MACHINERY'
    GROUP BY p.p_brand ORDER BY p_brand
    """,
    tags=("tpcds",),
)
def p_ds_q26_demographic_avgs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q26 shape: item averages for a customer-demographic slice —
    the demographic gate rides the customer dim join; averages carried as
    (sum, count). Ref corpus: tpcds.yaml q26."""
    t = T(spark, sf_dir)
    return (
        t.lineitem
        .join(t.orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(t.customer.where(F.col("c_mktsegment") == "MACHINERY")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty_sum"),
            F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("price_cents"),
            F.sum(_cents(F.col("l_tax"))).cast("long").alias("tax_cents"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy("p_brand")
    )


@probe(
    "p_ds_q29_consecutive_months",
    oracle="""
    WITH m AS (
      SELECT l_partkey, CAST(EXTRACT(MONTH FROM l_shipdate) AS BIGINT) AS mo,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1995
      GROUP BY 1, 2)
    SELECT m1.l_partkey AS partkey, m1.q AS q_jun, m2.q AS q_jul, m3.q AS q_aug
    FROM m m1 JOIN m m2 ON m1.l_partkey = m2.l_partkey
              JOIN m m3 ON m1.l_partkey = m3.l_partkey
    WHERE m1.mo = 6 AND m2.mo = 7 AND m3.mo = 8
    ORDER BY partkey LIMIT 500
    """,
    tags=("tpcds",),
)
def p_ds_q29_consecutive_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q29 shape: the same item present in three consecutive months,
    quantities side by side — one aggregate pivoted by month with an
    all-present gate, not three scans. Ref corpus: tpcds.yaml q29."""
    t = T(spark, sf_dir)
    m = (
        t.lineitem.where(F.year("l_shipdate") == 1995)
        .where(F.month("l_shipdate").isin(6, 7, 8))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            *[
                F.sum(
                    F.when(F.month("l_shipdate") == mo, F.col("l_quantity").cast("long"))
                ).cast("long").alias(nm)
                for mo, nm in ((6, "q_jun"), (7, "q_jul"), (8, "q_aug"))
            ]
        )
    )
    return (
        m.where(
            F.col("q_jun").isNotNull()
            & F.col("q_jul").isNotNull()
            & F.col("q_aug").isNotNull()
        )
        .orderBy("partkey")
        .limit(500)
    )


@probe(
    "p_ds_q30_return_share_detail",
    oracle="""
    WITH ret AS (
      SELECT c.c_custkey, c.c_nationkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2),
    nat AS (SELECT c_nationkey, CAST(SUM(cents) AS BIGINT) AS ncents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ret GROUP BY 1)
    SELECT r.c_custkey, r.c_nationkey, r.cents / 100.0 AS returned
    FROM ret r JOIN nat t ON r.c_nationkey = t.c_nationkey
    WHERE 10 * r.cents * t.n > 12 * t.ncents
    ORDER BY c_custkey
    """,
    tags=("tpcds", "window"),
)
def p_ds_q30_return_share_detail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q30 shape: customers returning above 1.2x their nation's
    average RETURN total — q10's window decorrelation applied to the
    returns slice. Ref corpus: tpcds.yaml q30."""
    t = T(spark, sf_dir)
    ret = (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .join(t.orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )
    w = Window.partitionBy("c_nationkey")
    return (
        ret.withColumn("ncents", F.sum("cents").over(w))
        .withColumn("n", F.count("*").over(w))
        .where(10 * F.col("cents") * F.col("n") > 12 * F.col("ncents"))
        .select("c_custkey", "c_nationkey", (F.col("cents") / 100.0).alias("returned"))
        .orderBy("c_custkey")
    )


@probe(
    "p_ds_q32_excess_discount",
    oracle="""
    WITH stats AS (
      SELECT l_partkey AS sp,
             CAST(SUM(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS dsum,
             CAST(COUNT(*) AS BIGINT) AS dcnt
      FROM lineitem WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
      GROUP BY 1)
    SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS excess_rev
    FROM lineitem JOIN stats ON l_partkey = sp
    WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
      AND 10 * CAST(ROUND(l_discount * 100) AS BIGINT) * dcnt > 13 * dsum
    """,
    tags=("tpcds", "subquery"),
)
def p_ds_q32_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q32 shape ("excess discount"): revenue of rows whose discount
    exceeds 1.3x their item's average discount — decorrelated join, exact
    integer cross-multiplication. Ref corpus: tpcds.yaml q32."""
    t = T(spark, sf_dir)
    win = t.lineitem.where(
        F.col("l_shipdate").between(F.lit("1995-01-01"), F.lit("1995-06-30"))
    ).select("l_partkey", _cents(F.col("l_discount")).alias("dc"),
             _cents(F.col("l_extendedprice")).alias("pc"))
    stats = win.groupBy(F.col("l_partkey").alias("sp")).agg(
        F.sum("dc").cast("long").alias("dsum"),
        F.count("*").cast("long").alias("dcnt"),
    )
    return (
        win.join(stats, F.col("l_partkey") == F.col("sp"))
        .where(10 * F.col("dc") * F.col("dcnt") > 13 * F.col("dsum"))
        .agg((F.sum("pc").cast("long") / 100.0).alias("excess_rev"))
    )
