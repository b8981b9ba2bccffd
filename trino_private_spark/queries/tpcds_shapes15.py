"""TPC-DS signature shapes, fifteenth tranche (q27, q70, q74, q77, q80,
q81, q82, q86) — closing the set: every TPC-DS query q01-q99 now has a
fixture-adapted signature probe (see COVERAGE.md §2.2 for the full map).

Highlights: demographic rollup averages (q27), GROUPING()-ranked rollup
levels (q70 by geography, q86 by priority hierarchy), count-measure growth
ratio (q74), sales-vs-returns FULL OUTER with coalesced totals (q77),
return-corrected profit rollup by channel (q80), above-group-average
returns by supplier geography (q81), and the attribute+fact band list with
a supplier join (q82).

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
    "p_ds_q27_demographic_rollup",
    oracle="""
    SELECT c.c_mktsegment, c.c_nationkey,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1996
    GROUP BY ROLLUP (c.c_mktsegment, c.c_nationkey)
    ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
    """,
    tags=("tpcds", "rollup"),
)
def p_ds_q27_demographic_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q27 shape: averages over a (demographic, geography) rollup,
    carried as exact (sum, count). Ref corpus: tpcds.yaml q27."""
    t = T(spark, sf_dir)
    return (
        t.orders.where(F.year("o_orderdate") == 1996)
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .rollup("c_mktsegment", "c_nationkey")
        .agg(
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("price_cents"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy(
            F.col("c_mktsegment").asc_nulls_first(),
            F.col("c_nationkey").asc_nulls_first(),
        )
    )


@probe(
    "p_ds_q70_grouping_rank_levels",
    oracle="""
    WITH r AS (
      SELECT n.n_regionkey, s.s_nationkey,
             CAST(GROUPING(n.n_regionkey) + GROUPING(s.s_nationkey) AS BIGINT) AS lochierarchy,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      GROUP BY ROLLUP (n.n_regionkey, s.s_nationkey))
    SELECT lochierarchy, n_regionkey, s_nationkey, cents / 100.0 AS sales,
           CAST(RANK() OVER (PARTITION BY lochierarchy
                             ORDER BY cents DESC, s_nationkey NULLS FIRST) AS BIGINT) AS rk
    FROM r
    ORDER BY lochierarchy, rk, n_regionkey NULLS FIRST, s_nationkey NULLS FIRST
    """,
    tags=("tpcds", "rollup", "window"),
)
def p_ds_q70_grouping_rank_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q70 shape: rollup levels identified by GROUPING() sums and
    ranked WITHIN each hierarchy level — the lochierarchy window partition
    rides the grouping-id column. Ref corpus: tpcds.yaml q70."""
    t = T(spark, sf_dir)
    base = (
        t.lineitem.join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .rollup("n_regionkey", "s_nationkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"),
            (F.grouping("n_regionkey") + F.grouping("s_nationkey")).cast("long").alias("lochierarchy"),
        )
    )
    w = Window.partitionBy("lochierarchy").orderBy(
        F.col("cents").desc(), F.col("s_nationkey").asc_nulls_first()
    )
    return (
        base.select(
            "lochierarchy",
            "n_regionkey",
            "s_nationkey",
            (F.col("cents") / 100.0).alias("sales"),
            F.rank().over(w).cast("long").alias("rk"),
        )
        .orderBy(
            "lochierarchy",
            "rk",
            F.col("n_regionkey").asc_nulls_first(),
            F.col("s_nationkey").asc_nulls_first(),
        )
    )


@probe(
    "p_ds_q74_count_growth",
    oracle="""
    WITH yr AS (
      SELECT o_custkey, CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS yr,
             CASE WHEN o_orderstatus = 'F' THEN 'f' ELSE 'o' END AS chan,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
      GROUP BY 1, 2, 3)
    SELECT f1.o_custkey AS custkey
    FROM yr f1 JOIN yr f2 ON f1.o_custkey = f2.o_custkey
               JOIN yr o1 ON f1.o_custkey = o1.o_custkey
               JOIN yr o2 ON f1.o_custkey = o2.o_custkey
    WHERE f1.chan = 'f' AND f1.yr = 1995 AND f2.chan = 'f' AND f2.yr = 1996
      AND o1.chan = 'o' AND o1.yr = 1995 AND o2.chan = 'o' AND o2.yr = 1996
      AND f2.n * o1.n > f1.n * o2.n
    ORDER BY custkey
    """,
    tags=("tpcds",),
)
def p_ds_q74_count_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q74 shape: the q4/q11 growth-ratio comparison on a COUNT
    measure (order frequency) instead of revenue.
    Ref corpus: tpcds.yaml q74."""
    t = T(spark, sf_dir)
    yr = (
        t.orders.where(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").cast("long").alias("yr"),
            F.when(F.col("o_orderstatus") == "F", "f").otherwise("o").alias("chan"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )

    def sl(chan, year, nm):
        return yr.where((F.col("chan") == chan) & (F.col("yr") == year)).select(
            F.col("o_custkey").alias("custkey"), F.col("n").alias(nm)
        )

    return (
        sl("f", 1995, "f1").join(sl("f", 1996, "f2"), "custkey")
        .join(sl("o", 1995, "o1"), "custkey")
        .join(sl("o", 1996, "o2"), "custkey")
        .where(F.col("f2") * F.col("o1") > F.col("f1") * F.col("o2"))
        .select("custkey")
        .orderBy("custkey")
    )


@probe(
    "p_ds_q77_sales_returns_outer",
    oracle="""
    WITH sales AS (
      SELECT s.s_nationkey AS k,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sc
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE l.l_returnflag <> 'R' GROUP BY 1),
    rets AS (
      SELECT s.s_nationkey AS k,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS rc
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE l.l_returnflag = 'R' GROUP BY 1)
    SELECT COALESCE(sales.k, rets.k) AS nationkey,
           COALESCE(sales.sc, 0) / 100.0 AS sold,
           COALESCE(rets.rc, 0) / 100.0 AS returned,
           (COALESCE(sales.sc, 0) - COALESCE(rets.rc, 0)) / 100.0 AS net
    FROM sales FULL OUTER JOIN rets ON sales.k = rets.k
    ORDER BY nationkey
    """,
    tags=("tpcds",),
)
def p_ds_q77_sales_returns_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q77 shape: per-channel sales and returns FULL OUTER joined on
    the key with COALESCE'd absent sides and a net column.
    Ref corpus: tpcds.yaml q77."""
    t = T(spark, sf_dir)
    j = t.lineitem.join(
        F.broadcast(t.supplier.select("s_suppkey", "s_nationkey")),
        F.col("l_suppkey") == F.col("s_suppkey"),
    )
    sales = (
        j.where(F.col("l_returnflag") != "R")
        .groupBy(F.col("s_nationkey").alias("sk"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("sc"))
    )
    rets = (
        j.where(F.col("l_returnflag") == "R")
        .groupBy(F.col("s_nationkey").alias("rk"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("rc"))
    )
    return (
        sales.join(rets, F.col("sk") == F.col("rk"), "full_outer")
        .select(
            F.coalesce(F.col("sk"), F.col("rk")).alias("nationkey"),
            (F.coalesce(F.col("sc"), F.lit(0)) / 100.0).alias("sold"),
            (F.coalesce(F.col("rc"), F.lit(0)) / 100.0).alias("returned"),
            ((F.coalesce(F.col("sc"), F.lit(0)) - F.coalesce(F.col("rc"), F.lit(0))) / 100.0).alias("net"),
        )
        .orderBy("nationkey")
    )


@probe(
    "p_ds_q80_profit_rollup",
    oracle="""
    WITH rows_ AS (
      SELECT CASE WHEN l_linestatus = 'F' THEN 'filled' ELSE 'open' END AS channel,
             l_returnflag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc,
             CAST(ROUND(l_discount * 100) AS BIGINT) AS dc
      FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1996)
    SELECT channel,
           CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN pc ELSE 0 END) AS BIGINT) / 100.0 AS sales,
           CAST(SUM(CASE WHEN l_returnflag = 'R' THEN pc ELSE 0 END) AS BIGINT) / 100.0 AS returns_,
           CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN pc - dc ELSE -(pc - dc) END) AS BIGINT) / 100.0 AS profit
    FROM rows_
    GROUP BY ROLLUP (channel)
    ORDER BY channel NULLS FIRST
    """,
    tags=("tpcds", "rollup"),
)
def p_ds_q80_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q80 shape: sales / returns / return-corrected profit per
    channel with a ROLLUP grand total — three measures, one scan.
    Ref corpus: tpcds.yaml q80."""
    t = T(spark, sf_dir)
    rows_ = t.lineitem.where(F.year("l_shipdate") == 1996).select(
        F.when(F.col("l_linestatus") == "F", "filled").otherwise("open").alias("channel"),
        "l_returnflag",
        _cents(F.col("l_extendedprice")).alias("pc"),
        _cents(F.col("l_discount")).alias("dc"),
    )
    is_ret = F.col("l_returnflag") == "R"
    return (
        rows_.rollup("channel")
        .agg(
            (F.sum(F.when(~is_ret, F.col("pc")).otherwise(F.lit(0))).cast("long") / 100.0).alias("sales"),
            (F.sum(F.when(is_ret, F.col("pc")).otherwise(F.lit(0))).cast("long") / 100.0).alias("returns_"),
            (F.sum(
                F.when(~is_ret, F.col("pc") - F.col("dc")).otherwise(-(F.col("pc") - F.col("dc")))
            ).cast("long") / 100.0).alias("profit"),
        )
        .orderBy(F.col("channel").asc_nulls_first())
    )


@probe(
    "p_ds_q81_supplier_return_share",
    oracle="""
    WITH ret AS (
      SELECT l_suppkey, s.s_nationkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE l.l_returnflag = 'R'
      GROUP BY 1, 2),
    nat AS (SELECT s_nationkey, CAST(SUM(cents) AS BIGINT) AS ncents,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM ret GROUP BY 1)
    SELECT r.l_suppkey AS suppkey, r.s_nationkey, r.cents / 100.0 AS returned
    FROM ret r JOIN nat t ON r.s_nationkey = t.s_nationkey
    WHERE 100 * r.cents * t.n > 110 * t.ncents
    ORDER BY suppkey
    """,
    tags=("tpcds", "window"),
)
def p_ds_q81_supplier_return_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q81 shape: suppliers whose returns exceed 1.1x their nation's
    average — the q30 decorrelated-window pattern on the supplier axis.
    Ref corpus: tpcds.yaml q81."""
    t = T(spark, sf_dir)
    ret = (
        t.lineitem.where(F.col("l_returnflag") == "R")
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_suppkey", "s_nationkey")
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )
    w = Window.partitionBy("s_nationkey")
    return (
        ret.withColumn("ncents", F.sum("cents").over(w))
        .withColumn("n", F.count("*").over(w))
        .where(100 * F.col("cents") * F.col("n") > 110 * F.col("ncents"))
        .select(
            F.col("l_suppkey").alias("suppkey"),
            "s_nationkey",
            (F.col("cents") / 100.0).alias("returned"),
        )
        .orderBy("suppkey")
    )


@probe(
    "p_ds_q82_band_with_supplier",
    oracle="""
    SELECT DISTINCT p.p_partkey, p.p_name
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE CAST(ROUND(p.p_retailprice * 100) AS BIGINT) BETWEEN 90000 AND 120000
      AND s.s_nationkey < 12
      AND l.l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-06-30'
      AND l.l_quantity BETWEEN 10 AND 40
    ORDER BY p.p_partkey
    """,
    tags=("tpcds",),
)
def p_ds_q82_band_with_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q82 shape: q37's attribute+fact band with an additional
    supplier-side gate, emitting the distinct dimension list.
    Ref corpus: tpcds.yaml q82."""
    t = T(spark, sf_dir)
    return (
        t.part.where(_cents(F.col("p_retailprice")).between(90000, 120000))
        .join(
            t.lineitem.where(
                F.col("l_shipdate").between(F.lit("1996-01-01"), F.lit("1996-06-30"))
                & F.col("l_quantity").between(10, 40)
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(
            F.broadcast(t.supplier.where(F.col("s_nationkey") < 12)),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_semi",
        )
        .select("p_partkey", "p_name")
        .distinct()
        .orderBy("p_partkey")
    )


@probe(
    "p_ds_q86_priority_grouping_rank",
    oracle="""
    WITH r AS (
      SELECT o_orderpriority, o_orderstatus,
             CAST(GROUPING(o_orderpriority) + GROUPING(o_orderstatus) AS BIGINT) AS lochierarchy,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
      GROUP BY ROLLUP (o_orderpriority, o_orderstatus))
    SELECT lochierarchy, o_orderpriority, o_orderstatus, cents / 100.0 AS sales,
           CAST(RANK() OVER (PARTITION BY lochierarchy
                             ORDER BY cents DESC, o_orderstatus NULLS FIRST) AS BIGINT) AS rk
    FROM r
    ORDER BY lochierarchy, rk, o_orderpriority NULLS FIRST, o_orderstatus NULLS FIRST
    """,
    tags=("tpcds", "rollup", "window"),
)
def p_ds_q86_priority_grouping_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q86 shape: q70's GROUPING()-partitioned rank over the order
    priority/status hierarchy. Ref corpus: tpcds.yaml q86."""
    t = T(spark, sf_dir)
    base = (
        t.orders.where(F.year("o_orderdate") == 1995)
        .rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("cents"),
            (F.grouping("o_orderpriority") + F.grouping("o_orderstatus")).cast("long").alias("lochierarchy"),
        )
    )
    w = Window.partitionBy("lochierarchy").orderBy(
        F.col("cents").desc(), F.col("o_orderstatus").asc_nulls_first()
    )
    return (
        base.select(
            "lochierarchy",
            "o_orderpriority",
            "o_orderstatus",
            (F.col("cents") / 100.0).alias("sales"),
            F.rank().over(w).cast("long").alias("rk"),
        )
        .orderBy(
            "lochierarchy",
            "rk",
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )
