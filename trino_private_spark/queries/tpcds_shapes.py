"""TPC-DS signature shapes over the driver fixtures.

The reference benchmarks TPC-DS q01-q99 alongside TPC-H
(testing/trino-benchto-benchmarks/src/main/resources/benchmarks/presto/
tpcds.yaml; BASELINE.md). The fixtures carry no TPC-DS catalog, so this
module re-expresses the *signature plan shapes* that distinguish TPC-DS
from TPC-H on the tables we have:

- rollup + per-group rank over the expanded rows (q67)
- grouped-count bucket join-back (q34/q73 "dealership" pattern)
- lag()-based period-over-period comparison on a grouped series (q47/q57)
- multi-band FILTER counts in one scan (q88's eight time-band counts)
- same-entity INTERSECT across two activity slices (q38/q87)
- mixed returned/kept revenue correction (q93)

Each keeps TPC-DS's distinguishing operator composition — Expand feeding
Window, stacked aggregates, set-intersection of big keysets — so the
optimizer work those queries exercise (partial aggs under Expand, window
group limits, distinct-intersect as semi join) is covered even though the
constants are TPC-H-flavored. Also here: the reference's distributed-sort
benchmark shape (distributed_sort.yaml — wide multi-column ORDER BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.relational import dround


@probe(
    "p_ds_q67_rollup_rank",
    oracle="""
    SELECT * FROM (
      SELECT p_brand, yr, sales,
             RANK() OVER (PARTITION BY p_brand
                          ORDER BY sales DESC, yr NULLS FIRST) AS rk
      FROM (
        SELECT p_brand, EXTRACT(YEAR FROM o_orderdate) AS yr,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
                      JOIN orders ON o_orderkey = l_orderkey
        GROUP BY ROLLUP (p_brand, EXTRACT(YEAR FROM o_orderdate))))
    WHERE rk <= 3
    ORDER BY p_brand NULLS FIRST, rk, yr NULLS FIRST LIMIT 200
    """,
    tags=("tpcds",),
)
def p_ds_q67_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67 shape: grouped rollup (Expand) feeding a per-group rank,
    keeping the top slices. Exercises partial aggregation under Expand and
    WindowGroupLimit over the expanded rows — the rollup multiplies rows
    BEFORE the shuffle, so the partial agg must absorb the expansion."""
    t = T(spark, sf_dir)
    base = (
        t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "p_brand",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    agg = base.rollup("p_brand", "yr").agg(dround(F.sum("rev"), 2).alias("sales"))
    w = Window.partitionBy("p_brand").orderBy(
        F.col("sales").desc(), F.col("yr").asc_nulls_first())
    return (
        agg.withColumn("rk", F.rank().over(w).cast("bigint"))
        .where(F.col("rk") <= 3)
        .orderBy(F.col("p_brand").asc_nulls_first(), "rk",
                 F.col("yr").asc_nulls_first())
        .limit(200)
    )


@probe(
    "p_ds_q34_bucket_customers",
    oracle="""
    SELECT c_custkey, c_name, cnt
    FROM (
      SELECT o_custkey, o_orderkey, COUNT(*) AS cnt
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      GROUP BY o_custkey, o_orderkey
      HAVING COUNT(*) BETWEEN 6 AND 7)
    JOIN customer ON c_custkey = o_custkey
    ORDER BY c_custkey
    """,
    tags=("tpcds",),
)
def p_ds_q34_bucket_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q34/q73 shape: per-(customer, ticket) line counts banded by
    HAVING, joined back to the customer dim. The grouped HAVING shrinks the
    fact side to a sliver before the dim join — order of reduction is the
    whole point at 100 TB."""
    t = T(spark, sf_dir)
    buckets = (
        t.orders.join(t.lineitem, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey", "o_orderkey")
        .agg(F.count("*").alias("cnt"))
        .where(F.col("cnt").between(6, 7))
    )
    return (
        buckets.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .select("c_custkey", "c_name", "cnt")
        .orderBy("c_custkey")
    )


@probe(
    "p_ds_q47_period_over_period",
    oracle="""
    SELECT p_brand, yr, mon, sales, prev_sales
    FROM (
      SELECT p_brand, yr, mon, sales,
             LAG(sales, 1) OVER
               (PARTITION BY p_brand ORDER BY yr, mon) AS prev_sales
      FROM (
        SELECT p_brand,
               EXTRACT(YEAR FROM o_orderdate) AS yr,
               EXTRACT(MONTH FROM o_orderdate) AS mon,
               ROUND(SUM(l_extendedprice), 2) AS sales
        FROM lineitem JOIN part ON p_partkey = l_partkey
                      JOIN orders ON o_orderkey = l_orderkey
        WHERE p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        GROUP BY p_brand, EXTRACT(YEAR FROM o_orderdate),
                 EXTRACT(MONTH FROM o_orderdate)))
    WHERE prev_sales IS NOT NULL AND ABS(sales - prev_sales) > 10000
    ORDER BY p_brand, yr, mon LIMIT 500
    """,
    tags=("tpcds",),
)
def p_ds_q47_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q47/q57 shape: a monthly grouped series per brand with a
    lag() month-over-month delta filter. Aggregate-then-window: the window
    runs over the (small) grouped series, never the fact rows, and shares
    the brand partitioning the aggregate already produced."""
    t = T(spark, sf_dir)
    series = (
        t.lineitem.join(
            F.broadcast(t.part.where(
                F.col("p_brand").isin("Brand#1", "Brand#2", "Brand#3"))),
            F.col("p_partkey") == F.col("l_partkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "p_brand",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mon"),
        )
        .agg(dround(F.sum("l_extendedprice"), 2).alias("sales"))
    )
    w = Window.partitionBy("p_brand").orderBy("yr", "mon")
    return (
        series.withColumn("prev_sales", F.lag("sales", 1).over(w))
        .where(F.col("prev_sales").isNotNull()
               & (F.abs(F.col("sales") - F.col("prev_sales")) > 10000))
        .orderBy("p_brand", "yr", "mon")
        .limit(500)
    )


@probe(
    "p_ds_q88_band_counts",
    oracle="""
    SELECT
      COUNT(*) FILTER (l_quantity BETWEEN 1 AND 5)   AS b1,
      COUNT(*) FILTER (l_quantity BETWEEN 6 AND 10)  AS b2,
      COUNT(*) FILTER (l_quantity BETWEEN 11 AND 15) AS b3,
      COUNT(*) FILTER (l_quantity BETWEEN 16 AND 20) AS b4,
      COUNT(*) FILTER (l_quantity BETWEEN 21 AND 25) AS b5,
      COUNT(*) FILTER (l_quantity BETWEEN 26 AND 30) AS b6,
      COUNT(*) FILTER (l_quantity BETWEEN 31 AND 40) AS b7,
      COUNT(*) FILTER (l_quantity BETWEEN 41 AND 50) AS b8
    FROM lineitem
    WHERE l_returnflag = 'N'
    """,
    tags=("tpcds",),
)
def p_ds_q88_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q88 shape: eight banded counts in ONE scan via FILTER'd
    aggregates (q88 spells it as 8 self-joined subqueries; Trino and Spark
    both want the single-pass form). One scan, one row out — the shuffle
    carries 8 longs."""
    t = T(spark, sf_dir)
    q = F.col("l_quantity")
    bands = [(1, 5), (6, 10), (11, 15), (16, 20),
             (21, 25), (26, 30), (31, 40), (41, 50)]
    aggs = [
        F.count(F.when(q.between(lo, hi), True)).alias(f"b{i+1}")
        for i, (lo, hi) in enumerate(bands)
    ]
    return t.lineitem.where(F.col("l_returnflag") == "N").agg(*aggs)


@probe(
    "p_ds_q38_cross_period_customers",
    oracle="""
    SELECT COUNT(*) AS hot_customers FROM (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1997-01-01'
      INTERSECT
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01')
    """,
    tags=("tpcds",),
)
def p_ds_q38_cross_period_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q38/q87 shape: INTERSECT of the same entity key drawn from
    two activity slices (channels in DS; order-years here). Catalyst plans
    distinct-intersect as aggregate + left-semi join — keys shuffle once
    per side, rows never move."""
    t = T(spark, sf_dir)
    def slice_(y0: str, y1: str) -> DataFrame:
        return (
            t.orders.where(
                (F.col("o_orderdate") >= F.lit(y0).cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(y1).cast("timestamp"))
            ).select("o_custkey")
        )
    both = slice_("1996-01-01", "1997-01-01").intersect(
        slice_("1997-01-01", "1998-01-01"))
    return both.agg(F.count("*").alias("hot_customers"))


@probe(
    "p_ds_q93_refund_corrected",
    oracle="""
    SELECT o_custkey,
           ROUND(SUM(CASE WHEN l_returnflag = 'R'
                          THEN l_extendedprice * (1 - l_discount) * 0.5
                          ELSE l_extendedprice * (1 - l_discount) END), 2)
             AS act_sales
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    GROUP BY o_custkey
    ORDER BY act_sales DESC, o_custkey LIMIT 100
    """,
    tags=("tpcds",),
)
def p_ds_q93_refund_corrected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q93 shape: revenue corrected by return lines (DS joins a
    store_returns table; the fixture folds the return marker into
    l_returnflag). The CASE correction happens pre-shuffle so the grouped
    agg carries one corrected double per customer."""
    t = T(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    corrected = F.when(F.col("l_returnflag") == "R", rev * 0.5).otherwise(rev)
    return (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(dround(F.sum(corrected), 2).alias("act_sales"))
        .orderBy(F.col("act_sales").desc(), "o_custkey")
        .limit(100)
    )


@probe(
    "p_distributed_sort_wide",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           strftime(CAST(l_shipdate AS DATE), '%Y-%m-%d') AS sdate,
           l_quantity, l_orderkey, l_linenumber
    FROM lineitem
    ORDER BY l_returnflag, l_linestatus, l_shipdate, l_quantity DESC,
             l_orderkey, l_linenumber
    LIMIT 2000
    """,
    tags=("bench",),
)
def p_distributed_sort_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's distributed-sort benchmark shape (benchmarks/presto/
    distributed_sort.yaml: 1-col and 6-col sorts): a six-key mixed-direction
    sort over the fact table. Spark samples the keyspace for a range
    partitioning, sorts within ranges, and TakeOrderedAndProject caps the
    transfer; the LIMIT keeps the probe's output deterministic."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.select(
            "l_returnflag", "l_linestatus",
            F.date_format(F.col("l_shipdate").cast("date"), "yyyy-MM-dd")
            .alias("sdate"),
            "l_quantity", "l_orderkey", "l_linenumber",
        )
        .orderBy(
            "l_returnflag", "l_linestatus", "sdate",
            F.col("l_quantity").desc(), "l_orderkey", "l_linenumber",
        )
        .limit(2000)
    )


@probe(
    "p_ds_q51_cumulative_crossover",
    oracle="""
    WITH urgent AS (
      SELECT c_mktsegment AS seg, strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mo,
             ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      GROUP BY 1, 2),
    calm AS (
      SELECT c_mktsegment AS seg, strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mo,
             ROUND(SUM(o_totalprice), 2) AS rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
      GROUP BY 1, 2),
    joined AS (
      SELECT COALESCE(u.seg, c.seg) AS seg, COALESCE(u.mo, c.mo) AS mo,
             SUM(COALESCE(u.rev, 0)) OVER (PARTITION BY COALESCE(u.seg, c.seg)
                 ORDER BY COALESCE(u.mo, c.mo)) AS cum_urgent,
             SUM(COALESCE(c.rev, 0)) OVER (PARTITION BY COALESCE(u.seg, c.seg)
                 ORDER BY COALESCE(u.mo, c.mo)) AS cum_calm
      FROM urgent u FULL JOIN calm c ON u.seg = c.seg AND u.mo = c.mo)
    SELECT seg, mo, ROUND(cum_urgent, 2) AS cum_urgent, ROUND(cum_calm, 2) AS cum_calm
    FROM joined WHERE cum_urgent > cum_calm
    ORDER BY seg, mo
    """,
    tags=("tpcds",),
)
def p_ds_q51_cumulative_crossover(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q51 shape: two per-channel grouped series FULL OUTER joined on
    (key, period), each side carrying a running cumulative sum, keeping rows
    where one channel's cumulative total overtakes the other. Scale notes:
    both aggregates shuffle on the same (seg, mo) key, so the full join
    reuses that partitioning; the windows re-shuffle on seg only — three
    shuffles total, none avoidable, all key-pruned before the window."""
    t = T(spark, sf_dir)
    base = t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_mktsegment").alias("seg"),
        F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("mo"),
        "o_totalprice",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_urgent"),
    )
    urgent = (
        base.filter("is_urgent")
        .groupBy("seg", "mo")
        .agg(dround(F.sum("o_totalprice"), 2).alias("rev"))
    )
    calm = (
        base.filter(~F.col("is_urgent"))
        .groupBy("seg", "mo")
        .agg(dround(F.sum("o_totalprice"), 2).alias("rev"))
    )
    j = urgent.alias("u").join(
        calm.alias("c"),
        (F.col("u.seg") == F.col("c.seg")) & (F.col("u.mo") == F.col("c.mo")),
        "full",
    ).select(
        F.coalesce("u.seg", "c.seg").alias("seg"),
        F.coalesce("u.mo", "c.mo").alias("mo"),
        F.coalesce("u.rev", F.lit(0.0)).alias("urev"),
        F.coalesce("c.rev", F.lit(0.0)).alias("crev"),
    )
    w = Window.partitionBy("seg").orderBy("mo")
    return (
        j.select(
            "seg",
            "mo",
            F.sum("urev").over(w).alias("cu"),
            F.sum("crev").over(w).alias("cc"),
        )
        .filter(F.col("cu") > F.col("cc"))
        .select(
            "seg", "mo",
            dround(F.col("cu"), 2).alias("cum_urgent"),
            dround(F.col("cc"), 2).alias("cum_calm"),
        )
        .orderBy("seg", "mo")
    )


@probe(
    "p_ds_q35_exists_union",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS cnt, ROUND(SUM(c_acctbal), 2) AS bal
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders
                        WHERE EXTRACT(YEAR FROM o_orderdate) = 1995)
       OR c_custkey IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    tags=("tpcds",),
)
def p_ds_q35_exists_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q10/q35/q54 shape: demographic rollup of entities active in
    EITHER of two activity channels (EXISTS ... OR EXISTS ...). Spark-first
    rewrite: union the two channel keysets, distinct once, then ONE left-semi
    join — instead of two correlated EXISTS probes over the same dimension
    (the OR of semijoins is a union of build sides, never two passes over
    the probe side)."""
    t = T(spark, sf_dir)
    chan_a = t.orders.filter(F.year("o_orderdate") == 1995).select(
        F.col("o_custkey").alias("k")
    )
    chan_b = t.orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("k")
    )
    active = chan_a.unionByName(chan_b).distinct()
    return (
        t.customer.join(active, F.col("c_custkey") == F.col("k"), "left_semi")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dround(F.sum("c_acctbal"), 2).alias("bal"),
        )
        .orderBy("c_nationkey")
    )


@probe(
    "p_ds_q23_frequent_and_best",
    oracle="""
    WITH frequent_parts AS (
      SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) >= 8),
    best_customers AS (
      SELECT o_custkey FROM orders GROUP BY o_custkey
      HAVING SUM(o_totalprice) > 800000)
    SELECT COUNT(*) AS n, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS rev
    FROM lineitem
    JOIN orders ON o_orderkey = l_orderkey
    WHERE l_partkey IN (SELECT l_partkey FROM frequent_parts)
      AND o_custkey IN (SELECT o_custkey FROM best_customers)
    """,
    tags=("tpcds",),
)
def p_ds_q23_frequent_and_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q23 shape: fact rows restricted by TWO independently derived
    keysets (frequently-sold items x highest-spending customers) feeding one
    final aggregate. Both keysets are HAVING-filtered aggregates — small by
    construction — so both arrive as broadcast semi joins: the 100 TB fact
    scan is filtered in place with zero fact-side shuffles before the final
    single-row agg."""
    t = T(spark, sf_dir)
    frequent = (
        t.lineitem.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= 8)
        .select("l_partkey")
    )
    best = (
        t.orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("s"))
        .filter(F.col("s") > 800000)
        .select("o_custkey")
    )
    fact = t.lineitem.join(
        t.orders.select("o_orderkey", "o_custkey"),
        F.col("o_orderkey") == F.col("l_orderkey"),
    )
    return (
        fact.join(F.broadcast(frequent), "l_partkey", "left_semi")
        .join(F.broadcast(best), "o_custkey", "left_semi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("rev"),
        )
    )


@probe(
    "p_ds_q49_channel_rank_union",
    oracle="""
    WITH base AS (
      SELECT o_orderpriority AS channel, p_brand,
             SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity ELSE 0 END)
               AS ret_qty,
             SUM(l_quantity) AS qty
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                    JOIN part ON p_partkey = l_partkey
      WHERE o_orderpriority IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
      GROUP BY o_orderpriority, p_brand
    ), ranked AS (
      SELECT channel, p_brand, ret_qty / qty AS ret_ratio,
             RANK() OVER (PARTITION BY channel
                          ORDER BY ret_qty / qty DESC, p_brand) AS rk
      FROM base WHERE qty > 0
    )
    SELECT channel, p_brand, ret_ratio, rk FROM ranked WHERE rk <= 10
    ORDER BY channel, rk, p_brand
    """,
    tags=("tpcds",),
)
def p_ds_q49_channel_rank_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q49 shape: the same ranked return-ratio subplan evaluated per
    channel, top-10 per channel, channels unioned. DS runs three channel
    subqueries UNION ALL'd; expressing the channel as a partition key plans
    it as ONE scan + one window instead of three scans — the form that
    survives 100 TB (q49's three channels each rescan a fact table).
    ret_qty/qty stays un-rounded: integer-valued double sums divide
    bit-identically on both engines."""
    t = T(spark, sf_dir)
    base = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .where(
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH", "3-MEDIUM")
        )
        .groupBy(
            F.col("o_orderpriority").alias("channel"), F.col("p_brand")
        )
        .agg(
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R", F.col("l_quantity")
                ).otherwise(F.lit(0))
            ).alias("ret_qty"),
            F.sum("l_quantity").alias("qty"),
        )
    )
    ratio = F.col("ret_qty") / F.col("qty")
    w = Window.partitionBy("channel").orderBy(ratio.desc(), "p_brand")
    return (
        base.where(F.col("qty") > 0)
        .select(
            "channel",
            "p_brand",
            ratio.alias("ret_ratio"),
            F.rank().over(w).cast("bigint").alias("rk"),
        )
        .where(F.col("rk") <= 10)
        .orderBy("channel", "rk", "p_brand")
    )


@probe(
    "p_ds_q54_revenue_segments",
    oracle="""
    SELECT CAST(FLOOR(total / 10000) AS BIGINT) AS segment,
           COUNT(*) AS num_customers
    FROM (
      SELECT o_custkey, ROUND(SUM(o_totalprice), 2) AS total
      FROM orders GROUP BY o_custkey)
    GROUP BY 1 ORDER BY 1
    """,
    tags=("tpcds",),
)
def p_ds_q54_revenue_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q54 shape: per-customer revenue bucketed into fixed-width
    segments (`cast(amt/50 as int)` in DS), then a segment histogram. Two
    stacked aggregations where the second groups on a derived expression —
    the re-shuffle is on the tiny aggregated set, never the fact rows."""
    t = T(spark, sf_dir)
    per_cust = t.orders.groupBy("o_custkey").agg(
        dround(F.sum("o_totalprice"), 2).alias("total")
    )
    return (
        per_cust.select(
            F.floor(F.col("total") / 10000).cast("bigint").alias("segment")
        )
        .groupBy("segment")
        .agg(F.count("*").alias("num_customers"))
        .orderBy("segment")
    )


@probe(
    "p_ds_q31_dual_series_growth",
    oracle="""
    WITH o_year AS (
      SELECT c_nationkey AS nk, EXTRACT(YEAR FROM o_orderdate) AS yr,
             ROUND(SUM(o_totalprice), 2) AS osum
      FROM orders JOIN customer ON c_custkey = o_custkey
      GROUP BY 1, 2
    ), l_year AS (
      SELECT c_nationkey AS nk, EXTRACT(YEAR FROM o_orderdate) AS yr,
             ROUND(SUM(l_extendedprice), 2) AS lsum
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
      GROUP BY 1, 2
    )
    SELECT a1.nk AS nk, a2.osum / a1.osum AS o_growth,
           b2.lsum / b1.lsum AS l_growth
    FROM o_year a1
    JOIN o_year a2 ON a1.nk = a2.nk AND a1.yr = 1995 AND a2.yr = 1996
    JOIN l_year b1 ON b1.nk = a1.nk AND b1.yr = 1995
    JOIN l_year b2 ON b2.nk = a1.nk AND b2.yr = 1996
    WHERE a2.osum / a1.osum > b2.lsum / b1.lsum
    ORDER BY nk
    """,
    tags=("tpcds",),
)
def p_ds_q31_dual_series_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q31 shape: two independent grouped series (store vs web sales
    per county/quarter in DS; order-header vs line revenue per nation/year
    here), self-joined on the entity key to compare period-over-period
    growth between the series. Four aliases of two tiny aggregates join on
    nk — all broadcast-able; the two fact scans happen exactly once."""
    t = T(spark, sf_dir)
    o_year = (
        t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(dround(F.sum("o_totalprice"), 2).alias("osum"))
    )
    l_year = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nk"),
            F.year("o_orderdate").alias("yr"),
        )
        .agg(dround(F.sum("l_extendedprice"), 2).alias("lsum"))
    )
    a1 = o_year.where(F.col("yr") == 1995).select("nk", F.col("osum").alias("o94"))
    a2 = o_year.where(F.col("yr") == 1996).select("nk", F.col("osum").alias("o95"))
    b1 = l_year.where(F.col("yr") == 1995).select("nk", F.col("lsum").alias("l94"))
    b2 = l_year.where(F.col("yr") == 1996).select("nk", F.col("lsum").alias("l95"))
    og = F.col("o95") / F.col("o94")
    lg = F.col("l95") / F.col("l94")
    return (
        a1.join(a2, "nk").join(b1, "nk").join(b2, "nk")
        .where(og > lg)
        .select("nk", og.alias("o_growth"), lg.alias("l_growth"))
        .orderBy("nk")
    )
