"""TPC-DS signature shapes, ninth tranche (q2, q15, q25, q37, q46, q69,
q71, q84).

- q2: week-over-week revenue ratio across consecutive years — weekly
  aggregates self-joined on ISO week number (weeks 2-50 only, so the
  ISO-boundary weeks that differ between engines never appear).
- q15: three-arm disjunctive customer gate (segment IN set OR balance
  above threshold OR nation band) feeding one aggregation.
- q25: same fact sliced into three "channels" that must all be present
  for a key — a three-way inner join of aggregates.
- q37: dimension attribute band AND-ed with a fact-window quantity band,
  emitting the distinct dimension list.
- q46: per-trip (order) aggregate counting only cross-nation lines
  (customer nation != supplier nation), joined back to the customer dim.
- q69: presence in one channel AND absence in another — left-semi plus
  left-anti on the same fact with different predicates.
- q71: time-of-day pivot over the event stream — four conditional sums
  by hour band in one scan.
- q84: pure dimension-chain lookup (customer -> nation -> region) with
  band predicates, the star-lookup shape with two broadcast hops.

Ref corpus: testing/trino-benchto-benchmarks/src/main/resources/
benchmarks/presto/tpcds.yaml (q01-q99). Fixture-adapted; money compared
as exact integer cents (per-row ROUND(x*100) before SUM).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.tpcds_shapes2 import _cents


@probe(
    "p_ds_q2_week_ratio",
    oracle="""
    WITH wk AS (
      SELECT EXTRACT(YEAR FROM o_orderdate) AS yr,
             CAST(weekofyear(o_orderdate) AS BIGINT) AS wk,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) IN (1995, 1996)
        AND weekofyear(o_orderdate) BETWEEN 2 AND 50
      GROUP BY 1, 2)
    SELECT a.wk AS wk,
           a.cents / 100.0 AS sales_1995,
           b.cents / 100.0 AS sales_1996,
           ROUND(CAST(b.cents AS DOUBLE) / a.cents, 6) AS ratio
    FROM wk a JOIN wk b ON a.wk = b.wk
    WHERE a.yr = 1995 AND b.yr = 1996
    ORDER BY wk
    """,
    tags=("tpcds",),
)
def p_ds_q2_week_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q2 shape: weekly aggregate self-joined across years on the
    week number, emitting the YoY ratio per week.  Both engines compute
    ISO week; weeks 1/52/53 are excluded to dodge year-boundary ISO
    assignment differences. Ref corpus: tpcds.yaml q2."""
    t = T(spark, sf_dir)
    wk = (
        t.orders.where(
            F.year("o_orderdate").isin(1995, 1996)
            & F.weekofyear("o_orderdate").between(2, 50)
        )
        .groupBy(
            F.year("o_orderdate").alias("yr"),
            F.weekofyear("o_orderdate").cast("long").alias("wk"),
        )
        .agg(F.sum(_cents(F.col("o_totalprice"))).cast("long").alias("cents"))
    )
    a = wk.where(F.col("yr") == 1995).alias("a")
    b = wk.where(F.col("yr") == 1996).alias("b")
    return (
        a.join(b, F.col("a.wk") == F.col("b.wk"))
        .select(
            F.col("a.wk").alias("wk"),
            (F.col("a.cents") / 100.0).alias("sales_1995"),
            (F.col("b.cents") / 100.0).alias("sales_1996"),
            F.round(F.col("b.cents").cast("double") / F.col("a.cents"), 6).alias("ratio"),
        )
        .orderBy("wk")
    )


@probe(
    "p_ds_q15_disjunctive_gate",
    oracle="""
    SELECT c.c_nationkey,
           CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS sales,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE EXTRACT(YEAR FROM o.o_orderdate) = 1995
      AND (c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
        OR CAST(ROUND(c.c_acctbal * 100) AS BIGINT) > 900000
        OR c.c_nationkey < 3)
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    tags=("tpcds",),
)
def p_ds_q15_disjunctive_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q15 shape: a three-arm OR gate (segment set, balance
    threshold as exact cents, nation band) on the dimension side of a
    fact join — the disjunction stays one broadcast join, not a union of
    three. Ref corpus: tpcds.yaml q15."""
    t = T(spark, sf_dir)
    gate = (
        F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE")
        | (_cents(F.col("c_acctbal")) > 900000)
        | (F.col("c_nationkey") < 3)
    )
    return (
        t.orders.where(F.year("o_orderdate") == 1995)
        .join(F.broadcast(t.customer.where(gate)), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_nationkey")
        .agg(
            (F.sum(_cents(F.col("o_totalprice"))).cast("long") / 100.0).alias("sales"),
            F.count("*").cast("long").alias("n_orders"),
        )
        .orderBy("c_nationkey")
    )


@probe(
    "p_ds_q25_three_channel_sums",
    oracle="""
    WITH ch AS (
      SELECT l_partkey, l_returnflag,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem GROUP BY l_partkey, l_returnflag)
    SELECT a.l_partkey AS partkey,
           a.cents / 100.0 AS flag_a, n.cents / 100.0 AS flag_n, r.cents / 100.0 AS flag_r
    FROM ch a JOIN ch n ON a.l_partkey = n.l_partkey
              JOIN ch r ON a.l_partkey = r.l_partkey
    WHERE a.l_returnflag = 'A' AND n.l_returnflag = 'N' AND r.l_returnflag = 'R'
    ORDER BY partkey
    LIMIT 500
    """,
    tags=("tpcds",),
)
def p_ds_q25_three_channel_sums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q25 shape: the same fact aggregated per channel, keys kept
    only when all three channels are present — one aggregate pivoted,
    NOT three scans joined (the three-way join collapses to conditional
    sums + HAVING all-present over a single shuffle).
    Ref corpus: tpcds.yaml q25."""
    t = T(spark, sf_dir)

    def csum(flag: str):
        return F.sum(
            F.when(F.col("l_returnflag") == flag, _cents(F.col("l_extendedprice")))
            .otherwise(F.lit(0))
        ).cast("long")

    def seen(flag: str):
        return F.max((F.col("l_returnflag") == flag).cast("int"))

    return (
        t.lineitem.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(
            (csum("A") / 100.0).alias("flag_a"),
            (csum("N") / 100.0).alias("flag_n"),
            (csum("R") / 100.0).alias("flag_r"),
            seen("A").alias("_sa"), seen("N").alias("_sn"), seen("R").alias("_sr"),
        )
        .where((F.col("_sa") == 1) & (F.col("_sn") == 1) & (F.col("_sr") == 1))
        .drop("_sa", "_sn", "_sr")
        .orderBy("partkey")
        .limit(500)
    )


@probe(
    "p_ds_q37_attr_and_fact_band",
    oracle="""
    SELECT p.p_partkey, p.p_name
    FROM part p
    JOIN (
      SELECT l_partkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
      FROM lineitem
      WHERE l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-06-30'
      GROUP BY l_partkey
      HAVING SUM(CAST(l_quantity AS BIGINT)) BETWEEN 60 AND 200) f
      ON p.p_partkey = f.l_partkey
    WHERE CAST(ROUND(p.p_retailprice * 100) AS BIGINT) BETWEEN 90000 AND 94999
    ORDER BY p.p_partkey
    """,
    tags=("tpcds",),
)
def p_ds_q37_attr_and_fact_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q37 shape: a dimension attribute band AND a fact-side
    windowed quantity band; the fact aggregate (with HAVING) runs first
    and the banded dimension broadcast-joins it.
    Ref corpus: tpcds.yaml q37."""
    t = T(spark, sf_dir)
    fact = (
        t.lineitem.where(
            F.col("l_shipdate").between(F.lit("1995-01-01"), F.lit("1995-06-30"))
        )
        .groupBy("l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("q"))
        .where(F.col("q").between(60, 200))
    )
    dim = t.part.where(_cents(F.col("p_retailprice")).between(90000, 94999))
    return (
        dim.join(fact, F.col("p_partkey") == F.col("l_partkey"))
        .select("p_partkey", "p_name")
        .orderBy("p_partkey")
    )


@probe(
    "p_ds_q46_cross_nation_trips",
    oracle="""
    WITH trips AS (
      SELECT l.l_orderkey,
             CAST(COUNT(*) AS BIGINT) AS n_cross,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      WHERE s.s_nationkey <> c.c_nationkey
        AND EXTRACT(YEAR FROM o.o_orderdate) = 1995
      GROUP BY l.l_orderkey)
    SELECT t.l_orderkey AS orderkey, c.c_name, t.n_cross, t.cents / 100.0 AS cross_sales
    FROM trips t
    JOIN orders o ON t.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE t.n_cross >= 5
    ORDER BY orderkey
    """,
    tags=("tpcds",),
)
def p_ds_q46_cross_nation_trips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q46 shape (out-of-town trips): per-order aggregate over only
    the lines whose supplier nation differs from the customer nation, the
    qualifying trips joined back to the customer dim for display columns.
    Ref corpus: tpcds.yaml q46."""
    t = T(spark, sf_dir)
    o95 = t.orders.where(F.year("o_orderdate") == 1995).select(
        "o_orderkey", "o_custkey"
    )
    cust = t.customer.select("c_custkey", "c_name", "c_nationkey")
    supp = t.supplier.select("s_suppkey", "s_nationkey")
    trips = (
        t.lineitem.join(o95, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy("l_orderkey")
        .agg(
            F.count("*").cast("long").alias("n_cross"),
            F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"),
        )
        .where(F.col("n_cross") >= 5)
    )
    return (
        trips.join(o95, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "c_name",
            "n_cross",
            (F.col("cents") / 100.0).alias("cross_sales"),
        )
        .orderBy("orderkey")
    )


@probe(
    "p_ds_q69_presence_absence",
    oracle="""
    SELECT c.c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND EXTRACT(YEAR FROM o.o_orderdate) = 1995)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND EXTRACT(YEAR FROM o.o_orderdate) = 1995
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    tags=("tpcds", "subquery"),
)
def p_ds_q69_presence_absence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q69 shape: customers present in one channel slice and absent
    from another — a left-semi and a left-anti against the same fact with
    different predicates, then a dimension rollup.
    Ref corpus: tpcds.yaml q69."""
    t = T(spark, sf_dir)
    o95 = t.orders.where(F.year("o_orderdate") == 1995)
    urgent = o95.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    any95 = o95.select("o_custkey")
    return (
        t.customer
        .join(any95, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").cast("long").alias("n_cust"))
        .orderBy("c_mktsegment")
    )


@probe(
    "p_ds_q71_hour_band_pivot",
    oracle="""
    SELECT event_type,
           CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) < 6  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS night_v,
           CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) BETWEEN 6 AND 11  THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS morning_v,
           CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) BETWEEN 12 AND 17 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS afternoon_v,
           CAST(SUM(CASE WHEN EXTRACT(HOUR FROM ts) >= 18 THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS evening_v
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("tpcds", "events"),
)
def p_ds_q71_hour_band_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q71 shape (revenue by time-of-day): four hour-band
    conditional sums in one scan of the event stream — the breakdown the
    reference writes as a UNION ALL of three time_dim joins collapses to
    one aggregation.  Values compared as per-row exact cents.
    Ref corpus: tpcds.yaml q71."""
    t = T(spark, sf_dir)
    ev = t.events
    hour = F.hour("ts")

    def band(cond):
        return F.sum(
            F.when(cond, F.round(F.col("value") * 100).cast("long")).otherwise(F.lit(0))
        ).cast("long")

    return (
        ev.groupBy("event_type")
        .agg(
            band(hour < 6).alias("night_v"),
            band(hour.between(6, 11)).alias("morning_v"),
            band(hour.between(12, 17)).alias("afternoon_v"),
            band(hour >= 18).alias("evening_v"),
        )
        .orderBy("event_type")
    )


@probe(
    "p_ds_q84_dim_chain",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, r.r_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) BETWEEN 500000 AND 700000
    ORDER BY c.c_custkey
    """,
    tags=("tpcds",),
)
def p_ds_q84_dim_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q84 shape: a pure dimension-chain lookup (customer ->
    nation -> region) with band predicates at both ends — two broadcast
    hops, zero shuffles. Ref corpus: tpcds.yaml q84."""
    t = T(spark, sf_dir)
    return (
        t.customer.where(_cents(F.col("c_acctbal")).between(500000, 700000))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t.region.where(F.col("r_name").isin("ASIA", "EUROPE"))),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "c_name", "n_name", "r_name")
        .orderBy("c_custkey")
    )
