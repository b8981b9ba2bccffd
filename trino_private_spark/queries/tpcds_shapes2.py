"""TPC-DS signature shapes, second tranche (q1, q13, q66, q75, q89, q97).

Continues tpcds_shapes.py: the reference benchmarks TPC-DS q01-q99
(testing/trino-benchto-benchmarks/src/main/resources/benchmarks/presto/
tpcds.yaml), and these six shapes cover plan signatures the first tranche
does not:

- above-group-average correlated filter over a two-level aggregate (q1)
- single-scan OR-of-AND band predicates (q13/q48)
- 12-way conditional month pivot in one aggregation (q66)
- UNION ALL sales/returns correction feeding a year-over-year
  self-join decline filter (q75)
- windowed deviation-from-group-average filter (q89/q63)
- FULL OUTER JOIN channel-overlap bucket counts (q97)

Hash-parity discipline (FIXTURES.md): monetary thresholds are evaluated in
row-level integer cents (``CAST(ROUND(x*100) AS BIGINT)`` then bigint
sums), so every ratio/decline/deviation comparison is exact integer math
on both engines — no float-boundary flips. DuckDB integer SUMs are cast
back to BIGINT in the oracle (DuckDB widens to HUGEINT, which pandas
would surface as float).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


def _cents(col) -> F.Column:
    """Row-level exact integer cents of a 2-decimal double column."""
    return F.round(col * 100).cast("long")


@probe(
    "p_ds_q1_above_group_avg",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS total_cents
      FROM orders GROUP BY o_custkey),
    dim AS (
      SELECT c_custkey, c_name, c_nationkey, total_cents
      FROM cust JOIN customer ON c_custkey = o_custkey),
    nat AS (
      SELECT c_nationkey,
             CAST(SUM(total_cents) AS BIGINT) AS nat_cents,
             COUNT(*) AS nat_cnt
      FROM dim GROUP BY c_nationkey)
    SELECT c_custkey, c_name, total_cents / 100.0 AS total
    FROM dim JOIN nat USING (c_nationkey)
    WHERE 10 * total_cents * nat_cnt > 12 * nat_cents
    ORDER BY c_custkey
    """,
    tags=("tpcds",),
)
def p_ds_q1_above_group_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q1 shape: entities whose aggregate exceeds 1.2x the average
    aggregate of their group — a two-level aggregation where the inner
    per-customer totals feed both sides of a decorrelated comparison. The
    25-row per-nation aggregate broadcasts; the threshold is exact integer
    math (10*total*cnt > 12*sum) so no float boundary can flip membership.
    Ref corpus: tpcds.yaml q01."""
    t = T(spark, sf_dir)
    cust = t.orders.groupBy("o_custkey").agg(
        F.sum(_cents(F.col("o_totalprice"))).alias("total_cents")
    )
    dim = cust.join(
        t.customer, F.col("c_custkey") == F.col("o_custkey")
    ).select("c_custkey", "c_name", "c_nationkey", "total_cents")
    nat = dim.groupBy("c_nationkey").agg(
        F.sum("total_cents").alias("nat_cents"), F.count("*").alias("nat_cnt")
    )
    return (
        dim.join(F.broadcast(nat), "c_nationkey")
        .where(10 * F.col("total_cents") * F.col("nat_cnt") > 12 * F.col("nat_cents"))
        .select(
            "c_custkey", "c_name", (F.col("total_cents") / 100.0).alias("total")
        )
        .orderBy("c_custkey")
    )


@probe(
    "p_ds_q13_or_bands",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS cnt,
           CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             / 100.0 AS revenue
    FROM lineitem
    WHERE (l_discount BETWEEN 0.01 AND 0.03 AND l_quantity < 20)
       OR (l_discount BETWEEN 0.04 AND 0.06 AND l_quantity BETWEEN 20 AND 35)
       OR (l_discount BETWEEN 0.07 AND 0.09 AND l_quantity > 35)
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("tpcds",),
)
def p_ds_q13_or_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q13/q48 shape: a disjunction of conjunctive band predicates
    evaluated in ONE scan — the optimizer must keep the OR intact (no
    union-of-scans rewrite) and still push the combined predicate to the
    parquet reader. Ref corpus: tpcds.yaml q13/q48."""
    t = T(spark, sf_dir)
    d, q = F.col("l_discount"), F.col("l_quantity")
    cond = (
        (d.between(0.01, 0.03) & (q < 20))
        | (d.between(0.04, 0.06) & q.between(20, 35))
        | (d.between(0.07, 0.09) & (q > 35))
    )
    return (
        t.lineitem.where(cond)
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.round(q).cast("long")).alias("sum_qty"),
            (F.sum(_cents(F.col("l_extendedprice"))) / 100.0).alias("revenue"),
        )
        .orderBy("l_returnflag")
    )


@probe(
    "p_ds_q66_monthly_pivot",
    oracle="""
    SELECT n_name,
           CAST(SUM(CASE WHEN mon = 1 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m01,
           CAST(SUM(CASE WHEN mon = 2 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m02,
           CAST(SUM(CASE WHEN mon = 3 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m03,
           CAST(SUM(CASE WHEN mon = 4 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m04,
           CAST(SUM(CASE WHEN mon = 5 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m05,
           CAST(SUM(CASE WHEN mon = 6 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m06,
           CAST(SUM(CASE WHEN mon = 7 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m07,
           CAST(SUM(CASE WHEN mon = 8 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m08,
           CAST(SUM(CASE WHEN mon = 9 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m09,
           CAST(SUM(CASE WHEN mon = 10 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m10,
           CAST(SUM(CASE WHEN mon = 11 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m11,
           CAST(SUM(CASE WHEN mon = 12 THEN cents ELSE 0 END) AS BIGINT) / 100.0 AS m12
    FROM (
      SELECT n_name, EXTRACT(MONTH FROM o_orderdate) AS mon,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
      FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ON n_nationkey = s_nationkey)
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("tpcds",),
)
def p_ds_q66_monthly_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q66 shape: a 12-way conditional month pivot — twelve CASE
    sums computed in a single grouped aggregation (one shuffle), never
    twelve scans. Supplier and nation dims broadcast. Ref corpus:
    tpcds.yaml q66."""
    t = T(spark, sf_dir)
    base = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(t.supplier), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t.nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "n_name",
            F.month("o_orderdate").alias("mon"),
            _cents(F.col("l_extendedprice")).alias("cents"),
        )
    )
    aggs = [
        (
            F.sum(F.when(F.col("mon") == m, F.col("cents")).otherwise(F.lit(0)))
            / 100.0
        ).alias(f"m{m:02d}")
        for m in range(1, 13)
    ]
    return base.groupBy("n_name").agg(*aggs).orderBy("n_name")


@probe(
    "p_ds_q75_yoy_decline",
    oracle="""
    WITH net AS (
      SELECT p_brand, yr, CAST(SUM(cents) AS BIGINT) AS net_cents
      FROM (
        SELECT p_brand, EXTRACT(YEAR FROM o_orderdate) AS yr,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
                      JOIN orders ON o_orderkey = l_orderkey
        WHERE l_returnflag <> 'R'
        UNION ALL
        SELECT p_brand, EXTRACT(YEAR FROM o_orderdate) AS yr,
               -CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
                      JOIN orders ON o_orderkey = l_orderkey
        WHERE l_returnflag = 'R')
      GROUP BY p_brand, yr)
    SELECT cur.p_brand, cur.yr,
           cur.net_cents / 100.0 AS cur_net,
           prev.net_cents / 100.0 AS prev_net
    FROM net cur JOIN net prev
      ON cur.p_brand = prev.p_brand AND cur.yr = prev.yr + 1
    WHERE prev.net_cents > 0 AND 10 * cur.net_cents < 9 * prev.net_cents
    ORDER BY cur.p_brand, cur.yr
    """,
    tags=("tpcds",),
)
def p_ds_q75_yoy_decline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q75 shape: returns subtracted from sales via UNION ALL with
    negated amounts (q75's manufacturing trick), aggregated per brand-year,
    then a consecutive-year self-join keeping brands that declined >10%.
    The decline test is exact integer math (10*cur < 9*prev). Ref corpus:
    tpcds.yaml q75."""
    t = T(spark, sf_dir)
    base = (
        t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "p_brand",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            "l_returnflag",
            _cents(F.col("l_extendedprice")).alias("cents"),
        )
    )
    kept = base.where(F.col("l_returnflag") != "R").select(
        "p_brand", "yr", F.col("cents")
    )
    returned = base.where(F.col("l_returnflag") == "R").select(
        "p_brand", "yr", (-F.col("cents")).alias("cents")
    )
    net = (
        kept.unionAll(returned)
        .groupBy("p_brand", "yr")
        .agg(F.sum("cents").alias("net_cents"))
    )
    cur, prev = net.alias("cur"), net.alias("prev")
    return (
        cur.join(
            prev,
            (F.col("cur.p_brand") == F.col("prev.p_brand"))
            & (F.col("cur.yr") == F.col("prev.yr") + 1),
        )
        .where(
            (F.col("prev.net_cents") > 0)
            & (10 * F.col("cur.net_cents") < 9 * F.col("prev.net_cents"))
        )
        .select(
            F.col("cur.p_brand").alias("p_brand"),
            F.col("cur.yr").alias("yr"),
            (F.col("cur.net_cents") / 100.0).alias("cur_net"),
            (F.col("prev.net_cents") / 100.0).alias("prev_net"),
        )
        .orderBy("p_brand", "yr")
    )


@probe(
    "p_ds_q89_window_deviation",
    oracle="""
    SELECT p_brand, yr, mon, sales_cents / 100.0 AS sales,
           brand_cents / 100.0 AS brand_total, nmonths
    FROM (
      SELECT p_brand, yr, mon, sales_cents,
             CAST(SUM(sales_cents) OVER (PARTITION BY p_brand) AS BIGINT)
               AS brand_cents,
             COUNT(*) OVER (PARTITION BY p_brand) AS nmonths
      FROM (
        SELECT p_brand, EXTRACT(YEAR FROM o_orderdate) AS yr,
               EXTRACT(MONTH FROM o_orderdate) AS mon,
               CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS sales_cents
        FROM lineitem JOIN part ON p_partkey = l_partkey
                      JOIN orders ON o_orderkey = l_orderkey
        GROUP BY p_brand, EXTRACT(YEAR FROM o_orderdate),
                 EXTRACT(MONTH FROM o_orderdate)))
    WHERE brand_cents > 0
      AND 200 * ABS(sales_cents * nmonths - brand_cents) > brand_cents * nmonths
    ORDER BY p_brand, yr, mon
    """,
    tags=("tpcds",),
)
def p_ds_q89_window_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q89/q63 shape: monthly sales vs the brand's average month,
    keeping months that deviate >0.5% from that average (the fixtures'
    uniform generator caps relative deviation at ~1.2%, so TPC-DS's 10%
    would select nothing). The deviation test abs(sales - avg)/avg > 0.005
    is algebraically rearranged to pure bigint (200*abs(sales*n - total) >
    total*n), so both engines agree bit-for-bit.
    One grouped agg then one window over the small aggregate. Ref corpus:
    tpcds.yaml q89, q63."""
    t = T(spark, sf_dir)
    monthly = (
        t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            "p_brand",
            F.year("o_orderdate").cast("bigint").alias("yr"),
            F.month("o_orderdate").cast("bigint").alias("mon"),
        )
        .agg(F.sum(_cents(F.col("l_extendedprice"))).alias("sales_cents"))
    )
    w = Window.partitionBy("p_brand")
    return (
        monthly.withColumn("brand_cents", F.sum("sales_cents").over(w))
        .withColumn("nmonths", F.count(F.lit(1)).over(w))
        .where(
            (F.col("brand_cents") > 0)
            & (
                200
                * F.abs(
                    F.col("sales_cents") * F.col("nmonths") - F.col("brand_cents")
                )
                > F.col("brand_cents") * F.col("nmonths")
            )
        )
        .select(
            "p_brand",
            "yr",
            "mon",
            (F.col("sales_cents") / 100.0).alias("sales"),
            (F.col("brand_cents") / 100.0).alias("brand_total"),
            "nmonths",
        )
        .orderBy("p_brand", "yr", "mon")
    )


@probe(
    "p_ds_q97_channel_overlap",
    oracle="""
    WITH early AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) <= 1997),
    late AS (
      SELECT DISTINCT o_custkey FROM orders
      WHERE EXTRACT(YEAR FROM o_orderdate) >= 1998)
    SELECT COUNT(CASE WHEN e.o_custkey IS NOT NULL
                       AND l.o_custkey IS NOT NULL THEN 1 END) AS both_periods,
           COUNT(CASE WHEN l.o_custkey IS NULL THEN 1 END) AS early_only,
           COUNT(CASE WHEN e.o_custkey IS NULL THEN 1 END) AS late_only
    FROM early e FULL OUTER JOIN late l ON e.o_custkey = l.o_custkey
    """,
    tags=("tpcds",),
)
def p_ds_q97_channel_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q97 shape: two DISTINCT keysets (two purchase channels /
    periods) FULL OUTER JOINed to bucket every key as both / left-only /
    right-only, reduced to a single row of counts. Ref corpus:
    tpcds.yaml q97."""
    t = T(spark, sf_dir)
    early = (
        t.orders.where(F.year("o_orderdate") <= 1997)
        .select(F.col("o_custkey").alias("e_key"))
        .distinct()
    )
    late = (
        t.orders.where(F.year("o_orderdate") >= 1998)
        .select(F.col("o_custkey").alias("l_key"))
        .distinct()
    )
    joined = early.join(late, F.col("e_key") == F.col("l_key"), "full_outer")
    return joined.agg(
        F.count(
            F.when(F.col("e_key").isNotNull() & F.col("l_key").isNotNull(), 1)
        ).alias("both_periods"),
        F.count(F.when(F.col("l_key").isNull(), 1)).alias("early_only"),
        F.count(F.when(F.col("e_key").isNull(), 1)).alias("late_only"),
    )
