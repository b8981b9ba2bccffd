"""TPC-DS signature shapes, fourteenth tranche (q40, q48, q50, q53, q56,
q60, q61, q62, q63, q68).

Highlights: return-corrected before/after pivot (q40), OR-of-AND band sum
(q48), fulfillment-latency bucket matrices (q50 by geography, q62 by
priority), deviation-from-group-average with exact-integer 10% bands
(q53 quarterly, q63 monthly), aggregate-of-union with heterogeneous arms
(q56 by brand, q60 by category), promo-revenue ratio (q61), and the
cross-nation trip variant with component charges (q68).

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
    "p_ds_q40_return_corrected_pivot",
    oracle="""
    SELECT s.s_nationkey,
           CAST(SUM(CASE WHEN l.l_shipdate < DATE '1995-03-01'
                THEN CASE WHEN l.l_returnflag = 'R'
                          THEN -CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                          ELSE CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) END
                ELSE 0 END) AS BIGINT) / 100.0 AS net_before,
           CAST(SUM(CASE WHEN l.l_shipdate >= DATE '1995-03-01'
                THEN CASE WHEN l.l_returnflag = 'R'
                          THEN -CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                          ELSE CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) END
                ELSE 0 END) AS BIGINT) / 100.0 AS net_after
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE l.l_shipdate BETWEEN DATE '1995-01-01' AND DATE '1995-05-01'
    GROUP BY s.s_nationkey ORDER BY s_nationkey
    """,
    tags=("tpcds",),
)
def p_ds_q40_return_corrected_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q40 shape: net (return-corrected) sales split before/after a
    pivot date per geography — the returns LEFT JOIN becomes a sign flip
    inside one conditional aggregate. Ref corpus: tpcds.yaml q40."""
    t = T(spark, sf_dir)
    pivot = F.lit("1995-03-01").cast("date")
    net = F.when(
        F.col("l_returnflag") == "R", -_cents(F.col("l_extendedprice"))
    ).otherwise(_cents(F.col("l_extendedprice")))
    return (
        t.lineitem.where(
            F.col("l_shipdate").between(F.lit("1995-01-01"), F.lit("1995-05-01"))
        )
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_nationkey")
        .agg(
            (F.sum(F.when(F.col("l_shipdate") < pivot, net).otherwise(F.lit(0)))
             .cast("long") / 100.0).alias("net_before"),
            (F.sum(F.when(F.col("l_shipdate") >= pivot, net).otherwise(F.lit(0)))
             .cast("long") / 100.0).alias("net_after"),
        )
        .orderBy("s_nationkey")
    )


@probe(
    "p_ds_q48_or_band_sum",
    oracle="""
    SELECT CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qty
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE (c.c_mktsegment = 'BUILDING'
           AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) BETWEEN 0 AND 300000
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (c.c_mktsegment = 'MACHINERY'
           AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) BETWEEN 300000 AND 600000
           AND l.l_quantity BETWEEN 21 AND 35)
       OR (c.c_mktsegment = 'AUTOMOBILE'
           AND CAST(ROUND(c.c_acctbal * 100) AS BIGINT) BETWEEN 600000 AND 1000000
           AND l.l_quantity BETWEEN 36 AND 50)
    """,
    tags=("tpcds",),
)
def p_ds_q48_or_band_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q48 shape: one scalar sum under an OR of three conjunctive
    (demographic x measure) bands spanning the join — the disjunction stays
    a residual on a single join, not a UNION of three.
    Ref corpus: tpcds.yaml q48."""
    t = T(spark, sf_dir)
    bal = _cents(F.col("c_acctbal"))
    cond = (
        ((F.col("c_mktsegment") == "BUILDING") & bal.between(0, 300000)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("c_mktsegment") == "MACHINERY") & bal.between(300000, 600000)
           & F.col("l_quantity").between(21, 35))
        | ((F.col("c_mktsegment") == "AUTOMOBILE") & bal.between(600000, 1000000)
           & F.col("l_quantity").between(36, 50))
    )
    return (
        t.lineitem
        .join(t.orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.customer), F.col("o_custkey") == F.col("c_custkey"))
        .where(cond)
        .agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("qty"))
    )


def _latency_buckets(t, key_col, key_out):
    """Shared q50/q62 core: order->ship latency bucket matrix per key."""
    lat = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    j = (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("lat", lat)
    )
    return (
        j.groupBy(F.col(key_col).alias(key_out))
        .agg(
            F.count(F.when(F.col("lat") <= 30, 1)).cast("long").alias("d30"),
            F.count(F.when((F.col("lat") > 30) & (F.col("lat") <= 60), 1)).cast("long").alias("d60"),
            F.count(F.when((F.col("lat") > 60) & (F.col("lat") <= 90), 1)).cast("long").alias("d90"),
            F.count(F.when(F.col("lat") > 90, 1)).cast("long").alias("d90plus"),
        )
        .orderBy(key_out)
    )


_LAT_SQL = """
    SELECT k AS {out},
           CAST(COUNT(CASE WHEN lat <= 30 THEN 1 END) AS BIGINT) AS d30,
           CAST(COUNT(CASE WHEN lat > 30 AND lat <= 60 THEN 1 END) AS BIGINT) AS d60,
           CAST(COUNT(CASE WHEN lat > 60 AND lat <= 90 THEN 1 END) AS BIGINT) AS d90,
           CAST(COUNT(CASE WHEN lat > 90 THEN 1 END) AS BIGINT) AS d90plus
    FROM (SELECT {key} AS k, date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) AS lat
          FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey{join})
    GROUP BY k ORDER BY {out}
"""


@probe(
    "p_ds_q50_latency_by_geo",
    oracle=_LAT_SQL.format(
        key="s_nationkey",
        out="nationkey",
        join=" JOIN supplier s ON l.l_suppkey = s.s_suppkey",
    ),
    tags=("tpcds",),
)
def p_ds_q50_latency_by_geo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q50 shape: order-to-ship latency bucket matrix per supplier
    geography. Ref corpus: tpcds.yaml q50."""
    t = T(spark, sf_dir)
    lat = F.datediff(F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date"))
    return (
        t.lineitem.join(t.orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t.supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .withColumn("lat", lat)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(
            F.count(F.when(F.col("lat") <= 30, 1)).cast("long").alias("d30"),
            F.count(F.when((F.col("lat") > 30) & (F.col("lat") <= 60), 1)).cast("long").alias("d60"),
            F.count(F.when((F.col("lat") > 60) & (F.col("lat") <= 90), 1)).cast("long").alias("d90"),
            F.count(F.when(F.col("lat") > 90, 1)).cast("long").alias("d90plus"),
        )
        .orderBy("nationkey")
    )


@probe(
    "p_ds_q62_latency_by_priority",
    oracle=_LAT_SQL.format(key="o.o_orderpriority", out="priority", join=""),
    tags=("tpcds",),
)
def p_ds_q62_latency_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q62 shape: the latency bucket matrix keyed by ship-mode
    analog (order priority). Ref corpus: tpcds.yaml q62."""
    t = T(spark, sf_dir)
    return _latency_buckets(t, "o_orderpriority", "priority")


def _deviation_filter(t, period_col, period_name):
    """Shared q53/q63 core: for each brand, the period with the LARGEST
    absolute deviation from the brand's average — deviation compared as the
    exact integer |cents*n - sum| so rank order is engine-independent."""
    per = (
        t.lineitem.join(
            F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey")
        )
        .groupBy("p_brand", period_col.alias(period_name))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )
    w = Window.partitionBy("p_brand")
    wr = Window.partitionBy("p_brand").orderBy(
        F.abs(F.col("cents") * F.col("bn") - F.col("bsum")).desc(), F.col(period_name)
    )
    return (
        per.withColumn("bsum", F.sum("cents").over(w))
        .withColumn("bn", F.count("*").over(w))
        .withColumn("_rn", F.row_number().over(wr))
        .where(F.col("_rn") == 1)
        .select(
            "p_brand",
            period_name,
            (F.col("cents") / 100.0).alias("sales"),
            F.abs(F.col("cents") * F.col("bn") - F.col("bsum")).alias("dev_num"),
        )
        .orderBy("p_brand", period_name)
    )


_DEV_SQL = """
    WITH per AS (
      SELECT p.p_brand, {period} AS {name},
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2),
    st AS (SELECT p_brand, CAST(SUM(cents) AS BIGINT) AS bsum,
                  CAST(COUNT(*) AS BIGINT) AS bn
           FROM per GROUP BY 1),
    ranked AS (
      SELECT per.p_brand AS p_brand, per.{name}, per.cents,
             abs(per.cents * st.bn - st.bsum) AS dev_num,
             ROW_NUMBER() OVER (PARTITION BY per.p_brand
                                ORDER BY abs(per.cents * st.bn - st.bsum) DESC,
                                         per.{name}) AS rn
      FROM per JOIN st ON per.p_brand = st.p_brand)
    SELECT p_brand, {name}, cents / 100.0 AS sales, CAST(dev_num AS BIGINT) AS dev_num
    FROM ranked WHERE rn = 1
    ORDER BY p_brand, {name}
"""


@probe(
    "p_ds_q53_quarter_deviation",
    oracle=_DEV_SQL.format(
        period="CAST(EXTRACT(YEAR FROM l.l_shipdate) * 10 + EXTRACT(QUARTER FROM l.l_shipdate) AS BIGINT)",
        name="yq",
    ),
    tags=("tpcds", "window"),
)
def p_ds_q53_quarter_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q53 shape: per brand, the quarter deviating MOST from the
    brand average — deviation ranked on the exact integer |cents*n - sum|.
    Ref corpus: tpcds.yaml q53."""
    t = T(spark, sf_dir)
    return _deviation_filter(
        t,
        (F.year("l_shipdate") * 10 + F.quarter("l_shipdate")).cast("long"),
        "yq",
    )


@probe(
    "p_ds_q63_month_deviation",
    oracle=_DEV_SQL.format(
        period="CAST(EXTRACT(YEAR FROM l.l_shipdate) * 100 + EXTRACT(MONTH FROM l.l_shipdate) AS BIGINT)",
        name="ym",
    ),
    tags=("tpcds", "window"),
)
def p_ds_q63_month_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q63 shape: q53's peak-deviation pick at monthly grain.
    Ref corpus: tpcds.yaml q63."""
    t = T(spark, sf_dir)
    return _deviation_filter(
        t,
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).cast("long"),
        "ym",
    )


def _union_arm_sql(pred: str) -> str:
    return f"""
      SELECT p.p_brand,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE {pred}
      GROUP BY 1"""


@probe(
    "p_ds_q56_hetero_union_total",
    oracle=f"""
    WITH arms AS (
      {_union_arm_sql("p.p_name LIKE 'a%'")}
      UNION ALL
      {_union_arm_sql("p.p_name LIKE 'b%'")}
      UNION ALL
      {_union_arm_sql("p.p_name LIKE 'c%'")})
    SELECT p_brand, CAST(SUM(cents) AS BIGINT) / 100.0 AS total_sales
    FROM arms GROUP BY p_brand
    ORDER BY total_sales DESC, p_brand LIMIT 100
    """,
    tags=("tpcds", "setop"),
)
def p_ds_q56_hetero_union_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q56 shape: three differently-filtered aggregates of the same
    fact UNION ALL'd and re-totaled — realized as ONE scan whose arms are
    conditional sums (a brand matching several arms contributes to each,
    exactly like the union). Ref corpus: tpcds.yaml q56."""
    t = T(spark, sf_dir)
    j = t.lineitem.join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
    arm = lambda pfx: F.sum(
        F.when(F.col("p_name").like(f"{pfx}%"), _cents(F.col("l_extendedprice")))
        .otherwise(F.lit(0))
    ).cast("long")
    return (
        j.where(
            F.col("p_name").like("a%") | F.col("p_name").like("b%") | F.col("p_name").like("c%")
        )
        .groupBy("p_brand")
        .agg(((arm("a") + arm("b") + arm("c")) / 100.0).alias("total_sales"))
        .orderBy(F.col("total_sales").desc(), "p_brand")
        .limit(100)
    )


@probe(
    "p_ds_q60_category_union_total",
    oracle="""
    WITH arms AS (
      SELECT split_part(p.p_type, ' ', 1) AS category,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE EXTRACT(MONTH FROM l.l_shipdate) IN (8, 9)
      GROUP BY 1, EXTRACT(MONTH FROM l.l_shipdate))
    SELECT category, CAST(SUM(cents) AS BIGINT) / 100.0 AS total_sales
    FROM arms GROUP BY category ORDER BY category
    """,
    tags=("tpcds", "setop"),
)
def p_ds_q60_category_union_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q60 shape: per-month channel arms re-totaled by category —
    the month arms collapse into one scan grouped by (category, month)
    then re-aggregated. Ref corpus: tpcds.yaml q60."""
    t = T(spark, sf_dir)
    arms = (
        t.lineitem.where(F.month("l_shipdate").isin(8, 9))
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("category", F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)))
        .groupBy("category", F.month("l_shipdate").alias("_mo"))
        .agg(F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("cents"))
    )
    return (
        arms.groupBy("category")
        .agg((F.sum("cents").cast("long") / 100.0).alias("total_sales"))
        .orderBy("category")
    )


@probe(
    "p_ds_q61_promo_ratio",
    oracle="""
    SELECT CAST(SUM(CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) > 5
                         THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS BIGINT) / 100.0 AS promo_rev,
           CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) / 100.0 AS total_rev,
           ROUND(CAST(SUM(CASE WHEN CAST(ROUND(l_discount * 100) AS BIGINT) > 5
                               THEN CAST(ROUND(l_extendedprice * 100) AS BIGINT) ELSE 0 END) AS DOUBLE) * 100
                 / SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)), 6) AS promo_pct
    FROM lineitem WHERE EXTRACT(YEAR FROM l_shipdate) = 1995
    """,
    tags=("tpcds",),
)
def p_ds_q61_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q61 shape: promotional-to-total revenue ratio — two
    conditional sums from one scan, ratio computed on exact cents.
    Ref corpus: tpcds.yaml q61."""
    t = T(spark, sf_dir)
    pc = _cents(F.col("l_extendedprice"))
    promo = F.sum(
        F.when(_cents(F.col("l_discount")) > 5, pc).otherwise(F.lit(0))
    ).cast("long")
    total = F.sum(pc).cast("long")
    return t.lineitem.where(F.year("l_shipdate") == 1995).agg(
        (promo / 100.0).alias("promo_rev"),
        (total / 100.0).alias("total_rev"),
        F.round(promo.cast("double") * 100 / total, 6).alias("promo_pct"),
    )


@probe(
    "p_ds_q68_trip_components",
    oracle="""
    WITH trips AS (
      SELECT l.l_orderkey,
             CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS price_cents,
             CAST(SUM(CAST(ROUND(l.l_tax * 100) AS BIGINT)) AS BIGINT) AS tax_cents,
             CAST(SUM(CAST(ROUND(l.l_discount * 100) AS BIGINT)) AS BIGINT) AS disc_cents
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_nationkey IN (3, 7)
        AND EXTRACT(YEAR FROM o.o_orderdate) = 1995
      GROUP BY 1)
    SELECT t.l_orderkey AS orderkey, c.c_name,
           t.price_cents / 100.0 AS price, t.tax_cents / 100.0 AS tax,
           t.disc_cents / 100.0 AS discount
    FROM trips t
    JOIN orders o ON t.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE t.price_cents > 2000000
    ORDER BY orderkey
    """,
    tags=("tpcds",),
)
def p_ds_q68_trip_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q68 shape: per-trip component charges (price/tax/discount)
    for a two-city gate, qualifying trips joined back for display columns —
    q46's structure with component measures. Ref corpus: tpcds.yaml q68."""
    t = T(spark, sf_dir)
    o94 = t.orders.where(F.year("o_orderdate") == 1995).select("o_orderkey", "o_custkey")
    cust = t.customer.select("c_custkey", "c_name", "c_nationkey")
    trips = (
        t.lineitem.join(o94, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(cust.where(F.col("c_nationkey").isin(3, 7))),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.sum(_cents(F.col("l_extendedprice"))).cast("long").alias("price_cents"),
            F.sum(_cents(F.col("l_tax"))).cast("long").alias("tax_cents"),
            F.sum(_cents(F.col("l_discount"))).cast("long").alias("disc_cents"),
        )
        .where(F.col("price_cents") > 2000000)
    )
    return (
        trips.join(o94, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            F.col("l_orderkey").alias("orderkey"),
            "c_name",
            (F.col("price_cents") / 100.0).alias("price"),
            (F.col("tax_cents") / 100.0).alias("tax"),
            (F.col("disc_cents") / 100.0).alias("discount"),
        )
        .orderBy("orderkey")
    )
