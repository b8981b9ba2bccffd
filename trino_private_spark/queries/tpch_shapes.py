"""TPC-H-shaped analytical probes (the reference's benchmark corpus —
testing/trino-benchto-benchmarks tpch.yaml runs q01-q22; SURVEY §6).

Adapted to the driver fixtures (no partsupp; trimmed columns — FIXTURES.md):
each probe keeps the *plan shape* of its TPC-H counterpart (multi-way joins
with dim filters, grouped aggregation, top-k) since the plan shape, not the
constants, is what exercises the optimizer. Q1/Q6 shapes live in
aggregates/relational; here: Q3/Q5/Q7/Q10/Q18-alikes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.relational import dround


@probe(
    "p_q3_shipping_priority",
    oracle="""
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS odate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15'
      AND l_shipdate > TIMESTAMP '1995-03-15'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    tags=("tpch",),
)
def p_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, selective dim filter, grouped revenue,
    top-10. customer filter prunes before the join (predicate pushdown);
    AQE broadcasts the filtered customer side."""
    t = T(spark, sf_dir)
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (
        t.customer.where(F.col("c_mktsegment") == "BUILDING")
        .join(t.orders.where(F.col("o_orderdate") < cutoff),
              F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem.where(F.col("l_shipdate") > cutoff),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd").alias(
                "odate"
            ),
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@probe(
    "p_q5_local_volume",
    oracle="""
    SELECT n_name, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    tags=("tpch",),
)
def p_q5_local_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join with the region->nation dim chain
    broadcast; the join-order freedom is what CBO/AQE exercise here."""
    t = T(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(t.lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(t.nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t.region), F.col("n_regionkey") == F.col("r_regionkey"))
        .where(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@probe(
    "p_q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           any_value(c_acctbal) AS acctbal, any_value(n_name) AS nation
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    tags=("tpch",),
)
def p_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top-20."""
    t = T(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(
            t.lineitem.where(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.any_value("c_acctbal").alias("acctbal"),
            F.any_value("n_name").alias("nation"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@probe(
    "p_q18_large_volume",
    oracle="""
    SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 2) AS total, qty
    FROM orders JOIN (
      SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS qty
      FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
    ) big ON o_orderkey = big.l_orderkey
    ORDER BY total DESC, o_orderkey LIMIT 100
    """,
    tags=("tpch",),
)
def p_q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate as join input (the
    aggregate runs before the join — semi-join-like reduction)."""
    t = T(spark, sf_dir)
    big = (
        t.lineitem.groupBy("l_orderkey")
        .agg(dround(F.sum("l_quantity"), 2).alias("qty"))
        .where(F.col("qty") > 150)
    )
    return (
        t.orders.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            dround(F.col("o_totalprice"), 2).alias("total"),
            "qty",
        )
        .orderBy(F.col("total").desc(), "o_orderkey")
        .limit(100)
    )


@probe(
    "p_q7_nation_volume",
    oracle="""
    SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             EXTRACT(YEAR FROM l_shipdate) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
        JOIN lineitem ON s_suppkey = l_suppkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    tags=("tpch",),
)
def p_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: two aliases of the same dim (nation) with a
    disjunctive cross-nation filter."""
    t = T(spark, sf_dir)
    n1 = t.nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t.nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        t.supplier.join(t.lineitem, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@probe(
    "p_intersect_all",
    oracle="""
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier
    ) ORDER BY k
    """,
    tags=("core",),
)
def p_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics — reference ImplementIntersectAll.java
    via union+row_number; Spark: intersectAll)."""
    t = T(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("k"))
        .intersectAll(t.supplier.select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
    )


@probe(
    "p_except_all",
    oracle="""
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier
    ) ORDER BY k LIMIT 500
    """,
    tags=("core",),
)
def p_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics — reference ImplementExceptAll.java)."""
    t = T(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("k"))
        .exceptAll(t.supplier.select(F.col("s_nationkey").alias("k")))
        .orderBy("k")
        .limit(500)
    )


@probe(
    "p_limit_with_ties",
    oracle="""
    SELECT o_totalprice FROM (
      SELECT o_totalprice,
             RANK() OVER (ORDER BY ROUND(o_totalprice / 10000, 0) DESC) AS rnk
      FROM orders) WHERE rnk <= 5
    ORDER BY o_totalprice
    """,
    tags=("core", "custom"),
)
def p_limit_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT ... WITH TIES (grammar SqlBase.g4 FETCH FIRST ... WITH TIES;
    reference ImplementLimitWithTies rule rewrites to rank()<=n — we apply
    the same rewrite since Spark lacks the syntax)."""
    from pyspark.sql import Window

    t = T(spark, sf_dir)
    bucket = F.round(F.col("o_totalprice") / 10000, 0)
    w = Window.orderBy(bucket.desc())
    return (
        t.orders.withColumn("rnk", F.rank().over(w))
        .where(F.col("rnk") <= 5)
        .select("o_totalprice")
        .orderBy(F.col("o_totalprice"))
    )


@probe(
    "p_q4_order_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("tpch",),
)
def p_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (tpch.yaml q04): date-windowed orders, correlated
    EXISTS against lineitem (fixtures lack commitdate/receiptdate — the
    'late line' predicate is l_shipdate > o_orderdate + 60 days, same
    correlated-semi-join plan), priority counts. Spark plans the EXISTS as a
    left-semi hash join on l_orderkey; at 100 TB both sides hash-shuffle on
    the key with the date filter pushed to the orders scan."""
    t = T(spark, sf_dir)
    o = t.orders.where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    l = t.lineitem.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@probe(
    "p_q12_shipmode_priority",
    oracle="""
    SELECT l_linestatus,
           SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
           SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                    THEN 1 ELSE 0 END)::BIGINT AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1995-01-01'
      AND l_shipdate < TIMESTAMP '1996-01-01'
    GROUP BY l_linestatus
    ORDER BY l_linestatus
    """,
    tags=("tpch",),
)
def p_q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact join + CASE-conditional counts grouped by
    a lineitem attribute (l_linestatus stands in for the absent l_shipmode).
    The CASE sums compile to partial aggregates — shuffle carries 2 longs
    per group, not rows."""
    t = T(spark, sf_dir)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t.orders.join(
            t.lineitem.where(
                (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
                & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@probe(
    "p_q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1995-09-01'
      AND l_shipdate < TIMESTAMP '1995-10-01'
    """,
    tags=("tpch",),
)
def p_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional revenue share. part is the dim side —
    broadcast; single global aggregate reduces to one row, so the ratio is
    computed post-agg (one partial-agg pass over the joined scan)."""
    t = T(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    return (
        t.lineitem.where(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
        )
        .join(F.broadcast(t.part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 2).alias("promo_revenue")
        )
    )


@probe(
    "p_q19_disjunctive",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#19' AND p_size BETWEEN 1 AND 20
           AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 25
           AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    tags=("tpch",),
)
def p_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctive ranges across both join sides.
    Catalyst extracts the common p_partkey equi-key so this stays a hash
    join (broadcast: part is the dim) with the OR evaluated as a post-join
    filter; per-side implied filters (p_brand IN ..., l_quantity <= 30)
    still push to the scans."""
    t = T(spark, sf_dir)
    j = t.lineitem.join(F.broadcast(t.part), F.col("p_partkey") == F.col("l_partkey"))
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#19") & F.col("p_size").between(1, 20)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#17") & F.col("p_size").between(1, 25)
           & q.between(20, 30))
    )
    return j.where(cond).agg(
        dround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
        .alias("revenue")
    )


@probe(
    "p_q22_global_sales",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS numcust,
           ROUND(SUM(c_acctbal), 2) AS totacctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                        AND o_orderpriority = '1-URGENT')
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("tpch",),
)
def p_q22_global_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti-join +
    grouped agg (c_nationkey stands in for the absent phone country code;
    the NOT EXISTS arm is the urgent-order slice so the anti join is
    non-vacuous on the fixture, where every customer has some order).
    The scalar avg broadcasts as a literal after its own 1-row agg; the
    anti join hash-shuffles on custkey; at 100 TB the orders side is
    key+null-free so bloom-filter reduction applies."""
    t = T(spark, sf_dir)
    c = t.customer
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
        .select("a")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("a"))
        .join(
            t.orders.where(F.col("o_orderpriority") == "1-URGENT"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            dround(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
