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
      WHERE (n1.n_name = 'FRANCE' AND n2.n_name = 'GERMANY')
         OR (n1.n_name = 'GERMANY' AND n2.n_name = 'FRANCE'))
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
    pair = (F.col("supp_nation") == "FRANCE") & (F.col("cust_nation") == "GERMANY") | (
        F.col("supp_nation") == "GERMANY"
    ) & (F.col("cust_nation") == "FRANCE")
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
