"""Relational-core probes: scan/filter/project, joins, set ops, sort/limit.

Covers SURVEY.md §2.1 operators #1-3, #9-13, #16-18, #22-26 and §2.2 set-op
nodes. Reference operators cited per probe; every implementation is the
DataFrame/SQL plan Catalyst turns into the analogous physical operator
(e.g. TableScanOperator -> FileSourceScanExec with pushed filters,
LookupJoinOperator -> Broadcast/SortMergeJoinExec chosen by AQE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


def dround(col, n: int):
    """Fixed-scale rounding applied on both engine sides: makes double
    aggregates hash-stable under differing summation order."""
    return F.round(col.cast("double"), n)


# --- scan / filter / project (ScanFilterAndProjectOperator.java:1) ---------


@probe(
    "p_scan",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * (1 - l_discount), 4) AS rev
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
    ORDER BY l_orderkey, l_linenumber LIMIT 1000
    """,
    tags=("bench", "core"),
)
def p_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fused scan+filter+project; filters reach the parquet scan
    (PushedFilters) and only 5 columns are read (ReadSchema).
    Ref: operator/ScanFilterAndProjectOperator.java:1."""
    li = T(spark, sf_dir).lineitem
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            dround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("rev"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )


# --- distinct + limit (DistinctLimitOperator.java:1) ------------------------


@probe(
    "p_distinctlimit",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("core",),
)
def p_distinctlimit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT over a bounded domain. Ref: operator/DistinctLimitOperator.java:1.
    Plan: partial HashAggregate before the shuffle keeps exchanged rows tiny."""
    li = T(spark, sf_dir).lineitem
    return (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- joins (join/LookupJoinOperator.java:1, HashBuilderOperator.java:61) ----


@probe(
    "p_innerjoin",
    oracle="""
    SELECT c_mktsegment, COUNT(*) AS c, ROUND(SUM(o_totalprice), 2) AS s
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    tags=("bench", "core"),
)
def p_innerjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash equi-join + aggregation. customer is the small build side at any
    SF ratio -> AQE picks broadcast below threshold, shuffled-hash above;
    no sort needed. Ref: operator/join/LookupJoinOperator.java:1."""
    t = T(spark, sf_dir)
    return (
        t.orders.join(t.customer, F.col("o_custkey") == F.col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("c"),
            dround(F.sum("o_totalprice"), 2).alias("s"),
        )
        # c_mktsegment has 5 values at any SF: single-partition local sort
        # == global sort, minus the range-sampling job + exchange
        # (guide §2.4; measured 0.39 -> 0.26 s fresh-plan at sf0.1).
        .coalesce(1)
        .sortWithinPartitions("c_mktsegment")
    )


@probe(
    "p_outerjoin",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS c
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c DESC, c_custkey LIMIT 100
    """,
    tags=("core",),
)
def p_outerjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT join preserving unmatched probe rows.
    Ref: operator/join/LookupOuterOperator.java (unmatched-row emission)."""
    t = T(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c"))
        .orderBy(F.col("c").desc(), "c_custkey")
        .limit(100)
    )


@probe(
    "p_fulljoin",
    oracle="""
    SELECT COUNT(*) AS n FROM
      (SELECT c_custkey FROM customer WHERE c_custkey <= 500) c
      FULL JOIN
      (SELECT o_custkey FROM orders WHERE o_custkey > 300 AND o_custkey <= 800) o
      ON c.c_custkey = o.o_custkey
    """,
    tags=("core",),
)
def p_fulljoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER hash join. Ref: operator/join/LookupJoinOperator.java:1 with
    LookupOuterOperator for both unmatched sides."""
    t = T(spark, sf_dir)
    c = t.customer.where(F.col("c_custkey") <= 500).select("c_custkey")
    o = t.orders.where(
        (F.col("o_custkey") > 300) & (F.col("o_custkey") <= 800)
    ).select("o_custkey")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"], "full")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@probe(
    "p_semijoin",
    oracle="""
    SELECT COUNT(*) AS n FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 0)
    """,
    tags=("core",),
)
def p_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery as LEFT SEMI join; build side is the deduplicated customer
    set. Ref: operator/HashSemiJoinOperator.java:1 + SetBuilderOperator.java:1."""
    t = T(spark, sf_dir)
    keys = t.customer.where(F.col("c_acctbal") > 0).select("c_custkey")
    return (
        t.orders.join(keys, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@probe(
    "p_antijoin",
    oracle="""
    SELECT COUNT(*) AS n FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
    tags=("core",),
)
def p_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN as null-aware anti join. o_custkey is non-nullable in the
    fixtures so LEFT ANTI matches NOT IN semantics; for nullable columns the
    engine's translate layer emits the null-aware form
    (`NOT IN` -> anti join with `key <=> k OR k IS NULL` guard).
    Ref: operator/HashSemiJoinOperator.java:1 (negated probe)."""
    t = T(spark, sf_dir)
    return (
        t.customer.join(
            t.orders.select("o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        ).agg(F.count(F.lit(1)).alias("n"))
    )


@probe(
    "p_crossjoin",
    oracle="""
    SELECT r.r_name, n.n_name FROM region r CROSS JOIN nation n
    WHERE n.n_regionkey = r.r_regionkey ORDER BY r.r_name, n.n_name
    """,
    tags=("core",),
)
def p_crossjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN + equality predicate; Catalyst folds this back into an
    inner hash join (reference: EliminateCrossJoins rule).
    Ref: operator/join/NestedLoopJoinOperator.java:1."""
    t = T(spark, sf_dir)
    return (
        t.region.crossJoin(t.nation)
        .where(F.col("n_regionkey") == F.col("r_regionkey"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@probe(
    "p_thetajoin",
    oracle="SELECT COUNT(*) AS n FROM nation a JOIN nation b ON a.n_regionkey < b.n_regionkey",
    tags=("core",),
)
def p_thetajoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta) join -> BroadcastNestedLoopJoin; both sides tiny dims.
    Ref: operator/join/NestedLoopJoinOperator.java:1."""
    t = T(spark, sf_dir)
    a = t.nation.select(F.col("n_regionkey").alias("ra"))
    b = t.nation.select(F.col("n_regionkey").alias("rb"))
    return a.join(b, a["ra"] < b["rb"]).agg(F.count(F.lit(1)).alias("n"))


# --- sort / top-N / limit / offset ------------------------------------------


@probe(
    "p_sort",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 500
    """,
    tags=("core",),
)
def p_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT -> TakeOrderedAndProject (per-partition top-N heap,
    no full shuffle-sort). Ref: operator/TopNOperator.java:1 (partial+final)."""
    t = T(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(500)
    )


@probe(
    "p_limit",
    oracle="SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 5",
    tags=("core",),
)
def p_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT. Ref: operator/LimitOperator.java:1."""
    t = T(spark, sf_dir)
    return t.nation.select("n_nationkey", "n_name").orderBy("n_nationkey").limit(5)


@probe(
    "p_offset",
    oracle="SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 10 OFFSET 10",
    tags=("core",),
)
def p_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OFFSET ... LIMIT (Trino `OFFSET 10 ROWS FETCH FIRST 10 ROWS ONLY`,
    grammar SqlBase.g4:203-205). Ref: sql/planner/plan/OffsetNode."""
    t = T(spark, sf_dir)
    return t.orders.select("o_orderkey").orderBy("o_orderkey").offset(10).limit(10)


# --- scalar subquery (EnforceSingleRowOperator.java) ------------------------


@probe(
    "p_scalarsubq",
    oracle="""
    SELECT COUNT(*) AS n FROM orders
    WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    """,
    tags=("core",),
)
def p_scalarsubq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in a predicate.
    Ref: operator/EnforceSingleRowOperator.java (cardinality check)."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT COUNT(*) AS n FROM orders
        WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
        """
    )


# --- lateral / correlated subquery (CorrelatedJoinNode) ---------------------


@probe(
    "p_lateral",
    oracle="""
    SELECT n_name, t.c FROM nation,
      LATERAL (SELECT COUNT(*) AS c FROM customer WHERE c_nationkey = n_nationkey) t
    ORDER BY n_name
    """,
    tags=("core",),
)
def p_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery / LATERAL. Catalyst decorrelates it to an
    outer aggregate join (reference: TransformCorrelated* rules,
    sql/planner/plan/CorrelatedJoinNode). COUNT(*) over zero matched rows
    must yield 0, hence the coalesce after the left join."""
    t = T(spark, sf_dir)
    per_nation = t.customer.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        t.nation.join(per_nation, F.col("n_nationkey") == F.col("c_nationkey"), "left")
        .select("n_name", F.coalesce(F.col("cnt"), F.lit(0)).alias("c"))
        .orderBy("n_name")
    )


# --- VALUES (ValuesOperator.java:1) ------------------------------------------


@probe(
    "p_values",
    oracle="SELECT * FROM (VALUES (1,'a'),(2,'b'),(3,'c')) AS t(id, s) ORDER BY id",
    tags=("core",),
)
def p_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES -> LocalRelation (no scan at all).
    Ref: operator/ValuesOperator.java:1."""
    return spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, s string").orderBy(
        "id"
    )


# --- set operations (§2.2 SetOperationNode) ----------------------------------


@probe(
    "p_union",
    oracle="""
    SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier ORDER BY k
    """,
    tags=("core",),
)
def p_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct). Ref: sql/planner/plan/UnionNode + distinct agg."""
    t = T(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("k"))
        .union(t.supplier.select(F.col("s_nationkey").alias("k")))
        .distinct()
        .orderBy("k")
    )


@probe(
    "p_unionall",
    oracle="""
    SELECT COUNT(*) AS n FROM
      (SELECT c_nationkey FROM customer UNION ALL SELECT s_nationkey FROM supplier)
    """,
    tags=("core",),
)
def p_unionall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — pure concatenation, no shuffle."""
    t = T(spark, sf_dir)
    return (
        t.customer.select(F.col("c_nationkey").alias("k"))
        .union(t.supplier.select(F.col("s_nationkey").alias("k")))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@probe(
    "p_intersect",
    oracle="""
    SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders
    ORDER BY k LIMIT 100
    """,
    tags=("core",),
)
def p_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT -> left-semi join on distinct keys (Catalyst
    ReplaceIntersectWithSemiJoin; reference ImplementIntersectDistinctAsUnion)."""
    t = T(spark, sf_dir)
    return (
        t.customer.select(F.col("c_custkey").alias("k"))
        .intersect(t.orders.select(F.col("o_custkey").alias("k")))
        .orderBy("k")
        .limit(100)
    )


@probe(
    "p_except",
    oracle="""
    SELECT c_custkey AS k FROM customer EXCEPT
    SELECT o_custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
    ORDER BY k LIMIT 100
    """,
    tags=("core",),
)
def p_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT -> left-anti join on distinct keys (Catalyst
    ReplaceExceptWithAntiJoin)."""
    t = T(spark, sf_dir)
    return (
        t.customer.select(F.col("c_custkey").alias("k"))
        .subtract(
            t.orders.where(F.year("o_orderdate") == 1995)
            .select(F.col("o_custkey").alias("k"))
        )
        .orderBy("k")
        .limit(100)
    )


# --- UNNEST (operator/unnest/UnnestOperator.java:1) --------------------------


@probe(
    "p_unnest",
    oracle="""
    SELECT doc_id, w FROM documents, UNNEST(string_split(text, ' ')) AS t(w)
    WHERE doc_id <= 20 ORDER BY doc_id, w LIMIT 2000
    """,
    tags=("core",),
)
def p_unnest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST -> explode (Generate node).
    Ref: operator/unnest/UnnestOperator.java:1."""
    t = T(spark, sf_dir)
    return (
        t.documents.where(F.col("doc_id") <= 20)
        .select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("w"))
        .orderBy("doc_id", "w")
        .limit(2000)
    )


@probe(
    "p_unnest_ordinality",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id <= 5)
    SELECT doc_id, t[i] AS w, CAST(i AS INT) AS pos
    FROM toks, UNNEST(range(1, len(t) + 1)) AS r(i)
    ORDER BY doc_id, pos LIMIT 500
    """,
    tags=("core",),
)
def p_unnest_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNNEST WITH ORDINALITY -> posexplode (1-based to match Trino/DuckDB).
    Ref: operator/unnest/UnnestOperator.java:1 (withOrdinality)."""
    t = T(spark, sf_dir)
    return (
        t.documents.where(F.col("doc_id") <= 5)
        .select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos0", "w"))
        .select("doc_id", "w", (F.col("pos0") + 1).cast("int").alias("pos"))
        .orderBy("doc_id", "pos")
        .limit(500)
    )
