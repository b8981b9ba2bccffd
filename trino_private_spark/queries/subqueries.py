"""Subquery & CTE probes (SURVEY.md §2.2 ApplyNode/CorrelatedJoinNode, §2.7).

EXISTS / NOT EXISTS / quantified comparisons / correlated scalar subqueries /
WITH chains / recursive-CTE (via the engine's iterative helper — Spark lacks
WITH RECURSIVE, reference grammar SqlBase.g4:172)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    t = T(spark, sf_dir)
    for n in names:
        getattr(t, n).createOrReplaceTempView(n)


@probe(
    "p_exists",
    oracle="""
    SELECT COUNT(*) AS n FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    """,
    tags=("core",),
)
def p_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS -> left-semi join (Catalyst RewritePredicateSubquery;
    reference TransformExistsApplyToCorrelatedJoin.java)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT COUNT(*) AS n FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        """
    )


@probe(
    "p_notexists",
    oracle="""
    SELECT COUNT(*) AS n FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("core",),
)
def p_notexists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT COUNT(*) AS n FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        """
    )


@probe(
    "p_quantified",
    oracle="""
    SELECT COUNT(*) AS n FROM orders
    WHERE o_totalprice > ALL (SELECT o_totalprice FROM orders WHERE o_custkey = 371)
    """,
    tags=("core",),
)
def p_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified comparison (> ALL). Spark SQL has no ALL/ANY syntax —
    the engine applies the reference's own rewrite
    (TransformQuantifiedComparisonApplyToCorrelatedJoin.java): x > ALL(S)
    becomes x > max(S), with the empty-set -> TRUE case guarded by the
    subquery count. NULLs in S (none in fixtures) would need the null-aware
    variant like NOT IN."""
    t = T(spark, sf_dir)
    sub = t.orders.where(F.col("o_custkey") == 371).agg(
        F.max("o_totalprice").alias("mx"), F.count(F.lit(1)).alias("cnt")
    )
    return (
        t.orders.crossJoin(F.broadcast(sub))
        .where((F.col("cnt") == 0) | (F.col("o_totalprice") > F.col("mx")))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@probe(
    "p_correlated_scalar",
    oracle="""
    SELECT c_custkey,
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c ORDER BY c_custkey LIMIT 200
    """,
    tags=("core",),
)
def p_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery in SELECT list (ApplyNode; decorrelated to
    an outer-join aggregate by Catalyst's RewriteCorrelatedScalarSubquery)."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
        FROM customer c ORDER BY c_custkey LIMIT 200
        """
    )


@probe(
    "p_cte",
    oracle="""
    WITH big AS (SELECT * FROM orders WHERE o_totalprice > 200000),
         by_cust AS (SELECT o_custkey, COUNT(*) AS n FROM big GROUP BY o_custkey)
    SELECT n, COUNT(*) AS n_custs FROM by_cust GROUP BY n ORDER BY n
    """,
    tags=("core",),
)
def p_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH chains (non-recursive CTEs)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        WITH big AS (SELECT * FROM orders WHERE o_totalprice > 200000),
             by_cust AS (SELECT o_custkey, COUNT(*) AS n FROM big GROUP BY o_custkey)
        SELECT n, COUNT(*) AS n_custs FROM by_cust GROUP BY n ORDER BY n
        """
    )


@probe(
    "p_recursive_cte",
    oracle="""
    WITH RECURSIVE r(n, f) AS (
      SELECT 1, CAST(1 AS BIGINT)
      UNION ALL
      SELECT n + 1, f * (n + 1) FROM r WHERE n < 15)
    SELECT n, f FROM r ORDER BY n
    """,
    tags=("core", "custom"),
)
def p_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE — Spark has no native support (SURVEY §2.7): the
    engine's recursive_cte helper iterates DataFrame unions with a bounded
    depth, exactly Trino's bounded expansion (StatementAnalyzer.java:1432)."""
    from trino_private_spark.operators.recursion import recursive_cte

    base = spark.createDataFrame([(1, 1)], "n int, f bigint")

    def step(prev: DataFrame) -> DataFrame:
        return prev.where(F.col("n") < 15).select(
            (F.col("n") + 1).alias("n"), (F.col("f") * (F.col("n") + 1)).alias("f")
        )

    return recursive_cte(base, step, max_iterations=20).orderBy("n")


_REC_SQLTEXT = """
WITH RECURSIVE seq (n) AS (
    SELECT 0
    UNION ALL
    SELECT n + 1 FROM seq WHERE n < 4
)
SELECT s.n AS rkey, count(*) AS n_nations, min(n_name) AS first_nation
FROM seq s JOIN nation ON n_regionkey = s.n
GROUP BY s.n
ORDER BY s.n
"""


@probe(
    "p_recursive_sqltext",
    oracle=_REC_SQLTEXT,
    tags=("core",),
)
def p_recursive_sqltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE as actual SQL text through Engine.sql() — the grammar
    form (SqlBase.g4:172) with bounded expansion
    (StatementAnalyzer.java:1432-1436), lowered by plans/recursive_sql.py
    onto the iterative recursive_cte loop. The oracle is the same statement:
    DuckDB supports WITH RECURSIVE natively."""
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    return eng.sql(_REC_SQLTEXT)


_REC_UNION_SQLTEXT = """
WITH RECURSIVE walk (k) AS (
    SELECT CAST(0 AS BIGINT) AS k
    UNION
    SELECT CAST((k * 2 + 1) % 7 AS BIGINT) FROM walk
)
SELECT w.k, count(*) AS n_nations
FROM walk w JOIN nation ON n_nationkey % 7 = w.k
GROUP BY w.k
ORDER BY w.k
"""


@probe(
    "p_recursive_union_sqltext",
    oracle=_REC_UNION_SQLTEXT,
    tags=("core",),
)
def p_recursive_union_sqltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE with UNION (distinct) semantics as SQL text: the
    step function k -> (2k+1) mod 7 CYCLES (0,1,3 -> 0...), so only the
    fixpoint dedup against the accumulated set terminates the recursion —
    the standard's cycle-safe semantics (StatementAnalyzer's recursion
    over the deduplicating union). DuckDB runs the identical statement
    natively as the oracle."""
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    return eng.sql(_REC_UNION_SQLTEXT)


_REC_NESTED_SQLTEXT = """
SELECT n_regionkey AS rkey, count(*) AS n_nations,
       (SELECT max(n) FROM (WITH RECURSIVE m (n) AS (
            SELECT 1 UNION ALL SELECT n + 1 FROM m WHERE n < 3)
        SELECT n FROM m) q2) AS depth_max
FROM nation
WHERE n_regionkey IN (SELECT n FROM (WITH RECURSIVE seq (n) AS (
    SELECT 0
    UNION ALL
    SELECT n + 1 FROM seq WHERE n < 2
) SELECT n FROM seq) q)
GROUP BY n_regionkey
ORDER BY rkey
"""


@probe(
    "p_recursive_nested",
    oracle=_REC_NESTED_SQLTEXT,
    tags=("core",),
)
def p_recursive_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE in NESTED positions — a derived-table subquery
    inside IN and a scalar subquery in the select list (the grammar
    allows the with-clause at any query-expression head, SqlBase.g4:172
    queryNoWith; previously only statement-head recursion lowered). Each
    parenthesized recursive subtree lowers to the iterative loop and
    splices back as a view reference (api._lower_nested_recursive).
    DuckDB runs the identical statement natively as the oracle."""
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach(sf_dir)
    return eng.sql(_REC_NESTED_SQLTEXT)


@probe(
    "p_in_subquery_values",
    oracle="""
    SELECT COUNT(*) AS n FROM lineitem
    WHERE l_returnflag IN ('A', 'R') AND l_linestatus NOT IN ('O')
    """,
    tags=("core",),
)
def p_in_subquery_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN over literal lists (no subquery — complements p_semijoin)."""
    li = T(spark, sf_dir).lineitem
    return li.where(
        F.col("l_returnflag").isin("A", "R") & ~F.col("l_linestatus").isin("O")
    ).agg(F.count(F.lit(1)).alias("n"))
