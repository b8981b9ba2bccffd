"""Reference-suite probes, tranche 7: named WINDOW clauses
(``AbstractTestEngineOnlyQueries.java`` testWindow — SqlBase.g4 WINDOW
clause, `:242,261-270`), explicit RESPECT/IGNORE NULLS null treatment on
``lag`` (``AbstractTestWindowQueries.java:664``), and HAVING without
GROUP BY (``AbstractTestEngineOnlyQueries.java:4834``). Same contract as
the earlier tranches; expected-VALUES oracles where the suite asserts
literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.plans.translate import translate
from trino_private_spark.queries import probe
from trino_private_spark.queries.reference_suite import (
    _PROLOGUE,
    _register_tpch_views,
)

_SUITE7: list[tuple[str, str, str, str, bool]] = [
    (
        "p_ref_named_window",
        "AbstractTestEngineOnlyQueries.java:4848",
        "SELECT first_value(b) OVER w AS f "
        "FROM (VALUES (1, 'a'), (1, 'b'), (3, 'c')) t(a, b) "
        "WINDOW w AS (PARTITION BY a ORDER BY b DESC)",
        "SELECT * FROM (VALUES ('b'), ('b'), ('c')) t(f)",
        False,
    ),
    (
        "p_ref_named_window_frame",
        "AbstractTestEngineOnlyQueries.java:4854",
        "SELECT first_value(b) OVER w AS f "
        "FROM (VALUES (1, 'a'), (1, 'b'), (3, 'c')) t(a, b) "
        "WINDOW w AS (PARTITION BY a ORDER BY b DESC ROWS CURRENT ROW)",
        "SELECT * FROM (VALUES ('a'), ('b'), ('c')) t(f)",
        False,
    ),
    (
        "p_ref_lag_null_treatment",
        "AbstractTestWindowQueries.java:664",
        "SELECT a, b, c, "
        "lag(c, 1) RESPECT NULLS OVER (PARTITION BY b ORDER BY a) AS r, "
        "lag(c, 1) IGNORE NULLS OVER (PARTITION BY b ORDER BY a) AS ig "
        "FROM ( VALUES "
        "(1, 'A', 'a'), "
        "(2, 'A', NULL), "
        "(3, 'A', 'c'), "
        "(4, 'A', NULL), "
        "(5, 'A', 'e'), "
        "(6, 'A', NULL)"
        ") t(a, b, c)",
        "SELECT * FROM (VALUES "
        "(1, 'A', 'a', null, null), "
        "(2, 'A', null, 'a', 'a'), "
        "(3, 'A', 'c', null, 'a'), "
        "(4, 'A', null, 'c', 'c'), "
        "(5, 'A', 'e', null, 'c'), "
        "(6, 'A', null, 'e', 'e')) t(a, b, c, r, ig)",
        False,
    ),
    (
        "p_ref_topn_nulls_default",
        "AbstractTestQueries.java:404",
        # the suite asserts Trino's ASC default is NULLS LAST (orderkey 3
        # nulls out and must NOT enter the top 10); Spark's default is the
        # opposite, spelled out by the translator
        "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) ASC, custkey ASC LIMIT 10",
        "SELECT orderkey, custkey, orderstatus FROM orders ORDER BY nullif(orderkey, 3) ASC NULLS LAST, custkey ASC LIMIT 10",
        True,
    ),
    (
        "p_ref_union_predicate",
        "AbstractTestQueries.java:449",
        "SELECT * FROM (\n"
        "  SELECT orderkey+1 AS a FROM orders WHERE orderstatus = 'F' UNION ALL \n"
        "  SELECT orderkey FROM orders WHERE orderkey % 2 = 0 UNION ALL \n"
        "  (SELECT orderkey+custkey FROM orders ORDER BY orderkey LIMIT 10)\n"
        ") \n"
        "WHERE a < 20 OR a > 100 \n"
        "ORDER BY a",
        None,
        True,
    ),
    (
        "p_ref_except_all_nested",
        "AbstractTestEngineOnlyQueries.java:310",
        "VALUES 1, 1, 1 EXCEPT ALL (VALUES 1, 1 EXCEPT ALL VALUES 1)",
        "SELECT * FROM (VALUES (1), (1), (1)) t(col1) EXCEPT ALL "
        "(SELECT * FROM (VALUES (1), (1)) t(col1) EXCEPT ALL SELECT * FROM (VALUES (1)) t(col1))",
        False,
    ),
    (
        "p_ref_except_all_assoc",
        "AbstractTestEngineOnlyQueries.java:302",
        # left-associativity: ((3x1 minus 2x1) minus 1x1) is EMPTY — the
        # empty set IS the asserted semantics here
        "VALUES 1, 1, 1 EXCEPT ALL VALUES 1, 1 EXCEPT ALL VALUES 1",
        "SELECT * FROM (VALUES (1), (1), (1)) t(col1) EXCEPT ALL "
        "SELECT * FROM (VALUES (1), (1)) t(col1) EXCEPT ALL SELECT * FROM (VALUES (1)) t(col1)",
        False,
    ),
    (
        "p_ref_intersect_all_nulls",
        "AbstractTestEngineOnlyQueries.java:355",
        "SELECT * FROM (VALUES 1, 2, 3, 3, 4, 4, 4, null, null) INTERSECT ALL "
        "SELECT * FROM (VALUES 3, 3, 3, 4, 4, null, null)",
        "SELECT * FROM (VALUES (1), (2), (3), (3), (4), (4), (4), (null), (null)) t(col1) INTERSECT ALL "
        "SELECT * FROM (VALUES (3), (3), (3), (4), (4), (null), (null)) t(col1)",
        False,
    ),
    (
        "p_ref_complex_distinct",
        "AbstractTestAggregations.java:308",
        # testComplexDistinct: five DISTINCT aggregates over one column in
        # one pass (floating outputs rounded to a fixed scale per the
        # oracle conventions; counts stay raw)
        "SELECT COUNT(DISTINCT custkey) AS c, "
        "CAST(SUM(DISTINCT custkey) AS BIGINT) AS s, "
        "ROUND(SUM(DISTINCT custkey + 1.0E0), 4) AS s1, "
        "ROUND(AVG(DISTINCT custkey), 4) AS a, "
        "ROUND(VARIANCE(DISTINCT custkey), 2) AS v FROM orders",
        None,
        True,
    ),
    (
        "p_ref_limit_with_ties_text",
        "SqlBase.g4:203-205 / ImplementLimitWithTies.java",
        # the literal Trino FETCH ... WITH TIES syntax; the translator
        # applies the reference planner's rank()-filter rewrite (Spark has
        # no WITH TIES), so every peer of the 5th row survives
        "SELECT orderkey, orderpriority FROM orders ORDER BY orderpriority FETCH FIRST 5 ROWS WITH TIES",
        "SELECT orderkey, orderpriority FROM ("
        "  SELECT orderkey, orderpriority, rank() OVER (ORDER BY orderpriority) AS rk FROM orders) "
        "WHERE rk <= 5",
        True,
    ),
    (
        "p_ref_having_no_groupby",
        "AbstractTestEngineOnlyQueries.java:4834",
        "SELECT sum(orderkey) AS s FROM orders HAVING sum(orderkey) > 400000",
        "SELECT CAST(sum(orderkey) AS BIGINT) AS s FROM orders HAVING sum(orderkey) > 400000",
        True,
    ),
]


def _make(sql: str, needs_views: bool):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        if needs_views:
            _register_tpch_views(spark, sf_dir)
        return spark.sql(translate(sql))

    return fn


for _name, _cite, _sql, _osql, _views in _SUITE7:
    _fn = _make(_sql, _views)
    _fn.__doc__ = f"Reference suite SQL ({_cite}), via plans/translate."
    _body = _osql or _sql
    _oracle = f"{_PROLOGUE}\n{_body}" if _views else _body
    probe(_name, oracle=_oracle, tags=("refsuite",))(_fn)
