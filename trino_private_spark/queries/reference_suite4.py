"""Reference-suite probes, tranche 4: the UNNEST surface and TRY forms of
``AbstractTestEngineOnlyQueries.java`` (testing/trino-tests), run as the
reference writes them — bare ``FROM UNNEST(...)`` relations, multi-array
null-padded unnest, ``UNNEST(map)``, ``WITH ORDINALITY`` (projected,
string-typed, multi-array), nested 1-based subscripts on unnested arrays,
``UNNEST(transform(sequence ...))`` with a lambda, correlated
``CROSS JOIN UNNEST``, ``TRY(x / y)`` dedup and ``TRY(CAST ...)``.

Oracles: where the suite asserts against literal expected VALUES (its H2
side), the DuckDB oracle states those same VALUES; the correlated-unnest
probe uses the suite's own relational rewrite over the rename prologue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.plans.translate import translate
from trino_private_spark.queries import probe
from trino_private_spark.queries.reference_suite import (
    _PROLOGUE,
    _register_tpch_views,
)

# (probe name, citation, suite SQL, duckdb oracle, needs fixture views)
_SUITE4: list[tuple[str, str, str, str, bool]] = [
    (
        "p_ref_unnest_bare",
        "AbstractTestEngineOnlyQueries.java:3334",
        "SELECT a FROM UNNEST(ARRAY[1, 2, 3]) t(a)",
        "SELECT * FROM (VALUES (1), (2), (3)) t(a)",
        False,
    ),
    (
        "p_ref_unnest_two_arrays",
        "AbstractTestEngineOnlyQueries.java:3335",
        "SELECT a, b FROM UNNEST(ARRAY[1, 2], ARRAY[3, 4]) t(a, b)",
        "SELECT * FROM (VALUES (1, 3), (2, 4)) t(a, b)",
        False,
    ),
    (
        "p_ref_unnest_nullpad",
        "AbstractTestEngineOnlyQueries.java:3336",
        "SELECT a, b FROM UNNEST(ARRAY[1, 2, 3], ARRAY[4, 5]) t(a, b)",
        "SELECT * FROM (VALUES (1, 4), (2, 5), (3, NULL)) t(a, b)",
        False,
    ),
    (
        "p_ref_unnest_nested_subscript",
        "AbstractTestEngineOnlyQueries.java:3330",
        "SELECT x[1] AS v FROM UNNEST(ARRAY[ARRAY[1, 2, 3]]) t(x)",
        "SELECT 1 AS v",
        False,
    ),
    (
        "p_ref_unnest_double_subscript",
        "AbstractTestEngineOnlyQueries.java:3331",
        "SELECT x[1][2] AS v FROM UNNEST(ARRAY[ARRAY[ARRAY[1, 2, 3]]]) t(x)",
        "SELECT 2 AS v",
        False,
    ),
    (
        "p_ref_unnest_map",
        "AbstractTestEngineOnlyQueries.java:3360",
        "SELECT a, b FROM UNNEST(MAP(ARRAY[1,2], ARRAY['cat', 'dog'])) t(a, b)",
        "SELECT * FROM (VALUES (1, 'cat'), (2, 'dog')) t(a, b)",
        False,
    ),
    (
        "p_ref_unnest_ordinality_proj",
        "AbstractTestEngineOnlyQueries.java:3365",
        "SELECT b FROM UNNEST(ARRAY[10, 20, 30]) WITH ORDINALITY t(a, b)",
        "SELECT CAST(b AS BIGINT) AS b FROM (VALUES (1), (2), (3)) t(b)",
        False,
    ),
    (
        "p_ref_unnest_ordinality_strings",
        "AbstractTestEngineOnlyQueries.java:3367",
        "SELECT a, b FROM UNNEST(ARRAY['kittens', 'puppies']) WITH ORDINALITY t(a, b)",
        "SELECT a, CAST(b AS BIGINT) AS b FROM (VALUES ('kittens', 1), ('puppies', 2)) t(a, b)",
        False,
    ),
    (
        "p_ref_unnest_multi_ordinality",
        "AbstractTestEngineOnlyQueries.java:3366",
        "SELECT a, b, c FROM UNNEST(ARRAY[10, 20, 30], ARRAY[4, 5]) WITH ORDINALITY t(a, b, c)",
        "SELECT a, b, CAST(c AS BIGINT) AS c FROM (VALUES (10, 4, 1), (20, 5, 2), (30, NULL, 3)) t(a, b, c)",
        False,
    ),
    (
        "p_ref_unnest_transform",
        "AbstractTestEngineOnlyQueries.java:3015",
        "SELECT * FROM UNNEST(transform(sequence(1, 5), x -> x * x)) t(col)",
        "SELECT * FROM (VALUES (1), (4), (9), (16), (25)) t(col)",
        False,
    ),
    (
        "p_ref_try_dedup",
        "AbstractTestEngineOnlyQueries.java:3025",
        "SELECT try(10 / a) + try(10 / a) AS s FROM (VALUES 5) t(a)",
        "SELECT CAST(4 AS DOUBLE) AS s",
        False,
    ),
    (
        "p_ref_try_cast",
        "AbstractTestEngineOnlyQueries.java:917",
        "SELECT TRY(CAST('a' AS BIGINT)) AS v",
        "SELECT TRY_CAST('a' AS BIGINT) AS v",
        False,
    ),
    (
        "p_ref_unnest_correlated",
        "AbstractTestEngineOnlyQueries.java:3348",
        "SELECT a.custkey, t.e "
        "FROM (SELECT custkey, ARRAY[1, 2, 3] AS my_array FROM orders ORDER BY orderkey LIMIT 1) a "
        "CROSS JOIN UNNEST(my_array) t(e)",
        "SELECT custkey, e FROM "
        "(SELECT custkey FROM orders ORDER BY orderkey LIMIT 1) "
        "CROSS JOIN (VALUES (1), (2), (3)) t(e)",
        True,
    ),
]


def _make(sql: str, needs_views: bool):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        if needs_views:
            _register_tpch_views(spark, sf_dir)
        return spark.sql(translate(sql))

    return fn


for _name, _cite, _sql, _osql, _views in _SUITE4:
    _fn = _make(_sql, _views)
    _fn.__doc__ = f"Reference suite SQL ({_cite}), via plans/translate."
    _oracle = f"{_PROLOGUE}\n{_osql}" if _views else _osql
    probe(_name, oracle=_oracle, tags=("refsuite",))(_fn)
