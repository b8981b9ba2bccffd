"""Reference-suite probes, tranche 6: quantified comparisons
(``AbstractTestEngineOnlyQueries.java:810-829`` testQuantifiedComparison)
run as written. Spark has no ``ALL/ANY/SOME (subquery)``; the translator
applies the reference planner's own min/max/count rewrite
(``TransformQuantifiedComparisonApplyToCorrelatedJoin.java``) with full
three-valued logic (empty set, NULL operand, NULLs in the subquery).
DuckDB executes ALL/ANY natively, so every oracle is the identical SQL —
a genuine cross-engine check of the rewrite, plus one probe pinning the
NULL/empty edge cases the fixture data can't produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.plans.translate import translate
from trino_private_spark.queries import probe
from trino_private_spark.queries.reference_suite import (
    _PROLOGUE,
    _register_tpch_views,
)

_BODY = "SELECT nationkey, name, regionkey FROM nation WHERE regionkey {} (SELECT regionkey FROM region WHERE name IN ({}))"

_SUITE6: list[tuple[str, str, str]] = [
    ("p_ref_quant_eq_any", "AbstractTestEngineOnlyQueries.java:810", _BODY.format("= ANY", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_eq_all", "AbstractTestEngineOnlyQueries.java:811", _BODY.format("= ALL", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_ne_any", "AbstractTestEngineOnlyQueries.java:813", _BODY.format("<> ANY", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_ne_all", "AbstractTestEngineOnlyQueries.java:814", _BODY.format("<> ALL", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_eq_all_single", "AbstractTestEngineOnlyQueries.java:816", _BODY.format("= ALL", "'ASIA'")),
    ("p_ref_quant_ne_all_single", "AbstractTestEngineOnlyQueries.java:817", _BODY.format("<> ALL", "'ASIA'")),
    ("p_ref_quant_lt_some", "AbstractTestEngineOnlyQueries.java:821", _BODY.format("< SOME", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_le_any", "AbstractTestEngineOnlyQueries.java:822", _BODY.format("<= ANY", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_gt_any", "AbstractTestEngineOnlyQueries.java:823", _BODY.format("> ANY", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_ge_some", "AbstractTestEngineOnlyQueries.java:824", _BODY.format(">= SOME", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_lt_all", "AbstractTestEngineOnlyQueries.java:826", _BODY.format("< ALL", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_le_all", "AbstractTestEngineOnlyQueries.java:827", _BODY.format("<= ALL", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_gt_all", "AbstractTestEngineOnlyQueries.java:828", _BODY.format("> ALL", "'ASIA', 'EUROPE'")),
    ("p_ref_quant_ge_all", "AbstractTestEngineOnlyQueries.java:829", _BODY.format(">= ALL", "'ASIA', 'EUROPE'")),
    (
        "p_ref_quant_3vl_edges",
        "AbstractTestEngineOnlyQueries.java:810 (3VL edge matrix)",
        "SELECT 5 > ALL (SELECT * FROM (VALUES (1), (NULL), (2)) t(v)) AS null_blocks_all, "
        "5 > ALL (SELECT * FROM (VALUES (1), (2)) t(v)) AS all_true, "
        "1 > ALL (SELECT * FROM (VALUES (7), (NULL)) t(v)) AS false_beats_null, "
        "5 > ALL (SELECT v FROM (VALUES (1)) t(v) WHERE v > 99) AS empty_is_true, "
        "5 > ANY (SELECT * FROM (VALUES (7), (NULL)) t(v)) AS null_blocks_any, "
        "8 > ANY (SELECT * FROM (VALUES (7), (NULL)) t(v)) AS true_beats_null, "
        "5 > ANY (SELECT v FROM (VALUES (1)) t(v) WHERE v > 99) AS empty_is_false",
    ),
]


def _make(sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_tpch_views(spark, sf_dir)
        return spark.sql(translate(sql))

    return fn


for _name, _cite, _sql in _SUITE6:
    _fn = _make(_sql)
    _fn.__doc__ = f"Reference suite SQL ({_cite}), via plans/translate."
    probe(_name, oracle=f"{_PROLOGUE}\n{_sql}", tags=("refsuite",))(_fn)
