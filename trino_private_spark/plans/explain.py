"""Plan inspection helpers: EXPLAIN (ANALYZE) + plan-shape assertions.

Reference analogue: ExplainAnalyzeOperator + the plan-shape test matchers
(core/trino-main/src/test/.../sql/planner/assertions/). The assertion
helpers let tests pin the physical properties that matter at 100 TB:
pushed filters reached the scan, the small side actually broadcast, the
whole-stage codegen span covers the hot expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert every fragment appears in the PushedFilters of the plan."""
    plan = explain_str(df)
    pushed = "\n".join(l for l in plan.splitlines() if "PushedFilters" in l)
    for frag in fragments:
        assert frag in pushed, f"filter {frag!r} not pushed; plan:\n{plan}"


def assert_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = explain_str(df)
    for frag in fragments:
        assert frag in plan, f"{frag!r} not in plan:\n{plan}"


def assert_not_in_plan(df: DataFrame, *fragments: str) -> None:
    plan = explain_str(df)
    for frag in fragments:
        assert frag not in plan, f"{frag!r} unexpectedly in plan:\n{plan}"
