"""WITH RECURSIVE as SQL text (Spark has no recursive CTEs).

Reference: the grammar accepts ``WITH RECURSIVE`` (core/trino-parser/
SqlBase.g4:172) and the analyzer expands it iteratively with a bounded
depth governed by the ``max_recursion_depth`` session property
(StatementAnalyzer.java:1432-1436).

Spark-first lowering: each recursive withQuery ``name (cols) AS
(base UNION [ALL] step)`` runs through ``operators.recursion.recursive_cte``
— the base query seeds a frontier, each iteration re-binds the CTE name to
the previous frontier as a temp view and re-runs the step, and the final
union tree is registered under a collision-proof internal view name
(``__rec_<name>``) that the rest of the statement is rewritten to reference.
The *data* never leaves executors; only the bounded iteration count is
driver-side, exactly like the reference's expansion loop.

Non-recursive members of the same WITH list are lowered to temp views too,
so a recursive step may reference an earlier sibling CTE. Mutual recursion
(two CTEs referencing each other) is rejected like the reference.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.operators.recursion import (
    RecursionLimitExceeded,
    recursive_cte,
)
from trino_private_spark.plans.translate import _shield_strings

_HEAD = re.compile(r"\s*WITH\s+RECURSIVE\b", re.IGNORECASE)

#: Trino's default for the ``max_recursion_depth`` session property
#: (FeaturesConfig.java). Overridable via SET SESSION max_recursion_depth.
DEFAULT_MAX_RECURSION_DEPTH = 10


def is_recursive(text: str) -> bool:
    return bool(_HEAD.match(text))


def _close_paren(s: str, open_idx: int) -> int:
    depth, j = 1, open_idx + 1
    while j < len(s) and depth:
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
        j += 1
    if depth:
        raise ValueError("unbalanced parentheses in WITH RECURSIVE")
    return j - 1


_CTE_HEAD = re.compile(
    r"\s*([A-Za-z_]\w*)\s*(?:\(\s*([^)]*?)\s*\))?\s*AS\s*\(", re.IGNORECASE
)


def _parse(text: str):
    """Split ``WITH RECURSIVE a (cols) AS (...), b AS (...) <main>`` into
    ``([(name, cols|None, body), ...], main)``. Operates on string-shielded
    text so literals can't confuse the paren scan."""
    m = _HEAD.match(text)
    pos = m.end()
    ctes: list[tuple[str, list[str] | None, str]] = []
    while True:
        hm = _CTE_HEAD.match(text, pos)
        if not hm:
            raise ValueError(
                "WITH RECURSIVE: expected `name [(cols)] AS (query)` at: "
                + text[pos : pos + 60]
            )
        cols = (
            [c.strip().strip('"`') for c in hm.group(2).split(",")]
            if hm.group(2)
            else None
        )
        close = _close_paren(text, hm.end() - 1)
        ctes.append((hm.group(1), cols, text[hm.end() : close]))
        pos = close + 1
        cm = re.match(r"\s*,", text[pos:])
        if not cm:
            break
        pos += cm.end()
    return ctes, text[pos:]


def _split_union(body: str, name: str):
    """Split a recursive body at its LAST top-level UNION [ALL] into
    (anchor, step, distinct). The reference parses set operations
    LEFT-associatively into binary Union nodes (AstBuilder
    visitSetOperation), so ``base1 UNION ALL base2 UNION ALL step``
    reaches StatementAnalyzer as anchor=(base1 UNION ALL base2),
    step=step — splitting at the last top-level UNION reproduces exactly
    that shape, and the anchor (which must not reference the recursive
    name, StatementAnalyzer.java:1432) runs as ordinary multi-branch SQL.
    Returns (body, None, False) when the CTE never references itself (a
    plain member of a RECURSIVE with-list, allowed by the spec)."""
    if not re.search(rf"\b{re.escape(name)}\b", body, re.IGNORECASE):
        return body, None, False
    depth, last = 0, None
    for m in re.finditer(r"[()]|\bUNION\b(\s+ALL\b)?", body, re.IGNORECASE):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            last = m
    if last is None:
        raise ValueError(
            f"WITH RECURSIVE {name}: recursive member must be "
            "`base UNION [ALL] step` (StatementAnalyzer.java:1432)"
        )
    base, step = body[: last.start()], body[last.end() :]
    if re.search(rf"\b{re.escape(name)}\b", base, re.IGNORECASE):
        # left-assoc: everything before the last UNION is the anchor —
        # a recursive reference there is the reference's analyzer error
        raise ValueError(
            f"WITH RECURSIVE {name}: the anchor (every UNION branch "
            "before the recursive step) must not reference the "
            "recursive name (StatementAnalyzer.java:1432)"
        )
    return base, step, last.group(1) is None


def lower_recursive(
    spark: SparkSession,
    text: str,
    xlate: Callable[[str], str],
    max_depth: int = DEFAULT_MAX_RECURSION_DEPTH,
) -> DataFrame:
    """Execute a ``WITH RECURSIVE`` statement: lower every CTE in the list
    to a temp view (recursive ones via the iterative loop), rewrite the
    main query to the internal view names, run it, then drop the views
    (the returned DataFrame's plan is already resolved, so the drop is
    safe). ``xlate`` translates each Trino-dialect fragment."""
    shielded, restore = _shield_strings(text)
    ctes, main = _parse(shielded)
    renames: dict[str, str] = {}

    def rebind(sql: str) -> str:
        for old, new in renames.items():
            sql = re.sub(rf"\b{re.escape(old)}\b", new, sql, flags=re.IGNORECASE)
        return sql

    try:
        for name, cols, body in ctes:
            vname = f"__rec_{name.lower()}"
            base_sql, step_sql, distinct = _split_union(rebind(body), name)
            base = spark.sql(xlate(restore(base_sql)))
            if cols:
                base = base.toDF(*cols)
            if step_sql is None:
                df = base
            else:
                if distinct:
                    base = base.distinct()
                out_cols = base.columns
                step_sql = re.sub(
                    rf"\b{re.escape(name)}\b", vname, step_sql, flags=re.IGNORECASE
                )
                step_spark = xlate(restore(step_sql))

                def step(prev: DataFrame, _s=step_spark, _v=vname, _c=out_cols):
                    prev.createOrReplaceTempView(_v)
                    return spark.sql(_s).toDF(*_c)

                try:
                    df = recursive_cte(
                        base, step, max_iterations=max_depth, distinct=distinct
                    )
                except RecursionLimitExceeded:
                    raise RecursionLimitExceeded(
                        f"Recursion depth limit exceeded ({max_depth}). Use "
                        "the 'max_recursion_depth' session property to "
                        "modify the limit."
                    ) from None
            df.createOrReplaceTempView(vname)
            renames[name] = vname
        return spark.sql(xlate(restore(rebind(main))))
    finally:
        # drop every internal view, including a frontier view left behind
        # by a depth-cap abort mid-iteration (dropTempView is a no-throw)
        for name, _, _ in ctes:
            spark.catalog.dropTempView(f"__rec_{name.lower()}")
