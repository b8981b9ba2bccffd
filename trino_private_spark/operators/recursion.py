"""Recursive CTE emulation (Spark lacks WITH RECURSIVE).

Reference: WITH RECURSIVE in the grammar (SqlBase.g4:172) with bounded
expansion enforced by the analyzer (StatementAnalyzer.java:1432-1436).

Spark-first shape: iterative DataFrame loop, one union per level. Each
iteration is lazy — the final plan is a union tree that Catalyst executes
in one job; ``checkpoint_every`` truncates lineage for deep recursions
(plan size, not data size, is the scaling limit here). Driver-side loop is
acceptable: iterations are bounded & few; the *data* never leaves executors.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame


class RecursionLimitExceeded(RuntimeError):
    pass


def recursive_cte(
    base: DataFrame,
    step: Callable[[DataFrame], DataFrame],
    max_iterations: int = 100,
    distinct: bool = False,
    checkpoint_every: int = 20,
) -> DataFrame:
    """UNION ALL recursion: result = base ∪ step(base) ∪ step²(base) ∪ ...
    until ``step`` yields no rows. ``distinct=True`` gives UNION semantics
    (cycle-safe). Raises like the reference when the depth cap is hit."""
    acc = base
    frontier = base
    for i in range(max_iterations):
        nxt = step(frontier)
        if distinct:
            nxt = nxt.subtract(acc)
        # materialize each level once: the emptiness probe and the next
        # step() then run on a one-level plan instead of re-deriving the
        # whole recursion chain (plan depth — not data — is the cost here;
        # at depth d the un-checkpointed probe alone is O(d) planning).
        # LAZY checkpoint + count folds the materialization and the
        # emptiness probe into ONE job per level: count() computes every
        # partition (persisting the blocks the checkpoint needs), and the
        # lineage truncation happens at that same job's end — the eager
        # checkpoint + isEmpty form paid two scheduler round-trips per
        # level, which dominates deep small-row recursions.
        nxt = nxt.localCheckpoint(eager=False)
        if nxt.count() == 0:
            return acc
        acc = acc.unionByName(nxt)
        frontier = nxt
        if (i + 1) % checkpoint_every == 0:
            acc = acc.localCheckpoint(eager=True)
    raise RecursionLimitExceeded(f"recursion did not converge in {max_iterations}")
