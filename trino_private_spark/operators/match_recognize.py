"""MATCH_RECOGNIZE: row-pattern matching (restricted subset).

Reference: PatternRecognitionNode + the NFA matcher
(operator/window/matcher/Matcher.java, Program.java — SURVEY.md §2.1 #37),
planned at LocalExecutionPlanner.java:1137. Spark has no equivalent
operator, so this is the sanctioned pandas path: partitions are shuffled by
PARTITION BY, ordered in pandas, and a small NFA runs per group inside
``applyInPandas`` (Arrow-batched; one shuffle total — the same dataflow the
reference uses, where pattern matching runs inside the window operator).

Supported subset (covers the common ticker/V-shape/sessionish patterns):
- concatenated symbols with quantifiers ``1`` (exactly one), ``+``, ``*``
  (greedy);
- DEFINE predicates as Python callables over (row, prev_row) — the
  ``PREV()`` navigation most patterns need;
- AFTER MATCH SKIP PAST LAST ROW;
- ONE ROW PER MATCH with measures: match_id, start/end of the ORDER BY key,
  per-symbol row counts.

Scale: state is O(1) per in-flight match and matching is linear per
partition; group size is the memory bound (same as the reference, which
also materializes the partition — PagesIndex).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Symbol:
    name: str
    # predicate(cur: pd.Series, prev: pd.Series | None) -> bool
    predicate: Callable[[pd.Series, pd.Series | None], bool]
    quantifier: str = "1"  # "1" | "+" | "*"


def match_recognize(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: list[Symbol],
    measure_col: str,
) -> DataFrame:
    """Run the pattern per partition; returns one row per match:
    partition keys + match_id + start/end of ``measure_col`` + total rows
    + one ``n_<symbol>`` count per pattern symbol."""
    for s in pattern:
        if s.quantifier not in ("1", "+", "*"):
            raise ValueError(f"unsupported quantifier {s.quantifier!r}")

    sym_cols = ", ".join(f"n_{s.name} bigint" for s in pattern)
    key_schema = ", ".join(f"{c} string" for c in partition_by)
    out_schema = (
        f"{key_schema}, match_id bigint, start_val string, end_val string, "
        f"n_rows bigint, {sym_cols}"
    )

    def run_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_by, kind="mergesort").reset_index(drop=True)
        out_rows = []
        i, match_id = 0, 0
        n = len(pdf)
        while i < n:
            counts, j, ok = _try_match(pdf, i, pattern)
            if ok and j > i:
                row = {c: str(pdf.iloc[0][c]) for c in partition_by}
                row.update(
                    match_id=match_id,
                    start_val=str(pdf.iloc[i][measure_col]),
                    end_val=str(pdf.iloc[j - 1][measure_col]),
                    n_rows=j - i,
                )
                for s in pattern:
                    row[f"n_{s.name}"] = counts[s.name]
                out_rows.append(row)
                match_id += 1
                i = j  # AFTER MATCH SKIP PAST LAST ROW
            else:
                i += 1
        cols = (
            partition_by
            + ["match_id", "start_val", "end_val", "n_rows"]
            + [f"n_{s.name}" for s in pattern]
        )
        return pd.DataFrame(out_rows, columns=cols)

    return df.groupBy(*partition_by).applyInPandas(run_group, schema=out_schema)


def _try_match(pdf: pd.DataFrame, start: int, pattern: list[Symbol]):
    """Greedy sequential match attempt at ``start``; returns
    (counts_per_symbol, end_exclusive, ok)."""
    counts = {s.name: 0 for s in pattern}
    i, n = start, len(pdf)
    for s in pattern:
        taken = 0
        while i < n:
            prev = pdf.iloc[i - 1] if i > 0 else None
            if not s.predicate(pdf.iloc[i], prev):
                break
            taken += 1
            i += 1
            if s.quantifier == "1":
                break
        counts[s.name] = taken
        if s.quantifier in ("1", "+") and taken == 0:
            return counts, i, False
    return counts, i, True
