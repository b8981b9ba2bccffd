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

    cols = (
        partition_by
        + ["match_id", "start_val", "end_val", "n_rows"]
        + [f"n_{s.name}" for s in pattern]
    )

    def run_partition(batches):
        # One shuffle on the keys, then ONE pandas pass per Spark partition:
        # applyInPandas costs ~ms per group and per-row .iloc constructs a
        # pd.Series per access — itertuples rows + a partition-wide sort
        # remove both (guide §4.2). Batches are concatenated first since
        # Arrow may split a group across batches.
        import numpy as np

        pdfs = [b for b in batches if len(b)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        sort_keys = partition_by + [
            c for c in order_by if c not in partition_by
        ]
        pdf = pdf.sort_values(sort_keys, kind="mergesort", ignore_index=True)
        gid = (
            pdf.groupby(partition_by, sort=False, dropna=False)
            .ngroup()
            .to_numpy()
        )
        g_starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        g_ends = np.r_[g_starts[1:], len(pdf)]
        rows_seq = list(pdf.itertuples(index=False))
        out_rows = []
        for gs, ge in zip(g_starts, g_ends):
            gs, ge = int(gs), int(ge)
            keys = {c: str(getattr(rows_seq[gs], c)) for c in partition_by}
            i, match_id = gs, 0
            while i < ge:
                counts, j, ok = _try_match(rows_seq, i, gs, ge, pattern)
                if ok and j > i:
                    row = dict(keys)
                    row.update(
                        match_id=match_id,
                        start_val=str(getattr(rows_seq[i], measure_col)),
                        end_val=str(getattr(rows_seq[j - 1], measure_col)),
                        n_rows=j - i,
                    )
                    for s in pattern:
                        row[f"n_{s.name}"] = counts[s.name]
                    out_rows.append(row)
                    match_id += 1
                    i = j  # AFTER MATCH SKIP PAST LAST ROW
                else:
                    i += 1
        yield pd.DataFrame(out_rows, columns=cols)

    return df.repartition(*[df[c] for c in partition_by]).mapInPandas(
        run_partition, schema=out_schema
    )


def _try_match(rows, start: int, lo: int, n: int, pattern: list[Symbol]):
    """Greedy sequential match attempt at ``start`` within group rows
    [lo, n); returns (counts_per_symbol, end_exclusive, ok)."""
    counts = {s.name: 0 for s in pattern}
    i = start
    for s in pattern:
        taken = 0
        while i < n:
            prev = rows[i - 1] if i > lo else None
            if not s.predicate(rows[i], prev):
                break
            taken += 1
            i += 1
            if s.quantifier == "1":
                break
        counts[s.name] = taken
        if s.quantifier in ("1", "+") and taken == 0:
            return counts, i, False
    return counts, i, True
