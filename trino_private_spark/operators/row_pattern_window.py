"""Row pattern recognition in WINDOW structures.

Reference: docs/src/main/sphinx/sql/pattern-recognition-in-window.rst;
SqlBase.g4 windowSpecification / windowFrame with measures+pattern;
io.trino.operator.window.pattern.* (the reference's window-RPR runtime).

Semantics implemented (per the doc):
- frame must be ROWS BETWEEN CURRENT ROW AND {CURRENT ROW | n FOLLOWING |
  UNBOUNDED FOLLOWING};
- every input row produces EXACTLY ONE output row (ONE ROW PER MATCH +
  WITH UNMATCHED ROWS combination);
- INITIAL (default): the match must start at the current row; SEEK: the
  engine searches subsequent frame rows for the match start;
- rows consumed by a previous match's AFTER MATCH SKIP are 'skipped':
  their measures are null and window aggregates see an empty frame;
- measures use FINAL semantics (RUNNING/FINAL keywords accepted and
  ignored — the doc: "every computation is performed from the position
  of the final row of the match");
- MATCH_NUMBER() is not allowed (doc), anchors ^/$ are not allowed.

Known deviation (documented): DEFINE classification is precomputed over
the whole partition, so PREV() at the frame head reads the true prior
partition row where the reference sees null (out-of-frame). This keeps
classification O(n) per partition instead of O(n * frame).

Scale posture: one shuffle on PARTITION BY, pandas-side grouping via
mapInPandas (the row_pattern.py pattern — applyInPandas costs ~ms per
group); per-row anchored NFA matching is bounded by the frame extent.
An omitted PARTITION BY routes everything through one task — inherently
serial in the reference too.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from trino_private_spark.operators.row_pattern import _GID_COL, PatternMatcher
from trino_private_spark.operators.row_pattern_sql import (
    _compile_define,
    _compile_measure,
)

__all__ = ["parse_window_pattern_spec", "window_pattern_measures"]

_SPEC_RE = re.compile(
    r"""^\s*
    (?:PARTITION\s+BY\s+(?P<part>.+?)\s+)?
    (?:ORDER\s+BY\s+(?P<order>.+?)\s+)?
    (?:MEASURES\s+(?P<measures>.+?)\s+)?
    ROWS\s+BETWEEN\s+CURRENT\s+ROW\s+AND\s+
    (?P<fend>UNBOUNDED\s+FOLLOWING|\d+\s+FOLLOWING|CURRENT\s+ROW)\s*
    (?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW|
        TO\s+(?:FIRST|LAST)\s+\w+)\s+)?
    (?:(?P<mode>INITIAL|SEEK)\s+)?
    PATTERN\s*\(\s*(?P<pattern>[^)]*?(?:\([^)]*\)[^)]*?)*)\s*\)\s*
    (?:SUBSET\s+(?P<subset>.+?)\s+)?
    DEFINE\s+(?P<define>.+?)\s*$""",
    re.X | re.I | re.S,
)


def parse_window_pattern_spec(spec: str) -> dict:
    """Parse the inside of a window specification carrying row pattern
    clauses into its components (raw strings)."""
    m = _SPEC_RE.match(spec.strip())
    if not m:
        raise ValueError(
            "cannot parse row-pattern window specification"
        )
    if re.search(r"\bMATCH_NUMBER\s*\(", spec, re.I):
        raise ValueError(
            "MATCH_NUMBER is not allowed in window pattern recognition"
        )
    if re.search(r"PATTERN\s*\([^)]*[\^$]", spec, re.I):
        raise ValueError(
            "anchor patterns ^/$ are not allowed in window specifications"
        )
    fend = re.sub(r"\s+", " ", m.group("fend").upper())
    if fend == "CURRENT ROW":
        frame_rows: int | None = 1
    elif fend == "UNBOUNDED FOLLOWING":
        frame_rows = None
    else:
        frame_rows = int(fend.split()[0]) + 1
    parts: dict = {
        "partition_by": (
            [c.strip() for c in m.group("part").split(",")]
            if m.group("part")
            else []
        ),
        "order_by": (
            [c.strip() for c in m.group("order").split(",")]
            if m.group("order")
            else []
        ),
        "frame_rows": frame_rows,
        "seek": (m.group("mode") or "INITIAL").upper() == "SEEK",
        "pattern": m.group("pattern").strip(),
    }
    skip = re.sub(r"\s+", " ", (m.group("skip") or "PAST LAST ROW")).upper()
    if skip == "PAST LAST ROW":
        parts["skip"] = "past_last_row"
    elif skip == "TO NEXT ROW":
        parts["skip"] = "to_next_row"
    else:
        toks = skip.split()
        parts["skip"] = (
            "to_first" if toks[1] == "FIRST" else "to_last",
            toks[2],
        )
    subsets: dict[str, tuple[str, ...]] = {}
    if m.group("subset"):
        for item in re.split(
            r",\s*(?=[A-Za-z_]\w*\s*=)", m.group("subset").strip()
        ):
            sm = re.match(
                r"\s*([A-Za-z_]\w*)\s*=\s*\(\s*([^)]*)\s*\)\s*$", item
            )
            if not sm:
                raise ValueError(f"bad SUBSET item: {item!r}")
            subsets[sm.group(1)] = tuple(
                s.strip() for s in sm.group(2).split(",")
            )
    parts["subsets"] = subsets
    defines: dict[str, str] = {}
    for item in re.split(
        r",\s*(?=[A-Za-z_]\w*\s+AS\s)", m.group("define").strip(), flags=re.I
    ):
        dm = re.match(r"\s*([A-Za-z_]\w*)\s+AS\s+(.+)$", item, re.I | re.S)
        if not dm:
            raise ValueError(f"bad DEFINE item: {item!r}")
        defines[dm.group(1)] = dm.group(2).strip()
    parts["defines"] = defines
    measures: list[tuple[str, str]] = []
    if m.group("measures"):
        for item in re.split(r",\s*(?![^()]*\))", m.group("measures")):
            mm = re.match(r"\s*(.+?)\s+AS\s+(\w+)\s*$", item, re.I | re.S)
            if not mm:
                raise ValueError(f"bad MEASURES item: {item!r}")
            # FINAL semantics always (doc) — RUNNING/FINAL accepted+ignored
            expr = re.sub(
                r"^\s*(?:RUNNING|FINAL)\s+", "", mm.group(1).strip(),
                flags=re.I,
            )
            measures.append((expr, mm.group(2)))
    parts["measures"] = measures
    return parts


_AGG_RE = re.compile(
    r"^(sum|min|max|count|avg)\s*\(\s*([A-Za-z_][\w.]*)\s*\)$", re.I
)


def _compile_output(expr: str, columns, subsets, symbols, dtype_of):
    """Measure or window-aggregate expression -> (callable(frame, labels),
    spark type ddl, fast_agg | None). Aggregates over the pattern window
    see the MATCHED rows as their frame (empty frame when unmatched /
    skipped — handled by the caller passing an empty frame). fast_agg =
    (agg_name, column) marks expressions the match loop can evaluate from
    precomputed numpy arrays instead of per-row pandas slices."""
    am = _AGG_RE.match(expr.strip())
    if am:
        fn, col = am.group(1).lower(), am.group(2).split(".")[-1]
        if col not in columns:
            raise ValueError(f"unknown column {col!r} in window aggregate")

        def agg(fr: pd.DataFrame, labs, fn=fn, col=col):
            if not len(fr):
                return 0 if fn == "count" else None
            v = pd.to_numeric(fr[col], errors="coerce")
            if fn == "count":
                return int(fr[col].notna().sum())
            if fn == "sum":
                return float(v.sum())
            if fn == "min":
                return float(v.min())
            if fn == "max":
                return float(v.max())
            return float(v.mean())

        return agg, ("bigint" if fn == "count" else "double"), (fn, col)
    # FIRST/LAST(CLASSIFIER()) — label navigation (window.rst example
    # FIRST(CLASSIFIER()) returns the first matched row's variable)
    cm = re.match(
        r"(FIRST|LAST)\s*\(\s*CLASSIFIER\s*\(\s*\)\s*\)$", expr.strip(), re.I
    )
    if cm:
        which = cm.group(1).upper()

        def label_nav(fr, labs, which=which):
            if not labs:
                return None
            return labs[0] if which == "FIRST" else labs[-1]

        return label_nav, "string", None
    # measures: CLASSIFIER / FIRST / LAST / bare column
    fn = _compile_measure(expr, columns, subsets, symbols)
    if re.match(r"CLASSIFIER\s*\(", expr.strip(), re.I):
        out_t = "string"
    else:
        ref = re.sub(
            r"^(?:FIRST|LAST)\s*\(\s*", "", expr.strip(), flags=re.I
        )
        col = re.match(r"([A-Za-z_][\w.]*)", ref)
        out_t = dtype_of.get(col.group(1).split(".")[-1], "string") if col else "string"

    def guarded(fr, labs, fn=fn):
        if not len(fr):
            return None
        return fn(fr, labs)

    return guarded, out_t, None


def window_pattern_measures(
    df: DataFrame, spec: dict, out_cols: list[tuple[str, str]]
) -> DataFrame:
    """Evaluate row-pattern window measures / aggregates: returns the
    input columns PLUS one column per (output_name, expression) in
    ``out_cols``, one output row per input row (window semantics)."""
    from pyspark.sql import functions as F

    partition_by = list(spec["partition_by"])
    order_by = list(spec["order_by"]) or partition_by
    drop_synth = False
    if not partition_by:
        df = df.withColumn("__rpw_gpart", F.lit("1"))
        partition_by = ["__rpw_gpart"]
        drop_synth = True
    columns = df.columns
    dtype_of = dict(df.dtypes)
    symbols = set(
        re.findall(r"[A-Za-z_]\w*", spec["pattern"])
    ) | set(spec["defines"])
    compiled = [
        (
            name,
            *_compile_output(
                expr, columns, spec["subsets"], symbols, dtype_of
            ),
        )
        for name, expr in out_cols
    ]
    defines = {
        sym: _compile_define(expr, columns)
        for sym, expr in spec["defines"].items()
    }
    matcher = PatternMatcher(spec["pattern"], defines)
    frame_rows = spec["frame_rows"]
    seek = spec["seek"]
    skip = spec["skip"]
    subsets = spec["subsets"]

    out_schema = ", ".join(
        [f"`{c}` {dtype_of[c]}" for c in columns]
        + [f"`{name}` {t}" for name, _, t, _f in compiled]
    )
    empty = pd.DataFrame(columns=columns)
    # unmatched/skipped rows produce a CONSTANT per measure — evaluate the
    # empty-frame value once, not once per row
    empty_vals = {name: fn(empty, []) for name, fn, _t, _fast in compiled}
    fast_agg_cols = {fast[1] for _n, _f, _t, fast in compiled if fast}

    def skip_members(sym: str) -> frozenset:
        return frozenset(subsets.get(sym, (sym,)))

    def run_partition(batches):
        """One pandas pass per Spark partition: sort + DEFINE classification
        + aggregate-array precompute all run partition-WIDE (defines come
        from _compile_define, whose navigation is group-boundary-safe via
        nav_shift) — per-group sort_values/eval/copy/concat dominated the
        runtime at many small groups (p_rpr_window 5.9 -> ~1 s at sf0.01).
        Only the per-row match loop remains per group."""
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
        n_all = len(pdf)
        g_starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        g_ends = np.r_[g_starts[1:], n_all]
        pdf[_GID_COL] = gid
        cls = matcher._classify(pdf)  # noqa: SLF001 — engine-internal reuse
        del pdf[_GID_COL]
        # simple sum/min/max/count/avg over the matched frame evaluate on
        # numpy slices of partition-wide arrays (per-row pandas slicing +
        # Series construction dominated the match loop: 9.8 -> 2.8 s)
        arrs: dict[str, tuple[np.ndarray, np.ndarray]] = {}
        for col in fast_agg_cols:
            v = pd.to_numeric(pdf[col], errors="coerce").astype("float64")
            arrs[col] = (v.to_numpy(), pdf[col].notna().to_numpy())
        # unmatched/skipped rows keep the prefilled empty-frame constant
        out_vals: dict[str, list] = {
            name: [empty_vals[name]] * n_all for name, *_ in compiled
        }

        def set_row(i: int, s: int, e: int, labels) -> None:
            frame = None
            for name, fn, _t, fast in compiled:
                if fast is not None:
                    agg, col = fast
                    v, notna = arrs[col]
                    if agg == "count":
                        out_vals[name][i] = int(notna[s:e].sum())
                        continue
                    sl = v[s:e]
                    if agg == "sum":
                        out_vals[name][i] = float(np.nansum(sl))
                    elif agg == "avg":
                        k = int((~np.isnan(sl)).sum())
                        out_vals[name][i] = (
                            float(np.nansum(sl) / k) if k else float("nan")
                        )
                    else:  # min / max: pandas skipna semantics (nan if none)
                        k = int((~np.isnan(sl)).sum())
                        if not k:
                            out_vals[name][i] = float("nan")
                        elif agg == "min":
                            out_vals[name][i] = float(np.nanmin(sl))
                        else:
                            out_vals[name][i] = float(np.nanmax(sl))
                else:
                    if frame is None:
                        frame = pdf.iloc[s:e]
                    out_vals[name][i] = fn(frame, labels)

        def run_group(gs: int, ge: int) -> None:
            skipped_until = gs
            for i in range(gs, ge):
                if i < skipped_until:
                    continue  # consumed by a previous match's skip
                limit = ge if frame_rows is None else min(ge, i + frame_rows)
                hit = None
                anchor = i
                for a in range(i, limit if seek else i + 1):
                    hit = matcher._match_at(  # noqa: SLF001
                        a, limit, cls, lo=gs
                    )
                    if hit is not None:
                        anchor = a
                        break
                if hit is None or not hit[0]:
                    continue
                labels, _excl = hit
                set_row(i, anchor, anchor + len(labels), labels)
                end = anchor + len(labels) - 1
                if skip == "past_last_row":
                    skipped_until = max(skipped_until, end + 1)
                elif skip == "to_next_row":
                    skipped_until = max(skipped_until, i + 1)
                else:
                    which, sym = skip
                    mem = skip_members(sym)
                    idxs = [k for k, l in enumerate(labels) if l in mem]
                    if idxs:
                        k = idxs[0] if which == "to_first" else idxs[-1]
                        skipped_until = max(skipped_until, anchor + k)
                    else:
                        skipped_until = max(skipped_until, i + 1)
                skipped_until = max(skipped_until, i + 1)

        for gs, ge in zip(g_starts, g_ends):
            run_group(int(gs), int(ge))

        for name, _fn, _t, _fast in compiled:
            pdf[name] = pd.Series(out_vals[name], dtype="object")
        yield pdf

    out = df.repartition(*[df[c] for c in partition_by]).mapInPandas(
        run_partition, schema=out_schema
    )
    return out.drop("__rpw_gpart") if drop_synth else out
