"""SQL front-end for MATCH_RECOGNIZE — run the reference's own syntax.

Reference grammar: ``core/trino-parser/.../SqlBase.g4`` patternRecognition
(``MATCH_RECOGNIZE '(' PARTITION BY ... ORDER BY ... MEASURES ...
 rowsPerMatch? skipTo? PATTERN '(' rowPattern ')' DEFINE ... ')'``),
analyzed by ``sql/analyzer/PatternRecognitionAnalyzer.java``.  This module
parses that clause shape and lowers it onto the general NFA engine
(operators/row_pattern.py):

- DEFINE predicates: boolean expressions over ``col``, ``SYM.col``,
  ``PREV(col [, n])``, ``NEXT(col)``, literals, comparison operators and
  AND/OR/NOT — compiled to VECTORIZED pandas expressions (one shift per
  navigation, no per-row Python).  Symbol prefixes are erased: the engine's
  classification is context-free, matching the reference's common usage
  where A.x inside DEFINE A means "this row's x".
- MEASURES: ``MATCH_NUMBER()``, ``CLASSIFIER()`` (ALL ROWS mode),
  ``FIRST(col)``, ``LAST(col)``, ``col`` (= LAST), each with an AS alias.
- ROWS PER MATCH: ONE (default) | ALL.
- AFTER MATCH SKIP: PAST LAST ROW (default) | TO NEXT ROW |
  TO [FIRST|LAST] symbol.

The expression compiler builds a restricted AST via tokenization (only
identifiers, numbers, strings, comparison/boolean operators and the two
navigation functions are accepted — anything else raises), so no arbitrary
code ever evaluates.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame

from trino_private_spark.operators.row_pattern import (
    match_recognize_general,
    nav_shift,
    vectorized,
)

__all__ = ["parse_match_recognize", "sql_match_recognize"]

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<num>\d+(?:\.\d+)?)
      | (?P<str>'[^']*')
      | (?P<op><>|<=|>=|=|<|>)
      | (?P<lp>\() | (?P<rp>\))
      | (?P<comma>,)
      | (?P<name>[A-Za-z_][A-Za-z_0-9.]*)
    )""",
    re.X,
)

_BOOL_WORDS = {"AND", "OR", "NOT"}
_NAV = {"PREV", "NEXT"}


def _compile_define(expr: str, columns: list[str]):
    """Compile a DEFINE boolean expression into a vectorized predicate
    pdf -> bool Series.  Grammar: comparisons of operands joined by
    AND/OR/NOT with parentheses; operands are column refs (optionally
    SYM.col), PREV/NEXT navigation, numeric or string literals."""
    pos = 0
    out = []  # python expression fragments over namespace {p: pdf}
    colset = set(columns)
    while pos < len(expr):
        m = _TOKEN.match(expr, pos)
        if not m:
            if expr[pos:].strip() == "":
                break
            raise ValueError(f"cannot tokenize DEFINE at: {expr[pos:]!r}")
        pos = m.end()
        if m.group("num"):
            out.append(m.group("num"))
        elif m.group("str"):
            out.append(m.group("str"))
        elif m.group("op"):
            out.append(
                {"=": "==", "<>": "!="}.get(m.group("op"), m.group("op"))
            )
        elif m.group("lp"):
            out.append("(")
        elif m.group("rp"):
            out.append(")")
        elif m.group("comma"):
            out.append(",")
        else:
            name = m.group("name")
            up = name.upper()
            if up in _BOOL_WORDS:
                out.append({"AND": ") & (", "OR": ") | (", "NOT": "~"}[up])
            elif up in _NAV:
                # PREV(col [, n]) / NEXT(col): consume the parenthesized args
                m2 = re.match(
                    r"\s*\(\s*([A-Za-z_][A-Za-z_0-9.]*)\s*(?:,\s*(\d+)\s*)?\)",
                    expr[pos:],
                )
                if not m2:
                    raise ValueError(f"bad {up}() call in DEFINE: {expr}")
                pos += m2.end()
                col = m2.group(1).split(".")[-1]
                if col not in colset:
                    raise ValueError(f"unknown column {col!r} in DEFINE")
                n = int(m2.group(2) or 1)
                shift = n if up == "PREV" else -n
                # group-boundary-safe navigation: lets the executor classify
                # a whole Spark partition (many groups) in one pandas pass
                out.append(f"_sh(p, {col!r}, {shift})")
            elif up in ("TRUE", "FALSE"):
                # boolean literals (DEFINE A AS true — the always-match
                # definition the reference's docs use throughout); emitted
                # as full-length vectors so the vectorized path sees one
                # boolean per row, not a scalar
                out.append(
                    "(p.index >= 0)" if up == "TRUE" else "(p.index < 0)"
                )
            else:
                col = name.split(".")[-1]
                if col not in colset:
                    raise ValueError(f"unknown column {col!r} in DEFINE")
                out.append(f"p[{col!r}]")
    body = "(" + " ".join(out) + ")"
    code = compile(body, "<define>", "eval")

    def pred(p, _code=code):
        return eval(_code, {"__builtins__": {}}, {"p": p, "_sh": nav_shift})

    return vectorized(pred, group_safe=True)


_MR_RE = re.compile(
    r"""MATCH_RECOGNIZE\s*\(\s*
        (?:PARTITION\s+BY\s+(?P<part>.+?)\s+)?
        ORDER\s+BY\s+(?P<order>.+?)\s+
        (?:MEASURES\s+(?P<measures>.+?)\s+)?
        (?:(?P<rows>ONE\s+ROW\s+PER\s+MATCH|ALL\s+ROWS\s+PER\s+MATCH)\s+)?
        (?:AFTER\s+MATCH\s+SKIP\s+(?P<skip>PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW|TO\s+(?:FIRST|LAST)\s+\w+)\s+)?
        PATTERN\s*\(\s*(?P<pattern>[^)]*?(?:\([^)]*\)[^)]*?)*)\s*\)\s+
        (?:SUBSET\s+(?P<subset>.+?)\s+)?
        DEFINE\s+(?P<define>.+?)\s*
        \)\s*$""",
    re.X | re.I | re.S,
)


def parse_match_recognize(clause: str) -> dict:
    """Parse the text INSIDE/including MATCH_RECOGNIZE (...) into its
    components (raw strings; compilation happens in sql_match_recognize)."""
    m = _MR_RE.search(clause.strip())
    if not m:
        raise ValueError("cannot parse MATCH_RECOGNIZE clause")
    parts = {
        # PARTITION BY is optional (SqlBase.g4 patternRecognition — one
        # global partition when omitted, as in the reference)
        "partition_by": (
            [c.strip() for c in m.group("part").split(",")]
            if m.group("part")
            else []
        ),
        "order_by": [c.strip() for c in m.group("order").split(",")],
        "pattern": m.group("pattern").strip(),
        "mode": "all" if m.group("rows") and m.group("rows").upper().startswith("ALL") else "one",
    }
    skip = (m.group("skip") or "PAST LAST ROW").upper().split()
    if skip[:3] == ["PAST", "LAST", "ROW"]:
        parts["skip"] = "past_last_row"
    elif skip[:3] == ["TO", "NEXT", "ROW"]:
        parts["skip"] = "to_next_row"
    else:  # TO FIRST/LAST sym
        parts["skip"] = ("to_first" if skip[1] == "FIRST" else "to_last", skip[2])
    # SUBSET list: U = (A, B), V = (C) — union pattern variables
    # (SqlBase.g4:339 subsetDefinition; PatternRecognitionAnalyzer.java)
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
                s.strip() for s in sm.group(2).split(",") if s.strip()
            )
    parts["subsets"] = subsets
    # DEFINE list: SYM AS expr, SYM AS expr ... (split on ', SYM AS' borders)
    defines = {}
    for item in re.split(r",\s*(?=[A-Za-z_]\w*\s+AS\s)", m.group("define"), flags=re.I):
        dm = re.match(r"\s*([A-Za-z_]\w*)\s+AS\s+(.*)\s*$", item, flags=re.I | re.S)
        if not dm:
            raise ValueError(f"bad DEFINE item: {item!r}")
        defines[dm.group(1)] = dm.group(2).strip()
    parts["defines"] = defines
    # MEASURES list
    measures = []
    if m.group("measures"):
        for item in re.split(r",\s*(?![^()]*\))", m.group("measures")):
            mm = re.match(r"\s*(.+?)\s+AS\s+([A-Za-z_]\w*)\s*$", item, flags=re.I | re.S)
            if not mm:
                raise ValueError(f"bad MEASURES item: {item!r}")
            measures.append((mm.group(1).strip(), mm.group(2)))
    parts["measures"] = measures
    return parts


def _compile_measure(
    expr: str,
    columns: list[str],
    subsets: dict[str, tuple[str, ...]] | None = None,
    symbols: set[str] | None = None,
):
    """Measure -> callable(frame, labels).  Supported: MATCH_NUMBER()
    (handled by the engine), CLASSIFIER([U]), FIRST/LAST([SYM.]col [, n]),
    [SYM.]col (= LAST).  A SYM prefix restricts navigation to the rows the
    pattern matched as SYM — or as any member of SYM when SYM is a SUBSET
    union variable (PatternRecognitionAnalyzer.java label-aware navigation)."""
    subsets = subsets or {}
    symbols = symbols or set()
    e = expr.strip()
    up = e.upper()

    def _members(prefix: str) -> frozenset | None:
        if prefix in subsets:
            return frozenset(subsets[prefix])
        if prefix in symbols:
            return frozenset({prefix})
        return None

    cm = re.match(r"CLASSIFIER\s*\(\s*([A-Za-z_]\w*)?\s*\)$", e, flags=re.I)
    if cm:
        if not cm.group(1):
            return lambda fr, labs: labs[-1]
        mem = _members(cm.group(1))
        if mem is None:
            raise ValueError(f"unknown variable in CLASSIFIER: {cm.group(1)!r}")

        def _classifier(fr, labs, mem=mem):
            hits = [l for l in labs if l in mem]
            return hits[-1] if hits else None

        return _classifier
    fm = re.match(
        r"(FIRST|LAST)\s*\(\s*([A-Za-z_][\w.]*)\s*(?:,\s*(\d+)\s*)?\)$",
        e,
        flags=re.I,
    )
    if fm:
        which = fm.group(1).upper()
        ref = fm.group(2)
        off = int(fm.group(3) or 0)
        prefix, _, col = ref.rpartition(".")
        if col not in columns:
            raise ValueError(f"unknown column {col!r} in MEASURES")
        mem = _members(prefix) if prefix else None
        if prefix and mem is None:
            raise ValueError(f"unknown pattern variable {prefix!r} in MEASURES")

        def _nav(fr, labs, c=col, mem=mem, which=which, off=off):
            idxs = (
                range(len(labs))
                if mem is None
                else [k for k, l in enumerate(labs) if l in mem]
            )
            idxs = list(idxs)
            if not idxs:
                return None
            k = off if which == "FIRST" else len(idxs) - 1 - off
            if k < 0 or k >= len(idxs):
                return None
            return fr[c].iloc[idxs[k]]

        return _nav
    prefix, _, col = e.rpartition(".")
    if col in columns:
        if prefix:
            mem = _members(prefix)
            if mem is None:
                raise ValueError(f"unknown pattern variable {prefix!r} in MEASURES")

            def _last(fr, labs, c=col, mem=mem):
                idxs = [k for k, l in enumerate(labs) if l in mem]
                return fr[c].iloc[idxs[-1]] if idxs else None

            return _last
        return lambda fr, labs, c=col: fr[c].iloc[-1]
    raise ValueError(f"unsupported measure expression: {expr!r}")


def sql_match_recognize(df: DataFrame, clause: str) -> DataFrame:
    """Execute a MATCH_RECOGNIZE clause (the reference's SQL syntax)
    against ``df``.  MATCH_NUMBER() comes back as the engine's
    match_number column; other measures compile per the subset above and
    are emitted as long/double/string via their pandas values."""
    spec = parse_match_recognize(clause)
    columns = df.columns
    defines = {
        sym: _compile_define(expr, columns) for sym, expr in spec["defines"].items()
    }
    subsets = spec.get("subsets", {})
    pattern_syms = {
        t
        for t in re.findall(r"[A-Za-z_]\w*", spec["pattern"])
        if t.upper() != "PERMUTE"
    } | set(spec["defines"])
    # AFTER MATCH SKIP TO a union variable: resolve to its member set
    if isinstance(spec["skip"], tuple) and spec["skip"][1] in subsets:
        spec["skip"] = (spec["skip"][0], frozenset(subsets[spec["skip"][1]]))
    measures = {}
    schema_bits = []
    for expr, alias in spec["measures"]:
        if expr.strip().upper() == "MATCH_NUMBER()":
            continue  # engine emits match_number natively
        measures[alias] = _compile_measure(expr, columns, subsets, pattern_syms)
        schema_bits.append(f"{alias} string")

    out = match_recognize_general(
        df,
        partition_by=spec["partition_by"],
        order_by=spec["order_by"],
        pattern=spec["pattern"],
        defines=defines,
        mode=spec["mode"],
        skip=spec["skip"],
        measures={
            k: (
                lambda fr, labs, f=f: (
                    None if (v := f(fr, labs)) is None else str(v)
                )
            )
            for k, f in measures.items()
        },
        measure_schema=", ".join(schema_bits),
    )
    return out
