"""General MATCH_RECOGNIZE row-pattern engine.

Reference: the full SQL/RPR surface of PatternRecognitionNode —
pattern grammar ``core/trino-parser/.../tree/Pattern*.java`` (concatenation,
alternation ``|``, grouping, quantifiers ``? * + {n} {n,} {n,m}`` with
reluctant variants, ``PERMUTE``, anchors ``^ $``), the NFA compiler/runtime
``operator/window/matcher/Program.java`` / ``Matcher.java`` (Thompson
construction with thread priority = greedy/reluctant order), skip modes
``AFTER MATCH SKIP PAST LAST ROW | TO NEXT ROW | TO [FIRST|LAST] <sym>``
(``sql/analyzer/PatternRecognitionAnalyzer.java``), and output modes
``ONE ROW PER MATCH | ALL ROWS PER MATCH`` with ``CLASSIFIER()`` /
``MATCH_NUMBER()`` measures.

Spark has no row-pattern operator, so this is the sanctioned pandas path
(SURVEY §2.1 #37): one shuffle on PARTITION BY, per-group ordering in
pandas inside ``applyInPandas``, then a small NFA per group — the same
dataflow as the reference, which runs its matcher inside the window
operator over a materialized partition (PagesIndex).

Semantics model: DEFINE predicates are callables over
``(cur_row, prev_row)`` in INPUT order (the ``PREV(col)`` navigation that
real patterns use).  Row classification is therefore context-free, which
lets the matcher precompute one boolean vector per symbol (vectorized
pandas, Arrow-batched) and run a priority DFS with (state, position)
failure memoization — leftmost-greedy matching identical to the
reference's priority-threaded NFA, linear-ish per partition in practice.

Scale: state per in-flight match is O(pattern); the partition is the
memory bound exactly as in the reference.  The shuffle is the only
exchange; partitions stream through Arrow.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = [
    "compile_pattern",
    "PatternMatcher",
    "match_recognize_general",
    "nav_shift",
    "vectorized",
]


def vectorized(fn, group_safe: bool = False):
    """Mark a DEFINE predicate as vectorized: it receives the WHOLE ordered
    partition (pd.DataFrame) and returns a boolean array — classification
    then runs as one pandas expression instead of a Python loop per row.
    Example: ``vectorized(lambda pdf: pdf['v'] > pdf['v'].shift(1))``.

    ``group_safe`` declares that the predicate evaluates correctly over a
    frame holding MANY stacked partition-groups (it navigates via
    :func:`nav_shift`, or not at all), which lets the executors classify a
    whole Spark partition in one pandas pass instead of once per group."""
    fn._rp_vectorized = True
    fn._rp_group_safe = group_safe
    return fn


_GID_COL = "__rp_gid"


def nav_shift(p: pd.DataFrame, col: str, k: int) -> pd.Series:
    """PREV/NEXT navigation as a shift that never crosses a group boundary.

    When ``p`` carries the engine-internal ``__rp_gid`` column (stacked
    partition-groups classified in one pass), positions whose shift source
    lies in a different group become NaN — exactly what a per-group
    ``shift`` would produce. Without the column it is a plain shift."""
    s = p[col].shift(k)
    g = p.get(_GID_COL)
    if g is not None:
        s = s.where(g.eq(g.shift(k)))
    return s


# --------------------------------------------------------------------------
# Pattern AST + parser
# --------------------------------------------------------------------------


@dataclass
class _Node:
    kind: str  # sym | seq | alt | quant | anchor_start | anchor_end | empty
    sym: str | None = None
    children: list = field(default_factory=list)
    lo: int = 1
    hi: int | None = 1  # None = unbounded
    greedy: bool = True


class _Parser:
    """Recursive-descent parser for the SQL/RPR pattern grammar subset:
    ``A B | C (D E)+ F{2,4} G*? PERMUTE(H, I) ^ $``."""

    def __init__(self, text: str):
        self.toks = self._lex(text)
        self.i = 0

    @staticmethod
    def _lex(text: str) -> list[str]:
        toks, i, n = [], 0, len(text)
        while i < n:
            c = text[i]
            if c.isspace():
                i += 1
            elif c in "()|^$?*+,":
                toks.append(c)
                i += 1
            elif c == "{" and i + 1 < n and text[i + 1] == "-":
                # {- ... -} exclusion (SqlBase.g4:601 excludedPattern)
                toks.append("{-")
                i += 2
            elif c == "-" and i + 1 < n and text[i + 1] == "}":
                toks.append("-}")
                i += 2
            elif c == "{":
                j = text.index("}", i)
                toks.append(text[i : j + 1])
                i = j + 1
            elif c.isalpha() or c == "_":
                j = i
                while j < n and (text[j].isalnum() or text[j] == "_"):
                    j += 1
                toks.append(text[i:j])
                i = j
            else:
                raise ValueError(f"bad pattern character {c!r}")
        return toks

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        self.i += 1
        return t

    def parse(self) -> _Node:
        node = self._alt()
        if self._peek() is not None:
            raise ValueError(f"trailing tokens at {self.toks[self.i:]}")
        return node

    def _alt(self) -> _Node:
        branches = [self._seq()]
        while self._peek() == "|":
            self._next()
            branches.append(self._seq())
        if len(branches) == 1:
            return branches[0]
        return _Node("alt", children=branches)

    def _seq(self) -> _Node:
        items = []
        while True:
            t = self._peek()
            if t is None or t in ("|", ")", ",", "-}"):
                break
            items.append(self._quantified())
        if not items:
            return _Node("empty")
        if len(items) == 1:
            return items[0]
        return _Node("seq", children=items)

    def _quantified(self) -> _Node:
        atom = self._atom()
        t = self._peek()
        lo, hi = None, None
        if t == "?":
            lo, hi = 0, 1
        elif t == "*":
            lo, hi = 0, None
        elif t == "+":
            lo, hi = 1, None
        elif t is not None and t.startswith("{") and t != "{-":
            body = t[1:-1].strip()
            if "," in body:
                a, b = body.split(",", 1)
                lo = int(a) if a.strip() else 0
                hi = int(b) if b.strip() else None
            else:
                lo = hi = int(body)
        if lo is None:
            return atom
        self._next()
        greedy = True
        if self._peek() == "?":
            self._next()
            greedy = False
        return _Node("quant", children=[atom], lo=lo, hi=hi, greedy=greedy)

    def _atom(self) -> _Node:
        t = self._next()
        if t == "(":
            node = self._alt()
            if self._next() != ")":
                raise ValueError("unbalanced parens")
            return node
        if t == "{-":
            node = self._alt()
            if self._next() != "-}":
                raise ValueError("unbalanced {- -} exclusion")
            return _Node("excl", children=[node])
        if t == "^":
            return _Node("anchor_start")
        if t == "$":
            return _Node("anchor_end")
        if t is not None and t.upper() == "PERMUTE":
            if self._next() != "(":
                raise ValueError("PERMUTE needs parens")
            parts = [self._alt()]
            while self._peek() == ",":
                self._next()
                parts.append(self._alt())
            if self._next() != ")":
                raise ValueError("unbalanced PERMUTE parens")
            # reference expands PERMUTE to the alternation of permutations
            # in lexicographic order (PatternRecognitionAnalyzer)
            import itertools

            branches = [
                _Node("seq", children=list(perm))
                for perm in itertools.permutations(parts)
            ]
            return _Node("alt", children=branches)
        if t is None or not (t[0].isalpha() or t[0] == "_"):
            raise ValueError(f"unexpected token {t!r}")
        return _Node("sym", sym=t)


# --------------------------------------------------------------------------
# Thompson NFA with priority (greedy = preferred-branch-first, like
# Program.java's instruction order)
# --------------------------------------------------------------------------
#
# States are integers; transitions:
#   ("sym", symbol, next)  — consume one row classified as `symbol`
#   ("split", [n1, n2...]) — epsilon branches in PRIORITY order
#   ("jmp", next)
#   ("anchor_start"/"anchor_end", next)
#   ("match",)


class _NFA:
    def __init__(self):
        self.prog: list[tuple] = []

    def _emit(self, instr) -> int:
        self.prog.append(instr)
        return len(self.prog) - 1


def _compile(node: _Node, nfa: _NFA) -> tuple[int, list[int]]:
    """Returns (entry_pc, dangling_exits) with patchable exits."""
    if node.kind == "empty":
        pc = nfa._emit(["jmp", None])
        return pc, [pc]
    if node.kind == "sym":
        pc = nfa._emit(["sym", node.sym, None])
        return pc, [pc]
    if node.kind in ("anchor_start", "anchor_end"):
        pc = nfa._emit([node.kind, None])
        return pc, [pc]
    if node.kind == "excl":
        # {- subpattern -}: rows still match (and count for DEFINE/MEASURES)
        # but are dropped from ALL ROWS PER MATCH output
        # (PatternRecognitionAnalyzer.java exclusion handling).
        open_pc = nfa._emit(["excl_open", None])
        c_entry, c_exits = _compile(node.children[0], nfa)
        nfa.prog[open_pc][-1] = c_entry
        close_pc = nfa._emit(["excl_close", None])
        for e in c_exits:
            nfa.prog[e][-1] = close_pc
        return open_pc, [close_pc]
    if node.kind == "seq":
        entry = None
        exits: list[int] = []
        for child in node.children:
            c_entry, c_exits = _compile(child, nfa)
            if entry is None:
                entry = c_entry
            for e in exits:
                nfa.prog[e][-1] = c_entry
            exits = c_exits
        return entry, exits
    if node.kind == "alt":
        split = nfa._emit(["split", []])
        all_exits: list[int] = []
        for child in node.children:
            c_entry, c_exits = _compile(child, nfa)
            nfa.prog[split][1].append(c_entry)
            all_exits.extend(c_exits)
        return split, all_exits
    if node.kind == "quant":
        child = node.children[0]
        lo, hi, greedy = node.lo, node.hi, node.greedy
        entry = None
        exits: list[int] = []
        # mandatory copies
        for _ in range(lo):
            c_entry, c_exits = _compile(child, nfa)
            if entry is None:
                entry = c_entry
            for e in exits:
                nfa.prog[e][-1] = c_entry
            exits = c_exits
        if hi is None:
            # loop: split -> (child -> back to split) | out
            split = nfa._emit(["split", []])
            if entry is None:
                entry = split
            for e in exits:
                nfa.prog[e][-1] = split
            c_entry, c_exits = _compile(child, nfa)
            for e in c_exits:
                nfa.prog[e][-1] = split
            out = nfa._emit(["jmp", None])
            branches = [c_entry, out] if greedy else [out, c_entry]
            nfa.prog[split][1] = branches
            return entry, [out]
        # bounded optional copies
        outs: list[int] = []
        for _ in range(hi - lo):
            split = nfa._emit(["split", []])
            if entry is None:
                entry = split
            for e in exits:
                nfa.prog[e][-1] = split
            out = nfa._emit(["jmp", None])
            c_entry, c_exits = _compile(child, nfa)
            branches = [c_entry, out] if greedy else [out, c_entry]
            nfa.prog[split][1] = branches
            outs.append(out)
            exits = c_exits
        if entry is None:  # lo == hi == 0
            pc = nfa._emit(["jmp", None])
            return pc, [pc]
        return entry, exits + outs


def compile_pattern(text: str):
    """Compile a pattern string to an NFA program (list of instructions)."""
    ast = _Parser(text).parse()
    nfa = _NFA()
    entry, exits = _compile(ast, nfa)
    match_pc = nfa._emit(["match"])
    for e in exits:
        nfa.prog[e][-1] = match_pc
    return entry, nfa.prog


# --------------------------------------------------------------------------
# Matcher
# --------------------------------------------------------------------------


class PatternMatcher:
    """Executes a compiled pattern over one ordered partition.

    ``defines``: symbol -> predicate(cur_row: pd.Series, prev_row) -> bool.
    Undefined symbols are TRUE (reference: undefined label matches any row).
    """

    def __init__(self, pattern: str, defines: dict):
        self.entry, self.prog = compile_pattern(pattern)
        self.defines = defines
        self.symbols = sorted(
            {ins[1] for ins in self.prog if ins[0] == "sym"}
        )

    def _classify(self, pdf: pd.DataFrame) -> dict[str, np.ndarray]:
        """Precompute the per-symbol boolean vector (context-free DEFINEs)."""
        out = {}
        n = len(pdf)
        rows = None
        for s in self.symbols:
            pred = self.defines.get(s)
            if pred is None:
                out[s] = np.ones(n, dtype=bool)
            elif getattr(pred, "_rp_vectorized", False):
                vals = pred(pdf)
                out[s] = np.asarray(
                    pd.Series(vals).fillna(False).to_numpy(), dtype=bool
                )
            else:
                if rows is None:
                    rows = [pdf.iloc[k] for k in range(n)]
                out[s] = np.array(
                    [
                        bool(pred(rows[k], rows[k - 1] if k > 0 else None))
                        for k in range(n)
                    ],
                    dtype=bool,
                )
        return out

    def _entry_info(self):
        """(symbols reachable as the FIRST consumed row, can-match-empty) —
        computed once per matcher; drives the start-position prefilter."""
        if not hasattr(self, "_entry_cache"):
            seen: set[int] = set()
            syms: set[str] = set()
            can_empty = False
            stack = [self.entry]
            while stack:
                pc = stack.pop()
                if pc in seen:
                    continue
                seen.add(pc)
                ins = self.prog[pc]
                if ins[0] == "sym":
                    syms.add(ins[1])
                elif ins[0] == "split":
                    stack.extend(ins[1])
                elif ins[0] in (
                    "jmp",
                    "anchor_start",
                    "anchor_end",
                    "excl_open",
                    "excl_close",
                ):
                    stack.append(ins[1])
                elif ins[0] == "match":
                    can_empty = True
            self._entry_cache = (syms, can_empty)
        return self._entry_cache

    def _match_at(
        self, start: int, n: int, cls: dict, lo: int = 0
    ) -> tuple[list[str], list[bool]] | None:
        """Leftmost-greedy match starting at ``start``; returns the label
        sequence (one symbol per consumed row) plus a parallel excluded-row
        mask ({- -} spans), or None.  Priority DFS with (pc, pos) failure
        memo — sound because classification is context-free and exclusion
        depth is a static property of each program point.  ``lo``/``n``
        bound the group when ``cls`` spans stacked groups (anchors compare
        against them)."""
        failed: set[tuple[int, int]] = set()
        labels: list[str] = []
        excl: list[bool] = []
        depth = 0

        def dfs(pc: int, pos: int) -> bool:
            nonlocal depth
            if (pc, pos) in failed:
                return False
            ins = self.prog[pc]
            op = ins[0]
            if op == "match":
                return True
            ok = False
            if op == "jmp":
                ok = dfs(ins[1], pos)
            elif op == "split":
                for nxt in ins[1]:
                    if dfs(nxt, pos):
                        ok = True
                        break
            elif op == "anchor_start":
                ok = pos == lo and dfs(ins[1], pos)
            elif op == "anchor_end":
                ok = pos == n and dfs(ins[1], pos)
            elif op == "excl_open":
                depth += 1
                ok = dfs(ins[1], pos)
                depth -= 1
            elif op == "excl_close":
                depth -= 1
                ok = dfs(ins[1], pos)
                depth += 1
            elif op == "sym":
                if pos < n and cls[ins[1]][pos]:
                    labels.append(ins[1])
                    excl.append(depth > 0)
                    if dfs(ins[2], pos + 1):
                        ok = True
                    else:
                        labels.pop()
                        excl.pop()
            if not ok:
                failed.add((pc, pos))
            return ok

        return (labels, excl) if dfs(self.entry, start) else None

    def find_matches(
        self,
        pdf: pd.DataFrame,
        skip: str = "past_last_row",
        with_exclusions: bool = False,
    ):
        """Yields (match_number starting at 1, start_idx, labels list) — or,
        with ``with_exclusions``, 4-tuples carrying the parallel excluded-row
        mask for {- -} spans.

        skip: 'past_last_row' | 'to_next_row' | ('to_first', sym) |
        ('to_last', sym) — AFTER MATCH SKIP semantics; ``sym`` may be a
        set of symbols (a SUBSET union variable).  Empty matches
        advance by one row (reference behavior for zero-length matches)."""
        n = len(pdf)
        cls = self._classify(pdf)
        yield from self.find_matches_range(
            cls, 0, n, skip=skip, with_exclusions=with_exclusions
        )

    def entry_candidates(self, cls: dict, n: int) -> np.ndarray | None:
        """Entry-symbol prefilter: a match starting at i must consume its
        first row as one of the symbols reachable from the NFA entry, so
        positions where none of them classify true can't start a match
        (disabled when the pattern can match empty)."""
        entry_syms, can_empty = self._entry_info()
        if can_empty or not entry_syms:
            return None
        cand = np.zeros(n, dtype=bool)
        for s in entry_syms:
            cand |= cls[s]
        return cand

    def find_matches_range(
        self,
        cls: dict,
        lo: int,
        hi: int,
        skip: str = "past_last_row",
        with_exclusions: bool = False,
        cand: np.ndarray | None = None,
    ):
        """:meth:`find_matches` over positions ``[lo, hi)`` of an already
        classified frame — ``cls`` may span many stacked groups; matches
        never cross the bounds, match numbering restarts at 1."""
        if cand is None:
            cand = self.entry_candidates(cls, hi)
        n = hi
        i, match_no = lo, 0
        while i < n:
            if cand is not None and not cand[i]:
                i += 1
                continue
            hit = self._match_at(i, n, cls, lo=lo)
            if hit is None:
                i += 1
                continue
            labels, excl = hit
            match_no += 1
            if with_exclusions:
                yield match_no, i, labels, excl
            else:
                yield match_no, i, labels
            if not labels:
                i += 1
                continue
            if skip == "past_last_row":
                i = i + len(labels)
            elif skip == "to_next_row":
                i = i + 1
            elif isinstance(skip, tuple) and skip[0] in ("to_first", "to_last"):
                which, sym = skip
                symset = sym if isinstance(sym, (set, frozenset)) else {sym}
                idxs = [k for k, s in enumerate(labels) if s in symset]
                if not idxs:
                    raise ValueError(f"skip target {sym} not in match")
                rel = idxs[0] if which == "to_first" else idxs[-1]
                if rel == 0:
                    # reference raises: skipping to the first row would loop
                    raise ValueError("AFTER MATCH SKIP cannot target first row")
                i = i + rel
            else:
                raise ValueError(f"bad skip mode {skip!r}")


def match_recognize_general(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    pattern: str,
    defines: dict,
    mode: str = "one",  # 'one' | 'all'
    skip: str | tuple = "past_last_row",
    measures: dict[str, Callable[[pd.DataFrame, list[str]], object]] | None = None,
    measure_schema: str = "",
) -> DataFrame:
    """General MATCH_RECOGNIZE over a DataFrame.

    ONE ROW PER MATCH emits: partition keys, match_number, start/end
    positions (0-based within partition order), n_rows, plus user measures
    (callables over the matched sub-frame and its label vector).
    ALL ROWS PER MATCH emits every matched row with match_number and
    classifier() (the reference's per-row label).
    """
    measures = measures or {}
    # PARTITION BY may be omitted (SqlBase.g4 patternRecognition): one
    # global partition — inherently serial here exactly as in the
    # reference's single-driver pattern matching; a synthetic constant
    # key keeps the grouped path uniform and is dropped from the output
    drop_synth = False
    if not partition_by:
        from pyspark.sql import functions as _F

        df = df.withColumn("__mr_gpart", _F.lit("1"))
        partition_by = ["__mr_gpart"]
        drop_synth = True
    key_schema = ", ".join(f"{c} string" for c in partition_by)
    if mode == "one":
        out_schema = (
            f"{key_schema}, match_number bigint, start_pos bigint, "
            f"end_pos bigint, n_rows bigint"
        )
        if measure_schema:
            out_schema += ", " + measure_schema
    else:
        out_schema = (
            f"{key_schema}, match_number bigint, row_pos bigint, "
            f"classifier string"
        )
        if measure_schema:
            out_schema += ", " + measure_schema

    matcher = PatternMatcher(pattern, defines)

    def _key_str(v) -> str:
        # integral keys may surface as float in pandas — canonicalize so a
        # later .cast('long') round-trips ("41", not "41.0")
        try:
            f = float(v)
            if f.is_integer():
                return str(int(f))
        except (TypeError, ValueError):
            pass
        return str(v)

    cols = [s.split()[0] for s in out_schema.split(", ")]
    # Partition-wide classification is sound only when every DEFINE
    # evaluates correctly over a frame of stacked groups (navigation via
    # nav_shift, marked by _compile_define / vectorized(group_safe=True));
    # anything else falls back to classifying per group.
    group_safe = all(
        getattr(p, "_rp_group_safe", False) for p in defines.values()
    )

    def emit_group(pdf, gs: int, ge: int, cls, cand, rows: list) -> None:
        """Match positions [gs, ge) of the partition-wide sorted frame;
        output positions are group-relative (window semantics)."""
        keys = {
            c: _key_str(pdf[c].iloc[gs]) for c in partition_by
        }
        for match_no, start, labels, excl in matcher.find_matches_range(
            cls, gs, ge, skip=skip, with_exclusions=True, cand=cand
        ):
            frame = (
                pdf.iloc[start : start + len(labels)] if measures else None
            )
            if mode == "one":
                row = dict(keys)
                row.update(
                    match_number=match_no,
                    start_pos=start - gs,
                    end_pos=start - gs + len(labels) - 1,
                    n_rows=len(labels),
                )
                for name, fn in measures.items():
                    row[name] = fn(frame, labels)
                rows.append(row)
            else:
                for k, lab in enumerate(labels):
                    if excl[k]:
                        # {- -} rows participate in the match (and in
                        # RUNNING measures of later rows) but are omitted
                        # from ALL ROWS PER MATCH output
                        continue
                    row = dict(keys)
                    row.update(
                        match_number=match_no,
                        row_pos=start - gs + k,
                        classifier=lab,
                    )
                    for name, fn in measures.items():
                        row[name] = fn(frame.iloc[: k + 1], labels[: k + 1])
                    rows.append(row)

    def run_partition(batches):
        # One shuffle on the keys, then pandas-side grouping: Spark's
        # per-group applyInPandas costs ~ms per group, which dominates for
        # many small partitions (measured 39s -> ~4s on 15k groups); the
        # whole Spark partition is concatenated since Arrow batches may
        # split a group.  The partition is sorted and classified ONCE —
        # per-group sort_values + DEFINE eval dominated the loop at many
        # small groups (guide §4.2: hand whole batches to pandas).
        pdfs = [b for b in batches if len(b)]
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True)
        sort_keys = partition_by + [
            c for c in order_by if c not in partition_by
        ]
        pdf = pdf.sort_values(
            sort_keys, kind="mergesort", ignore_index=True
        )
        gid = (
            pdf.groupby(partition_by, sort=False, dropna=False)
            .ngroup()
            .to_numpy()
        )
        n = len(pdf)
        starts = np.flatnonzero(np.r_[True, gid[1:] != gid[:-1]])
        ends = np.r_[starts[1:], n]
        rows: list = []
        if group_safe:
            pdf[_GID_COL] = gid
            cls = matcher._classify(pdf)
            pdf = pdf.drop(columns=[_GID_COL])
            cand = matcher.entry_candidates(cls, n)
            for gs, ge in zip(starts, ends):
                emit_group(pdf, int(gs), int(ge), cls, cand, rows)
        else:
            for gs, ge in zip(starts, ends):
                grp = pdf.iloc[int(gs) : int(ge)].reset_index(drop=True)
                cls = matcher._classify(grp)
                emit_group(grp, 0, len(grp), cls, None, rows)
        yield pd.DataFrame(rows, columns=cols)

    out = df.repartition(*[df[c] for c in partition_by]).mapInPandas(
        run_partition, schema=out_schema
    )
    return out.drop("__mr_gpart") if drop_synth else out
