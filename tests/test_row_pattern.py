"""General MATCH_RECOGNIZE engine (operators/row_pattern.py).

The reference model for the matcher is Python ``re`` run over the per-row
classification string: with single-row (context-free) DEFINEs, SQL/RPR
leftmost-greedy matching with AFTER MATCH SKIP PAST LAST ROW is exactly
anchored regex matching with the same skip loop — both the reference's
Matcher.java (priority-threaded NFA) and ``re`` (backtracking with branch
priority) implement the same semantics, so agreement on random inputs is a
strong equivalence check.
"""

from __future__ import annotations

import random
import re

import pandas as pd
import pytest

from trino_private_spark.operators.row_pattern import (
    PatternMatcher,
    compile_pattern,
    match_recognize_general,
)

# (pattern-dsl, python-regex) pairs over single-char symbols a/b/c/d
PATTERNS = [
    ("a b", "ab"),
    ("a+ b", "a+b"),
    ("a*? b", "a*?b"),
    ("(a | b)+ c", "(?:a|b)+c"),
    ("a{2,3}", "a{2,3}"),
    ("a{2,3}? b", "a{2,3}?b"),
    ("PERMUTE(a, b)", "(?:ab|ba)"),
    ("^ a+", "^a+"),
    ("a+ $", "a+$"),
    ("(a b)+", "(?:ab)+"),
    ("a? b*", "a?b*"),
    ("a{3}", "a{3}"),
    ("(a | b c)+ d", "(?:a|bc)+d"),
    ("a b? c", "ab?c"),
    ("(a | b){2,}", "(?:a|b){2,}"),
]


def _ref_segmentation(rx: re.Pattern, s: str):
    """Reference skip-past-last-row loop over the classification string."""
    out, i = [], 0
    while i < len(s):
        m = rx.match(s, i)
        if m is None:
            i += 1
            continue
        out.append((i, m.group(0)))
        i = i + len(m.group(0)) if m.group(0) else i + 1
    return out


def _engine_segmentation(pattern: str, s: str):
    pdf = pd.DataFrame({"ch": list(s)})
    defines = {
        c: (lambda cur, prev, c=c: cur["ch"] == c) for c in "abcd"
    }
    m = PatternMatcher(pattern, defines)
    return [
        (start, "".join(s[start + k] for k in range(len(labels))))
        for _, start, labels in m.find_matches(pdf)
    ]


class TestAgainstPythonRe:
    @pytest.mark.parametrize("dsl,rx", PATTERNS)
    def test_random_strings(self, dsl, rx):
        rxc = re.compile(rx)
        rnd = random.Random(hash(dsl) & 0xFFFF)
        for _ in range(40):
            s = "".join(rnd.choice("abcd") for _ in range(rnd.randint(0, 14)))
            assert _engine_segmentation(dsl, s) == _ref_segmentation(rxc, s), (
                dsl,
                s,
            )

    def test_overlapping_symbols(self):
        # two symbols true on the same row: NFA must explore both labelings
        pdf = pd.DataFrame({"v": [1, 2, 3]})
        m = PatternMatcher(
            "lo hi",
            {
                "lo": lambda cur, prev: cur["v"] <= 2,
                "hi": lambda cur, prev: cur["v"] >= 2,
            },
        )
        got = list(m.find_matches(pdf))
        # rows (1,2) -> lo hi; then row 3 alone can't match
        assert [(n, s, labs) for n, s, labs in got] == [(1, 0, ["lo", "hi"])]

    def test_prev_navigation(self):
        pdf = pd.DataFrame({"v": [1, 3, 2, 4, 6, 5]})
        up = lambda cur, prev: prev is not None and cur["v"] > prev["v"]
        m = PatternMatcher("up{2}", {"up": up})
        # rising pairs (in input order): idx1?(3>1 yes) -> need two consecutive
        # ups: (1,2)? idx2 2<3 no. (3,4): 4>2,6>4 -> match at 3
        assert [(s, labs) for _, s, labs in m.find_matches(pdf)] == [
            (3, ["up", "up"])
        ]


class TestSkipModes:
    def setup_method(self):
        self.pdf = pd.DataFrame({"ch": list("aaaa")})
        self.defines = {"a": lambda cur, prev: cur["ch"] == "a"}

    def test_past_last_row(self):
        m = PatternMatcher("a{2}", self.defines)
        assert [s for _, s, _ in m.find_matches(self.pdf, "past_last_row")] == [0, 2]

    def test_to_next_row_overlaps(self):
        m = PatternMatcher("a{2}", self.defines)
        assert [s for _, s, _ in m.find_matches(self.pdf, "to_next_row")] == [0, 1, 2]

    def test_to_last_symbol(self):
        m = PatternMatcher("a b+", {
            "a": lambda cur, prev: cur["ch"] == "a",
            "b": lambda cur, prev: cur["ch"] == "b",
        })
        pdf = pd.DataFrame({"ch": list("abbabb")})
        # skip to last b -> next attempt starts AT the last b of the match
        got = [s for _, s, _ in m.find_matches(pdf, ("to_last", "b"))]
        assert got == [0, 3]

    def test_skip_to_first_row_raises(self):
        m = PatternMatcher("a+", self.defines)
        with pytest.raises(ValueError):
            list(m.find_matches(self.pdf, ("to_first", "a")))


class TestCompile:
    def test_bad_tokens_raise(self):
        with pytest.raises(ValueError):
            compile_pattern("a ~ b")
        with pytest.raises(ValueError):
            compile_pattern("(a b")

    def test_bounded_quantifier_exact(self):
        m = PatternMatcher("a{3}", {"a": lambda c, p: c["ch"] == "a"})
        pdf = pd.DataFrame({"ch": list("aa")})
        assert list(m.find_matches(pdf)) == []


class TestSparkIntegration:
    def test_one_row_per_match_with_measures(self, spark):
        rows = [
            ("k1", i, v)
            for i, v in enumerate([1, 2, 3, 2, 1, 2, 5, 6])
        ] + [("k2", i, v) for i, v in enumerate([5, 4, 3])]
        df = spark.createDataFrame(rows, "k string, ord int, v int")
        up = lambda cur, prev: prev is not None and cur["v"] > prev["v"]
        out = match_recognize_general(
            df,
            partition_by=["k"],
            order_by=["ord"],
            pattern="up{2,}",
            defines={"up": up},
            mode="one",
            measures={
                "max_v": lambda fr, labs: int(fr["v"].max()),
            },
            measure_schema="max_v bigint",
        ).toPandas().sort_values(["k", "match_number"]).reset_index(drop=True)
        # k1: ups at idx1,2 (2,3) then idx5,6,7 (2,5,6) -> two matches
        assert list(out["k"]) == ["k1", "k1"]
        assert list(out["n_rows"]) == [2, 3]
        assert list(out["max_v"]) == [3, 6]

    def test_all_rows_per_match_classifier(self, spark):
        df = spark.createDataFrame(
            [("k", i, c) for i, c in enumerate("abba")], "k string, ord int, ch string"
        )
        out = match_recognize_general(
            df,
            partition_by=["k"],
            order_by=["ord"],
            pattern="a b+",
            defines={
                "a": lambda cur, prev: cur["ch"] == "a",
                "b": lambda cur, prev: cur["ch"] == "b",
            },
            mode="all",
        ).toPandas().sort_values("row_pos").reset_index(drop=True)
        assert list(out["classifier"]) == ["a", "b", "b"]
        assert list(out["row_pos"]) == [0, 1, 2]
        assert list(out["match_number"]) == [1, 1, 1]


class TestVectorizedDefines:
    def test_vectorized_equals_row_at_a_time(self):
        from trino_private_spark.operators.row_pattern import vectorized

        rng = random.Random(99)
        vals = [rng.randint(0, 9) for _ in range(200)]
        pdf = pd.DataFrame({"v": vals})
        row_defs = {
            "u": lambda cur, prev: prev is not None and cur["v"] > prev["v"],
            "d": lambda cur, prev: prev is not None and cur["v"] < prev["v"],
        }
        vec_defs = {
            "u": vectorized(lambda p: p["v"] > p["v"].shift(1)),
            "d": vectorized(lambda p: p["v"] < p["v"].shift(1)),
        }
        for pat in ("u{2,} | d{2,}", "u{3,5}", "u d u"):
            a = list(PatternMatcher(pat, row_defs).find_matches(pdf))
            b = list(PatternMatcher(pat, vec_defs).find_matches(pdf))
            assert a == b, pat

    def test_vectorized_spark_path(self, spark):
        from trino_private_spark.operators.row_pattern import (
            match_recognize_general,
            vectorized,
        )

        df = spark.createDataFrame(
            [("k", i, v) for i, v in enumerate([1, 2, 3, 1, 2, 3, 4])],
            "k string, ord int, v int",
        )
        out = match_recognize_general(
            df,
            partition_by=["k"],
            order_by=["ord"],
            pattern="up{2,}",
            defines={"up": vectorized(lambda p: p["v"] > p["v"].shift(1))},
            mode="one",
        ).toPandas()
        assert sorted(out["n_rows"]) == [2, 3]
