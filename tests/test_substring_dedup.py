"""Cross-document substring dedup (llm/substring_dedup.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_private_spark.llm.substring_dedup import (
    shared_spans,
    substring_drop_list,
    token_kgrams,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestKgrams:
    def test_positions_and_grams(self, spark):
        df = _docs(spark, [(1, "a b c d")])
        out = token_kgrams(df, k=3).orderBy("pos").collect()
        assert [(r["pos"], r["gram"]) for r in out] == [(1, "a b c"), (2, "b c d")]

    def test_short_doc_empty(self, spark):
        df = _docs(spark, [(1, "a b")])
        assert token_kgrams(df, k=3).count() == 0

    def test_jvm_only_plan(self, spark):
        df = _docs(spark, [(1, "a b c d")])
        plan = token_kgrams(df, k=3)._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan


class TestSharedSpans:
    def test_detects_maximal_span(self, spark):
        shared = "the quick brown fox jumps over the lazy dog tonight"
        df = _docs(
            spark,
            [
                (1, "intro words here " + shared + " tail one"),
                (2, "different lead " + shared + " other ending"),
                (3, "no overlap at all in this document body text"),
            ],
        )
        spans = shared_spans(df, k=5).collect()
        assert len(spans) == 1
        s = spans[0]
        # shared block is 10 tokens starting at position 4 in doc1, 3 in doc2
        assert (s["doc_a"], s["doc_b"]) == (1, 2)
        assert s["span_tokens"] == 10
        assert (s["a_start"], s["b_start"]) == (4, 3)

    def test_min_tokens_filters(self, spark):
        df = _docs(
            spark,
            [
                (1, "x1 x2 shared run of five tokens x3 x4"),
                (2, "y1 shared run of five tokens y2 y3 y4"),
            ],
        )
        assert shared_spans(df, k=5, min_tokens=5).count() == 1
        assert shared_spans(df, k=5, min_tokens=6).count() == 0

    def test_two_separate_spans_not_merged(self, spark):
        a = "alpha beta gamma delta epsilon"
        b = "one two three four five"
        df = _docs(
            spark,
            [
                (1, a + " BREAKA filler BREAKB " + b),
                (2, a + " OTHER1 middle OTHER2 " + b),
            ],
        )
        spans = shared_spans(df, k=5).orderBy("a_start").collect()
        assert [s["span_tokens"] for s in spans] == [5, 5]

    def test_hot_gram_capping(self, spark):
        common = "very common boilerplate phrase here"
        df = _docs(spark, [(i, f"doc{i} says " + common) for i in range(1, 6)])
        # gram appears in 5 docs; cap at 3 removes it entirely
        assert shared_spans(df, k=5).count() == 10  # all C(5,2) pairs
        assert shared_spans(df, k=5, max_gram_df=3).count() == 0

    def test_drop_list_keep_lowest(self, spark):
        shared = "s1 s2 s3 s4 s5 s6"
        df = _docs(
            spark,
            [(1, "a " + shared), (2, "b " + shared), (3, "c unique text body here now")],
        )
        spans = shared_spans(df, k=5)
        drops = {r["doc_id"] for r in substring_drop_list(spans).collect()}
        assert drops == {2}
