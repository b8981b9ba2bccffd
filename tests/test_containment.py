"""Asymmetric containment dedup + boilerplate fraction
(llm/containment.py; LSH-Ensemble shape per Zhu et al. VLDB 2016)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trino_private_spark.llm.containment import (
    boilerplate_fraction,
    containment_candidates_lsh,
    containment_pairs,
)


@pytest.fixture(scope="module")
def docs(spark):
    small = "alpha beta gamma delta epsilon zeta"
    big = (
        "intro words here now " + small + " and then a very long tail "
        + " ".join(f"w{i} x{i} y{i}" for i in range(40))
    )
    other = "completely different content with no overlap at all truly"
    return spark.createDataFrame(
        [(1, small), (2, big), (3, other)], "doc_id long, text string"
    )


class TestExactContainment:
    def test_small_in_large_found_both_not_jaccard(self, spark, docs):
        got = {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(docs, threshold=0.5).collect()
        }
        # small (4 shingles) fully inside big -> containment 1.0
        assert got[(1, 2)] == 1.0
        # big -> small direction is far below threshold
        assert (2, 1) not in got
        # Jaccard for the same pair is tiny — resemblance misses it
        from trino_private_spark.llm.dedup import ngram_jaccard_pairs

        jac = {
            (r.doc_a, r.doc_b): r.jaccard
            for r in ngram_jaccard_pairs(docs, threshold=0.0001).collect()
        }
        assert jac[(1, 2)] < 0.05

    def test_asymmetric_rows_and_threshold(self, spark, docs):
        all_pairs = {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(docs, threshold=0.0001).collect()
        }
        assert all_pairs[(1, 2)] == 1.0
        assert 0 < all_pairs[(2, 1)] < 0.05
        assert (3, 1) not in all_pairs  # no shared shingle at all

    def test_df_cap_drops_hot_shingles(self, spark):
        # the same boilerplate shingle in every doc: with a df cap it
        # contributes nothing, so no pair reaches the threshold
        boiler = "terms of service apply here"
        df = spark.createDataFrame(
            [(i, boiler + f" unique{i} only{i} words{i}") for i in range(5)],
            "doc_id long, text string",
        )
        no_cap = containment_pairs(df, threshold=0.5).count()
        capped = containment_pairs(
            df, threshold=0.5, max_shingle_df=2
        ).count()
        assert no_cap > 0 and capped == 0


class TestLshCandidates:
    def test_recall_on_contained_pair(self, spark, docs):
        cand = {
            (r.doc_a, r.doc_b)
            for r in containment_candidates_lsh(docs, threshold=0.5).collect()
        }
        assert (1, 2) in cand

    def test_size_bound_prunes_reverse_direction(self, spark, docs):
        # containment(big -> small) >= 0.5 needs |small| >= 0.5|big|,
        # false here, so the reverse pair must be pruned by the bound
        cand = {
            (r.doc_a, r.doc_b)
            for r in containment_candidates_lsh(docs, threshold=0.5).collect()
        }
        assert (2, 1) not in cand

    def test_recall_equals_one_vs_exact(self, spark):
        import random

        rnd = random.Random(7)
        words = [f"tok{i}" for i in range(50)]
        rows = []
        for i in range(30):
            body = " ".join(rnd.choices(words, k=rnd.randint(6, 30)))
            rows.append((i, body))
            if i % 3 == 0:  # embed doc i inside a longer doc
                rows.append(
                    (1000 + i, body + " padding " + " ".join(
                        rnd.choices(words, k=20)
                    ))
                )
        df = spark.createDataFrame(rows, "doc_id long, text string")
        exact = containment_pairs(df, threshold=0.6).select(
            "doc_a", "doc_b"
        )
        cand = containment_candidates_lsh(df, threshold=0.6)
        assert exact.join(cand, ["doc_a", "doc_b"], "left_anti").count() == 0


class TestBoilerplate:
    def test_fractions_exact(self, spark):
        df = spark.createDataFrame(
            [
                (1, "a b c d"),        # shingles: {a b c, b c d}
                (2, "a b c x"),        # shingles: {a b c, b c x}
                (3, "q r s t"),        # disjoint
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_shingles, r.n_shared, r.boilerplate)
            for r in boilerplate_fraction(df).collect()
        }
        assert got[1] == (2, 1, 0.5)
        assert got[2] == (2, 1, 0.5)
        assert got[3] == (2, 0, 0.0)

    def test_short_docs_absent(self, spark):
        df = spark.createDataFrame(
            [(1, "one two"), (2, "a b c d e")], "doc_id long, text string"
        )
        ids = {r.doc_id for r in boilerplate_fraction(df).collect()}
        assert ids == {2}  # doc 1 has no 3-gram shingles


class TestCandidateScopedVerify:
    def test_verified_equals_exact(self, spark, docs):
        cand = containment_candidates_lsh(docs, threshold=0.5)
        verified = {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(
                docs, threshold=0.5, candidates=cand
            ).collect()
        }
        exact = {
            (r.doc_a, r.doc_b): r.containment
            for r in containment_pairs(docs, threshold=0.5).collect()
        }
        assert verified == exact

    def test_candidates_scope_the_comparison(self, spark, docs):
        # restricting to an explicit pair list computes ONLY those pairs
        cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
        got = containment_pairs(
            docs, threshold=0.0001, candidates=cand
        ).collect()
        assert [(r.doc_a, r.doc_b) for r in got] == [(1, 2)]
        assert got[0].containment == 1.0

    def test_default_df_cap_survives_corpus_wide_boilerplate(self, spark):
        # a licence block shared by EVERY document: the default cap keeps
        # the exact path away from the quadratic self-join blowup and
        # (with distinct suffixes) yields no spurious pairs
        licence = "this work is licensed under the terms of the license"
        n = 60
        df = spark.createDataFrame(
            [
                (i, licence + f" body{i} text{i} unique{i} tail{i}")
                for i in range(n)
            ],
            "doc_id long, text string",
        )
        out = containment_pairs(df, threshold=0.9, max_shingle_df=10)
        assert out.count() == 0
        # and the DEFAULT cap (10k) leaves small corpora untouched
        from trino_private_spark.llm.containment import (
            DEFAULT_MAX_SHINGLE_DF,
        )

        assert DEFAULT_MAX_SHINGLE_DF == 10_000
