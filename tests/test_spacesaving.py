"""SpaceSaving heavy hitters (functions/spacesaving.py)."""

from __future__ import annotations

import random
from collections import Counter

import numpy as np

from trino_private_spark.functions.spacesaving import (
    SpaceSaving,
    approx_most_frequent_sketch,
)


def _zipf_stream(n=50_000, alpha=1.3, vocab=5_000, seed=9):
    rng = np.random.default_rng(seed)
    return [f"w{z}" for z in rng.zipf(alpha, n) if z <= vocab]


class TestInvariants:
    def test_overestimate_and_bound(self):
        stream = _zipf_stream()
        true = Counter(stream)
        sk = SpaceSaving(64).add_many(stream)
        n = len(stream)
        for key, est, err in sk.top_k(64):
            assert est >= true[key]
            assert est - true[key] <= n / 64 + 1
            assert err >= est - true[key] - 1e-9  # err upper-bounds the slack

    def test_heavy_hitters_retained(self):
        stream = _zipf_stream()
        true = Counter(stream)
        sk = SpaceSaving(64).add_many(stream)
        thresh = len(stream) / 64
        kept = {k for k, _, _ in sk.top_k(64)}
        for key, cnt in true.items():
            if cnt > thresh:
                assert key in kept, key

    def test_exact_when_under_capacity(self):
        stream = ["a"] * 5 + ["b"] * 3 + ["c"] * 2
        random.Random(1).shuffle(stream)
        sk = SpaceSaving(16).add_many(stream)
        assert sk.top_k(3) == [("a", 5, 0), ("b", 3, 0), ("c", 2, 0)]

    def test_merge_preserves_guarantees(self):
        stream = _zipf_stream(80_000)
        true = Counter(stream)
        shards = [stream[i::8] for i in range(8)]
        sks = [SpaceSaving(64).add_many(s) for s in shards]
        merged = SpaceSaving(64)
        for s in sks:
            merged.merge(SpaceSaving.deserialize(s.serialize()))
        assert merged.n == len(stream)
        n = len(stream)
        for key, est, err in merged.top_k(64):
            assert est >= true[key]  # overestimate survives the merge
        # top heavy hitters still found (threshold n/capacity)
        kept = {k for k, _, _ in merged.top_k(64)}
        for key, cnt in true.items():
            if cnt > n / 64:
                assert key in kept, key

    def test_deterministic_tie_break(self):
        sk = SpaceSaving(8).add_many(["x", "y", "x", "y", "z"])
        assert sk.top_k(3) == [("x", 2, 0), ("y", 2, 0), ("z", 1, 0)]


class TestSpark:
    def test_grouped_sketch(self, spark):
        import pandas as pd

        rng = np.random.default_rng(4)
        pdf = pd.DataFrame(
            {
                "g": np.repeat(["a", "b"], 10_000),
                "w": [f"t{z}" for z in rng.zipf(1.5, 20_000)],
            }
        )
        df = spark.createDataFrame(pdf)
        out = approx_most_frequent_sketch(df, "w", ["g"], buckets=5).toPandas()
        assert set(out["g"]) == {"a", "b"}
        assert (out.groupby("g")["rank"].max() == 5).all()
        # t1 dominates a zipf(1.5) stream — must be rank 1 in both groups
        top = out[out["rank"] == 1]
        assert (top["item"] == "t1").all()
        # estimates within the invariant bound of the true counts
        true = pdf.groupby(["g", "w"]).size()
        for _, r in out.iterrows():
            t = true.get((r["g"], r["item"]), 0)
            assert r["est"] >= t
            assert r["est"] - t <= 10_000 / 20 + 1  # n_group / capacity

    def test_global_sketch(self, spark):
        df = spark.createDataFrame(
            [(f"k{i % 7}",) for i in range(700)], "w string"
        )
        out = approx_most_frequent_sketch(df, "w", buckets=7).toPandas()
        assert len(out) == 7
        assert (out["est"] == 100).all()  # under capacity -> exact
        assert (out["err"] == 0).all()
