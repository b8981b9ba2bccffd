"""KLL quantile sketch (functions/kll.py) — the qdigest-family aggregate."""

from __future__ import annotations

import numpy as np
import pytest

from trino_private_spark.functions.kll import (
    KLL,
    kll_agg,
    kll_quantile_at_value,
    kll_value_at_quantile,
)


class TestKernel:
    def test_rank_error_uniform(self):
        rng = np.random.default_rng(7)
        data = rng.uniform(0, 1, 100_000)
        sk = KLL(200).add(data)
        data.sort()
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            est = sk.value_at_quantile(q)
            assert abs(np.searchsorted(data, est) / len(data) - q) < 0.02

    def test_rank_error_sorted_adversarial(self):
        sk = KLL(200).add(np.arange(100_000, dtype=float))
        for q in (0.1, 0.5, 0.9):
            assert abs(sk.value_at_quantile(q) / 100_000 - q) < 0.02

    def test_merge_equivalence(self):
        rng = np.random.default_rng(11)
        big = rng.normal(0, 1, 200_000)
        shards = [KLL(200).add(big[i * 10_000 : (i + 1) * 10_000]) for i in range(20)]
        merged = KLL(200)
        for s in shards:
            merged.merge(KLL.deserialize(s.serialize()))
        assert merged.n == 200_000
        srt = np.sort(big)
        for q in (0.05, 0.5, 0.95):
            est = merged.value_at_quantile(q)
            assert abs(np.searchsorted(srt, est) / len(srt) - q) < 0.02

    def test_bounded_size(self):
        sk = KLL(200).add(np.arange(1_000_000, dtype=float))
        assert sk.retained() < 1200  # O(k) items regardless of n

    def test_quantile_at_value_inverse(self):
        sk = KLL(200).add(np.arange(50_000, dtype=float))
        assert abs(sk.quantile_at_value(25_000.0) - 0.5) < 0.02
        assert sk.quantile_at_value(-1.0) == 0.0
        assert sk.quantile_at_value(1e12) == 1.0

    def test_determinism(self):
        a = KLL(200).add(np.arange(30_000, dtype=float))
        b = KLL(200).add(np.arange(30_000, dtype=float))
        assert a.value_at_quantile(0.37) == b.value_at_quantile(0.37)

    def test_empty_and_nan(self):
        sk = KLL(200)
        assert sk.value_at_quantile(0.5) is None
        sk.add([float("nan"), 1.0])
        assert sk.n == 1
        assert sk.value_at_quantile(0.5) == 1.0

    def test_serialize_roundtrip(self):
        sk = KLL(128).add(np.arange(10_000, dtype=float))
        rt = KLL.deserialize(sk.serialize())
        assert rt.n == sk.n and rt.k == sk.k
        assert rt.value_at_quantile(0.5) == sk.value_at_quantile(0.5)


class TestSpark:
    def test_grouped_agg_and_extract(self, spark):
        import pandas as pd

        rng = np.random.default_rng(3)
        pdf = pd.DataFrame(
            {
                "g": np.repeat(["a", "b"], 20_000),
                "v": np.concatenate(
                    [rng.uniform(0, 100, 20_000), rng.uniform(1000, 2000, 20_000)]
                ),
            }
        )
        df = spark.createDataFrame(pdf)
        sk = kll_agg(df, "v", ["g"])
        out = (
            sk.select(
                "g",
                kll_value_at_quantile(sk["kll"], 0.5).alias("p50"),
                kll_quantile_at_value(sk["kll"], 50.0).alias("r50"),
            )
            .orderBy("g")
            .collect()
        )
        assert abs(out[0]["p50"] - 50.0) < 5.0
        assert abs(out[0]["r50"] - 0.5) < 0.02
        assert abs(out[1]["p50"] - 1500.0) < 50.0
        assert out[1]["r50"] == 0.0  # 50 below everything in group b

    def test_global_agg(self, spark):
        df = spark.range(0, 100_000).selectExpr("cast(id as double) v")
        sk = kll_agg(df, "v")
        row = sk.select(kll_value_at_quantile(sk["kll"], 0.9).alias("p90")).head()
        assert abs(row["p90"] / 100_000 - 0.9) < 0.02
