"""Mergeable t-digest (functions/tdigest.py): accuracy bounds, merge
associativity, serde round-trip, and the Spark two-phase aggregation path."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from trino_private_spark.functions.tdigest import TDigest, tdigest_agg, value_at_quantile


def rel_rank_error(values: np.ndarray, estimate: float, q: float) -> float:
    """|empirical rank of estimate - q|."""
    return abs((values <= estimate).mean() - q)


class TestKernel:
    def test_exact_on_small(self):
        td = TDigest().add([1.0, 2.0, 3.0, 4.0, 5.0])
        assert td.value_at_quantile(0.0) == 1.0
        assert td.value_at_quantile(1.0) == 5.0
        assert abs(td.value_at_quantile(0.5) - 3.0) <= 1.0

    def test_uniform_accuracy(self):
        rng = np.random.RandomState(7)
        vals = rng.uniform(0, 1000, 50_000)
        td = TDigest(delta=100).add(vals)
        for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
            assert rel_rank_error(vals, td.value_at_quantile(q), q) < 0.01, q

    def test_tail_accuracy_lognormal(self):
        rng = np.random.RandomState(11)
        vals = rng.lognormal(0, 2, 50_000)
        td = TDigest(delta=100).add(vals)
        # k1 scale function concentrates accuracy at the tails
        for q in (0.001, 0.01, 0.99, 0.999):
            assert rel_rank_error(vals, td.value_at_quantile(q), q) < 0.005, q

    def test_centroid_budget(self):
        vals = np.random.RandomState(3).normal(size=100_000)
        td = TDigest(delta=100).add(vals)
        td._compress()
        assert td.means.size < 2 * 100  # O(delta) state

    def test_merge_equals_single_build(self):
        rng = np.random.RandomState(5)
        a, b, c = (rng.exponential(10, 20_000) for _ in range(3))
        whole = np.concatenate([a, b, c])
        merged = TDigest().add(a).merge(TDigest().add(b)).merge(TDigest().add(c))
        for q in (0.05, 0.5, 0.95, 0.99):
            assert rel_rank_error(whole, merged.value_at_quantile(q), q) < 0.01, q

    def test_merge_order_insensitive_bounds(self):
        rng = np.random.RandomState(13)
        parts = [rng.normal(i, 1, 5_000) for i in range(4)]
        whole = np.concatenate(parts)
        d1 = TDigest()
        for p in parts:
            d1.merge(TDigest().add(p))
        d2 = TDigest()
        for p in reversed(parts):
            d2.merge(TDigest().add(p))
        for q in (0.1, 0.5, 0.9):
            assert abs(
                rel_rank_error(whole, d1.value_at_quantile(q), q)
            ) < 0.01
            assert abs(
                rel_rank_error(whole, d2.value_at_quantile(q), q)
            ) < 0.01

    def test_serde_roundtrip(self):
        vals = np.random.RandomState(1).gamma(2, 10, 10_000)
        td = TDigest(delta=150).add(vals)
        back = TDigest.deserialize(td.serialize())
        for q in (0.0, 0.25, 0.5, 0.75, 1.0):
            assert back.value_at_quantile(q) == td.value_at_quantile(q)
        assert back.delta == 150

    def test_empty_and_single(self):
        import math

        assert math.isnan(TDigest().value_at_quantile(0.5))
        assert TDigest().add([42.0]).value_at_quantile(0.99) == 42.0

    def test_nan_skipped(self):
        td = TDigest().add([1.0, float("nan"), 3.0])
        assert td.total_weight == 2.0

    def test_bad_quantile(self):
        with pytest.raises(ValueError):
            TDigest().add([1.0]).value_at_quantile(1.5)

    @settings(max_examples=25, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False),
            min_size=1,
            max_size=500,
        ),
        st.floats(0.0, 1.0),
    )
    def test_estimate_within_range(self, xs, q):
        td = TDigest().add(xs)
        est = td.value_at_quantile(q)
        assert min(xs) - 1e-9 <= est <= max(xs) + 1e-9


class TestSparkPath:
    def test_grouped_agg_matches_exact(self, spark):
        import pyspark.sql.functions as F

        rng = np.random.RandomState(21)
        rows = [
            (int(i % 3), float(v))
            for i, v in enumerate(rng.lognormal(1, 1, 30_000))
        ]
        df = spark.createDataFrame(rows, ["g", "v"]).repartition(8)
        sk = tdigest_agg(df, "v", ["g"], delta=100)
        got = {
            r.g: r.p50
            for r in sk.select(
                "g", value_at_quantile(F.col("tdigest"), 0.5).alias("p50")
            ).collect()
        }
        pdf = df.toPandas()
        for g in (0, 1, 2):
            vals = pdf[pdf.g == g].v.to_numpy()
            assert rel_rank_error(vals, got[g], 0.5) < 0.015

    def test_global_agg(self, spark):
        import pyspark.sql.functions as F

        df = spark.range(0, 20_000, 1, 8).select(
            (F.col("id") % 1000).cast("double").alias("v")
        )
        sk = tdigest_agg(df, "v", None, delta=100)
        rows = sk.select(
            value_at_quantile(F.col("tdigest"), 0.25).alias("p25")
        ).collect()
        assert len(rows) == 1
        assert abs(rows[0].p25 - 250) < 25

    def test_stored_sketches_remerge(self, spark):
        import pyspark.sql.functions as F
        from trino_private_spark.functions.tdigest import merge_tdigests

        rng = np.random.RandomState(31)
        rows = [
            (int(i % 4), int(i % 2), float(v))
            for i, v in enumerate(rng.uniform(0, 100, 20_000))
        ]
        df = spark.createDataFrame(rows, ["part", "g", "v"])
        # build per (part, g) sketches, store, then re-merge down to g
        per_part = tdigest_agg(df, "v", ["part", "g"], delta=100)
        remerged = merge_tdigests(per_part, "tdigest", ["g"])
        got = {
            r.g: r.p90
            for r in remerged.select(
                "g", value_at_quantile(F.col("tdigest"), 0.9).alias("p90")
            ).collect()
        }
        pdf = df.toPandas()
        for g in (0, 1):
            vals = pdf[pdf.g == g].v.to_numpy()
            assert rel_rank_error(vals, got[g], 0.9) < 0.015


class TestInverseQuery:
    def test_quantile_at_value_roundtrip(self):
        rng = np.random.RandomState(17)
        vals = rng.uniform(0, 1000, 30_000)
        td = TDigest(delta=100).add(vals)
        for q in (0.1, 0.25, 0.5, 0.75, 0.9):
            v = td.value_at_quantile(q)
            assert abs(td.quantile_at_value(v) - q) < 0.02, q

    def test_inverse_matches_empirical_rank(self):
        rng = np.random.RandomState(19)
        vals = rng.lognormal(0, 1, 30_000)
        td = TDigest(delta=100).add(vals)
        for v in (0.5, 1.0, 2.0, 5.0):
            est = td.quantile_at_value(v)
            truth = (vals <= v).mean()
            assert abs(est - truth) < 0.01, v

    def test_bounds(self):
        td = TDigest().add([1.0, 2.0, 3.0])
        assert td.quantile_at_value(0.0) == 0.0
        assert td.quantile_at_value(99.0) == 1.0

    def test_sql_registration(self, spark):
        import pyspark.sql.functions as F
        from trino_private_spark.functions import register_all
        from trino_private_spark.functions.tdigest import tdigest_agg

        register_all(spark)
        df = spark.range(0, 10000).select((F.col("id") % 100).cast("double").alias("v"))
        tdigest_agg(df, "v", None).createOrReplaceTempView("qav_sk")
        row = spark.sql(
            "SELECT quantile_at_value(tdigest, 50.0) q FROM qav_sk"
        ).collect()[0]
        assert abs(row.q - 0.505) < 0.02


class TestWeighted:
    def test_weighted_equals_repeated(self):
        import numpy as np

        from trino_private_spark.functions.tdigest import TDigest

        rng = np.random.default_rng(5)
        vals = rng.uniform(0, 1000, 5000)
        wts = rng.integers(1, 6, 5000)
        wd = TDigest().add_weighted(vals, wts.astype(float))
        repeated = np.repeat(vals, wts)
        repeated.sort()
        for q in (0.1, 0.5, 0.9):
            est = wd.value_at_quantile(q)
            rank = np.searchsorted(repeated, est) / len(repeated)
            assert abs(rank - q) < 0.02, q

    def test_weighted_skips_nonpositive_and_nan(self):
        import math

        from trino_private_spark.functions.tdigest import TDigest

        td = TDigest().add_weighted([1.0, 2.0, 3.0], [1.0, 0.0, math.nan])
        assert td.total_weight == 1.0
        assert td.value_at_quantile(0.5) == 1.0
