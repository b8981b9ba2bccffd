"""Property tests for the sketch/approx layer (error bounds, mergeability)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from trino_private_spark.catalog import load_table


@pytest.fixture(scope="module")
def orders(spark):
    return load_table(spark, SF_SMOKE, "orders")


def test_hll_estimate_error(spark, orders):
    from trino_private_spark.functions.sketches import (
        approx_set,
        hll_cardinality,
        merge_hll,
    )

    exact = orders.select("o_custkey").distinct().count()
    est = (
        orders.groupBy("o_orderstatus")
        .agg(approx_set("o_custkey").alias("sk"))
        .agg(merge_hll("sk").alias("m"))
        .select(hll_cardinality("m").alias("est"))
        .collect()[0]
        .est
    )
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_reservoir_sketch_quantile_bounds(spark, orders):
    from trino_private_spark.functions.sketches import reservoir_agg, sketch_quantile

    exact = orders.agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("m")
    ).collect()[0].m
    sk = reservoir_agg(orders.withColumn("g", F.lit("all")), "o_totalprice", ["g"])
    est = sk.select(sketch_quantile(F.col("sketch"), 0.5).alias("m")).collect()[0].m
    # reservoir of 4096 over ~1.5k rows at sf0.001 holds everything -> near-exact
    assert abs(est - exact) / exact < 0.05, (est, exact)


def test_reservoir_merge():
    from trino_private_spark.functions.sketches import ReservoirSketch

    a, b = ReservoirSketch(), ReservoirSketch()
    for i in range(1000):
        a.add(float(i))
    for i in range(1000, 2000):
        b.add(float(i))
    m = a.merge(b)
    assert m.n == 2000
    med = m.value_at_quantile(0.5)
    assert 800 <= med <= 1200, med


def test_setdigest_jaccard_accuracy(spark):
    from trino_private_spark.functions.sketches import jaccard_index, setdigest_agg

    # set A = 0..999, set B = 500..1499 -> exact J = 500/1500 = 1/3
    df = spark.range(0, 1000).select(
        F.lit("a").alias("g"), F.col("id").alias("v")
    ).union(
        spark.range(500, 1500).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    )
    sigs = df.groupBy("g").agg(setdigest_agg(F.col("v"), num_hashes=128).alias("sig"))
    a = sigs.where(F.col("g") == "a").select(F.col("sig").alias("sa"))
    b = sigs.where(F.col("g") == "b").select(F.col("sig").alias("sb"))
    j = (
        a.crossJoin(b)
        .select(jaccard_index(F.col("sa"), F.col("sb")).alias("j"))
        .collect()[0]
        .j
    )
    assert abs(j - 1 / 3) < 0.12, j  # binomial(128, 1/3) 3-sigma ≈ 0.125


def test_approx_most_frequent_matches_exact(spark, orders):
    from trino_private_spark.functions.sketches import approx_most_frequent

    got = approx_most_frequent(orders, "o_orderpriority", k=2).collect()
    exact = (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "o_orderpriority")
        .limit(2)
        .collect()
    )
    assert [(r.o_orderpriority, r.cnt) for r in got] == [
        (r.o_orderpriority, r.cnt) for r in exact
    ]


def test_intersection_cardinality(spark):
    from trino_private_spark.functions.sketches import (
        intersection_cardinality,
        setdigest_agg,
    )

    df = spark.range(0, 1000).select(
        F.lit("a").alias("g"), F.col("id").alias("v")
    ).union(
        spark.range(500, 1500).select(F.lit("b").alias("g"), F.col("id").alias("v"))
    )
    sigs = df.groupBy("g").agg(
        setdigest_agg(F.col("v"), num_hashes=128).alias("sig"),
        F.countDistinct("v").alias("card"),
    )
    a = sigs.where(F.col("g") == "a").select(
        F.col("sig").alias("sa"), F.col("card").alias("ca")
    )
    b = sigs.where(F.col("g") == "b").select(
        F.col("sig").alias("sb"), F.col("card").alias("cb")
    )
    est = (
        a.crossJoin(b)
        .select(
            intersection_cardinality(
                F.col("sa"), F.col("sb"), F.col("ca"), F.col("cb")
            ).alias("i")
        )
        .collect()[0]
        .i
    )
    assert 300 <= est <= 700, est  # exact = 500


def test_hash_counts(spark):
    from pyspark.sql import functions as F

    from trino_private_spark.functions.sketches import hash_counts

    df = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 5)], "g string, v long"
    )
    out = {
        r.g: dict(r.hc)
        for r in df.groupBy("g").agg(hash_counts(F.col("v")).alias("hc")).collect()
    }
    # 8 hash functions -> 8 entries; multiplicities are >=1 and bounded by
    # the group's row count; the duplicated value (1,1) must show count 2
    # wherever its hash attains the minimum
    assert len(out["a"]) == 8 and len(out["b"]) == 8
    assert set(out["b"].values()) == {1}
    assert all(1 <= c <= 2 for c in out["a"].values())
    assert 2 in out["a"].values()


class TestNumericHistogram:
    def test_merge_preserves_moments(self):
        import numpy as np

        from trino_private_spark.functions.sketches import NumericHistogram

        rng = np.random.RandomState(7)
        a, b = rng.normal(0, 1, 500), rng.normal(5, 2, 700)
        h1, h2 = NumericHistogram(12), NumericHistogram(12)
        h1.add_all(a)
        h2.add_all(b)
        h1.merge(h2)
        allv = np.concatenate([a, b])
        tw = h1.weights.sum()
        wm = float((h1.values * h1.weights).sum() / tw)
        assert len(h1.values) <= 12
        assert abs(tw - len(allv)) < 1e-9
        assert abs(wm - allv.mean()) < 1e-9
        assert h1.values.min() >= allv.min() - 1e-12
        assert h1.values.max() <= allv.max() + 1e-12

    def test_exact_under_capacity(self):
        from trino_private_spark.functions.sketches import NumericHistogram

        h = NumericHistogram(10)
        h.add_all([3.0, 1.0, 2.0, 1.0])
        assert h.buckets() == {1.0: 2.0, 2.0: 1.0, 3.0: 1.0}

    def test_greedy_merges_closest_pair(self):
        from trino_private_spark.functions.sketches import NumericHistogram

        h = NumericHistogram(3)
        h.add_all([0.0, 10.0, 10.1, 20.0])
        # 10.0 and 10.1 are the closest adjacent pair -> weighted midpoint
        assert sorted(h.buckets()) == [0.0, 10.05, 20.0]
        assert h.buckets()[10.05] == 2.0
