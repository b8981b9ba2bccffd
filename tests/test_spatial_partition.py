"""KdbTree spatial partitioning: routing totality, balance on skewed data,
brute-force join equality (incl. antimeridian wrap), and the shuffled-hash
large-x-large plan (no broadcast requirement, no nested loop)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_private_spark.functions.geo import great_circle_distance
from trino_private_spark.operators.spatial_partition import (
    KdbPartitioner,
    kdb_distance_join,
    sample_points,
)


def _pts(spark, n=2000, skew=False):
    df = spark.range(1, n + 1).select(
        F.col("id").alias("pid"),
        (F.col("id") % 1601 / 10.0 - 80.0).alias("lat"),
        (F.col("id") * 7 % 3600 / 10.0 - 180.0).alias("lon"),
    )
    if skew:
        # 80% of points collapse into a 2x2-degree hot spot (city skew)
        df = df.select(
            "pid",
            F.when(F.col("pid") % 5 != 0, F.col("pid") % 20 / 10.0 + 48.0)
            .otherwise(F.col("lat"))
            .alias("lat"),
            F.when(F.col("pid") % 5 != 0, F.col("pid") % 21 / 10.0 + 2.0)
            .otherwise(F.col("lon"))
            .alias("lon"),
        )
    return df


def test_every_point_routes_to_exactly_one_leaf(spark):
    pts = _pts(spark)
    part = KdbPartitioner(sample_points(pts, "lat", "lon"), max_per_leaf=64)
    ids = pts.select(
        part.assign(F.col("lon"), F.col("lat")).alias("leaf")
    )
    assert ids.where(F.col("leaf").isNull()).count() == 0
    n_leaves = len(part.leaves)
    used = ids.distinct().count()
    assert n_leaves >= 8, f"expected a real tree, got {n_leaves} leaves"
    assert used <= n_leaves


def test_partitions_balanced_under_skew(spark):
    """The adaptive split must keep the hot spot spread over many leaves:
    no leaf may hold more than ~6x the ideal share of a skewed point set
    (a fixed uniform grid would put 80% of rows in one cell)."""
    pts = _pts(spark, skew=True)
    part = KdbPartitioner(sample_points(pts, "lat", "lon"), max_per_leaf=32)
    counts = (
        pts.select(part.assign(F.col("lon"), F.col("lat")).alias("leaf"))
        .groupBy("leaf")
        .count()
        .collect()
    )
    total = sum(r["count"] for r in counts)
    ideal = total / len(part.leaves)
    worst = max(r["count"] for r in counts)
    assert worst <= 6 * ideal, (worst, ideal, len(part.leaves))


def test_kdb_join_equals_bruteforce(spark):
    pts = _pts(spark, 600)
    hubs = spark.createDataFrame(
        [
            ("a", 48.8566, 2.3522),
            ("b", -33.8688, 151.2093),
            ("fiji", -17.7, 179.9),  # antimeridian neighborhood
        ],
        "hub string, hlat double, hlon double",
    )
    fast = kdb_distance_join(
        pts, hubs, "lat", "lon", "hlat", "hlon", 1200.0, max_per_leaf=16
    )
    brute = (
        pts.crossJoin(hubs)
        .withColumn(
            "distance_km",
            great_circle_distance(
                F.col("lat"), F.col("lon"), F.col("hlat"), F.col("hlon")
            ),
        )
        .where(F.col("distance_km") <= 1200.0)
    )
    got = {(r.pid, r.hub) for r in fast.select("pid", "hub").collect()}
    want = {(r.pid, r.hub) for r in brute.select("pid", "hub").collect()}
    assert got == want
    assert any(h == "fiji" for _, h in want), "fixture must exercise the wrap"


def test_kdb_join_is_hash_join_without_broadcast(spark):
    """Large-x-large contract: with broadcast disabled the plan must still
    be a hash/sort-merge join on the leaf key — never a nested loop."""
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pts = _pts(spark, 500)
        hubs = spark.range(1, 201).select(
            F.concat(F.lit("h"), F.col("id")).alias("hub"),
            (F.col("id") % 1201 / 10.0 - 60.0).alias("hlat"),
            (F.col("id") * 11 % 3600 / 10.0 - 180.0).alias("hlon"),
        )
        df = kdb_distance_join(
            pts, hubs, "lat", "lon", "hlat", "hlon", 500.0, max_per_leaf=16
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert ("ShuffledHashJoin" in plan) or ("SortMergeJoin" in plan), plan
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
