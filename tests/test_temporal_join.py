"""as-of / range join operator semantics (operators/temporal_join.py):
checked against naive theta-join formulations of the same predicate — the
plan the reference would run (NestedLoopJoin) — plus the plan-shape claims
(no join node for asof; hash join, never nested-loop, for range)."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_private_spark.operators.temporal_join import asof_join, range_join_points
from trino_private_spark.plans.explain import explain_str


def _asof_fixtures(spark):
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 20, "l2"), (1, 5, "l0"), (2, 7, "l3"), (3, 9, "l4")],
        "k long, t long, lbl string",
    )
    right = spark.createDataFrame(
        [(1, 8, 100.0), (1, 15, 200.0), (1, 20, 300.0), (2, 9, 400.0)],
        "k long, rt long, v double",
    )
    return left, right


def test_asof_join_backward_inclusive(spark):
    left, right = _asof_fixtures(spark)
    out = asof_join(left, right, ["k"], "t", "rt", ["v"])
    got = {r.lbl: r.v for r in out.collect()}
    assert got == {
        "l0": None,    # nothing at or before t=5
        "l1": 100.0,   # rt=8 <= 10
        "l2": 300.0,   # tie rt=20 == t=20 matches (inclusive)
        "l3": None,    # right rt=9 > 7
        "l4": None,    # key 3 has no rights
    }


def test_asof_join_matches_naive_theta_join(spark):
    left, right = _asof_fixtures(spark)
    out = asof_join(left, right, ["k"], "t", "rt", ["v"], matched_ts_col="mt")
    naive = (
        left.join(right, (left.k == right.k) & (right.rt <= left.t), "left")
        .groupBy(left.k, "t", "lbl")
        .agg(F.max_by("v", "rt").alias("v"), F.max("rt").alias("mt"))
    )
    a = {(r.lbl): (r.v, r.mt) for r in out.collect()}
    b = {(r.lbl): (r.v, r.mt) for r in naive.collect()}
    assert a == b


def test_asof_join_tolerance(spark):
    left, right = _asof_fixtures(spark)
    out = asof_join(left, right, ["k"], "t", "rt", ["v"], tolerance=2)
    got = {r.lbl: r.v for r in out.collect()}
    # l1 gap = 10-8 = 2 (kept); everything else unchanged except no new matches
    assert got["l1"] == 100.0 and got["l2"] == 300.0
    out1 = asof_join(left, right, ["k"], "t", "rt", ["v"], tolerance=1)
    got1 = {r.lbl: r.v for r in out1.collect()}
    assert got1["l1"] is None  # gap 2 > tolerance 1


def test_asof_join_plan_has_no_join_node(spark):
    left, right = _asof_fixtures(spark)
    plan = explain_str(asof_join(left, right, ["k"], "t", "rt", ["v"]))
    assert "Join" not in plan, plan  # union+window: one shuffle, zero joins
    assert "Window" in plan


def test_range_join_points_semantics(spark):
    points = spark.createDataFrame(
        [(1, 5.0), (2, 15.0), (3, 25.0), (4, 999.0)], "pid long, p double"
    )
    intervals = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 4.0, 16.0), (30, 24.0, 24.5)],
        "iid long, s double, e double",
    )
    out = range_join_points(points, intervals, "p", "s", "e", bin_width=8.0)
    got = sorted((r.pid, r.iid) for r in out.collect())
    naive = points.join(
        intervals, (F.col("s") <= F.col("p")) & (F.col("p") <= F.col("e"))
    )
    exp = sorted((r.pid, r.iid) for r in naive.collect())
    assert got == exp == [(1, 10), (1, 20), (2, 20)]


def test_range_join_keyed_and_plan(spark):
    points = spark.createDataFrame(
        [("a", 1, 5.0), ("b", 2, 5.0)], "g string, pid long, p double"
    )
    intervals = spark.createDataFrame(
        [("a", 10, 0.0, 10.0), ("b", 20, 6.0, 10.0)],
        "g string, iid long, s double, e double",
    )
    out = range_join_points(points, intervals, "p", "s", "e", 4.0, keys=["g"])
    assert sorted((r.pid, r.iid) for r in out.collect()) == [(1, 10)]
    plan = explain_str(out)
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
