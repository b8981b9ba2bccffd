"""KdbTree spatial partitioning — the large-x-large spatial join path.

The reference plans distributed spatial joins by building a KD-B tree over a
sample of one side (lib/trino-geospatial-toolkit/.../KdbTree.java:272
buildKdbTree, SpatialPartitioningAggregateFunction), then routing each row
to the leaf (or leaves) its geometry touches and hash-exchanging both sides
on the leaf id (ExtractSpatialJoins + PlanFragmenter). Tile bucketing
(operators/spatial_join.py) is the fixed-grid variant; the KdbTree variant
adapts the grid to the DATA, so power-law point sets (cities, users) get
balanced partitions where a uniform grid would hot-spot.

Spark-first realization:
- sample ~1k build-side points to the driver (the same "plan-time sample"
  the reference's spatial_partitioning aggregation performs);
- build the alternating median-split tree in Python (split axis = wider
  extent, split at sample median, stop at max_per_leaf or max depth);
- COMPILE the tree into Column expressions: leaf assignment is a nested
  CASE descent (O(depth) comparisons, whole-stage codegen), and the
  probe-side disk cover is a filter over the literal array of leaf
  rectangles (O(leaves), still JVM-side, no Python in the hot path);
- equi-join both sides on leaf id + residual exact distance — a plain
  shuffled hash join: each side shuffles once by leaf, no broadcast
  needed, so BOTH sides may be arbitrarily large.

Leaf count ~ shuffle parallelism: 64-256 leaves feed a 1000-executor
cluster without per-partition skew because splits track the sampled
density. A leaf is never re-split at runtime — rows route deterministically
— so the join stays exactly-once per qualifying pair (build row -> exactly
one leaf; probe cover -> the distinct leaves its disk touches).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trino_private_spark.functions.geo import (
    great_circle_distance,
    radius_bbox,
)


@dataclass
class _Node:
    # leaf
    leaf_id: int = -1
    # internal
    by_x: bool = False          # split on lon (x) if True else lat (y)
    value: float = 0.0
    left: "_Node | None" = None  # < value
    right: "_Node | None" = None


@dataclass(frozen=True)
class _Leaf:
    leaf_id: int
    min_x: float
    min_y: float
    max_x: float
    max_y: float


class KdbPartitioner:
    """Data-adaptive 2-D partitioner over (lon, lat) points."""

    def __init__(self, points: list[tuple[float, float]], max_per_leaf: int):
        self._next_id = 0
        self.leaves: list[_Leaf] = []
        inf = float("inf")
        self.root = self._build(
            points, -inf, -inf, inf, inf, max_per_leaf, depth=0
        )

    def _build(self, pts, min_x, min_y, max_x, max_y, cap, depth) -> _Node:
        if len(pts) <= cap or depth >= 14:
            node = _Node(leaf_id=self._next_id)
            self.leaves.append(_Leaf(self._next_id, min_x, min_y, max_x, max_y))
            self._next_id += 1
            return node
        xs = sorted(p[0] for p in pts)
        ys = sorted(p[1] for p in pts)
        span_x = xs[-1] - xs[0]
        span_y = ys[-1] - ys[0]
        by_x = span_x >= span_y
        vals = xs if by_x else ys
        split = vals[len(vals) // 2]
        if split == vals[0]:  # degenerate sample: nudge past the min
            split = math.nextafter(split, float("inf"))
        axis = 0 if by_x else 1
        left_pts = [p for p in pts if p[axis] < split]
        right_pts = [p for p in pts if p[axis] >= split]
        if not left_pts or not right_pts:
            node = _Node(leaf_id=self._next_id)
            self.leaves.append(_Leaf(self._next_id, min_x, min_y, max_x, max_y))
            self._next_id += 1
            return node
        if by_x:
            left = self._build(left_pts, min_x, min_y, split, max_y, cap, depth + 1)
            right = self._build(right_pts, split, min_y, max_x, max_y, cap, depth + 1)
        else:
            left = self._build(left_pts, min_x, min_y, max_x, split, cap, depth + 1)
            right = self._build(right_pts, min_x, split, max_x, max_y, cap, depth + 1)
        return _Node(by_x=by_x, value=split, left=left, right=right)

    # --- compiled expressions ------------------------------------------

    def assign(self, lon: Column, lat: Column) -> Column:
        """Leaf id for a point: nested CASE descent, O(depth) comparisons."""

        def walk(node: _Node) -> Column:
            if node.left is None:
                return F.lit(node.leaf_id)
            probe = lon if node.by_x else lat
            return F.when(probe < F.lit(node.value), walk(node.left)).otherwise(
                walk(node.right)
            )

        return walk(self.root)

    def cover_ids(self, min_x: Column, min_y: Column, max_x: Column, max_y: Column) -> Column:
        """Array of leaf ids whose rectangle intersects the query bbox —
        a JVM-side filter over the literal leaf-rectangle array."""
        leaf_arr = F.array(
            *[
                F.struct(
                    F.lit(l.leaf_id).alias("id"),
                    F.lit(l.min_x).alias("ax"),
                    F.lit(l.min_y).alias("ay"),
                    F.lit(l.max_x).alias("bx"),
                    F.lit(l.max_y).alias("by"),
                )
                for l in self.leaves
            ]
        )
        hit = F.filter(
            leaf_arr,
            lambda l: (l["ax"] <= max_x)
            & (l["bx"] >= min_x)
            & (l["ay"] <= max_y)
            & (l["by"] >= min_y),
        )
        return F.transform(hit, lambda l: l["id"])


def sample_points(
    df: DataFrame, lat_col: str, lon_col: str, n: int = 1024
) -> list[tuple[float, float]]:
    """Plan-time sample (the spatial_partitioning aggregation's role)."""
    rows = (
        df.select(F.col(lon_col).alias("x"), F.col(lat_col).alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .limit(n * 8)
        .sample(fraction=1.0, seed=42)
        .limit(n)
        .collect()
    )
    return [(r.x, r.y) for r in rows]


def kdb_distance_join(
    probe: DataFrame,
    build: DataFrame,
    probe_lat: str,
    probe_lon: str,
    build_lat: str,
    build_lon: str,
    radius_km: float,
    max_per_leaf: int = 32,
    sample_n: int = 1024,
) -> DataFrame:
    """All (probe, build) pairs within radius_km via KdbTree partitioning.

    Both sides shuffle once on the leaf id (shuffled hash join) — neither
    side needs to fit in memory or broadcast. Output: probe columns +
    build columns + distance_km.
    """
    part = KdbPartitioner(
        sample_points(build, build_lat, build_lon, sample_n), max_per_leaf
    )
    b = build.withColumn(
        "__leaf", part.assign(F.col(build_lon), F.col(build_lat))
    )
    lat_c, lon_c = F.col(probe_lat), F.col(probe_lon)
    r = F.lit(radius_km)
    l_e, b_e, r_e, t_e = radius_bbox(lat_c, lon_c, r)
    # Pre-project the four bbox bounds into COLUMNS before the leaf-cover
    # HOF: filter/transform lambda bodies get no common-subexpression
    # elimination and run interpreted, so bounds left inline re-evaluate
    # their whole trig tree once PER LEAF ELEMENT per row (4 x n_leaves
    # evaluations). As attributes they compute once per row in the
    # codegen'd projection below; each is referenced 2-3x across the
    # antimeridian branches, which keeps CollapseProject from inlining
    # them back.
    p0 = probe.withColumns(
        {"__bb_l": l_e, "__bb_b": b_e, "__bb_r": r_e, "__bb_t": t_e}
    )
    left, bottom = F.col("__bb_l"), F.col("__bb_b")
    right, top = F.col("__bb_r"), F.col("__bb_t")
    # antimeridian wrap: a disk crossing +-180 covers two bboxes
    cover = F.when(
        left > right,
        F.array_union(
            part.cover_ids(left, bottom, F.lit(180.0), top),
            part.cover_ids(F.lit(-180.0), bottom, right, top),
        ),
    ).otherwise(part.cover_ids(left, bottom, right, top))
    p = p0.withColumn("__leaf", F.explode(cover)).drop(
        "__bb_l", "__bb_b", "__bb_r", "__bb_t"
    )
    dist = great_circle_distance(
        F.col(probe_lat), F.col(probe_lon), F.col(build_lat), F.col(build_lon)
    )
    return (
        p.join(b, on="__leaf", how="inner")
        .where(dist <= r)
        .drop("__leaf")
        .withColumn("distance_km", dist)
    )
