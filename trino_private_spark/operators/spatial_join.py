"""Tile-bucketed spatial join — the SpatialJoinOperator shape, Spark-first.

The reference executes spatial predicate joins by building an R-tree over
one side and probing it per row (operator/SpatialJoinOperator.java,
PagesRTreeIndex.java), optionally pre-partitioned by a KdbTree
(SpatialPartitioningAggregateFunction). On Spark the same join becomes an
EQUI-join on a space-filling bucket key:

- build side (typically the smaller point set / the "hubs"): one Bing tile
  per row at a chosen zoom (``bing_tile_at``);
- probe side: the array of tiles covering the predicate region (for a
  radius predicate: ``tiles_covering_radius``), exploded;
- equi-join on the encoded tile + residual exact predicate
  (``great_circle_distance <= radius``).

Because the build row maps to exactly ONE tile and the probe cover contains
every tile the disk touches, each qualifying pair joins exactly once — no
dedup pass. The plan is a plain hash join (broadcast when the build side is
small), never a nested loop: at 100 TB the probe side shuffles by tile key
only, and tile cardinality (4^zoom) gives uniform buckets that AQE can
coalesce or split. Zoom picks the bucket granularity: higher zoom = more,
smaller buckets (more probe-side row expansion), lower zoom = fewer buckets
(more residual-filter work). zoom 8-12 suits radii of 10-500 km.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trino_private_spark.functions.geo import (
    bing_tile_at,
    great_circle_distance,
)


def distance_join(
    probe: DataFrame,
    build: DataFrame,
    probe_lat: str,
    probe_lon: str,
    build_lat: str,
    build_lon: str,
    radius_km: float,
    zoom: int = 10,
    broadcast_build: bool = True,
) -> DataFrame:
    """All (probe, build) pairs within radius_km, with a distance_km column.

    Output columns: every probe column, every build column, distance_km.
    Column names must not collide across the two inputs.
    """
    from trino_private_spark.functions.geo import (
        bing_tile,
        latitude_to_tile_y,
        longitude_to_tile_x,
        radius_bbox,
    )

    z = F.lit(zoom)
    lat_c, lon_c, r = F.col(probe_lat), F.col(probe_lon), F.lit(radius_km)
    # Probe cover = the full tile RECTANGLE of the disk's bbox, exploded as
    # two integer sequences. tiles_covering_radius additionally trims the
    # rectangle's corners with a per-tile great-circle test, but inside one
    # WholeStageCodegen span that predicate (no common-subexpression
    # elimination in FilterExec) compiles to a method too large for the
    # JIT and runs ~13x slower than the rest of the stage combined
    # (measured: cover 3.3 s -> 0.2 s at sf0.01). Corner tiles only create
    # candidate pairs that the exact residual distance filter below drops,
    # so the join result is identical; the extra candidates are bounded by
    # the rect/disk area ratio (-> 4/pi as tiles shrink relative to the
    # radius).
    # shared bbox-bounds helper (functions/geo.radius_bbox); the wrapped
    # left > right antimeridian case is documented there — this rectangle
    # cover does not split it (pre-existing limitation)
    l_e, b_e, r_e, t_e = radius_bbox(lat_c, lon_c, r)
    top = latitude_to_tile_y(t_e, z)
    bottom = latitude_to_tile_y(b_e, z)
    left = longitude_to_tile_x(l_e, z)
    right = longitude_to_tile_x(r_e, z)
    p = (
        probe.withColumn("__tx", F.explode(F.sequence(left, right)))
        .withColumn("__ty", F.explode(F.sequence(top, bottom)))
        .withColumn("__tile", bing_tile(F.col("__tx"), F.col("__ty"), z))
        .drop("__tx", "__ty")
    )
    b = build.withColumn(
        "__tile", bing_tile_at(F.col(build_lat), F.col(build_lon), z)
    )
    if broadcast_build:
        b = F.broadcast(b)
    dist = great_circle_distance(
        F.col(probe_lat), F.col(probe_lon), F.col(build_lat), F.col(build_lon)
    )
    return (
        p.join(b, on="__tile", how="inner")
        .where(dist <= F.lit(radius_km))
        .drop("__tile")
        .withColumn("distance_km", dist)
    )


def within_distance(
    probe: DataFrame,
    build: DataFrame,
    probe_lat: str,
    probe_lon: str,
    build_lat: str,
    build_lon: str,
    radius_km: float,
    zoom: int = 10,
) -> DataFrame:
    """Semi-join form: probe rows having ANY build point within radius_km."""
    joined = distance_join(
        probe, build.select(build_lat, build_lon), probe_lat, probe_lon,
        build_lat, build_lon, radius_km, zoom,
    )
    return joined.select(probe.columns).dropDuplicates(probe.columns)
