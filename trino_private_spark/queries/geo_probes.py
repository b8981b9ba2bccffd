"""Geospatial probes: Bing-tile bucketing, great-circle distance, and the
tile-bucketed spatial join (the reference's trino-geospatial plugin surface:
BingTileFunctions.java, GeoFunctions.java, SpatialJoinOperator.java).

Coordinates are derived deterministically from customer keys so the same
point set exists on both engines:
    lat = (c_custkey % 1601) / 10.0 - 80.0        in [-80.0, 80.0]
    lon = ((c_custkey * 7) % 3600) / 10.0 - 180.0 in [-180.0, 179.9]
Tile-x arithmetic is exact (no transcendentals); tile-y goes through
sin/ln where Spark (java.lang.Math) and DuckDB (libm) agree except within
1 ulp of a tile boundary — probability ~2^-30 per row, accepted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.functions.geo import (
    bing_tile_at,
    bing_tile_coordinates,
    bing_tile_quadkey,
    great_circle_distance,
)
from trino_private_spark.operators.spatial_join import distance_join
from trino_private_spark.queries import T, probe

_LAT = "(c_custkey % 1601) / 10.0 - 80.0"
_LON = "((c_custkey * 7) % 3600) / 10.0 - 180.0"


def _points(t) -> DataFrame:
    return t.customer.select(
        "c_custkey",
        (F.col("c_custkey") % 1601 / 10.0 - 80.0).alias("lat"),
        (F.col("c_custkey") * 7 % 3600 / 10.0 - 180.0).alias("lon"),
    )


def _quadkey_sql(x: str, y: str, zoom: int) -> str:
    """DuckDB replica of BingTile.toQuadKey: digit = xbit + 2*ybit, msb first."""
    digits = [
        f"chr(48 + CAST(({x} // {1 << (i - 1)}) % 2 + 2 * (({y} // {1 << (i - 1)}) % 2) AS INT))"
        for i in range(zoom, 0, -1)
    ]
    return "concat(" + ", ".join(digits) + ")"


@probe(
    "p_geo_tiles",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_LAT} AS lat, {_LON} AS lon
      FROM customer WHERE c_custkey <= 400),
    t AS (
      SELECT c_custkey,
        CAST(floor(least(greatest((lon + 180)/360 * 1048576.0, 0), 1048575)) AS BIGINT) // 256 AS tx,
        CAST(floor(least(greatest(
          (0.5 - ln((1 + sin(radians(lat))) / (1 - sin(radians(lat)))) / (4*pi())) * 1048576.0,
          0), 1048575)) AS BIGINT) // 256 AS ty
      FROM pts)
    SELECT c_custkey, tx, ty,
           tx * 268435456 + ty * 32 + 12 AS tile,
           {_quadkey_sql('tx', 'ty', 12)} AS quadkey
    FROM t ORDER BY c_custkey
    """,
    tags=("geo",),
)
def p_geo_tiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bing_tile_at + coordinates + encode + quadkey at zoom 12.
    Ref: BingTileFunctions.java:154 (bing_tile_at), BingTile.java:131,152."""
    t = T(spark, sf_dir)
    tile = bing_tile_at(F.col("lat"), F.col("lon"), F.lit(12))
    return (
        _points(t)
        .where(F.col("c_custkey") <= 400)
        .select(
            "c_custkey",
            bing_tile_coordinates(tile)["x"].cast("long").alias("tx"),
            bing_tile_coordinates(tile)["y"].cast("long").alias("ty"),
            tile.alias("tile"),
            bing_tile_quadkey(tile).alias("quadkey"),
        )
        .orderBy("c_custkey")
    )


@probe(
    "p_geo_distance",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_LAT} AS lat, {_LON} AS lon
      FROM customer WHERE c_custkey <= 500)
    SELECT c_custkey,
      ROUND(atan2(
        sqrt(pow(cos(radians(48.8566)) * sin(radians(lon) - radians(2.3522)), 2)
           + pow(cos(radians(lat)) * sin(radians(48.8566))
               - sin(radians(lat)) * cos(radians(48.8566)) * cos(radians(lon) - radians(2.3522)), 2)),
        sin(radians(lat)) * sin(radians(48.8566))
          + cos(radians(lat)) * cos(radians(48.8566)) * cos(radians(lon) - radians(2.3522))
      ) * 6371.01, 4) AS km
    FROM pts ORDER BY c_custkey
    """,
    tags=("geo",),
)
def p_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """great_circle_distance to a fixed point (Paris), km rounded to 4.
    Ref: GeoFunctions.java:1511. NOTE the oracle spells the identical atan2
    formula with (lat1,lon1) = the row point and (lat2,lon2) = Paris, and
    great_circle_distance is symmetric."""
    t = T(spark, sf_dir)
    return (
        _points(t)
        .where(F.col("c_custkey") <= 500)
        .select(
            "c_custkey",
            F.round(
                great_circle_distance(
                    F.col("lat"), F.col("lon"), F.lit(48.8566), F.lit(2.3522)
                ),
                4,
            ).alias("km"),
        )
        .orderBy("c_custkey")
    )


_HUBS = [
    ("paris", 48.8566, 2.3522),
    ("nyc", 40.7128, -74.0060),
    ("tokyo", 35.6762, 139.6503),
    ("sydney", -33.8688, 151.2093),
    ("saopaulo", -23.5505, -46.6333),
]

_HUBS_SQL = ", ".join(f"('{n}', {la}, {lo})" for n, la, lo in _HUBS)


@probe(
    "p_spatial_join",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_LAT} AS lat, {_LON} AS lon FROM customer),
    hubs(hub, hlat, hlon) AS (VALUES {_HUBS_SQL}),
    pairs AS (
      SELECT hub,
        atan2(
          sqrt(pow(cos(radians(hlat)) * sin(radians(lon) - radians(hlon)), 2)
             + pow(cos(radians(lat)) * sin(radians(hlat))
                 - sin(radians(lat)) * cos(radians(hlat)) * cos(radians(lon) - radians(hlon)), 2)),
          sin(radians(lat)) * sin(radians(hlat))
            + cos(radians(lat)) * cos(radians(hlat)) * cos(radians(lon) - radians(hlon))
        ) * 6371.01 AS km
      FROM pts CROSS JOIN hubs)
    SELECT hub, COUNT(*) AS n, ROUND(MIN(km), 3) AS nearest_km
    FROM pairs WHERE km <= 800.0
    GROUP BY hub ORDER BY hub
    """,
    tags=("geo",),
)
def p_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius spatial join via Bing-tile bucketing: customers within 800 km
    of each hub, as an equi-join on tile + residual distance filter — the
    SpatialJoinOperator / PagesRTreeIndex shape without a nested loop.
    Ref: operator/SpatialJoinOperator.java, plugin/trino-geospatial."""
    t = T(spark, sf_dir)
    hubs = spark.createDataFrame(_HUBS, "hub string, hlat double, hlon double")
    joined = distance_join(
        _points(t), hubs, "lat", "lon", "hlat", "hlon", radius_km=800.0, zoom=7
    )
    return (
        joined.groupBy("hub")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("distance_km"), 3).alias("nearest_km"),
        )
        .orderBy("hub")
    )


@probe(
    "p_kdb_spatial_join",
    oracle=f"""
    WITH pts AS (
      SELECT c_custkey, {_LAT} AS lat, {_LON} AS lon FROM customer),
    hubs AS (
      SELECT s_suppkey AS hub_id,
             (s_suppkey * 13 % 1201) / 10.0 - 60.0 AS hlat,
             (s_suppkey * 29 % 3600) / 10.0 - 180.0 AS hlon
      FROM supplier WHERE s_suppkey <= 40),
    pairs AS (
      SELECT hub_id,
        atan2(
          sqrt(pow(cos(radians(hlat)) * sin(radians(lon) - radians(hlon)), 2)
             + pow(cos(radians(lat)) * sin(radians(hlat))
                 - sin(radians(lat)) * cos(radians(hlat)) * cos(radians(lon) - radians(hlon)), 2)),
          sin(radians(lat)) * sin(radians(hlat))
            + cos(radians(lat)) * cos(radians(hlat)) * cos(radians(lon) - radians(hlon))
        ) * 6371.01 AS km
      FROM pts CROSS JOIN hubs)
    SELECT hub_id, COUNT(*) AS n, ROUND(MIN(km), 3) AS nearest_km
    FROM pairs WHERE km <= 600.0
    GROUP BY hub_id ORDER BY hub_id
    """,
    tags=("geo",),
)
def p_kdb_spatial_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-x-large radius join via KdbTree spatial partitioning
    (operators/spatial_partition.py): both sides shuffle once on the
    sampled-tree leaf id — no broadcast requirement, no nested loop.
    Ref: SpatialPartitioningAggregateFunction + KdbTree.java:272."""
    from trino_private_spark.operators.spatial_partition import kdb_distance_join

    t = T(spark, sf_dir)
    hubs = t.supplier.where(F.col("s_suppkey") <= 40).select(
        F.col("s_suppkey").alias("hub_id"),
        (F.col("s_suppkey") * 13 % 1201 / 10.0 - 60.0).alias("hlat"),
        (F.col("s_suppkey") * 29 % 3600 / 10.0 - 180.0).alias("hlon"),
    )
    joined = kdb_distance_join(
        _points(t), hubs, "lat", "lon", "hlat", "hlon",
        radius_km=600.0, max_per_leaf=8, sample_n=512,
    )
    return (
        joined.groupBy("hub_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("distance_km"), 3).alias("nearest_km"),
        )
        .orderBy("hub_id")
    )
