"""Geo layer: Bing-tile reference vectors (from the reference's
TestBingTileFunctions.java), disk-cover property, point-geometry subset, and
the tile-bucketed spatial join (brute-force equality + plan shape)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from trino_private_spark.functions import geo
from trino_private_spark.operators.spatial_join import distance_join


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_bing_tile_vectors(spark):
    """TestBingTileFunctions.java:72-98 vectors."""
    row = (
        spark.range(1)
        .select(
            geo.bing_tile_quadkey(geo.bing_tile(F.lit(3), F.lit(5), F.lit(3))).alias("a"),
            geo.bing_tile_quadkey(
                geo.bing_tile(F.lit(21845), F.lit(13506), F.lit(15))
            ).alias("b"),
            geo.bing_tile_coordinates(
                geo.bing_tile_at(F.lit(30.12), F.lit(60.0), F.lit(15))
            ).alias("c"),
            geo.bing_tile_coordinates(
                geo.bing_tile_at(F.lit(0.0), F.lit(-0.002), F.lit(1))
            ).alias("d"),
            geo.bing_tile_coordinates(
                geo.bing_tile_at(F.lit(1.0 / 512), F.lit(0.0), F.lit(9))
            ).alias("e"),
            geo.bing_tile_coordinates(geo.bing_tile(F.lit("123030123010121"))).alias("f"),
            geo.bing_tile_zoom_level(geo.bing_tile(F.lit("213"))).alias("z"),
        )
        .collect()[0]
    )
    assert row.a == "213"
    assert row.b == "123030123010121"
    assert (row.c.x, row.c.y) == (21845, 13506)
    assert (row.d.x, row.d.y) == (0, 1)
    assert (row.e.x, row.e.y) == (256, 255)
    assert (row.f.x, row.f.y) == (21845, 13506)
    assert row.z == 3


def test_great_circle_distance_vector(spark):
    """Trino docs example: BNA -> LAX = 2886.449 km."""
    km = one(
        spark,
        F.round(
            geo.great_circle_distance(
                F.lit(36.12), F.lit(-86.67), F.lit(33.94), F.lit(-118.40)
            ),
            3,
        ),
    )
    assert km == pytest.approx(2886.449, abs=1e-3)


def test_quadkey_roundtrip_identity(spark):
    """decode(encode) identity over a deterministic tile sample."""
    df = spark.range(500).select(
        (F.col("id") * 37 % 1024).cast("int").alias("x"),
        (F.col("id") * 91 % 1024).cast("int").alias("y"),
    )
    t = geo.bing_tile(F.col("x"), F.col("y"), F.lit(10))
    back = geo.bing_tile(geo.bing_tile_quadkey(t))
    bad = df.where(
        (geo.bing_tile_x(back) != F.col("x")) | (geo.bing_tile_y(back) != F.col("y"))
    ).count()
    assert bad == 0


def test_tiles_covering_radius_property(spark):
    """Every point within the radius lies in a tile of the cover: walk a
    ring of bearings at 0.9 * radius and check containment."""
    lat0, lon0, radius, zoom = 40.0, -74.0, 300.0, 8
    cover = set(
        one(
            spark,
            geo.tiles_covering_radius(
                F.lit(lat0), F.lit(lon0), F.lit(zoom), F.lit(radius)
            ),
        )
    )
    assert cover, "cover must not be empty"
    ring = spark.range(36).select(
        (F.col("id") * 10.0).alias("bearing")
    ).select(
        F.degrees(
            F.asin(
                F.sin(F.radians(F.lit(lat0))) * F.cos(F.lit(0.9 * radius / 6371.01))
                + F.cos(F.radians(F.lit(lat0)))
                * F.sin(F.lit(0.9 * radius / 6371.01))
                * F.cos(F.radians(F.col("bearing")))
            )
        ).alias("lat"),
        (
            F.lit(lon0)
            + F.degrees(
                F.atan2(
                    F.sin(F.radians(F.col("bearing")))
                    * F.sin(F.lit(0.9 * radius / 6371.01))
                    * F.cos(F.radians(F.lit(lat0))),
                    F.cos(F.lit(0.9 * radius / 6371.01))
                    - F.sin(F.radians(F.lit(lat0))) ** 2,
                )
            )
        ).alias("lon"),
    )
    pts = ring.select(
        geo.bing_tile_at(F.col("lat"), F.col("lon"), F.lit(zoom)).alias("t")
    ).collect()
    missing = [r.t for r in pts if r.t not in cover]
    assert not missing, f"tiles outside cover: {missing}"


def test_point_geometry_subset(spark):
    row = (
        spark.range(1)
        .select(
            geo.st_x(geo.st_point(F.lit(1.5), F.lit(-2.0))).alias("x"),
            geo.st_astext(geo.st_point(F.lit(1.0), F.lit(2.0))).alias("wkt"),
            geo.st_distance(
                geo.st_point(F.lit(0.0), F.lit(0.0)), geo.st_point(F.lit(3.0), F.lit(4.0))
            ).alias("d"),
            geo.st_x(geo.st_geometry_from_text(F.lit("POINT (-71.05 42.36)"))).alias("px"),
            geo.st_contains_envelope(
                F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(10.0),
                geo.st_point(F.lit(5.0), F.lit(5.0)),
            ).alias("inside"),
        )
        .collect()[0]
    )
    assert row.x == 1.5
    assert row.wkt == "POINT (1 2)"
    assert row.d == 5.0
    assert row.px == pytest.approx(-71.05)
    assert row.inside is True


def test_spatial_join_equals_bruteforce(spark):
    pts = spark.range(1, 400).select(
        F.col("id").alias("pid"),
        (F.col("id") % 1601 / 10.0 - 80.0).alias("lat"),
        (F.col("id") * 7 % 3600 / 10.0 - 180.0).alias("lon"),
    )
    hubs = spark.createDataFrame(
        [("a", 48.8566, 2.3522), ("b", -33.8688, 151.2093)],
        "hub string, hlat double, hlon double",
    )
    fast = distance_join(pts, hubs, "lat", "lon", "hlat", "hlon", 900.0, zoom=7)
    brute = (
        pts.crossJoin(hubs)
        .withColumn(
            "distance_km",
            geo.great_circle_distance(
                F.col("lat"), F.col("lon"), F.col("hlat"), F.col("hlon")
            ),
        )
        .where(F.col("distance_km") <= 900.0)
    )
    got = {(r.pid, r.hub) for r in fast.select("pid", "hub").collect()}
    want = {(r.pid, r.hub) for r in brute.select("pid", "hub").collect()}
    assert got == want


def test_spatial_join_plan_is_hash_join(spark):
    """The 100 TB contract: tile bucketing turns the radius join into a
    broadcast hash join on the tile key — never a nested loop."""
    from trino_private_spark.queries import all_probes

    df = all_probes()["p_spatial_join"].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan, plan


def test_envelope_to_bing_tiles(spark):
    """Envelope cover contains the tile of every interior sample point and
    nothing outside the envelope's tile bbox."""
    cover = one(
        spark,
        geo.envelope_to_bing_tiles(
            F.lit(40.0), F.lit(-75.0), F.lit(42.0), F.lit(-72.0), F.lit(8)
        ),
    )
    assert len(cover) == len(set(cover)) > 0
    inside = one(
        spark, geo.bing_tile_at(F.lit(41.0), F.lit(-73.5), F.lit(8))
    )
    assert inside in cover
    corner_nw = one(spark, geo.bing_tile_at(F.lit(42.0), F.lit(-75.0), F.lit(8)))
    corner_se = one(spark, geo.bing_tile_at(F.lit(40.0), F.lit(-72.0), F.lit(8)))
    assert corner_nw in cover and corner_se in cover


def test_encoded_polyline_google_vector_and_roundtrip(spark):
    """The spec's documented vector: [(38.5,-120.2),(40.7,-120.95),
    (43.252,-126.453)] <-> '_p~iF~ps|U_ulLnnqC_mqNvxq`@'; plus a
    DataFrame-level roundtrip on derived points.
    Ref: EncodedPolylineFunctions.java (from/to_encoded_polyline)."""
    from trino_private_spark.functions import polyline as pl

    vec = "_p~iF~ps|U_ulLnnqC_mqNvxq`@"
    assert pl.encode_points([(38.5, -120.2), (40.7, -120.95), (43.252, -126.453)]) == vec
    assert pl.decode_string(vec) == [(38.5, -120.2), (40.7, -120.95), (43.252, -126.453)]

    df = spark.range(1, 50).select(
        F.col("id").alias("pid"),
        pl.linestring(
            F.col("id") % 170 / 2.0 - 40.0,
            F.col("id") * 7 % 360 - 180.0,
            F.col("id") % 170 / 2.0 - 39.0,
            F.col("id") * 7 % 360 - 179.0,
        ).alias("line"),
    )
    rt = df.select(
        "pid",
        "line",
        pl.from_encoded_polyline(pl.to_encoded_polyline(F.col("line"))).alias("back"),
    )
    # 1e-5 fixed point: roundtrip exact for 5-decimal inputs
    bad = rt.where(
        F.exists(
            F.zip_with(
                F.col("line"),
                F.col("back"),
                lambda a, b: (F.abs(a["lat"] - b["lat"]) > 1e-9)
                | (F.abs(a["lon"] - b["lon"]) > 1e-9),
            ),
            lambda x: x,
        )
    ).count()
    assert bad == 0
