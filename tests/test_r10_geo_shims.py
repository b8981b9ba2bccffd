"""SQL-text geo shims == DataFrame-API builders (round 10: the
Bing-tile / point family became SQL-callable via JVM-inlined SQL UDF
transcriptions of functions/geo.py — this suite pins exact equivalence
including web-mercator edge latitudes, zoom extremes, quadkey
round-trips, and the WKT point plane)."""

import random

import pytest
from pyspark.sql import functions as F

from trino_private_spark.api import Engine
from trino_private_spark.functions import geo


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


EDGE_CASES = [
    (47.6, -122.3, 10),
    (85.05, 179.9, 23),
    (-85.05, -179.9, 23),
    (0.0, 0.0, 0),
    (85.05112878, 180.0, 1),   # MAX_LATITUDE / date line
    (-85.05112878, -180.0, 1),
]
_rnd = random.Random(42)
RANDOM_CASES = [
    (_rnd.uniform(-85, 85), _rnd.uniform(-180, 180), _rnd.randint(0, 23))
    for _ in range(8)
]


class TestTileShimEquivalence:
    @pytest.mark.parametrize("lat,lon,z", EDGE_CASES + RANDOM_CASES)
    def test_bing_tile_at_matches_builder(self, eng, spark, lat, lon, z):
        got = eng.sql(
            f"SELECT bing_tile_at({lat!r}, {lon!r}, {z}) AS t"
        ).collect()[0]["t"]
        want = spark.range(1).select(
            geo.bing_tile_at(F.lit(lat), F.lit(lon), F.lit(z)).alias("t")
        ).collect()[0]["t"]
        assert got == want

    @pytest.mark.parametrize("lat,lon,z", EDGE_CASES)
    def test_bing_tiles_around_matches_builder(self, eng, spark, lat, lon, z):
        got = eng.sql(
            f"SELECT sort_array(bing_tiles_around({lat!r}, {lon!r}, {z})) "
            "AS a"
        ).collect()[0]["a"]
        want = sorted(
            spark.range(1).select(
                geo.bing_tiles_around(
                    F.lit(lat), F.lit(lon), F.lit(z)
                ).alias("a")
            ).collect()[0]["a"]
        )
        assert list(got) == list(want)

    def test_quadkey_roundtrip_and_polygon(self, eng, spark):
        rnd = random.Random(7)
        for _ in range(6):
            z = rnd.randint(1, 23)
            x = rnd.randint(0, 2 ** z - 1)
            y = rnd.randint(0, 2 ** z - 1)
            t = x * (1 << 28) + y * 32 + z
            row = eng.sql(
                f"SELECT bing_tile_quadkey({t}) AS q, "
                f"bing_tile(bing_tile_quadkey({t})) AS rt, "
                f"bing_tile_polygon({t}) AS pg"
            ).collect()[0]
            b = spark.range(1).select(
                geo.bing_tile_quadkey(F.lit(t)).alias("q"),
                geo.bing_tile_polygon(F.lit(t)).alias("pg"),
            ).collect()[0]
            assert row["q"] == b["q"]
            assert row["rt"] == t  # decode(encode(t)) == t
            assert row["pg"] == b["pg"]

    def test_great_circle_matches_builder(self, eng, spark):
        rnd = random.Random(3)
        for _ in range(8):
            a, b2, c, d = (
                rnd.uniform(-89, 89), rnd.uniform(-180, 180),
                rnd.uniform(-89, 89), rnd.uniform(-180, 180),
            )
            got = eng.sql(
                f"SELECT great_circle_distance({a!r}, {b2!r}, {c!r}, {d!r}) "
                "AS g"
            ).collect()[0]["g"]
            want = spark.range(1).select(
                geo.great_circle_distance(
                    F.lit(a), F.lit(b2), F.lit(c), F.lit(d)
                ).alias("g")
            ).collect()[0]["g"]
            assert abs(got - want) < 1e-9

    def test_wkt_point_plane(self, eng):
        r = eng.sql(
            "SELECT st_distance('POINT (3 4)', 'POINT (0 0)') AS d, "
            "st_x('POINT (-1.25 2)') AS x, st_y('POINT (-1.25 2)') AS y, "
            "st_distance(st_point(0, 0), st_point(3, 4)) AS d2"
        ).collect()[0]
        assert r["d"] == 5.0 and r["x"] == -1.25 and r["y"] == 2.0
        assert r["d2"] == 5.0
