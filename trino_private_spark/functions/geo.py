"""Geospatial subset: Bing tiles + point geometry, all JVM-side expressions.

Re-expresses the reference's Bing-tile family and the point/distance core of
its geospatial plugin (plugin/trino-geospatial/.../BingTileFunctions.java,
BingTile.java, GeoFunctions.java:1511 greatCircleDistance) as pure Spark
Column arithmetic — no Python UDFs, so everything stays inside whole-stage
codegen and scales like any other projection.

Semantics mirrored from the reference:
- tile math: BingTileFunctions.java longitudeToTileX/longitudeToTileY/
  axisToCoordinates/mapSize (mapSize = 256 << zoom; axis clipped to
  [0, mapSize-1] then integer-divided by 256);
- encoding: BingTile.java:152 ``encode() = (x << 28) + (y << 5) + zoom``;
- quadkey: BingTile.java:131 toQuadKey / :84 fromQuadKey (digit per zoom
  level, x bit + 2 * y bit);
- great_circle_distance: GeoFunctions.java:1511 (vincenty-style atan2 form,
  EARTH_RADIUS_KM = 6371.01);
- valid ranges: latitude in [-85.05112878, 85.05112878], longitude in
  [-180, 180], zoom in (0, 23].

Divergence (documented): ``bing_tiles_around(lat, lon, zoom, radius_km)``
returns the full rectangle-of-tiles cover of the radius disk filtered by
closest-bbox-point distance; the reference prunes corner tiles with an
equivalent corner-distance walk (BingTileFunctions.java:202-335). Both
return every tile intersecting the disk; ours may keep a corner tile whose
bbox corner is marginally inside. For tile-bucketed spatial joins the
residual distance predicate makes the covers interchangeable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column
from pyspark.sql import functions as F

from trino_private_spark.functions.registry import trino_fn, _c

TILE_PIXELS = 256
MAX_ZOOM = 23
EARTH_RADIUS_KM = 6371.01
MAX_LATITUDE = 85.05112878
MIN_LATITUDE = -85.05112878


def _map_size(zoom: Column) -> Column:
    # 256 << zoom, exact for zoom <= 23
    return (F.lit(256.0) * F.pow(F.lit(2.0), zoom.cast("double"))).cast("long")


def _axis_to_coordinate(axis: Column, map_size: Column) -> Column:
    """axisToCoordinates: clip(axis * mapSize, 0, mapSize - 1) // 256."""
    scaled = axis * map_size.cast("double")
    clipped = F.least(
        F.greatest(scaled, F.lit(0.0)), (map_size - F.lit(1)).cast("double")
    )
    return (clipped.cast("long") / F.lit(TILE_PIXELS)).cast("long")


def longitude_to_tile_x(lon, zoom) -> Column:
    map_size = _map_size(_c(zoom))
    return _axis_to_coordinate((_c(lon) + F.lit(180.0)) / F.lit(360.0), map_size)


def latitude_to_tile_y(lat, zoom) -> Column:
    map_size = _map_size(_c(zoom))
    sin_lat = F.sin(F.radians(_c(lat)))
    y = F.lit(0.5) - F.log((F.lit(1.0) + sin_lat) / (F.lit(1.0) - sin_lat)) / F.lit(
        4.0 * math.pi
    )
    return _axis_to_coordinate(y, map_size)


@trino_fn("bing_tile")
def bing_tile(x, y=None, zoom=None) -> Column:
    """bing_tile(x, y, zoom) encode; bing_tile(quadkey) decode-from-quadkey."""
    if y is None:
        return bing_tile_from_quadkey(x)
    return (
        _c(x).cast("long") * F.lit(1 << 28)
        + _c(y).cast("long") * F.lit(1 << 5)
        + _c(zoom).cast("long")
    )


@trino_fn("bing_tile_at")
def bing_tile_at(lat, lon, zoom) -> Column:
    return bing_tile(
        longitude_to_tile_x(lon, zoom), latitude_to_tile_y(lat, zoom), zoom
    )


@trino_fn("bing_tile_zoom_level")
def bing_tile_zoom_level(tile) -> Column:
    return (_c(tile) % F.lit(32)).cast("int")


def bing_tile_x(tile) -> Column:
    return (_c(tile) / F.lit(1 << 28)).cast("long").cast("int")


def bing_tile_y(tile) -> Column:
    return ((_c(tile) / F.lit(32)).cast("long") % F.lit(1 << 23)).cast("int")


@trino_fn("bing_tile_coordinates")
def bing_tile_coordinates(tile) -> Column:
    return F.struct(bing_tile_x(tile).alias("x"), bing_tile_y(tile).alias("y"))


@trino_fn("bing_tile_quadkey")
def bing_tile_quadkey(tile) -> Column:
    """toQuadKey: digit_i = xbit + 2*ybit for mask 2^(i-1), i = zoom..1."""
    t = _c(tile)
    x = bing_tile_x(t).cast("long")
    y = bing_tile_y(t).cast("long")
    zoom = bing_tile_zoom_level(t)
    digits = F.transform(
        F.sequence(zoom, F.lit(1), F.lit(-1)),
        lambda i: F.chr(
            F.lit(48)
            + (x / F.pow(F.lit(2.0), (i - F.lit(1)).cast("double")).cast("long"))
            .cast("long")
            % F.lit(2)
            + F.lit(2)
            * (
                (y / F.pow(F.lit(2.0), (i - F.lit(1)).cast("double")).cast("long"))
                .cast("long")
                % F.lit(2)
            )
        ),
    )
    return F.array_join(digits, "")


def bing_tile_from_quadkey(quadkey) -> Column:
    """fromQuadKey: char at position p contributes bit 2^(zoom-p)."""
    qk = _c(quadkey)
    zoom = F.length(qk)
    positions = F.sequence(F.lit(1), zoom)
    digit = lambda p: (F.ascii(F.substring(qk, p, F.lit(1))) - F.lit(48)).cast("long")
    weight = lambda p: F.pow(F.lit(2.0), (zoom - p).cast("double")).cast("long")
    x = F.aggregate(
        positions,
        F.lit(0).cast("long"),
        lambda acc, p: acc + (digit(p) % F.lit(2)) * weight(p),
    )
    y = F.aggregate(
        positions,
        F.lit(0).cast("long"),
        lambda acc, p: acc + (digit(p) / F.lit(2)).cast("long") * weight(p),
    )
    return bing_tile(x, y, zoom)


@trino_fn("bing_tiles_around")
def bing_tiles_around(lat, lon, zoom, radius_km=None) -> Column:
    """3x3 neighborhood (no radius) or disk cover (radius form, see module
    docstring for the corner-tile divergence)."""
    if radius_km is None:
        zoom_c = _c(zoom)
        map_size = _map_size(zoom_c)
        max_tile = (map_size / F.lit(TILE_PIXELS)).cast("long") - F.lit(1)
        tx = longitude_to_tile_x(lon, zoom)
        ty = latitude_to_tile_y(lat, zoom)
        offsets = F.sequence(F.lit(-1), F.lit(1))
        grid = F.flatten(
            F.transform(
                offsets,
                lambda i: F.transform(
                    offsets,
                    lambda j: F.struct(
                        (tx + i).alias("x"), (ty + j).alias("y")
                    ),
                ),
            )
        )
        valid = F.filter(
            grid,
            lambda c: (c["x"] >= 0)
            & (c["x"] <= max_tile)
            & (c["y"] >= 0)
            & (c["y"] <= max_tile),
        )
        return F.transform(valid, lambda c: bing_tile(c["x"], c["y"], zoom_c))
    return tiles_covering_radius(lat, lon, zoom, radius_km)


def _add_distance_to_latitude(lat: Column, radius_km, bearing_deg: float) -> Column:
    """BingTileFunctions.addDistanceToLatitude (bearing 0=north, 180=south)."""
    lat_r = F.radians(lat)
    ratio = _c(radius_km) / F.lit(EARTH_RADIUS_KM)
    b = F.lit(math.radians(bearing_deg))
    new_lat = F.degrees(
        F.asin(
            F.sin(lat_r) * F.cos(ratio) + F.cos(lat_r) * F.sin(ratio) * F.cos(b)
        )
    )
    return F.least(F.greatest(new_lat, F.lit(MIN_LATITUDE)), F.lit(MAX_LATITUDE))


def _add_distance_to_longitude(
    lat: Column, lon: Column, radius_km, bearing_deg: float
) -> Column:
    lat_r = F.radians(lat)
    lon_r = F.radians(lon)
    ratio = _c(radius_km) / F.lit(EARTH_RADIUS_KM)
    b = F.lit(math.radians(bearing_deg))
    new_lon = F.degrees(
        lon_r
        + F.atan2(
            F.sin(b) * F.sin(ratio) * F.cos(lat_r),
            F.cos(ratio) - F.sin(lat_r) * F.sin(lat_r),
        )
    )
    # wraparound per reference; disk covers crossing the antimeridian are not
    # supported by the rectangle cover below (documented)
    return F.when(new_lon > 180.0, new_lon - F.lit(360.0)).otherwise(
        F.when(new_lon < -180.0, new_lon + F.lit(360.0)).otherwise(new_lon)
    )


def radius_bbox(lat: Column, lon: Column, radius_km) -> tuple:
    """(left_lon, bottom_lat, right_lon, top_lat) of the radius_km disk's
    lat/lon bbox — the addDistanceToLatitude/-Longitude composition of
    BingTileFunctions, shared by the tile cover and the KdbTree cover.

    Antimeridian caveat (same as the reference's wraparound handling): a
    disk crossing lon ±180 wraps, leaving left > right; callers must split
    the cover into [left, 180] and [-180, right] (kdb_distance_join does;
    the tile-rectangle cover documents the limitation instead)."""
    return (
        _add_distance_to_longitude(lat, lon, radius_km, 270),
        _add_distance_to_latitude(lat, radius_km, 180),
        _add_distance_to_longitude(lat, lon, radius_km, 90),
        _add_distance_to_latitude(lat, radius_km, 0),
    )


def tiles_covering_radius(lat, lon, zoom, radius_km) -> Column:
    """Array of encoded tiles whose bbox intersects the radius_km disk.

    Rectangle [left..right] x [top..bottom] of tiles, each kept iff the
    great-circle distance from the disk center to the closest point of the
    tile's lat/lon bbox is <= radius. This is the scale path for spatial
    joins: explode the (small) cover on the probe side, equi-join on tile.
    """
    lat_c, lon_c, zoom_c = _c(lat), _c(lon), _c(zoom)
    top = latitude_to_tile_y(_add_distance_to_latitude(lat_c, radius_km, 0), zoom_c)
    bottom = latitude_to_tile_y(
        _add_distance_to_latitude(lat_c, radius_km, 180), zoom_c
    )
    left = longitude_to_tile_x(
        _add_distance_to_longitude(lat_c, lon_c, radius_km, 270), zoom_c
    )
    right = longitude_to_tile_x(
        _add_distance_to_longitude(lat_c, lon_c, radius_km, 90), zoom_c
    )
    rect = F.flatten(
        F.transform(
            F.sequence(left, right),
            lambda x: F.transform(
                F.sequence(top, bottom),
                lambda y: F.struct(x.alias("x"), y.alias("y")),
            ),
        )
    )
    near = F.filter(
        rect,
        lambda c: great_circle_distance(
            F.least(
                F.greatest(lat_c, tile_y_to_latitude(c["y"] + 1, zoom_c)),
                tile_y_to_latitude(c["y"], zoom_c),
            ),
            F.least(
                F.greatest(lon_c, tile_x_to_longitude(c["x"], zoom_c)),
                tile_x_to_longitude(c["x"] + 1, zoom_c),
            ),
            lat_c,
            lon_c,
        )
        <= _c(radius_km),
    )
    return F.transform(near, lambda c: bing_tile(c["x"], c["y"], zoom_c))


def tile_x_to_longitude(tile_x, zoom) -> Column:
    """West edge longitude of tile column x (BingTileFunctions.java:582)."""
    map_size = _map_size(_c(zoom)).cast("double")
    scaled = F.least(
        F.greatest(_c(tile_x).cast("double") * F.lit(256.0), F.lit(0.0)), map_size
    )
    return F.lit(360.0) * (scaled / map_size - F.lit(0.5))


def tile_y_to_latitude(tile_y, zoom) -> Column:
    """North edge latitude of tile row y (inverse web-mercator)."""
    map_size = _map_size(_c(zoom)).cast("double")
    scaled = F.least(
        F.greatest(_c(tile_y).cast("double") * F.lit(256.0), F.lit(0.0)), map_size
    )
    y = F.lit(0.5) - scaled / map_size
    return F.lit(90.0) - F.lit(360.0) * F.atan(
        F.exp(-y * F.lit(2.0 * math.pi))
    ) / F.lit(math.pi)


@trino_fn("bing_tile_polygon")
def bing_tile_polygon(tile) -> Column:
    """WKT envelope of the tile (reference returns an ESRI geometry)."""
    t = _c(tile)
    x, y, zoom = bing_tile_x(t), bing_tile_y(t), bing_tile_zoom_level(t)
    min_lon = tile_x_to_longitude(x, zoom)
    max_lon = tile_x_to_longitude(x + 1, zoom)
    max_lat = tile_y_to_latitude(y, zoom)
    min_lat = tile_y_to_latitude(y + 1, zoom)
    s = lambda c: F.format_number(c, 10)
    return F.concat(
        F.lit("POLYGON (("),
        s(min_lon), F.lit(" "), s(min_lat), F.lit(", "),
        s(max_lon), F.lit(" "), s(min_lat), F.lit(", "),
        s(max_lon), F.lit(" "), s(max_lat), F.lit(", "),
        s(min_lon), F.lit(" "), s(max_lat), F.lit(", "),
        s(min_lon), F.lit(" "), s(min_lat), F.lit("))"),
    )


@trino_fn("great_circle_distance")
def great_circle_distance(lat1, lon1, lat2, lon2) -> Column:
    """GeoFunctions.java:1511 — atan2 form, result in km."""
    rlat1, rlat2 = F.radians(_c(lat1)), F.radians(_c(lat2))
    sin1, cos1 = F.sin(rlat1), F.cos(rlat1)
    sin2, cos2 = F.sin(rlat2), F.cos(rlat2)
    dlon = F.radians(_c(lon1)) - F.radians(_c(lon2))
    cos_dlon = F.cos(dlon)
    t1 = cos2 * F.sin(dlon)
    t2 = cos1 * sin2 - sin1 * cos2 * cos_dlon
    t3 = sin1 * sin2 + cos1 * cos2 * cos_dlon
    return F.atan2(F.sqrt(t1 * t1 + t2 * t2), t3) * F.lit(EARTH_RADIUS_KM)


# --- minimal point geometry (GeoFunctions.java point subset) ----------------


@trino_fn("st_point")
def st_point(x, y) -> Column:
    return F.struct(_c(x).cast("double").alias("x"), _c(y).cast("double").alias("y"))


@trino_fn("st_x")
def st_x(p) -> Column:
    return _c(p)["x"]


@trino_fn("st_y")
def st_y(p) -> Column:
    return _c(p)["y"]


@trino_fn("st_geometry_from_text")
def st_geometry_from_text(wkt) -> Column:
    """POINT WKT only — the subset used by point/distance pipelines."""
    w = _c(wkt)
    num = r"(-?[0-9]+(?:\.[0-9]+)?)"
    pat = r"^\s*POINT\s*\(\s*" + num + r"\s+" + num + r"\s*\)\s*$"
    return st_point(
        F.regexp_extract(w, pat, 1).cast("double"),
        F.regexp_extract(w, pat, 2).cast("double"),
    )


@trino_fn("st_astext")
def st_astext(p) -> Column:
    g = _c(p)
    fmt = lambda c: F.when(
        c == c.cast("long").cast("double"), c.cast("long").cast("string")
    ).otherwise(c.cast("string"))
    return F.concat(
        F.lit("POINT ("), fmt(g["x"]), F.lit(" "), fmt(g["y"]), F.lit(")")
    )


@trino_fn("st_distance")
def st_distance(p1, p2) -> Column:
    """Planar euclidean distance between points (geometry semantics)."""
    a, b = _c(p1), _c(p2)
    dx, dy = a["x"] - b["x"], a["y"] - b["y"]
    return F.sqrt(dx * dx + dy * dy)


def st_distance_spherical(p1, p2) -> Column:
    """SphericalGeography ST_Distance: meters (GeoFunctions.java:1766 —
    greatCircleDistance * 1000); points carry (x=lon, y=lat)."""
    a, b = _c(p1), _c(p2)
    return great_circle_distance(a["y"], a["x"], b["y"], b["x"]) * F.lit(1000.0)


def st_contains_envelope(min_x, min_y, max_x, max_y, p) -> Column:
    """Envelope-contains-point: the rectangle fast path of ST_Contains."""
    g = _c(p)
    return (
        (g["x"] >= _c(min_x))
        & (g["x"] <= _c(max_x))
        & (g["y"] >= _c(min_y))
        & (g["y"] <= _c(max_y))
    )


def envelope_to_bing_tiles(min_lat, min_lon, max_lat, max_lon, zoom) -> Column:
    """All tiles covering a lat/lon envelope — the geometry_to_bing_tiles
    shape for rectangle geometries (BingTileFunctions.java:347; general
    polygons reduce to their envelope cover here, a superset).

    The tile count is ((x2-x1)+1) * ((y2-y1)+1); callers pick zoom so the
    cover stays small (the reference enforces <= 1M tiles likewise)."""
    zoom_c = _c(zoom)
    x1 = longitude_to_tile_x(min_lon, zoom_c)
    x2 = longitude_to_tile_x(max_lon, zoom_c)
    y1 = latitude_to_tile_y(max_lat, zoom_c)  # north edge = smaller tile y
    y2 = latitude_to_tile_y(min_lat, zoom_c)
    return F.flatten(
        F.transform(
            F.sequence(x1, x2),
            lambda x: F.transform(
                F.sequence(y1, y2),
                lambda y: bing_tile(x, y, zoom_c),
            ),
        )
    )
