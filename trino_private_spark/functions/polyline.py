"""Encoded polylines (Google polyline algorithm) — the reference's
from_encoded_polyline / to_encoded_polyline
(plugin/trino-geospatial/.../EncodedPolylineFunctions.java).

A linestring is represented as ``array<struct<lat double, lon double>>``
(the point-struct convention of functions/geo.py, lat/lon order as in the
polyline spec). The codec is inherently sequential per string (variable-
length base-63 chunks with running deltas), so it runs as Arrow-batched
pandas UDFs — the sanctioned Python hop for per-row codecs (same policy as
word_stem); everything around it (filters, joins on decoded points) stays
JVM-side.

Algorithm (5-decimal fixed point, zigzag, 5-bit groups + 63 offset):
https://developers.google.com/maps/documentation/utilities/polylinealgorithm
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

_POINT = StructType(
    [StructField("lat", DoubleType()), StructField("lon", DoubleType())]
)


def _encode_value(v: int, out: list[str]) -> None:
    v = ~(v << 1) if v < 0 else (v << 1)
    while v >= 0x20:
        out.append(chr((0x20 | (v & 0x1F)) + 63))
        v >>= 5
    out.append(chr(v + 63))


def encode_points(points: list[tuple[float, float]] | None) -> str | None:
    if points is None:
        return None
    out: list[str] = []
    prev_lat = prev_lon = 0
    for lat, lon in points:
        ilat, ilon = round(lat * 1e5), round(lon * 1e5)
        _encode_value(ilat - prev_lat, out)
        _encode_value(ilon - prev_lon, out)
        prev_lat, prev_lon = ilat, ilon
    return "".join(out)


def decode_string(s: str | None) -> list[tuple[float, float]] | None:
    if s is None:
        return None
    points: list[tuple[float, float]] = []
    lat = lon = 0
    i, n = 0, len(s)
    while i < n:
        for which in (0, 1):
            result, shift = 0, 0
            while True:
                b = ord(s[i]) - 63
                i += 1
                result |= (b & 0x1F) << shift
                shift += 5
                if b < 0x20:
                    break
            delta = ~(result >> 1) if result & 1 else result >> 1
            if which == 0:
                lat += delta
            else:
                lon += delta
        points.append((lat / 1e5, lon / 1e5))
    return points


@F.pandas_udf(StringType())
def to_encoded_polyline(points: pd.Series) -> pd.Series:
    """array<struct<lat,lon>> -> encoded polyline varchar."""
    return points.map(
        lambda pts: None
        if pts is None
        else encode_points([(p["lat"], p["lon"]) for p in pts])
    )


@F.pandas_udf(ArrayType(_POINT))
def from_encoded_polyline(s: pd.Series) -> pd.Series:
    """encoded polyline varchar -> array<struct<lat,lon>>."""
    return s.map(
        lambda v: None
        if v is None
        else [{"lat": lat, "lon": lon} for lat, lon in decode_string(v)]
    )


def linestring(*lat_lon_cols) -> Column:
    """Build the array<struct<lat,lon>> linestring from lat/lon column
    pairs: linestring(lat1, lon1, lat2, lon2, ...)."""
    assert len(lat_lon_cols) % 2 == 0
    pts = [
        F.struct(
            F.lit(lat_lon_cols[i]).cast("double").alias("lat")
            if not isinstance(lat_lon_cols[i], Column)
            else lat_lon_cols[i].cast("double").alias("lat"),
            F.lit(lat_lon_cols[i + 1]).cast("double").alias("lon")
            if not isinstance(lat_lon_cols[i + 1], Column)
            else lat_lon_cols[i + 1].cast("double").alias("lon"),
        )
        for i in range(0, len(lat_lon_cols), 2)
    ]
    return F.array(*pts)
