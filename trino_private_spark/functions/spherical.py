"""SphericalGeography measures — ST_Area / ST_Length / ST_Distance on the
sphere.

Reference: ``plugin/trino-geospatial/.../GeoFunctions.java`` —
``stSphericalArea`` (:1781), ``stSphericalLength``, ``stSphericalDistance``
over the ``SphericalGeography`` type (``to_spherical_geography`` cast).
The reference computes polygon area by the signed spherical-excess
half-tangent accumulation with a bearing-sum pole test — the classic
polygon-on-a-sphere algorithm of Chamberlain & Duquette (JPL publication
07-03, "Some algorithms for polygons on a sphere"), with
R = 6371.01 km (the same constant as great_circle_distance).  This module
implements that algorithm from the published math:

- per edge, excess += 2*atan2(tan(dLon/2) * (t1 + t2), 1 + t1*t2) with
  t = tan(lat/2) — the signed excess of the quadrilateral between the
  edge's great circle and the equator;
- the accumulated turning (course delta) distinguishes a ring that winds
  around a pole (turning ~0) from a normal ring (turning +-2pi); a
  pole-enclosing ring's |excess| is short by exactly 2pi;
- shells add, holes subtract; area = |excess| * R^2.

Lifted into Spark as Arrow-batched pandas UDFs over WKT (lon/lat degrees),
matching the planar kernel's carrier type.  Same scale posture as
functions/geometry.py: narrow per-row maps, no shuffle, no state.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from trino_private_spark.functions.geometry import (
    GEOMETRY_UDFS,
    Geom,
    _u1,
    parse_wkt,
)

EARTH_RADIUS_KM = 6371.01
EARTH_RADIUS_M = EARTH_RADIUS_KM * 1000.0

__all__ = [
    "spherical_ring_excess",
    "geom_spherical_area",
    "geom_spherical_length",
    "st_geography_area",
    "st_geography_length",
]


def spherical_ring_excess(ring: np.ndarray) -> float:
    """Signed spherical excess of one closed lon/lat-degree ring, with the
    pole-winding correction.  |excess| * R^2 = ring area."""
    pts = [tuple(p) for p in ring[:-1]]
    # collapse consecutive duplicates (the reference skips repeated points)
    dedup = []
    for p in pts:
        if not dedup or p != dedup[-1]:
            dedup.append(p)
    if len(dedup) > 1 and dedup[0] == dedup[-1]:
        dedup.pop()
    if len(dedup) < 3:
        raise ValueError("Polygon is not valid: a loop contains less then 3 vertices.")
    lon = np.radians([p[0] for p in dedup])
    lat = np.radians([p[1] for p in dedup])

    excess = 0.0
    course_delta = 0.0
    first_initial_bearing = 0.0
    prev_final_bearing = 0.0
    first = True
    # start from the last vertex, as the accumulation is cyclic
    p_lon, p_lat = lon[-1], lat[-1]
    for i in range(len(dedup)):
        c_lon, c_lat = lon[i], lat[i]
        d_lon = c_lon - p_lon
        t1, t2 = math.tan(p_lat / 2.0), math.tan(c_lat / 2.0)
        excess += 2.0 * math.atan2(
            math.tan(d_lon / 2.0) * (t1 + t2), 1.0 + t1 * t2
        )

        sin_d, cos_d = math.sin(d_lon), math.cos(d_lon)
        pc, ps = math.cos(p_lat), math.sin(p_lat)
        cc, cs = math.cos(c_lat), math.sin(c_lat)
        initial_bearing = math.atan2(sin_d * cc, pc * cs - ps * cc * cos_d) % (
            2.0 * math.pi
        )
        final_bearing = (
            math.atan2(-sin_d * pc, ps * cc - pc * cs * cos_d) + math.pi
        ) % (2.0 * math.pi)

        if first:
            first_initial_bearing = initial_bearing
            first = False
        else:
            course_delta += (
                initial_bearing - prev_final_bearing + 3.0 * math.pi
            ) % (2.0 * math.pi) - math.pi
        course_delta += (final_bearing - initial_bearing + 3.0 * math.pi) % (
            2.0 * math.pi
        ) - math.pi
        prev_final_bearing = final_bearing
        p_lon, p_lat = c_lon, c_lat

    course_delta += (
        first_initial_bearing - prev_final_bearing + 3.0 * math.pi
    ) % (2.0 * math.pi) - math.pi
    # normal ring turns +-2pi; a pole-enclosing ring turns ~0 and its
    # excess is short by one full sphere band
    if abs(course_delta) < math.pi / 4.0:
        excess = abs(excess) - 2.0 * math.pi
    return excess


def geom_spherical_area(g: Geom) -> float | None:
    """ST_Area(to_spherical_geography(...)) in m^2 (stSphericalArea):
    shells add |excess|, holes subtract."""
    if g.is_empty():
        return None
    if g.kind not in ("Polygon", "MultiPolygon"):
        raise ValueError("When applied to SphericalGeography inputs, ST_Area only supports POLYGON or MULTI_POLYGON")
    total = 0.0
    for part in g.flatten():
        for i, ring in enumerate(part.rings):
            sign = 1.0 if i == 0 else -1.0
            total += sign * abs(spherical_ring_excess(ring))
    return abs(total) * EARTH_RADIUS_M * EARTH_RADIUS_M


def _gc_distance_rad(lon1, lat1, lon2, lat2) -> float:
    """Great-circle central angle (Vincenty formula on the sphere — the
    same formula as functions/geo.great_circle_distance)."""
    l1, p1, l2, p2 = map(math.radians, (lon1, lat1, lon2, lat2))
    dl = l2 - l1
    t1 = math.cos(p2) * math.sin(dl)
    t2 = math.cos(p1) * math.sin(p2) - math.sin(p1) * math.cos(p2) * math.cos(dl)
    t3 = math.sin(p1) * math.sin(p2) + math.cos(p1) * math.cos(p2) * math.cos(dl)
    return math.atan2(math.hypot(t1, t2), t3)


def geom_spherical_length(g: Geom) -> float | None:
    """ST_Length(to_spherical_geography(...)) in meters
    (stSphericalLength): sum of great-circle edge lengths."""
    if g.is_empty():
        return None
    if g.kind not in ("LineString", "MultiLineString"):
        raise ValueError("When applied to SphericalGeography inputs, ST_Length only supports LINE_STRING or MULTI_LINE_STRING")
    total = 0.0
    for part in g.flatten():
        c = part.coords
        for i in range(len(c) - 1):
            total += _gc_distance_rad(c[i][0], c[i][1], c[i + 1][0], c[i + 1][1])
    return total * EARTH_RADIUS_M


st_geography_area = _u1("double", geom_spherical_area)
st_geography_length = _u1("double", geom_spherical_length)
GEOMETRY_UDFS["st_geography_area"] = st_geography_area
GEOMETRY_UDFS["st_geography_length"] = st_geography_length
