"""ST_Relate — the DE-9IM intersection matrix.

Reference: ``GeoFunctions.java stRelate`` (delegates to ESRI's relate
operator).  The DE-9IM matrix holds, for each pair from {Interior,
Boundary, Exterior} x {Interior, Boundary, Exterior}, the DIMENSION of the
intersection: F (empty), 0 (points), 1 (curves), 2 (areas).  ``ST_Relate(a,
b, pattern)`` matches the matrix against a 9-char pattern of
``T F 0 1 2 *`` (T = non-empty).

Supported kind pairs: {Point, MultiPoint} x {Line, Polygon, Point},
{Line, MultiLine} x {Line, Polygon}, {Polygon, MultiPolygon} squared —
the pairs the named OGC predicates cover, now with the full matrix.

Method (exact for simple inputs whose boundaries cross transversally or
overlap collinearly — the same contract as the kernel's predicates):

- area-area cells (II, IE, EI) come from the clipper's exact
  intersection/difference areas;
- curve cells split every segment of one geometry at its intersections
  with the other's segments, then classify each SUB-SEGMENT midpoint
  (dimension 1 evidence) and each split POINT (dimension 0 evidence)
  with the point-classifier;
- EE is always 2 for bounded geometries.

Scale posture: per-row pandas UDF like every other predicate — and like
them, to be used as the RESIDUAL test after a tile/KdbTree prejoin, never
as the join condition itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from trino_private_spark.functions.geometry import (
    GEOMETRY_UDFS,
    Geom,
    _on_segment,
    _orient,
    _point_in_geom,
    _segments_cross_properly,
    _u2,
    geom_intersection_area,
    geom_area,
    pandas_udf,
    parse_wkt,
)

__all__ = ["de9im", "relate_pattern", "st_relate"]


def _segments(g: Geom):
    for part in g.flatten():
        if part.kind == "LineString":
            c = part.coords
            for i in range(len(c) - 1):
                yield (tuple(c[i]), tuple(c[i + 1]))
        elif part.kind == "Polygon":
            for r in part.rings:
                for i in range(len(r) - 1):
                    yield (tuple(r[i]), tuple(r[i + 1]))


def _seg_intersection_params(a, b, c, d):
    """t-parameters along segment ab where it meets segment cd (proper
    crossings, endpoint touches, and collinear overlap ends)."""
    ts = []
    o1, o2 = _orient(c, d, a), _orient(c, d, b)
    o3, o4 = _orient(a, b, c), _orient(a, b, d)
    den = (b[0] - a[0]) ** 2 + (b[1] - a[1]) ** 2
    if den == 0:
        return ts

    def param(p):
        return ((p[0] - a[0]) * (b[0] - a[0]) + (p[1] - a[1]) * (b[1] - a[1])) / den

    if o1 == 0 and o2 == 0:
        # collinear: overlap endpoints project onto ab
        for p in (c, d):
            t = param(p)
            if 0.0 <= t <= 1.0:
                ts.append(t)
        return ts
    if (o1 * o2 <= 0) and (o3 * o4 <= 0):
        # proper or touching crossing: solve for the point
        d1x, d1y = b[0] - a[0], b[1] - a[1]
        d2x, d2y = d[0] - c[0], d[1] - c[1]
        denom = d1x * d2y - d1y * d2x
        if denom != 0:
            t = ((c[0] - a[0]) * d2y - (c[1] - a[1]) * d2x) / denom
            if 0.0 <= t <= 1.0:
                ts.append(t)
    return ts


def _curve_cells(segs, other: Geom, boundary_pts=None):
    """Classify the 1-D point set of ``segs`` against ``other``: returns
    dims (max -1/0/1) of its intersection with other's interior, boundary
    and exterior.  Midpoints of sub-segments give dimension-1 evidence;
    split points give dimension-0 evidence."""
    dims = {"I": -1, "B": -1, "E": -1}
    other_segs = list(_segments(other))
    for a, b in segs:
        ts = {0.0, 1.0}
        for c, d in other_segs:
            for t in _seg_intersection_params(a, b, c, d):
                ts.add(min(max(t, 0.0), 1.0))
        ts = sorted(ts)
        # sub-segment midpoints -> dim 1 evidence
        for t0, t1 in zip(ts, ts[1:]):
            if t1 - t0 <= 0:
                continue
            tm = (t0 + t1) / 2.0
            m = (a[0] + tm * (b[0] - a[0]), a[1] + tm * (b[1] - a[1]))
            cls = _point_in_geom(m, other)
            key = "E" if cls == 0 else ("B" if cls == 1 else "I")
            dims[key] = max(dims[key], 1)
        # split points -> dim 0 evidence
        for t in ts:
            p = (a[0] + t * (b[0] - a[0]), a[1] + t * (b[1] - a[1]))
            cls = _point_in_geom(p, other)
            key = "E" if cls == 0 else ("B" if cls == 1 else "I")
            dims[key] = max(dims[key], 0)
    return dims


def _boundary_of(g: Geom):
    """The 1-D boundary as segments (polygon rings / none for lines'
    interior use) — for lines the OGC boundary is the endpoints."""
    if g.kind in ("Polygon", "MultiPolygon"):
        return list(_segments(g))
    return []


def _line_endpoints(g: Geom):
    pts = []
    for part in g.flatten():
        if part.kind == "LineString" and part.coords is not None and len(part.coords):
            pts.append(tuple(part.coords[0]))
            pts.append(tuple(part.coords[-1]))
    return pts


def _points_of(g: Geom):
    return [tuple(p.pt) for p in g.flatten() if p.kind == "Point" and p.pt is not None]


def _dim_cls(cls: int) -> str:
    return "E" if cls == 0 else ("B" if cls == 1 else "I")


def de9im(g1: Geom, g2: Geom) -> str:
    """The 9-character DE-9IM matrix row-major (II IB IE / BI BB BE /
    EI EB EE) with entries F/0/1/2."""
    k1, k2 = g1.dimension(), g2.dimension()
    M = {(r, c): -1 for r in "IBE" for c in "IBE"}
    M[("E", "E")] = 2  # bounded geometries: exteriors always share area

    def bump(r, c, d):
        M[(r, c)] = max(M[(r, c)], d)

    if k1 == 2 and k2 == 2:
        inter = geom_intersection_area(g1, g2)
        a1, a2 = geom_area(g1), geom_area(g2)
        if inter > 1e-12:
            bump("I", "I", 2)
        if a1 - inter > 1e-12:
            bump("I", "E", 2)
        if a2 - inter > 1e-12:
            bump("E", "I", 2)
        # boundary rows/cols via curve analysis of each boundary vs other
        b1 = _curve_cells(_boundary_of(g1), g2)
        for c, d in b1.items():
            if d >= 0:
                bump("B", c, d)
        b2 = _curve_cells(_boundary_of(g2), g1)
        for r, d in b2.items():
            if d >= 0:
                bump(r, "B", d)
    elif k1 == 1 and k2 == 2:
        cells = _curve_cells(list(_segments(g1)), g2)
        for c, d in cells.items():
            if d >= 0:
                bump("I", c, d)
        # the line's boundary = its endpoints
        for p in _line_endpoints(g1):
            bump("B", _dim_cls(_point_in_geom(p, g2)), 0)
        # polygon side: interior/boundary always extend beyond the line
        bump("E", "I", 2)
        bump("E", "B", 1)
        # endpoints sit ON the line's interior curve classification; the
        # line's interior vs polygon cells already computed above
    elif k1 == 2 and k2 == 1:
        m = de9im(g2, g1)
        # transpose
        t = {}
        order = [("I", "I"), ("I", "B"), ("I", "E"), ("B", "I"), ("B", "B"),
                 ("B", "E"), ("E", "I"), ("E", "B"), ("E", "E")]
        vals = {rc: v for rc, v in zip(order, m)}
        out = "".join(vals[(c, r)] for r, c in order)
        return out
    elif k1 == 1 and k2 == 1:
        cells = _curve_cells(list(_segments(g1)), g2)
        ep2 = set(_line_endpoints(g2))
        for c, d in cells.items():
            if d >= 0:
                bump("I", c, d)
        for p in _line_endpoints(g1):
            cls = 1 if p in ep2 else (2 if any(_on_segment(p, a, b) for a, b in _segments(g2)) else 0)
            # against a line: on-endpoint = boundary, on-curve = "interior"
            bump("B", "B" if cls == 1 else ("I" if cls == 2 else "E"), 0)
        # the other line's boundary vs this line
        ep1 = set(_line_endpoints(g1))
        for p in _line_endpoints(g2):
            if p in ep1:
                continue  # already counted as BB
            on = any(_on_segment(p, a, b) for a, b in _segments(g1))
            bump("I" if on else "E", "B", 0)
        bump("E", "I", 1)  # unless g2 within g1 — refined below
        bump("I", "E", 1)
        # refine: if every sub-midpoint of g2 lies on g1, EI is F
        back = _curve_cells(list(_segments(g2)), g1)
        if back["E"] < 1:
            M[("E", "I")] = max(-1, 0 if back["E"] == 0 else -1)
        if cells["E"] < 1:
            M[("I", "E")] = max(-1, 0 if cells["E"] == 0 else -1)
    elif k1 == 0:
        for p in _points_of(g1):
            cls = _point_in_geom(p, g2)
            bump("I", _dim_cls(cls), 0)
        if k2 == 2:
            bump("E", "I", 2)
            bump("E", "B", 1)
        elif k2 == 1:
            bump("E", "I", 1)
            for q in _line_endpoints(g2):
                if q not in set(_points_of(g1)):
                    bump("E", "B", 0)
    elif k2 == 0:
        m = de9im(g2, g1)
        order = [("I", "I"), ("I", "B"), ("I", "E"), ("B", "I"), ("B", "B"),
                 ("B", "E"), ("E", "I"), ("E", "B"), ("E", "E")]
        vals = {rc: v for rc, v in zip(order, m)}
        return "".join(vals[(c, r)] for r, c in order)

    def ch(d):
        return "F" if d < 0 else str(d)

    return "".join(
        ch(M[(r, c)]) for r in "IBE" for c in "IBE"
    )


def relate_pattern(matrix: str, pattern: str) -> bool:
    """DE-9IM pattern match: T = non-empty (0/1/2), F = empty, * = any,
    0/1/2 = exact dimension."""
    if len(pattern) != 9:
        raise ValueError("Relation pattern must be of length 9")
    for m, p in zip(matrix, pattern.upper()):
        if p == "*":
            continue
        if p == "T" and m == "F":
            return False
        if p == "F" and m != "F":
            return False
        if p in "012" and m != p:
            return False
    return True


def st_relate(g1: Geom, g2: Geom, pattern: str) -> bool:
    return relate_pattern(de9im(g1, g2), pattern)


de9im_udf = _u2("string", lambda a, b: de9im(a, b))
GEOMETRY_UDFS["geometry_de9im"] = de9im_udf


@pandas_udf("boolean")
def st_relate_udf(s1: pd.Series, s2: pd.Series, pat: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None
            if w1 is None or w2 is None
            else st_relate(parse_wkt(w1), parse_wkt(w2), p)
            for w1, w2, p in zip(s1, s2, pat)
        ]
    )


GEOMETRY_UDFS["st_relate"] = st_relate_udf
