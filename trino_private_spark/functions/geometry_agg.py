"""Spatial aggregates + line referencing — the remaining trino-geospatial
surface.

Reference:
- ``plugin/trino-geospatial/.../aggregation/ConvexHullAggregation.java``
  (``convex_hull_agg``) and ``GeometryUnionAgg.java``
  (``geometry_union_agg``) — aggregate a geometry column into one
  geometry per group;
- ``GeoFunctions.java:630 line_locate_point`` — the fraction of a line's
  length at which a point projects closest.

Spark realization: the aggregates ride ``applyInPandas`` per group (one
shuffle of WKT strings; the reference's GeometryState accumulates the
same way), reusing the planar kernel — hulls via the monotone chain,
unions via the convex-decomposition clipper's disjoint pieces.
``line_locate_point`` is a pure per-row pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from trino_private_spark.functions.geometry import (
    GEOMETRY_UDFS,
    Geom,
    _pieces_difference,
    _polygon_convex_pieces,
    _assemble_pieces,
    _u2,
    geom_convex_hull,
    parse_wkt,
    to_wkt,
)

__all__ = ["line_locate_point", "convex_hull_agg", "geometry_union_agg"]


# --------------------------------------------------------------------------
# line_locate_point
# --------------------------------------------------------------------------


def _line_locate(line: Geom, pt: Geom):
    """Fraction in [0, 1] of the line's length at the closest point of the
    line to ``pt`` (GeoFunctions.java lineLocatePoint semantics; null for
    empty inputs)."""
    if line.is_empty() or pt.is_empty():
        return None
    if line.kind not in ("LineString", "MultiLineString"):
        raise ValueError(
            f"First argument to line_locate_point must be a LineString or a "
            f"MultiLineString. Got: {line.kind}"
        )
    if pt.kind != "Point":
        raise ValueError(
            f"Second argument to line_locate_point must be a Point. Got: {pt.kind}"
        )
    p = np.asarray(pt.pt, dtype=float)
    total = 0.0
    segs = []  # (cum_len_at_start, a, b, seg_len)
    for part in line.flatten():
        c = np.asarray(part.coords, dtype=float)
        for i in range(len(c) - 1):
            a, b = c[i], c[i + 1]
            seg = float(np.hypot(*(b - a)))
            segs.append((total, a, b, seg))
            total += seg
    if total == 0:
        return 0.0
    best_d, best_at = float("inf"), 0.0
    for cum, a, b, seg in segs:
        if seg == 0:
            t = 0.0
        else:
            t = float(np.dot(p - a, b - a) / (seg * seg))
            t = min(max(t, 0.0), 1.0)
        proj = a + t * (b - a)
        d = float(np.hypot(*(p - proj)))
        if d < best_d:
            best_d, best_at = d, cum + t * seg
    return best_at / total


line_locate_point = _u2("double", _line_locate)
GEOMETRY_UDFS["line_locate_point"] = line_locate_point


# --------------------------------------------------------------------------
# aggregates
# --------------------------------------------------------------------------


def _group_schema(df: DataFrame, group_cols: list[str], out: str) -> str:
    gschema = df.select(*group_cols).schema
    gf = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in gschema.fields)
    return f"{gf}, {out}" if gf else out


def convex_hull_agg(
    df: DataFrame, wkt_col: str, group_cols: list[str]
) -> DataFrame:
    """One convex hull per group over a WKT geometry column
    (ConvexHullAggregation.java).  Output column ``hull`` (WKT)."""
    schema = _group_schema(df, group_cols, "hull string")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pts = []
        for w in pdf[wkt_col].dropna():
            g = parse_wkt(w)
            for x, y in g.all_points():
                pts.append((float(x), float(y)))
        keys = {c: pdf.iloc[0][c] for c in group_cols}
        if not pts:
            hull_wkt = "POLYGON EMPTY"
        else:
            mp = Geom("MultiPoint", parts=[Geom("Point", pt=p) for p in pts])
            hull_wkt = to_wkt(geom_convex_hull(mp))
        return pd.DataFrame([keys | {"hull": hull_wkt}])

    return df.select(*group_cols, wkt_col).groupBy(*group_cols).applyInPandas(fn, schema)


def geometry_union_agg(
    df: DataFrame, wkt_col: str, group_cols: list[str]
) -> DataFrame:
    """One polygon union per group (GeometryUnionAgg.java) via the
    convex-decomposition clipper: each polygon's pieces are added minus
    everything already covered, so the output is the area-exact disjoint
    piece representation.  Output column ``geom`` (WKT)."""
    schema = _group_schema(df, group_cols, "geom string")

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out_pieces: list = []
        prior: list = []
        for w in pdf[wkt_col].dropna():
            g = parse_wkt(w)
            pieces = _polygon_convex_pieces(g)
            out_pieces.extend(_pieces_difference(pieces, prior))
            prior.extend(pieces)
        keys = {c: pdf.iloc[0][c] for c in group_cols}
        return pd.DataFrame([keys | {"geom": to_wkt(_assemble_pieces(out_pieces))}])

    return df.select(*group_cols, wkt_col).groupBy(*group_cols).applyInPandas(fn, schema)
