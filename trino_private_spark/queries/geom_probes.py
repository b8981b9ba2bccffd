"""Polygon-algebra probes (functions/geometry.py — the GeoFunctions.java
ST_* surface beyond points/tiles).

Oracle strategy: geometries are axis-aligned squares and quarter-grid point
sets derived from table keys, so every measure/predicate has a closed-form
arithmetic answer DuckDB can compute without a spatial extension — while the
Spark side goes through the full WKT-parse -> computational-geometry kernel.
All coordinates are exact binary fractions (quarters/eighths), so float
arithmetic is exact on both engines; distances are compared as 64*d^2 which
is an exact integer by construction.

The contains-join probe mirrors the scale split the reference makes in
SpatialJoinOperator: a cheap JVM-side bounding-box prejoin produces the
candidate pairs, the exact pandas-UDF predicate runs only as the residual
filter.  At 100 TB the prejoin becomes the tile/KdbTree bucketing of
operators/spatial_join.py / spatial_partition.py; the residual stays as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.functions import geometry as G
from trino_private_spark.queries import T, probe, spread


def _sq_wkt(cx, cy, s):
    """Axis-aligned square WKT built JVM-side from numeric columns."""

    def n(c):
        return F.cast("string", c)

    x0, x1 = cx - s, cx + s
    y0, y1 = cy - s, cy + s
    return F.concat(
        F.lit("POLYGON (("),
        n(x0), F.lit(" "), n(y0), F.lit(", "),
        n(x1), F.lit(" "), n(y0), F.lit(", "),
        n(x1), F.lit(" "), n(y1), F.lit(", "),
        n(x0), F.lit(" "), n(y1), F.lit(", "),
        n(x0), F.lit(" "), n(y0),
        F.lit("))"),
    )


def _squares(t) -> DataFrame:
    """One square per supplier: center on the quarter grid, half-size in
    {0.25, 0.5, 0.75, 1.0} — all measures closed-form."""
    return t.supplier.select(
        "s_suppkey",
        (F.col("s_suppkey") % 160 / 4.0).alias("cx"),
        (F.col("s_suppkey") * 3 % 160 / 4.0).alias("cy"),
        ((F.col("s_suppkey") % 4 + 1) / 4.0).alias("s"),
    )


def _points(t, limit_key: int) -> DataFrame:
    """Quarter-grid points nudged by 1/8 so they never sit on a square edge."""
    return (
        t.customer.where(F.col("c_custkey") <= limit_key)
        .select(
            "c_custkey",
            (F.col("c_custkey") % 160 / 4.0 + 0.125).alias("px"),
            (F.col("c_custkey") * 7 % 160 / 4.0 + 0.125).alias("py"),
        )
    )


@probe(
    "p_geom_measures",
    oracle="""
    SELECT s_suppkey,
           CAST(ROUND((2 * ((s_suppkey % 4 + 1) / 4.0)) * (2 * ((s_suppkey % 4 + 1) / 4.0)) * 16) AS BIGINT) AS area16,
           CAST(ROUND(8 * ((s_suppkey % 4 + 1) / 4.0) * 4) AS BIGINT) AS perim4,
           CAST(ROUND((s_suppkey % 160) / 4.0 * 4) AS BIGINT) AS cx4,
           CAST(ROUND((s_suppkey * 3 % 160) / 4.0 * 4) AS BIGINT) AS cy4,
           CAST(4 AS BIGINT) AS npts,
           'ST_Polygon' AS gtype
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("geometry",),
)
def p_geom_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Area / ST_Perimeter / ST_Centroid / ST_NumPoints / ST_GeometryType
    through the WKT kernel vs closed-form square arithmetic
    (GeoFunctions.java stArea/stCentroid/stNumPoints parity)."""
    t = T(spark, sf_dir)
    sq = _squares(t).withColumn("wkt", _sq_wkt(F.col("cx"), F.col("cy"), F.col("s")))
    cen = G.GEOMETRY_UDFS["st_centroid"]
    return (
        sq.select(
            "s_suppkey",
            F.round(G.st_area(F.col("wkt")) * 16).cast("long").alias("area16"),
            F.round(G.st_perimeter(F.col("wkt")) * 4).cast("long").alias("perim4"),
            F.round(G.st_x_wkt(cen(F.col("wkt"))) * 4).cast("long").alias("cx4"),
            F.round(G.st_y_wkt(cen(F.col("wkt"))) * 4).cast("long").alias("cy4"),
            G.st_num_points(F.col("wkt")).alias("npts"),
            G.st_geometry_type(F.col("wkt")).alias("gtype"),
        )
        .orderBy("s_suppkey")
    )


@probe(
    "p_geom_contains_join",
    oracle="""
    SELECT s.s_suppkey,
           COUNT(*) AS n_inside
    FROM supplier s
    JOIN (SELECT c_custkey,
                 (c_custkey % 160) / 4.0 + 0.125 AS px,
                 (c_custkey * 7 % 160) / 4.0 + 0.125 AS py
          FROM customer WHERE c_custkey <= 600) p
      ON abs(p.px - (s.s_suppkey % 160) / 4.0) < (s.s_suppkey % 4 + 1) / 4.0
     AND abs(p.py - (s.s_suppkey * 3 % 160) / 4.0) < (s.s_suppkey % 4 + 1) / 4.0
    GROUP BY s.s_suppkey
    ORDER BY s.s_suppkey
    """,
    tags=("geometry", "join"),
)
def p_geom_contains_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial containment join: JVM bbox prejoin + exact ST_Contains residual
    (the SpatialJoinOperator candidate/residual split).  Points carry a 1/8
    nudge so none touches a boundary — strict containment == bbox test."""
    t = T(spark, sf_dir)
    sq = _squares(t).withColumn("wkt", _sq_wkt(F.col("cx"), F.col("cy"), F.col("s")))
    pts = _points(t, 600).withColumn(
        "pt_wkt",
        F.concat(
            F.lit("POINT ("),
            F.cast("string", F.col("px")),
            F.lit(" "),
            F.cast("string", F.col("py")),
            F.lit(")"),
        ),
    )
    # bbox prejoin stays JVM-side; the pandas-UDF predicate only sees survivors
    cand = F.broadcast(sq).join(
        pts,
        (F.abs(pts.px - sq.cx) <= sq.s) & (F.abs(pts.py - sq.cy) <= sq.s),
    )
    return (
        cand.where(G.st_contains(F.col("wkt"), F.col("pt_wkt")))
        .groupBy("s_suppkey")
        .agg(F.count("*").alias("n_inside"))
        .orderBy("s_suppkey")
    )


@probe(
    "p_geom_distance_grid",
    oracle="""
    SELECT c_custkey,
           CAST(ROUND((
             POW(GREATEST(abs(((c_custkey % 160) / 4.0 + 0.125) - 20.0) - 10.0, 0), 2) +
             POW(GREATEST(abs(((c_custkey * 7 % 160) / 4.0 + 0.125) - 20.0) - 10.0, 0), 2)
           ) * 64) AS BIGINT) AS d2_64
    FROM customer WHERE c_custkey <= 400
    ORDER BY c_custkey
    """,
    tags=("geometry",),
)
def p_geom_distance_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Distance point-to-polygon vs the closed-form box distance; compared
    as 64*d^2, an exact integer on the eighth-grid (GeoFunctions.java
    stDistance planar parity)."""
    t = T(spark, sf_dir)
    box = "POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))"
    pts = _points(t, 400).withColumn(
        "pt_wkt",
        F.concat(
            F.lit("POINT ("),
            F.cast("string", F.col("px")),
            F.lit(" "),
            F.cast("string", F.col("py")),
            F.lit(")"),
        ),
    )
    d = G.st_distance_planar(F.lit(box), F.col("pt_wkt"))
    return pts.select(
        "c_custkey",
        F.round(d * d * 64).cast("long").alias("d2_64"),
    ).orderBy("c_custkey")


@probe(
    "p_geom_envelope_groups",
    oracle="""
    WITH p AS (
      SELECT c_nationkey,
             (c_custkey % 160) / 4.0 AS px,
             (c_custkey * 7 % 160) / 4.0 AS py
      FROM customer WHERE c_custkey <= 800)
    SELECT c_nationkey,
           CAST(ROUND((max(px) - min(px)) * (max(py) - min(py)) * 16) AS BIGINT) AS env_area16,
           CAST(ROUND(min(px) * 4) AS BIGINT) AS xmin4,
           CAST(ROUND(max(py) * 4) AS BIGINT) AS ymax4,
           COUNT(*) AS npts
    FROM p GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("geometry", "aggregate"),
)
def p_geom_envelope_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation MULTIPOINT assembled with collect_list, then
    ST_Envelope/ST_Area/ST_XMin/ST_YMax through the kernel vs grouped
    min/max arithmetic (GeoFunctions.java stEnvelope parity)."""
    t = T(spark, sf_dir)
    pts = (
        t.customer.where(F.col("c_custkey") <= 800)
        .select(
            "c_nationkey",
            "c_custkey",
            (F.col("c_custkey") % 160 / 4.0).alias("px"),
            (F.col("c_custkey") * 7 % 160 / 4.0).alias("py"),
        )
        .withColumn(
            "pt",
            F.concat(
                F.cast("string", F.col("px")), F.lit(" "), F.cast("string", F.col("py"))
            ),
        )
    )
    mp = pts.groupBy("c_nationkey").agg(
        F.concat(
            F.lit("MULTIPOINT ("), F.concat_ws(", ", F.collect_list("pt")), F.lit(")")
        ).alias("wkt"),
        F.count("*").alias("npts"),
    )
    env = G.GEOMETRY_UDFS["st_envelope"](F.col("wkt"))
    return mp.select(
        "c_nationkey",
        F.round(G.st_area(env) * 16).cast("long").alias("env_area16"),
        F.round(G.st_xmin(F.col("wkt")) * 4).cast("long").alias("xmin4"),
        F.round(G.st_ymax(F.col("wkt")) * 4).cast("long").alias("ymax4"),
        "npts",
    ).orderBy("c_nationkey")


@probe(
    "p_geom_intersection",
    oracle="""
    WITH sq AS (
      SELECT s_suppkey,
             (s_suppkey % 160) / 4.0 AS cx,
             (s_suppkey * 3 % 160) / 4.0 AS cy,
             (s_suppkey % 4 + 1) / 4.0 AS s
      FROM supplier)
    SELECT s_suppkey,
           CAST(ROUND(
             GREATEST(LEAST(cx + s, 30.0) - GREATEST(cx - s, 10.0), 0) *
             GREATEST(LEAST(cy + s, 30.0) - GREATEST(cy - s, 10.0), 0) * 16
           ) AS BIGINT) AS inter_area16
    FROM sq ORDER BY s_suppkey
    """,
    tags=("geometry",),
)
def p_geom_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Intersection (convex Sutherland-Hodgman clip) of each supplier
    square against a fixed window, verified as the closed-form overlap
    rectangle area in exact 16ths (GeoFunctions.java stIntersection,
    convex subset)."""
    t = T(spark, sf_dir)
    window = "POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))"
    sq = _squares(t).withColumn("wkt", _sq_wkt(F.col("cx"), F.col("cy"), F.col("s")))
    inter_area = G.GEOMETRY_UDFS["st_intersection_area"](F.col("wkt"), F.lit(window))
    return sq.select(
        "s_suppkey",
        F.round(inter_area * 16).cast("long").alias("inter_area16"),
    ).orderBy("s_suppkey")


@probe(
    "p_geom_ring_intersection_area",
    oracle="""
    WITH sq AS (
      SELECT s_suppkey,
             (s_suppkey % 160) / 4.0 AS cx,
             (s_suppkey * 3 % 160) / 4.0 AS cy,
             (s_suppkey % 4 + 1) / 4.0 AS s
      FROM supplier),
    ov AS (
      SELECT s_suppkey,
             GREATEST(LEAST(cx + s, 30.0) - GREATEST(cx - s, 10.0), 0) *
             GREATEST(LEAST(cy + s, 30.0) - GREATEST(cy - s, 10.0), 0) AS outer_ov,
             GREATEST(LEAST(cx + s/2, 30.0) - GREATEST(cx - s/2, 10.0), 0) *
             GREATEST(LEAST(cy + s/2, 30.0) - GREATEST(cy - s/2, 10.0), 0) AS hole_ov
      FROM sq)
    SELECT s_suppkey,
           CAST(ROUND((outer_ov - hole_ov) * 64) AS BIGINT) AS ring_area64
    FROM ov ORDER BY s_suppkey
    """,
    tags=("geometry",),
)
def p_geom_ring_intersection_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General (non-convex capable) intersection AREA: a square ring with
    a centered hole clipped against a fixed window, computed by the
    triangulated signed sum (functions/geometry.geom_intersection_area)
    and verified as outer-overlap minus hole-overlap in exact 64ths."""
    t = T(spark, sf_dir)
    window = "POLYGON ((10 10, 30 10, 30 30, 10 30, 10 10))"

    def n(c):
        return F.cast("string", c)

    cx, cy, s = F.col("cx"), F.col("cy"), F.col("s")
    h = s / 2
    ring_wkt = F.concat(
        F.lit("POLYGON (("),
        n(cx - s), F.lit(" "), n(cy - s), F.lit(", "),
        n(cx + s), F.lit(" "), n(cy - s), F.lit(", "),
        n(cx + s), F.lit(" "), n(cy + s), F.lit(", "),
        n(cx - s), F.lit(" "), n(cy + s), F.lit(", "),
        n(cx - s), F.lit(" "), n(cy - s),
        F.lit("), ("),
        n(cx - h), F.lit(" "), n(cy - h), F.lit(", "),
        n(cx + h), F.lit(" "), n(cy - h), F.lit(", "),
        n(cx + h), F.lit(" "), n(cy + h), F.lit(", "),
        n(cx - h), F.lit(" "), n(cy + h), F.lit(", "),
        n(cx - h), F.lit(" "), n(cy - h),
        F.lit("))"),
    )
    sq = _squares(t).withColumn("wkt", ring_wkt)
    area = G.GEOMETRY_UDFS["st_intersection_area"](F.col("wkt"), F.lit(window))
    return sq.select(
        "s_suppkey",
        F.round(area * 64).cast("long").alias("ring_area64"),
    ).orderBy("s_suppkey")


@probe(
    "p_geom_buffer",
    oracle="SELECT TRUE AS area_ok, TRUE AS contains_center, TRUE AS radius_ok",
    tags=("geometry",),
)
def p_geom_buffer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Buffer (point subset): per-customer radius disks; the oracle
    gates the approximation invariants relationally — 32-gon area within
    1% of pi*r^2, center contained, every hull vertex on the radius
    (checked via st_distance from the center point)."""
    import math

    pts = _points(T(spark, sf_dir), 200)
    r = (F.col("c_custkey") % 3 + 1).cast("double")
    pt_wkt = F.concat(
        F.lit("POINT ("), F.cast("string", F.col("px")), F.lit(" "),
        F.cast("string", F.col("py")), F.lit(")"),
    )
    buf = G.GEOMETRY_UDFS["st_buffer"](pt_wkt, r)
    checked = pts.select(
        (
            (F.abs(G.st_area(buf) - math.pi * r * r) / (math.pi * r * r)) < 0.01
        ).alias("a_ok"),
        G.st_contains(buf, pt_wkt).alias("c_ok"),
        (
            F.abs(
                (G.st_xmax(buf) - G.st_xmin(buf)) / 2 - r
            ) < 1e-9
        ).alias("r_ok"),
    )
    return checked.agg(
        F.min("a_ok").alias("area_ok"),
        F.min("c_ok").alias("contains_center"),
        F.min("r_ok").alias("radius_ok"),
    )


@probe(
    "p_geom_setops_general",
    oracle="""
    SELECT s_suppkey,
           CAST(4 * s * s AS BIGINT)  AS inter_a,
           CAST(16 * s * s AS BIGINT) AS union_a,
           CAST(8 * s * s AS BIGINT)  AS diff_a,
           CAST(12 * s * s AS BIGINT) AS sym_a,
           CAST(20 * s * s AS BIGINT) AS diff_holed_a
    FROM (SELECT s_suppkey, s_suppkey % 3 + 1 AS s FROM supplier WHERE s_suppkey <= 200)
    ORDER BY s_suppkey
    """,
    tags=("geometry",),
)
def p_geom_setops_general(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRY output of set ops on NON-CONVEX / holed polygons (the
    convex-decomposition clipper — GeoFunctions.java stIntersection/stUnion/
    stDifference/stSymDifference for arbitrary simple polygons).  Per
    supplier an L-shape (area 12 s^2) against an offset rectangle
    (area 8 s^2): every set-op AREA has the closed form 4/16/8/12 s^2;
    the holed column differences a ringed square (32 s^2) against a
    square covering its hole (-> 20 s^2).  All coordinates are integers,
    so the piece areas are exact."""

    def n(c):
        return F.cast("string", c)

    t = T(spark, sf_dir)
    base = spread(t.supplier.where(F.col("s_suppkey") <= 200)).select(
        "s_suppkey", (F.col("s_suppkey") % 3 + 1).cast("int").alias("s")
    )
    s = F.col("s")
    lshape = F.concat(
        F.lit("POLYGON ((0 0, "), n(4 * s), F.lit(" 0, "), n(4 * s), F.lit(" "),
        n(2 * s), F.lit(", "), n(2 * s), F.lit(" "), n(2 * s), F.lit(", "),
        n(2 * s), F.lit(" "), n(4 * s), F.lit(", 0 "), n(4 * s), F.lit(", 0 0))"),
    )
    rect = F.concat(
        F.lit("POLYGON (("), n(s), F.lit(" "), n(s), F.lit(", "), n(5 * s),
        F.lit(" "), n(s), F.lit(", "), n(5 * s), F.lit(" "), n(3 * s),
        F.lit(", "), n(s), F.lit(" "), n(3 * s), F.lit(", "), n(s), F.lit(" "),
        n(s), F.lit("))"),
    )
    holed = F.concat(
        F.lit("POLYGON ((0 0, "), n(6 * s), F.lit(" 0, "), n(6 * s), F.lit(" "),
        n(6 * s), F.lit(", 0 "), n(6 * s), F.lit(", 0 0), ("), n(2 * s),
        F.lit(" "), n(2 * s), F.lit(", "), n(4 * s), F.lit(" "), n(2 * s),
        F.lit(", "), n(4 * s), F.lit(" "), n(4 * s), F.lit(", "), n(2 * s),
        F.lit(" "), n(4 * s), F.lit(", "), n(2 * s), F.lit(" "), n(2 * s),
        F.lit("))"),
    )
    cover = F.concat(
        F.lit("POLYGON (("), n(s), F.lit(" "), n(s), F.lit(", "), n(5 * s),
        F.lit(" "), n(s), F.lit(", "), n(5 * s), F.lit(" "), n(5 * s),
        F.lit(", "), n(s), F.lit(" "), n(5 * s), F.lit(", "), n(s), F.lit(" "),
        n(s), F.lit("))"),
    )

    def a(col):
        return F.round(G.st_area(col)).cast("long")

    inter = G.GEOMETRY_UDFS["st_intersection"](lshape, rect)
    union = G.GEOMETRY_UDFS["st_union"](lshape, rect)
    diff = G.GEOMETRY_UDFS["st_difference"](lshape, rect)
    sym = G.GEOMETRY_UDFS["st_symdifference"](lshape, rect)
    dhol = G.GEOMETRY_UDFS["st_difference"](holed, cover)
    return base.select(
        "s_suppkey",
        a(inter).alias("inter_a"),
        a(union).alias("union_a"),
        a(diff).alias("diff_a"),
        a(sym).alias("sym_a"),
        a(dhol).alias("diff_holed_a"),
    ).orderBy("s_suppkey")


@probe(
    "p_geom_buffer_line",
    oracle="""
    SELECT TRUE AS area_ok, TRUE AS contains_ok, TRUE AS extent_ok,
           (SELECT COUNT(*) FROM supplier WHERE s_suppkey <= 200) AS n_checked
    """,
    tags=("geometry",),
)
def p_geom_buffer_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Buffer over LINESTRING inputs (Minkowski capsule).  The 32-gon
    capsule of a length-L segment has the closed form
    2*r*L + 16*r^2*sin(pi/16); the oracle gates area (to 1e-6), midpoint
    containment, and the exact bbox extent (the 32-gon has vertices at
    angles 0/90/180/270, so xmax-xmin = L + 2r exactly)."""
    import math

    t = T(spark, sf_dir)
    base = spread(t.supplier.where(F.col("s_suppkey") <= 200)).select(
        "s_suppkey",
        ((F.col("s_suppkey") % 5 + 1) * 8).cast("double").alias("L"),
        (F.col("s_suppkey") % 3 + 1).cast("double").alias("r"),
    )
    Lc, rc = F.col("L"), F.col("r")
    line = F.concat(
        F.lit("LINESTRING (0 0, "), F.cast("string", Lc), F.lit(" 0)")
    )
    mid = F.concat(
        F.lit("POINT ("), F.cast("string", Lc / 2), F.lit(" 0)")
    )
    buf = G.GEOMETRY_UDFS["st_buffer"](line, rc)
    closed_form = 2 * rc * Lc + 16 * rc * rc * math.sin(math.pi / 16)
    checked = base.select(
        (F.abs(G.st_area(buf) - closed_form) < 1e-6).alias("a_ok"),
        G.st_contains(buf, mid).alias("c_ok"),
        (
            (F.abs((G.st_xmax(buf) - G.st_xmin(buf)) - (Lc + 2 * rc)) < 1e-9)
            & (F.abs((G.st_ymax(buf) - G.st_ymin(buf)) - 2 * rc) < 1e-9)
        ).alias("e_ok"),
    )
    return checked.agg(
        F.min("a_ok").alias("area_ok"),
        F.min("c_ok").alias("contains_ok"),
        F.min("e_ok").alias("extent_ok"),
        F.count(F.lit(1)).alias("n_checked"),
    )


@probe(
    "p_spherical_area",
    oracle="""
    SELECT TRUE AS tri_ok, TRUE AS len_ok,
           (SELECT COUNT(*) FROM supplier WHERE s_suppkey <= 150) AS n_checked
    """,
    tags=("geometry",),
)
def p_spherical_area(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SphericalGeography measures (functions/spherical.py —
    GeoFunctions.java stSphericalArea/stSphericalLength, R = 6371.01 km).
    Per supplier a pole-equator-equator triangle spanning L degrees of
    longitude: its spherical area is EXACTLY radians(L) * R^2 (octant =
    1/8 sphere at L=90), and a meridian arc of length D degrees measures
    radians(D) * R — both checked to 1e-9 relative."""
    import math

    from trino_private_spark.functions import spherical as S

    t = T(spark, sf_dir)
    base = spread(t.supplier.where(F.col("s_suppkey") <= 150)).select(
        "s_suppkey",
        (F.col("s_suppkey") % 89 + 1).cast("int").alias("L"),
        (F.col("s_suppkey") % 79 + 1).cast("int").alias("D"),
    )
    tri = F.concat(
        F.lit("POLYGON ((0 0, "), F.cast("string", F.col("L")),
        F.lit(" 0, 0 90, 0 0))"),
    )
    arc = F.concat(
        F.lit("LINESTRING (10 0, 10 "), F.cast("string", F.col("D")), F.lit(")")
    )
    r2 = S.EARTH_RADIUS_M * S.EARTH_RADIUS_M
    area = S.st_geography_area(tri)
    length = S.st_geography_length(arc)
    expect_area = F.radians(F.col("L").cast("double")) * r2
    expect_len = F.radians(F.col("D").cast("double")) * S.EARTH_RADIUS_M
    checked = base.select(
        (F.abs(area - expect_area) / expect_area < 1e-9).alias("a_ok"),
        (F.abs(length - expect_len) / expect_len < 1e-9).alias("l_ok"),
    )
    return checked.agg(
        F.min("a_ok").alias("tri_ok"),
        F.min("l_ok").alias("len_ok"),
        F.count(F.lit(1)).alias("n_checked"),
    )


@probe(
    "p_line_locate",
    oracle="""
    SELECT s_suppkey,
           ROUND(LEAST(GREATEST(CAST(s_suppkey % 11 AS DOUBLE), 0), s_suppkey % 7 + 3)
                 / (s_suppkey % 7 + 3), 9) AS frac
    FROM supplier WHERE s_suppkey <= 200 ORDER BY s_suppkey
    """,
    tags=("geometry",),
)
def p_line_locate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """line_locate_point (GeoFunctions.java:630): fraction of the line's
    length at the closest point.  Axis-aligned lines make the projection a
    clamp — exact closed-form division on both engines."""
    from trino_private_spark.functions import geometry_agg as GA

    t = T(spark, sf_dir)
    base = spread(t.supplier.where(F.col("s_suppkey") <= 200)).select(
        "s_suppkey",
        (F.col("s_suppkey") % 7 + 3).alias("L"),
        (F.col("s_suppkey") % 11).alias("px"),
    )
    line = F.concat(F.lit("LINESTRING (0 0, "), F.cast("string", F.col("L")), F.lit(" 0)"))
    pt = F.concat(
        F.lit("POINT ("), F.cast("string", F.col("px")), F.lit(" "),
        F.cast("string", F.col("s_suppkey") % 3 - 1), F.lit(")"),
    )
    return base.select(
        "s_suppkey",
        F.round(GA.line_locate_point(line, pt), 9).alias("frac"),
    ).orderBy("s_suppkey")


@probe(
    "p_spatial_agg",
    oracle="""
    SELECT CAST(n_nationkey % 5 AS BIGINT) AS grp,
           CAST(16 AS BIGINT) AS union_area,
           CAST(20 AS BIGINT) AS hull_area
    FROM nation GROUP BY n_nationkey % 5 ORDER BY grp
    """,
    tags=("geometry",),
)
def p_spatial_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial aggregates (ConvexHullAggregation.java /
    GeometryUnionAgg.java): five diagonal 2x2 squares per group at offsets
    r=0..4 — geometry_union_agg area = 4m - (m-1) = 16 (consecutive
    squares overlap 1x1) and convex_hull_agg area = (m+1)^2 - (m-1)^2 =
    20, both closed-form."""
    from trino_private_spark.functions import geometry_agg as GA
    from trino_private_spark.functions import geometry as G

    t = T(spark, sf_dir)
    r = (F.col("n_nationkey") / 5).cast("int")

    def n(c):
        return F.cast("string", c)

    sq = F.concat(
        F.lit("POLYGON (("),
        n(r), F.lit(" "), n(r), F.lit(", "),
        n(r + 2), F.lit(" "), n(r), F.lit(", "),
        n(r + 2), F.lit(" "), n(r + 2), F.lit(", "),
        n(r), F.lit(" "), n(r + 2), F.lit(", "),
        n(r), F.lit(" "), n(r),
        F.lit("))"),
    )
    base = t.nation.select((F.col("n_nationkey") % 5).cast("long").alias("grp"), sq.alias("wkt"))
    uni = GA.geometry_union_agg(base, "wkt", ["grp"]).select(
        "grp", F.round(G.st_area(F.col("geom"))).cast("long").alias("union_area")
    )
    hull = GA.convex_hull_agg(base, "wkt", ["grp"]).select(
        "grp", F.round(G.st_area(F.col("hull"))).cast("long").alias("hull_area")
    )
    return uni.join(hull, "grp").orderBy("grp")


@probe(
    "p_geometry_ext",
    oracle="""
    SELECT s_suppkey,
           CAST((s_suppkey % 4 + 1) * (s_suppkey % 6 + 5) AS BIGINT) AS interp_x5,
           CAST(4 * (s_suppkey % 4 + 1) * (s_suppkey % 4 + 1) AS BIGINT) AS gj_area,
           CAST(2 AS BIGINT) AS simp_pts,
           CAST(s_suppkey % 5 + 1 AS BIGINT) AS near_dist,
           CASE WHEN s_suppkey % 2 = 0 THEN 'Exterior ring is self-intersecting' END AS reason,
           CAST(2 * ((s_suppkey % 3 + 2) + 1) AS BIGINT) AS chain_union_area
    FROM supplier WHERE s_suppkey <= 200 ORDER BY s_suppkey
    """,
    tags=("geometry",),
)
def p_geometry_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial completion surface (functions/geometry_ext.py):
    line_interpolate_point (axis line, exact fraction k/5),
    GeoJSON round trip (area preserved), simplify_geometry (noisy midpoint
    collapses to 2 points), geometry_nearest_points (square-to-point gap),
    geometry_invalid_reason (bowtie vs valid square), and
    geometry_union(array) over a 1-offset chain of 2x2 squares
    (union area = 2*(m+1)) — every column closed-form."""
    from trino_private_spark.functions import geometry as G
    from trino_private_spark.functions import geometry_ext as GX

    def n(c):
        return F.cast("string", c)

    t = T(spark, sf_dir)
    base = spread(t.supplier.where(F.col("s_suppkey") <= 200)).select(
        "s_suppkey",
        (F.col("s_suppkey") % 6 + 5).alias("L"),
        (F.col("s_suppkey") % 4 + 1).alias("k"),   # fraction k/5; square side k
        (F.col("s_suppkey") % 5 + 1).alias("gap"),
        (F.col("s_suppkey") % 3 + 2).alias("m"),   # chain length
    )
    L, k, gap, m = F.col("L"), F.col("k"), F.col("gap"), F.col("m")
    line = F.concat(F.lit("LINESTRING (0 0, "), n(L), F.lit(" 0)"))
    interp = GX.GEOMETRY_UDFS["line_interpolate_point"](line, k.cast("double") / 5)
    # x-coordinate * 5 = k * L exactly
    interp_x5 = F.round(G.GEOMETRY_UDFS["st_x_wkt"](interp) * 5).cast("long")

    sq = F.concat(
        F.lit("POLYGON ((0 0, "), n(2 * k), F.lit(" 0, "), n(2 * k), F.lit(" "),
        n(2 * k), F.lit(", 0 "), n(2 * k), F.lit(", 0 0))"),
    )
    gj_rt = GX.GEOMETRY_UDFS["from_geojson_geometry"](
        GX.GEOMETRY_UDFS["to_geojson_geometry"](sq)
    )
    gj_area = F.round(G.st_area(gj_rt)).cast("long")

    noisy = F.concat(
        F.lit("LINESTRING (0 0, "), n(L), F.lit(" 0.01, "), n(2 * L), F.lit(" 0)")
    )
    simp = GX.GEOMETRY_UDFS["simplify_geometry"](noisy, F.lit(0.5))
    simp_pts = G.GEOMETRY_UDFS["st_num_points"](simp).cast("long")

    pt = F.concat(F.lit("POINT ("), n(2 * k + gap), F.lit(" 1)"))
    pair = GX.GEOMETRY_UDFS["geometry_nearest_points"](sq, pt)
    near_dist = F.round(
        G.GEOMETRY_UDFS["st_distance_planar"](
            F.element_at(pair, 1), F.element_at(pair, 2)
        )
    ).cast("long")

    bowtie = F.lit("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
    reason = GX.GEOMETRY_UDFS["geometry_invalid_reason"](
        F.when(F.col("s_suppkey") % 2 == 0, bowtie).otherwise(sq)
    )

    chain = F.transform(
        F.sequence(F.lit(0), m - 1),
        lambda r: F.concat(
            F.lit("POLYGON (("), n(r), F.lit(" 0, "), n(r + 2), F.lit(" 0, "),
            n(r + 2), F.lit(" 2, "), n(r), F.lit(" 2, "), n(r), F.lit(" 0))"),
        ),
    )
    chain_area = F.round(
        G.st_area(GX.GEOMETRY_UDFS["geometry_union"](chain))
    ).cast("long")

    return base.select(
        "s_suppkey",
        interp_x5.alias("interp_x5"),
        gj_area.alias("gj_area"),
        simp_pts.alias("simp_pts"),
        near_dist.alias("near_dist"),
        reason.alias("reason"),
        chain_area.alias("chain_union_area"),
    ).orderBy("s_suppkey")


@probe(
    "p_st_relate",
    oracle="""
    SELECT s_suppkey,
           CASE s_suppkey % 5
             WHEN 0 THEN '212101212'  -- overlap
             WHEN 1 THEN 'FF2FF1212'  -- disjoint
             WHEN 2 THEN 'FF2F11212'  -- edge touch
             WHEN 3 THEN '212FF1FF2'  -- contains
             ELSE '2FFF1FFF2'         -- equals
           END AS matrix,
           CAST(s_suppkey % 5 = 0 AS BOOLEAN) AS is_overlap
    FROM supplier WHERE s_suppkey <= 200 ORDER BY s_suppkey
    """,
    tags=("geometry",),
)
def p_st_relate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST_Relate / DE-9IM (functions/geometry_relate.py — GeoFunctions
    stRelate): five canonical polygon configurations keyed per row, the
    full 9-char matrix plus a pattern match — the expected strings are
    the OGC-standard matrices for overlap / disjoint / edge-touch /
    containment / equality."""
    from trino_private_spark.functions import geometry_relate as R

    t = T(spark, sf_dir)
    a = F.lit("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    cfg = F.col("s_suppkey") % 5
    b = (
        F.when(cfg == 0, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        .when(cfg == 1, "POLYGON ((9 9, 10 9, 10 10, 9 10, 9 9))")
        .when(cfg == 2, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))")
        .when(cfg == 3, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
        .otherwise("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
    )
    base = spread(t.supplier.where(F.col("s_suppkey") <= 200)).select("s_suppkey")
    return base.select(
        "s_suppkey",
        R.GEOMETRY_UDFS["geometry_de9im"](a, b).alias("matrix"),
        R.GEOMETRY_UDFS["st_relate"](a, b, F.lit("T*T***T**")).alias("is_overlap"),
    ).orderBy("s_suppkey")


@probe(
    "p_hadoop_shape",
    oracle="""
    SELECT s_suppkey,
           CAST((s_suppkey % 4 + 1) * (s_suppkey % 4 + 1) * 4 AS BIGINT) AS area,
           'ST_Polygon' AS gtype
    FROM supplier WHERE s_suppkey <= 200 ORDER BY s_suppkey
    """,
    tags=("geometry",),
)
def p_hadoop_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geometry_from_hadoop_shape (GeoFunctions.java:321 — the
    [wkid][tag][ESRI shapefile record] layout): per-row squares encoded to
    the binary format and decoded back; area and type closed-form."""
    from trino_private_spark.functions import geometry as G
    from trino_private_spark.functions import geometry_ext as GX

    def n(c):
        return F.cast("string", c)

    t = T(spark, sf_dir)
    k = (F.col("s_suppkey") % 4 + 1).cast("int")
    sq = F.concat(
        F.lit("POLYGON ((0 0, "), n(2 * k), F.lit(" 0, "), n(2 * k), F.lit(" "),
        n(2 * k), F.lit(", 0 "), n(2 * k), F.lit(", 0 0))"),
    )
    rt = GX.GEOMETRY_UDFS["geometry_from_hadoop_shape"](
        GX.GEOMETRY_UDFS["geometry_to_hadoop_shape"](sq)
    )
    return (
        spread(t.supplier.where(F.col("s_suppkey") <= 200))
        .select(
            "s_suppkey",
            F.round(G.st_area(rt)).cast("long").alias("area"),
            G.GEOMETRY_UDFS["st_geometry_type"](rt).alias("gtype"),
        )
        .orderBy("s_suppkey")
    )


@probe(
    "p_geom_traced_wkt",
    oracle="""
    SELECT * FROM (VALUES
      (1,
       'POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))',
       'POLYGON ((0 0, 2 0, 2 1, 3 1, 3 3, 1 3, 1 2, 0 2, 0 0))',
       'POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))',
       'MULTIPOLYGON (((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0)), ((1 2, 2 2, 2 1, 3 1, 3 3, 1 3, 1 2)))'),
      (2,
       'POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))',
       'POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))',
       'POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))',
       'POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))')
    ) t(id, inter_wkt, union_wkt, diff_wkt, sym_wkt)
    ORDER BY id
    """,
    tags=("geometry",),
)
def p_geom_traced_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CANONICAL traced GEOMETRY output of the set operations, pinned to
    exact WKT: overlapping squares (staircase union, L difference, two-L
    sym-difference as a MULTIPOLYGON) and a contained square (holed
    difference — shell CCW, hole CW, rings rotated to the smallest
    vertex).  The oracle states the canonical strings literally, so any
    regression in tracing, orientation, nesting or vertex
    canonicalization flips the hash."""
    from trino_private_spark.functions.geometry import register_geometry_udfs

    register_geometry_udfs(spark)
    rows = [
        (1, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"),
        (2, "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))", "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"),
    ]
    df = spark.createDataFrame(rows, "id int, wa string, wb string")
    df.createOrReplaceTempView("v_traced_pairs")
    return spark.sql(
        """
        SELECT id,
               st_intersection(wa, wb) AS inter_wkt,
               st_union(wa, wb) AS union_wkt,
               st_difference(wa, wb) AS diff_wkt,
               st_symdifference(wa, wb) AS sym_wkt
        FROM v_traced_pairs ORDER BY id
        """
    )
