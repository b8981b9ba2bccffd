"""Planar geometry kernel (functions/geometry.py) — parity with the
reference's GeoFunctions.java ST_* semantics on hand-computed fixtures,
plus the Spark pandas-UDF layer end-to-end."""

from __future__ import annotations

import math

import numpy as np
import pytest

from trino_private_spark.functions import geometry as G


def g(w: str) -> G.Geom:
    return G.parse_wkt(w)


SQUARE = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
SQUARE_HOLE = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))"
LSHAPE = "POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"
CONCAVE = "POLYGON ((0 0, 4 0, 4 4, 2 2, 0 4, 0 0))"


class TestParseFormat:
    def test_roundtrip_polygon(self):
        assert G.to_wkt(g(SQUARE)) == SQUARE

    def test_roundtrip_multipolygon(self):
        w = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))"
        assert G.to_wkt(g(w)) == w

    def test_ring_auto_close(self):
        # unclosed ring input is closed on parse (reference rejects; we repair)
        gg = g("POLYGON ((0 0, 4 0, 4 4, 0 4))")
        assert np.array_equal(gg.rings[0][0], gg.rings[0][-1])

    def test_empty_forms(self):
        for w in ("POINT EMPTY", "LINESTRING EMPTY", "POLYGON EMPTY", "MULTIPOLYGON EMPTY"):
            assert g(w).is_empty()
            assert G.to_wkt(g(w)) == w

    def test_collection(self):
        w = "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))"
        assert G.to_wkt(g(w)) == w

    def test_multipoint_both_syntaxes(self):
        assert G.to_wkt(g("MULTIPOINT ((1 2), (3 4))")) == "MULTIPOINT (1 2, 3 4)"
        assert G.to_wkt(g("MULTIPOINT (1 2, 3 4)")) == "MULTIPOINT (1 2, 3 4)"

    def test_parse_error(self):
        with pytest.raises(ValueError):
            g("POLYGON 0 0")


class TestMeasures:
    def test_area_square(self):
        assert G.geom_area(g(SQUARE)) == 16.0

    def test_area_hole(self):
        assert G.geom_area(g(SQUARE_HOLE)) == 15.0

    def test_area_orientation_insensitive(self):
        cw = "POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))"
        assert G.geom_area(g(cw)) == 16.0

    def test_area_multipolygon(self):
        w = "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))"
        assert G.geom_area(g(w)) == 5.0

    def test_length(self):
        assert G.geom_length(g("LINESTRING (0 0, 3 4)")) == 5.0
        assert G.geom_length(g("MULTILINESTRING ((0 0, 1 0), (0 0, 0 2))")) == 3.0

    def test_perimeter(self):
        assert G._perimeter(g(SQUARE)) == 16.0

    def test_centroid_square(self):
        assert G.geom_centroid(g(SQUARE)) == (2.0, 2.0)

    def test_centroid_lshape(self):
        # L-shape = union of [0,2]x[0,1] (area 2, c=(1,0.5)) and [0,1]x[1,2]
        # (area 1, c=(0.5,1.5)) -> ((2*1+1*0.5)/3, (2*0.5+1*1.5)/3)
        cx, cy = G.geom_centroid(g(LSHAPE))
        assert math.isclose(cx, 2.5 / 3)
        assert math.isclose(cy, 2.5 / 3)

    def test_centroid_with_hole(self):
        # symmetric hole at center keeps centroid at center
        w = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))"
        cx, cy = G.geom_centroid(g(w))
        assert math.isclose(cx, 2.0) and math.isclose(cy, 2.0)

    def test_centroid_linestring_length_weighted(self):
        cx, cy = G.geom_centroid(g("LINESTRING (0 0, 2 0, 2 1)"))
        # segments: len 2 mid (1,0); len 1 mid (2,0.5)
        assert math.isclose(cx, (2 * 1 + 1 * 2) / 3)
        assert math.isclose(cy, (2 * 0 + 1 * 0.5) / 3)

    def test_centroid_multipoint(self):
        assert G.geom_centroid(g("MULTIPOINT (0 0, 2 0, 2 2, 0 2)")) == (1.0, 1.0)


class TestPredicates:
    def test_point_in_polygon(self):
        assert G.geom_contains(g(SQUARE), g("POINT (2 2)"))
        assert not G.geom_contains(g(SQUARE), g("POINT (5 2)"))

    def test_point_on_boundary_not_contained_but_intersects(self):
        assert not G.geom_contains(g(SQUARE), g("POINT (0 2)"))
        assert G.geom_intersects(g(SQUARE), g("POINT (0 2)"))

    def test_point_in_hole(self):
        assert not G.geom_contains(g(SQUARE_HOLE), g("POINT (1.5 1.5)"))
        assert G.geom_contains(g(SQUARE_HOLE), g("POINT (3 3)"))

    def test_concave_containment(self):
        assert G.geom_contains(g(CONCAVE), g("POINT (2 1)"))
        assert not G.geom_contains(g(CONCAVE), g("POINT (2 3)"))  # in the notch

    def test_polygon_in_polygon(self):
        inner = "POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))"
        assert G.geom_contains(g(SQUARE), g(inner))
        assert not G.geom_contains(g(inner), g(SQUARE))

    def test_polygon_straddling_hole_not_contained(self):
        straddle = "POLYGON ((1.2 1.2, 1.8 1.2, 1.8 1.8, 1.2 1.8, 1.2 1.2))"
        assert not G.geom_contains(g(SQUARE_HOLE), g(straddle))

    def test_line_in_polygon(self):
        assert G.geom_contains(g(SQUARE), g("LINESTRING (1 1, 3 3)"))
        assert not G.geom_contains(g(SQUARE), g("LINESTRING (1 1, 5 5)"))

    def test_intersects_overlapping_squares(self):
        other = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
        assert G.geom_intersects(g(SQUARE), g(other))
        assert G.geom_overlaps(g(SQUARE), g(other))
        assert not G.geom_contains(g(SQUARE), g(other))

    def test_disjoint(self):
        far = "POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))"
        assert not G.geom_intersects(g(SQUARE), g(far))

    def test_edge_crossing_without_vertex_containment(self):
        # plus-sign style cross: neither's vertices inside the other
        horiz = "POLYGON ((-1 1, 5 1, 5 3, -1 3, -1 1))"
        vert = "POLYGON ((1 -1, 3 -1, 3 5, 1 5, 1 -1))"
        assert G.geom_intersects(g(horiz), g(vert))
        assert G.geom_overlaps(g(horiz), g(vert))

    def test_touches_edge_adjacent(self):
        right = "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))"
        assert G.geom_touches(g(SQUARE), g(right))
        assert G.geom_intersects(g(SQUARE), g(right))
        assert not G.geom_overlaps(g(SQUARE), g(right))

    def test_touches_corner(self):
        corner = "POLYGON ((4 4, 5 4, 5 5, 4 5, 4 4))"
        assert G.geom_touches(g(SQUARE), g(corner))

    def test_not_touches_when_overlapping(self):
        other = "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))"
        assert not G.geom_touches(g(SQUARE), g(other))

    def test_crosses_line_polygon(self):
        assert G.geom_crosses(g("LINESTRING (-1 2, 5 2)"), g(SQUARE))
        assert not G.geom_crosses(g("LINESTRING (1 1, 3 3)"), g(SQUARE))  # within

    def test_crosses_lines(self):
        assert G.geom_crosses(g("LINESTRING (0 0, 2 2)"), g("LINESTRING (0 2, 2 0)"))
        assert not G.geom_crosses(g("LINESTRING (0 0, 1 1)"), g("LINESTRING (2 2, 3 3)"))

    def test_equals_rotated_ring(self):
        r1 = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        r2 = "POLYGON ((4 0, 4 4, 0 4, 0 0, 4 0))"
        assert G.geom_equals(g(r1), g(r2))
        assert not G.geom_equals(g(r1), g(SQUARE_HOLE))

    def test_is_valid(self):
        assert G.geom_is_valid(g(SQUARE))
        bowtie = "POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))"
        assert not G.geom_is_valid(g(bowtie))


class TestDistance:
    def test_point_point(self):
        assert G.geom_distance(g("POINT (0 0)"), g("POINT (3 4)")) == 5.0

    def test_point_segment(self):
        assert G.geom_distance(g("POINT (2 3)"), g("LINESTRING (0 0, 4 0)")) == 3.0

    def test_point_segment_endpoint(self):
        assert G.geom_distance(g("POINT (7 4)"), g("LINESTRING (0 0, 4 0)")) == 5.0

    def test_polygon_polygon(self):
        far = "POLYGON ((7 0, 9 0, 9 2, 7 2, 7 0))"
        assert G.geom_distance(g(SQUARE), g(far)) == 3.0

    def test_zero_when_intersecting(self):
        assert G.geom_distance(g(SQUARE), g("POINT (1 1)")) == 0.0


class TestConstructions:
    def test_envelope(self):
        w = G.to_wkt(G.geom_envelope(g("LINESTRING (1 2, 5 -1, 3 4)")))
        assert w == "POLYGON ((1 -1, 5 -1, 5 4, 1 4, 1 -1))"

    def test_boundary_polygon(self):
        assert G.to_wkt(G.geom_boundary(g(SQUARE))) == "LINESTRING (0 0, 4 0, 4 4, 0 4, 0 0)"

    def test_boundary_line(self):
        w = G.to_wkt(G.geom_boundary(g("LINESTRING (0 0, 1 1)")))
        assert w == "MULTIPOINT (0 0, 1 1)"

    def test_convex_hull_square_plus_inner(self):
        w = "MULTIPOINT (0 0, 4 0, 4 4, 0 4, 2 2, 1 3)"
        hull = G.geom_convex_hull(g(w))
        assert G.geom_area(hull) == 16.0
        assert G.geom_equals(hull, g(SQUARE))

    def test_convex_hull_collinear(self):
        hull = G.geom_convex_hull(g("MULTIPOINT (0 0, 1 1, 2 2)"))
        assert hull.kind == "LineString"

    def test_convex_hull_concave_polygon(self):
        hull = G.geom_convex_hull(g(CONCAVE))
        assert G.geom_area(hull) == 16.0


class TestSparkLayer:
    @pytest.fixture(autouse=True)
    def _register(self, spark):
        G.register_geometry_udfs(spark)

    def test_sql_end_to_end(self, spark):
        df = spark.createDataFrame(
            [(1, SQUARE), (2, SQUARE_HOLE), (3, LSHAPE)], ["id", "wkt"]
        )
        df.createOrReplaceTempView("shapes")
        rows = spark.sql(
            """
            SELECT id, st_area(wkt) a, st_perimeter(wkt) p,
                   st_num_interior_ring(wkt) h, st_centroid(wkt) c,
                   st_geometry_type(wkt) t
            FROM shapes ORDER BY id
            """
        ).collect()
        assert [r.a for r in rows] == [16.0, 15.0, 3.0]
        assert rows[0].p == 16.0
        assert [r.h for r in rows] == [0, 1, 0]
        assert rows[0].c == "POINT (2 2)"
        assert rows[0].t == "ST_Polygon"

    def test_sql_predicates(self, spark):
        df = spark.createDataFrame(
            [
                (1, SQUARE, "POINT (2 2)"),
                (2, SQUARE, "POINT (9 9)"),
                (3, SQUARE, "POINT (0 2)"),
            ],
            ["id", "poly", "pt"],
        )
        df.createOrReplaceTempView("pairs")
        rows = spark.sql(
            """SELECT id, st_contains(poly, pt) c, st_intersects(poly, pt) i,
                      st_distance_planar(poly, pt) d
               FROM pairs ORDER BY id"""
        ).collect()
        assert [r.c for r in rows] == [True, False, False]
        assert [r.i for r in rows] == [True, False, True]
        assert rows[1].d == math.hypot(5, 5)

    def test_sql_accessors(self, spark):
        rows = spark.sql(
            """SELECT st_point_n('LINESTRING (0 0, 1 1, 2 4)', 2) p2,
                      st_geometry_n('MULTIPOINT (5 5, 6 6)', 1) g1,
                      st_start_point('LINESTRING (9 9, 0 0)') sp,
                      st_num_points('POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))') np,
                      st_xmax('LINESTRING (1 2, 5 -1)') xmx,
                      st_is_ring('LINESTRING (0 0, 1 0, 1 1, 0 0)') ir
            """
        ).collect()[0]
        assert rows.p2 == "POINT (1 1)"
        assert rows.g1 == "POINT (5 5)"
        assert rows.sp == "POINT (9 9)"
        assert rows.np == 4
        assert rows.xmx == 5.0
        assert rows.ir is True


class TestEngineRegistration:
    def test_register_all_exposes_st_and_tdigest(self, spark):
        import pyspark.sql.functions as F
        from trino_private_spark.functions import register_all
        from trino_private_spark.functions.tdigest import tdigest_agg

        register_all(spark)
        spark.createDataFrame([(1, SQUARE)], ["id", "wkt"]).createOrReplaceTempView(
            "reg_g"
        )
        row = spark.sql(
            "SELECT ST_Area(wkt) a, ST_Contains(wkt, 'POINT (1 1)') c FROM reg_g"
        ).collect()[0]
        assert row.a == 16.0 and row.c is True
        df = spark.range(0, 5000).select((F.col("id") % 100).cast("double").alias("v"))
        tdigest_agg(df, "v", None).createOrReplaceTempView("reg_sk")
        p50 = spark.sql(
            "SELECT value_at_quantile(tdigest, 0.5) p FROM reg_sk"
        ).collect()[0].p
        assert abs(p50 - 49.5) < 5


class TestPropertyBased:
    """Randomized invariants over the geometry kernel (hypothesis)."""

    def _rect(self, x0, y0, w, h):
        x1, y1 = x0 + w, y0 + h
        return G.parse_wkt(
            f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
        )

    def test_rect_invariants(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        coords = st.floats(-1e3, 1e3, allow_nan=False, allow_infinity=False)
        sides = st.floats(0.001, 1e3, allow_nan=False, allow_infinity=False)

        @settings(max_examples=60, deadline=None)
        @given(coords, coords, sides, sides)
        def check(x0, y0, w, h):
            r = self._rect(x0, y0, w, h)
            assert abs(G.geom_area(r) - w * h) <= 1e-6 * max(1.0, w * h)
            assert abs(G._perimeter(r) - 2 * (w + h)) <= 1e-6 * max(1.0, w + h)
            cx, cy = G.geom_centroid(r)
            assert abs(cx - (x0 + w / 2)) <= 1e-6 * max(1.0, abs(x0) + w)
            assert abs(cy - (y0 + h / 2)) <= 1e-6 * max(1.0, abs(y0) + h)
            # centroid strictly inside => contains
            assert G.geom_contains(r, G.parse_wkt(f"POINT ({cx} {cy})"))
            # hull of a convex polygon is itself
            assert G.geom_equals(G.geom_convex_hull(r), r)

        check()

    def test_containment_consistency(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        unit = st.floats(0.0, 100.0, allow_nan=False, allow_infinity=False)

        @settings(max_examples=60, deadline=None)
        @given(unit, unit, st.floats(1.0, 20.0), unit, unit)
        def check(x0, y0, s, px, py):
            # the kernel snaps points within ~1e-12 of an edge to the
            # boundary (intentional); only test clearly-separated points
            margin = 1e-6
            dx = min(abs(px - x0), abs(px - (x0 + s)))
            dy = min(abs(py - y0), abs(py - (y0 + s)))
            if dx < margin or dy < margin:
                return
            r = self._rect(x0, y0, s, s)
            p = G.parse_wkt(f"POINT ({px} {py})")
            inside = x0 < px < x0 + s and y0 < py < y0 + s
            if inside:
                assert G.geom_contains(r, p)
                assert G.geom_intersects(r, p)
                assert G.geom_distance(r, p) == 0.0
            else:
                assert not G.geom_contains(r, p)
                assert not G.geom_intersects(r, p)
                assert G.geom_distance(r, p) > 0.0

        check()

    def test_wkt_roundtrip_random_polylines(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        pts = st.lists(
            st.tuples(st.floats(-50, 50, allow_nan=False), st.floats(-50, 50, allow_nan=False)),
            min_size=2,
            max_size=12,
        )

        @settings(max_examples=60, deadline=None)
        @given(pts)
        def check(coords):
            w = "LINESTRING (" + ", ".join(f"{G._fmt(x)} {G._fmt(y)}" for x, y in coords) + ")"
            gg = G.parse_wkt(w)
            assert G.to_wkt(G.parse_wkt(G.to_wkt(gg))) == G.to_wkt(gg)
            # length is order-reversal invariant
            rev = G.Geom("LineString", coords=gg.coords[::-1].copy())
            assert abs(G.geom_length(gg) - G.geom_length(rev)) <= 1e-9

        check()


class TestConvexClip:
    def test_overlapping_squares(self):
        a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        b = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        inter = G.geom_intersection(a, b)
        assert G.geom_area(inter) == 4.0
        assert G.geom_equals(inter, g("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"))

    def test_contained_square(self):
        a = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        b = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
        assert G.geom_area(G.geom_intersection(a, b)) == 1.0

    def test_disjoint_gives_empty(self):
        a = g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
        b = g("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")
        assert G.geom_intersection(a, b).is_empty()

    def test_triangle_square(self):
        tri = g("POLYGON ((0 0, 4 0, 0 4, 0 0))")
        sq = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
        # triangle x >= 0, y >= 0, x+y <= 4 clipped to [0,2]^2: area 4 - 0 = ?
        # inside square, region x+y<=4 covers all but the corner triangle
        # above x+y=4: corners (2,2) only touches the line -> full square
        assert G.geom_area(G.geom_intersection(tri, sq)) == 4.0

    def test_triangle_square_partial(self):
        tri = g("POLYGON ((0 0, 2 0, 0 2, 0 0))")
        sq = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
        assert G.geom_area(G.geom_intersection(tri, sq)) == 2.0

    def test_clockwise_inputs_normalized(self):
        a = g("POLYGON ((0 0, 0 4, 4 4, 4 0, 0 0))")  # CW
        b = g("POLYGON ((2 2, 2 6, 6 6, 6 2, 2 2))")  # CW
        assert G.geom_area(G.geom_intersection(a, b)) == 4.0

    def test_non_convex_falls_through_to_general_clipper(self):
        concave = g(CONCAVE)
        sq = g(SQUARE)
        out = G.geom_intersection(concave, sq)
        assert abs(G.geom_area(out) - G.geom_intersection_area(concave, sq)) < 1e-9

    def test_point_cases(self):
        sq = g(SQUARE)
        assert G.to_wkt(G.geom_intersection(g("POINT (1 1)"), sq)) == "POINT (1 1)"
        assert G.geom_intersection(g("POINT (9 9)"), sq).is_empty()


class TestTypedConstructors:
    def test_st_polygon_and_line_from_text(self, spark):
        G.register_geometry_udfs(spark)
        row = spark.sql(
            """SELECT st_polygon('POLYGON ((0 0, 1 0, 1 1, 0 0))') p,
                      st_line_from_text('LINESTRING (0 0, 2 2)') l"""
        ).collect()[0]
        assert row.p == "POLYGON ((0 0, 1 0, 1 1, 0 0))"
        assert row.l == "LINESTRING (0 0, 2 2)"
        import pytest as _pt

        with _pt.raises(Exception):
            spark.sql("SELECT st_polygon('POINT (1 1)')").collect()


class TestUnion:
    def test_disjoint_polygons(self):
        a = g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))")
        b = g("POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))")
        u = G.geom_union(a, b)
        assert u.kind == "MultiPolygon"
        assert G.geom_area(u) == 2.0

    def test_contained(self):
        outer = g(SQUARE)
        inner = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
        assert G.geom_equals(G.geom_union(outer, inner), outer)
        assert G.geom_equals(G.geom_union(inner, outer), outer)

    def test_points(self):
        u = G.geom_union(g("POINT (1 1)"), g("POINT (2 2)"))
        assert G.to_wkt(u) == "MULTIPOINT (1 1, 2 2)"

    def test_empty_identity(self):
        assert G.geom_equals(G.geom_union(g(SQUARE), g("POLYGON EMPTY")), g(SQUARE))

    def test_overlapping_union_general(self):
        a = g(SQUARE)
        b = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        # union 28 = 16 + 16 - 4 via the convex-decomposition clipper
        assert abs(G.geom_area(G.geom_union(a, b)) - 28.0) < 1e-9

    def test_union_area_inclusion_exclusion(self):
        # convex overlap: area via inclusion-exclusion with the convex clip
        a = g(SQUARE)
        b = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        area = G.geom_area(a) + G.geom_area(b) - G.geom_area(G.geom_intersection(a, b))
        assert area == 16.0 + 16.0 - 4.0


class TestTriangulatedAreas:
    def test_lshape_in_square(self):
        sq = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
        assert G.geom_intersection_area(g(LSHAPE), sq) == 3.0

    def test_concave_fully_covered(self):
        big = g("POLYGON ((-1 -1, 5 -1, 5 5, -1 5, -1 -1))")
        assert G.geom_intersection_area(g(CONCAVE), big) == G.geom_area(g(CONCAVE))

    def test_hole_respected_both_sides(self):
        shift = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        hole = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
        # overlap region [2,4]^2 (4) minus hole part [2,3]^2 (1)
        assert G.geom_intersection_area(hole, shift) == 3.0

    def test_partial_lshape(self):
        shifted = g("POLYGON ((0.5 0.5, 3 0.5, 3 3, 0.5 3, 0.5 0.5))")
        assert G.geom_intersection_area(g(LSHAPE), shifted) == 1.25

    def test_disjoint_zero(self):
        far = g("POLYGON ((10 10, 11 10, 11 11, 10 11, 10 10))")
        assert G.geom_intersection_area(g(LSHAPE), far) == 0.0

    def test_union_and_difference_areas(self):
        a = g(SQUARE)
        b = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        assert G.geom_union_area(a, b) == 28.0
        assert G.geom_difference_area(a, b) == 12.0

    def test_matches_convex_clip_on_convex_inputs(self):
        a = g(SQUARE)
        b = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        via_clip = G.geom_area(G.geom_intersection(a, b))
        assert abs(G.geom_intersection_area(a, b) - via_clip) < 1e-9

    def test_triangulation_covers_area(self):
        import numpy as np

        for wkt in (SQUARE, LSHAPE, CONCAVE):
            gg = g(wkt)
            tris = G._triangulate(gg.rings[0])
            tot = sum(
                abs(G._ring_signed_area(np.vstack([t, t[:1]]))) for t in tris
            )
            assert abs(tot - abs(G._ring_signed_area(gg.rings[0]))) < 1e-9, wkt


class TestWkb:
    CASES = [
        "POINT (1.5 -2.25)",
        "LINESTRING (0 0, 1 1, 2 4)",
        SQUARE,
        SQUARE_HOLE,
        "MULTIPOINT (1 2, 3 4)",
        "MULTILINESTRING ((0 0, 1 0), (0 0, 0 2))",
        "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)), ((5 5, 6 5, 6 6, 5 5)))",
        "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
    ]

    def test_roundtrip_all_kinds(self):
        for w in self.CASES:
            gg = g(w)
            back = G.from_wkb(G.to_wkb(gg))
            assert G.to_wkt(back) == G.to_wkt(gg), w

    def test_known_point_encoding(self):
        # 01 01000000 then two LE doubles — the canonical WKB for POINT(1 2)
        b = G.to_wkb(g("POINT (1 2)"))
        assert b.hex() == "0101000000000000000000f03f0000000000000040"

    def test_big_endian_decoding(self):
        import struct

        b = b"\x00" + struct.pack(">I", 1) + struct.pack(">dd", 3.0, 4.0)
        assert G.to_wkt(G.from_wkb(b)) == "POINT (3 4)"

    def test_sql_roundtrip(self, spark):
        G.register_geometry_udfs(spark)
        spark.createDataFrame([(1, SQUARE)], ["id", "wkt"]).createOrReplaceTempView(
            "wkb_t"
        )
        row = spark.sql(
            "SELECT st_geom_from_binary(st_asbinary(wkt)) rt, st_area(st_geom_from_binary(st_asbinary(wkt))) a FROM wkb_t"
        ).collect()[0]
        assert row.rt == SQUARE
        assert row.a == 16.0

    def test_duckdb_cross_engine(self):
        # DuckDB can parse our WKB via its spatial extension if present;
        # fall back to byte-level spot checks otherwise.
        import duckdb

        con = duckdb.connect()
        try:
            con.execute("INSTALL spatial; LOAD spatial")
        except Exception:
            return  # extension unavailable offline — covered by vectors above
        b = G.to_wkb(g(SQUARE))
        area = con.execute(
            "SELECT ST_Area(ST_GeomFromWKB(?))", [b]
        ).fetchone()[0]
        assert area == 16.0


class TestBufferAndSymDifference:
    def test_point_buffer_properties(self):
        import math

        buf = G.geom_buffer_point(g("POINT (3 4)"), 2.0)
        # regular 32-gon: exact area formula, ~99.36% of the disk
        want = 0.5 * 32 * 4.0 * math.sin(2 * math.pi / 32)
        assert abs(G.geom_area(buf) - want) < 1e-9
        assert G.geom_area(buf) > math.pi * 4.0 * 0.99
        assert G.geom_contains(buf, g("POINT (3 4)"))
        # all vertices at distance r from the center
        for x, y in buf.rings[0][:-1]:
            assert abs(math.hypot(x - 3, y - 4) - 2.0) < 1e-9

    def test_buffer_rejects_non_points(self):
        import pytest as _pt

        with _pt.raises(ValueError):
            G.geom_buffer_point(g(SQUARE), 1.0)

    def test_sym_difference_area(self):
        a = g(SQUARE)
        b = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        # union 28, intersection 4 -> xor 24
        assert G.geom_sym_difference_area(a, b) == 24.0
        assert G.geom_sym_difference_area(a, a) == 0.0


class TestGeneralSetOps:
    """GEOMETRY output of set ops on arbitrary simple polygons — the
    convex-decomposition clipper (reference: GeoFunctions.java
    stIntersection/stUnion/stDifference/stSymDifference via the ESRI
    topological clipper)."""

    L = "POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))"  # area 12, non-convex
    R = "POLYGON ((1 1, 5 1, 5 3, 1 3, 1 1))"  # area 8; overlap 4

    def test_nonconvex_intersection_geometry(self):
        out = G.geom_intersection(g(self.L), g(self.R))
        assert out.kind in ("Polygon", "MultiPolygon")
        assert abs(G.geom_area(out) - 4.0) < 1e-9
        # matches the triangulated closed-form area path
        assert abs(G.geom_area(out) - G.geom_intersection_area(g(self.L), g(self.R))) < 1e-9

    def test_nonconvex_union_difference_sym(self):
        a, b = g(self.L), g(self.R)
        assert abs(G.geom_area(G.geom_union(a, b)) - 16.0) < 1e-9
        assert abs(G.geom_area(G.geom_difference(a, b)) - 8.0) < 1e-9
        assert abs(G.geom_area(G.geom_sym_difference(a, b)) - 12.0) < 1e-9

    def test_holed_set_ops(self):
        ring = g(
            "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
        )  # area 32
        cover = g("POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))")  # 16; hole overlap 4
        assert abs(G.geom_area(G.geom_intersection(ring, cover)) - 12.0) < 1e-9
        assert abs(G.geom_area(G.geom_difference(ring, cover)) - 20.0) < 1e-9
        assert abs(G.geom_area(G.geom_union(ring, cover)) - 36.0) < 1e-9

    def test_contains_sees_holes(self):
        ring = g(
            "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
        )
        cover = g("POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))")
        # cover spans the hole -> part of it is in ring's exterior
        assert not G.geom_contains(ring, cover)
        # away from the hole containment still holds
        assert G.geom_contains(ring, g("POLYGON ((0.5 0.5, 1.5 0.5, 1.5 1.5, 0.5 1.5, 0.5 0.5))"))

    def test_intersection_pieces_inside_both(self):
        out = G.geom_intersection(g(self.L), g(self.R))
        parts = out.parts if out.kind == "MultiPolygon" else [out]
        for p in parts:
            c = G.geom_centroid(p)
            pt = G.Geom("Point", pt=c)
            assert G.geom_contains(g(self.L), pt)
            assert G.geom_contains(g(self.R), pt)

    def test_difference_disjoint_from_subtrahend_interior(self):
        # output parts may be canonically traced NON-convex rings (whose
        # centroid can fall outside themselves), so sample guaranteed
        # interior points: the centroid of every triangle of each part
        out = G.geom_difference(g(self.L), g(self.R))
        parts = out.parts if out.kind == "MultiPolygon" else [out]
        checked = 0
        for p in parts:
            for tri in G._triangulate(p.rings[0]):
                c = (
                    sum(t[0] for t in tri) / 3.0,
                    sum(t[1] for t in tri) / 3.0,
                )
                if any(
                    G._point_in_ring(c, hole) >= 0 for hole in p.rings[1:]
                ):
                    continue
                assert not G.geom_contains(g(self.R), G.Geom("Point", pt=c))
                checked += 1
        assert checked > 0

    def test_convex_fast_path_still_single_ring(self):
        a = g(SQUARE)
        b = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        out = G.geom_intersection(a, b)
        assert out.kind == "Polygon" and len(out.rings) == 1
        assert G.geom_area(out) == 4.0


class TestGeneralBuffer:
    def test_line_buffer_closed_form(self):
        buf = G.geom_buffer(g("LINESTRING (0 0, 10 0)"), 2.0)
        want = 2 * 2.0 * 10 + 0.5 * 32 * 4.0 * math.sin(2 * math.pi / 32)
        assert abs(G.geom_area(buf) - want) < 1e-9
        assert G.geom_contains(buf, g("POINT (5 0)"))
        assert not G.geom_contains(buf, g("POINT (5 2.5)"))

    def test_polygon_buffer_closed_form(self):
        buf = G.geom_buffer(g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"), 1.0)
        cap32 = 0.5 * 32 * 1.0 * math.sin(2 * math.pi / 32)
        assert abs(G.geom_area(buf) - (100 + 40 + cap32)) < 1e-9
        assert G.geom_contains(buf, g("POINT (10.9 5)"))
        assert not G.geom_contains(buf, g("POINT (11.05 11.05)"))

    def test_holed_polygon_buffer_fills_small_hole(self):
        holed = g(
            "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (4 4, 6 4, 6 6, 4 6, 4 4))"
        )
        plain = g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
        # every point of the 2x2 hole is within 1 of its boundary
        assert abs(G.geom_area(G.geom_buffer(holed, 1.0)) - G.geom_area(G.geom_buffer(plain, 1.0))) < 1e-6

    def test_multipoint_buffer_merges_overlap(self):
        a32 = 0.5 * 32 * 1.0 * math.sin(2 * math.pi / 32)
        area = G.geom_area(G.geom_buffer(g("MULTIPOINT ((0 0), (1 0))"), 1.0))
        assert a32 < area < 2 * a32  # overlapping disks counted once

    def test_negative_radius_rejected(self):
        with pytest.raises(ValueError):
            G.geom_buffer(g("LINESTRING (0 0, 1 0)"), -1.0)

    def test_zero_radius_identity(self):
        out = G.geom_buffer(g(SQUARE), 0.0)
        assert G.to_wkt(out) == SQUARE


class TestClipperFuzz:
    """Randomized identities for the general set-op clipper: for random
    simple (star-shaped) polygons, the GEOMETRY outputs' areas must obey
    inclusion-exclusion against the independent triangulated area path."""

    @staticmethod
    def _star(seed, cx, cy):
        import numpy as np

        rng = np.random.default_rng(seed)
        n = int(rng.integers(5, 12))
        # one angle per equal sector (jittered): strictly increasing and
        # spanning the full circle, so the radial polygon is ALWAYS simple
        # (clustered angles would let the closing edge cross the chain)
        step = 2 * math.pi / n
        angles = np.arange(n) * step + rng.uniform(0.05, 0.95, n) * step
        radii = rng.uniform(0.5, 3.0, n)
        pts = [
            (cx + r * math.cos(a), cy + r * math.sin(a))
            for a, r in zip(angles, radii)
        ]
        ring = np.array(pts + [pts[0]], dtype=float)
        return G.Geom("Polygon", rings=[ring])

    def test_random_pairs_identities(self):
        for seed in range(25):
            a = self._star(seed * 2 + 1, 0.0, 0.0)
            b = self._star(seed * 2 + 2, 1.0, 0.5)
            ia = G.geom_intersection_area(a, b)
            inter = G.geom_intersection(a, b)
            union = G.geom_union(a, b)
            diff = G.geom_difference(a, b)
            sym = G.geom_sym_difference(a, b)
            aa, ab = G.geom_area(a), G.geom_area(b)
            tol = 1e-7 * max(1.0, aa + ab)
            assert abs(G.geom_area(inter) - ia) < tol, seed
            assert abs(G.geom_area(union) - (aa + ab - ia)) < tol, seed
            assert abs(G.geom_area(diff) - (aa - ia)) < tol, seed
            assert abs(G.geom_area(sym) - (aa + ab - 2 * ia)) < tol, seed

    def test_self_identities(self):
        for seed in range(10):
            a = self._star(seed + 100, 0.0, 0.0)
            aa = G.geom_area(a)
            tol = 1e-9 * max(1.0, aa)
            assert abs(G.geom_area(G.geom_intersection(a, a)) - aa) < tol
            assert abs(G.geom_area(G.geom_difference(a, a))) < tol
            assert abs(G.geom_area(G.geom_sym_difference(a, a))) < tol

    def test_disjoint_pairs(self):
        for seed in range(10):
            a = self._star(seed + 200, 0.0, 0.0)
            b = self._star(seed + 300, 10.0, 10.0)
            assert G.geom_intersection(a, b).is_empty()
            aa, ab = G.geom_area(a), G.geom_area(b)
            assert abs(G.geom_area(G.geom_union(a, b)) - (aa + ab)) < 1e-9


class TestSphericalGeography:
    """stSphericalArea / stSphericalLength (functions/spherical.py)."""

    def test_octant_exact(self):
        from trino_private_spark.functions.spherical import (
            EARTH_RADIUS_M,
            geom_spherical_area,
        )

        sphere = 4 * math.pi * EARTH_RADIUS_M**2
        area = geom_spherical_area(g("POLYGON ((0 0, 90 0, 0 90, 0 0))"))
        assert abs(area - sphere / 8) / (sphere / 8) < 1e-12

    def test_orientation_invariant(self):
        from trino_private_spark.functions.spherical import geom_spherical_area

        a = geom_spherical_area(g("POLYGON ((0 0, 90 0, 0 90, 0 0))"))
        b = geom_spherical_area(g("POLYGON ((0 0, 0 90, 90 0, 0 0))"))
        assert abs(a - b) < 1e-3

    def test_small_square_matches_planar(self):
        from trino_private_spark.functions.spherical import (
            EARTH_RADIUS_M,
            geom_spherical_area,
        )

        deg = math.pi / 180 * EARTH_RADIUS_M
        approx = deg * deg * math.cos(math.radians(0.5))
        area = geom_spherical_area(g("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))"))
        assert abs(area - approx) / approx < 1e-3

    def test_polar_cap_winding_correction(self):
        from trino_private_spark.functions.spherical import (
            EARTH_RADIUS_M,
            geom_spherical_area,
        )

        pts = ", ".join(f"{lon} 80" for lon in range(0, 360, 10)) + ", 0 80"
        cap = geom_spherical_area(g(f"POLYGON (({pts}))"))
        smooth = 2 * math.pi * EARTH_RADIUS_M**2 * (1 - math.sin(math.radians(80)))
        # 36-gon inscribed cap: slightly smaller than the smooth cap
        assert 0.97 * smooth < cap < smooth

    def test_hole_subtracts(self):
        from trino_private_spark.functions.spherical import geom_spherical_area

        full = geom_spherical_area(g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))"))
        hole = geom_spherical_area(g("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))"))
        holed = geom_spherical_area(
            g("POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))")
        )
        assert abs(holed - (full - hole)) < 1.0

    def test_length_quarter_equator(self):
        from trino_private_spark.functions.spherical import (
            EARTH_RADIUS_M,
            geom_spherical_length,
        )

        got = geom_spherical_length(g("LINESTRING (0 0, 90 0)"))
        assert abs(got - math.pi * EARTH_RADIUS_M / 2) < 1e-3

    def test_kind_checks(self):
        from trino_private_spark.functions.spherical import (
            geom_spherical_area,
            geom_spherical_length,
        )

        with pytest.raises(ValueError):
            geom_spherical_area(g("LINESTRING (0 0, 1 1)"))
        with pytest.raises(ValueError):
            geom_spherical_length(g(SQUARE))


class TestGeometryAggregates:
    def test_line_locate_variants(self):
        from trino_private_spark.functions.geometry_agg import _line_locate

        line = g("LINESTRING (0 0, 10 0)")
        assert _line_locate(line, g("POINT (3 5)")) == 0.3
        assert _line_locate(line, g("POINT (-4 1)")) == 0.0
        assert _line_locate(line, g("POINT (15 0)")) == 1.0
        ml = g("MULTILINESTRING ((0 0, 4 0), (4 0, 4 4))")
        assert _line_locate(ml, g("POINT (5 3)")) == 0.875
        with pytest.raises(ValueError):
            _line_locate(g(SQUARE), g("POINT (0 0)"))
        with pytest.raises(ValueError):
            _line_locate(line, g(SQUARE))

    def test_union_agg_chain(self, spark):
        from trino_private_spark.functions.geometry_agg import geometry_union_agg

        rows = [
            ("a", f"POLYGON (({r} {r}, {r+2} {r}, {r+2} {r+2}, {r} {r+2}, {r} {r}))")
            for r in range(5)
        ]
        df = spark.createDataFrame(rows, "grp string, wkt string")
        out = geometry_union_agg(df, "wkt", ["grp"]).collect()
        assert len(out) == 1
        assert abs(G.geom_area(g(out[0]["geom"])) - 16.0) < 1e-9

    def test_hull_agg(self, spark):
        from trino_private_spark.functions.geometry_agg import convex_hull_agg

        rows = [("a", "POINT (0 0)"), ("a", "POINT (4 0)"), ("a", "POINT (0 4)"),
                ("a", "POINT (1 1)"), ("b", "LINESTRING (0 0, 2 0)")]
        df = spark.createDataFrame(rows, "grp string, wkt string")
        out = {r["grp"]: r["hull"] for r in convex_hull_agg(df, "wkt", ["grp"]).collect()}
        assert abs(G.geom_area(g(out["a"])) - 8.0) < 1e-9  # right triangle
        assert G.geom_area(g(out["b"])) == 0.0  # collinear -> degenerate hull


class TestGeometryExt:
    def test_geojson_roundtrip(self):
        from trino_private_spark.functions.geometry_ext import (
            geom_from_geojson,
            geom_to_geojson,
        )

        for w in (
            "POINT (1 2)",
            "LINESTRING (0 0, 1 1)",
            SQUARE_HOLE,
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 0)))",
            "MULTIPOINT (1 2, 3 4)",
            "GEOMETRYCOLLECTION (POINT (1 2), LINESTRING (0 0, 1 1))",
        ):
            assert G.to_wkt(geom_from_geojson(geom_to_geojson(g(w)))) == w

    def test_line_interpolate(self):
        from trino_private_spark.functions.geometry_ext import line_interpolate

        assert line_interpolate(g("LINESTRING (0 0, 10 0)"), 0.3) == "POINT (3 0)"
        assert line_interpolate(g("LINESTRING (0 0, 4 0, 4 4)"), 0.75) == "POINT (4 2)"
        assert line_interpolate(g("LINESTRING (0 0, 10 0)"), 0.0) == "POINT (0 0)"
        assert line_interpolate(g("LINESTRING (0 0, 10 0)"), 1.0) == "POINT (10 0)"
        with pytest.raises(ValueError):
            line_interpolate(g("LINESTRING (0 0, 1 0)"), 1.5)
        with pytest.raises(ValueError):
            line_interpolate(g(SQUARE), 0.5)

    def test_simplify(self):
        from trino_private_spark.functions.geometry_ext import simplify_dp

        out = simplify_dp(g("LINESTRING (0 0, 5 0.1, 10 0)"), 0.5)
        assert len(out.coords) == 2
        keep = simplify_dp(g("LINESTRING (0 0, 5 3, 10 0)"), 0.5)
        assert len(keep.coords) == 3
        poly = simplify_dp(g("POLYGON ((0 0, 2 0.01, 4 0, 4 4, 0 4, 0 0))"), 0.1)
        assert G.geom_area(poly) == 16.0
        with pytest.raises(ValueError):
            simplify_dp(g(SQUARE), -1.0)

    def test_is_simple_and_invalid_reason(self):
        from trino_private_spark.functions.geometry_ext import (
            geom_invalid_reason,
            geom_is_simple,
        )

        assert not geom_is_simple(g("LINESTRING (0 0, 2 2, 2 0, 0 2)"))
        assert geom_is_simple(g("LINESTRING (0 0, 1 1, 2 0)"))
        assert not geom_is_simple(g("MULTIPOINT (1 1, 1 1)"))
        assert geom_is_simple(g(SQUARE))
        assert geom_invalid_reason(g(SQUARE)) is None
        assert "self-intersecting" in geom_invalid_reason(
            g("POLYGON ((0 0, 2 2, 2 0, 0 2, 0 0))")
        )
        assert "outside shell" in geom_invalid_reason(
            g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (10 10, 11 10, 11 11, 10 11, 10 10))")
        )

    def test_nearest_points(self):
        from trino_private_spark.functions.geometry_ext import nearest_points

        got = nearest_points(g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"), g("POINT (5 1)"))
        assert got == ["POINT (2 1)", "POINT (5 1)"]
        got2 = nearest_points(g("LINESTRING (0 0, 0 4)"), g("LINESTRING (3 1, 6 1)"))
        assert got2 == ["POINT (0 1)", "POINT (3 1)"]

    def test_geometry_union_list(self):
        from trino_private_spark.functions.geometry_ext import geometry_union_list

        ws = [
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
            "POLYGON ((1 0, 3 0, 3 2, 1 2, 1 0))",
            "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))",
        ]
        assert abs(G.geom_area(g(geometry_union_list(ws))) - 8.0) < 1e-9


class TestDe9im:
    """ST_Relate / DE-9IM (functions/geometry_relate.py)."""

    def _m(self, a, b):
        from trino_private_spark.functions.geometry_relate import de9im

        return de9im(g(a), g(b))

    def test_polygon_configurations(self):
        sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        assert self._m(sq, "POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))") == "212101212"
        assert self._m(sq, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))") == "FF2FF1212"
        assert self._m(sq, "POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))") == "FF2F11212"
        assert self._m(sq, "POLYGON ((4 4, 5 4, 5 5, 4 5, 4 4))") == "FF2F01212"
        assert self._m(sq, "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))") == "212FF1FF2"
        assert self._m(sq, sq) == "2FFF1FFF2"

    def test_point_cases(self):
        sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        assert self._m("POINT (2 2)", sq) == "0FFFFF212"
        assert self._m("POINT (0 2)", sq) == "F0FFFF212"
        assert self._m("POINT (9 9)", sq) == "FF0FFF212"

    def test_line_cases(self):
        sq = "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))"
        # crossing line: endpoints exterior -> BI=F, BE=0
        assert self._m("LINESTRING (-1 2, 5 2)", sq) == "101FF0212"
        # crossing lines (X): interiors meet at a point
        assert self._m("LINESTRING (0 0, 2 2)", "LINESTRING (0 2, 2 0)") == "0F1FF0102"

    def test_relate_pattern_matching(self):
        from trino_private_spark.functions.geometry_relate import (
            relate_pattern,
            st_relate,
        )

        sq = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        other = g("POLYGON ((2 2, 6 2, 6 6, 2 6, 2 2))")
        assert st_relate(sq, other, "T*T***T**")  # overlaps
        assert not st_relate(sq, other, "FF*FF****")  # disjoint pattern
        assert relate_pattern("212101212", "212101212")
        assert relate_pattern("212101212", "*********")
        with pytest.raises(ValueError):
            relate_pattern("212101212", "TT")

    def test_named_predicates_consistency(self):
        # DE-9IM patterns must agree with the kernel's named predicates
        from trino_private_spark.functions.geometry_relate import st_relate

        sq = g("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))")
        inner = g("POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))")
        touch = g("POLYGON ((4 0, 8 0, 8 4, 4 4, 4 0))")
        assert st_relate(sq, inner, "T*****FF*") == G.geom_contains(sq, inner)
        # OGC touches = FT******* | F**T***** | F***T****
        touches_de9im = any(
            st_relate(sq, touch, p) for p in ("FT*******", "F**T*****", "F***T****")
        )
        assert touches_de9im == G.geom_touches(sq, touch)
        assert st_relate(sq, inner, "T********") == G.geom_intersects(sq, inner)


class TestHadoopShape:
    def test_roundtrip_all_kinds(self):
        from trino_private_spark.functions.geometry_ext import (
            geom_to_hadoop_shape,
            hadoop_shape_to_geom,
        )

        for w in (
            "POINT (3 4)",
            "MULTIPOINT (1 2, 3 4)",
            "LINESTRING (0 0, 1 1, 2 0)",
            "MULTILINESTRING ((0 0, 1 1), (2 2, 3 3))",
            SQUARE,
            SQUARE_HOLE,
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))",
        ):
            gg = g(w)
            rt = hadoop_shape_to_geom(geom_to_hadoop_shape(gg))
            assert abs(G.geom_area(rt) - G.geom_area(gg)) < 1e-9, w
            assert abs(G.geom_length(rt) - G.geom_length(gg)) < 1e-9, w
            assert G.geom_centroid(rt) == G.geom_centroid(gg), w
            assert rt.dimension() == gg.dimension(), w

    def test_holes_attach_to_containing_shell(self):
        from trino_private_spark.functions.geometry_ext import (
            geom_to_hadoop_shape,
            hadoop_shape_to_geom,
        )

        w = (
            "MULTIPOLYGON (((0 0, 10 0, 10 10, 0 10, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1)),"
            " ((20 20, 30 20, 30 30, 20 30, 20 20), (21 21, 22 21, 22 22, 21 22, 21 21)))"
        )
        rt = hadoop_shape_to_geom(geom_to_hadoop_shape(g(w)))
        assert rt.kind == "MultiPolygon"
        assert all(len(p.rings) == 2 for p in rt.parts)
        assert abs(G.geom_area(rt) - 198.0) < 1e-9

    def test_short_input_raises(self):
        from trino_private_spark.functions.geometry_ext import hadoop_shape_to_geom

        with pytest.raises(ValueError):
            hadoop_shape_to_geom(b"\x00\x00")


class TestInterpolatePointsAndSphericalCast:
    def test_interpolate_points(self):
        from trino_private_spark.functions.geometry_ext import (
            line_interpolate_points_list,
        )

        pts = line_interpolate_points_list(g("LINESTRING (0 0, 10 0)"), 0.25)
        assert pts == ["POINT (2.5 0)", "POINT (5 0)", "POINT (7.5 0)", "POINT (10 0)"]
        assert line_interpolate_points_list(g("LINESTRING (0 0, 10 0)"), 1.0) == [
            "POINT (10 0)"
        ]
        with pytest.raises(ValueError):
            line_interpolate_points_list(g("LINESTRING (0 0, 1 0)"), 0.0)

    def test_to_spherical_geography_validation(self):
        from trino_private_spark.functions.geometry_ext import validate_spherical

        assert validate_spherical(g("POINT (10 45)")) == "POINT (10 45)"
        with pytest.raises(ValueError):
            validate_spherical(g("POINT (200 0)"))
        with pytest.raises(ValueError):
            validate_spherical(g("POINT (0 95)"))


class TestCanonicalTracing:
    """Set-op GEOMETRY output is canonically traced: minimal-vertex simple
    rings (shells CCW, holes CW), rotated to the lexicographically
    smallest vertex — not the convex-piece decomposition."""

    def test_union_staircase(self):
        a = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
        b = g("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
        assert G.to_wkt(G.geom_union(a, b)) == (
            "POLYGON ((0 0, 2 0, 2 1, 3 1, 3 3, 1 3, 1 2, 0 2, 0 0))"
        )

    def test_difference_L(self):
        a = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
        b = g("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
        assert G.to_wkt(G.geom_difference(a, b)) == (
            "POLYGON ((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0))"
        )

    def test_sym_difference_two_Ls(self):
        a = g("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")
        b = g("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
        assert G.to_wkt(G.geom_sym_difference(a, b)) == (
            "MULTIPOLYGON (((0 0, 2 0, 2 1, 1 1, 1 2, 0 2, 0 0)), "
            "((1 2, 2 2, 2 1, 3 1, 3 3, 1 3, 1 2)))"
        )

    def test_difference_produces_hole(self):
        big = g("POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0))")
        small = g("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))")
        out = G.geom_difference(big, small)
        assert G.to_wkt(out) == (
            "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 2 4, 4 4, 4 2, 2 2))"
        )
        assert abs(G.geom_area(out) - 32.0) < 1e-9

    def test_nonconvex_intersection_traced(self):
        L = g("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))")
        r = g("POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))")
        assert G.to_wkt(G.geom_intersection(L, r)) == (
            "POLYGON ((1 1, 3 1, 3 2, 2 2, 2 3, 1 3, 1 1))"
        )

    def test_holed_ring_window_intersection(self):
        ring = g(
            "POLYGON ((0 0, 6 0, 6 6, 0 6, 0 0), (2 2, 4 2, 4 4, 2 4, 2 2))"
        )
        win = g("POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))")
        out = G.geom_intersection(ring, win)
        assert G.to_wkt(out) == (
            "POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1), (2 2, 2 4, 4 4, 4 2, 2 2))"
        )
        assert abs(G.geom_area(out) - 12.0) < 1e-9

    def test_traced_outputs_are_valid_and_area_exact(self):
        shapes = [
            ("POLYGON ((0 0, 5 0, 5 1, 1 1, 1 3, 5 3, 5 4, 0 4, 0 0))",  # C
             "POLYGON ((-1 -1, 3 -1, 3 5, -1 5, -1 -1))"),
            ("POLYGON ((0 0, 4 0, 4 2, 2 2, 2 4, 0 4, 0 0))",
             "POLYGON ((1 -1, 3 -1, 3 5, 1 5, 1 -1))"),
        ]
        for wa, wb in shapes:
            a, b = g(wa), g(wb)
            for op, area_fn in (
                (G.geom_intersection, G.geom_intersection_area),
                (G.geom_difference, G.geom_difference_area),
                (G.geom_union, G.geom_union_area),
            ):
                out = op(a, b)
                assert abs(G.geom_area(out) - area_fn(a, b)) < 1e-7
                assert G.geom_is_valid(out)
