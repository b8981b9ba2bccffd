"""ColorFunctions.java parity — scalar kernel asserted against the
reference's own TestColorFunctions.java vectors (lines 39-121), plus the
Spark pandas-UDF surface."""

from __future__ import annotations

import pytest

from trino_private_spark.functions import colors as C


class TestParse:
    def test_parse_rgb_vectors(self):
        # TestColorFunctions.java:39-48
        assert C.parse_rgb("#000") == 0x000000
        assert C.parse_rgb("#FFF") == 0xFFFFFF
        assert C.parse_rgb("#F00") == 0xFF0000
        assert C.parse_rgb("#0F0") == 0x00FF00
        assert C.parse_rgb("#00F") == 0x0000FF
        assert C.parse_rgb("#700") == 0x770000
        assert C.parse_rgb("#070") == 0x007700
        assert C.parse_rgb("#007") == 0x000077
        assert C.parse_rgb("#cde") == 0xCCDDEE
        assert C.parse_rgb("red") == -1

    def test_system_colors(self):
        # TestColorFunctions.java:70-81
        for name, want in [
            ("black", -1), ("red", -2), ("green", -3), ("yellow", -4),
            ("blue", -5), ("magenta", -6), ("cyan", -7), ("white", -8),
        ]:
            assert C.color_from_string(name) == want
        assert C.color_from_string("#f00") == 0xFF0000
        assert C.color_from_string("#0f0") == 0x00FF00
        assert C.color_from_string("#00f") == 0x0000FF

    def test_invalid_color_raises(self):
        with pytest.raises(ValueError):
            C.color_from_string("mauve-ish")

    def test_rgb(self):
        assert C.rgb(0xFF, 0, 0) == 0xFF0000
        assert C.rgb(0, 0xFF, 0) == 0x00FF00
        assert C.rgb(0, 0, 0xFF) == 0x0000FF
        with pytest.raises(ValueError):
            C.rgb(256, 0, 0)


class TestRender:
    def test_render_bool(self):
        # TestColorFunctions.java:100-101
        assert C.render(True, 0) == "[38;5;2m✓[0m"
        assert C.render(False, 0) == "[38;5;1m✗[0m"

    def test_render_string(self):
        # TestColorFunctions.java:107-111
        assert C.render("hello", C.color_from_string("red")) == "[38;5;1mhello[0m"
        assert C.render("hello", C.color_from_string("#f00")) == "[38;5;196mhello[0m"
        assert C.render("hello", C.color_from_string("#0f0")) == "[38;5;46mhello[0m"
        assert C.render("hello", C.color_from_string("#00f")) == "[38;5;21mhello[0m"

    def test_render_long(self):
        # TestColorFunctions.java:117-120
        assert C.render(1234, C.color_from_string("red")) == "[38;5;1m1234[0m"
        assert C.render(1234, C.color_from_string("#f00")) == "[38;5;196m1234[0m"


class TestBar:
    def test_bar_gradient_truncated(self):
        # TestColorFunctions.java:87-88
        got = C.bar(0.6, 5, C.color_from_string("#f0f"), C.color_from_string("#00f"))
        assert got == (
            "[38;5;201m█[38;5;165m█[38;5;129m█[0m  "
        )

    def test_bar_full_red_green(self):
        # TestColorFunctions.java:90-91
        got = C.bar(1, 10, C.color_from_string("#f00"), C.color_from_string("#0f0"))
        assert got == (
            "[38;5;196m█[38;5;202m█[38;5;208m█"
            "[38;5;214m█[38;5;226m█[38;5;226m█"
            "[38;5;154m█[38;5;118m█[38;5;82m█"
            "[38;5;46m█[0m"
        )

    def test_bar_zero(self):
        assert C.bar(0, 4) == "[0m    "


class TestInterpolate:
    def test_endpoints(self):
        lo, hi = 0xFF00FF, 0x0000FF
        assert C.color_interpolate(0.0, lo, hi) == lo
        assert C.color_interpolate(1.0, lo, hi) == hi

    def test_clamps(self):
        lo, hi = 0xFF0000, 0x00FF00
        assert C.color_interpolate(-3.0, lo, hi) == lo
        assert C.color_interpolate(7.0, lo, hi) == hi

    def test_rejects_system_colors(self):
        with pytest.raises(ValueError):
            C.color_interpolate(0.5, -2, 0xFF0000)

    def test_scaled_form(self):
        lo, hi = 0xFF0000, 0x00FF00
        assert C.color_scaled(5.0, 0.0, 10.0, lo, hi) == C.color_interpolate(0.5, lo, hi)


class TestSparkSurface:
    def test_columns_end_to_end(self, spark):
        from trino_private_spark.functions.registry import TRINO_FUNCTIONS
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [(1, "red", 0.0), (2, "#0f0", 0.5), (3, "white", 1.0)],
            ["id", "cname", "frac"],
        )
        out = df.select(
            "id",
            TRINO_FUNCTIONS["color"](F.col("cname")).alias("c"),
            TRINO_FUNCTIONS["rgb"](F.lit(255), F.lit(0), F.lit(0)).alias("r"),
            TRINO_FUNCTIONS["color"](
                F.col("frac"), F.lit(0xFF0000), F.lit(0x00FF00)
            ).alias("interp"),
            TRINO_FUNCTIONS["render"](F.lit("hi"), F.lit(0xFF0000)).alias("txt"),
            TRINO_FUNCTIONS["bar"](F.col("frac"), F.lit(4)).alias("b"),
        ).orderBy("id").collect()
        assert [r.c for r in out] == [-2, 0x00FF00, -8]
        assert out[0].r == 0xFF0000
        assert out[0].interp == 0xFF0000
        assert out[2].interp == 0x00FF00
        assert out[0].txt == "[38;5;196mhi[0m"
        assert out[2].b.count("█") == 4
        assert out[0].b == "[0m    "

    def test_render_bool_column(self, spark):
        from trino_private_spark.functions.registry import TRINO_FUNCTIONS
        import pyspark.sql.functions as F

        df = spark.createDataFrame([(True,), (False,)], ["v"])
        got = [r.s for r in df.select(TRINO_FUNCTIONS["render"](F.col("v")).alias("s")).collect()]
        assert got == ["[38;5;2m✓[0m", "[38;5;1m✗[0m"]
