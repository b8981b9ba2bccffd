"""Color/rendering scalar functions — the reference's ColorFunctions.java
(core/trino-main/.../operator/scalar/ColorFunctions.java) re-expressed in
Python with bit-faithful semantics.

The COLOR type is carried as the same BIGINT encoding the reference uses:
  - rgb values >= 0, encoded (red << 16) | (green << 8) | blue
    (ColorFunctions.java:109 rgb);
  - ANSI system colors as negative values, -(index + 1)
    (ColorFunctions.java:88 color).

Gradient interpolation (ColorFunctions.java:236 interpolate) runs through
java.awt.Color.RGBtoHSB/HSBtoRGB; those are replicated here on numpy
float32 so every intermediate rounds exactly as the JVM's float math does —
the unit tests assert the reference's own TestColorFunctions.java vectors
(bar/render escape strings) byte for byte.

Terminal-rendering functions (render, bar) return ANSI-escape strings:
  ESC[38;5;<idx>m ... ESC[0m with the 6x6x6-cube index mapping of
ColorFunctions.java:216 toAnsi.

Spark surface: scalar helpers are exposed both as plain Python (for tests
and driver-side rendering) and as Arrow-batched pandas UDFs registered in
the Trino-name function registry (`color`, `rgb`, `render`, `bar`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType

from trino_private_spark.functions.registry import trino_fn, _c

ANSI_RESET = "[0m"

_SYSTEM_COLORS = {
    "BLACK": 0,
    "RED": 1,
    "GREEN": 2,
    "YELLOW": 3,
    "BLUE": 4,
    "MAGENTA": 5,
    "CYAN": 6,
    "WHITE": 7,
}


# --------------------------------------------------------------------------
# scalar kernel (bit-faithful to ColorFunctions.java)
# --------------------------------------------------------------------------


def parse_rgb(s: str) -> int:
    """#rgb (css shorthand) -> 24-bit rgb, or -1 (ColorFunctions.java:283)."""
    if len(s) != 4 or s[0] != "#":
        return -1
    try:
        r, g, b = (int(c, 16) for c in s[1:])
    except ValueError:
        return -1
    return ((r << 4 | r) << 16) | ((g << 4 | g) << 8) | (b << 4 | b)


def color_from_string(s: str) -> int:
    rgb_val = parse_rgb(s)
    if rgb_val != -1:
        return rgb_val
    idx = _SYSTEM_COLORS.get(s.upper())
    if idx is None:
        raise ValueError(f"Invalid color: '{s}'")
    return -(idx + 1)


def rgb(red: int, green: int, blue: int) -> int:
    for name, v in (("red", red), ("green", green), ("blue", blue)):
        if not 0 <= v <= 255:
            raise ValueError(f"{name} must be between 0 and 255")
    return (red << 16) | (green << 8) | blue


def _get_red(color: int) -> int:
    return (color >> 16) & 0xFF


def _get_green(color: int) -> int:
    return (color >> 8) & 0xFF


def _get_blue(color: int) -> int:
    return color & 0xFF


def _rgb_to_hsb(r: int, g: int, b: int) -> tuple:
    """java.awt.Color.RGBtoHSB on float32."""
    f32 = np.float32
    cmax, cmin = max(r, g, b), min(r, g, b)
    brightness = f32(cmax) / f32(255.0)
    saturation = f32(cmax - cmin) / f32(cmax) if cmax != 0 else f32(0)
    if saturation == 0:
        hue = f32(0)
    else:
        span = f32(cmax - cmin)
        redc = f32(cmax - r) / span
        greenc = f32(cmax - g) / span
        bluec = f32(cmax - b) / span
        if r == cmax:
            hue = bluec - greenc
        elif g == cmax:
            hue = f32(2.0) + redc - bluec
        else:
            hue = f32(4.0) + greenc - redc
        hue = hue / f32(6.0)
        if hue < 0:
            hue = hue + f32(1.0)
    return hue, saturation, brightness


def _hsb_to_rgb(hue, saturation, brightness) -> int:
    """java.awt.Color.HSBtoRGB on float32 (returns 24-bit rgb)."""
    f32 = np.float32
    hue, saturation, brightness = f32(hue), f32(saturation), f32(brightness)
    if saturation == 0:
        v = int(brightness * f32(255.0) + f32(0.5))
        return (v << 16) | (v << 8) | v
    h = (hue - f32(np.floor(hue))) * f32(6.0)
    f = h - f32(np.floor(h))
    p = brightness * (f32(1.0) - saturation)
    q = brightness * (f32(1.0) - saturation * f)
    t = brightness * (f32(1.0) - saturation * (f32(1.0) - f))
    bb = int(brightness * f32(255.0) + f32(0.5))
    pp = int(p * f32(255.0) + f32(0.5))
    qq = int(q * f32(255.0) + f32(0.5))
    tt = int(t * f32(255.0) + f32(0.5))
    sector = int(h)
    r, g, b = [
        (bb, tt, pp),
        (qq, bb, pp),
        (pp, bb, tt),
        (pp, qq, bb),
        (tt, pp, bb),
        (bb, pp, qq),
    ][sector]
    return (r << 16) | (g << 8) | b


def _interpolate(fraction: float, low_rgb: int, high_rgb: int) -> int:
    """ColorFunctions.java:236: lerp in HSB space on float32."""
    f32 = np.float32
    lo = _rgb_to_hsb(_get_red(low_rgb), _get_green(low_rgb), _get_blue(low_rgb))
    hi = _rgb_to_hsb(_get_red(high_rgb), _get_green(high_rgb), _get_blue(high_rgb))
    frac = f32(fraction)
    h = frac * (hi[0] - lo[0]) + lo[0]
    s = frac * (hi[1] - lo[1]) + lo[1]
    v = frac * (hi[2] - lo[2]) + lo[2]
    return _hsb_to_rgb(h, s, v) & 0xFFFFFF


def color_interpolate(fraction: float, low_color: int, high_color: int) -> int:
    """color(fraction, lowColor, highColor) (ColorFunctions.java:144)."""
    if low_color < 0 or high_color < 0:
        raise ValueError("lowColor/highColor not a valid RGB color")
    fraction = max(0.0, min(1.0, fraction))
    return _interpolate(np.float32(fraction), low_color, high_color)


def color_scaled(value: float, low: float, high: float, low_color: int, high_color: int) -> int:
    """color(value, low, high, lowColor, highColor) (ColorFunctions.java:126)."""
    return color_interpolate((value - low) * 1.0 / (high - low), low_color, high_color)


def _to_ansi(color: int) -> int:
    if color >= 0:
        r = _get_red(color) * 6 // 256
        g = _get_green(color) * 6 // 256
        b = _get_blue(color) * 6 // 256
        return 16 + r * 36 + g * 6 + b
    return -color - 1


def _ansi_escape(color: int) -> str:
    return f"[38;5;{_to_ansi(color)}m"


def render(value, color: int) -> str:
    """render(x, color) -> ANSI-wrapped string (ColorFunctions.java:161)."""
    if isinstance(value, bool):
        # render(boolean): green check / red cross (ColorFunctions.java:189)
        return (
            render("✓", color_from_string("green"))
            if value
            else render("✗", color_from_string("red"))
        )
    return f"{_ansi_escape(color)}{value}{ANSI_RESET}"


def bar(percent: float, width: int, low_color: int | None = None, high_color: int | None = None) -> str:
    """bar(percent, width[, low, high]) (ColorFunctions.java:195-228)."""
    if low_color is None:
        low_color = rgb(255, 0, 0)
    if high_color is None:
        high_color = rgb(0, 255, 0)
    count = int(percent * width)
    count = max(0, min(width, count))
    out = []
    for i in range(count):
        fraction = np.float32(i * 1.0 / (width - 1))
        c = _interpolate(fraction, low_color, high_color)
        out.append(_ansi_escape(c))
        out.append("█")
    out.append(ANSI_RESET)
    out.append(" " * (width - count))
    return "".join(out)


# --------------------------------------------------------------------------
# Spark registry surface (Arrow-batched pandas UDFs)
# --------------------------------------------------------------------------

from pyspark.sql.functions import pandas_udf as _pudf  # noqa: E402


@_pudf(LongType())
def _color_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: None if v is None else color_from_string(v))


@_pudf(LongType())
def _color_interp_udf(fr: pd.Series, lo: pd.Series, hi: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if f is None else color_interpolate(float(f), int(a), int(b))
            for f, a, b in zip(fr, lo, hi)
        ]
    )


@_pudf(StringType())
def _render_udf(v: pd.Series, c: pd.Series) -> pd.Series:
    return pd.Series(
        [None if x is None else render(x, int(k)) for x, k in zip(v, c)]
    )


@_pudf(StringType())
def _bar_udf(p: pd.Series, w: pd.Series, lo: pd.Series, hi: pd.Series) -> pd.Series:
    return pd.Series(
        [
            None if x is None else bar(float(x), int(k), int(a), int(b))
            for x, k, a, b in zip(p, w, lo, hi)
        ]
    )


@trino_fn("color")
def color_fn(x, low=None, high=None, low_color=None, high_color=None) -> Column:
    """Trino color(): string form, 3-arg fraction form, 5-arg scaled form."""
    if low is None:
        return _color_udf(_c(x))
    if low_color is None:
        # 3-arg form: color(fraction, lowColor, highColor)
        return _color_interp_udf(_c(x), _c(low), _c(high))
    fraction = (_c(x) - _c(low)) / (_c(high) - _c(low))
    return _color_interp_udf(fraction, _c(low_color), _c(high_color))


@trino_fn("rgb")
def rgb_fn(r, g, b) -> Column:
    return (
        F.shiftleft(_c(r).cast("long"), 16)
        .bitwiseOR(F.shiftleft(_c(g).cast("long"), 8))
        .bitwiseOR(_c(b).cast("long"))
    )


@trino_fn("render")
def render_fn(value, color=None) -> Column:
    if color is None:
        # boolean form
        t = render(True, 0)
        f = render(False, 0)
        return F.when(_c(value), F.lit(t)).otherwise(F.lit(f))
    return _render_udf(_c(value).cast("string"), _c(color))


@trino_fn("bar")
def bar_fn(percent, width, low_color=None, high_color=None) -> Column:
    lo = _c(low_color) if low_color is not None else F.lit(rgb(255, 0, 0))
    hi = _c(high_color) if high_color is not None else F.lit(rgb(0, 255, 0))
    return _bar_udf(_c(percent), _c(width), lo, hi)
