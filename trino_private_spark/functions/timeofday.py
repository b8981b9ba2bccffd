"""TIME(p) stand-in: picoseconds-of-day in a BIGINT column.

Spark has no TIME type (SURVEY.md §1.2). The reference stores time(p) as a
long count of picoseconds since midnight (core/trino-spi/.../type/TimeType,
operator/scalar/time/TimeFunctions.java); we adopt the identical
representation so every reference semantics carries over verbatim:

- hour/minute/second/millisecond extraction (TimeFunctions.java:47-80);
- date_trunc on millisecond/second/minute/hour (:83-103);
- date_add with modulo-one-day wraparound (:106-142 — delta is reduced
  mod one day per unit, then the sum wraps via floor-mod);
- date_diff in the given unit (:144-168).

All functions are JVM-side Column arithmetic (whole-stage codegen); a
picos-of-day bigint sorts, joins, groups, and range-partitions like any
numeric key, so TIME columns scale exactly like BIGINT columns at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from trino_private_spark.functions.registry import _c

PICOS_PER_MILLI = 1_000_000_000
PICOS_PER_SECOND = 1_000_000_000_000
PICOS_PER_MINUTE = 60 * PICOS_PER_SECOND
PICOS_PER_HOUR = 3600 * PICOS_PER_SECOND
PICOS_PER_DAY = 24 * PICOS_PER_HOUR

_UNIT_PICOS = {
    "millisecond": PICOS_PER_MILLI,
    "second": PICOS_PER_SECOND,
    "minute": PICOS_PER_MINUTE,
    "hour": PICOS_PER_HOUR,
}

_UNIT_PER_DAY = {
    "millisecond": 86_400_000,
    "second": 86_400,
    "minute": 1_440,
    "hour": 24,
}


def _unit(unit: str) -> int:
    try:
        return _UNIT_PICOS[unit.lower()]
    except KeyError:
        raise ValueError(f"'{unit}' is not a valid Time field") from None


def time_from_timestamp(ts) -> Column:
    """Project the time-of-day of a timestamp to TIME picos (UTC session)."""
    micros_of_day = F.unix_micros(_c(ts).cast("timestamp")) % F.lit(86_400_000_000)
    return (micros_of_day * F.lit(1_000_000)).cast("long")


def parse_time(s) -> Column:
    """'HH:MM:SS[.ffffffffffff]' -> picos-of-day (TIME literal parse)."""
    v = _c(s)
    pat = r"^(\d{1,2}):(\d{2})(?::(\d{2}))?(?:\.(\d{1,12}))?$"
    hh = F.regexp_extract(v, pat, 1).cast("long")
    mi = F.regexp_extract(v, pat, 2).cast("long")
    ss = F.coalesce(F.nullif(F.regexp_extract(v, pat, 3), F.lit("")), F.lit("0")).cast(
        "long"
    )
    frac = F.rpad(
        F.coalesce(F.nullif(F.regexp_extract(v, pat, 4), F.lit("")), F.lit("0")),
        12,
        "0",
    ).cast("long")
    return (
        hh * F.lit(PICOS_PER_HOUR)
        + mi * F.lit(PICOS_PER_MINUTE)
        + ss * F.lit(PICOS_PER_SECOND)
        + frac
    )


def hour(t) -> Column:
    return (_c(t) / F.lit(PICOS_PER_HOUR)).cast("long")


def minute(t) -> Column:
    return (_c(t) / F.lit(PICOS_PER_MINUTE)).cast("long") % F.lit(60)


def second(t) -> Column:
    return (_c(t) / F.lit(PICOS_PER_SECOND)).cast("long") % F.lit(60)


def millisecond(t) -> Column:
    return (_c(t) / F.lit(PICOS_PER_MILLI)).cast("long") % F.lit(1000)


def time_trunc(unit: str, t) -> Column:
    p = _unit(unit)
    return (_c(t) / F.lit(p)).cast("long") * F.lit(p)


def time_add(unit: str, value, t) -> Column:
    """date_add for TIME: delta reduced mod one day, result wraps mod day
    (TimeFunctions.java:106 — negative results wrap via floor-mod)."""
    per_day = F.lit(_UNIT_PER_DAY[unit.lower()])
    delta = (_c(value).cast("long") % per_day) * F.lit(_unit(unit))
    raw = (_c(t) + delta) % F.lit(PICOS_PER_DAY)
    return F.when(raw < 0, raw + F.lit(PICOS_PER_DAY)).otherwise(raw)


def time_diff(unit: str, t1, t2) -> Column:
    """date_diff for TIME: (t2 - t1) in the unit, truncated toward zero."""
    delta = _c(t2).cast("long") - _c(t1).cast("long")
    return (delta / F.lit(_unit(unit))).cast("long")


def time_format(t, precision: int = 3) -> Column:
    """Render as 'HH:MM:SS[.fff...]' (cast-to-varchar shape)."""
    pad2 = lambda c: F.lpad(c.cast("string"), 2, "0")
    base = F.concat_ws(
        ":", pad2(hour(t)), pad2(minute(t)), pad2(second(t))
    )
    if precision <= 0:
        return base
    frac_picos = _c(t) % F.lit(PICOS_PER_SECOND)
    digits = F.substring(
        F.lpad(frac_picos.cast("string"), 12, "0"), 1, precision
    )
    return F.concat(base, F.lit("."), digits)


# --------------------------------------------------------------------------
# TIME(p) WITH TIME ZONE stand-in
# --------------------------------------------------------------------------
#
# The reference packs time-with-zone values as (picos-of-day, offset-minutes)
# (core/trino-spi/.../type/TimeWithTimeZoneType, LongTimeWithTimeZone:
# picos + offsetMinutes; scalar ops in operator/scalar/timetz/*).  We adopt
# the same decomposition as a STRUCT<picos: BIGINT, offset_minutes: INT>.
# Semantics carried over:
# - comparison/ordering is by the UTC-normalized instant
#   (picos - offset*MINUTE), exactly the reference's normalizePicos;
# - AT TIME ZONE re-expresses the same instant at a new offset
#   (timetz/AtTimeZone.java);
# - extraction (hour/minute/...) reads the LOCAL field, not the UTC one;
# - timezone_hour/timezone_minute expose the offset components.
# Everything is JVM Column arithmetic over the struct fields — the struct
# groups/joins/sorts like any pair of numeric keys at 100 TB.

OFFSET_PICOS = PICOS_PER_MINUTE


def timetz(picos, offset_minutes) -> Column:
    """Construct a TIME WITH TIME ZONE value."""
    return F.struct(
        _c(picos).cast("bigint").alias("picos"),
        _c(offset_minutes).cast("int").alias("offset_minutes"),
    )


def parse_timetz(s) -> Column:
    """'HH:MM:SS[.fff](+|-)HH:MM' -> struct (TimeWithTimeZoneParser)."""
    c = _c(s)
    local = parse_time(F.regexp_extract(c, r"^([0-9:.]+)", 1))
    sign = F.when(F.regexp_extract(c, r"([+-])\d{2}:\d{2}$", 1) == "-", -1).otherwise(1)
    oh = F.regexp_extract(c, r"[+-](\d{2}):\d{2}$", 1).cast("int")
    om = F.regexp_extract(c, r"[+-]\d{2}:(\d{2})$", 1).cast("int")
    return timetz(local, sign * (oh * 60 + om))


def timetz_to_utc_picos(t) -> Column:
    """Normalized instant for comparison/ordering (floor-mod one day)."""
    c = _c(t)
    raw = c["picos"] - c["offset_minutes"].cast("bigint") * OFFSET_PICOS
    return ((raw % PICOS_PER_DAY) + PICOS_PER_DAY) % PICOS_PER_DAY


def timetz_at_offset(t, new_offset_minutes) -> Column:
    """AT TIME ZONE: same instant, new offset (timetz/AtTimeZone.java)."""
    c = _c(t)
    off = _c(new_offset_minutes).cast("int")
    utc = c["picos"] - c["offset_minutes"].cast("bigint") * OFFSET_PICOS
    local = utc + off.cast("bigint") * OFFSET_PICOS
    wrapped = ((local % PICOS_PER_DAY) + PICOS_PER_DAY) % PICOS_PER_DAY
    return F.struct(wrapped.alias("picos"), off.alias("offset_minutes"))


def timetz_hour(t) -> Column:
    return hour(_c(t)["picos"])


def timetz_minute(t) -> Column:
    return minute(_c(t)["picos"])


def timetz_timezone_hour(t) -> Column:
    """timezone_hour: truncates toward zero (DateTimeFunctions.java)."""
    off = _c(t)["offset_minutes"]
    return (off.cast("double") / 60).cast("int")


def timetz_timezone_minute(t) -> Column:
    off = _c(t)["offset_minutes"]
    return off - ((off.cast("double") / 60).cast("int") * 60)


def timetz_format(t) -> Column:
    """Canonical 'HH:MM:SS.mmm(+|-)HH:MM' rendering."""
    c = _c(t)
    off = c["offset_minutes"]
    sign = F.when(off < 0, "-").otherwise("+")
    ao = F.abs(off)
    return F.concat(
        time_format(c["picos"]),
        sign,
        F.lpad((ao.cast("double") / 60).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((ao % 60).cast("string"), 2, "0"),
    )
