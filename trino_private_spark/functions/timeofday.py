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
