"""TIMESTAMP(p) for p in [7, 12] — the reference's LongTimestamp layout.

Spark timestamps cap at microseconds (SURVEY.md §1.2).  Trino's
``timestamp(p)`` with p > 6 is stored as ``LongTimestamp``:
``epochMicros`` (long) + ``picosOfMicro`` (int in [0, 1_000_000)) —
``core/trino-spi/.../type/LongTimestamp.java``, operated on by the
per-precision packages ``operator/scalar/timestamp/`` (DateAdd / DateDiff /
DateTrunc / ExtractNanosecond ... at picosecond resolution).  We adopt the
IDENTICAL representation as a Spark STRUCT column:

    STRUCT<micros BIGINT, picos INT>    -- epoch micros, picos-of-micro

so every reference semantics carries over verbatim, and the struct's
natural (micros, picos) ordering gives correct comparison/sort/join
behavior for free.

All functions are JVM-side Column expressions (whole-stage codegen; the
parse/format path is string+integer arithmetic — no Python, no UDF), so a
high-precision timestamp column scales like a (BIGINT, INT) pair at
100 TB.

Rounding semantics follow the reference: parsing a literal with more
digits than the target precision ROUNDS (half-up) at the target digit
(``TimestampType round``); ``date_trunc`` zeroes sub-unit digits;
``date_add`` of picos/nanos carries into micros with floor division.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from trino_private_spark.functions.registry import _c

PICOS_PER_MICRO = 1_000_000

__all__ = [
    "ts_hp",
    "ts_hp_parse",
    "ts_hp_format",
    "ts_hp_from_timestamp",
    "ts_hp_to_timestamp",
    "ts_hp_round",
    "ts_hp_trunc",
    "ts_hp_add",
    "ts_hp_diff",
    "ts_hp_extract",
]


def ts_hp(micros, picos) -> Column:
    """Construct from epoch-micros + picos-of-micro columns/literals."""
    return F.struct(
        _c(micros).cast("bigint").alias("micros"),
        _c(picos).cast("int").alias("picos"),
    )


def ts_hp_from_timestamp(ts) -> Column:
    """Native (micro) timestamp -> timestamp(12) with zero picos."""
    return ts_hp(F.unix_micros(_c(ts)), F.lit(0))


def ts_hp_to_timestamp(t) -> Column:
    """Truncate to Spark's native microsecond timestamp."""
    return F.timestamp_micros(_c(t)["micros"])


def ts_hp_parse(s) -> Column:
    """Parse 'YYYY-MM-DD HH:MM:SS[.fraction]' with up to 12 fraction
    digits into STRUCT<micros, picos> (TimestampType parse at p=12).
    Fractions beyond 12 digits are rejected by the regex (null result,
    like a failed cast)."""
    s = _c(s)
    base = F.regexp_extract(s, r"^(\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2})", 1)
    frac = F.regexp_extract(s, r"\.(\d{1,12})$", 1)
    # right-pad the fraction to 12 digits -> picos-of-second
    frac12 = F.rpad(frac, 12, "0")
    picos_of_sec = F.when(frac == "", F.lit(0)).otherwise(
        frac12.cast("bigint")
    )
    sec_micros = F.unix_micros(
        F.to_timestamp(F.translate(base, "T", " "), "yyyy-MM-dd HH:mm:ss")
    )
    return F.when(
        base != "",
        ts_hp(
            sec_micros + (picos_of_sec / PICOS_PER_MICRO).cast("bigint"),
            (picos_of_sec % PICOS_PER_MICRO).cast("int"),
        ),
    )


def ts_hp_format(t, precision: int = 12) -> Column:
    """Render 'YYYY-MM-DD HH:MM:SS.ffffffffffff' at the given precision
    (assumes the value is already rounded to that precision, as the
    reference's cast does)."""
    t = _c(t)
    micros, picos = t["micros"], t["picos"]
    base = F.date_format(F.timestamp_micros(micros), "yyyy-MM-dd HH:mm:ss")
    micro_frac = F.lpad(((micros % 1_000_000 + 1_000_000) % 1_000_000).cast("string"), 6, "0")
    pico_frac = F.lpad(picos.cast("string"), 6, "0")
    full = F.concat(micro_frac, pico_frac)  # 12 digits
    if precision <= 0:
        return base
    return F.concat(base, F.lit("."), F.substring(full, 1, precision))


def ts_hp_round(t, precision: int) -> Column:
    """Round half-up to ``precision`` digits (TimestampType round), kept in
    the same STRUCT layout."""
    if not 0 <= precision <= 12:
        raise ValueError("precision must be in [0, 12]")
    t = _c(t)
    micros, picos = t["micros"], t["picos"]
    if precision >= 12:
        return t
    if precision >= 6:
        # round the picos-of-micro field only
        unit = 10 ** (12 - precision)  # picos per target digit
        rounded = ((picos + unit / 2).cast("bigint") / unit).cast("bigint") * unit
        carry = (rounded / PICOS_PER_MICRO).cast("bigint")
        return ts_hp(micros + carry, rounded % PICOS_PER_MICRO)
    # precision < 6: picos field rounds into micros
    unit = 10 ** (6 - precision)  # micros per target digit
    half = unit * PICOS_PER_MICRO // 2
    rem = ((micros % unit) + unit) % unit
    total_sub = rem * PICOS_PER_MICRO + picos  # in [0, unit*1e6)
    rounded_units = ((total_sub + half) / (unit * PICOS_PER_MICRO)).cast("bigint")
    return ts_hp(micros - rem + rounded_units * unit, F.lit(0))


_TRUNC_PICOS = {  # sub-micro units
    "picosecond": 1,
    "nanosecond": 1_000,
    "microsecond": PICOS_PER_MICRO,
}
_TRUNC_MICROS = {  # micro-and-above units, in micros
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def ts_hp_trunc(unit: str, t) -> Column:
    """date_trunc at picosecond resolution (DateTrunc.java per-precision)."""
    u = unit.lower()
    t = _c(t)
    micros, picos = t["micros"], t["picos"]
    if u in _TRUNC_PICOS:
        g = _TRUNC_PICOS[u]
        return ts_hp(micros, (picos / g).cast("bigint") * g)
    if u in _TRUNC_MICROS:
        g = _TRUNC_MICROS[u]
        floored = micros - (((micros % g) + g) % g)
        return ts_hp(floored, F.lit(0))
    raise ValueError(f"unsupported trunc unit {unit!r}")


_ADD_PICOS = {"picosecond": 1, "nanosecond": 1_000}
_ADD_MICROS = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
}


def ts_hp_add(unit: str, value, t) -> Column:
    """date_add(unit, value, ts) with carry between the picos and micros
    fields (DateAdd.java for LongTimestamp)."""
    u = unit.lower()
    t = _c(t)
    v = _c(value).cast("bigint")
    micros, picos = t["micros"], t["picos"]
    if u in _ADD_MICROS:
        return ts_hp(micros + v * _ADD_MICROS[u], picos)
    if u in _ADD_PICOS:
        total = picos.cast("bigint") + v * _ADD_PICOS[u]
        carry = F.floor(total / PICOS_PER_MICRO).cast("bigint")
        return ts_hp(
            micros + carry,
            ((total % PICOS_PER_MICRO) + PICOS_PER_MICRO) % PICOS_PER_MICRO,
        )
    raise ValueError(f"unsupported add unit {unit!r}")


def ts_hp_diff(unit: str, t1, t2) -> Column:
    """date_diff(unit, a, b) = b - a in the given unit, truncated toward
    zero (DateDiff.java's Java integer division).  The micro-difference is
    factored out of the picos arithmetic so nothing overflows; exactness
    holds over the reference's own timestamp domain (years 1-9999, i.e.
    |micros| < 2.6e14, well inside double's 2^53 integer range for the one
    floor division below)."""
    u = unit.lower()
    t1, t2 = _c(t1), _c(t2)
    dm = (t2["micros"] - t1["micros"]).cast("bigint")
    dp = (t2["picos"] - t1["picos"]).cast("bigint")  # in (-1e6, 1e6)
    if u in _ADD_PICOS:
        g = _ADD_PICOS[u]
        return dm * (PICOS_PER_MICRO // g) + (dp / g).cast("bigint")
    g = _ADD_MICROS.get(u)
    if g is None:
        raise ValueError(f"unsupported diff unit {unit!r}")
    rem_m = ((dm % g) + g) % g  # in [0, g)
    floor_q = F.floor((dm - rem_m) / F.lit(g)).cast("bigint")
    sub = rem_m * PICOS_PER_MICRO + dp  # in (-1e6, g*1e6)
    floor_q = F.when(sub < 0, floor_q - 1).otherwise(floor_q)
    rem_zero = (rem_m == 0) & (dp == 0)
    # floor -> truncation toward zero: negative with a remainder rounds up
    return F.when((floor_q < 0) & ~rem_zero, floor_q + 1).otherwise(floor_q)


def ts_hp_extract(field: str, t) -> Column:
    """extract at picosecond resolution: nanosecond/picosecond of the
    second (ExtractNanosecond.java etc.); coarser fields delegate to the
    native timestamp."""
    f = field.lower()
    t = _c(t)
    micros, picos = t["micros"], t["picos"]
    micro_of_sec = ((micros % 1_000_000) + 1_000_000) % 1_000_000
    if f == "picosecond":
        return micro_of_sec * PICOS_PER_MICRO + picos
    if f == "nanosecond":
        return micro_of_sec * 1_000 + (picos / 1_000).cast("bigint")
    if f == "microsecond":
        return micro_of_sec
    return F.extract(F.lit(field), F.timestamp_micros(micros))
