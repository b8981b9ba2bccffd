"""Per-value TIMESTAMP WITH TIME ZONE — fixed-offset subset.

Reference: ``core/trino-spi/.../type/TimestampWithTimeZoneType.java`` packs
each value as UTC ``epochMillis`` + a per-value ``TimeZoneKey``
(``ShortTimestampWithTimeZone``/``DateTimeEncoding.java``), so two rows of
one column can carry different zones.  Spark's ``TimestampType`` is a
session-zoned instant — the per-value zone is lost (SURVEY §1.2).  This
module restores it for the FIXED-OFFSET zones ('+HH:MM', the encoding's
offset-key range) as a struct column:

    STRUCT<millis BIGINT, offset_minutes INT>   -- UTC instant + zone

Named DST zones (``America/New_York``) stay out of scope: their rules need
a tz database at evaluation time; the reference resolves them through its
TimeZoneKey registry.  Fixed offsets cover the wire formats
(ISO-8601/RFC-3339 timestamps) and the reference's own encoding tests.

Semantics carried over verbatim (DateTimeFunctions.java / AtTimeZone.java):
- the VALUE is the instant: comparison/ordering use ``millis`` (the struct's
  natural order — millis first — sorts correctly; offsets only break exact
  instant ties);
- ``AT TIME ZONE`` keeps the instant and swaps the offset;
- field extraction (year..second) reads the LOCAL wall clock;
- ``timezone_hour``/``timezone_minute`` truncate toward zero;
- arithmetic (``date_add``/``date_diff``) operates on the instant and
  preserves each value's offset.

All JVM-side Column expressions — a (BIGINT, INT) pair scales like any
numeric pair at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from trino_private_spark.functions.registry import _c

MILLIS_PER_MINUTE = 60_000

__all__ = [
    "tstz",
    "parse_tstz",
    "tstz_format",
    "tstz_at_timezone",
    "tstz_instant_millis",
    "tstz_extract",
    "tstz_timezone_hour",
    "tstz_timezone_minute",
    "tstz_add",
    "tstz_diff",
    "tstz_from_timestamp",
    "tstz_to_timestamp",
]

_ADD_MILLIS = {
    "millisecond": 1,
    "second": 1_000,
    "minute": 60_000,
    "hour": 3_600_000,
    "day": 86_400_000,
}


def tstz(millis, offset_minutes) -> Column:
    return F.struct(
        _c(millis).cast("bigint").alias("millis"),
        _c(offset_minutes).cast("int").alias("offset_minutes"),
    )


def parse_tstz(s) -> Column:
    """'YYYY-MM-DD HH:MM:SS[.fff](+|-)HH:MM' -> struct.  The local wall
    clock minus the offset is the UTC instant."""
    c = _c(s)
    local = F.regexp_extract(c, r"^(\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(?:\.\d{1,3})?)", 1)
    sign = F.when(F.regexp_extract(c, r"([+-])\d{2}:\d{2}$", 1) == "-", -1).otherwise(1)
    oh = F.regexp_extract(c, r"[+-](\d{2}):\d{2}$", 1).cast("int")
    om = F.regexp_extract(c, r"[+-]\d{2}:(\d{2})$", 1).cast("int")
    off = sign * (oh * 60 + om)
    # anchor the parse to +00:00 explicitly so the result is independent
    # of the session timezone (the driver's gate runs a vanilla session)
    naive = F.to_timestamp(
        F.concat(F.translate(local, "T", " "), F.lit("+00:00")),
        "yyyy-MM-dd HH:mm:ss[.SSS][.SS][.S]XXX",
    )
    local_millis = F.unix_millis(naive)
    return F.when(
        local != "", tstz(local_millis - off.cast("bigint") * MILLIS_PER_MINUTE, off)
    )


def tstz_instant_millis(t) -> Column:
    """The comparable UTC instant (equality/ordering key)."""
    return _c(t)["millis"]


def _local_millis(t) -> Column:
    c = _c(t)
    return c["millis"] + c["offset_minutes"].cast("bigint") * MILLIS_PER_MINUTE


def tstz_format(t) -> Column:
    """Canonical 'YYYY-MM-DD HH:MM:SS.mmm(+|-)HH:MM' rendering of the
    LOCAL wall clock (the reference renders in the value's own zone)."""
    c = _c(t)
    off = c["offset_minutes"]
    sign = F.when(off < 0, "-").otherwise("+")
    ao = F.abs(off)
    # render in UTC regardless of session timezone
    local = F.to_utc_timestamp(
        F.timestamp_millis(_local_millis(t)), F.current_timezone()
    )
    return F.concat(
        F.date_format(local, "yyyy-MM-dd HH:mm:ss.SSS"),
        sign,
        F.lpad((ao / 60).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((ao % 60).cast("string"), 2, "0"),
    )


def tstz_at_timezone(t, new_offset_minutes) -> Column:
    """AT TIME ZONE: identical instant, new display offset."""
    c = _c(t)
    return tstz(c["millis"], _c(new_offset_minutes))


def tstz_extract(field: str, t) -> Column:
    """extract(field) over the LOCAL wall clock (the reference extracts in
    the value's zone — DateTimeFunctions.java per-field @ScalarFunction)."""
    f = field.lower()
    local = F.to_utc_timestamp(
        F.timestamp_millis(_local_millis(t)), F.current_timezone()
    )
    if f == "millisecond":
        return (_local_millis(t) % 1000 + 1000) % 1000
    return F.extract(F.lit(f), local)


def tstz_timezone_hour(t) -> Column:
    off = _c(t)["offset_minutes"]
    return (off.cast("double") / 60).cast("int")


def tstz_timezone_minute(t) -> Column:
    off = _c(t)["offset_minutes"]
    return off - ((off.cast("double") / 60).cast("int") * 60)


def tstz_add(unit: str, value, t) -> Column:
    """date_add on the instant; the value's offset is preserved."""
    u = unit.lower()
    if u not in _ADD_MILLIS:
        raise ValueError(f"unsupported add unit {unit!r}")
    c = _c(t)
    return tstz(
        c["millis"] + _c(value).cast("bigint") * _ADD_MILLIS[u],
        c["offset_minutes"],
    )


def tstz_diff(unit: str, t1, t2) -> Column:
    """date_diff on the instants (zone-independent), truncated toward
    zero like the reference's Java division."""
    u = unit.lower()
    if u not in _ADD_MILLIS:
        raise ValueError(f"unsupported diff unit {unit!r}")
    g = _ADD_MILLIS[u]
    d = _c(t2)["millis"] - _c(t1)["millis"]
    q = F.floor(d / F.lit(g)).cast("bigint")
    rem = ((d % g) + g) % g
    return F.when((q < 0) & (rem != 0), q + 1).otherwise(q)


def tstz_from_timestamp(ts, offset_minutes) -> Column:
    """Native session-UTC timestamp + offset -> per-value zoned struct
    (with_timezone)."""
    return tstz(F.unix_millis(_c(ts)), _c(offset_minutes))


def tstz_to_timestamp(t) -> Column:
    """The instant as a native (session-zone) timestamp — per-value zone
    dropped, as a cast to plain timestamp does in the reference."""
    return F.timestamp_millis(_c(t)["millis"])


# --------------------------------------------------------------------------
# NAMED-zone variant — STRUCT<millis BIGINT, zone STRING>
# --------------------------------------------------------------------------
#
# The reference's TimeZoneKey registry covers named tz-database zones with
# DST rules.  Spark's JVM carries the same tzdb, and from_utc_timestamp /
# to_utc_timestamp accept a PER-ROW zone column — so per-value named zones
# work entirely JVM-side: the struct stores the UTC instant plus the zone
# id string, and every local-clock operation routes through the tzdb at
# the value's own instant (DST-correct).


def tstz_named(millis, zone) -> Column:
    return F.struct(
        _c(millis).cast("bigint").alias("millis"),
        _c(zone).cast("string").alias("zone"),
    )


def _render_naive(instant) -> Column:
    """date_format that is independent of the session timezone: shift by
    -session_offset so the session rendering shows the instant's UTC wall
    clock."""
    return F.to_utc_timestamp(instant, F.current_timezone())


def _named_local_instant(t) -> Column:
    c = _c(t)
    return F.from_utc_timestamp(F.timestamp_millis(c["millis"]), c["zone"])


def parse_tstz_named(s) -> Column:
    """'YYYY-MM-DD HH:MM:SS[.fff] <Zone/Id>' -> struct.  The wall clock is
    resolved through the zone's rules at that local time (ambiguous DST
    times resolve as the JVM does — same stance as the reference's
    unpackZoneKey path)."""
    c = _c(s)
    local = F.regexp_extract(
        c, r"^(\d{4}-\d{2}-\d{2}[ T]\d{2}:\d{2}:\d{2}(?:\.\d{1,3})?) ", 1
    )
    zone = F.regexp_extract(c, r" ([A-Za-z_+\-0-9/]+)$", 1)
    naive = F.to_timestamp(
        F.concat(F.translate(local, "T", " "), F.lit("+00:00")),
        "yyyy-MM-dd HH:mm:ss[.SSS][.SS][.S]XXX",
    )
    utc = F.to_utc_timestamp(naive, zone)
    return F.when(
        (local != "") & (zone != ""), tstz_named(F.unix_millis(utc), zone)
    )


def tstz_named_format(t) -> Column:
    """'YYYY-MM-DD HH:MM:SS.mmm Zone/Id' in the value's own zone."""
    c = _c(t)
    return F.concat(
        F.date_format(_render_naive(_named_local_instant(t)), "yyyy-MM-dd HH:mm:ss.SSS"),
        F.lit(" "),
        c["zone"],
    )


def tstz_named_at_timezone(t, zone) -> Column:
    """AT TIME ZONE 'Zone/Id': same instant, new zone."""
    return tstz_named(_c(t)["millis"], _c(zone))


def tstz_named_extract(field: str, t) -> Column:
    """extract over the value's local wall clock, DST-aware."""
    f = field.lower()
    local = _render_naive(_named_local_instant(t))
    if f == "millisecond":
        lm = F.unix_millis(_named_local_instant(t))
        return (lm % 1000 + 1000) % 1000
    return F.extract(F.lit(f), local)


def tstz_named_offset_minutes(t) -> Column:
    """The zone's UTC offset AT THIS VALUE'S INSTANT (changes across DST
    boundaries) in minutes."""
    c = _c(t)
    lm = F.unix_millis(_named_local_instant(t))
    return ((lm - c["millis"]) / MILLIS_PER_MINUTE).cast("int")


def tstz_named_instant_millis(t) -> Column:
    return _c(t)["millis"]
