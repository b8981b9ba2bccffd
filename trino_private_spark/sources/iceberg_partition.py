"""Iceberg partition specs + transforms (spec §"Partition Transforms").

Reference parity: the reference prunes Iceberg splits from manifest-entry
partition data before any file is opened
(plugin/trino-iceberg/.../IcebergSplitSource.java, specs parsed by
PartitionSpecParser; transforms in iceberg-api's Transforms). At 100 TB,
skipping manifests IS the point of Iceberg metadata — scan cost must be
O(matching partitions), not O(table).

Implemented transforms: identity, bucket[N], truncate[W], year, month,
day, hour, void. ``bucket`` uses the spec's murmur3_x86_32 hash of the
value's canonical bytes (8-byte little-endian for int/long/date/timestamp,
UTF-8 for strings) — implemented here from the public MurmurHash3
reference (Austin Appleby, public domain), NOT Spark's ``F.hash`` (seed 42,
4-byte ints — incompatible with Iceberg's layout).

Pruning logic: for a conjunctive predicate ``(col op literal)*`` a data
file survives iff every term is *possibly true* for the file's partition
tuple. Equality prunes on every transform; ranges prune on monotonic
transforms only (identity / truncate-int / year / month / day / hour):
with pv = T(row) for all rows of the file and T monotone non-decreasing,
``row >= v`` is impossible when ``pv < T(v)`` — the standard conservative
bound. Bucket only ever prunes equality/IN.
"""

from __future__ import annotations

import re
import struct
from dataclasses import dataclass
from datetime import date, datetime, timezone

__all__ = [
    "murmur3_x86_32",
    "PartitionField",
    "PartitionSpec",
    "parse_specs",
    "transform_value",
    "partition_value_type",
    "file_matches",
    "manifest_matches",
    "serialize_single_value",
    "deserialize_single_value",
    "metrics_match",
]

_EPOCH = date(1970, 1, 1)

#: IANA zone used to interpret NAIVE timestamp literals during pruning.
#: Spark evaluates the row-level predicate (and wrote the stored epoch
#: micros) in the session timezone, so the pruning instant must be
#: derived in the SAME zone or a non-UTC session could wrongly drop
#: files whose bounds fall inside the offset window. IcebergTable.read
#: syncs this from spark.sql.session.timeZone before pruning; the
#: default matches the engine's pinned UTC.
_SESSION_TZ = timezone.utc


def set_session_timezone(tz: str | None) -> None:
    """Bind the zone used for naive timestamp literals (called by the
    read path with the Spark session's ``spark.sql.session.timeZone``).
    Unknown/unloadable zone names fall back to UTC-offset spellings
    ('+05:30'); anything else keeps the previous zone — a wrong zone can
    only mis-prune, so the caller should treat failures as 'do not
    change'."""
    global _SESSION_TZ
    if not tz or tz.upper() in ("UTC", "Z", "GMT"):
        _SESSION_TZ = timezone.utc
        return
    m = re.fullmatch(r"([+-])(\d{2}):?(\d{2})", tz)
    if m:
        from datetime import timedelta

        sign = 1 if m.group(1) == "+" else -1
        _SESSION_TZ = timezone(
            sign * timedelta(hours=int(m.group(2)), minutes=int(m.group(3)))
        )
        return
    from zoneinfo import ZoneInfo

    _SESSION_TZ = ZoneInfo(tz)  # raises for unknown names (caller guards)


def murmur3_x86_32(data: bytes, seed: int = 0) -> int:
    """32-bit MurmurHash3 (x86 variant), the hash Iceberg's bucket
    transform mandates (spec Appendix B; reference vectors from the
    public smhasher suite). Returns a SIGNED 32-bit int like the JVM."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    nblocks = n // 4
    for i in range(nblocks):
        k = struct.unpack_from("<I", data, i * 4)[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    k = 0
    tail = data[nblocks * 4 :]
    if len(tail) >= 3:
        k ^= tail[2] << 16
    if len(tail) >= 2:
        k ^= tail[1] << 8
    if len(tail) >= 1:
        k ^= tail[0]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - 0x100000000 if h >= 0x80000000 else h


def _temporal(v, source_type: str):
    """Normalize a literal against a temporal source column, routing by
    ``source_type`` FIRST — never by Python type alone. A bare int is the
    physical encoding only for ``date`` sources (days from epoch); against
    a timestamp or unknown source it is ambiguous (micros? days? seconds?)
    and raises TypeError, which the pruning layer treats as un-evaluable
    (no prune) — pruning must be conservative by construction."""
    t = source_type.lower()
    if isinstance(v, bool):
        raise TypeError(f"cannot interpret {v!r} as a temporal value")
    if isinstance(v, int):
        if t == "date":
            return date.fromordinal(_EPOCH.toordinal() + v)
        raise TypeError(
            f"bare integer {v!r} is ambiguous for source type "
            f"{source_type or 'unknown'!r}; refusing to prune"
        )
    if isinstance(v, str):
        try:
            return (
                datetime.fromisoformat(v)
                if len(v) > 10
                else date.fromisoformat(v)
            )
        except ValueError as exc:
            raise TypeError(f"cannot parse {v!r} as a temporal value") from exc
    if isinstance(v, (datetime, date)):
        return v
    raise TypeError(f"cannot interpret {v!r} as a temporal value")


def _to_days(v) -> int:
    if isinstance(v, datetime):
        return (v.date() - _EPOCH).days
    if isinstance(v, date):
        return (v - _EPOCH).days
    if isinstance(v, str):
        return (date.fromisoformat(v) - _EPOCH).days
    raise TypeError(f"cannot interpret {v!r} as a date")


def _to_micros(v) -> int:
    """Epoch micros of a literal. NAIVE datetimes (and bare dates, which
    mean midnight) localize in the SESSION timezone — Spark's row filter
    interprets the same literal there, so pruning in any other zone
    would compare a shifted instant against the stored epoch-micros
    bounds (silent missing rows in non-UTC sessions)."""
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_SESSION_TZ)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, date):
        return _to_micros(datetime(v.year, v.month, v.day))
    if isinstance(v, str):
        return _to_micros(datetime.fromisoformat(v))
    raise TypeError(f"cannot interpret {v!r} as a timestamp")


def _date_parts(v) -> tuple[int, int, int]:
    """(year, month, day-of-month) of a date-ish value."""
    if isinstance(v, datetime):
        d = v.date()
    elif isinstance(v, date):
        d = v
    elif isinstance(v, str):
        d = date.fromisoformat(v)
    else:
        raise TypeError(f"cannot interpret {v!r} as a date")
    return d.year, d.month, d.day


def bucket_hash(v, source_type: str = "") -> int:
    """The spec's hash input per type: long/int/date/timestamp as 8-byte
    little-endian long; string as UTF-8; binary as-is; decimal as the
    minimal big-endian two's-complement of the unscaled value."""
    import decimal

    t = source_type.lower()
    if isinstance(v, bool):
        raise TypeError("bucket over boolean is not allowed by the spec")
    if isinstance(v, int) and t.startswith("timestamp"):
        # ambiguous: a bare int against a timestamp source might be micros
        # or seconds — refusing beats hashing a wrong encoding and pruning
        # files that hold matching rows
        raise TypeError(
            f"bare integer {v!r} is ambiguous for timestamp bucket source"
        )
    if isinstance(v, str) and t in ("date",):
        v = _to_days(v)
    if isinstance(v, (datetime, date)):
        v = _to_micros(v) if t.startswith("timestamp") else _to_days(v)
    if isinstance(v, decimal.Decimal):
        unscaled = int(v.scaleb(-v.as_tuple().exponent))
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        return murmur3_x86_32(unscaled.to_bytes(nbytes, "big", signed=True))
    if isinstance(v, int):
        return murmur3_x86_32(struct.pack("<q", v))
    if isinstance(v, str):
        return murmur3_x86_32(v.encode("utf-8"))
    if isinstance(v, (bytes, bytearray)):
        return murmur3_x86_32(bytes(v))
    raise TypeError(f"unsupported bucket source value {v!r}")


def transform_value(transform: str, v, source_type: str = ""):
    """Apply an Iceberg partition transform to a plain Python value,
    producing the partition value exactly as a writer stores it in the
    manifest entry's ``partition`` struct."""
    if v is None:
        return None
    t = transform.lower()
    st = source_type.lower()
    if t == "identity":
        if st == "date":
            return _to_days(_temporal(v, source_type))
        if st.startswith("timestamp"):
            # stored as epoch micros (spec partition-value encoding, and
            # what _pv_expr writes via unix_micros)
            return _to_micros(_temporal(v, source_type))
        return v
    if t == "void":
        return None
    m = re.fullmatch(r"bucket\[(\d+)\]", t)
    if m:
        n = int(m.group(1))
        return (bucket_hash(v, source_type) & 0x7FFFFFFF) % n
    m = re.fullmatch(r"truncate\[(\d+)\]", t)
    if m:
        w = int(m.group(1))
        if isinstance(v, str):
            return v[:w]
        if isinstance(v, int):
            return v - (((v % w) + w) % w)
        raise TypeError(f"truncate over {type(v).__name__} unsupported")
    # temporal transforms: normalize the literal by SOURCE TYPE first —
    # a bare int is days only for date sources; ambiguous ints raise and
    # the term becomes un-evaluable (no prune)
    if t in ("year", "years"):
        return _date_parts(_temporal(v, source_type))[0] - 1970
    if t in ("month", "months"):
        y, mo, _ = _date_parts(_temporal(v, source_type))
        return (y - 1970) * 12 + (mo - 1)
    if t in ("day", "days"):
        return _to_days(_temporal(v, source_type))
    if t in ("hour", "hours"):
        return _to_micros(_temporal(v, source_type)) // 3_600_000_000
    raise ValueError(f"unknown partition transform {transform!r}")


#: transforms that are monotone non-decreasing in their source value, so
#: range predicates prune conservatively by transforming the bound.
_MONOTONIC = re.compile(r"identity|truncate\[\d+\]|years?|months?|days?|hours?")


def partition_value_type(transform: str, source_type: str) -> str:
    """Iceberg primitive type of the partition VALUE a transform produces
    over a column of ``source_type`` (spec §"Partition Transforms" result
    types, narrowed to this writer's physical encodings: date -> int days,
    timestamp -> long micros). This is the type manifest-list
    field_summary bounds serialize under (Appendix D), shared by the
    writer (iceberg_write._partition_avro_fields) and the manifest-level
    pruner (manifest_matches) so both sides agree byte-for-byte."""
    t = transform.lower()
    st = (source_type or "").lower()
    if (
        t.startswith("bucket")
        or t == "void"
        or t in ("year", "years", "month", "months",
                 "day", "days", "hour", "hours")
    ):
        # day values are "days from epoch" ints like date; hour fits int
        return "int"
    if t.startswith("truncate"):
        return "string" if st == "string" else "long"
    # identity
    if st == "date":
        return "int"  # days from epoch
    if st.startswith("timestamp"):
        return "long"  # epoch micros
    if st in ("int", "long", "string", "double", "float", "boolean"):
        return st
    if st.startswith("decimal"):
        return st
    return "string"


@dataclass(frozen=True)
class PartitionField:
    name: str  # partition field name (as stored in the manifest struct)
    source_name: str  # source column name in the table schema
    source_type: str  # iceberg type of the source column
    transform: str


@dataclass(frozen=True)
class PartitionSpec:
    spec_id: int
    fields: tuple[PartitionField, ...]

    def by_source(self) -> dict[str, list[PartitionField]]:
        out: dict[str, list[PartitionField]] = {}
        for f in self.fields:
            out.setdefault(f.source_name, []).append(f)
        return out


def parse_specs(metadata: dict) -> dict[int, PartitionSpec]:
    """Parse ``partition-specs`` from a metadata.json (PartitionSpecParser
    analogue). Source columns resolve by field id against the current
    schema; unknown ids degrade to un-prunable fields, never to a wrong
    prune."""
    by_id: dict[int, tuple[str, str]] = {}
    schemas = metadata.get("schemas") or []
    cur_id = metadata.get("current-schema-id")
    schema = next(
        (s for s in schemas if s.get("schema-id") == cur_id),
        metadata.get("schema") or {},
    )
    for fld in schema.get("fields", []):
        t = fld.get("type")
        by_id[fld["id"]] = (fld["name"], t if isinstance(t, str) else "struct")
    specs: dict[int, PartitionSpec] = {}
    for spec in metadata.get("partition-specs") or []:
        fields = []
        for f in spec.get("fields", []):
            src = by_id.get(f.get("source-id"), ("", ""))
            fields.append(
                PartitionField(
                    name=f["name"],
                    source_name=src[0],
                    source_type=src[1],
                    transform=f.get("transform", "void"),
                )
            )
        specs[spec.get("spec-id", 0)] = PartitionSpec(
            spec_id=spec.get("spec-id", 0), fields=tuple(fields)
        )
    return specs


def _next_prefix(prefix: str) -> str | None:
    """Smallest string greater than EVERY string starting with
    ``prefix`` (last char incremented); None when not constructible.
    ``row LIKE 'p%'``  <=>  ``p <= row < _next_prefix(p)``."""
    for i in range(len(prefix) - 1, -1, -1):
        c = ord(prefix[i])
        if c < 0x10FFFF:
            return prefix[:i] + chr(c + 1)
    return None


def _prefix_compatible(pv, prefix: str) -> bool:
    """Can a partition value ``pv`` (identity: the row; truncate[W]:
    the row's first W chars) belong to a row starting with ``prefix``?
    Exactly when one is a prefix of the other — conservative for
    identity (allows the shorter-pv case that identity can't produce),
    exact for truncate."""
    if not isinstance(pv, str):
        return True
    return pv.startswith(prefix) or prefix.startswith(pv)


def _term_possible(field: PartitionField, pv, op: str, value) -> bool:
    """Can ``source op value`` hold for a row whose partition value is
    ``pv``? Conservative: True unless provably impossible."""
    if field.transform.lower() == "void":
        # a void field's stored partition value is ALWAYS null while row
        # values are arbitrary (partition-spec evolution drops fields by
        # voiding them) — it can never prove anything about rows
        return True
    opl = op.lower()
    if opl in ("isnull", "notnull"):
        # spec: every transform maps null rows to null partition values
        # and non-null rows to non-null ones, so the tuple decides:
        # pv null <=> the file's rows are null in the source column
        return (pv is None) if opl == "isnull" else (pv is not None)
    if opl == "prefix":
        # row LIKE 'value%': null rows never match; identity/truncate
        # partition values must be prefix-compatible with the literal
        if pv is None:
            return False
        t = field.transform.lower()
        if not isinstance(value, str):
            return True  # un-evaluable literal never prunes
        if t == "identity" or t.startswith("truncate"):
            return _prefix_compatible(pv, value)
        return True
    if op in ("=", "==", "eq"):
        values = [value]
        op = "in"
    elif op.lower() == "in":
        values = list(value)
    else:
        values = None
    try:
        if values is not None:
            if pv is None:
                return any(v is None for v in values)
            return any(
                transform_value(field.transform, v, field.source_type) == pv
                for v in values
                if v is not None
            )
        if not _MONOTONIC.fullmatch(field.transform.lower()):
            return True
        if pv is None or value is None:
            return True
        tv = transform_value(field.transform, value, field.source_type)
        if op in (">", ">=", "gt", "ge"):
            return pv >= tv
        if op in ("<", "<=", "lt", "le"):
            return pv <= tv
        return True
    except (TypeError, ValueError):
        return True  # un-evaluable term never prunes


def _summary_possible(field: PartitionField, summary: dict, op: str, value) -> bool:
    """Can ``source op value`` hold for ANY row of a manifest whose
    field_summary (contains_null + [lower, upper] partition-value bounds)
    is ``summary``? Conservative: True unless provably impossible for the
    whole manifest."""
    if field.transform.lower() == "void":
        return True
    contains_null = bool(summary.get("contains_null"))
    lo_b = summary.get("lower_bound")
    hi_b = summary.get("upper_bound")
    opl = op.lower()
    if opl == "isnull":
        # field_summary.contains_null is REQUIRED by the spec, but an
        # externally written / degraded summary may omit it — missing
        # must WIDEN (can't prove null-free), only an explicit False
        # proves the whole manifest null-free in this field
        if "contains_null" not in summary or summary["contains_null"] is None:
            return True
        return contains_null
    if opl == "notnull":
        # absent bounds cannot prove all-null (this writer omits
        # unserializable bounds) — never prune IS NOT NULL here
        return True
    if opl == "prefix":
        t = field.transform.lower()
        if t != "identity" and not t.startswith("truncate"):
            return True
        try:
            if lo_b is None or hi_b is None:
                return True
            vt = partition_value_type(field.transform, field.source_type)
            lo = deserialize_single_value(vt, lo_b)
            hi = deserialize_single_value(vt, hi_b)
            if not isinstance(lo, str) or not isinstance(hi, str):
                return True
            # every prefix-compatible partition value sits in
            # [value[:W], next(value)) — truncate may shorten the lower
            # end to its width, identity keeps the full literal —
            # so the manifest can match only if [lo, hi] intersects it
            w = len(value)
            if t.startswith("truncate"):
                m = re.fullmatch(r"truncate\[(\d+)\]", t)
                if m:
                    w = min(w, int(m.group(1)))
            if hi < value[:w]:
                return False
            nxt = _next_prefix(value)
            if nxt is not None and lo >= nxt:
                return False
            return True
        except (TypeError, ValueError, struct.error):
            return True
    if op in ("=", "==", "eq"):
        values = [value]
        op = "in"
    elif op.lower() == "in":
        values = list(value)
    else:
        values = None
    try:
        if lo_b is None or hi_b is None:
            # no recorded bounds: prune only the null-literal equality case
            # (bounds cover non-null values; their absence proves nothing)
            return True
        vt = partition_value_type(field.transform, field.source_type)
        lo = deserialize_single_value(vt, lo_b)
        hi = deserialize_single_value(vt, hi_b)
        if values is not None:
            if any(v is None for v in values) and contains_null:
                return True
            return any(
                lo <= transform_value(field.transform, v, field.source_type) <= hi
                for v in values
                if v is not None
            )
        if not _MONOTONIC.fullmatch(field.transform.lower()):
            return True
        if value is None:
            return True
        tv = transform_value(field.transform, value, field.source_type)
        if op in (">", ">=", "gt", "ge"):
            return hi >= tv
        if op in ("<", "<=", "lt", "le"):
            return lo <= tv
        return True
    except (TypeError, ValueError, struct.error):
        return True  # un-evaluable term never prunes


def manifest_matches(
    spec: PartitionSpec | None,
    summaries: list[dict] | None,
    predicate: list[tuple[str, str, object]],
) -> bool:
    """True iff a DATA manifest whose manifest-list entry carries these
    per-partition-field summaries can list files holding rows that satisfy
    the conjunctive ``predicate`` — the reference's manifest-level skip
    (iceberg-core ManifestGroup consuming ManifestFile.partitions(), used
    by plugin/trino-iceberg IcebergSplitSource split planning). Summaries
    are ordered like ``spec.fields`` (Iceberg spec: manifest_file field
    508). Manifests without summaries, from an unknown spec, or with
    un-evaluable terms are never skipped."""
    if spec is None or not summaries:
        return True
    by_index = {
        i: f for i, f in enumerate(spec.fields) if i < len(summaries)
    }
    for col, op, value in predicate:
        for i, f in by_index.items():
            if f.source_name != col:
                continue
            s = summaries[i]
            if not isinstance(s, dict):
                continue
            if not _summary_possible(f, s, op, value):
                return False
    return True


def file_matches(
    spec: PartitionSpec | None,
    partition: dict | None,
    predicate: list[tuple[str, str, object]],
) -> bool:
    """True iff a data file with this partition tuple can contain rows
    satisfying the conjunctive ``predicate`` [(source_col, op, value)...].
    Files from an unknown spec, or with no recorded partition tuple, are
    never pruned."""
    if spec is None or partition is None:
        return True
    by_src = spec.by_source()
    for col, op, value in predicate:
        for f in by_src.get(col, ()):
            if f.name not in partition:
                continue
            if not _term_possible(f, partition[f.name], op, value):
                return False
    return True


# --------------------------------------------------------------------------
# Column metrics: single-value serialization (Iceberg spec Appendix D
# "Single-value serialization") + min/max file pruning on manifest-entry
# lower_bounds/upper_bounds/null_value_counts — the reference prunes splits
# on these even for UNpartitioned predicates
# (plugin/trino-iceberg/.../IcebergSplitSource.java fileMatchesPredicate
# over the metrics domain). At 100 TB a selective predicate on a
# non-partition column must still skip files from metadata alone.
# --------------------------------------------------------------------------


def serialize_single_value(iceberg_type: str, v) -> bytes:
    """Spec Appendix D binary single-value serialization. Temporal values
    are expected in their PHYSICAL encoding already (date -> days int,
    timestamp -> micros int) — the writer normalizes before calling."""
    t = iceberg_type.lower()
    if t == "boolean":
        return b"\x01" if v else b"\x00"
    if t == "int":
        return struct.pack("<i", v)
    if t == "long":
        return struct.pack("<q", v)
    if t == "float":
        return struct.pack("<f", v)
    if t == "double":
        return struct.pack("<d", v)
    if t == "date":
        return struct.pack("<i", v)  # days from epoch
    if t.startswith("timestamp"):
        return struct.pack("<q", v)  # micros from epoch
    if t == "string":
        return str(v).encode("utf-8")
    if t.startswith("decimal"):
        import decimal

        unscaled = int(decimal.Decimal(v).scaleb(_dec_scale(t)))
        nbytes = max(1, (unscaled.bit_length() + 8) // 8)
        return unscaled.to_bytes(nbytes, "big", signed=True)
    raise TypeError(f"no single-value serialization for {iceberg_type!r}")


def _dec_scale(t: str) -> int:
    m = re.fullmatch(r"decimal\((\d+),\s*(\d+)\)", t)
    return int(m.group(2)) if m else 0


def deserialize_single_value(iceberg_type: str, b: bytes):
    """Inverse of serialize_single_value; temporal values come back in
    their physical encoding (ints)."""
    t = iceberg_type.lower()
    b = bytes(b)
    if t == "boolean":
        return b != b"\x00"
    if t in ("int", "date"):
        return struct.unpack("<i", b)[0]
    if t == "long" or t.startswith("timestamp"):
        return struct.unpack("<q", b)[0]
    if t == "float":
        return struct.unpack("<f", b)[0]
    if t == "double":
        return struct.unpack("<d", b)[0]
    if t == "string":
        return b.decode("utf-8")
    if t.startswith("decimal"):
        import decimal

        return decimal.Decimal(
            int.from_bytes(b, "big", signed=True)
        ).scaleb(-_dec_scale(t))
    raise TypeError(f"no single-value deserialization for {iceberg_type!r}")


def _physical(v, iceberg_type: str):
    """Query literal -> the physical comparison domain of the stored
    bounds (date -> days, timestamp -> micros; everything else as-is).
    Raises TypeError for un-evaluable combinations — callers skip the
    term (no prune)."""
    t = iceberg_type.lower()
    if t == "date":
        return _to_days(_temporal(v, t))
    if t.startswith("timestamp"):
        return _to_micros(_temporal(v, t))
    if isinstance(v, bool) or v is None:
        return v
    if t in ("int", "long") and not isinstance(v, int):
        raise TypeError(f"{v!r} is not comparable to {iceberg_type}")
    if t in ("float", "double") and not isinstance(v, (int, float)):
        raise TypeError(f"{v!r} is not comparable to {iceberg_type}")
    if t == "string" and not isinstance(v, str):
        raise TypeError(f"{v!r} is not comparable to string")
    return v


def metrics_match(
    schema_fields: list[dict],
    predicate: list[tuple[str, str, object]],
    lower_bounds: dict[int, bytes],
    upper_bounds: dict[int, bytes],
    null_value_counts: dict[int, int],
    value_counts: dict[int, int],
) -> bool:
    """True iff a data file whose manifest entry carries these column
    metrics can contain rows satisfying the conjunctive ``predicate``
    [(col, op, value), ...]. Conservative by construction: a column with
    no recorded metrics, an un-deserializable bound, or an un-evaluable
    literal never prunes. Mirrors IcebergSplitSource.fileMatchesPredicate:
    equality/IN prune outside [lo, hi] and on all-null columns; ranges
    prune against the opposing bound; NaN-bearing float bounds are not
    written by this writer (skipped at write time), keeping comparisons
    total."""
    by_name = {f["name"]: f for f in schema_fields}
    for col, op, value in predicate:
        fld = by_name.get(col)
        if fld is None or not isinstance(fld.get("type"), str):
            continue
        fid, t = fld["id"], fld["type"]
        nulls = null_value_counts.get(fid)
        cnt = value_counts.get(fid)
        all_null = (
            nulls is not None and cnt is not None and cnt > 0 and nulls == cnt
        )
        opl = op.lower()
        if opl == "isnull":
            # a recorded zero null count proves the file null-free
            if nulls is not None and int(nulls) == 0:
                return False
            continue
        if opl == "notnull":
            if all_null:
                return False
            continue
        if opl == "prefix":
            # row LIKE 'value%': rows sit in [value, next(value)) —
            # prune when the file's string bounds miss that range
            if all_null:
                return False
            lo_b, hi_b = lower_bounds.get(fid), upper_bounds.get(fid)
            if (
                t != "string"
                or not isinstance(value, str)
                or lo_b is None
                or hi_b is None
            ):
                continue
            try:
                lo = deserialize_single_value(t, lo_b)
                hi = deserialize_single_value(t, hi_b)
            except (TypeError, ValueError, struct.error):
                continue
            if not isinstance(lo, str) or not isinstance(hi, str):
                continue
            if hi < value:
                return False
            nxt = _next_prefix(value)
            if nxt is not None and lo >= nxt:
                return False
            continue
        values = value if opl == "in" else [value]
        if all_null and all(v is not None for v in values):
            # every comparison/equality with a non-null literal is false
            # on an all-null column (3VL: NULL op x is never TRUE)
            return False
        lo_b, hi_b = lower_bounds.get(fid), upper_bounds.get(fid)
        if lo_b is None or hi_b is None:
            continue
        try:
            lo = deserialize_single_value(t, lo_b)
            hi = deserialize_single_value(t, hi_b)
            if op in ("=", "==", "eq", "IN", "in", "In"):
                phys = [
                    _physical(v, t) for v in values if v is not None
                ]
                if phys and not any(lo <= p <= hi for p in phys):
                    return False
            elif op in (">", "gt"):
                if value is not None and not hi > _physical(value, t):
                    return False
            elif op in (">=", "ge"):
                if value is not None and not hi >= _physical(value, t):
                    return False
            elif op in ("<", "lt"):
                if value is not None and not lo < _physical(value, t):
                    return False
            elif op in ("<=", "le"):
                if value is not None and not lo <= _physical(value, t):
                    return False
        except (TypeError, ValueError, struct.error):
            continue  # un-evaluable term never prunes
    return True
