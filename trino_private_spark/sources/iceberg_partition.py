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
    "file_matches",
]

_EPOCH = date(1970, 1, 1)


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


def _to_days(v) -> int:
    if isinstance(v, int):
        return v
    if isinstance(v, datetime):
        return (v.date() - _EPOCH).days
    if isinstance(v, date):
        return (v - _EPOCH).days
    if isinstance(v, str):
        return (date.fromisoformat(v) - _EPOCH).days
    raise TypeError(f"cannot interpret {v!r} as a date")


def _to_micros(v) -> int:
    if isinstance(v, int):
        return v
    if isinstance(v, datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, date):
        return _to_days(v) * 86_400_000_000
    if isinstance(v, str):
        return _to_micros(datetime.fromisoformat(v))
    raise TypeError(f"cannot interpret {v!r} as a timestamp")


def _date_parts(v) -> tuple[int, int, int]:
    """(year, month, day-of-month) of a date-ish value."""
    if isinstance(v, int):  # days from epoch (the avro/physical encoding)
        d = date.fromordinal(_EPOCH.toordinal() + v)
    elif isinstance(v, datetime):
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
    if t == "identity":
        if source_type.lower() == "date":
            return _to_days(v)
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
    if t in ("year", "years"):
        return _date_parts(v)[0] - 1970
    if t in ("month", "months"):
        y, mo, _ = _date_parts(v)
        return (y - 1970) * 12 + (mo - 1)
    if t in ("day", "days"):
        return _to_days(v)
    if t in ("hour", "hours"):
        return _to_micros(v) // 3_600_000_000
    raise ValueError(f"unknown partition transform {transform!r}")


#: transforms that are monotone non-decreasing in their source value, so
#: range predicates prune conservatively by transforming the bound.
_MONOTONIC = re.compile(r"identity|truncate\[\d+\]|years?|months?|days?|hours?")


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


def _term_possible(field: PartitionField, pv, op: str, value) -> bool:
    """Can ``source op value`` hold for a row whose partition value is
    ``pv``? Conservative: True unless provably impossible."""
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
