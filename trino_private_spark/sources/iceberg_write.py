"""Iceberg v2 WRITE path: CTAS / INSERT (append) / DELETE emitting real
Iceberg metadata trees that the read shim (sources/iceberg.py) — and any
spec-conforming reader — can consume.

Reference parity: plugin/trino-iceberg IcebergMetadata.java:397
(beginCreateTable), :418 (beginInsert), :611 (executeDelete via
position-delete files). Commits follow the spec's append model: every
write produces

  1. field-id-annotated parquet data (or position-delete) files under
     ``<location>/data/``, written DISTRIBUTED via ``mapInArrow`` — one
     file per non-empty partition, no driver materialization, so the
     path scales to arbitrarily large appends;
  2. one Avro manifest for the new files;
  3. a new manifest LIST carrying every prior manifest plus the new one
     (append-style history, exactly what iceberg_testing.build_table
     emits and the shim's DeleteFileIndex-scoped reader expects);
  4. a new ``v<N+1>.metadata.json`` with the snapshot appended,
     ``last-sequence-number`` bumped and ``current-snapshot-id`` moved —
     old metadata versions stay on disk, so FOR VERSION/TIMESTAMP AS OF
     time travel keeps working across writes.

DELETE writes position-delete files (content=1, file_path/pos with the
spec's reserved field ids 2147483546/2147483545) for the CURRENTLY
VISIBLE rows matching the predicate — matched via the read shim's
lineage columns — at the next sequence number, so earlier snapshots are
untouched and re-inserted rows (CDC) survive per the spec's
sequence-number scoping.

UPDATE commits its position deletes and replacement rows ATOMICALLY in a
single snapshot (two manifests, one manifest list, one metadata swing) —
the reference's RowDelta (IcebergMetadata.finishWrite): no reader or
time-travel query can observe a state where the updated rows are absent.

Partitioned tables: ``partition_by`` on create records a real partition
spec (identity/bucket/truncate/year/month/day/hour); every write computes
the partition tuple per row (bucket via the spec's murmur3_x86_32),
repartitions so each emitted file holds exactly one tuple, and stores the
tuple in the manifest entry — the metadata read-side pruning keys on.
Appends and updates re-apply the table's default spec automatically.
Data files may be PARQUET (default) or ORC.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.sources.iceberg import (
    IcebergTable,
    read_avro_container_cached,
    write_avro_container,
)
from trino_private_spark.sources.iceberg_partition import (
    serialize_single_value,
)
from trino_private_spark.sources.iceberg_testing import (
    MANIFEST_ENTRY_SCHEMA,
    MANIFEST_LIST_SCHEMA,
)

POS_DELETE_IDS = {"file_path": 2147483546, "pos": 2147483545}

_SPARK_TO_ICEBERG = {
    "long": "long",
    "bigint": "long",
    "int": "int",
    "integer": "int",
    "short": "int",
    "byte": "int",
    "double": "double",
    "float": "float",
    "string": "string",
    "boolean": "boolean",
    "date": "date",
    "binary": "binary",
}


def _iceberg_type(spark_type: str) -> str:
    t = spark_type.lower()
    if t in _SPARK_TO_ICEBERG:
        return _SPARK_TO_ICEBERG[t]
    if t.startswith("decimal"):
        return t  # decimal(p, s) spells the same
    if t.startswith("timestamp"):
        return "timestamp"
    raise ValueError(f"unsupported Iceberg column type: {spark_type}")


def _write_files_distributed(
    df: DataFrame,
    out_dir: str,
    field_ids: dict[str, int],
    part_cols: list[str] | None = None,
    file_format: str = "PARQUET",
) -> list[dict]:
    """Write one field-id-annotated parquet (or ORC) file per non-empty
    Spark partition of ``df`` under ``out_dir`` (executor-side pyarrow
    writers, Arrow batches — nothing is collected to the driver) and
    return per-file stats rows {path, record_count, file_size_in_bytes,
    partition}.

    ``part_cols`` names precomputed partition-VALUE columns (``__pv__*``):
    the caller has already ``repartition``-ed on them so same-tuple rows
    co-locate; each task then splits its batch per distinct tuple so every
    emitted file belongs to exactly ONE Iceberg partition (the invariant
    manifest-level pruning relies on). The pv columns are stripped from
    the stored data and recorded in the stats row instead."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    ids = dict(field_ids)
    pvs = list(part_cols or [])
    fmt = file_format.upper()
    if fmt not in ("PARQUET", "ORC"):
        raise ValueError(f"unsupported write format {file_format!r}")
    ext = fmt.lower()

    def write_partition(batches):
        import pyarrow as pa  # noqa: PLC0415 (executor-side import)

        collected = [b for b in batches if b.num_rows]
        if not collected:
            return
        table = pa.Table.from_batches(collected)

        def column_metrics(data):
            """Per-column {nulls, count[, lo, hi]} for the manifest entry
            (spec column metrics; physical encodings for temporal types).
            Columns where a sound bound can't be produced (NaN floats,
            long strings, nested/binary types) record counts only —
            missing bounds never prune."""
            import datetime as _dt  # noqa: PLC0415

            import pyarrow.compute as pc  # noqa: PLC0415
            import pyarrow.types as pt  # noqa: PLC0415

            out = {}
            for name in data.schema.names:
                col = data.column(name)
                n = len(col)
                entry = {"nulls": col.null_count, "count": n}
                typ = data.schema.field(name).type
                boundable = (
                    pt.is_integer(typ)
                    or pt.is_floating(typ)
                    or pt.is_string(typ)
                    or pt.is_date(typ)
                    or pt.is_timestamp(typ)
                    or pt.is_boolean(typ)
                )
                if boundable and col.null_count < n:
                    mm = pc.min_max(col)
                    lo, hi = mm["min"].as_py(), mm["max"].as_py()
                    if isinstance(lo, _dt.datetime):
                        lo, hi = (
                            _plain(v) for v in (lo, hi)
                        )  # -> epoch micros
                    elif isinstance(lo, _dt.date):
                        lo, hi = (_plain(v) for v in (lo, hi))  # -> days
                    if isinstance(lo, float) and (lo != lo or hi != hi):
                        lo = None  # NaN poisons ordering; skip bounds
                    if isinstance(lo, str) and (
                        len(lo) > 64 or len(hi) > 64
                    ):
                        lo = None  # spec truncates; we skip (conservative)
                    if lo is not None:
                        entry["lo"], entry["hi"] = lo, hi
                out[name] = entry
            return out

        def emit_one(tbl, part_json):
            data = tbl.drop_columns(pvs) if pvs else tbl
            fields = []
            for name in data.schema.names:
                f = data.schema.field(name)
                meta = {b"PARQUET:field_id": str(ids[name]).encode()}
                fields.append(pa.field(name, f.type, metadata=meta))
            path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.{ext}")
            cast = data.cast(pa.schema(fields))
            if fmt == "ORC":
                from pyarrow import orc  # noqa: PLC0415

                # ORC carries no parquet field ids; names are the contract
                orc.write_table(data, path)
            else:
                import pyarrow.parquet as pq  # noqa: PLC0415

                pq.write_table(cast, path)
            return pa.RecordBatch.from_pydict(
                {
                    "path": [path],
                    "record_count": [data.num_rows],
                    "file_size_in_bytes": [os.path.getsize(path)],
                    "partition_json": [part_json],
                    "metrics_json": [json.dumps(column_metrics(data))],
                }
            )

        if not pvs:
            yield emit_one(table, None)
            return
        # Split per partition tuple in Arrow DIRECTLY — never through
        # pandas: to_pandas() degrades a nullable int64 column to float64,
        # and rebuilding the parquet schema from the degraded frame would
        # write DOUBLE where the table schema says long (silent type
        # corruption + precision loss past 2^53).
        import pyarrow.compute as pc  # noqa: PLC0415

        distinct = table.select(pvs).group_by(pvs).aggregate([])
        tuples = sorted(
            distinct.to_pylist(),
            key=lambda d: tuple((v is None, v) for v in d.values()),
        )
        for key in tuples:
            mask = None
            for c in pvs:
                col = table.column(c)
                term = (
                    pc.is_null(col)
                    if key[c] is None
                    else pc.equal(col, key[c])
                )
                mask = term if mask is None else pc.and_kleene(mask, term)
            part = {
                c[len("__pv__") :]: _plain(key[c]) for c in pvs
            }
            yield emit_one(table.filter(mask), json.dumps(part))

    stats = df.mapInArrow(
        write_partition,
        "path string, record_count long, file_size_in_bytes long, "
        "partition_json string, metrics_json string",
    ).collect()
    return [
        {
            "path": r["path"],
            "record_count": r["record_count"],
            "file_size_in_bytes": r["file_size_in_bytes"],
            "partition": (
                json.loads(r["partition_json"])
                if r["partition_json"] is not None
                else None
            ),
            "metrics": json.loads(r["metrics_json"]),
        }
        for r in stats
    ]


def _plain(v):
    """numpy/temporal scalar -> plain Python (json/avro-encodable).
    Temporal values store as the spec's physical encoding (timestamp ->
    epoch micros, date -> days from epoch) — the same longs/ints
    transform_value produces on the read-pruning side."""
    import datetime as _dt

    import numpy as np

    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, np.floating):
        return float(v)
    if isinstance(v, _dt.datetime):  # pd.Timestamp is a datetime subclass
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        return int(v.timestamp() * 1_000_000)
    if isinstance(v, _dt.date):
        return (v - _dt.date(1970, 1, 1)).days
    return v


def _latest_version(location: str) -> int:
    import glob
    import re

    best = 0
    for p in glob.glob(os.path.join(location, "metadata", "*.metadata.json")):
        m = re.match(r"v?(\d+)", os.path.basename(p))
        if m:
            best = max(best, int(m.group(1)))
    return best


class CommitFailedException(RuntimeError):
    """A concurrent writer committed the metadata version this commit
    targeted (the reference's org.apache.iceberg CommitFailedException,
    surfaced through plugin/trino-iceberg on optimistic-lock loss)."""


class CommitConflictException(CommitFailedException):
    """A REPLACE commit found a different current snapshot than the one
    it planned from — retrying with the stale plan would silently drop
    the interleaved commit's files from the new manifest list (data
    loss), so the caller must RE-PLAN instead (the reference's
    RewriteFiles/ValidationException behavior: conflicting commits fail
    the rewrite rather than being blindly retried)."""


def atomic_write_metadata(location: str, metadata: dict, version: int) -> str:
    """Commit ``metadata`` as ``v{version}.metadata.json`` ATOMICALLY:
    write a temp file in the same directory, then hard-link it to the
    target name — the link fails with FileExistsError when a concurrent
    writer already claimed the version (raised as
    CommitFailedException). Readers never observe a partial file, and
    two writers never silently clobber each other — the optimistic
    swap HadoopTableOperations performs with rename-if-absent."""
    import json as _json
    import uuid as _uuid

    md_dir = os.path.join(location, "metadata")
    os.makedirs(md_dir, exist_ok=True)
    target = os.path.join(md_dir, f"v{version}.metadata.json")
    tmp = os.path.join(md_dir, f".tmp-{_uuid.uuid4().hex}.metadata.json")
    with open(tmp, "w") as fh:
        _json.dump(metadata, fh)
    try:
        os.link(tmp, target)
    except FileExistsError:
        raise CommitFailedException(
            f"metadata version {version} was committed concurrently "
            f"({target} exists); retry the commit against the new base"
        ) from None
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    return target


_METRIC_FIELDS = (
    ("value_counts", "long"),
    ("null_value_counts", "long"),
    ("lower_bounds", "bytes"),
    ("upper_bounds", "bytes"),
)


def _entry_schema(partition_avro: list[tuple[str, str]] | None) -> dict:
    """Manifest-entry Avro schema, extended with the table's partition
    record when the table is partitioned (spec: data_file.partition,
    field 102) and the column-metrics maps (spec fields 109/110/125/128;
    keyed by field id — avro map keys are strings, so ids stringify)."""
    import copy

    schema = copy.deepcopy(MANIFEST_ENTRY_SCHEMA)
    data_file_fields = next(
        f for f in schema["fields"] if f["name"] == "data_file"
    )["type"]["fields"]
    for name, vt in _METRIC_FIELDS:
        data_file_fields.append(
            {
                "name": name,
                "type": ["null", {"type": "map", "values": vt}],
            }
        )
    if partition_avro:
        part_rec = {
            "type": "record",
            "name": "r102",
            "fields": [
                {"name": n, "type": ["null", t]} for n, t in partition_avro
            ],
        }
        data_file = next(
            f for f in schema["fields"] if f["name"] == "data_file"
        )
        df_fields = data_file["type"]["fields"]
        at = next(
            i for i, f in enumerate(df_fields) if f["name"] == "file_format"
        )
        df_fields.insert(at + 1, {"name": "partition", "type": ["null", part_rec]})
    return schema


def _commit_snapshot(
    location: str,
    groups: list[tuple[list[dict], int]],
    **kwargs,
) -> int:
    """Optimistic-concurrency wrapper over _commit_snapshot_once (the
    reference's SnapshotProducer.commit retry loop): when a concurrent
    writer claims the targeted metadata version, the WHOLE commit
    re-derives against the new base — already-written data files are
    inputs and stay valid; manifests and the snapshot id recompute. Two
    retries, then the CommitFailedException surfaces.

    CommitConflictException is NEVER retried: a replace commit whose
    planned parent snapshot was superseded must re-plan, not blindly
    re-apply a stale file list (r8 ADVICE — retrying would drop the
    interleaved commit's files). ``skip_if`` (see _commit_snapshot_once)
    is re-evaluated on every retry against the freshly-read base, which
    is what makes check-then-commit idempotence race-safe."""
    last: CommitFailedException | None = None
    for _ in range(3):
        try:
            return _commit_snapshot_once(location, groups, **kwargs)
        except CommitConflictException:
            raise
        except CommitFailedException as exc:
            last = exc
    raise last  # type: ignore[misc]


def _commit_snapshot_once(
    location: str,
    groups: list[tuple[list[dict], int]],
    *,
    operation: str,
    schema_fields: list[tuple[int, str, str]] | None = None,
    partition_spec: list[dict] | None = None,
    file_format: str = "PARQUET",
    properties: dict[str, str] | None = None,
    replace: bool = False,
    sort_order: list[dict] | None = None,
    summary_extra: dict[str, str] | None = None,
    extra_manifest_entries: (
        list[tuple[list[dict], int, int]] | None
    ) = None,
    expected_current_snapshot_id: int | None = None,
    skip_if=None,
) -> int | None:
    """Commit ONE snapshot referencing every file group in ``groups``
    (``[(files, content), ...]``) — one manifest per group, all at the
    same sequence number, in one manifest list, in one metadata swing.
    This is the reference's atomic RowDelta shape
    (IcebergMetadata.finishWrite commits deletes + appends together); a
    crash before the final metadata.json write leaves only unreferenced
    orphan files, never an intermediate visible state. Creates the table
    metadata if this is the first commit (``schema_fields`` required;
    ``partition_spec`` optional spec fields
    ``[{name, transform, source-id, field-id}]``). With ``replace`` the
    new manifest list carries ONLY the new manifests (OPTIMIZE /
    rewrite commits: prior files drop out of the new snapshot while old
    snapshots keep their own manifest lists). Returns the new snapshot
    id.

    ``expected_current_snapshot_id``: the parent the caller PLANNED
    from; a mismatch raises CommitConflictException (not retried —
    replace callers must re-plan or lose interleaved commits, the
    reference's RewriteFiles conflict validation). ``skip_if(metadata)``
    returning True makes the whole commit a no-op (returns None) — the
    idempotence hook the streaming sink re-checks INSIDE the optimistic
    retry, where a lost race has already refreshed the base."""
    md_dir = os.path.join(location, "metadata")
    os.makedirs(md_dir, exist_ok=True)
    version = _latest_version(location)
    if version == 0:
        if schema_fields is None:
            raise ValueError("new table needs schema_fields")
        metadata = {
            "format-version": 2,
            "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, location)),
            "location": location,
            "last-sequence-number": 0,
            "last-updated-ms": 0,
            "current-schema-id": 0,
            "last-column-id": max((i for i, _, _ in schema_fields), default=0),
            "schemas": [
                {
                    "type": "struct",
                    "schema-id": 0,
                    "fields": [
                        {"id": i, "name": n, "required": False, "type": t}
                        for i, n, t in schema_fields
                    ],
                }
            ],
            "default-spec-id": 0,
            "partition-specs": [
                {"spec-id": 0, "fields": partition_spec or []}
            ],
            "current-snapshot-id": -1,
            "snapshots": [],
            "properties": dict(properties or {}),
            # spec §"Sort Orders": order 0 = unsorted; a real sorted_by
            # records order 1 and makes it the default
            "sort-orders": (
                [
                    {"order-id": 0, "fields": []},
                    {"order-id": 1, "fields": sort_order},
                ]
                if sort_order
                else [{"order-id": 0, "fields": []}]
            ),
            "default-sort-order-id": 1 if sort_order else 0,
        }
        prior_manifests: list[dict] = []
        cur = None
    else:
        metadata = IcebergTable(location).metadata
        if skip_if is not None and skip_if(metadata):
            return None
        cur_id = metadata.get("current-snapshot-id", -1)
        if (
            expected_current_snapshot_id is not None
            and cur_id != expected_current_snapshot_id
        ):
            raise CommitConflictException(
                f"planned against snapshot {expected_current_snapshot_id} "
                f"but the current snapshot is now {cur_id}; re-plan the "
                "commit (a blind retry would drop the interleaved "
                "commit's files)"
            )
        cur = None
        for s in metadata.get("snapshots", []):
            if s["snapshot-id"] == cur_id:
                cur = s
        prior_manifests = (
            read_avro_container_cached(cur["manifest-list"]) if cur else []
        )

    spec_id = int(metadata.get("default-spec-id", 0))
    spec_fields = next(
        (
            s.get("fields", [])
            for s in metadata.get("partition-specs", [])
            if s.get("spec-id") == spec_id
        ),
        [],
    )
    part_avro = _partition_avro_fields(metadata, spec_fields)
    entry_schema = _entry_schema(part_avro)
    cur_schema_id = metadata.get("current-schema-id")
    cur_schema = next(
        (
            s
            for s in metadata.get("schemas", [])
            if s.get("schema-id") == cur_schema_id
        ),
        {},
    )
    field_by_name = {
        f["name"]: (f["id"], f["type"])
        for f in cur_schema.get("fields", [])
        if isinstance(f.get("type"), str)
    }

    src_type_by_id = {
        f["id"]: f["type"]
        for f in cur_schema.get("fields", [])
        if isinstance(f.get("type"), str)
    }

    def _field_summaries(entries: list[dict]) -> list[dict] | None:
        """Manifest-list field_summary per partition field (spec field
        508): contains_null + Appendix-D bounds over the manifest's
        partition VALUES — the metadata that lets a reader skip this
        whole manifest. Bounds that fail to serialize are simply omitted
        (absent bounds never prune)."""
        if not spec_fields or not entries:
            return None
        from trino_private_spark.sources.iceberg_partition import (
            partition_value_type,
        )

        out = []
        for sf in spec_fields:
            pname = sf["name"]
            st = src_type_by_id.get(sf.get("source-id"), "")
            vt = partition_value_type(sf.get("transform", "identity"), st)
            vals: list = []
            contains_null = False
            for e in entries:
                part = e["data_file"].get("partition") or {}
                v = part.get(pname)
                if v is None:
                    contains_null = True
                else:
                    vals.append(v)
            s: dict = {
                "contains_null": contains_null,
                "lower_bound": None,
                "upper_bound": None,
            }
            if vt.startswith("decimal"):
                # identity-decimal partition values are stored as strings
                # whose lexicographic min/max is NOT the numeric one —
                # bounds from them could wrongly prune; omit (conservative)
                vals = []
            if vals:
                try:
                    s["lower_bound"] = serialize_single_value(vt, min(vals))
                    s["upper_bound"] = serialize_single_value(vt, max(vals))
                except (TypeError, ValueError, OverflowError):
                    pass
            out.append(s)
        return out

    seq = int(metadata.get("last-sequence-number", 0)) + 1
    snap_id = (
        max(
            (s["snapshot-id"] for s in metadata.get("snapshots", [])),
            default=0,
        )
        + 1
    )
    now_ms = int(time.time() * 1000)

    # attempt-unique file names: a commit that loses the optimistic
    # race and retries must never have SHARED a manifest/manifest-list
    # path with the winner (same base -> same snap_id -> a name collision
    # would let the loser clobber the winner's committed files); real
    # Iceberg suffixes a commit UUID for exactly this reason
    attempt = uuid.uuid4().hex[:8]
    new_manifests: list[dict] = []
    for gi, (new_files, content) in enumerate(groups):
        manifest_path = os.path.join(
            md_dir, f"manifest-{snap_id}-{gi}-{attempt}.avro"
        )
        entries = []
        for f in new_files:
            data_file = {
                "content": content,
                "file_path": f["path"],
                "file_format": f.get("file_format", file_format).upper(),
                "record_count": f["record_count"],
                "file_size_in_bytes": f["file_size_in_bytes"],
                "equality_ids": f.get("equality_ids"),
            }
            # column metrics (spec: value_counts/null_value_counts by
            # field id; lower/upper bounds in Appendix-D single-value
            # serialization) — the read side prunes files on these even
            # for predicates on UNpartitioned columns
            vc, nvc, lob, upb = {}, {}, {}, {}
            for name, e in (f.get("metrics") or {}).items():
                ft = field_by_name.get(name)
                if ft is None or content != 0:
                    continue
                fid, ityp = ft
                vc[str(fid)] = int(e["count"])
                nvc[str(fid)] = int(e["nulls"])
                if "lo" in e:
                    try:
                        lob[str(fid)] = serialize_single_value(
                            ityp, e["lo"]
                        )
                        upb[str(fid)] = serialize_single_value(
                            ityp, e["hi"]
                        )
                    except (TypeError, ValueError, OverflowError):
                        pass  # unserializable bound -> counts only
            data_file["value_counts"] = vc or None
            data_file["null_value_counts"] = nvc or None
            data_file["lower_bounds"] = lob or None
            data_file["upper_bounds"] = upb or None
            if part_avro:
                part = f.get("partition") or {}
                data_file["partition"] = {
                    n: part.get(n) for n, _ in part_avro
                }
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snap_id,
                    # inherited from the manifest list
                    "sequence_number": None,
                    "data_file": data_file,
                }
            )
        write_avro_container(manifest_path, entry_schema, entries)
        new_manifests.append(
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": spec_id,
                "content": 0 if content == 0 else 1,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
                "partitions": _field_summaries(entries),
            }
        )
    # EXISTING carry-over manifests (partial OPTIMIZE: files kept as-is
    # in a replace snapshot): raw manifest-entry lists with status 0 and
    # RESOLVED sequence numbers, one manifest per (entries, spec_id,
    # list_content) group. No field_summaries are recomputed (absent
    # summaries never wrong-prune).
    specs_by_id = {
        s.get("spec-id", 0): s.get("fields", [])
        for s in metadata.get("partition-specs", [])
    }
    for gi, (entries, e_spec, e_content) in enumerate(
        extra_manifest_entries or []
    ):
        if not entries:
            continue
        e_avro = _partition_avro_fields(metadata, specs_by_id.get(e_spec, []))
        manifest_path = os.path.join(
            md_dir, f"manifest-{snap_id}-x{gi}-{attempt}.avro"
        )
        write_avro_container(manifest_path, _entry_schema(e_avro), entries)
        new_manifests.append(
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": e_spec,
                "content": e_content,
                "sequence_number": seq,
                "min_sequence_number": min(
                    int(e.get("sequence_number") or 0) for e in entries
                ),
                "added_snapshot_id": snap_id,
                "partitions": None,
            }
        )
    manifest_list_path = os.path.join(
        md_dir, f"snap-{snap_id}-{attempt}.avro"
    )
    write_avro_container(
        manifest_list_path,
        MANIFEST_LIST_SCHEMA,
        new_manifests if replace else list(prior_manifests) + new_manifests,
    )
    parent = metadata.get("current-snapshot-id", -1)
    # spec §"Snapshot Summary": standard metrics fields as a
    # string->string map — added-* from THIS commit's file groups,
    # total-* tracked INCREMENTALLY from the parent summary (the
    # iceberg-core SnapshotSummary.Builder discipline; replace commits
    # recompute totals exactly from their own manifest contents, and a
    # parent without totals — older shim writes, external fixtures —
    # makes the totals honestly absent rather than wrong)
    added_data_files = added_records = added_files_size = 0
    added_delete_files = 0
    for files_g, content_g in groups:
        if content_g == 0:
            added_data_files += len(files_g)
            added_records += sum(int(f["record_count"]) for f in files_g)
            added_files_size += sum(
                int(f["file_size_in_bytes"]) for f in files_g
            )
        else:
            added_delete_files += len(files_g)
    summary = {
        "operation": operation,
        "added-data-files": str(added_data_files),
        "added-records": str(added_records),
        "added-files-size": str(added_files_size),
        "added-delete-files": str(added_delete_files),
    }
    if replace:
        tot_rec = added_records
        tot_df, tot_del = added_data_files, added_delete_files
        for entries, _spec, _content in extra_manifest_entries or []:
            for e in entries:
                dfile = e.get("data_file") or {}
                if int(dfile.get("content") or 0) == 0:
                    tot_df += 1
                    tot_rec += int(dfile.get("record_count") or 0)
                else:
                    tot_del += 1
        summary["total-records"] = str(tot_rec)
        summary["total-data-files"] = str(tot_df)
        summary["total-delete-files"] = str(tot_del)
    else:
        parent_summary = (cur.get("summary") or {}) if cur else {}
        if cur is None or "total-records" in parent_summary:
            base = lambda k: int(parent_summary.get(k, 0))  # noqa: E731
            summary["total-records"] = str(
                base("total-records") + added_records
            )
            summary["total-data-files"] = str(
                base("total-data-files") + added_data_files
            )
            summary["total-delete-files"] = str(
                base("total-delete-files") + added_delete_files
            )
    metadata["snapshots"] = list(metadata.get("snapshots", [])) + [
        {
            "snapshot-id": snap_id,
            "timestamp-ms": now_ms,
            "sequence-number": seq,
            "manifest-list": manifest_list_path,
            # summary_extra carries writer markers alongside the spec's
            # operation key (e.g. the streaming sink's batch id — the
            # idempotence marker Iceberg's own streaming writers record)
            "summary": {**summary, **(summary_extra or {})},
            # spec: ancestry pointer ($history / expire-snapshots walk it)
            "parent-snapshot-id": parent if parent != -1 else None,
            # spec: snapshots record the schema they were written under —
            # time travel reads a pre-evolution snapshot in its own shape
            "schema-id": int(metadata.get("current-schema-id", 0)),
        }
    ]
    metadata["current-snapshot-id"] = snap_id
    metadata["last-sequence-number"] = seq
    metadata["last-updated-ms"] = now_ms
    # spec "metadata-log": previous metadata files, oldest first — the
    # $metadata_log_entries table and metadata rollback tooling read it
    if version:
        metadata["metadata-log"] = list(metadata.get("metadata-log") or []) + [
            {
                "timestamp-ms": now_ms,
                "metadata-file": os.path.join(
                    md_dir, f"v{version}.metadata.json"
                ),
            }
        ]
    atomic_write_metadata(location, metadata, version + 1)
    return snap_id


def _partition_avro_fields(
    metadata: dict, spec_fields: list[dict]
) -> list[tuple[str, str]]:
    """(name, avro primitive type) per partition field — the manifest
    partition-record layout implied by transform + source type."""
    if not spec_fields:
        return []
    by_id: dict[int, str] = {}
    cur = metadata.get("current-schema-id")
    schema = next(
        (s for s in metadata.get("schemas", []) if s.get("schema-id") == cur),
        {},
    )
    for fld in schema.get("fields", []):
        t = fld.get("type")
        by_id[fld["id"]] = t if isinstance(t, str) else "string"
    from trino_private_spark.sources.iceberg_partition import (
        partition_value_type,
    )

    prim_to_avro = {
        "int": "int", "long": "long", "string": "string",
        "double": "double", "float": "float", "boolean": "boolean",
    }
    out: list[tuple[str, str]] = []
    for f in spec_fields:
        vt = partition_value_type(
            f.get("transform", "identity"),
            by_id.get(f.get("source-id"), "string"),
        )
        out.append((f["name"], prim_to_avro.get(vt, "string")))
    return out


def _bucket_pv(n: int, source_type: str):
    """Arrow pandas UDF computing the spec's bucket partition value —
    murmur3_x86_32 over canonical bytes (iceberg_partition.bucket_hash),
    NOT Spark's F.hash (seed 42, 4-byte ints: a different layout)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import IntegerType

    def conv(v):
        import numpy as np

        if isinstance(v, np.integer):
            return int(v)
        return v

    def run(s):  # annotation-free: hints would need module-global resolution
        from trino_private_spark.sources.iceberg_partition import bucket_hash

        return s.map(
            lambda v: None
            if v is None or (isinstance(v, float) and pd.isna(v))
            else (bucket_hash(conv(v), source_type) & 0x7FFFFFFF) % n
        )

    from pyspark.sql.functions import PandasUDFType

    return pandas_udf(run, IntegerType(), PandasUDFType.SCALAR)


def _pv_expr(source_col: str, transform: str, source_type: str):
    """Spark Column computing an Iceberg partition transform, JVM-side for
    everything but bucket (which needs the spec's exact murmur3)."""
    import re as _re

    from pyspark.sql import functions as F

    c = F.col(source_col)
    t = transform.lower()
    if t == "identity":
        if source_type == "date":
            return F.datediff(c, F.lit("1970-01-01")).cast("int")
        if source_type.startswith("timestamp"):
            # spec stores timestamp partition values as epoch micros (long);
            # the raw timestamp would also crash json.dumps in the executor
            return F.unix_micros(c)
        return c
    if t == "void":
        return F.lit(None).cast("int")
    m = _re.fullmatch(r"bucket\[(\d+)\]", t)
    if m:
        return _bucket_pv(int(m.group(1)), source_type)(c)
    m = _re.fullmatch(r"truncate\[(\d+)\]", t)
    if m:
        w = int(m.group(1))
        if source_type == "string":
            return F.substring(c, 1, w)
        return (c - F.pmod(c, F.lit(w))).cast("long")
    if t in ("year", "years"):
        return (F.year(c) - 1970).cast("int")
    if t in ("month", "months"):
        return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("int")
    if t in ("day", "days"):
        return F.datediff(c.cast("date"), F.lit("1970-01-01")).cast("int")
    if t in ("hour", "hours"):
        return F.floor(F.unix_micros(c) / 3_600_000_000).cast("int")
    raise ValueError(f"unknown partition transform {transform!r}")


def _normalize_partition_by(
    partition_by, schema_fields: list[tuple[int, str, str]]
) -> list[dict]:
    """User spec (['col'] or [('col', 'bucket[16]')]) -> metadata.json
    partition-spec fields [{name, transform, source-id, field-id}]."""
    by_name = {n: (i, t) for i, n, t in schema_fields}
    out = []
    for k, item in enumerate(partition_by or []):
        col, transform = item if isinstance(item, tuple) else (item, "identity")
        if col not in by_name:
            raise ValueError(f"partition column {col!r} not in schema")
        suffix = {
            "identity": "", "void": "_null",
        }.get(transform, "_" + transform.split("[")[0])
        out.append(
            {
                "name": f"{col}{suffix}",
                "transform": transform,
                "source-id": by_name[col][0],
                "field-id": 1000 + k,
            }
        )
    return out


def _apply_spec(df: DataFrame, spec_fields: list[dict], schema) -> tuple:
    """Append __pv__ columns per spec field and repartition on them so
    same-partition rows co-locate (one file per partition tuple)."""
    from pyspark.sql import functions as F

    if not spec_fields:
        return df, []
    by_id = {f["id"]: (f["name"], f["type"]) for f in schema.get("fields", [])}
    pv_cols = []
    for f in spec_fields:
        src_name, src_type = by_id[f["source-id"]]
        pv = f"__pv__{f['name']}"
        df = df.withColumn(
            pv,
            _pv_expr(
                src_name,
                f.get("transform", "identity"),
                src_type if isinstance(src_type, str) else "string",
            ),
        )
        pv_cols.append(pv)
    return df.repartition(*[F.col(c) for c in pv_cols]), pv_cols


def _normalize_sorted_by(
    sorted_by, schema_fields: list[tuple[int, str, str]]
) -> list[dict]:
    """User spec (['col'] or [('col', 'desc')]) -> metadata.json
    sort-order fields [{transform, source-id, direction, null-order}]
    (spec §"Sort Orders"; the reference's sorted_by table property,
    plugin/trino-iceberg SortFieldUtils)."""
    by_name = {n: i for i, n, _ in schema_fields}
    out = []
    for item in sorted_by or []:
        col, direction = (
            item if isinstance(item, tuple) else (item, "asc")
        )
        if col not in by_name:
            raise ValueError(f"sort column {col!r} not in schema")
        d = direction.lower()
        if d not in ("asc", "desc"):
            raise ValueError(f"sort direction {direction!r}")
        out.append(
            {
                "transform": "identity",
                "source-id": by_name[col],
                "direction": d,
                "null-order": "nulls-first" if d == "asc" else "nulls-last",
            }
        )
    return out


def _apply_sort(df: DataFrame, metadata: dict, pv_cols: list[str]):
    """Apply the table's default sort order to a write: unpartitioned
    tables RANGE-partition on the sort key first (write.distribution-mode
    = range — what actually clusters values so per-file min/max bounds
    are tight and metrics pruning bites), partitioned tables sort WITHIN
    their partition-tuple tasks. No-op for order-id 0 / absent orders."""
    from pyspark.sql import functions as F

    oid = int(metadata.get("default-sort-order-id", 0))
    order = next(
        (
            o
            for o in metadata.get("sort-orders", [])
            if o.get("order-id") == oid
        ),
        None,
    )
    if not order or not order.get("fields"):
        return df
    cur = metadata.get("current-schema-id")
    schema = next(
        (s for s in metadata.get("schemas", []) if s.get("schema-id") == cur),
        {},
    )
    by_id = {f["id"]: f["name"] for f in schema.get("fields", [])}
    cols = []
    for f in order["fields"]:
        name = by_id.get(f.get("source-id"))
        if name is None:
            return df  # unknown source column -> skip sorting, never fail
        c = F.col(name)
        cols.append(c.desc() if f.get("direction") == "desc" else c.asc())
    if pv_cols:
        return df.sortWithinPartitions(*[F.col(c) for c in pv_cols], *cols)
    n = max(1, df.rdd.getNumPartitions())
    return df.repartitionByRange(n, *cols).sortWithinPartitions(*cols)


def iceberg_create(
    df: DataFrame,
    location: str,
    partition_by: list | None = None,
    file_format: str = "PARQUET",
    properties: dict[str, str] | None = None,
    sorted_by: list | None = None,
) -> None:
    """CTAS: materialize ``df`` as a brand-new Iceberg v2 table
    (IcebergMetadata.beginCreateTable + finishCreateTable analogue).

    ``partition_by``: columns / (column, transform) pairs — identity,
    bucket[N], truncate[W], year, month, day, hour — recorded as the
    table's partition spec; every data file then belongs to one partition
    tuple and manifest entries carry the tuple for scan pruning."""
    if _latest_version(location):
        raise ValueError(f"Iceberg table already exists at {location}")
    fields = [
        (i + 1, f.name, _iceberg_type(f.dataType.simpleString()))
        for i, f in enumerate(df.schema.fields)
    ]
    field_ids = {n: i for i, n, _ in fields}
    spec_fields = _normalize_partition_by(partition_by, fields)
    sort_fields = _normalize_sorted_by(sorted_by, fields)
    schema = {
        "fields": [
            {"id": i, "name": n, "type": t} for i, n, t in fields
        ]
    }
    df, pv_cols = _apply_spec(df, spec_fields, schema)
    if sort_fields:
        df = _apply_sort(
            df,
            {
                "default-sort-order-id": 1,
                "sort-orders": [{"order-id": 1, "fields": sort_fields}],
                "current-schema-id": 0,
                "schemas": [{"schema-id": 0, "fields": schema["fields"]}],
            },
            pv_cols,
        )
    files = _write_files_distributed(
        df,
        os.path.join(location, "data"),
        field_ids,
        part_cols=pv_cols,
        file_format=file_format,
    )
    _commit_snapshot(
        location,
        [(files, 0)],
        operation="append",
        schema_fields=fields,
        partition_spec=spec_fields,
        file_format=file_format,
        properties=properties,
        sort_order=sort_fields or None,
    )


def iceberg_append(
    df: DataFrame,
    location: str,
    file_format: str = "PARQUET",
    summary_extra: dict[str, str] | None = None,
    skip_if=None,
) -> int | None:
    """INSERT INTO (append snapshot; IcebergMetadata.beginInsert). A
    partitioned table's default spec is applied automatically — appended
    files stay one-partition-per-file and prunable. ``skip_if(metadata)``
    True at commit time makes the append a no-op returning None (the
    streaming sink's race-safe idempotence hook — re-evaluated inside
    the optimistic-commit retry); the already-written data files become
    orphans that remove_orphan_files reclaims. Returns the snapshot
    id."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import _spark_type

    table = IcebergTable(location)
    schema = table._current_schema()  # noqa: SLF001
    field_ids = {f["name"]: f["id"] for f in schema.get("fields", [])}
    missing = [c for c in df.columns if c not in field_ids]
    if missing:
        raise ValueError(f"columns not in table schema: {missing}")
    # schema columns absent from the input null-fill (INSERT INTO t(cols)
    # semantics — routine right after an ALTER ... ADD COLUMN); present
    # columns COERCE to the table's declared type (StatementAnalyzer's
    # insert coercion — an int32 source must not leak into a long
    # column's data files)
    df = df.select(
        *[
            F.col(f["name"])
            .cast(_spark_type(f.get("type")) or "string")
            .alias(f["name"])
            if f["name"] in df.columns
            else F.lit(None)
            .cast(_spark_type(f.get("type")) or "string")
            .alias(f["name"])
            for f in schema.get("fields", [])
        ]
    )
    spec_id = int(table.metadata.get("default-spec-id", 0))
    spec_fields = next(
        (
            s.get("fields", [])
            for s in table.metadata.get("partition-specs", [])
            if s.get("spec-id") == spec_id
        ),
        [],
    )
    df, pv_cols = _apply_spec(df, spec_fields, schema)
    df = _apply_sort(df, table.metadata, pv_cols)
    files = _write_files_distributed(
        df,
        os.path.join(location, "data"),
        field_ids,
        part_cols=pv_cols,
        file_format=file_format,
    )
    return _commit_snapshot(
        location,
        [(files, 0)],
        operation="append",
        file_format=file_format,
        summary_extra=summary_extra,
        skip_if=skip_if,
    )


_ALTERABLE_TYPES = frozenset(
    {"long", "int", "double", "float", "string", "boolean", "date", "binary"}
)


def iceberg_alter(
    location: str,
    *,
    add_columns: dict[str, str] | None = None,
    rename_columns: dict[str, str] | None = None,
    drop_columns: list[str] | None = None,
) -> int:
    """ALTER TABLE ADD / RENAME / DROP COLUMN: commit a NEW schema with a
    bumped schema-id and move ``current-schema-id`` — data files are never
    touched (the read path projects every file by field id against the
    query schema, so old files null-fill added columns and keep serving
    renamed ones). Applied in order rename -> drop -> add within one call.

    Reference: plugin/trino-iceberg IcebergMetadata.addColumn /
    renameColumn / dropColumn (each a metadata-only schema commit).
    ``add_columns`` maps name -> iceberg type ('long', 'string',
    'timestamp', 'decimal(p,s)', ...); new field ids come from
    ``last-column-id`` so a dropped id is NEVER reused (the spec's
    invariant — reusing one would resurrect old files' values under the
    new column). Returns the new schema id."""
    from trino_private_spark.sources.iceberg import IcebergTable

    table = IcebergTable(location)
    metadata = table.metadata
    cur = table._current_schema()  # noqa: SLF001
    fields = [dict(f) for f in cur.get("fields", [])]
    last_col = int(
        metadata.get(
            "last-column-id", max((f["id"] for f in fields), default=0)
        )
    )
    part_source_ids = {
        f.get("source-id")
        for s in metadata.get("partition-specs", [])
        for f in s.get("fields", [])
        if f.get("transform", "void") != "void"
    }

    for old, new in (rename_columns or {}).items():
        tgt = next((f for f in fields if f["name"] == old), None)
        if tgt is None:
            raise ValueError(f"rename: column {old!r} not in schema")
        if any(f["name"] == new for f in fields):
            raise ValueError(f"rename: column {new!r} already exists")
        tgt["name"] = new
    for col in drop_columns or []:
        tgt = next((f for f in fields if f["name"] == col), None)
        if tgt is None:
            raise ValueError(f"drop: column {col!r} not in schema")
        if tgt["id"] in part_source_ids:
            raise ValueError(
                f"drop: column {col!r} is a partition source "
                "(void the partition field first)"
            )
        fields.remove(tgt)
    for name, typ in (add_columns or {}).items():
        if any(f["name"] == name for f in fields):
            raise ValueError(f"add: column {name!r} already exists")
        t = typ.lower()
        if t not in _ALTERABLE_TYPES and not (
            t.startswith("decimal") or t.startswith("timestamp")
        ):
            raise ValueError(f"add: unsupported iceberg type {typ!r}")
        last_col += 1
        fields.append(
            {"id": last_col, "name": name, "required": False, "type": t}
        )

    new_sid = (
        max(
            (s.get("schema-id", 0) for s in metadata.get("schemas", [])),
            default=0,
        )
        + 1
    )
    metadata.setdefault("schemas", []).append(
        {"type": "struct", "schema-id": new_sid, "fields": fields}
    )
    metadata["current-schema-id"] = new_sid
    metadata["last-column-id"] = last_col
    metadata["last-updated-ms"] = int(time.time() * 1000)
    # CAS against the loaded version through the atomic link swap — the
    # plain open(...,'w') this used to do could clobber a concurrently
    # committed version outright (r9 hardening, same protocol as every
    # other metadata commit)
    atomic_write_metadata(location, metadata, table.loaded_version + 1)
    return new_sid


def iceberg_set_partitioning(location: str, partition_by: list) -> int:
    """Partition-spec EVOLUTION (Iceberg spec §"Partition Evolution";
    the reference's ``ALTER TABLE ... SET PROPERTIES partitioning =
    ARRAY[...]``, plugin/trino-iceberg IcebergMetadata.setTableProperties
    -> updateSpec): commit a NEW spec with a bumped spec-id and move
    ``default-spec-id`` — a metadata-only change. Existing data files
    keep their old spec-id and stay prunable under THEIR spec (each
    manifest records its partition_spec_id; the reader resolves
    per-manifest); only new writes lay out under the new spec.

    Field-id discipline per the spec: a (source column, transform) pair
    that appeared in ANY earlier spec reuses its field-id and name;
    genuinely new fields get fresh never-reused ids continuing from the
    table-wide maximum. Returns the new spec id."""
    table = IcebergTable(location)
    metadata = table.metadata
    schema = table._current_schema()  # noqa: SLF001
    fields = [
        (f["id"], f["name"], f["type"])
        for f in schema.get("fields", [])
        if isinstance(f.get("type"), str)
    ]
    wanted = _normalize_partition_by(partition_by, fields)
    prior: dict[tuple, dict] = {}
    last_pid = 999
    for s in metadata.get("partition-specs", []):
        for f in s.get("fields", []):
            prior[(f.get("source-id"), f.get("transform"))] = f
            last_pid = max(last_pid, int(f.get("field-id", 999)))
    out_fields = []
    for f in wanted:
        prev = prior.get((f["source-id"], f["transform"]))
        if prev is not None:
            out_fields.append(
                {**f, "field-id": prev["field-id"], "name": prev["name"]}
            )
        else:
            last_pid += 1
            out_fields.append({**f, "field-id": last_pid})
    new_sid = (
        max(
            (s.get("spec-id", 0) for s in metadata.get("partition-specs", [])),
            default=0,
        )
        + 1
    )
    metadata.setdefault("partition-specs", []).append(
        {"spec-id": new_sid, "fields": out_fields}
    )
    metadata["default-spec-id"] = new_sid
    metadata["last-updated-ms"] = int(time.time() * 1000)
    # CAS against the loaded version (see iceberg_alter)
    atomic_write_metadata(location, metadata, table.loaded_version + 1)
    return new_sid


def iceberg_delete(
    spark: SparkSession, location: str, condition: str
) -> int:
    """DELETE FROM ... WHERE: write position-delete files for the
    currently visible rows matching ``condition`` and commit them as a
    delete snapshot (IcebergMetadata.executeDelete analogue). Returns the
    number of rows deleted."""
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import parse_partition_predicate

    table = IcebergTable(location)
    # the DELETE predicate prunes its own scan: conjunctive prunable terms
    # skip non-matching partitions at the manifest level (conservative —
    # a pruned file provably holds no matching row), so a partition-
    # scoped DELETE on a 100 TB table reads only the matching partitions
    matches = (
        table.read(
            spark,
            with_lineage=True,
            # the condition is evaluated by .where(...) — Spark's parser,
            # which processes backslash escapes — so the prune-term lex
            # must match it (Engine.sql pre-translates trino text)
            partition_filter=parse_partition_predicate(
                condition, backslash_escapes=True
            ) or None,
        )
        .where(condition)
        .select(
            F.col("__file").alias("file_path"),
            F.col("__pos").cast("long").alias("pos"),
        )
    )
    files = _write_files_distributed(
        matches, os.path.join(location, "data"), POS_DELETE_IDS
    )
    deleted = sum(f["record_count"] for f in files)
    if files:
        _commit_snapshot(location, [(files, 1)], operation="delete")
    return deleted


def iceberg_update(
    spark: SparkSession,
    location: str,
    assignments: dict[str, str],
    condition: str,
) -> int:
    """UPDATE ... SET ... WHERE as merge-on-read: materialize the updated
    versions of the matching rows, then commit the position-delete files
    for the originals AND the appended new versions in ONE snapshot — two
    manifests (content=deletes, content=data) in one manifest list at the
    same sequence number, exactly the reference's atomic RowDelta
    (IcebergMetadata finishWrite). There is no intermediate visible state:
    readers and time travel see either the pre-update snapshot or the
    fully-updated one, and a crash mid-write leaves only unreferenced
    orphan files. The deletes cannot touch the new rows even though both
    carry the same sequence number: position deletes name (file, pos)
    pairs of the OLD files only. Returns the number of rows updated.

    The updated rows are localCheckpoint'ed BEFORE anything commits —
    they are defined against the pre-update table read, and a lazy
    re-evaluation after the commit would see them changed already.
    """
    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import parse_partition_predicate

    table = IcebergTable(location)
    # UPDATE's matching scan prunes from its own predicate, like DELETE
    cur = table.read(
        spark,
        with_lineage=True,
        # spark-lexed prune, matching the .where(condition) evaluator
        partition_filter=parse_partition_predicate(
            condition, backslash_escapes=True
        ) or None,
    )
    # checkpoint the MATCHED rows, not the whole pre-image read: both the
    # position-delete writer and the new-version writer derive from
    # `matched`, so this pins exactly the rows the update touches (at
    # scale: the filtered set, not the table). LAZY checkpoints + one
    # count fold the old three actions (pre-image checkpoint, updated-rows
    # checkpoint, count) into ONE job — the count computes every partition
    # of `upd`, which computes (and persists) every partition of
    # `matched`, and both lineages truncate at that job's end. Everything
    # is still materialized BEFORE anything commits.
    matched = cur.where(condition).localCheckpoint(eager=False)
    upd = matched
    for c, expr in assignments.items():
        upd = upd.withColumn(c, F.expr(expr))
    data_cols = [c for c in cur.columns if c not in ("__file", "__pos")]
    upd = upd.select(*data_cols).localCheckpoint(eager=False)
    n = upd.count()
    if n == 0:
        return 0
    positions = matched.select(
        F.col("__file").alias("file_path"),
        F.col("__pos").cast("long").alias("pos"),
    )
    # new data files follow the table's partition spec like any append
    schema = table._current_schema()  # noqa: SLF001
    field_ids = {f["name"]: f["id"] for f in schema.get("fields", [])}
    spec_id = int(table.metadata.get("default-spec-id", 0))
    spec_fields = next(
        (
            s.get("fields", [])
            for s in table.metadata.get("partition-specs", [])
            if s.get("spec-id") == spec_id
        ),
        [],
    )
    upd, pv_cols = _apply_spec(upd, spec_fields, schema)
    upd = _apply_sort(upd, table.metadata, pv_cols)
    # the two file writes are independent (both read the pinned blocks,
    # neither is the commit) — overlap them so the second write's tasks
    # back-fill the first's tail (guide §2.6); the snapshot commit below
    # remains the single atomicity point.
    from concurrent.futures import ThreadPoolExecutor  # noqa: PLC0415

    with ThreadPoolExecutor(max_workers=2) as pool:
        del_fut = pool.submit(
            _write_files_distributed,
            positions,
            os.path.join(location, "data"),
            POS_DELETE_IDS,
        )
        data_fut = pool.submit(
            _write_files_distributed,
            upd,
            os.path.join(location, "data"),
            field_ids,
            part_cols=pv_cols,
        )
        del_files = del_fut.result()
        data_files = data_fut.result()
    _commit_snapshot(
        location,
        [(del_files, 1), (data_files, 0)],
        operation="overwrite",
    )
    return n
