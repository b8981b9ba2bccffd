"""Iceberg table maintenance: expire_snapshots, remove_orphan_files,
OPTIMIZE (small-file compaction).

Reference parity: plugin/trino-iceberg registers these as procedures /
ALTER TABLE EXECUTE verbs — ExpireSnapshotsProcedure ("expire_snapshots"),
RemoveOrphanFilesProcedure ("remove_orphan_files"), and the OPTIMIZE
table procedure (IcebergMetadata.getTableHandleForExecute -> OptimizeTableProcedure)
that rewrites small files into target-sized ones as a new snapshot.

All three are METADATA-FIRST operations — at 100 TB the snapshot log and
manifest graph are what grow without bound, and compaction is the lever
that keeps scan-planning (and the merge-on-read delete overhead) flat:

- expire_snapshots drops old snapshot entries and deletes every file
  reachable ONLY from them (manifest lists, manifests, data and delete
  files) — file reachability is computed from the manifest graph alone;
- remove_orphan_files deletes files under the table location referenced
  by NO snapshot (crash leftovers — exactly the orphans a failed commit
  of this writer can leave behind, see iceberg_write._commit_snapshot);
- optimize reads the CURRENT rows (merge-on-read deletes applied),
  rewrites them into one file per partition tuple (or size-targeted
  files when unpartitioned), and commits a replace snapshot whose
  manifest list references ONLY the new files: position/equality deletes
  are absorbed, manifest count drops to one, and time travel to
  pre-optimize snapshots still works because their manifest lists are
  untouched.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import SparkSession

from trino_private_spark.sources.iceberg import (
    IcebergTable,
    _local,
    read_avro_container_cached,
)

__all__ = [
    "iceberg_expire_snapshots",
    "iceberg_remove_orphan_files",
    "iceberg_optimize",
    "iceberg_rewrite_manifests",
    "iceberg_create_ref",
    "iceberg_drop_ref",
]


def _write_metadata(
    location: str, metadata: dict, base_version: int
) -> None:
    """Commit a metadata-only change CASed against ``base_version`` —
    the version the caller's IcebergTable LOADED (``loaded_version``),
    never a re-read of the latest: a concurrent commit between the read
    and this write must surface CommitFailedException instead of a
    silent lost update (r8 ADVICE; the reference's TableOperations
    commits base metadata and version as one unit)."""
    import time

    from trino_private_spark.sources.iceberg_write import (
        atomic_write_metadata,
    )

    metadata["last-updated-ms"] = int(time.time() * 1000)
    atomic_write_metadata(location, metadata, base_version + 1)


def iceberg_create_ref(
    location: str,
    name: str,
    ref_type: str = "branch",
    snapshot_id: int | None = None,
) -> None:
    """Create (or move) a named ref — BRANCH or TAG — pointing at
    ``snapshot_id`` (default: the current snapshot). Refs live in the
    metadata ``refs`` map (spec §"Snapshot References"); the reference
    reads them for ``FOR VERSION AS OF 'name'`` resolution and its
    RefsTable. Tags and branches both pin their snapshot against
    expire_snapshots here (retention policies are not modeled)."""
    if ref_type.lower() not in ("branch", "tag"):
        raise ValueError(f"ref type must be branch or tag, got {ref_type!r}")
    table = IcebergTable(location)
    metadata = table.metadata
    if snapshot_id is None:
        cur = table.current_snapshot()
        if cur is None:
            raise ValueError("table has no snapshots to reference")
        snapshot_id = cur["snapshot-id"]
    elif all(
        s["snapshot-id"] != snapshot_id for s in metadata.get("snapshots", [])
    ):
        raise KeyError(f"snapshot {snapshot_id} not found")
    refs = dict(metadata.get("refs") or {})
    refs[name] = {"snapshot-id": snapshot_id, "type": ref_type.lower()}
    metadata["refs"] = refs
    _write_metadata(location, metadata, table.loaded_version)


def iceberg_rollback_to_snapshot(location: str, snapshot_id: int) -> None:
    """rollback_to_snapshot (the reference's RollbackToSnapshotProcedure,
    plugin/trino-iceberg): point current-snapshot-id back at an existing
    snapshot as a METADATA-ONLY commit — no snapshot is added or removed,
    so rolling forward again is just another rollback. Appends after a
    rollback branch off the rolled-back state (their parent is the
    restored snapshot)."""
    table = IcebergTable(location)
    metadata = table.metadata
    if all(
        s["snapshot-id"] != snapshot_id
        for s in metadata.get("snapshots", [])
    ):
        raise KeyError(f"snapshot {snapshot_id} not found")
    metadata["current-snapshot-id"] = int(snapshot_id)
    _write_metadata(location, metadata, table.loaded_version)


def iceberg_drop_ref(location: str, name: str) -> None:
    """Remove a named branch/tag from the metadata refs map."""
    table = IcebergTable(location)
    metadata = table.metadata
    refs = dict(metadata.get("refs") or {})
    if name not in refs:
        raise KeyError(f"ref {name!r} not found")
    del refs[name]
    metadata["refs"] = refs
    _write_metadata(location, metadata, table.loaded_version)


def _snapshot_closure(
    table: IcebergTable, snapshots: list[dict], spark=None
) -> set[str]:
    """Every file path reachable from ``snapshots``: manifest lists,
    manifests, and the data/delete files their entries name. With
    ``spark``, the manifests of ALL snapshots prefetch in one
    distributed job when they clear the byte gate (an expire over a
    long history walks every manifest ever written — the same
    driver-serialization hazard data_files() guards against)."""
    if spark is not None:
        from trino_private_spark.sources.iceberg import prefetch_manifests

        mpaths: list[str] = []
        for s in snapshots:
            ml = _local(s["manifest-list"])
            if os.path.exists(ml):
                mpaths.extend(
                    _local(m["manifest_path"])
                    for m in read_avro_container_cached(ml)
                )
        prefetch_manifests(spark, mpaths)
    out: set[str] = set()
    for s in snapshots:
        ml = _local(s["manifest-list"])
        out.add(ml)
        if not os.path.exists(ml):
            continue
        for m in read_avro_container_cached(ml):
            mp = _local(m["manifest_path"])
            out.add(mp)
            if not os.path.exists(mp):
                continue
            for entry in read_avro_container_cached(mp):
                df = entry.get("data_file") or {}
                if df.get("file_path"):
                    out.add(_local(df["file_path"]))
    return out


def iceberg_expire_snapshots(
    location: str,
    *,
    keep_last: int = 1,
    older_than_ms: int | None = None,
    delete_files: bool = True,
    spark=None,
) -> dict:
    """Expire old snapshots (ExpireSnapshotsProcedure analogue): keep the
    current snapshot, the ``keep_last`` most recent, and — when
    ``older_than_ms`` is given — everything at or after that timestamp;
    drop the rest from the snapshot log and delete every file reachable
    ONLY from dropped snapshots. Commits a new metadata.json version (the
    old one stays on disk, but its snapshots are gone from the log —
    time travel to an expired snapshot now fails, per the reference).
    Returns {'expired_snapshots', 'deleted_files'}."""
    table = IcebergTable(location)
    metadata = table.metadata
    snaps = list(metadata.get("snapshots", []))
    if not snaps:
        return {"expired_snapshots": 0, "deleted_files": 0}
    cur_id = metadata.get("current-snapshot-id", -1)
    by_ts = sorted(snaps, key=lambda s: s["timestamp-ms"], reverse=True)
    keep_ids = {s["snapshot-id"] for s in by_ts[: max(1, keep_last)]}
    keep_ids.add(cur_id)
    if older_than_ms is not None:
        keep_ids |= {
            s["snapshot-id"]
            for s in snaps
            if s["timestamp-ms"] >= older_than_ms
        }
    # snapshots pinned by a named branch/tag never expire (spec:
    # reference retention; the reference's ExpireSnapshots honors refs)
    keep_ids |= {
        int(r["snapshot-id"])
        for r in (metadata.get("refs") or {}).values()
        if r.get("snapshot-id") is not None
    }
    kept = [s for s in snaps if s["snapshot-id"] in keep_ids]
    dropped = [s for s in snaps if s["snapshot-id"] not in keep_ids]
    if not dropped:
        return {"expired_snapshots": 0, "deleted_files": 0}

    # plan the deletions BEFORE the commit, but execute them only AFTER
    # the metadata swap succeeds — iceberg-core's ExpireSnapshots order
    # (commit, then clean). The reverse order would, on a CAS conflict
    # (a concurrent commit landing between the planning read and the
    # swap), leave the SURVIVING metadata referencing already-deleted
    # snapshots/files: time travel and $snapshots reads against them
    # would fail on a table whose log says they exist.
    dropped_only: set[str] = set()
    if delete_files:
        reachable = _snapshot_closure(table, kept, spark=spark)
        dropped_only = _snapshot_closure(table, dropped, spark=spark) - reachable

    metadata["snapshots"] = kept
    _write_metadata(location, metadata, table.loaded_version)

    deleted = 0
    for p in sorted(dropped_only):
        # only ever delete files under this table's own location
        if os.path.commonpath(
            [os.path.abspath(p), os.path.abspath(location)]
        ) != os.path.abspath(location):
            continue
        try:
            os.remove(p)
            deleted += 1
        except OSError:
            pass
    return {"expired_snapshots": len(dropped), "deleted_files": deleted}


def iceberg_remove_orphan_files(location: str) -> list[str]:
    """Delete files under ``<location>/data`` that NO snapshot references
    (RemoveOrphanFilesProcedure analogue) — the leftovers of a writer that
    crashed between writing data files and committing metadata. Metadata
    files (manifests, manifest lists, metadata.json versions) are never
    touched here — expire_snapshots owns those. Returns deleted paths."""
    table = IcebergTable(location)
    referenced = {
        os.path.abspath(p)
        for p in _snapshot_closure(table, table.snapshots())
    }
    deleted: list[str] = []
    for p in sorted(glob.glob(os.path.join(location, "data", "*"))):
        if os.path.isfile(p) and os.path.abspath(p) not in referenced:
            try:
                os.remove(p)
                deleted.append(p)
            except OSError:
                pass
    return deleted


def iceberg_rewrite_manifests(location: str, spark=None) -> dict:
    """rewrite_manifests (the reference registers iceberg-core's
    RewriteManifests as a table procedure): merge the CURRENT snapshot's
    manifests into ONE manifest per (content, partition-spec) group and
    commit the result as a new `replace` snapshot. Data and delete files
    are untouched — this is a METADATA-ONLY commit; after heavy DML it is
    the lever that returns scan planning from O(thousands of accreted
    manifests) to O(groups). Entries are rewritten as EXISTING (status 0)
    with their RESOLVED data sequence numbers materialized (spec
    "Sequence Number Inheritance" — an EXISTING entry must carry its own
    seq), so position/equality-delete applicability is byte-identical
    before and after. Manifest-list field_summaries for each merged
    manifest are folded from the source manifests' summaries
    (deserialize -> min/max -> reserialize); a source manifest without
    summaries makes the merged group's summaries absent, which never
    wrong-prunes. Pre-rewrite snapshots keep their own manifest lists, so
    time travel still sees the old layout. Returns {'rewritten_manifests',
    'new_manifests'}."""
    import time

    from trino_private_spark.sources.iceberg import write_avro_container
    from trino_private_spark.sources.iceberg_partition import (
        deserialize_single_value,
        partition_value_type,
        serialize_single_value,
    )
    from trino_private_spark.sources.iceberg_testing import (
        MANIFEST_LIST_SCHEMA,
    )
    from trino_private_spark.sources.iceberg_write import (
        _entry_schema,
        _partition_avro_fields,
    )

    table = IcebergTable(location)
    metadata = table.metadata
    snap = table.current_snapshot()
    if snap is None:
        return {"rewritten_manifests": 0, "new_manifests": 0}
    manifests = list(read_avro_container_cached(_local(snap["manifest-list"])))
    if len(manifests) <= 1:
        return {"rewritten_manifests": 0, "new_manifests": len(manifests)}
    if spark is not None:
        from trino_private_spark.sources.iceberg import prefetch_manifests

        prefetch_manifests(
            spark, [_local(m["manifest_path"]) for m in manifests]
        )

    specs_fields = {
        s.get("spec-id", 0): s.get("fields", [])
        for s in metadata.get("partition-specs", [])
    }
    cur_schema = next(
        (
            s
            for s in metadata.get("schemas", [])
            if s.get("schema-id") == metadata.get("current-schema-id")
        ),
        metadata.get("schema") or {},
    )
    src_type_by_id = {
        f["id"]: f["type"]
        for f in cur_schema.get("fields", [])
        if isinstance(f.get("type"), str)
    }

    # (list_content, spec_id) -> [resolved entries], [source summaries]
    groups: dict[tuple[int, int], list[dict]] = {}
    summaries: dict[tuple[int, int], list] = {}
    for m in manifests:
        m_seq = int(m.get("sequence_number") or 0)
        m_spec = int(m.get("partition_spec_id") or 0)
        m_content = int(m.get("content") or 0)
        key = (m_content, m_spec)
        summaries.setdefault(key, []).append(m.get("partitions"))
        for entry in read_avro_container_cached(_local(m["manifest_path"])):
            status = entry.get("status")
            if status == 2:  # DELETED entries drop out of the rewrite
                continue
            seq = entry.get("sequence_number")
            if seq is None:
                seq = m_seq if status == 1 else 0
            groups.setdefault(key, []).append(
                {
                    "status": 0,  # EXISTING: file predates this snapshot
                    "snapshot_id": entry.get("snapshot_id"),
                    "sequence_number": int(seq),
                    "data_file": entry["data_file"],
                }
            )

    def _merge_summaries(key: tuple[int, int]) -> list | None:
        """Fold per-manifest field_summaries; ANY absent source summary
        makes the merged one absent (absent never prunes)."""
        srcs = summaries.get(key, [])
        if not srcs or any(s is None for s in srcs):
            return None
        sf = specs_fields.get(key[1], [])
        if not sf or any(len(s) != len(sf) for s in srcs):
            return None
        out = []
        for i, fld in enumerate(sf):
            vt = partition_value_type(
                fld.get("transform", "identity"),
                src_type_by_id.get(fld.get("source-id"), ""),
            )
            contains_null = any(s[i].get("contains_null") for s in srcs)
            vals = []
            for s in srcs:
                lo, hi = s[i].get("lower_bound"), s[i].get("upper_bound")
                if lo is None or hi is None:
                    # a boundless source -> no merged bounds for the field
                    vals = None
                    break
                try:
                    vals.append(deserialize_single_value(vt, lo))
                    vals.append(deserialize_single_value(vt, hi))
                except (TypeError, ValueError):
                    vals = None
                    break
            e = {
                "contains_null": contains_null,
                "lower_bound": None,
                "upper_bound": None,
            }
            if vals:
                try:
                    e["lower_bound"] = serialize_single_value(vt, min(vals))
                    e["upper_bound"] = serialize_single_value(vt, max(vals))
                except (TypeError, ValueError, OverflowError):
                    pass
            out.append(e)
        return out

    md_dir = os.path.join(location, "metadata")
    seq = int(metadata.get("last-sequence-number", 0)) + 1
    snap_id = (
        max(
            (s["snapshot-id"] for s in metadata.get("snapshots", [])),
            default=0,
        )
        + 1
    )
    import uuid as _uuid

    attempt = _uuid.uuid4().hex[:8]  # attempt-unique names (see
    # iceberg_write._commit_snapshot_once: a lost optimistic race must
    # never share file paths with the winner)
    new_manifests: list[dict] = []
    for gi, (key, entries) in enumerate(sorted(groups.items())):
        m_content, m_spec = key
        part_avro = _partition_avro_fields(
            metadata, specs_fields.get(m_spec, [])
        )
        manifest_path = os.path.join(
            md_dir, f"manifest-{snap_id}-rw{gi}-{attempt}.avro"
        )
        write_avro_container(
            manifest_path, _entry_schema(part_avro), entries
        )
        new_manifests.append(
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": m_spec,
                "content": m_content,
                "sequence_number": seq,
                "min_sequence_number": min(
                    e["sequence_number"] for e in entries
                ),
                "added_snapshot_id": snap_id,
                "partitions": _merge_summaries(key),
            }
        )
    manifest_list_path = os.path.join(
        md_dir, f"snap-{snap_id}-{attempt}.avro"
    )
    write_avro_container(
        manifest_list_path, MANIFEST_LIST_SCHEMA, new_manifests
    )
    now_ms = int(time.time() * 1000)
    parent = metadata.get("current-snapshot-id", -1)
    # spec snapshot-summary totals — exact, from the rewritten entries
    # themselves (a metadata-only fold carries every live entry here)
    tot_rec = tot_df = tot_del = 0
    for (m_content, _sid), entries in groups.items():
        for e in entries:
            dfile = e.get("data_file") or {}
            if int(dfile.get("content") or 0) == 0:
                tot_df += 1
                tot_rec += int(dfile.get("record_count") or 0)
            else:
                tot_del += 1
    metadata["snapshots"] = list(metadata.get("snapshots", [])) + [
        {
            "snapshot-id": snap_id,
            "timestamp-ms": now_ms,
            "sequence-number": seq,
            "manifest-list": manifest_list_path,
            "summary": {
                "operation": "replace",
                "added-data-files": "0",
                "added-records": "0",
                "added-files-size": "0",
                "added-delete-files": "0",
                "total-records": str(tot_rec),
                "total-data-files": str(tot_df),
                "total-delete-files": str(tot_del),
            },
            "parent-snapshot-id": parent if parent != -1 else None,
            "schema-id": int(metadata.get("current-schema-id", 0)),
        }
    ]
    metadata["current-snapshot-id"] = snap_id
    metadata["last-sequence-number"] = seq
    metadata["last-updated-ms"] = now_ms
    # CAS against the version this rewrite PLANNED from — a commit
    # landing since the planning read must fail the swap, not lose its
    # snapshots to a stale base (r8 ADVICE)
    version = table.loaded_version
    metadata["metadata-log"] = list(metadata.get("metadata-log") or []) + [
        {
            "timestamp-ms": now_ms,
            "metadata-file": os.path.join(
                md_dir, f"v{version}.metadata.json"
            ),
        }
    ]
    from trino_private_spark.sources.iceberg_write import (
        atomic_write_metadata,
    )

    atomic_write_metadata(location, metadata, version + 1)
    return {
        "rewritten_manifests": len(manifests),
        "new_manifests": len(new_manifests),
    }


def _datafile_entry(f) -> dict:
    """A _DataFile back to its raw manifest-entry dict, rewritten as
    EXISTING (status 0) with its resolved sequence number — the
    carry-over shape partial OPTIMIZE commits for untouched files."""
    return {
        "status": 0,
        "snapshot_id": None,
        "sequence_number": int(f.sequence_number),
        "data_file": {
            "content": f.content,
            "file_path": f.path,
            "file_format": f.file_format,
            "record_count": f.record_count,
            "file_size_in_bytes": f.file_size_in_bytes,
            "equality_ids": list(f.equality_ids) or None,
            "value_counts": {str(i): v for i, v in f.value_counts} or None,
            "null_value_counts": (
                {str(i): v for i, v in f.null_value_counts} or None
            ),
            "lower_bounds": {str(i): b for i, b in f.lower_bounds} or None,
            "upper_bounds": {str(i): b for i, b in f.upper_bounds} or None,
            **(
                {"partition": dict(f.partition)}
                if f.partition is not None
                else {}
            ),
        },
    }


def iceberg_optimize(
    spark: SparkSession,
    location: str,
    target_file_size_bytes: int = 128 * 1024 * 1024,
    where: str | None = None,
    file_size_threshold_bytes: int | None = None,
) -> dict:
    """OPTIMIZE (small-file compaction; the reference's ALTER TABLE ...
    EXECUTE optimize): materialize the CURRENT rows — merge-on-read
    position/equality deletes applied — rewrite them as one file per
    partition tuple (partitioned tables) or ``ceil(bytes/target)``
    size-targeted files (unpartitioned), and commit a REPLACE snapshot.
    Deletes are absorbed, pre-optimize snapshots remain time-travelable.

    PARTIAL optimize — the reference's actual surface (`ALTER TABLE t
    EXECUTE optimize(file_size_threshold => '10MB') WHERE <partition
    predicate>`): with ``where`` and/or ``file_size_threshold_bytes``,
    only data files matching the partition predicate (conservatively —
    a file the pruner cannot exclude is included, like the reference's
    enforced-constraint split) AND below the size threshold are
    rewritten; every other data file carries over as an EXISTING entry
    with its resolved sequence number, and ALL delete files carry over
    too (they cannot affect the rewritten files' new sequence number;
    dangling targets are ignored at read). Returns {'rewritten_files',
    'compacted_files', 'rows'}."""
    import math

    from pyspark.sql import functions as F

    from trino_private_spark.sources.iceberg import (
        parse_partition_predicate,
    )
    from trino_private_spark.sources.iceberg_partition import file_matches
    from trino_private_spark.sources.iceberg_write import (
        _apply_sort,
        _apply_spec,
        _commit_snapshot,
        _write_files_distributed,
    )

    table = IcebergTable(location)
    schema = table._current_schema()  # noqa: SLF001
    field_ids = {f["name"]: f["id"] for f in schema.get("fields", [])}
    all_files = table.data_files()
    data_files = [f for f in all_files if f.content == 0]
    del_files = [f for f in all_files if f.content != 0]

    partial = where is not None or file_size_threshold_bytes is not None
    pf = parse_partition_predicate(where) if where else []
    specs = table.partition_specs() if pf else {}

    def _matched(f) -> bool:
        if pf and not file_matches(
            specs.get(f.spec_id),
            dict(f.partition) if f.partition is not None else None,
            pf,
        ):
            return False
        if (
            file_size_threshold_bytes is not None
            and f.file_size_in_bytes >= file_size_threshold_bytes
        ):
            return False
        return True

    compact = [f for f in data_files if _matched(f)] if partial else data_files
    keep = (
        [f for f in data_files if not _matched(f)] if partial else []
    )
    if partial and len(compact) <= 1:
        # nothing worth rewriting: no commit at all (the reference's
        # optimize is a no-op when no file group qualifies)
        return {"rewritten_files": 0, "compacted_files": 0, "rows": 0}

    old_bytes = sum(f.file_size_in_bytes for f in compact)
    df = table.read(spark, with_lineage=partial)
    if partial:
        paths = spark.createDataFrame(
            [(f.path,) for f in compact], "__file string"
        )
        df = (
            df.join(F.broadcast(paths), "__file", "semi")
            .drop("__file", "__pos")
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
    if not pv_cols:
        # size-targeted file count from the CURRENT footprint — parquet
        # re-encodes, so this is an upper bound, never a driver collect
        n = max(1, math.ceil(old_bytes / max(1, target_file_size_bytes)))
        df = df.coalesce(n) if n < df.rdd.getNumPartitions() else df
    files = _write_files_distributed(
        df, os.path.join(location, "data"), field_ids, part_cols=pv_cols
    )
    extra: list[tuple[list[dict], int, int]] = []
    if partial:
        by_group: dict[tuple[int, int], list] = {}
        for f in keep + del_files:
            lc = 0 if f.content == 0 else 1
            by_group.setdefault((f.spec_id, lc), []).append(
                _datafile_entry(f)
            )
        extra = [
            (entries, sid, lc)
            for (sid, lc), entries in sorted(by_group.items())
        ]
    # CAS the replace against the snapshot OPTIMIZE planned from: a
    # commit interleaving between the planning read and this commit
    # raises CommitConflictException (never a blind retry — the stale
    # plan would drop the interleaved files; r8 ADVICE / the
    # reference's RewriteFiles conflict validation)
    planned = table.current_snapshot()
    _commit_snapshot(
        location,
        [(files, 0)],
        operation="replace",
        replace=True,
        extra_manifest_entries=extra or None,
        expected_current_snapshot_id=(
            planned["snapshot-id"] if planned else None
        ),
    )
    return {
        "rewritten_files": len(files),
        "compacted_files": len(compact),
        "rows": sum(f["record_count"] for f in files),
    }
