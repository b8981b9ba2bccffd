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
    "iceberg_create_ref",
    "iceberg_drop_ref",
]


def _write_metadata(location: str, metadata: dict) -> None:
    import json
    import time

    from trino_private_spark.sources.iceberg_write import _latest_version

    metadata["last-updated-ms"] = int(time.time() * 1000)
    version = _latest_version(location)
    with open(
        os.path.join(location, "metadata", f"v{version + 1}.metadata.json"),
        "w",
    ) as fh:
        json.dump(metadata, fh)


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
    _write_metadata(location, metadata)


def iceberg_drop_ref(location: str, name: str) -> None:
    """Remove a named branch/tag from the metadata refs map."""
    table = IcebergTable(location)
    metadata = table.metadata
    refs = dict(metadata.get("refs") or {})
    if name not in refs:
        raise KeyError(f"ref {name!r} not found")
    del refs[name]
    metadata["refs"] = refs
    _write_metadata(location, metadata)


def _snapshot_closure(table: IcebergTable, snapshots: list[dict]) -> set[str]:
    """Every file path reachable from ``snapshots``: manifest lists,
    manifests, and the data/delete files their entries name."""
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

    deleted = 0
    if delete_files:
        reachable = _snapshot_closure(table, kept)
        dropped_only = _snapshot_closure(table, dropped) - reachable
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

    metadata["snapshots"] = kept
    import json
    import time

    metadata["last-updated-ms"] = int(time.time() * 1000)
    from trino_private_spark.sources.iceberg_write import _latest_version

    version = _latest_version(location)
    with open(
        os.path.join(location, "metadata", f"v{version + 1}.metadata.json"),
        "w",
    ) as fh:
        json.dump(metadata, fh)
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


def iceberg_optimize(
    spark: SparkSession,
    location: str,
    target_file_size_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """OPTIMIZE (small-file compaction; the reference's ALTER TABLE ...
    EXECUTE optimize): materialize the CURRENT rows — merge-on-read
    position/equality deletes applied — rewrite them as one file per
    partition tuple (partitioned tables) or ``ceil(bytes/target)``
    size-targeted files (unpartitioned), and commit a REPLACE snapshot
    whose manifest list holds ONLY the new manifest. Deletes are absorbed,
    the manifest graph collapses to one manifest, pre-optimize snapshots
    remain time-travelable. Returns {'rewritten_files', 'compacted_files',
    'rows'}."""
    import math

    from trino_private_spark.sources.iceberg_write import (
        _apply_sort,
        _apply_spec,
        _commit_snapshot,
        _write_files_distributed,
    )

    table = IcebergTable(location)
    schema = table._current_schema()  # noqa: SLF001
    field_ids = {f["name"]: f["id"] for f in schema.get("fields", [])}
    old_files = [f for f in table.data_files() if f.content == 0]
    old_bytes = sum(f.file_size_in_bytes for f in old_files)
    df = table.read(spark)
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
    _commit_snapshot(
        location, [(files, 0)], operation="replace", replace=True
    )
    return {
        "rewritten_files": len(files),
        "compacted_files": len(old_files),
        "rows": sum(f["record_count"] for f in files),
    }
