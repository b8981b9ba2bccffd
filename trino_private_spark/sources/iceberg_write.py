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
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.sources.iceberg import (
    IcebergTable,
    read_avro_container,
    write_avro_container,
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
    df: DataFrame, out_dir: str, field_ids: dict[str, int]
) -> list[dict]:
    """Write one field-id-annotated parquet file per non-empty partition
    of ``df`` under ``out_dir`` (executor-side pyarrow writers, Arrow
    batches — nothing is collected to the driver) and return per-file
    stats rows {path, record_count, file_size_in_bytes}."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    ids = dict(field_ids)

    def write_partition(batches):
        import pyarrow as pa  # noqa: PLC0415 (executor-side import)
        import pyarrow.parquet as pq

        collected = [b for b in batches if b.num_rows]
        if not collected:
            return
        table = pa.Table.from_batches(collected)
        fields = []
        for name in table.schema.names:
            f = table.schema.field(name)
            meta = {b"PARQUET:field_id": str(ids[name]).encode()}
            fields.append(pa.field(name, f.type, metadata=meta))
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.parquet")
        pq.write_table(table.cast(pa.schema(fields)), path)
        yield pa.RecordBatch.from_pydict(
            {
                "path": [path],
                "record_count": [table.num_rows],
                "file_size_in_bytes": [os.path.getsize(path)],
            }
        )

    stats = df.mapInArrow(
        write_partition,
        "path string, record_count long, file_size_in_bytes long",
    ).collect()
    return [
        {
            "path": r["path"],
            "record_count": r["record_count"],
            "file_size_in_bytes": r["file_size_in_bytes"],
        }
        for r in stats
    ]


def _latest_version(location: str) -> int:
    import glob
    import re

    best = 0
    for p in glob.glob(os.path.join(location, "metadata", "*.metadata.json")):
        m = re.match(r"v?(\d+)", os.path.basename(p))
        if m:
            best = max(best, int(m.group(1)))
    return best


def _commit_snapshot(
    location: str,
    new_files: list[dict],
    *,
    content: int,
    operation: str,
    schema_fields: list[tuple[int, str, str]] | None = None,
) -> None:
    """Append one snapshot referencing ``new_files`` (all of the given
    ``content`` kind) to the table at ``location``; creates the table
    metadata if this is the first commit (``schema_fields`` required)."""
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
            "current-snapshot-id": -1,
            "snapshots": [],
        }
        prior_manifests: list[dict] = []
    else:
        metadata = IcebergTable(location).metadata
        cur = None
        cur_id = metadata.get("current-snapshot-id", -1)
        for s in metadata.get("snapshots", []):
            if s["snapshot-id"] == cur_id:
                cur = s
        prior_manifests = (
            read_avro_container(cur["manifest-list"]) if cur else []
        )

    seq = int(metadata.get("last-sequence-number", 0)) + 1
    snap_id = (
        max(
            (s["snapshot-id"] for s in metadata.get("snapshots", [])),
            default=0,
        )
        + 1
    )
    now_ms = int(time.time() * 1000)

    manifest_path = os.path.join(md_dir, f"manifest-{snap_id}.avro")
    write_avro_container(
        manifest_path,
        MANIFEST_ENTRY_SCHEMA,
        [
            {
                "status": 1,
                "snapshot_id": snap_id,
                "sequence_number": None,  # inherited from the manifest list
                "data_file": {
                    "content": content,
                    "file_path": f["path"],
                    "file_format": "PARQUET",
                    "record_count": f["record_count"],
                    "file_size_in_bytes": f["file_size_in_bytes"],
                    "equality_ids": None,
                },
            }
            for f in new_files
        ],
    )
    manifest_list_path = os.path.join(md_dir, f"snap-{snap_id}.avro")
    write_avro_container(
        manifest_list_path,
        MANIFEST_LIST_SCHEMA,
        list(prior_manifests)
        + [
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": 0,
                "content": 0 if content == 0 else 1,
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snap_id,
            }
        ],
    )
    metadata["snapshots"] = list(metadata.get("snapshots", [])) + [
        {
            "snapshot-id": snap_id,
            "timestamp-ms": now_ms,
            "sequence-number": seq,
            "manifest-list": manifest_list_path,
            "summary": {"operation": operation},
        }
    ]
    metadata["current-snapshot-id"] = snap_id
    metadata["last-sequence-number"] = seq
    metadata["last-updated-ms"] = now_ms
    with open(os.path.join(md_dir, f"v{version + 1}.metadata.json"), "w") as fh:
        json.dump(metadata, fh)


def iceberg_create(df: DataFrame, location: str) -> None:
    """CTAS: materialize ``df`` as a brand-new Iceberg v2 table
    (IcebergMetadata.beginCreateTable + finishCreateTable analogue)."""
    if _latest_version(location):
        raise ValueError(f"Iceberg table already exists at {location}")
    fields = [
        (i + 1, f.name, _iceberg_type(f.dataType.simpleString()))
        for i, f in enumerate(df.schema.fields)
    ]
    field_ids = {n: i for i, n, _ in fields}
    files = _write_files_distributed(
        df, os.path.join(location, "data"), field_ids
    )
    _commit_snapshot(
        location, files, content=0, operation="append",
        schema_fields=fields,
    )


def iceberg_append(df: DataFrame, location: str) -> None:
    """INSERT INTO (append snapshot; IcebergMetadata.beginInsert)."""
    table = IcebergTable(location)
    schema = table._current_schema()  # noqa: SLF001
    field_ids = {f["name"]: f["id"] for f in schema.get("fields", [])}
    missing = [c for c in df.columns if c not in field_ids]
    if missing:
        raise ValueError(f"columns not in table schema: {missing}")
    df = df.select(*[f["name"] for f in schema.get("fields", [])])
    files = _write_files_distributed(
        df, os.path.join(location, "data"), field_ids
    )
    _commit_snapshot(location, files, content=0, operation="append")


def iceberg_delete(
    spark: SparkSession, location: str, condition: str
) -> int:
    """DELETE FROM ... WHERE: write position-delete files for the
    currently visible rows matching ``condition`` and commit them as a
    delete snapshot (IcebergMetadata.executeDelete analogue). Returns the
    number of rows deleted."""
    from pyspark.sql import functions as F

    table = IcebergTable(location)
    matches = (
        table.read(spark, with_lineage=True)
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
        _commit_snapshot(location, files, content=1, operation="delete")
    return deleted


def iceberg_update(
    spark: SparkSession,
    location: str,
    assignments: dict[str, str],
    condition: str,
) -> int:
    """UPDATE ... SET ... WHERE as merge-on-read: materialize the updated
    versions of the matching rows, position-delete the originals, append
    the new versions (the RowDelta shape of IcebergMetadata's
    beginUpdate/finishWrite path, expressed as two snapshots). Ordering is
    safe because position deletes only apply to data files at sequence
    numbers <= their own: the appended rows commit AFTER the delete and
    are untouched even if they still satisfy ``condition``. Returns the
    number of rows updated.

    The updated rows are localCheckpoint'ed BEFORE the delete commits —
    they are defined against the pre-delete table read, and a lazy
    re-evaluation after the delete snapshot would see them already gone.
    """
    from pyspark.sql import functions as F

    table = IcebergTable(location)
    cur = table.read(spark)
    upd = cur.where(condition)
    for c, expr in assignments.items():
        upd = upd.withColumn(c, F.expr(expr))
    upd = upd.select(*cur.columns).localCheckpoint(eager=True)
    n = upd.count()
    if n == 0:
        return 0
    iceberg_delete(spark, location, condition)
    iceberg_append(upd, location)
    return n
