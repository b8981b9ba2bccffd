"""Synthetic Iceberg v2 table builder (tests + probes for sources/iceberg.py).

Writes a real on-disk Iceberg v2 metadata tree — metadata.json, Avro
manifest lists/manifests (via write_avro_container), parquet data/delete
files with proper parquet field-id metadata — so the read shim is exercised
against the same structures real writers produce. This mirrors what the
reference's test harness does with hand-built tables
(plugin/trino-iceberg/src/test/.../TestIcebergV2.java builds v2 tables with
position/equality deletes and reads them back).
"""

from __future__ import annotations

import json
import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from trino_private_spark.sources.iceberg import write_avro_container

MANIFEST_LIST_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string"},
        {"name": "manifest_length", "type": "long"},
        {"name": "partition_spec_id", "type": "int"},
        {"name": "content", "type": "int"},
        {"name": "sequence_number", "type": "long"},
        {"name": "min_sequence_number", "type": "long"},
        {"name": "added_snapshot_id", "type": "long"},
        # spec manifest_file field 507/508: per-partition-field summaries
        # (contains_null + Appendix-D bounds of the partition VALUES), in
        # partition-spec field order — what lets a reader skip a whole
        # manifest without opening it (iceberg-core ManifestFile
        # partitions(), consumed by the reference's split planning).
        # Null-unioned, so tables written before this field parse fine.
        {
            "name": "partitions",
            "type": [
                "null",
                {
                    "type": "array",
                    "items": {
                        "type": "record",
                        "name": "r508",
                        "fields": [
                            {"name": "contains_null", "type": "boolean"},
                            {
                                "name": "lower_bound",
                                "type": ["null", "bytes"],
                            },
                            {
                                "name": "upper_bound",
                                "type": ["null", "bytes"],
                            },
                        ],
                    },
                },
            ],
        },
    ],
}

MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int"},
        {"name": "snapshot_id", "type": ["null", "long"]},
        {"name": "sequence_number", "type": ["null", "long"]},
        {
            "name": "data_file",
            "type": {
                "type": "record",
                "name": "data_file_r",
                "fields": [
                    {"name": "content", "type": "int"},
                    {"name": "file_path", "type": "string"},
                    {"name": "file_format", "type": "string"},
                    {"name": "record_count", "type": "long"},
                    {"name": "file_size_in_bytes", "type": "long"},
                    {
                        "name": "equality_ids",
                        "type": ["null", {"type": "array", "items": "int"}],
                    },
                ],
            },
        },
    ],
}


def write_parquet_with_ids(
    path: str, columns: dict[str, list], field_ids: dict[str, int]
) -> None:
    """Write a parquet file whose schema carries Iceberg field ids."""
    plain = pa.table(columns)
    fields = []
    for name in columns:
        f = plain.schema.field(name)
        meta = {b"PARQUET:field_id": str(field_ids[name]).encode()}
        fields.append(pa.field(name, f.type, metadata=meta))
    pq.write_table(plain.cast(pa.schema(fields)), path)


def build_table(
    location: str,
    fields: list[tuple[int, str, str]],
    snapshots: list[dict],
    *,
    version: int = 1,
    version_hint: bool = False,
    manifest_codec: str = "null",
    schemas: list[dict] | None = None,
    current_schema_id: int = 0,
    path_prefix: str = "",
) -> None:
    """Assemble the metadata tree for already-written data/delete files.

    ``fields``: (field_id, name, iceberg_type) of the current schema.
    ``snapshots``: each ``{"id", "ts", "seq", "files": [{"path", "content",
    "seq" (optional -> inherited), "equality_ids" (optional)}]}``; a
    snapshot's manifest list references one manifest per snapshot up to and
    including itself (append-style history).
    ``path_prefix``: e.g. ``"file:/"`` or ``"file://"`` to exercise URI-style
    path spellings in the metadata.
    """
    md_dir = os.path.join(location, "metadata")
    os.makedirs(md_dir, exist_ok=True)

    def _p(path: str) -> str:
        return path_prefix + path if path_prefix else path

    manifests: list[tuple[str, int, int]] = []  # (path, seq, snapshot_id)
    snapshot_md = []
    for snap in snapshots:
        m_path = os.path.join(md_dir, f"manifest-{snap['id']}.avro")
        entries = []
        for f in snap["files"]:
            entries.append(
                {
                    "status": 1,
                    "snapshot_id": snap["id"],
                    # omit -> inherit the manifest's sequence number
                    "sequence_number": f.get("seq"),
                    "data_file": {
                        "content": f.get("content", 0),
                        "file_path": _p(f["path"]),
                        "file_format": "PARQUET",
                        "record_count": f.get("record_count", 0),
                        "file_size_in_bytes": os.path.getsize(f["path"]),
                        "equality_ids": f.get("equality_ids"),
                    },
                }
            )
        write_avro_container(
            m_path, MANIFEST_ENTRY_SCHEMA, entries, codec=manifest_codec
        )
        manifests.append((m_path, snap["seq"], snap["id"]))
        ml_path = os.path.join(md_dir, f"snap-{snap['id']}.avro")
        write_avro_container(
            ml_path,
            MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": _p(mp),
                    "manifest_length": os.path.getsize(mp),
                    "partition_spec_id": 0,
                    "content": 0,
                    "sequence_number": mseq,
                    "min_sequence_number": mseq,
                    "added_snapshot_id": msnap,
                }
                for mp, mseq, msnap in manifests
            ],
            codec=manifest_codec,
        )
        snapshot_md.append(
            {
                "snapshot-id": snap["id"],
                "timestamp-ms": snap["ts"],
                "sequence-number": snap["seq"],
                "manifest-list": _p(ml_path),
            }
        )

    if schemas is None:
        schemas = [
            {
                "type": "struct",
                "schema-id": 0,
                "fields": [
                    {"id": i, "name": n, "required": False, "type": t}
                    for i, n, t in fields
                ],
            }
        ]
    metadata = {
        "format-version": 2,
        "table-uuid": str(uuid.uuid5(uuid.NAMESPACE_URL, location)),
        "location": location,
        "last-sequence-number": max((s["seq"] for s in snapshots), default=0),
        "last-updated-ms": max((s["ts"] for s in snapshots), default=0),
        "current-schema-id": current_schema_id,
        "schemas": schemas,
        "current-snapshot-id": snapshots[-1]["id"] if snapshots else -1,
        "snapshots": snapshot_md,
    }
    with open(os.path.join(md_dir, f"v{version}.metadata.json"), "w") as fh:
        json.dump(metadata, fh)
    if version_hint:
        with open(os.path.join(md_dir, "version-hint.text"), "w") as fh:
            fh.write(str(version))
