"""Iceberg v2 table-format read shim (plugin/trino-iceberg analogue).

Reads a REAL Iceberg metadata tree with no external library:

- ``metadata/v*.metadata.json`` (or ``version-hint.text``): table schema,
  snapshot log, manifest-list locations;
- manifest lists and manifests are Avro Object Container Files — parsed
  with the pure-Python Avro codec in sources/decoders.py plus the
  container framing implemented here;
- data files are parquet, loaded through ``spark.read.parquet`` so scan
  pushdown/pruning still applies;
- v2 merge-on-read deletes: position-delete files are anti-joined on
  (``file_path``, ``pos``) against Spark's ``_metadata.file_path`` /
  ``_metadata.row_index`` hidden columns, equality-delete files are
  anti-joined on their equality ids — both executed as distributed joins,
  no driver materialization of data rows.

Time travel: ``read(snapshot_id=...)`` or ``read(as_of_ms=...)`` walks the
snapshot log exactly like the reference's
``plugin/trino-iceberg/.../IcebergMetadata.java`` `FOR VERSION AS OF` /
`FOR TIMESTAMP AS OF` handling.

Reference parity: io.trino.plugin.trino-iceberg (manifest walking in
iceberg-core's ManifestFiles/ManifestLists, surfaced to Trino through
TableScan planning); the subset here is the read path: snapshot
resolution, manifest enumeration, delete application.
"""

from __future__ import annotations

import glob
import json
import os
import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.sources.decoders import _AvroReader, avro_encode

__all__ = [
    "read_avro_container",
    "write_avro_container",
    "IcebergTable",
    "read_iceberg",
]


# --------------------------------------------------------------------------
# Avro Object Container File framing (spec: file header = magic 'Obj\x01',
# file-metadata map incl. avro.schema, 16-byte sync marker; then blocks of
# (record count, byte size, records..., sync)).
# --------------------------------------------------------------------------

_MAGIC = b"Obj\x01"
_META_SCHEMA = {"type": "map", "values": "bytes"}


def read_avro_container(path: str) -> list:
    """Parse an Avro OCF into its records (codec null/deflate, or snappy if
    the python-snappy library happens to be importable)."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:4] != _MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    r = _AvroReader(buf)
    r.i = 4
    meta = r.read(_META_SCHEMA)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    snappy = None
    if codec == "snappy":
        try:
            import snappy  # type: ignore[no-redef]
        except ImportError as exc:
            raise ValueError(
                f"{path}: avro codec 'snappy' needs the python-snappy "
                "library, which is not installed; rewrite the manifests with "
                "codec null/deflate (e.g. Iceberg's write.avro.compression-"
                "codec=gzip) or install python-snappy"
            ) from exc
    elif codec not in ("null", "deflate"):
        raise ValueError(f"unsupported avro codec {codec!r}")
    sync = buf[r.i : r.i + 16]
    r.i += 16
    out: list = []
    while r.i < len(buf):
        n_records = r._varint()
        n_bytes = r._varint()
        block = buf[r.i : r.i + n_bytes]
        r.i += n_bytes
        if codec == "deflate":
            import zlib

            block = zlib.decompress(block, -15)
        elif codec == "snappy":
            # spec: snappy-compressed block followed by 4-byte big-endian CRC32
            block = snappy.decompress(block[:-4])
        br = _AvroReader(block)
        for _ in range(n_records):
            out.append(br.read(schema))
        if buf[r.i : r.i + 16] != sync:
            raise ValueError(f"{path}: sync marker mismatch")
        r.i += 16
    return out


def write_avro_container(
    path: str, schema: dict, records: list, codec: str = "null"
) -> None:
    """Write records as an Avro OCF (for tests/interchange — real Iceberg
    writers produce exactly this structure; ``codec`` null or deflate)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported write codec {codec!r}")
    body = b"".join(avro_encode(rec, schema) for rec in records)
    if codec == "deflate":
        import zlib

        comp = zlib.compressobj(wbits=-15)
        body = comp.compress(body) + comp.flush()
    sync = struct.pack(">IIII", 0x1CEB, 0xE26, 0xAB1E, len(records) & 0xFFFFFFFF)
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": codec.encode(),
    }
    with open(path, "wb") as fh:
        fh.write(_MAGIC)
        fh.write(avro_encode(meta, _META_SCHEMA))
        fh.write(sync)
        if records:
            fh.write(avro_encode(len(records), "long"))
            fh.write(avro_encode(len(body), "long"))
            fh.write(body)
            fh.write(sync)


# --------------------------------------------------------------------------
# Iceberg metadata walking
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class _DataFile:
    path: str
    content: int  # 0=data, 1=position deletes, 2=equality deletes
    equality_ids: tuple[int, ...] = ()
    # Data sequence number (v2): orders files against delete files. An
    # equality delete applies only to data files with STRICTLY SMALLER data
    # sequence number; a position delete to files with seq <= delete seq
    # (Iceberg spec "Scan Planning"; iceberg-core DeleteFileIndex, used by
    # the reference's plugin/trino-iceberg). v1 tables have no sequence
    # numbers -> 0 everywhere, which keeps both rules vacuously permissive.
    sequence_number: int = 0
    # manifest-entry partition tuple + the spec it was written under
    # (IcebergSplitSource prunes splits from exactly this metadata) and the
    # data file's storage format (spec data_file.file_format).
    partition: tuple[tuple[str, object], ...] | None = None
    spec_id: int = 0
    file_format: str = "PARQUET"
    record_count: int = 0
    file_size_in_bytes: int = 0


def _local(p: str) -> str:
    # Java URI.toString() emits both 'file:///x' and single-slash 'file:/x';
    # normalize every file-scheme spelling to a bare absolute path.
    import re

    return re.sub(r"^file:/{0,2}(?=/)", "", p)


# table roots seen by this process, so EXPLAIN (TYPE IO) can attribute a
# composed read's parquet scan leaves back to the Iceberg table they came
# from (IoPlanPrinter reports the connector table, not the raw files)
IO_TABLE_ROOTS: set[str] = set()

# most recent scan-planning stats per table root (candidate/scanned/pruned
# manifest-level file counts), attached to the IO explain like the split
# counts the reference's IoPlanPrinter-era estimates carry
IO_SCAN_INFO: dict[str, dict] = {}


class IcebergTable:
    """Read-only handle over an Iceberg v2 table directory."""

    def __init__(self, location: str):
        self.location = location
        IO_TABLE_ROOTS.add(_local(location))
        md_dir = os.path.join(location, "metadata")
        hint = os.path.join(md_dir, "version-hint.text")
        md_path = None
        if os.path.exists(hint):
            with open(hint) as fh:
                v = fh.read().strip()
            md_path = os.path.join(md_dir, f"v{v}.metadata.json")
            if not os.path.exists(md_path):
                md_path = None  # hint names a missing file -> fall back
        if md_path is None:
            # Latest = highest NUMERIC version. Lexicographic basename sort
            # is wrong for HadoopTables names once v10 exists ('v10...' <
            # 'v9...'); extract the leading version number (works for both
            # 'v<N>.metadata.json' and zero-padded '<NNNNN>-<uuid>' names).
            import re

            def _ver(p: str) -> tuple[int, str]:
                base = os.path.basename(p)
                m = re.match(r"v?(\d+)", base)
                return (int(m.group(1)) if m else -1, base)

            cands = sorted(
                glob.glob(os.path.join(md_dir, "*.metadata.json")), key=_ver
            )
            if not cands:
                raise FileNotFoundError(f"no metadata json under {md_dir}")
            md_path = cands[-1]
        with open(md_path) as fh:
            self.metadata = json.load(fh)

    # -- snapshot resolution (FOR VERSION/TIMESTAMP AS OF) ------------------

    def snapshots(self) -> list[dict]:
        return self.metadata.get("snapshots", [])

    def current_snapshot(self) -> dict | None:
        cur = self.metadata.get("current-snapshot-id", -1)
        for s in self.snapshots():
            if s["snapshot-id"] == cur:
                return s
        return self.snapshots()[-1] if self.snapshots() else None

    def snapshot_for(
        self, snapshot_id: int | None = None, as_of_ms: int | None = None
    ) -> dict:
        if snapshot_id is not None:
            for s in self.snapshots():
                if s["snapshot-id"] == snapshot_id:
                    return s
            raise KeyError(f"snapshot {snapshot_id} not found")
        if as_of_ms is not None:
            eligible = [
                s for s in self.snapshots() if s["timestamp-ms"] <= as_of_ms
            ]
            if not eligible:
                raise KeyError(f"no snapshot at or before {as_of_ms}")
            return max(eligible, key=lambda s: s["timestamp-ms"])
        cur = self.current_snapshot()
        if cur is None:
            raise KeyError("table has no snapshots")
        return cur

    # -- manifest walking ----------------------------------------------------

    def data_files(
        self, snapshot_id: int | None = None, as_of_ms: int | None = None
    ) -> list[_DataFile]:
        snap = self.snapshot_for(snapshot_id, as_of_ms)
        manifest_list = _local(snap["manifest-list"])
        files: list[_DataFile] = []
        for m in read_avro_container(manifest_list):
            manifest_path = _local(m["manifest_path"])
            m_seq = int(m.get("sequence_number") or 0)
            m_spec = int(m.get("partition_spec_id") or 0)
            for entry in read_avro_container(manifest_path):
                status = entry.get("status")
                if status == 2:  # DELETED entry
                    continue
                # Sequence-number inheritance (spec "Sequence Number
                # Inheritance"): a null data sequence number on an ADDED
                # (status=1) entry inherits the manifest's sequence number
                # from the manifest list; EXISTING entries must carry their
                # own. v1 manifests have neither -> 0.
                seq = entry.get("sequence_number")
                if seq is None:
                    seq = m_seq if status == 1 else 0
                df = entry["data_file"]
                part = df.get("partition")
                files.append(
                    _DataFile(
                        path=_local(df["file_path"]),
                        content=df.get("content") or 0,
                        equality_ids=tuple(df.get("equality_ids") or ()),
                        sequence_number=int(seq),
                        partition=(
                            tuple(sorted(part.items()))
                            if isinstance(part, dict)
                            else None
                        ),
                        spec_id=m_spec,
                        file_format=str(
                            df.get("file_format") or "PARQUET"
                        ).upper(),
                        record_count=int(df.get("record_count") or 0),
                        file_size_in_bytes=int(
                            df.get("file_size_in_bytes") or 0
                        ),
                    )
                )
        return files

    def partition_specs(self):
        """Parsed partition specs keyed by spec-id (PartitionSpecParser
        analogue; sources/iceberg_partition.py)."""
        from trino_private_spark.sources.iceberg_partition import parse_specs

        return parse_specs(self.metadata)

    # -- the read path ---------------------------------------------------------

    def _empty_frame(self, spark: SparkSession) -> DataFrame:
        """Zero-row DataFrame with the table's current schema (the shape a
        fully-pruned scan returns)."""
        inv = {
            "long": "bigint", "int": "int", "string": "string",
            "double": "double", "float": "float", "boolean": "boolean",
            "date": "date", "binary": "binary", "uuid": "string",
        }
        cols = []
        for f in self._current_schema().get("fields", []):
            t = f.get("type")
            t = t if isinstance(t, str) else "string"
            spark_t = inv.get(t, "timestamp" if t.startswith("timestamp") else t)
            cols.append(f"`{f['name']}` {spark_t}")
        return spark.createDataFrame([], ", ".join(cols))

    @staticmethod
    def _read_files(spark: SparkSession, files: list[_DataFile]) -> DataFrame:
        """Scan a file group, branching on each file's recorded storage
        format (spec data_file.file_format; the reference dispatches per
        file in IcebergPageSourceProvider). Unknown formats fail loudly —
        misreading ORC bytes as parquet must never be silent."""
        by_fmt: dict[str, list[str]] = {}
        for f in files:
            by_fmt.setdefault(f.file_format, []).append(f.path)
        parts = []
        for fmt, paths in sorted(by_fmt.items()):
            if fmt == "PARQUET":
                parts.append(spark.read.parquet(*paths))
            elif fmt == "ORC":
                # DataFrameReader.orc's 2nd positional is mergeSchema, so
                # the path list must go as ONE argument
                parts.append(spark.read.orc(paths))
            elif fmt == "AVRO":
                parts.append(spark.read.format("avro").load(paths))
            else:
                raise ValueError(
                    f"unsupported Iceberg data file format {fmt!r}"
                )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        with_lineage: bool = False,
        partition_filter: list[tuple[str, str, object]] | None = None,
    ) -> DataFrame:
        """Read the table contents after delete application. With
        ``with_lineage`` the result keeps ``__file``/``__pos`` columns
        (data file path + row ordinal) — the handles a DELETE writer needs
        to emit position-delete files for the surviving rows it matches.

        ``partition_filter`` is a conjunctive predicate
        ``[(source_col, op, literal), ...]`` evaluated against each
        manifest entry's partition tuple through the table's partition-spec
        transforms BEFORE any data file is opened — the reference's
        manifest-level split pruning (IcebergSplitSource.java). It prunes
        files only; the caller still applies the row-level predicate.
        ``self.last_scan`` records candidate/scanned/pruned file counts
        for EXPLAIN (TYPE IO)."""
        files = self.data_files(snapshot_id, as_of_ms)
        # A data file can be listed by more than one manifest (ADDED once,
        # EXISTING after rewrites); keep one entry per path, max seq.
        by_path: dict[str, _DataFile] = {}
        for f in files:
            if f.content == 0:
                prev = by_path.get(f.path)
                if prev is None or f.sequence_number > prev.sequence_number:
                    by_path[f.path] = f
        data = list(by_path.values())
        if not data:
            raise ValueError("snapshot has no data files")
        candidates = len(data)
        if partition_filter:
            from trino_private_spark.sources.iceberg_partition import (
                file_matches,
            )

            specs = self.partition_specs()
            data = [
                f
                for f in data
                if file_matches(
                    specs.get(f.spec_id),
                    dict(f.partition) if f.partition is not None else None,
                    partition_filter,
                )
            ]
        self.last_scan = {
            "candidate_data_files": candidates,
            "scanned_data_files": len(data),
            "pruned_data_files": candidates - len(data),
        }
        IO_SCAN_INFO[_local(self.location)] = dict(self.last_scan)
        pos_del = [f for f in files if f.content == 1]
        eq_del = [f for f in files if f.content == 2]
        if (with_lineage or pos_del) and any(
            f.file_format != "PARQUET" for f in data
        ):
            # Spark's ORC _metadata struct carries no row_index, so row
            # positions — needed both to APPLY position deletes and to
            # WRITE them (DELETE/UPDATE lineage) — only exist for parquet
            # data files. Equality deletes and plain reads still work.
            raise NotImplementedError(
                "position-delete handling requires parquet data files "
                "(Spark exposes _metadata.row_index for parquet only); "
                "this table has non-parquet data files"
            )
        if not data:
            df = self._empty_frame(spark)
            if with_lineage:
                df = df.withColumns(
                    {
                        "__file": F.lit(None).cast("string"),
                        "__pos": F.lit(None).cast("long"),
                    }
                )
            return df
        df = self._read_files(spark, data)
        norm0 = lambda c: F.regexp_replace(c, "^file:/{0,2}/", "/")  # noqa: E731
        if not pos_del and not eq_del:
            if with_lineage:
                df = df.withColumns(
                    {
                        "__file": norm0(F.col("_metadata.file_path")),
                        "__pos": F.col("_metadata.row_index"),
                    }
                )
            return df

        # Delete files carry the data file's ORIGINAL (possibly file:- or
        # file://-prefixed) path; normalize both sides identically.
        norm = lambda c: F.regexp_replace(c, "^file:/{0,2}/", "/")  # noqa: E731
        df = df.withColumns(
            {
                "__file": norm(F.col("_metadata.file_path")),
                "__pos": F.col("_metadata.row_index"),
            }
        )
        # Attach each row's data sequence number (metadata-scale: one entry
        # per data file, broadcast-joined on the file path) so that delete
        # application can be scoped per the spec — without this, a row
        # deleted and later re-inserted (standard CDC upsert) would be
        # dropped from the newer file too.
        seq_df = spark.createDataFrame(
            [(f.path, f.sequence_number) for f in data],
            "__file string, __seq long",
        )
        df = df.join(F.broadcast(seq_df), "__file", "left").withColumn(
            "__seq", F.coalesce(F.col("__seq"), F.lit(0))
        )

        if pos_del:
            # Position deletes apply to data files with seq <= delete seq.
            # Group delete files by their sequence number (bounded by the
            # snapshot count) and keep, per (file, pos), the max delete seq.
            by_seq: dict[int, list[_DataFile]] = {}
            for f in pos_del:
                by_seq.setdefault(f.sequence_number, []).append(f)
            parts = [
                self._read_files(spark, dfiles).select(
                    norm(F.col("file_path")).alias("__file"),
                    F.col("pos").alias("__pos"),
                    F.lit(seq).cast("long").alias("__del_seq"),
                )
                for seq, dfiles in sorted(by_seq.items())
            ]
            dels = parts[0]
            for p in parts[1:]:
                dels = dels.unionByName(p)
            dels = dels.groupBy("__file", "__pos").agg(
                F.max("__del_seq").alias("__del_seq")
            )
            df = (
                df.join(F.broadcast(dels), ["__file", "__pos"], "left")
                .where(
                    F.col("__del_seq").isNull()
                    | (F.col("__seq") > F.col("__del_seq"))
                )
                .drop("__del_seq")
            )

        # Equality deletes apply only to data files with STRICTLY smaller
        # data sequence number. A plain anti-join can't express the scoping,
        # so: broadcast left join on the equality columns, then drop a row
        # only when it matched AND its file predates the delete file.
        for f in sorted(eq_del, key=lambda f: f.sequence_number):
            cur_names, file_names = self._eq_select(f)
            # Join on the name the DATA actually carries: current name when
            # the data files were written post-rename, the delete file's own
            # (pre-rename) name when both predate the rename — field ids are
            # the stable identity either way. Cast the delete column to the
            # data column's type: field ids fix the logical type, but an
            # all-NULL delete column can surface from parquet with a
            # different physical type.
            join_names, sel = [], []
            for cur, fn in zip(cur_names, file_names):
                use = cur if cur in df.columns else fn
                join_names.append(use)
                col = F.col(fn)
                if use in df.columns:
                    col = col.cast(df.schema[use].dataType)
                sel.append(col.alias(use))
            # Null-safe join: the Iceberg spec treats NULL as equal to NULL
            # for equality deletes, so a delete row carrying NULL in an
            # optional equality field must still match data rows — use <=>
            # (eqNullSafe), never plain equality.
            eq = (
                self._read_files(spark, [f])
                .select(*sel)
                .dropDuplicates(join_names)
                .select(
                    *[F.col(c).alias(f"__eqd_{c}") for c in join_names],
                    F.lit(True).alias("__eq_hit"),
                )
            )
            cond = None
            for c in join_names:
                term = F.col(c).eqNullSafe(F.col(f"__eqd_{c}"))
                cond = term if cond is None else (cond & term)
            df = (
                df.join(F.broadcast(eq), cond, "left")
                .where(
                    ~(
                        F.coalesce(F.col("__eq_hit"), F.lit(False))
                        & (F.col("__seq") < F.lit(f.sequence_number))
                    )
                )
                .drop("__eq_hit", *[f"__eqd_{c}" for c in join_names])
            )
        return (
            df.drop("__seq")
            if with_lineage
            else df.drop("__file", "__pos", "__seq")
        )

    def _current_schema(self) -> dict:
        cur_id = self.metadata.get("current-schema-id")
        for s in self.metadata.get("schemas", []):
            if s.get("schema-id") == cur_id:
                return s
        return self.metadata.get("schema") or {}

    def _eq_select(self, f: _DataFile):
        """Resolve equality-delete field ids to (current column names,
        column names as stored in the delete file itself).

        Field ids are stable across renames but the delete parquet was
        written with the names current AT WRITE TIME — so the name to SELECT
        comes from the delete file's own parquet field-id metadata, aliased
        to the table's current name for the join
        (plugin/trino-iceberg IcebergPageSourceProvider equality-delete
        resolution works the same way, via the file's stored schema).
        """
        by_id: dict[int, tuple[str, bool]] = {}

        def walk(fields: list[dict], top: bool) -> None:
            for fld in fields:
                by_id[fld["id"]] = (fld["name"], top)
                t = fld.get("type")
                if isinstance(t, dict) and t.get("type") == "struct":
                    walk(t.get("fields", []), False)

        walk(self._current_schema().get("fields", []), True)
        cur_names: list[str] = []
        for i in f.equality_ids:
            if i not in by_id:
                raise KeyError(
                    f"equality-delete field id {i} not in current schema"
                )
            name, top = by_id[i]
            if not top:
                raise NotImplementedError(
                    f"nested equality-delete field id {i} ({name!r}) is not "
                    "supported by this shim"
                )
            cur_names.append(name)
        in_file: dict[int, str] = {}
        try:
            import pyarrow.parquet as pq

            for fld in pq.read_schema(f.path):
                md = fld.metadata or {}
                fid = md.get(b"PARQUET:field_id")
                if fid is not None:
                    in_file[int(fid)] = fld.name
        except Exception:
            in_file = {}  # no field ids stored -> assume current names
        file_names = [
            in_file.get(i, cur) for i, cur in zip(f.equality_ids, cur_names)
        ]
        return cur_names, file_names


def parse_partition_predicate(cond: str) -> list[tuple[str, str, object]]:
    """Extract prunable conjunctive terms from a SQL WHERE string —
    ``col op literal`` joined by AND (op in = != < <= > >=, IN (...));
    literals: numbers, 'strings', DATE 'yyyy-mm-dd'. Anything else simply
    contributes no pruning term (never a wrong prune) — the reference
    derives its split-pruning domain from the query predicate the same
    conservative way (enforced vs unenforced constraint split)."""
    import re

    def lit(tok: str):
        tok = tok.strip()
        m = re.fullmatch(r"DATE\s+'(\d{4}-\d{2}-\d{2})'", tok, re.I)
        if m:
            import datetime

            return datetime.date.fromisoformat(m.group(1))
        if re.fullmatch(r"'(?:[^']|'')*'", tok):
            return tok[1:-1].replace("''", "'")
        if re.fullmatch(r"-?\d+", tok):
            return int(tok)
        if re.fullmatch(r"-?\d+\.\d+", tok):
            return float(tok)
        raise ValueError(tok)

    out: list[tuple[str, str, object]] = []
    # split on top-level AND only (no OR/NOT handling — those terms are
    # skipped wholesale by the fullmatch below)
    for term in re.split(r"\bAND\b", cond, flags=re.I):
        term = term.strip()
        # unwrap one balanced enclosing paren pair (never strip chars
        # blindly — that would eat an IN-list's closing paren)
        while (
            term.startswith("(")
            and term.endswith(")")
            and term.count("(") == term.count(")")
            and re.fullmatch(r"\([^()]*(?:\([^()]*\)[^()]*)*\)", term)
        ):
            term = term[1:-1].strip()
        m = re.fullmatch(
            r"([A-Za-z_]\w*)\s*(=|!=|<>|<=|>=|<|>)\s*(.+)", term
        )
        if m:
            try:
                op = m.group(2)
                if op in ("!=", "<>"):
                    continue  # inequality never prunes partitions
                out.append((m.group(1), op, lit(m.group(3))))
            except ValueError:
                continue
            continue
        m = re.fullmatch(
            r"([A-Za-z_]\w*)\s+IN\s*\(([^()]*)\)", term, re.I
        )
        if m:
            try:
                vals = [lit(v) for v in m.group(2).split(",")]
                out.append((m.group(1), "in", vals))
            except ValueError:
                continue
    return out


# --------------------------------------------------------------------------
# Metadata tables ("tbl$files" / "$partitions" / "$snapshots" / "$manifests"
# — the reference's Iceberg system tables, plugin/trino-iceberg
# FilesTable/PartitionTable/SnapshotsTable/ManifestsTable)
# --------------------------------------------------------------------------


def _metadata_table(table: "IcebergTable", spark: SparkSession, kind: str):
    import json as _json

    k = kind.lstrip("$").lower()
    if k == "snapshots":
        rows = [
            (
                s["snapshot-id"],
                s["timestamp-ms"],
                int(s.get("sequence-number") or 0),
                (s.get("summary") or {}).get("operation", ""),
                _local(s["manifest-list"]),
            )
            for s in table.snapshots()
        ]
        return spark.createDataFrame(
            rows,
            "snapshot_id long, committed_at_ms long, sequence_number long, "
            "operation string, manifest_list string",
        )
    if k == "manifests":
        snap = table.current_snapshot()
        rows = [
            (
                _local(m["manifest_path"]),
                int(m.get("manifest_length") or 0),
                int(m.get("partition_spec_id") or 0),
                int(m.get("content") or 0),
                int(m.get("sequence_number") or 0),
                int(m.get("added_snapshot_id") or 0),
            )
            for m in read_avro_container(_local(snap["manifest-list"]))
        ]
        return spark.createDataFrame(
            rows,
            "path string, length long, partition_spec_id int, content int, "
            "sequence_number long, added_snapshot_id long",
        )
    files = table.data_files()
    if k == "files":
        rows = [
            (
                f.content,
                f.path,
                f.file_format,
                f.record_count,
                f.file_size_in_bytes,
                _json.dumps(dict(f.partition)) if f.partition else None,
                f.sequence_number,
            )
            for f in files
        ]
        return spark.createDataFrame(
            rows,
            "content int, file_path string, file_format string, "
            "record_count long, file_size_in_bytes long, partition string, "
            "sequence_number long",
        )
    if k == "partitions":
        agg: dict[str, list[int]] = {}
        for f in files:
            if f.content != 0:
                continue
            key = _json.dumps(dict(f.partition)) if f.partition else None
            cur = agg.setdefault(key, [0, 0, 0])
            cur[0] += 1
            cur[1] += f.record_count
            cur[2] += f.file_size_in_bytes
        rows = [
            (k_, v[0], v[1], v[2]) for k_, v in sorted(
                agg.items(), key=lambda kv: (kv[0] is None, kv[0])
            )
        ]
        return spark.createDataFrame(
            rows,
            "partition string, file_count long, record_count long, "
            "total_size long",
        )
    raise ValueError(f"unknown Iceberg metadata table {kind!r}")


def read_iceberg(
    spark: SparkSession,
    location: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    partition_filter: list[tuple[str, str, object]] | None = None,
    where: str | None = None,
) -> DataFrame:
    """Read an Iceberg v2 table (optionally time-traveled, optionally
    manifest-partition-pruned). ``where`` is a SQL predicate string that
    BOTH prunes (prunable conjunctive terms derived via
    parse_partition_predicate) AND applies row-level — the way the
    reference splits a pushed-down predicate into enforced partition
    constraints and a residual filter. A ``location$snapshots`` /
    ``$files`` / ``$partitions`` / ``$manifests`` suffix returns the
    corresponding metadata table."""
    if "$" in location:
        loc, _, kind = location.rpartition("$")
        return _metadata_table(IcebergTable(loc), spark, kind)
    pf = list(partition_filter or [])
    if where:
        pf.extend(parse_partition_predicate(where))
    df = IcebergTable(location).read(
        spark, snapshot_id, as_of_ms, partition_filter=pf or None
    )
    return df.where(where) if where else df
