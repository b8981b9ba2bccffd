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
    "read_avro_container_cached",
    "prefetch_manifests",
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
# Immutable-metadata cache: Iceberg manifests and manifest lists are
# content-addressed and NEVER mutate after commit (a new snapshot writes
# new files), so parsed records are safe to reuse across statements. The
# (size, mtime_ns) key guards against path reuse after delete/rewrite.
# This is what keeps scan planning O(matching manifests) per statement
# instead of re-parsing the whole metadata tree on every query — at
# 100 TB / 10^5 files the difference between milliseconds and minutes of
# driver time. Callers MUST NOT mutate the returned records.
# --------------------------------------------------------------------------

from collections import OrderedDict as _OrderedDict

_AVRO_CACHE: "_OrderedDict[tuple, list]" = _OrderedDict()
_AVRO_CACHE_MAX = 4096  # manifests are small; bound driver memory anyway


def read_avro_container_cached(path: str) -> list:
    """``read_avro_container`` through the immutable-metadata cache
    (LRU, keyed by path + size + mtime_ns)."""
    try:
        st = os.stat(path)
    except OSError:
        return read_avro_container(path)  # surface the real read error
    key = (path, st.st_size, st.st_mtime_ns)
    hit = _AVRO_CACHE.get(key)
    if hit is None:
        hit = read_avro_container(path)
        _AVRO_CACHE[key] = hit
        if len(_AVRO_CACHE) > _AVRO_CACHE_MAX:
            _AVRO_CACHE.popitem(last=False)
    else:
        _AVRO_CACHE.move_to_end(key)
    return hit


#: more than this many manifests to open makes data_files consider the
#: distributed decode at all (a cheap count guard before any stat calls)
MANIFEST_DRIVER_THRESHOLD = 64

#: ... and the distributed job actually launches only when the UNCACHED
#: manifest bytes exceed this — decode cost tracks bytes, not manifest
#: count, and the measured warm-local-disk crossover (pure-Python avro
#: decode ~8 MB/s serial vs job overhead + pickle collect + driver
#: loads) sits near 20-30 MiB of manifest data (SCALE.md round 8). On
#: object storage — the 100-TB reality — serial planning is
#: LATENCY-bound (one RTT per manifest), so erring low there is free;
#: the reference reads manifests through iceberg-core's ManifestGroup
#: with a worker pool for the same reason.
MANIFEST_DISTRIBUTED_MIN_BYTES = 24 * 1024 * 1024


def prefetch_manifests(
    spark: SparkSession, paths: list[str], min_bytes: int | None = None
) -> int:
    """Parse many Avro manifest files in ONE distributed ``mapInArrow``
    job and seed the immutable-metadata cache with the decoded records —
    metadata-scale driver traffic (one pickled record list per manifest
    comes back), data-scale IO stays on the executors. Returns the
    number of manifests fetched. Paths already cached are skipped; the
    job launches only when the uncached bytes clear ``min_bytes``
    (default MANIFEST_DISTRIBUTED_MIN_BYTES) — below that the serial
    driver decode is measurably faster."""
    import pickle

    if min_bytes is None:
        min_bytes = MANIFEST_DISTRIBUTED_MIN_BYTES
    todo: list[tuple[str, tuple]] = []
    todo_bytes = 0
    for p in paths:
        try:
            st = os.stat(p)
        except OSError:
            continue  # unreadable here: the serial path surfaces the error
        key = (p, st.st_size, st.st_mtime_ns)
        if key not in _AVRO_CACHE:
            todo.append((p, key))
            todo_bytes += st.st_size
    if len(todo) > _AVRO_CACHE_MAX:
        # inserting more entries than the cache holds would evict the
        # EARLY results before the planning pass (which consumes in this
        # same order) reads them back — the whole distributed decode
        # would be wasted work (r8 ADVICE). Prefetch only what survives;
        # the tail decodes serially on consumption.
        todo = todo[:_AVRO_CACHE_MAX]
    if not todo or todo_bytes < min_bytes:
        return 0

    def _parse(batches):
        import pickle as _p  # noqa: PLC0415 (executor-side)

        import pyarrow as pa  # noqa: PLC0415

        from trino_private_spark.sources.iceberg import (  # noqa: PLC0415
            read_avro_container,
        )

        for batch in batches:
            out_p, out_b = [], []
            for p in batch.column("path").to_pylist():
                out_p.append(p)
                out_b.append(
                    _p.dumps(read_avro_container(p), protocol=4)
                )
            yield pa.RecordBatch.from_pydict(
                {"path": out_p, "blob": out_b}
            )

    rows = (
        spark.createDataFrame([(p,) for p, _ in todo], "path string")
        .repartition(min(64, max(1, len(todo) // 8)))
        .mapInArrow(_parse, "path string, blob binary")
        .collect()
    )
    by_path = {r["path"]: bytes(r["blob"]) for r in rows}
    fetched = 0
    for p, key in todo:
        blob = by_path.get(p)
        if blob is None:
            continue
        _AVRO_CACHE[key] = pickle.loads(blob)
        fetched += 1
        if len(_AVRO_CACHE) > _AVRO_CACHE_MAX:
            _AVRO_CACHE.popitem(last=False)
    return fetched


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
    # column metrics (spec: maps keyed by field id; bounds in Appendix-D
    # single-value serialization) — IcebergSplitSource prunes splits on
    # these even for predicates on unpartitioned columns
    lower_bounds: tuple[tuple[int, bytes], ...] = ()
    upper_bounds: tuple[tuple[int, bytes], ...] = ()
    null_value_counts: tuple[tuple[int, int], ...] = ()
    value_counts: tuple[tuple[int, int], ...] = ()


_ICEBERG_TO_SPARK = {
    "long": "bigint", "int": "int", "string": "string",
    "double": "double", "float": "float", "boolean": "boolean",
    "date": "date", "binary": "binary", "uuid": "string",
}


def _spark_type(t) -> str | None:
    """Iceberg type string -> Spark DDL type (None for nested types)."""
    if not isinstance(t, str):
        return None
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith("decimal"):
        return t
    return _ICEBERG_TO_SPARK.get(t, t)


def _id_map(x) -> tuple:
    """Normalize a manifest column-metrics map to ((field_id, value)...):
    this writer emits avro maps keyed by stringified field id; real
    Iceberg manifests store array<record<key:int, value:...>>."""
    if not x:
        return ()
    if isinstance(x, dict):
        return tuple(sorted((int(k), v) for k, v in x.items()))
    return tuple(sorted((int(e["key"]), e["value"]) for e in x))


def _local(p: str) -> str:
    # Java URI.toString() emits both 'file:///x' and single-slash 'file:/x';
    # normalize every file-scheme spelling to a bare absolute path.
    import re

    return re.sub(r"^file:/{0,2}(?=/)", "", p)


#: constructed per-manifest _DataFile tuples, keyed like the avro cache
#: plus the manifest-list context the entries resolve under (the
#: manifest's own sequence number drives spec "Sequence Number
#: Inheritance", its spec id tags every file). A manifest file is
#: immutable and always listed at the same sequence number, so the
#: entry is a pure function of the key — this turns REPEAT scan
#: planning into O(matching manifests) dict lookups instead of
#: re-materializing 10^5 Python objects per statement at 100-TB file
#: counts (measured: ~1 s -> ~ms at 102k files, SCALE.md round 8).
_DATAFILE_CACHE: "_OrderedDict[tuple, tuple]" = _OrderedDict()


def _manifest_datafiles(
    manifest_path: str, m_seq: int, m_spec: int
) -> "tuple[_DataFile, ...]":
    """One manifest's live entries as constructed _DataFile tuples,
    through _DATAFILE_CACHE. Callers MUST NOT mutate the result."""
    try:
        st = os.stat(manifest_path)
        key = (manifest_path, st.st_size, st.st_mtime_ns, m_seq, m_spec)
    except OSError:
        key = None
    if key is not None:
        hit = _DATAFILE_CACHE.get(key)
        if hit is not None:
            _DATAFILE_CACHE.move_to_end(key)
            return hit
    out: list[_DataFile] = []
    for entry in read_avro_container_cached(manifest_path):
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
        out.append(
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
                lower_bounds=_id_map(df.get("lower_bounds")),
                upper_bounds=_id_map(df.get("upper_bounds")),
                null_value_counts=_id_map(df.get("null_value_counts")),
                value_counts=_id_map(df.get("value_counts")),
            )
        )
    result = tuple(out)
    if key is not None:
        _DATAFILE_CACHE[key] = result
        if len(_DATAFILE_CACHE) > _AVRO_CACHE_MAX:
            _DATAFILE_CACHE.popitem(last=False)
    return result


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
        self.metadata_path = md_path
        # the version THIS handle loaded — metadata-only writers must CAS
        # against it (base+1), never re-read the latest at write time: a
        # concurrent commit landing in between would otherwise win the
        # CAS with a stale base and silently lose the interleaved
        # snapshots (r8 ADVICE; the reference's TableOperations commit
        # carries base metadata + version together)
        import re as _re

        _m = _re.match(r"v?(\d+)", os.path.basename(md_path))
        self.loaded_version = int(_m.group(1)) if _m else 0
        try:
            _st = os.stat(md_path)
            # metadata files are immutable once linked into place, so
            # (path, size, mtime_ns) identifies this table VERSION —
            # the key for every per-version cache (read-DF, CBO)
            self.metadata_key = (md_path, _st.st_size, _st.st_mtime_ns)
        except OSError:
            self.metadata_key = (md_path, -1, -1)

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
        self,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        partition_filter: list[tuple[str, str, object]] | None = None,
        spark: SparkSession | None = None,
    ) -> list[_DataFile]:
        """Walk the snapshot's manifest list. With ``partition_filter``,
        DATA manifests whose manifest-list field_summaries exclude every
        predicate term are SKIPPED WITHOUT BEING OPENED — the reference's
        manifest-level pruning (iceberg-core ManifestGroup over
        ManifestFile.partitions(), consumed by IcebergSplitSource). Delete
        manifests are always opened (a skipped delete could resurrect
        rows). ``self.last_manifest_scan`` records total/opened/pruned
        manifest counts for EXPLAIN (TYPE IO). With ``spark``, a cold
        scan of more than MANIFEST_DRIVER_THRESHOLD uncached manifests
        decodes them in one distributed job instead of serial driver
        Python (the entries come back once and land in the immutable-
        metadata cache)."""
        snap = self.snapshot_for(snapshot_id, as_of_ms)
        manifest_list = _local(snap["manifest-list"])
        specs = self.partition_specs() if partition_filter else {}
        files: list[_DataFile] = []
        manifests = read_avro_container_cached(manifest_list)
        to_open: list[tuple[str, int, int]] = []
        for m in manifests:
            manifest_path = _local(m["manifest_path"])
            m_seq = int(m.get("sequence_number") or 0)
            m_spec = int(m.get("partition_spec_id") or 0)
            if partition_filter and int(m.get("content") or 0) == 0:
                from trino_private_spark.sources.iceberg_partition import (
                    manifest_matches,
                )

                if not manifest_matches(
                    specs.get(m_spec), m.get("partitions"), partition_filter
                ):
                    continue
            to_open.append((manifest_path, m_seq, m_spec))
        if spark is not None and len(to_open) > MANIFEST_DRIVER_THRESHOLD:
            prefetch_manifests(spark, [p for p, _, _ in to_open])
        opened = len(to_open)
        for manifest_path, m_seq, m_spec in to_open:
            files.extend(_manifest_datafiles(manifest_path, m_seq, m_spec))
        self.last_manifest_scan = {
            "manifests_total": len(manifests),
            "manifests_opened": opened,
            "manifests_pruned": len(manifests) - opened,
        }
        return files

    def partition_specs(self):
        """Parsed partition specs keyed by spec-id (PartitionSpecParser
        analogue; sources/iceberg_partition.py)."""
        from trino_private_spark.sources.iceberg_partition import parse_specs

        return parse_specs(self.metadata)

    # -- the read path ---------------------------------------------------------

    def _empty_frame(
        self, spark: SparkSession, schema: dict | None = None
    ) -> DataFrame:
        """Zero-row DataFrame with the table's (or the given) schema (the
        shape a fully-pruned scan returns)."""
        cols = []
        for f in (schema or self._current_schema()).get("fields", []):
            spark_t = _spark_type(f.get("type")) or "string"
            cols.append(f"`{f['name']}` {spark_t}")
        return spark.createDataFrame([], ", ".join(cols))

    @staticmethod
    def _read_files(
        spark: SparkSession,
        files: list[_DataFile],
        schema_ddl: str | None = None,
    ) -> DataFrame:
        """Scan a file group, branching on each file's recorded storage
        format (spec data_file.file_format; the reference dispatches per
        file in IcebergPageSourceProvider). Unknown formats fail loudly —
        misreading ORC bytes as parquet must never be silent.

        ``schema_ddl``: pass the schema the MANIFESTS already declare so
        Spark skips its footer-based inference pass (the reference never
        infers — IcebergPageSourceProvider plans from table metadata);
        parquet only, where writer and metadata types align by
        construction."""
        by_fmt: dict[str, list[str]] = {}
        for f in files:
            by_fmt.setdefault(f.file_format, []).append(f.path)
        parts = []
        for fmt, paths in sorted(by_fmt.items()):
            if fmt == "PARQUET":
                reader = spark.read
                if schema_ddl:
                    reader = reader.schema(schema_ddl)
                parts.append(reader.parquet(*paths))
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

    @staticmethod
    def _parquet_field_map(path: str) -> dict[int, str]:
        """field id -> column name as stored in ONE parquet file's footer
        (the per-file identity resolution the reference's
        IcebergPageSourceProvider does per split)."""
        import pyarrow.parquet as pq

        out: dict[int, str] = {}
        for fld in pq.read_schema(path):
            md = fld.metadata or {}
            fid = md.get(b"PARQUET:field_id")
            if fid is not None:
                out[int(fid)] = fld.name
        return out

    #: evolved-table footer id-maps resolve driver-side (thread pool)
    #: up to this many files; above it, a distributed mapInArrow job
    #: reads the footers executor-side — the reference resolves per
    #: split on workers, and at 10^5 files a single driver must not
    #: serialize that IO
    FOOTER_DRIVER_THRESHOLD = 256

    @classmethod
    def _parquet_field_maps(
        cls, spark: SparkSession, paths: list[str]
    ) -> list[dict[int, str]]:
        """Footer id-maps for many files: driver thread pool below
        FOOTER_DRIVER_THRESHOLD, a distributed job above it (one row per
        file comes back — metadata-scale driver traffic either way)."""
        if len(paths) <= cls.FOOTER_DRIVER_THRESHOLD:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(16, len(paths))) as ex:
                return list(ex.map(cls._parquet_field_map, paths))

        def _maps(batches):
            import json as _json  # noqa: PLC0415 (executor-side)

            import pyarrow as pa  # noqa: PLC0415
            import pyarrow.parquet as pq  # noqa: PLC0415

            for batch in batches:
                out_p, out_m = [], []
                for p in batch.column("path").to_pylist():
                    m = {}
                    for fld in pq.read_schema(p):
                        md = fld.metadata or {}
                        fid = md.get(b"PARQUET:field_id")
                        if fid is not None:
                            m[int(fid)] = fld.name
                    out_p.append(p)
                    out_m.append(_json.dumps(m))
                yield pa.RecordBatch.from_pydict(
                    {"path": out_p, "idmap": out_m}
                )

        rows = (
            spark.createDataFrame([(p,) for p in paths], "path string")
            .repartition(min(64, max(1, len(paths) // 32)))
            .mapInArrow(_maps, "path string, idmap string")
            .collect()
        )
        by_path = {
            r["path"]: {
                int(k): v for k, v in json.loads(r["idmap"]).items()
            }
            for r in rows
        }
        return [by_path[p] for p in paths]

    def _has_renames(self) -> bool:
        """True when any field id has carried different names across the
        table's schema history."""
        seen: dict[int, str] = {}
        for s in self.metadata.get("schemas", []):
            for f in s.get("fields", []):
                if f["id"] in seen and seen[f["id"]] != f["name"]:
                    return True
                seen[f["id"]] = f["name"]
        return False

    def _read_data(
        self,
        spark: SparkSession,
        files: list[_DataFile],
        schema: dict,
        lineage: bool = False,
    ) -> DataFrame:
        """Scan data files PROJECTED BY FIELD ID against ``schema`` —
        schema evolution done the reference's way (plugin/trino-iceberg
        IcebergPageSourceProvider resolves column handles by id per file):
        a file written before a column was added null-fills it, a renamed
        column is selected by its id and aliased to the schema's (current
        or snapshot-time) name, and dropped ids simply aren't projected.
        With ``lineage`` each row carries ``__file``/``__pos``.

        Fast path: a table whose metadata holds a single schema has never
        evolved — every file matches it by name and the per-format union
        needs no projection (and no footer reads). Evolved tables group
        parquet files by their footer's field-id map — resolved by a
        driver thread pool for small file counts and by a DISTRIBUTED
        mapInArrow job above FOOTER_DRIVER_THRESHOLD (the reference
        resolves per split on workers; only (path, id-map) rows return
        to the driver) — and project each group once. ORC/Avro files
        carry no parquet field ids, so they project by NAME — sound for
        add/drop, rejected loudly when the schema history contains a
        rename."""
        norm = lambda c: F.regexp_replace(c, "^file:/{0,2}/", "/")  # noqa: E731

        def attach(df: DataFrame) -> DataFrame:
            if not lineage:
                return df
            return df.withColumns(
                {
                    "__file": norm(F.col("_metadata.file_path")),
                    "__pos": F.col("_metadata.row_index"),
                }
            )

        evolved = len(self.metadata.get("schemas", [])) > 1
        if not evolved:
            # single-schema table: every file matches the declared schema
            # by construction — pass it explicitly so the cold relation
            # construction skips Spark's footer inference (round-10
            # measurement: ~2 s saved at 25.6k files, on top of the
            # right-sized listing parallelism in engine.py)
            types = [
                _spark_type(f.get("type"))
                for f in schema.get("fields", [])
            ]
            ddl = None
            if types and all(types) and all(
                f.file_format == "PARQUET" for f in files
            ):
                # externally-written files may carry pre-rename column
                # NAMES — or narrower physical NUMERIC widths — under a
                # single-schema metadata (field ids are the identity;
                # names and widths aren't). Sample one footer (the same
                # file Spark's inference would read) and keep inference
                # unless every declared name is present AND every
                # numeric width matches: declaring bigint over an int32
                # file would silently WIDEN the read column, flipping
                # the driver's exact-width schema check.
                # round-11 (r10 VERDICT #7): sample up to THREE footers —
                # first, last, middle of the manifest order — instead of
                # one; a mixed-width table whose FIRST file matched the
                # metadata previously took the explicit-schema path for
                # every file. Still O(1) footers regardless of file count.
                try:
                    import pyarrow.parquet as pq

                    fields = schema.get("fields", [])
                    arrow_num = {
                        "int8": "tinyint", "int16": "smallint",
                        "int32": "int", "int64": "bigint",
                        "float": "float", "double": "double",
                    }
                    sample_idx = sorted(
                        {0, len(files) // 2, len(files) - 1}
                    )
                    ok = True
                    for i in sample_idx:
                        if not ok:
                            break
                        fsch = pq.read_schema(files[i].path)
                        fnames = set(fsch.names)
                        ok = {f["name"] for f in fields} <= fnames
                        for f, t in zip(fields, types):
                            if not ok:
                                break
                            if t in (
                                "tinyint", "smallint", "int", "bigint",
                                "float", "double",
                            ):
                                at = str(fsch.field(f["name"]).type)
                                if arrow_num.get(at) != t:
                                    ok = False
                    if ok:
                        ddl = ", ".join(
                            f"`{f['name']}` {t}"
                            for f, t in zip(fields, types)
                        )
                except Exception:  # noqa: BLE001 — fast path only
                    ddl = None
            return attach(self._read_files(spark, files, schema_ddl=ddl))

        cur_fields = schema.get("fields", [])

        def project(raw: DataFrame, idmap: dict[int, str], fmt: str):
            cols = []
            for f in cur_fields:
                st = _spark_type(f.get("type")) or "string"
                in_file = idmap.get(f["id"])
                if in_file is not None and in_file in raw.columns:
                    cols.append(F.col(in_file).cast(st).alias(f["name"]))
                else:
                    cols.append(F.lit(None).cast(st).alias(f["name"]))
            if lineage:
                cols.append(norm(F.col("_metadata.file_path")).alias("__file"))
                cols.append(F.col("_metadata.row_index").alias("__pos"))
            return raw.select(*cols)

        by_fmt: dict[str, list[_DataFile]] = {}
        for f in files:
            by_fmt.setdefault(f.file_format, []).append(f)
        parts: list[DataFrame] = []
        for fmt, group in sorted(by_fmt.items()):
            if fmt == "PARQUET":
                paths = [f.path for f in group]
                maps = self._parquet_field_maps(spark, paths)
                by_sig: dict[tuple, tuple[dict[int, str], list[str]]] = {}
                for p, m in zip(paths, maps):
                    if not m:  # no stored ids -> names are the identity
                        m = {f["id"]: f["name"] for f in cur_fields}
                    sig = tuple(sorted(m.items()))
                    by_sig.setdefault(sig, (m, []))[1].append(p)
                for _sig, (m, ps) in sorted(by_sig.items()):
                    parts.append(project(spark.read.parquet(*ps), m, fmt))
            else:
                if self._has_renames():
                    raise NotImplementedError(
                        f"{fmt} data files carry no parquet field ids; "
                        "reading them from a table whose schema history "
                        "contains a column RENAME is not supported by this "
                        "shim (adds/drops are fine — they project by name)"
                    )
                byname = {f["id"]: f["name"] for f in cur_fields}
                raw = self._read_files(spark, group)
                parts.append(project(raw, byname, fmt))
        # projected groups share the exact schema -> positional union
        df = parts[0]
        for p in parts[1:]:
            df = df.union(p)
        return df

    def resolve_ref(self, ref: str) -> int:
        """Named branch/tag -> snapshot id (spec §"Snapshot References";
        the reference resolves FOR VERSION AS OF 'name' through the
        metadata refs map; 'main' falls back to the current snapshot)."""
        refs = self.metadata.get("refs") or {}
        if ref in refs and refs[ref].get("snapshot-id") is not None:
            return int(refs[ref]["snapshot-id"])
        if ref == "main":
            cur = self.current_snapshot()
            if cur is not None:
                return cur["snapshot-id"]
        raise KeyError(f"Cannot find snapshot with reference name: {ref}")

    def read(
        self,
        spark: SparkSession,
        snapshot_id: int | None = None,
        as_of_ms: int | None = None,
        with_lineage: bool = False,
        partition_filter: list[tuple[str, str, object]] | None = None,
        ref: str | None = None,
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
        # A current read uses the table's CURRENT schema; TIME TRAVEL reads
        # with the target snapshot's recorded schema (spec: snapshots carry
        # schema-id) — a pre-evolution snapshot keeps its pre-evolution
        # shape. Snapshots without a recorded schema-id (older shim writes,
        # external fixtures) fall back to the current schema.
        if ref is not None:
            if snapshot_id is not None or as_of_ms is not None:
                raise ValueError(
                    "ref cannot combine with snapshot_id/as_of_ms"
                )
            snapshot_id = self.resolve_ref(ref)
        if snapshot_id is not None or as_of_ms is not None:
            snap = self.snapshot_for(snapshot_id, as_of_ms)
            schema = self._schema_by_id(snap.get("schema-id"))
        else:
            schema = self._current_schema()
        if partition_filter:
            # naive timestamp literals must prune in the SAME zone the
            # row filter evaluates them (ADVICE r7: a non-UTC session
            # would otherwise compare shifted instants and drop files
            # holding matching rows) — bind it before ANY pruning runs,
            # manifest-level included
            from trino_private_spark.sources.iceberg_partition import (
                set_session_timezone,
            )

            try:
                set_session_timezone(
                    spark.conf.get("spark.sql.session.timeZone")
                )
            except Exception:
                pass  # unknown zone: keep the previous binding
        files = self.data_files(
            snapshot_id, as_of_ms, partition_filter=partition_filter,
            spark=spark,
        )
        # A data file can be listed by more than one manifest (ADDED once,
        # EXISTING after rewrites); keep one entry per path, max seq.
        by_path: dict[str, _DataFile] = {}
        for f in files:
            if f.content == 0:
                prev = by_path.get(f.path)
                if prev is None or f.sequence_number > prev.sequence_number:
                    by_path[f.path] = f
        # a snapshot with ZERO data files (OPTIMIZE after a full-table
        # DELETE, CTAS from an empty query) is a readable EMPTY table,
        # not an error — the fall-through below returns _empty_frame
        data = list(by_path.values())
        candidates = len(data)
        metrics_pruned = 0
        if partition_filter:
            from trino_private_spark.sources.iceberg_partition import (
                file_matches,
                metrics_match,
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
            # second pruning pass: per-file column metrics (min/max
            # bounds, null counts) — prunes on predicates over columns
            # the partition spec never mentions, the reference's
            # fileMatchesPredicate over the metrics domain
            sf = schema.get("fields", [])
            before = len(data)
            data = [
                f
                for f in data
                if metrics_match(
                    sf,
                    partition_filter,
                    dict(f.lower_bounds),
                    dict(f.upper_bounds),
                    dict(f.null_value_counts),
                    dict(f.value_counts),
                )
            ]
            metrics_pruned = before - len(data)
        self.last_scan = {
            # candidates count files of OPENED manifests only — files in
            # manifests skipped from their field_summaries were never
            # even enumerated (that is the point of manifest pruning)
            "candidate_data_files": candidates,
            "scanned_data_files": len(data),
            "pruned_data_files": candidates - len(data),
            "metrics_pruned_data_files": metrics_pruned,
            **getattr(self, "last_manifest_scan", {}),
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
            df = self._empty_frame(spark, schema)
            if with_lineage:
                df = df.withColumns(
                    {
                        "__file": F.lit(None).cast("string"),
                        "__pos": F.lit(None).cast("long"),
                    }
                )
            return df
        # Delete files carry the data file's ORIGINAL (possibly file:- or
        # file://-prefixed) path; _read_data normalizes the __file side
        # identically to the norm below.
        need_meta = with_lineage or bool(pos_del) or bool(eq_del)
        df = self._read_data(spark, data, schema, lineage=need_meta)
        if not pos_del and not eq_del:
            return df
        norm = lambda c: F.regexp_replace(c, "^file:/{0,2}/", "/")  # noqa: E731
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

    def _schema_by_id(self, schema_id: int | None) -> dict:
        """Schema for a recorded snapshot schema-id; current when absent."""
        if schema_id is not None:
            for s in self.metadata.get("schemas", []):
                if s.get("schema-id") == schema_id:
                    return s
        return self._current_schema()

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


def parse_partition_predicate(
    cond: str, backslash_escapes: bool = False
) -> list[tuple[str, str, object]]:
    """Extract prunable conjunctive terms from a SQL WHERE string —
    ``col op literal`` joined by AND (op in = != < <= > >=, IN (...),
    BETWEEN); literals: numbers, 'strings', DATE 'yyyy-mm-dd'. Anything
    else simply contributes no pruning term (never a wrong prune) — the
    reference derives its split-pruning domain from the query predicate
    the same conservative way (enforced vs unenforced constraint split).

    The predicate must be a PURE top-level conjunction: string literals
    are shielded first (an AND inside a 'literal' never splits), and any
    unparenthesized OR makes the whole predicate unprunable (returns []) —
    ``a = 1 AND b = 2 OR c = 3`` means ``(a AND b) OR c``, so rows
    matching only ``c = 3`` may live in files the a/b terms would prune.
    A parenthesized SAME-COLUMN disjunction of equalities/IN-lists
    (``(k = 1 OR k = 2)``) becomes an IN term — the reference prunes it
    as a TupleDomain union; any other parenthesized OR is skipped as a
    term while its sibling conjuncts still prune."""
    import re

    from trino_private_spark.plans.translate import (
        _shield_strings,
        strip_sql_comments,
    )

    # Engine.sql strips comments at statement entry, but this parser is
    # also reachable directly (read_iceberg(where=...), OPTIMIZE WHERE,
    # DELETE conditions) — a commented-out conjunct becoming a live
    # prune term silently drops rows, so the invariant is enforced HERE
    # too (idempotent; quoted regions are shielded by the stripper).
    # ``backslash_escapes`` (spark dialect): literals are lexed by
    # Spark's rule, and any literal CONTAINING a backslash contributes
    # no term at all — Spark's evaluator will collapse the escape to a
    # different character sequence than the raw token text, so pruning
    # on the raw text would drop the files holding the real value.
    cond = strip_sql_comments(cond, backslash_escapes=backslash_escapes)
    _str_lit = (
        r"'(?:\\.|''|[^'\\])*'" if backslash_escapes else r"'(?:[^']|'')*'"
    )

    def lit(tok: str):
        tok = tok.strip()
        m = re.fullmatch(r"DATE\s+'(\d{4}-\d{2}-\d{2})'", tok, re.I)
        if m:
            import datetime

            return datetime.date.fromisoformat(m.group(1))
        if re.fullmatch(_str_lit, tok):
            if backslash_escapes and "\\" in tok:
                raise ValueError(tok)  # escape-bearing: never prune
            return tok[1:-1].replace("''", "'")
        if re.fullmatch(r"-?\d+", tok):
            return int(tok)
        if re.fullmatch(r"-?\d+\.\d+", tok):
            return float(tok)
        raise ValueError(tok)

    shielded, restore = _shield_strings(
        cond, backslash_escapes=backslash_escapes
    )
    # col BETWEEN a AND b -> col >= a AND col <= b (literal operands only;
    # NOT BETWEEN is left alone and its fragments won't fullmatch below)
    _btw_lit = r"(?:DATE\s+)?(?:\x00\d+\x00|-?\d+(?:\.\d+)?)"
    shielded = re.sub(
        rf"\b(?!NOT\b)([A-Za-z_]\w*)\s+BETWEEN\s+({_btw_lit})\s+AND\s+({_btw_lit})",
        r"\1 >= \2 AND \1 <= \3",
        shielded,
        flags=re.I,
    )
    # split at depth-0 ANDs only; any depth-0 OR -> whole predicate is
    # disjunctive, nothing may prune
    terms: list[str] = []
    depth, start = 0, 0
    for m in re.finditer(r"[()]|\b(AND|OR)\b", shielded, flags=re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            if m.group(1).upper() == "OR":
                return []
            terms.append(shielded[start : m.start()])
            start = m.end()
    terms.append(shielded[start:])

    out: list[tuple[str, str, object]] = []
    for term in terms:
        term = restore(term).strip()
        # unwrap one balanced enclosing paren pair (never strip chars
        # blindly — that would eat an IN-list's closing paren)
        while (
            term.startswith("(")
            and term.endswith(")")
            and term.count("(") == term.count(")")
            and re.fullmatch(r"\([^()]*(?:\([^()]*\)[^()]*)*\)", term)
        ):
            term = term[1:-1].strip()
        # same-column parenthesized disjunction -> IN term (the reference
        # prunes (k = 1 OR k = 2) as a TupleDomain union); any disjunct
        # that is not `col = lit` / `col IN (lits)` over ONE shared column
        # disqualifies the whole term (conservative — it just never
        # prunes). Checked FIRST: the eq-regex's greedy literal would
        # otherwise swallow `k = 1 OR k = 2` whole and discard it.
        sh2, rs2 = _shield_strings(
            term, backslash_escapes=backslash_escapes
        )
        if re.search(r"\bOR\b", sh2, re.I):
            _or_term(term, out, lit, backslash_escapes)
            continue
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
            continue
        # IS [NOT] NULL — the reference prunes null domains from
        # contains_null summaries / null_value_counts (TupleDomain
        # onlyNull/notNull); transforms map null rows to null partition
        # values (spec), so the partition tuple decides exactly
        m = re.fullmatch(
            r"([A-Za-z_]\w*)\s+IS\s+(NOT\s+)?NULL", term, re.I
        )
        if m:
            out.append(
                (m.group(1), "notnull" if m.group(2) else "isnull", None)
            )
            continue
        # LIKE 'prefix%' (single trailing %, no other wildcards) — the
        # reference derives a [prefix, next(prefix)) range domain from
        # it (LikeFunctions / DomainTranslator prefix match); emitted as
        # a dedicated 'prefix' term so identity AND truncate[W]
        # partitions both prune. LIKE '%' degenerates to IS NOT NULL.
        # starts_with(col, 'p') is the same domain spelled as a function
        # (the reference's StartsWithFunction is domain-translatable).
        m_like = re.fullmatch(
            rf"([A-Za-z_]\w*)\s+LIKE\s+({_str_lit})", term, re.I
        )
        m_sw = None if m_like else re.fullmatch(
            rf"starts_?with\s*\(\s*([A-Za-z_]\w*)\s*,\s*({_str_lit})\s*\)",
            term,
            re.I,
        )
        m = m_like or m_sw
        if m:
            try:
                pat = lit(m.group(2))
            except ValueError:
                continue
            if not isinstance(pat, str):
                continue
            if m_like is not None:
                if not pat.endswith("%"):
                    continue
                prefix = pat[:-1]
                if "%" in prefix or "_" in prefix:
                    continue  # inner wildcards: no prunable range
            else:
                # starts_with literals are PLAIN strings — % and _ are
                # ordinary characters and the prefix range still holds
                prefix = pat
            if prefix:
                out.append((m.group(1), "prefix", prefix))
            else:
                out.append((m.group(1), "notnull", None))
            continue
    return out


def _or_term(
    term: str, out: list, lit, backslash_escapes: bool = False
) -> None:
    """parse_partition_predicate helper: fold a same-column disjunction
    of equalities/IN-lists into one IN term; anything else contributes
    nothing."""
    import re

    from trino_private_spark.plans.translate import _shield_strings

    sh2, rs2 = _shield_strings(term, backslash_escapes=backslash_escapes)
    parts, depth2, start2 = [], 0, 0
    for m2 in re.finditer(r"[()]|\bOR\b", sh2, re.I):
        tok = m2.group(0)
        if tok == "(":
            depth2 += 1
        elif tok == ")":
            depth2 -= 1
        elif depth2 == 0:
            parts.append(sh2[start2 : m2.start()])
            start2 = m2.end()
    parts.append(sh2[start2:])
    if len(parts) < 2:
        return
    col0, vals2 = None, []
    for p in parts:
        p = rs2(p).strip()
        me = re.fullmatch(r"([A-Za-z_]\w*)\s*=\s*([^()]+)", p)
        mi = re.fullmatch(r"([A-Za-z_]\w*)\s+IN\s*\(([^()]*)\)", p, re.I)
        try:
            if me:
                c, vs = me.group(1), [lit(me.group(2))]
            elif mi:
                c, vs = (
                    mi.group(1),
                    [lit(v) for v in mi.group(2).split(",")],
                )
            else:
                return
        except ValueError:
            return
        if col0 is None:
            col0 = c
        elif c.lower() != col0.lower():
            return
        vals2.extend(vs)
    if col0 is not None and vals2:
        out.append((col0, "in", vals2))


def parse_qualified_predicate(
    cond: str, backslash_escapes: bool = False
) -> dict[str | None, list[tuple[str, str, object]]]:
    """Split a WHERE body into per-qualifier prunable term lists — the
    alias-aware per-table conjunct extraction the reference performs in
    PushPredicateIntoTableScan -> ConnectorMetadata.applyFilter: a
    conjunct referencing exactly one alias (``a.k = 3``) contributes
    terms under key ``'a'``; a fully unqualified conjunct (``k = 3``)
    under key ``None``; a conjunct mixing qualifiers (``a.k = b.j``)
    contributes nothing. Any DEPTH-0 OR makes the whole body unprunable
    (``{}``) — its branches are alternatives, not conjuncts."""
    import re

    from trino_private_spark.plans.translate import (
        _shield_strings,
        strip_sql_comments,
    )

    cond = strip_sql_comments(  # see parse_partition_predicate
        cond, backslash_escapes=backslash_escapes
    )
    shielded, restore = _shield_strings(
        cond, backslash_escapes=backslash_escapes
    )
    # qualified BETWEEN -> two range conjuncts BEFORE the AND split (the
    # unqualified form is rewritten inside parse_partition_predicate)
    _btw_lit = r"(?:DATE\s+)?(?:\x00\d+\x00|-?\d+(?:\.\d+)?)"
    shielded = re.sub(
        rf"\b(?!NOT\b)([A-Za-z_]\w*\.[A-Za-z_]\w*)\s+BETWEEN\s+"
        rf"({_btw_lit})\s+AND\s+({_btw_lit})",
        r"\1 >= \2 AND \1 <= \3",
        shielded,
        flags=re.I,
    )
    conjuncts: list[str] = []
    depth, start = 0, 0
    for m in re.finditer(r"[()]|\b(AND|OR)\b", shielded, flags=re.I):
        tok = m.group(0)
        if tok == "(":
            depth += 1
        elif tok == ")":
            depth -= 1
        elif depth == 0:
            if m.group(1).upper() == "OR":
                return {}
            conjuncts.append(shielded[start : m.start()])
            start = m.end()
    conjuncts.append(shielded[start:])

    out: dict[str | None, list[tuple[str, str, object]]] = {}
    for c in conjuncts:
        quals = {
            q.lower()
            for q in re.findall(r"\b([A-Za-z_]\w*)\s*\.(?=[A-Za-z_])", c)
        }
        if len(quals) > 1:
            continue
        key = quals.pop() if quals else None
        body = restore(c)
        if key is not None:
            body = re.sub(
                rf"\b{re.escape(key)}\s*\.\s*", "", body, flags=re.I
            )
        terms = parse_partition_predicate(
            body, backslash_escapes=backslash_escapes
        )
        if terms:
            out.setdefault(key, []).extend(terms)
    return out


# --------------------------------------------------------------------------
# Metadata tables ("tbl$files" / "$partitions" / "$snapshots" / "$manifests"
# — the reference's Iceberg system tables, plugin/trino-iceberg
# FilesTable/PartitionTable/SnapshotsTable/ManifestsTable)
# --------------------------------------------------------------------------


_DDL_TO_ARROW = {
    "int": "int32", "long": "int64", "string": "string",
    "boolean": "bool", "double": "float64", "float": "float32",
}


def _rows_frame(spark: SparkSession, rows: list[tuple], schema: str):
    """``spark.createDataFrame`` for metadata-table row lists, routed
    through ONE pyarrow Table above 10k rows — the py4j row-pickling
    path costs ~6 s per 100k rows while Arrow costs ~1 s (measured,
    SCALE.md round 9), and $files/$entries carry one row per data file
    (10^5 at the target scale). Small lists keep the plain path; any
    Arrow conversion surprise falls back to it too."""
    if len(rows) < 10_000:
        # One partition, not defaultParallelism: createDataFrame(list)
        # parallelizes into 32 slices on local[32], and a downstream join
        # of two such frames becomes a 32x32=1024-task CartesianProduct
        # (p_iceberg_history_refs measured 38 s; 1.5 s after this).
        # Metadata tables under 10k rows are driver-resident by
        # construction, so a single slice is the right layout at any scale.
        return spark.createDataFrame(
            spark.sparkContext.parallelize(rows, 1) if rows else rows, schema
        )
    try:
        import pyarrow as pa

        names, types = [], []
        for part in schema.split(","):
            n, t = part.strip().rsplit(" ", 1)
            names.append(n.strip())
            types.append(getattr(pa, _DDL_TO_ARROW[t.strip().lower()])())
        tbl = pa.table(
            {
                n: pa.array([r[i] for r in rows], type=types[i])
                for i, n in enumerate(names)
            }
        )
        return spark.createDataFrame(tbl)
    except Exception:  # noqa: BLE001 — perf path only; plain is correct
        return spark.createDataFrame(rows, schema)


#: metadata-table suffixes served by _metadata_table (the reference's
#: plugin/trino-iceberg TableType.java enum, minus data/changelog)
_METADATA_TABLE_KINDS = frozenset(
    {
        "snapshots",
        "files",
        "partitions",
        "manifests",
        "history",
        "refs",
        "properties",
        "metadata_log_entries",
        "entries",
        "all_manifests",
    }
)


def _metadata_table(table: "IcebergTable", spark: SparkSession, kind: str):
    import json as _json

    k = kind.lstrip("$").lower()
    if k == "snapshots":
        # SnapshotsTable.java:53-58 shape — committed_at TIMESTAMP WITH
        # TIME ZONE, snapshot_id, parent_id, operation, manifest_list,
        # summary (the spec's summary map, rendered as sorted JSON so
        # added-*/total-* metrics are queryable via get_json_object);
        # sequence_number trails as an extension column
        import datetime as _dt

        rows = [
            (
                _dt.datetime.fromtimestamp(
                    s["timestamp-ms"] / 1000.0, tz=_dt.timezone.utc
                ),
                s["snapshot-id"],
                s.get("parent-snapshot-id"),
                (s.get("summary") or {}).get("operation", ""),
                _local(s["manifest-list"]),
                _json.dumps(s.get("summary") or {}, sort_keys=True),
                int(s.get("sequence-number") or 0),
            )
            for s in table.snapshots()
        ]
        return _rows_frame(
            spark,
            rows,
            "committed_at timestamp, snapshot_id long, parent_id long, "
            "operation string, manifest_list string, summary string, "
            "sequence_number long",
        )
    if k == "manifests":
        # ManifestsTable.java shape incl. the partition_summaries column
        # (field_summary per spec field: contains_null + readable bounds)
        from trino_private_spark.sources.iceberg_partition import (
            deserialize_single_value,
            partition_value_type,
        )

        specs = {
            s.get("spec-id", 0): s.get("fields", [])
            for s in table.metadata.get("partition-specs", [])
        }
        types_by_id = {
            fld["id"]: fld["type"]
            for fld in table._current_schema().get("fields", [])  # noqa: SLF001
            if isinstance(fld.get("type"), str)
        }

        def jsummaries(m) -> str | None:
            parts = m.get("partitions")
            if not parts:
                return None
            sf = specs.get(int(m.get("partition_spec_id") or 0), [])
            out = []
            for i, s in enumerate(parts):
                e: dict = {"contains_null": bool(s.get("contains_null"))}
                if i < len(sf):
                    vt = partition_value_type(
                        sf[i].get("transform", "identity"),
                        types_by_id.get(sf[i].get("source-id"), ""),
                    )
                    for key in ("lower_bound", "upper_bound"):
                        b = s.get(key)
                        if b is None:
                            continue
                        try:
                            v = deserialize_single_value(vt, b)
                        except (TypeError, ValueError):
                            continue
                        e[key] = (
                            v if isinstance(v, (int, float, bool)) else str(v)
                        )
                out.append(e)
            return _json.dumps(out, sort_keys=True)

        snap = table.current_snapshot()
        rows = [
            (
                _local(m["manifest_path"]),
                int(m.get("manifest_length") or 0),
                int(m.get("partition_spec_id") or 0),
                int(m.get("content") or 0),
                int(m.get("sequence_number") or 0),
                int(m.get("added_snapshot_id") or 0),
                jsummaries(m),
            )
            for m in read_avro_container_cached(_local(snap["manifest-list"]))
        ]
        return _rows_frame(
            spark,
            rows,
            "path string, length long, partition_spec_id int, content int, "
            "sequence_number long, added_snapshot_id long, "
            "partition_summaries string",
        )
    if k == "entries":
        # EntriesTable shape (manifest_entry verbatim, data_file
        # flattened to its headline columns): every entry of the CURRENT
        # snapshot's manifests INCLUDING status-2 deletions — this is
        # the raw planning view $files post-filters
        snap = table.current_snapshot()
        rows = []
        if snap is not None:
            for m in read_avro_container_cached(_local(snap["manifest-list"])):
                m_seq = int(m.get("sequence_number") or 0)
                for e in read_avro_container_cached(_local(m["manifest_path"])):
                    status = int(e.get("status") or 0)
                    seq = e.get("sequence_number")
                    if seq is None:
                        seq = m_seq if status == 1 else 0
                    df_ = e.get("data_file") or {}
                    part = df_.get("partition")
                    rows.append(
                        (
                            status,
                            e.get("snapshot_id"),
                            int(seq),
                            int(df_.get("content") or 0),
                            _local(df_.get("file_path") or ""),
                            str(df_.get("file_format") or "PARQUET").upper(),
                            int(df_.get("record_count") or 0),
                            int(df_.get("file_size_in_bytes") or 0),
                            _json.dumps(part) if isinstance(part, dict) else None,
                        )
                    )
        return _rows_frame(
            spark,
            rows,
            "status int, snapshot_id long, sequence_number long, "
            "content int, file_path string, file_format string, "
            "record_count long, file_size_in_bytes long, partition string",
        )
    if k == "all_manifests":
        # AllManifestsTable: the $manifests shape unioned over EVERY
        # snapshot, each row tagged with the snapshot that references it
        rows = []
        for s in table.snapshots():
            ml = _local(s["manifest-list"])
            if not os.path.exists(ml):
                continue  # expired manifest list
            for m in read_avro_container_cached(ml):
                rows.append(
                    (
                        _local(m["manifest_path"]),
                        int(m.get("manifest_length") or 0),
                        int(m.get("partition_spec_id") or 0),
                        int(m.get("content") or 0),
                        int(m.get("sequence_number") or 0),
                        int(m.get("added_snapshot_id") or 0),
                        s["snapshot-id"],
                    )
                )
        return _rows_frame(
            spark,
            rows,
            "path string, length long, partition_spec_id int, "
            "content int, sequence_number long, added_snapshot_id long, "
            "reference_snapshot_id long",
        )
    files = table.data_files()
    if k == "files":
        # FilesTable shape incl. the column-metrics maps; bounds render
        # READABLY (deserialized via the schema's field types, keyed by
        # field id) — the reference's readable_metrics discipline
        from trino_private_spark.sources.iceberg_partition import (
            deserialize_single_value,
        )

        types_by_id = {
            fld["id"]: fld["type"]
            for fld in table._current_schema().get("fields", [])  # noqa: SLF001
            if isinstance(fld.get("type"), str)
        }

        def jmap(pairs) -> str | None:
            return (
                _json.dumps({str(i): v for i, v in pairs}, sort_keys=True)
                if pairs
                else None
            )

        def jbounds(pairs) -> str | None:
            out = {}
            for i, b in pairs:
                t = types_by_id.get(i)
                if t is None:
                    continue
                try:
                    v = deserialize_single_value(t, b)
                except (TypeError, ValueError):
                    continue
                out[str(i)] = v if isinstance(v, (int, float, bool)) else str(v)
            return _json.dumps(out, sort_keys=True) if out else None

        rows = [
            (
                f.content,
                f.path,
                f.file_format,
                f.record_count,
                f.file_size_in_bytes,
                _json.dumps(dict(f.partition)) if f.partition else None,
                f.sequence_number,
                jmap(f.value_counts),
                jmap(f.null_value_counts),
                jbounds(f.lower_bounds),
                jbounds(f.upper_bounds),
            )
            for f in files
        ]
        return _rows_frame(
            spark,
            rows,
            "content int, file_path string, file_format string, "
            "record_count long, file_size_in_bytes long, partition string, "
            "sequence_number long, value_counts string, "
            "null_value_counts string, lower_bounds string, "
            "upper_bounds string",
        )
    if k == "history":
        # HistoryTable.java: made_current_at, snapshot_id, parent_id,
        # is_current_ancestor. Ancestry walks parent-snapshot-id pointers
        # from the current snapshot; snapshots without parent info (older
        # shim writes) fall back to list-order ancestry (this writer's
        # history is linear, so list order IS the ancestry chain).
        snaps = table.snapshots()
        by_id = {s["snapshot-id"]: s for s in snaps}
        cur = table.metadata.get("current-snapshot-id", -1)
        ancestors: set[int] = set()
        if all("parent-snapshot-id" in s for s in snaps):
            walk = cur
            while walk in by_id:
                ancestors.add(walk)
                walk = by_id[walk].get("parent-snapshot-id")
        else:
            for s in snaps:
                ancestors.add(s["snapshot-id"])
                if s["snapshot-id"] == cur:
                    break
        rows = [
            (
                s["timestamp-ms"],
                s["snapshot-id"],
                s.get("parent-snapshot-id"),
                s["snapshot-id"] in ancestors,
            )
            for s in snaps
        ]
        return _rows_frame(
            spark,
            rows,
            "made_current_at_ms long, snapshot_id long, parent_id long, "
            "is_current_ancestor boolean",
        )
    if k == "refs":
        # RefsTable.java six-column shape; metadata 'refs' map when present,
        # else the implicit main branch at the current snapshot.
        refs = table.metadata.get("refs") or {}
        if not refs:
            cur = table.current_snapshot()
            if cur is not None:
                refs = {"main": {"snapshot-id": cur["snapshot-id"], "type": "branch"}}
        rows = [
            (
                name,
                str(r.get("type", "branch")).upper(),
                r.get("snapshot-id"),
                r.get("max-ref-age-ms"),
                r.get("min-snapshots-to-keep"),
                r.get("max-snapshot-age-ms"),
            )
            for name, r in sorted(refs.items())
        ]
        return _rows_frame(
            spark,
            rows,
            "name string, type string, snapshot_id long, "
            "max_reference_age_in_ms long, min_snapshots_to_keep int, "
            "max_snapshot_age_in_ms long",
        )
    if k == "properties":
        props = table.metadata.get("properties") or {}
        rows = [(str(pk), str(pv)) for pk, pv in sorted(props.items())]
        return spark.createDataFrame(rows, "key string, value string")
    if k == "metadata_log_entries":
        # MetadataLogEntriesTable.java shape: every previous metadata
        # file (spec "metadata-log", oldest first) plus the current one,
        # each with the snapshot/schema ids current AT that version
        entries = list(table.metadata.get("metadata-log") or [])
        rows = []
        for e in entries:
            mf = _local(str(e.get("metadata-file", "")))
            snap_id = schema_id = None
            try:
                with open(mf) as fh:
                    old = _json.load(fh)
                snap_id = old.get("current-snapshot-id")
                if snap_id == -1:
                    snap_id = None
                schema_id = old.get("current-schema-id")
            except (OSError, ValueError):
                pass  # expired/moved metadata version: ids unknown
            rows.append(
                (int(e.get("timestamp-ms") or 0), mf, snap_id, schema_id)
            )
        cur = table.current_snapshot()
        rows.append(
            (
                int(table.metadata.get("last-updated-ms") or 0),
                "(current)",
                cur["snapshot-id"] if cur else None,
                table.metadata.get("current-schema-id"),
            )
        )
        return _rows_frame(
            spark,
            rows,
            "timestamp_ms long, file string, latest_snapshot_id long, "
            "latest_schema_id int",
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
        return _rows_frame(
            spark,
            rows,
            "partition string, file_count long, record_count long, "
            "total_size long",
        )
    raise ValueError(f"unknown Iceberg metadata table {kind!r}")


#: constructed read DataFrames keyed by (metadata version identity,
#: session, snapshot selector, canonical prune terms). A DataFrame is
#: an immutable logical plan and a residual-free read is a pure
#: function of the key, so reuse is safe; any commit bumps the version
#: and naturally misses the cache. Lineage reads (DELETE/UPDATE
#: planning) go through IcebergTable.read directly and never hit this.
#: This is what keeps per-STATEMENT latency flat vs file count:
#: _reprune_iceberg_views re-resolves every referenced Iceberg view on
#: every sql() call, and rebuilding spark.read.parquet(<10^5 paths>) +
#: merge-on-read joins per statement is seconds of driver/JVM work the
#: reference avoids by caching the loaded table per query
#: (IcebergMetadata). Measured in examples/statement_latency_bench.py.
_READ_DF_CACHE: "_OrderedDict[tuple, tuple]" = _OrderedDict()
_READ_DF_CACHE_MAX = 64


def read_iceberg(
    spark: SparkSession,
    location: str,
    snapshot_id: int | None = None,
    as_of_ms: int | None = None,
    partition_filter: list[tuple[str, str, object]] | None = None,
    where: str | None = None,
    ref: str | None = None,
) -> DataFrame:
    """Read an Iceberg v2 table (optionally time-traveled — by snapshot
    id, timestamp, or a named branch/tag ``ref`` — optionally
    manifest-partition-pruned). ``where`` is a SQL predicate string that
    BOTH prunes (prunable conjunctive terms derived via
    parse_partition_predicate) AND applies row-level — the way the
    reference splits a pushed-down predicate into enforced partition
    constraints and a residual filter. A ``location$snapshots`` /
    ``$files`` / ``$partitions`` / ``$manifests`` suffix returns the
    corresponding metadata table."""
    if "$" in location:
        loc, _, kind = location.rpartition("$")
        # Only a KNOWN metadata-table suffix routes to _metadata_table — a
        # legitimate path containing '$' (shell-expanded dirs, temp names)
        # must stay a plain table path.
        if kind.lower() in _METADATA_TABLE_KINDS:
            return _metadata_table(IcebergTable(loc), spark, kind)
    pf = list(partition_filter or [])
    if where:
        # the residual is evaluated by df.where(...) — Spark's parser,
        # which processes backslash escapes — so the prune-term parse
        # must lex the SAME way or an escape-bearing literal prunes on
        # its raw text while the row filter matches the decoded value
        pf.extend(parse_partition_predicate(where, backslash_escapes=True))
    # Constructed-read cache, keyed by (metadata version identity,
    # session, snapshot selector, canonical prune terms). Every read
    # that applies no row-level residual is a pure function of the key
    # — full current reads, per-statement PRUNED reads (__icep_* views
    # on repeat dashboard statements), and time travel alike. The
    # cached scan-planning counts re-publish so EXPLAIN (TYPE IO)
    # stays attributable even after another read of the same table
    # overwrote IO_SCAN_INFO. A `where` residual still reuses the
    # cached pruned base and wraps it fresh.
    table = IcebergTable(location)
    try:
        pf_key = tuple(
            sorted(
                (c, op, tuple(v) if isinstance(v, list) else v)
                for c, op, v in pf
            )
        )
    except TypeError:
        pf_key = None  # unhashable/unorderable literal: skip the cache
    key = (
        (table.metadata_key, id(spark), snapshot_id, as_of_ms, ref, pf_key)
        if pf_key is not None
        else None
    )
    if key is not None:
        hit = _READ_DF_CACHE.get(key)
        if hit is not None:
            _READ_DF_CACHE.move_to_end(key)
            df, scan = hit
            IO_SCAN_INFO[_local(location)] = dict(scan)
            return df.where(where) if where else df
    df = table.read(
        spark, snapshot_id, as_of_ms, partition_filter=pf or None, ref=ref
    )
    if key is not None:
        _READ_DF_CACHE[key] = (df, dict(table.last_scan))
        if len(_READ_DF_CACHE) > _READ_DF_CACHE_MAX:
            _READ_DF_CACHE.popitem(last=False)
    return df.where(where) if where else df
