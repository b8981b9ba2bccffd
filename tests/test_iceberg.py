"""Iceberg v2 read shim (sources/iceberg.py) against hand-built real
metadata trees (builder: sources/iceberg_testing.py).

Reference parity targets: plugin/trino-iceberg IcebergMetadata (snapshot
resolution / time travel), IcebergSplitSource (manifest-driven file
enumeration), iceberg-core DeleteFileIndex (sequence-number scoping of
position/equality deletes)."""

from __future__ import annotations

import os

import pytest

from trino_private_spark.sources.iceberg import (
    IcebergTable,
    read_avro_container,
    read_iceberg,
    write_avro_container,
)
from trino_private_spark.sources.iceberg_testing import (
    MANIFEST_ENTRY_SCHEMA,
    build_table,
    write_parquet_with_ids,
)

FIELDS = [(1, "id", "long"), (2, "name", "string")]
IDS = {"id": 1, "name": 2}
POS_DEL_IDS = {"file_path": 2147483546, "pos": 2147483545}


def _data_file(loc, fname, ids, names):
    path = os.path.join(loc, fname)
    write_parquet_with_ids(path, {"id": ids, "name": names}, IDS)
    return path


def _pos_delete(loc, fname, targets):
    """targets: list of (data_file_path, position)."""
    path = os.path.join(loc, fname)
    write_parquet_with_ids(
        path,
        {
            "file_path": [t[0] for t in targets],
            "pos": [t[1] for t in targets],
        },
        POS_DEL_IDS,
    )
    return path


def _ids(df):
    return sorted(r["id"] for r in df.collect())


class TestBasicRead:
    def test_two_data_files(self, spark, tmp_path):
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2, 3], ["a", "b", "c"])
        d2 = _data_file(loc, "d2.parquet", [4, 5], ["d", "e"])
        build_table(
            loc,
            FIELDS,
            [{"id": 10, "ts": 1000, "seq": 1,
              "files": [{"path": d1}, {"path": d2}]}],
        )
        df = read_iceberg(spark, loc)
        assert _ids(df) == [1, 2, 3, 4, 5]
        assert df.columns == ["id", "name"]

    def test_deflate_manifests(self, spark, tmp_path):
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2], ["a", "b"])
        build_table(
            loc, FIELDS,
            [{"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]}],
            manifest_codec="deflate",
        )
        assert _ids(read_iceberg(spark, loc)) == [1, 2]

    def test_file_uri_single_slash_paths(self, spark, tmp_path):
        # Java URI.toString() emits 'file:/tmp/...' — all metadata paths
        # (manifest list, manifests, data files) use that spelling here.
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [7, 8], ["x", "y"])
        build_table(
            loc, FIELDS,
            [{"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]}],
            path_prefix="file:/",
        )
        assert _ids(read_iceberg(spark, loc)) == [7, 8]

    def test_snappy_manifest_rejected_clearly(self, spark, tmp_path):
        loc = str(tmp_path / "m.avro")
        write_avro_container(loc, MANIFEST_ENTRY_SCHEMA, [])
        # patch the codec bytes in the header map: rewrite with codec label
        raw = open(loc, "rb").read().replace(b"\x08null", b"\x0csnappy", 1)
        with open(loc, "wb") as fh:
            fh.write(raw)
        with pytest.raises(ValueError, match="snappy"):
            read_avro_container(loc)


class TestMetadataResolution:
    def test_version_hint(self, spark, tmp_path):
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1], ["a"])
        build_table(
            loc, FIELDS,
            [{"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]}],
            version=3, version_hint=True,
        )
        assert _ids(read_iceberg(spark, loc)) == [1]

    def test_numeric_version_sort_beyond_v9(self, spark, tmp_path):
        # v10+ sorts BEFORE v9 lexicographically; the latest metadata must
        # be chosen numerically (no version-hint present).
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1], ["a"])
        d2 = _data_file(loc, "d2.parquet", [2], ["b"])
        snap1 = {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]}
        snap2 = {"id": 11, "ts": 2000, "seq": 2, "files": [{"path": d2}]}
        build_table(loc, FIELDS, [snap1], version=9)
        build_table(loc, FIELDS, [snap1, snap2], version=12)
        assert _ids(read_iceberg(spark, loc)) == [1, 2]


class TestTimeTravel:
    def _table(self, tmp_path):
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2], ["a", "b"])
        d2 = _data_file(loc, "d2.parquet", [3], ["c"])
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
                {"id": 11, "ts": 2000, "seq": 2, "files": [{"path": d2}]},
            ],
        )
        return loc

    def test_snapshot_id(self, spark, tmp_path):
        loc = self._table(tmp_path)
        assert _ids(read_iceberg(spark, loc, snapshot_id=10)) == [1, 2]
        assert _ids(read_iceberg(spark, loc)) == [1, 2, 3]

    def test_timestamp(self, spark, tmp_path):
        loc = self._table(tmp_path)
        assert _ids(read_iceberg(spark, loc, as_of_ms=1500)) == [1, 2]
        assert _ids(read_iceberg(spark, loc, as_of_ms=2500)) == [1, 2, 3]
        with pytest.raises(KeyError):
            IcebergTable(loc).snapshot_for(as_of_ms=500)
        with pytest.raises(KeyError):
            IcebergTable(loc).snapshot_for(snapshot_id=99)


class TestDeletes:
    def test_position_deletes(self, spark, tmp_path):
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2, 3, 4], list("abcd"))
        pd1 = _pos_delete(loc, "pd1.parquet", [(d1, 0), (d1, 2)])
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
                {"id": 11, "ts": 2000, "seq": 2,
                 "files": [{"path": pd1, "content": 1}]},
            ],
        )
        assert _ids(read_iceberg(spark, loc)) == [2, 4]

    def test_position_delete_not_applied_to_newer_file(self, spark, tmp_path):
        # Spec: a position delete applies only to data files with
        # data seq <= delete seq. A delete (seq 2) naming a path that was
        # later rewritten at seq 3 must leave the new file intact.
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2], ["a", "b"])
        pd1 = _pos_delete(loc, "pd1.parquet", [(d1, 0)])
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 2,
                 "files": [{"path": pd1, "content": 1}]},
                {"id": 11, "ts": 2000, "seq": 3, "files": [{"path": d1}]},
            ],
        )
        assert _ids(read_iceberg(spark, loc)) == [1, 2]

    def test_equality_deletes(self, spark, tmp_path):
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2, 3], ["a", "b", "c"])
        ed = os.path.join(loc, "ed.parquet")
        write_parquet_with_ids(ed, {"id": [2]}, {"id": 1})
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
                {"id": 11, "ts": 2000, "seq": 2,
                 "files": [{"path": ed, "content": 2, "equality_ids": [1]}]},
            ],
        )
        assert _ids(read_iceberg(spark, loc)) == [1, 3]

    def test_equality_delete_cdc_reinsert_survives(self, spark, tmp_path):
        # The ADVICE-flagged bug: delete id=2 at seq 2, re-insert id=2 at
        # seq 3 (CDC upsert). The equality delete applies only to files with
        # seq STRICTLY below 2 — the re-inserted row must survive.
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2, 3], ["a", "b", "c"])
        ed = os.path.join(loc, "ed.parquet")
        write_parquet_with_ids(ed, {"id": [2]}, {"id": 1})
        d2 = _data_file(loc, "d2.parquet", [2], ["b2"])
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
                {"id": 11, "ts": 2000, "seq": 2,
                 "files": [{"path": ed, "content": 2, "equality_ids": [1]}]},
                {"id": 12, "ts": 3000, "seq": 3, "files": [{"path": d2}]},
            ],
        )
        df = read_iceberg(spark, loc)
        assert _ids(df) == [1, 2, 3]
        assert sorted(r["name"] for r in df.collect()) == ["a", "b2", "c"]
        # time travel to before the re-insert: delete IS in effect
        assert _ids(read_iceberg(spark, loc, snapshot_id=11)) == [1, 3]

    def test_equality_delete_after_column_rename(self, spark, tmp_path):
        # Delete file and data predate a rename of the equality column;
        # ids are stable, names in the files are the OLD ones. The shim must
        # resolve by field id (per-file parquet metadata), not current name.
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2, 3], ["a", "b", "c"])
        ed = os.path.join(loc, "ed.parquet")
        write_parquet_with_ids(ed, {"id": [3]}, {"id": 1})
        schemas = [
            {"type": "struct", "schema-id": 1, "fields": [
                {"id": 1, "name": "row_id", "required": False, "type": "long"},
                {"id": 2, "name": "name", "required": False, "type": "string"},
            ]},
        ]
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
                {"id": 11, "ts": 2000, "seq": 2,
                 "files": [{"path": ed, "content": 2, "equality_ids": [1]}]},
            ],
            schemas=schemas, current_schema_id=1,
        )
        assert _ids(read_iceberg(spark, loc)) == [1, 2]

    def test_nested_equality_ids_rejected(self, spark, tmp_path):
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1], ["a"])
        ed = os.path.join(loc, "ed.parquet")
        write_parquet_with_ids(ed, {"id": [1]}, {"id": 1})
        schemas = [
            {"type": "struct", "schema-id": 0, "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "s", "required": False, "type": {
                    "type": "struct", "fields": [
                        {"id": 3, "name": "inner", "required": False,
                         "type": "string"},
                    ]}},
            ]},
        ]
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
                {"id": 11, "ts": 2000, "seq": 2,
                 "files": [{"path": ed, "content": 2, "equality_ids": [3]}]},
            ],
            schemas=schemas,
        )
        with pytest.raises(NotImplementedError, match="nested"):
            read_iceberg(spark, loc)

    def test_mixed_position_and_equality(self, spark, tmp_path):
        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2, 3, 4, 5], list("abcde"))
        pd1 = _pos_delete(loc, "pd1.parquet", [(d1, 4)])  # id=5
        ed = os.path.join(loc, "ed.parquet")
        write_parquet_with_ids(ed, {"id": [2]}, {"id": 1})
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
                {"id": 11, "ts": 2000, "seq": 2, "files": [
                    {"path": pd1, "content": 1},
                    {"path": ed, "content": 2, "equality_ids": [1]},
                ]},
            ],
        )
        assert _ids(read_iceberg(spark, loc)) == [1, 3, 4]

    def test_equality_delete_null_key(self, spark, tmp_path):
        # Spec: equality deletes treat NULL as equal to NULL — a delete row
        # with NULL in an optional equality field must delete data rows
        # whose field is NULL (join must be null-safe, not plain equality).
        loc = str(tmp_path)
        d1 = os.path.join(loc, "d1.parquet")
        write_parquet_with_ids(
            d1, {"id": [1, 2, 3], "name": ["a", None, "c"]}, IDS
        )
        ed = os.path.join(loc, "ed.parquet")
        write_parquet_with_ids(ed, {"name": [None]}, {"name": 2})
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
                {"id": 11, "ts": 2000, "seq": 2,
                 "files": [{"path": ed, "content": 2, "equality_ids": [2]}]},
            ],
        )
        assert _ids(read_iceberg(spark, loc)) == [1, 3]

    def test_equality_delete_multi_column_null_key(self, spark, tmp_path):
        # multi-column equality ids where one key column is NULL
        loc = str(tmp_path)
        d1 = os.path.join(loc, "d1.parquet")
        write_parquet_with_ids(
            d1, {"id": [1, 1, 2], "name": [None, "x", None]}, IDS
        )
        ed = os.path.join(loc, "ed.parquet")
        write_parquet_with_ids(ed, {"id": [1], "name": [None]}, IDS)
        build_table(
            loc, FIELDS,
            [
                {"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]},
                {"id": 11, "ts": 2000, "seq": 2,
                 "files": [{"path": ed, "content": 2, "equality_ids": [1, 2]}]},
            ],
        )
        df = read_iceberg(spark, loc)
        rows = sorted((r["id"], r["name"]) for r in df.collect())
        assert rows == [(1, "x"), (2, None)]


class TestExplainIO:
    def test_iceberg_read_reports_table(self, spark, tmp_path):
        """EXPLAIN (TYPE IO) attributes a composed Iceberg read's parquet
        leaves to the Iceberg TABLE root (the way IoPlanPrinter names the
        connector table, not raw files)."""
        import json

        from trino_private_spark.plans.explain import explain_typed

        loc = str(tmp_path)
        d1 = _data_file(loc, "d1.parquet", [1, 2, 3], ["a", "b", "c"])
        build_table(
            loc, FIELDS,
            [{"id": 10, "ts": 1000, "seq": 1, "files": [{"path": d1}]}],
        )
        df = read_iceberg(spark, loc).where("id > 1")
        io = json.loads(explain_typed(df, "IO"))
        assert any(
            e.get("format") == "iceberg" and e.get("table") == loc
            for e in io["inputTableInfos"]
        ), io


class TestWritePath:
    """CTAS / INSERT / DELETE emitting real Iceberg v2 metadata
    (sources/iceberg_write.py; reference IcebergMetadata.java:397,418,611)
    read back through the shim, including time travel across commits."""

    def test_create_and_read_back(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import iceberg_create

        loc = str(tmp_path / "t1")
        df = spark.range(10).selectExpr(
            "id", "CAST(id * 2 AS DOUBLE) AS dbl", "CONCAT('v', id) AS s"
        )
        iceberg_create(df, loc)
        back = read_iceberg(spark, loc)
        assert sorted(r["id"] for r in back.collect()) == list(range(10))
        assert set(back.columns) == {"id", "dbl", "s"}
        # data files carry Iceberg field ids
        import glob

        import pyarrow.parquet as pq

        f = glob.glob(f"{loc}/data/*.parquet")[0]
        ids = {
            fld.name: fld.metadata[b"PARQUET:field_id"]
            for fld in pq.read_schema(f)
        }
        assert ids["id"] == b"1" and ids["s"] == b"3"

    def test_append_and_time_travel(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import (
            iceberg_append,
            iceberg_create,
        )

        loc = str(tmp_path / "t2")
        iceberg_create(spark.range(5).selectExpr("id"), loc)
        iceberg_append(spark.range(5, 8).selectExpr("id"), loc)
        t = IcebergTable(loc)
        snaps = t.snapshots()
        assert len(snaps) == 2
        assert _ids(read_iceberg(spark, loc)) == list(range(8))
        assert _ids(
            read_iceberg(spark, loc, snapshot_id=snaps[0]["snapshot-id"])
        ) == list(range(5))

    def test_append_schema_mismatch_rejected(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import (
            iceberg_append,
            iceberg_create,
        )

        loc = str(tmp_path / "t3")
        iceberg_create(spark.range(2).selectExpr("id"), loc)
        with pytest.raises(ValueError, match="not in table schema"):
            iceberg_append(
                spark.range(2).selectExpr("id", "id AS extra"), loc
            )

    def test_delete_where_and_history(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import (
            iceberg_create,
            iceberg_delete,
        )

        loc = str(tmp_path / "t4")
        iceberg_create(spark.range(10).selectExpr("id"), loc)
        n = iceberg_delete(spark, loc, "id % 2 = 0")
        assert n == 5
        assert _ids(read_iceberg(spark, loc)) == [1, 3, 5, 7, 9]
        # pre-delete snapshot still reads in full (snapshot isolation)
        first = IcebergTable(loc).snapshots()[0]["snapshot-id"]
        assert _ids(read_iceberg(spark, loc, snapshot_id=first)) == list(
            range(10)
        )
        # delete nothing -> no new snapshot
        assert iceberg_delete(spark, loc, "id > 100") == 0
        assert len(IcebergTable(loc).snapshots()) == 2

    def test_delete_then_reinsert_cdc(self, spark, tmp_path):
        # append AFTER a delete: re-inserted values survive (the delete's
        # sequence number scopes it to older files only)
        from trino_private_spark.sources.iceberg_write import (
            iceberg_append,
            iceberg_create,
            iceberg_delete,
        )

        loc = str(tmp_path / "t5")
        iceberg_create(spark.range(4).selectExpr("id"), loc)
        iceberg_delete(spark, loc, "id = 2")
        iceberg_append(spark.createDataFrame([(2,)], "id long"), loc)
        assert _ids(read_iceberg(spark, loc)) == [0, 1, 2, 3]

    def test_create_existing_rejected(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import iceberg_create

        loc = str(tmp_path / "t6")
        iceberg_create(spark.range(1).selectExpr("id"), loc)
        with pytest.raises(ValueError, match="already exists"):
            iceberg_create(spark.range(1).selectExpr("id"), loc)


def test_iceberg_update_roundtrip(spark, tmp_path):
    """UPDATE = position-delete originals + append new versions; the
    pre-update snapshot still time-travels to the old values."""
    from trino_private_spark.sources.iceberg import read_iceberg
    from trino_private_spark.sources.iceberg_write import (
        iceberg_create,
        iceberg_update,
    )

    loc = str(tmp_path / "upd_t")
    iceberg_create(
        spark.range(6).selectExpr("id", "id * 10 AS v"), loc
    )
    n = iceberg_update(spark, loc, {"v": "v + 1"}, "id >= 4")
    assert n == 2
    got = {r.id: r.v for r in read_iceberg(spark, loc).collect()}
    assert got == {0: 0, 1: 10, 2: 20, 3: 30, 4: 41, 5: 51}
    # snapshot 1 (the create) still shows the original values
    old = {
        r.id: r.v
        for r in read_iceberg(spark, loc, snapshot_id=1).collect()
    }
    assert old == {i: i * 10 for i in range(6)}
    # no-match update is a no-op (no empty snapshots committed)
    assert iceberg_update(spark, loc, {"v": "0"}, "id > 99") == 0
    assert {r.id: r.v for r in read_iceberg(spark, loc).collect()} == got


class TestManifestCaches:
    """Cache-key semantics of the metadata plane (sources/iceberg.py):
    the constructed-_DataFile cache must key on the manifest-list
    CONTEXT (sequence number, spec id) — the same manifest file listed
    under a different inherited seq is a different plan — and the
    distributed prefetch must respect its byte gate."""

    def test_datafile_cache_keys_on_manifest_context(self, spark, tmp_path):
        from pyspark.sql import functions as F

        import trino_private_spark.sources.iceberg as ice
        from trino_private_spark.sources.iceberg import (
            IcebergTable,
            _manifest_datafiles,
        )
        from trino_private_spark.sources.iceberg_write import iceberg_create

        loc = str(tmp_path / "t")
        iceberg_create(
            spark.range(0, 10).select(F.col("id").alias("k")), loc
        )
        t = IcebergTable(loc)
        snap = t.current_snapshot()
        ml = ice.read_avro_container_cached(
            ice._local(snap["manifest-list"])
        )
        mp = ice._local(ml[0]["manifest_path"])
        a = _manifest_datafiles(mp, 1, 0)
        b = _manifest_datafiles(mp, 7, 0)  # different inherited seq
        assert a is not b
        assert {f.sequence_number for f in a} == {1}
        assert {f.sequence_number for f in b} == {7}
        # same context -> the SAME immutable tuple back (cache hit)
        assert _manifest_datafiles(mp, 1, 0) is a

    def test_prefetch_respects_byte_gate(self, spark, tmp_path):
        from pyspark.sql import functions as F

        import trino_private_spark.sources.iceberg as ice
        from trino_private_spark.sources.iceberg import (
            IcebergTable,
            prefetch_manifests,
        )
        from trino_private_spark.sources.iceberg_write import iceberg_create

        loc = str(tmp_path / "t")
        iceberg_create(
            spark.range(0, 10).select(F.col("id").alias("k")), loc
        )
        t = IcebergTable(loc)
        ml = ice.read_avro_container_cached(
            ice._local(t.current_snapshot()["manifest-list"])
        )
        paths = [ice._local(m["manifest_path"]) for m in ml]
        ice._AVRO_CACHE.clear()
        # tiny manifests sit far below the default gate: no job runs
        assert prefetch_manifests(spark, paths) == 0
        assert len(ice._AVRO_CACHE) == 0
        # forcing the gate to zero fetches them distributed
        assert prefetch_manifests(spark, paths, min_bytes=0) == len(paths)
        assert len(ice._AVRO_CACHE) == len(paths)
