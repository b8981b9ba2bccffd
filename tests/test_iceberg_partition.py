"""Iceberg partition specs, transforms, manifest-level pruning, ORC data
files, and the atomic RowDelta UPDATE (sources/iceberg_partition.py +
iceberg_write.py).

Reference parity: split pruning from manifest partition data
(plugin/trino-iceberg/.../IcebergSplitSource.java; specs via
PartitionSpecParser), transforms per the Iceberg spec's "Partition
Transforms" appendix (hash test vectors from spec Appendix B).
"""

from __future__ import annotations

import datetime
import decimal
import os

import pytest
from pyspark.sql import functions as F

from trino_private_spark.sources.iceberg import IcebergTable
from trino_private_spark.sources.iceberg_partition import (
    bucket_hash,
    file_matches,
    murmur3_x86_32,
    parse_specs,
    transform_value,
)
from trino_private_spark.sources.iceberg_write import (
    iceberg_append,
    iceberg_create,
    iceberg_update,
)


class TestTransforms:
    def test_spec_appendix_b_hash_vectors(self):
        # Iceberg spec Appendix B reference hash results
        assert bucket_hash(34) == 2017239379  # int and long hash alike
        assert bucket_hash(datetime.date(2017, 11, 16), "date") == -653330422
        assert (
            bucket_hash(datetime.datetime(2017, 11, 16, 22, 31, 8), "timestamp")
            == -2047944441
        )
        assert bucket_hash("iceberg") == 1210000089
        assert bucket_hash(decimal.Decimal("14.20")) == -500754589
        assert bucket_hash(b"\x00\x01\x02\x03") == -188683207

    def test_murmur3_empty(self):
        assert murmur3_x86_32(b"") == 0

    def test_truncate(self):
        assert transform_value("truncate[10]", 1) == 0
        assert transform_value("truncate[10]", -1) == -10
        assert transform_value("truncate[3]", "iceberg") == "ice"
        assert transform_value("truncate[16]", "ice") == "ice"

    def test_temporal(self):
        d = datetime.date(2017, 11, 16)
        assert transform_value("year", d) == 47
        assert transform_value("month", d) == 574
        assert transform_value("day", d) == 17486
        # int input = days from epoch ONLY for a date source (the physical
        # manifest encoding); ambiguous elsewhere
        assert transform_value("day", 17486, "date") == 17486
        assert transform_value("month", "1969-12-31") == -1

    def test_int_literals_route_by_source_type(self):
        # a bare int against a timestamp (or unknown) source is ambiguous —
        # micros? days? seconds? — and must raise (un-evaluable -> NO
        # prune), never compute a nonsense transform that WRONGLY prunes
        for st in ("timestamp", "timestamptz", ""):
            for tr in ("day", "year", "month", "hour"):
                with pytest.raises(TypeError):
                    transform_value(tr, 1_700_000_000_000_000, st)
        with pytest.raises(TypeError):
            transform_value("identity", 1_700_000_000_000_000, "timestamp")
        with pytest.raises(TypeError):
            bucket_hash(1_700_000_000_000_000, "timestamp")
        # ...and an un-evaluable term never prunes through file_matches
        spec = TestPruningLogic()._spec("day", "timestamp")
        assert file_matches(spec, {"p": 0}, [("c", "=", 1_700_000_000_000_000)])
        # date source: int IS the physical days encoding, prunes exactly
        spec = TestPruningLogic()._spec("day", "date")
        assert file_matches(spec, {"p": 17486}, [("c", "=", 17486)])
        assert not file_matches(spec, {"p": 17486}, [("c", "=", 17487)])
        # hour-on-date with an int-days literal converts days -> micros
        assert transform_value("hour", 1, "date") == 24

    def test_identity_timestamp_is_micros(self):
        ts = datetime.datetime(2021, 6, 1, 12, 0, 0)
        assert transform_value("identity", ts, "timestamp") == int(
            ts.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
        )

    def test_identity_and_void(self):
        assert transform_value("identity", 42) == 42
        assert transform_value("identity", datetime.date(1970, 1, 2), "date") == 1
        assert transform_value("void", 42) is None
        assert transform_value("bucket[16]", None) is None


class TestPruningLogic:
    def _spec(self, transform, source_type="long"):
        md = {
            "current-schema-id": 0,
            "schemas": [
                {
                    "schema-id": 0,
                    "fields": [{"id": 1, "name": "c", "type": source_type}],
                }
            ],
            "partition-specs": [
                {
                    "spec-id": 0,
                    "fields": [
                        {
                            "name": "p",
                            "transform": transform,
                            "source-id": 1,
                            "field-id": 1000,
                        }
                    ],
                }
            ],
        }
        return parse_specs(md)[0]

    def test_identity_eq_and_range(self):
        spec = self._spec("identity")
        assert file_matches(spec, {"p": 5}, [("c", "=", 5)])
        assert not file_matches(spec, {"p": 5}, [("c", "=", 6)])
        assert file_matches(spec, {"p": 5}, [("c", ">=", 5)])
        assert not file_matches(spec, {"p": 5}, [("c", ">", 6)])
        assert file_matches(spec, {"p": 5}, [("c", "<=", 5)])
        assert not file_matches(spec, {"p": 6}, [("c", "<", 5)])
        # in-list
        assert file_matches(spec, {"p": 5}, [("c", "in", [1, 5])])
        assert not file_matches(spec, {"p": 5}, [("c", "in", [1, 2])])

    def test_lt_is_conservative_not_exact(self):
        # col < 5 keeps pv == 5 (the file may hold 4.x... for truncate) —
        # identity keeps pv <= transform(5): pv=5 stays (conservative).
        spec = self._spec("identity")
        assert file_matches(spec, {"p": 5}, [("c", "<", 6)])

    def test_bucket_only_prunes_equality(self):
        spec = self._spec("bucket[8]", "string")
        pv = transform_value("bucket[8]", "x")
        assert file_matches(spec, {"p": pv}, [("c", "=", "x")])
        other = (pv + 1) % 8
        assert not file_matches(spec, {"p": other}, [("c", "=", "x")])
        # ranges never prune a bucket field
        assert file_matches(spec, {"p": other}, [("c", ">=", "x")])

    def test_month_range(self):
        spec = self._spec("month", "date")
        mar20 = transform_value("month", datetime.date(2020, 3, 1))
        assert file_matches(
            spec, {"p": mar20}, [("c", ">=", datetime.date(2020, 3, 15))]
        )
        assert not file_matches(
            spec, {"p": mar20 - 2}, [("c", ">=", datetime.date(2020, 3, 15))]
        )

    def test_null_partition_and_unknown_spec_never_pruned(self):
        spec = self._spec("identity")
        assert file_matches(None, {"p": 1}, [("c", "=", 2)])
        assert file_matches(spec, None, [("c", "=", 2)])
        assert not file_matches(spec, {"p": None}, [("c", "=", 2)])
        assert file_matches(spec, {"p": None}, [("c", "=", None)])

    def test_void_field_never_prunes(self):
        # a void field stores null for EVERY row regardless of the row
        # value (spec-evolution drops fields by voiding them) — equality
        # on the source column must not prune any file
        spec = self._spec("void")
        assert file_matches(spec, {"p": None}, [("c", "=", 5)])
        assert file_matches(spec, {"p": None}, [("c", ">=", 5)])
        assert file_matches(spec, {"p": None}, [("c", "in", [1, 2])])


@pytest.fixture(scope="module")
def part_table(spark, tmp_path_factory):
    loc = str(tmp_path_factory.mktemp("icepart") / "t")
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("grp"),
        F.date_add(F.lit("2021-01-01"), (F.col("id") % 120).cast("int")).alias(
            "d"
        ),
        F.concat(F.lit("n_"), F.col("id")).alias("nm"),
    )
    iceberg_create(df, loc, partition_by=[("grp", "identity"), ("d", "month")])
    return loc, df


class TestWriteReadPruning:
    def test_spec_recorded_and_files_partitioned(self, part_table):
        loc, _ = part_table
        t = IcebergTable(loc)
        specs = t.partition_specs()
        assert [f.transform for f in specs[0].fields] == ["identity", "month"]
        data = [f for f in t.data_files() if f.content == 0]
        # 5 groups x 4 months = 20 one-partition files
        assert len(data) == 20
        assert all(f.partition is not None for f in data)

    def test_identity_prune(self, spark, part_table):
        loc, df = part_table
        t = IcebergTable(loc)
        out = t.read(spark, partition_filter=[("grp", "=", 2)])
        assert out.count() == df.where("grp = 2").count()
        assert t.last_scan["scanned_data_files"] == 4
        assert t.last_scan["pruned_data_files"] == 16

    def test_month_range_prune(self, spark, part_table):
        loc, df = part_table
        t = IcebergTable(loc)
        bound = datetime.date(2021, 3, 1)
        out = t.read(spark, partition_filter=[("d", ">=", bound)]).where(
            F.col("d") >= F.lit("2021-03-01")
        )
        assert out.count() == df.where("d >= '2021-03-01'").count()
        assert t.last_scan["scanned_data_files"] < 20

    def test_prune_to_empty_returns_schema(self, spark, part_table):
        loc, _ = part_table
        t = IcebergTable(loc)
        out = t.read(spark, partition_filter=[("grp", "=", 99)])
        assert out.count() == 0
        assert set(out.columns) == {"k", "grp", "d", "nm"}
        assert t.last_scan["scanned_data_files"] == 0

    def test_append_applies_default_spec(self, spark, part_table):
        loc, df = part_table
        before = {f.path for f in IcebergTable(loc).data_files()}
        iceberg_append(df.where("grp = 1").limit(10), loc)
        t = IcebergTable(loc)
        new = [
            f
            for f in t.data_files()
            if f.content == 0 and f.path not in before
        ]
        assert new and all(
            dict(f.partition)["grp"] == 1 for f in new
        )
        out = t.read(spark, partition_filter=[("grp", "=", 1)])
        assert out.count() == df.where("grp = 1").count() + 10

    def test_explain_io_surfaces_scan_counts(self, spark, part_table):
        import json

        from trino_private_spark.plans.explain import explain_typed

        loc, _ = part_table
        t = IcebergTable(loc)
        out = t.read(spark, partition_filter=[("grp", "=", 2)])
        io = json.loads(explain_typed(out, "IO"))
        ice = [
            e
            for e in io["inputTableInfos"]
            if e.get("format") == "iceberg" and "icebergScan" in e
        ]
        assert ice and ice[0]["icebergScan"]["pruned_data_files"] >= 16


class TestBucketPrune:
    def test_bucket_write_and_prune(self, spark, tmp_path):
        loc = str(tmp_path / "b")
        df = spark.range(0, 300).select(
            F.col("id").alias("k"),
            F.concat(F.lit("u_"), F.col("id")).alias("uid"),
        )
        iceberg_create(df, loc, partition_by=[("uid", "bucket[8]")])
        t = IcebergTable(loc)
        out = t.read(spark, partition_filter=[("uid", "=", "u_7")]).where(
            "uid = 'u_7'"
        )
        assert out.count() == 1
        assert t.last_scan["scanned_data_files"] == 1
        # writer's JVM-side bucket value equals the python transform
        pv = transform_value("bucket[8]", "u_7")
        hit = [
            f
            for f in t.data_files()
            if f.content == 0 and dict(f.partition)["uid_bucket"] == pv
        ]
        assert len(hit) == 1


class TestOrc:
    def test_orc_roundtrip_partitioned(self, spark, tmp_path):
        loc = str(tmp_path / "orc")
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
        )
        iceberg_create(df, loc, partition_by=["grp"], file_format="ORC")
        t = IcebergTable(loc)
        assert {f.file_format for f in t.data_files()} == {"ORC"}
        assert t.read(spark).count() == 100
        out = t.read(spark, partition_filter=[("grp", "=", 3)])
        assert out.count() == 25
        assert t.last_scan["scanned_data_files"] == 1

    def test_orc_append_to_parquet_table_mixed(self, spark, tmp_path):
        loc = str(tmp_path / "mix")
        df = spark.range(0, 50).select(F.col("id").alias("k"))
        iceberg_create(df, loc)
        iceberg_append(
            spark.range(50, 60).select(F.col("id").alias("k")),
            loc,
            file_format="ORC",
        )
        t = IcebergTable(loc)
        assert {f.file_format for f in t.data_files()} == {"PARQUET", "ORC"}
        assert t.read(spark).count() == 60

    def test_orc_position_delete_rejected_loudly(self, spark, tmp_path):
        # Spark's ORC scan exposes no _metadata.row_index, so position
        # lineage (DELETE/UPDATE) is parquet-only — must fail loudly, not
        # mis-position rows.
        loc = str(tmp_path / "orcdel")
        df = spark.range(0, 40).select(F.col("id").alias("k"))
        iceberg_create(df, loc, file_format="ORC")
        from trino_private_spark.sources.iceberg_write import iceberg_delete

        with pytest.raises(NotImplementedError, match="parquet"):
            iceberg_delete(spark, loc, "k < 10")
        assert IcebergTable(loc).read(spark).count() == 40

    def test_unknown_format_rejected_loudly(self, spark, tmp_path):
        loc = str(tmp_path / "bad")
        df = spark.range(0, 5).select(F.col("id").alias("k"))
        iceberg_create(df, loc)
        t = IcebergTable(loc)
        import dataclasses

        files = [
            dataclasses.replace(f, file_format="CSV") for f in t.data_files()
        ]
        with pytest.raises(ValueError, match="unsupported Iceberg data file"):
            t._read_files(spark, files)  # noqa: SLF001


class TestAtomicUpdate:
    def test_update_is_one_snapshot(self, spark, tmp_path):
        loc = str(tmp_path / "upd")
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("old").alias("v")
        )
        iceberg_create(df, loc)
        n_before = len(IcebergTable(loc).snapshots())
        assert iceberg_update(spark, loc, {"v": "'new'"}, "k < 25") == 25
        t = IcebergTable(loc)
        assert len(t.snapshots()) == n_before + 1
        cur = t.read(spark)
        assert cur.count() == 100
        assert cur.where("v = 'new'").count() == 25

    def test_no_intermediate_state_visible_to_time_travel(self, spark, tmp_path):
        # every snapshot in history must contain ALL 100 rows — a
        # delete-then-append two-snapshot update would expose a 75-row
        # intermediate snapshot (the ADVICE finding this pins).
        loc = str(tmp_path / "upd2")
        df = spark.range(0, 100).select(
            F.col("id").alias("k"), F.lit("old").alias("v")
        )
        iceberg_create(df, loc)
        iceberg_update(spark, loc, {"v": "'new'"}, "k < 25")
        t = IcebergTable(loc)
        for s in t.snapshots():
            assert (
                t.read(spark, snapshot_id=s["snapshot-id"]).count() == 100
            )

    def test_update_rows_not_redeleted_same_sequence(self, spark, tmp_path):
        # new rows share the delete's sequence number; position deletes
        # name (old_file, pos) pairs only, so the replacements survive
        # even though they still match the predicate.
        loc = str(tmp_path / "upd3")
        df = spark.range(0, 50).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        iceberg_create(df, loc)
        n = iceberg_update(spark, loc, {"v": "v + 1000"}, "k < 50")
        assert n == 50
        out = IcebergTable(loc).read(spark)
        assert out.count() == 50
        assert out.agg(F.min("v")).collect()[0][0] == 1000


class TestSpecEvolution:
    def test_mixed_spec_manifests_prune_safely(self, spark, tmp_path):
        """Partition-spec evolution: an old manifest written under the
        empty spec 0 (no partition tuples) coexists with a new manifest
        under spec 1 (identity on grp). Pruning on grp must drop only
        spec-1 files with a non-matching tuple — spec-0 files carry no
        tuple and are NEVER pruned (the conservative rule the reference's
        split source follows across spec evolution)."""
        import json
        import os

        from trino_private_spark.sources.iceberg_testing import (
            MANIFEST_LIST_SCHEMA,
            write_parquet_with_ids,
        )
        from trino_private_spark.sources.iceberg import write_avro_container
        from trino_private_spark.sources.iceberg_write import _entry_schema

        loc = str(tmp_path / "evo")
        md = os.path.join(loc, "metadata")
        os.makedirs(md)
        ids = {"k": 1, "grp": 2}
        fa = os.path.join(loc, "a.parquet")  # pre-evolution, grp mixed
        write_parquet_with_ids(fa, {"k": [1, 2], "grp": [0, 1]}, ids)
        fb = os.path.join(loc, "b.parquet")  # spec-1 file, all grp=1
        write_parquet_with_ids(fb, {"k": [3, 4], "grp": [1, 1]}, ids)
        fc = os.path.join(loc, "c.parquet")  # spec-1 file, all grp=2
        write_parquet_with_ids(fc, {"k": [5], "grp": [2]}, ids)

        def entry(path, part):
            df = {
                "content": 0, "file_path": path, "file_format": "PARQUET",
                "record_count": 0, "file_size_in_bytes": os.path.getsize(path),
                "equality_ids": None,
            }
            if part is not None:
                df["partition"] = part
            return {
                "status": 1, "snapshot_id": 1,
                "sequence_number": None, "data_file": df,
            }

        m0 = os.path.join(md, "m0.avro")  # spec 0: no partition field
        write_avro_container(m0, _entry_schema([]), [entry(fa, None)])
        m1 = os.path.join(md, "m1.avro")  # spec 1: identity grp tuples
        write_avro_container(
            m1,
            _entry_schema([("grp", "long")]),
            [entry(fb, {"grp": 1}), entry(fc, {"grp": 2})],
        )
        ml = os.path.join(md, "snap-1.avro")
        write_avro_container(
            ml,
            MANIFEST_LIST_SCHEMA,
            [
                {
                    "manifest_path": m0,
                    "manifest_length": os.path.getsize(m0),
                    "partition_spec_id": 0, "content": 0,
                    "sequence_number": 1, "min_sequence_number": 1,
                    "added_snapshot_id": 1,
                },
                {
                    "manifest_path": m1,
                    "manifest_length": os.path.getsize(m1),
                    "partition_spec_id": 1, "content": 0,
                    "sequence_number": 1, "min_sequence_number": 1,
                    "added_snapshot_id": 1,
                },
            ],
        )
        meta = {
            "format-version": 2,
            "location": loc,
            "last-sequence-number": 1,
            "current-schema-id": 0,
            "schemas": [
                {
                    "type": "struct", "schema-id": 0,
                    "fields": [
                        {"id": 1, "name": "k", "required": False,
                         "type": "long"},
                        {"id": 2, "name": "grp", "required": False,
                         "type": "long"},
                    ],
                }
            ],
            "default-spec-id": 1,
            "partition-specs": [
                {"spec-id": 0, "fields": []},
                {
                    "spec-id": 1,
                    "fields": [
                        {"name": "grp", "transform": "identity",
                         "source-id": 2, "field-id": 1000}
                    ],
                },
            ],
            "current-snapshot-id": 1,
            "snapshots": [
                {"snapshot-id": 1, "timestamp-ms": 1000,
                 "sequence-number": 1, "manifest-list": ml},
            ],
        }
        with open(os.path.join(md, "v1.metadata.json"), "w") as fh:
            json.dump(meta, fh)

        t = IcebergTable(loc)
        out = t.read(spark, partition_filter=[("grp", "=", 1)])
        # spec-0 file never pruned (no tuple) + spec-1 grp=1 file kept,
        # spec-1 grp=2 file pruned
        assert t.last_scan == {
            "candidate_data_files": 3,
            "scanned_data_files": 2,
            "pruned_data_files": 1,
            # hand-built manifests carry no column metrics -> no metrics
            # pruning (conservative)
            "metrics_pruned_data_files": 0,
            # and no manifest-list field_summaries -> both manifests open
            "manifests_total": 2,
            "manifests_opened": 2,
            "manifests_pruned": 0,
        }
        assert sorted(r.k for r in out.where("grp = 1").collect()) == [2, 3, 4]


class TestWhereAndMetadataTables:
    def test_parse_partition_predicate(self):
        from trino_private_spark.sources.iceberg import (
            parse_partition_predicate,
        )

        got = parse_partition_predicate(
            "grp = 3 AND d >= DATE '2020-03-01' AND nm IN ('a', 'b') "
            "AND weird(x) > 2 AND k <> 5 AND s = 'it''s'"
        )
        assert ("grp", "=", 3) in got
        assert ("nm", "in", ["a", "b"]) in got
        assert ("s", "=", "it's") in got
        assert any(op == ">=" and str(v) == "2020-03-01" for _, op, v in got)
        # non-conforming and inequality terms contribute nothing
        assert not any(c == "k" for c, _, _ in got)

    def test_parse_partition_predicate_or_precedence(self):
        from trino_private_spark.sources.iceberg import (
            parse_partition_predicate,
        )

        # an unparenthesized OR makes the predicate disjunctive: rows
        # matching only the other side live in files any term would prune
        assert parse_partition_predicate("a = 1 AND b = 2 OR c = 3") == []
        assert parse_partition_predicate("a = 1 OR b = 2 AND c = 3") == []
        assert parse_partition_predicate("a = 1 OR b = 2") == []
        # parenthesized OR: the disjunct contributes nothing, siblings prune
        got = parse_partition_predicate("(a = 1 OR b = 2) AND c = 3")
        assert got == [("c", "=", 3)]
        # AND inside a string literal never splits / never fabricates terms
        got = parse_partition_predicate("msg = 'a AND b = 2 AND c'")
        assert got == [("msg", "=", "a AND b = 2 AND c")]
        got = parse_partition_predicate("msg = 'x OR y' AND c = 3")
        assert ("c", "=", 3) in got and ("msg", "=", "x OR y") in got
        # NOT terms are skipped, sibling conjuncts still prune
        got = parse_partition_predicate("NOT (a = 1) AND b = 2")
        assert got == [("b", "=", 2)]
        # BETWEEN lowers to a range pair
        got = parse_partition_predicate("k BETWEEN 3 AND 7 AND g = 1")
        assert ("k", ">=", 3) in got and ("k", "<=", 7) in got
        assert ("g", "=", 1) in got
        got = parse_partition_predicate(
            "d BETWEEN DATE '2020-01-01' AND DATE '2020-02-01'"
        )
        assert len(got) == 2 and {op for _, op, _ in got} == {">=", "<="}
        # NOT BETWEEN contributes nothing
        assert parse_partition_predicate("k NOT BETWEEN 3 AND 7") == []

    def test_where_read_prunes_and_filters(self, spark, part_table):
        from trino_private_spark.sources.iceberg import (
            IO_SCAN_INFO,
            read_iceberg,
        )

        loc, df = part_table
        out = read_iceberg(spark, loc, where="grp = 2 AND k >= 100")
        assert out.count() == df.where("grp = 2 AND k >= 100").count()
        assert IO_SCAN_INFO[loc]["scanned_data_files"] == 4

    def test_metadata_tables(self, spark, part_table):
        from trino_private_spark.sources.iceberg import read_iceberg

        loc, df = part_table
        parts = read_iceberg(spark, loc + "$partitions")
        # grp x month = 20 partitions before the module's append test runs
        assert parts.count() >= 20
        assert parts.agg({"record_count": "sum"}).collect()[0][0] >= 400
        snaps = read_iceberg(spark, loc + "$snapshots").collect()
        assert snaps and snaps[0].operation == "append"
        files = read_iceberg(spark, loc + "$files")
        assert files.where("file_format = 'PARQUET'").count() == files.count()
        mans = read_iceberg(spark, loc + "$manifests")
        assert mans.count() >= 1
        import pytest as _pytest

        # an unknown $suffix is NOT a metadata table — it's a plain path
        # (which here simply doesn't exist)
        with _pytest.raises(FileNotFoundError):
            read_iceberg(spark, loc + "$bogus")

    def test_dollar_in_plain_path(self, spark, tmp_path):
        # a legitimate table path containing '$' must not be misrouted
        from trino_private_spark.sources.iceberg import read_iceberg

        loc = str(tmp_path / "tmp$dir" / "t")
        iceberg_create(spark.range(5).select(F.col("id").alias("k")), loc)
        assert read_iceberg(spark, loc).count() == 5

    def test_new_metadata_tables(self, spark, part_table):
        from trino_private_spark.sources.iceberg import read_iceberg

        loc, _ = part_table
        hist = read_iceberg(spark, loc + "$history")
        rows = hist.collect()
        assert rows and all(r.is_current_ancestor for r in rows)
        assert hist.columns == [
            "made_current_at_ms",
            "snapshot_id",
            "parent_id",
            "is_current_ancestor",
        ]
        refs = read_iceberg(spark, loc + "$refs").collect()
        assert [r.name for r in refs] == ["main"]
        assert refs[0].type == "BRANCH"
        props = read_iceberg(spark, loc + "$properties")
        assert props.columns == ["key", "value"]
        props.collect()  # empty is fine — shape is the contract


class TestPartitionedWriteTypes:
    def test_nullable_long_survives_partitioned_write(self, spark, tmp_path):
        # the partition split must happen in Arrow, never pandas: pandas
        # degrades a nullable int64 to float64 and the file would be
        # written as DOUBLE where the schema says long
        from trino_private_spark.sources.iceberg import read_iceberg

        loc = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(1, 10), (None, 10), (3, 20)], "v long, grp int"
        )
        iceberg_create(df, loc, partition_by=[("grp", "identity")])
        # physical parquet type must be INT64, not DOUBLE
        import pyarrow.parquet as pq

        tbl = IcebergTable(loc)
        for f in tbl.data_files():
            sch = pq.read_schema(f.path)
            assert str(sch.field("v").type) == "int64", f.path
        out = read_iceberg(spark, loc)
        assert dict(out.dtypes)["v"] == "bigint"
        vals = sorted((r.v if r.v is not None else -1) for r in out.collect())
        assert vals == [-1, 1, 3]

    def test_identity_timestamp_partition_roundtrip(self, spark, tmp_path):
        # identity partitioning on a timestamp column: stored as epoch
        # micros in the manifest (spec), json-serializable, and prunable
        from trino_private_spark.sources.iceberg import read_iceberg

        loc = str(tmp_path / "t")
        df = spark.createDataFrame(
            [
                (1, datetime.datetime(2021, 6, 1, 12, 0, 0)),
                (2, datetime.datetime(2021, 6, 2, 12, 0, 0)),
            ],
            "k long, ts timestamp",
        )
        iceberg_create(df, loc, partition_by=[("ts", "identity")])
        tbl = IcebergTable(loc)
        parts = [dict(f.partition) for f in tbl.data_files()]
        assert all(
            isinstance(next(iter(p.values())), int) for p in parts
        ), parts
        # a where-string timestamp literal routes through _temporal by the
        # column's source type -> prunes to one file AND row-filters
        out = read_iceberg(spark, loc, where="ts = '2021-06-01 12:00:00'")
        assert out.count() == 1
        # typed partition_filter DOES prune to one file
        out = tbl.read(
            spark,
            partition_filter=[
                ("ts", "=", datetime.datetime(2021, 6, 1, 12, 0, 0))
            ],
        )
        assert tbl.last_scan["scanned_data_files"] == 1
        assert out.count() == 1


class TestDmlPruning:
    def test_delete_prunes_from_its_own_predicate(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import IO_SCAN_INFO
        from trino_private_spark.sources.iceberg_write import (
            iceberg_create,
            iceberg_delete,
        )

        loc = str(tmp_path / "dml")
        df = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
        )
        iceberg_create(df, loc, partition_by=["grp"])
        n = iceberg_delete(spark, loc, "grp = 1 AND k < 100")
        assert n == 25
        # the matching scan opened only the grp=1 file of 4
        assert IO_SCAN_INFO[loc]["scanned_data_files"] == 1
        t = IcebergTable(loc)
        assert t.read(spark).count() == 175

    def test_update_prunes_and_stays_atomic(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import IO_SCAN_INFO

        loc = str(tmp_path / "dml2")
        df = spark.range(0, 200).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
        )
        iceberg_create(df, loc, partition_by=["grp"])
        n = iceberg_update(spark, loc, {"k": "k + 1000"}, "grp = 2")
        assert n == 50
        assert IO_SCAN_INFO[loc]["scanned_data_files"] == 1
        t = IcebergTable(loc)
        out = t.read(spark)
        assert out.count() == 200
        assert out.where("k >= 1000").count() == 50
        assert len(t.snapshots()) == 2  # still ONE atomic update snapshot


class TestWriterPythonParity:
    """Pruning is sound ONLY if the writer's JVM-side partition values
    equal transform_value() of the same source values — the reader prunes
    by comparing transform_value(filter literal) against stored tuples."""

    def test_all_transforms_agree(self, spark):
        import json

        from trino_private_spark.sources.iceberg_write import _pv_expr

        df = spark.createDataFrame(
            [
                (i, f"s{i}ff{i * 7}", datetime.date(1969, 12, 1)
                 + datetime.timedelta(days=i * 37),
                 datetime.datetime(2021, 1, 1) + datetime.timedelta(hours=i * 13))
                for i in range(-20, 20)
            ],
            "k long, s string, d date, ts timestamp",
        )
        cases = [
            ("k", "identity", "long"),
            ("k", "bucket[16]", "long"),
            ("k", "truncate[10]", "long"),
            ("s", "bucket[8]", "string"),
            ("s", "truncate[3]", "string"),
            ("d", "identity", "date"),
            ("d", "year", "date"),
            ("d", "month", "date"),
            ("d", "day", "date"),
            ("ts", "hour", "timestamp"),
        ]
        cols = [
            _pv_expr(c, tr, st).alias(f"pv_{i}")
            for i, (c, tr, st) in enumerate(cases)
        ]
        rows = df.select("k", "s", "d", "ts", *cols).collect()
        for r in rows:
            src = {"k": r.k, "s": r.s, "d": r.d, "ts": r.ts}
            for i, (c, tr, st) in enumerate(cases):
                expect = transform_value(tr, src[c], st)
                got = r[f"pv_{i}"]
                assert got == expect, (c, tr, src[c], got, expect)


class TestMetricsPruning:
    """Column min/max + null-count file pruning (spec column metrics;
    reference IcebergSplitSource.fileMatchesPredicate over the metrics
    domain) — prunes on predicates over UNpartitioned columns."""

    def test_single_value_serialization_roundtrip(self):
        import datetime as dt
        import decimal

        from trino_private_spark.sources.iceberg_partition import (
            deserialize_single_value,
            serialize_single_value,
        )

        cases = [
            ("int", 42), ("int", -1), ("long", 2**40), ("long", -7),
            ("float", 1.5), ("double", -2.25), ("string", "it's"),
            ("boolean", True), ("boolean", False),
            ("date", 17486), ("timestamp", 1_700_000_000_000_000),
        ]
        for t, v in cases:
            assert deserialize_single_value(t, serialize_single_value(t, v)) == v
        d = decimal.Decimal("14.20")
        got = deserialize_single_value(
            "decimal(10,2)", serialize_single_value("decimal(10,2)", d)
        )
        assert got == d
        # spec appendix D examples: int 1 -> 01 00 00 00, string 'A' -> 41
        assert serialize_single_value("int", 1) == b"\x01\x00\x00\x00"
        assert serialize_single_value("string", "A") == b"A"
        assert serialize_single_value("long", 1) == b"\x01" + b"\x00" * 7

    def _mk(self, spark, tmp_path, rows=800, files=8):
        from pyspark.sql import functions as F

        loc = str(tmp_path / "t")
        df = (
            spark.range(0, rows)
            .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
            .repartitionByRange(files, "k")
        )
        iceberg_create(df, loc)
        return loc

    def test_equality_and_range_prune_unpartitioned(self, spark, tmp_path):
        loc = self._mk(spark, tmp_path)
        t = IcebergTable(loc)
        out = t.read(spark, partition_filter=[("k", "=", 5)])
        assert t.last_scan["scanned_data_files"] == 1
        assert out.where("k = 5").count() == 1
        t.read(spark, partition_filter=[("k", ">=", 700)])
        assert t.last_scan["scanned_data_files"] == 1
        t.read(spark, partition_filter=[("k", "<", 100)])
        assert t.last_scan["scanned_data_files"] == 1
        # un-prunable op on a metric'd column keeps everything
        t.read(spark, partition_filter=[("v", "=", 3)])
        assert t.last_scan["scanned_data_files"] == 8  # v spans 0..6 everywhere

    def test_all_null_column_prunes(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        df = spark.createDataFrame([(None, 1), (None, 2)], "s string, k long")
        iceberg_create(df.repartition(1), loc)
        t = IcebergTable(loc)
        t.read(spark, partition_filter=[("s", "=", "x")])
        assert t.last_scan["scanned_data_files"] == 0
        # IS-NULL-compatible predicates don't exist in the term grammar;
        # equality with None never prunes the all-null file
        t.read(spark, partition_filter=[("s", "=", None)])
        assert t.last_scan["scanned_data_files"] == 1

    def test_where_string_uses_metrics(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import read_iceberg

        loc = self._mk(spark, tmp_path)
        out = read_iceberg(spark, loc, where="k BETWEEN 10 AND 20")
        t = IcebergTable(loc)
        t.read(spark, partition_filter=[("k", ">=", 10), ("k", "<=", 20)])
        assert t.last_scan["scanned_data_files"] == 1
        assert out.count() == 11

    def test_string_bounds(self, spark, tmp_path):
        from pyspark.sql import functions as F

        loc = str(tmp_path / "t")
        df = spark.createDataFrame(
            [("apple",), ("banana",)], "w string"
        ).repartition(1).union(
            spark.createDataFrame([("pear",), ("quince",)], "w string")
            .repartition(1)
        )
        # two files via explicit per-partition writes: create then append
        iceberg_create(
            spark.createDataFrame([("apple",), ("banana",)], "w string"), loc
        )
        iceberg_append(
            spark.createDataFrame([("pear",), ("quince",)], "w string"), loc
        )
        t = IcebergTable(loc)
        t.read(spark, partition_filter=[("w", "=", "pear")])
        assert t.last_scan["scanned_data_files"] == 1

    def test_dml_uses_metrics_prune_conservatively(self, spark, tmp_path):
        # DELETE/UPDATE route their own predicate through the same pruning;
        # results must stay exact
        from trino_private_spark.sources.iceberg import read_iceberg
        from trino_private_spark.sources.iceberg_write import iceberg_delete

        loc = self._mk(spark, tmp_path, rows=100, files=4)
        n = iceberg_delete(spark, loc, "k >= 90")
        assert n == 10
        assert read_iceberg(spark, loc).count() == 90


class TestSchemaEvolution:
    """Field-id projection on the read path (reference:
    IcebergPageSourceProvider resolves column handles by id per file):
    add/rename/drop columns, old files read correctly, time travel reads
    pre-evolution snapshots in their own shape."""

    def _evolved(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import iceberg_alter

        loc = str(tmp_path / "t")
        iceberg_create(
            spark.createDataFrame([(1, "a"), (2, "b")], "k long, name string"),
            loc,
        )
        iceberg_alter(
            loc, add_columns={"score": "double"},
            rename_columns={"name": "label"},
        )
        iceberg_append(
            spark.createDataFrame([(3, "c", 1.5)], "k long, label string, score double"),
            loc,
        )
        return loc

    def test_add_rename_nullfill_and_alias(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import read_iceberg

        loc = self._evolved(spark, tmp_path)
        out = read_iceberg(spark, loc)
        assert out.columns == ["k", "label", "score"]
        assert sorted((r.k, r.label, r.score) for r in out.collect()) == [
            (1, "a", None), (2, "b", None), (3, "c", 1.5),
        ]

    def test_append_nullfills_missing_added_column(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import read_iceberg

        loc = self._evolved(spark, tmp_path)
        iceberg_append(
            spark.createDataFrame([(4, "d")], "k long, label string"), loc
        )
        rows = sorted(
            (r.k, r.label, r.score)
            for r in read_iceberg(spark, loc).collect()
        )
        assert (4, "d", None) in rows

    def test_time_travel_reads_snapshot_schema(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import read_iceberg

        loc = self._evolved(spark, tmp_path)
        first = IcebergTable(loc).snapshots()[0]["snapshot-id"]
        pre = read_iceberg(spark, loc, snapshot_id=first)
        assert pre.columns == ["k", "name"]
        assert sorted((r.k, r.name) for r in pre.collect()) == [
            (1, "a"), (2, "b"),
        ]

    def test_drop_column(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import read_iceberg
        from trino_private_spark.sources.iceberg_write import iceberg_alter

        loc = self._evolved(spark, tmp_path)
        iceberg_alter(loc, drop_columns=["score"])
        out = read_iceberg(spark, loc)
        assert out.columns == ["k", "label"]
        assert sorted(tuple(r) for r in out.collect()) == [
            (1, "a"), (2, "b"), (3, "c"),
        ]

    def test_dml_on_evolved_table(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import read_iceberg
        from trino_private_spark.sources.iceberg_write import (
            iceberg_delete,
            iceberg_update,
        )

        loc = self._evolved(spark, tmp_path)
        assert iceberg_delete(spark, loc, "k = 2") == 1
        assert iceberg_update(spark, loc, {"label": "'Z'"}, "k = 3") == 1
        rows = sorted(
            (r.k, r.label, r.score)
            for r in read_iceberg(spark, loc).collect()
        )
        assert rows == [(1, "a", None), (3, "Z", 1.5)]

    def test_dropped_field_id_never_reused(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import iceberg_alter

        loc = self._evolved(spark, tmp_path)
        iceberg_alter(loc, drop_columns=["score"])
        iceberg_alter(loc, add_columns={"score2": "long"})
        t = IcebergTable(loc)
        ids = [f["id"] for f in t._current_schema()["fields"]]
        assert max(ids) == 4  # 1,2 original; 3 score (dropped); 4 score2

    def test_alter_guards(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import iceberg_alter

        loc = str(tmp_path / "t")
        iceberg_create(
            spark.createDataFrame([(1, 10)], "k long, grp long"),
            loc,
            partition_by=["grp"],
        )
        with pytest.raises(ValueError, match="partition source"):
            iceberg_alter(loc, drop_columns=["grp"])
        with pytest.raises(ValueError, match="already exists"):
            iceberg_alter(loc, add_columns={"k": "long"})
        with pytest.raises(ValueError, match="not in schema"):
            iceberg_alter(loc, rename_columns={"zzz": "y"})

    def test_rename_only_no_footer_penalty_correctness(self, spark, tmp_path):
        # rename without add/drop: every file still projects by id
        from trino_private_spark.sources.iceberg import read_iceberg
        from trino_private_spark.sources.iceberg_write import iceberg_alter

        loc = str(tmp_path / "t")
        iceberg_create(
            spark.createDataFrame([(1, "a")], "k long, name string"), loc
        )
        iceberg_alter(loc, rename_columns={"k": "key", "name": "nm"})
        out = read_iceberg(spark, loc)
        assert out.columns == ["key", "nm"]
        assert [(r.key, r.nm) for r in out.collect()] == [(1, "a")]


class TestViewReprune:
    def test_sql_reprunes_per_query_and_sees_new_snapshots(
        self, spark, tmp_path
    ):
        from trino_private_spark.api import Engine
        from trino_private_spark.sources.iceberg import IO_SCAN_INFO
        from trino_private_spark.sources.iceberg_write import iceberg_append

        eng = Engine(spark)
        loc = str(tmp_path / "t")
        eng.ctas(
            "vr_t",
            "SELECT id AS k, id % 4 AS grp FROM RANGE(40)",
            path=loc,
            fmt="iceberg",
            partition_by=["grp"],
            dialect="spark",
        )
        assert eng.sql("SELECT COUNT(*) AS c FROM vr_t WHERE grp = 1").collect()[0].c == 10
        assert IO_SCAN_INFO[loc]["scanned_data_files"] == 1
        assert eng.sql("SELECT COUNT(*) AS c FROM vr_t").collect()[0].c == 40
        assert IO_SCAN_INFO[loc]["scanned_data_files"] == 4
        # a snapshot committed AFTER registration is visible (re-resolved)
        iceberg_append(
            spark.createDataFrame([(100, 1)], "k long, grp long"), loc
        )
        assert eng.sql("SELECT COUNT(*) AS c FROM vr_t WHERE grp = 1").collect()[0].c == 11
        assert IO_SCAN_INFO[loc]["scanned_data_files"] == 2

    def test_multi_reference_never_prunes(self, spark, tmp_path):
        # the same view twice with different WHEREs: pruning from either
        # would lose the other's rows -> full read
        from trino_private_spark.api import Engine
        from trino_private_spark.sources.iceberg import IO_SCAN_INFO

        eng = Engine(spark)
        loc = str(tmp_path / "t")
        eng.ctas(
            "vr2_t",
            "SELECT id AS k, id % 4 AS grp FROM RANGE(40)",
            path=loc,
            fmt="iceberg",
            partition_by=["grp"],
            dialect="spark",
        )
        got = eng.sql(
            "SELECT * FROM vr2_t WHERE grp = 1 UNION ALL "
            "SELECT * FROM vr2_t WHERE grp = 2",
            dialect="spark",
        ).count()
        assert got == 20
        assert IO_SCAN_INFO[loc]["scanned_data_files"] == 4


class TestSessionTimezoneLiterals:
    """Naive timestamp literals must prune in the Spark session timezone —
    the zone the row-level filter (and the writer's stored epoch micros)
    uses. ADVICE r7: parsing them as UTC silently dropped files in
    non-UTC sessions."""

    def teardown_method(self):
        from trino_private_spark.sources.iceberg_partition import (
            set_session_timezone,
        )

        set_session_timezone("UTC")

    def test_transform_value_localizes_naive_literals(self):
        from trino_private_spark.sources.iceberg_partition import (
            set_session_timezone,
        )

        utc_hours = transform_value(
            "hour", "2021-06-01 00:30:00", "timestamp"
        )
        set_session_timezone("America/New_York")
        est_hours = transform_value(
            "hour", "2021-06-01 00:30:00", "timestamp"
        )
        # 00:30 EDT == 04:30 UTC -> 4 hours later on the epoch-hour line
        assert est_hours == utc_hours + 4
        set_session_timezone("+05:30")
        assert (
            transform_value("hour", "2021-06-01 06:30:00", "timestamp")
            == utc_hours + 1  # 06:30+05:30 == 01:00 UTC
        )

    def test_non_utc_session_does_not_misprune(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import read_iceberg

        loc = str(tmp_path / "tz_t")
        prev = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            df = spark.createDataFrame(
                [(datetime.datetime(2021, 6, 1, 2, 0, 0), 1)],
                "ts timestamp, k long",
            )
            iceberg_create(df, loc)
            # row filter (session wall time): 02:00 <= 05:00 -> row matches.
            # A UTC-parsed literal (05:00Z) would sit BELOW the stored
            # lower bound (02:00 EDT == 06:00Z) and wrongly prune the file.
            out = read_iceberg(
                spark, loc, where="ts <= '2021-06-01 05:00:00'"
            )
            assert out.count() == 1
        finally:
            spark.conf.set("spark.sql.session.timeZone", prev)


class TestManifestLevelPruning:
    """Manifest-list field_summaries let the reader SKIP whole manifests
    without opening them (iceberg-core ManifestGroup / ManifestFile
    partitions(), consumed by the reference's IcebergSplitSource). After
    heavy DML a 100-TB table holds thousands of manifests; metadata IO
    must be O(matching manifests), not O(manifests)."""

    def _churn(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        df = spark.range(0, 40).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
        )
        iceberg_create(df, loc, partition_by=["grp"])  # manifest: grp 0..3
        for g in range(4, 10):  # one single-partition manifest per append
            iceberg_append(
                spark.createDataFrame([(100 + g, g)], "k long, grp long"),
                loc,
            )
        return loc

    def test_equality_skips_whole_manifests(self, spark, tmp_path):
        loc = self._churn(spark, tmp_path)
        t = IcebergTable(loc)
        out = t.read(spark, partition_filter=[("grp", "=", 7)])
        assert t.last_scan["manifests_total"] == 7
        assert t.last_scan["manifests_opened"] == 1
        assert t.last_scan["scanned_data_files"] == 1
        assert [r.k for r in out.collect()] == [107]

    def test_range_skips_and_full_read_opens_all(self, spark, tmp_path):
        loc = self._churn(spark, tmp_path)
        t = IcebergTable(loc)
        t.read(spark, partition_filter=[("grp", ">=", 8)])
        assert t.last_scan["manifests_opened"] == 2
        assert t.read(spark).count() == 46
        assert t.last_manifest_scan["manifests_opened"] == 7

    def test_delete_manifests_always_open(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import iceberg_delete

        loc = self._churn(spark, tmp_path)
        assert iceberg_delete(spark, loc, "k = 107") == 1
        t = IcebergTable(loc)
        out = t.read(spark, partition_filter=[("grp", "=", 7)])
        # grp=7 data manifest + the (never-pruned) delete manifest
        assert t.last_scan["manifests_total"] == 8
        assert t.last_scan["manifests_opened"] == 2
        assert out.count() == 0  # the one grp=7 row was deleted

    def test_results_identical_with_and_without_summaries(
        self, spark, tmp_path
    ):
        loc = self._churn(spark, tmp_path)
        t = IcebergTable(loc)
        pruned = t.read(
            spark, partition_filter=[("grp", "in", [2, 9])]
        ).where("grp IN (2, 9)")
        full = t.read(spark).where("grp IN (2, 9)")
        assert sorted(r.k for r in pruned.collect()) == sorted(
            r.k for r in full.collect()
        )


class TestImmutableManifestCache:
    def test_cache_hits_and_correctness(self, spark, tmp_path):
        from trino_private_spark.sources import iceberg as ice

        loc = str(tmp_path / "t")
        iceberg_create(
            spark.range(0, 10).selectExpr("id AS k"), loc
        )
        t = IcebergTable(loc)
        t.data_files()
        before = len(ice._AVRO_CACHE)
        # repeated planning re-reads nothing (manifests are immutable)
        for _ in range(3):
            assert len(t.data_files()) == len(t.data_files())
        assert len(ice._AVRO_CACHE) == before
        # a NEW commit adds new metadata files; old entries still valid
        iceberg_append(spark.createDataFrame([(99,)], "k long"), loc)
        t2 = IcebergTable(loc)
        assert len([f for f in t2.data_files() if f.content == 0]) > len(
            [f for f in t.data_files() if f.content == 0]
        )
        assert t2.read(spark).count() == 11


class TestJoinShapedPruning:
    """Per-statement, alias-aware conjunct pruning through Engine.sql —
    the reference's PushPredicateIntoTableScan -> applyFilter: a join
    over two Iceberg views prunes BOTH scans, each by its own WHERE
    conjuncts, and the PUBLIC view names always stay full."""

    def _two_tables(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        loc_a = str(tmp_path / "a")
        loc_b = str(tmp_path / "b")
        eng.ctas(
            "jp_a",
            "SELECT id AS k, id % 4 AS grp FROM RANGE(40)",
            path=loc_a, fmt="iceberg", partition_by=["grp"],
            dialect="spark",
        )
        eng.ctas(
            "jp_b",
            "SELECT id AS k, id % 5 AS seg FROM RANGE(40)",
            path=loc_b, fmt="iceberg", partition_by=["seg"],
            dialect="spark",
        )
        return eng, loc_a, loc_b

    def test_join_prunes_both_sides(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import IO_SCAN_INFO

        eng, loc_a, loc_b = self._two_tables(spark, tmp_path)
        got = eng.sql(
            "SELECT a.k FROM jp_a a JOIN jp_b b ON a.k = b.k "
            "WHERE a.grp = 1 AND b.seg = 2",
            dialect="spark",
        ).collect()
        # truth: k % 4 = 1 AND k % 5 = 2 over 0..39 -> k in {17, 37}
        assert sorted(r.k for r in got) == [17, 37]
        assert IO_SCAN_INFO[loc_a]["scanned_data_files"] == 1
        assert IO_SCAN_INFO[loc_b]["scanned_data_files"] == 1

    def test_public_view_never_left_pruned(self, spark, tmp_path):
        eng, loc_a, _ = self._two_tables(spark, tmp_path)
        assert (
            eng.sql(
                "SELECT COUNT(*) AS c FROM jp_a WHERE grp = 3",
                dialect="spark",
            ).collect()[0].c
            == 10
        )
        # ADVICE r7: direct spark.table access between sql() calls must
        # see the WHOLE table, not the last statement's pruned subset
        assert spark.table("jp_a").count() == 40
        assert spark.sql("SELECT COUNT(*) AS c FROM jp_a").collect()[0].c == 40

    def test_outer_join_where_conjunct_prunes_safely(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import IO_SCAN_INFO

        eng, loc_a, loc_b = self._two_tables(spark, tmp_path)
        got = eng.sql(
            "SELECT a.k FROM jp_a a LEFT JOIN jp_b b ON a.k = b.k "
            "WHERE b.seg = 2 AND a.grp = 1",
            dialect="spark",
        ).collect()
        assert sorted(r.k for r in got) == [17, 37]
        assert IO_SCAN_INFO[loc_b]["scanned_data_files"] == 1

    def test_subquery_reference_keeps_full_read(self, spark, tmp_path):
        eng, loc_a, _ = self._two_tables(spark, tmp_path)
        # outer WHERE names a column that ALSO exists in jp_a — pruning
        # the inner aggregate's scan by it would corrupt the count
        got = eng.sql(
            "SELECT grp, n FROM (SELECT grp, COUNT(*) AS n FROM jp_a "
            "GROUP BY grp) x WHERE grp = 2",
            dialect="spark",
        ).collect()
        assert [(r.grp, r.n) for r in got] == [(2, 10)]

    def test_or_in_pruning_via_sql(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg import IO_SCAN_INFO

        eng, loc_a, _ = self._two_tables(spark, tmp_path)
        got = eng.sql(
            "SELECT COUNT(*) AS c FROM jp_a WHERE (grp = 1 OR grp = 2)",
            dialect="spark",
        ).collect()
        assert got[0].c == 20
        assert IO_SCAN_INFO[loc_a]["scanned_data_files"] == 2


class TestOrInParse:
    def test_same_column_or_becomes_in(self):
        from trino_private_spark.sources.iceberg import (
            parse_partition_predicate,
        )

        assert parse_partition_predicate("(k = 1 OR k = 2)") == [
            ("k", "in", [1, 2])
        ]
        assert parse_partition_predicate(
            "(k = 1 OR k IN (2, 3) OR k = 4) AND j >= 5"
        ) == [("k", "in", [1, 2, 3, 4]), ("j", ">=", 5)]
        assert parse_partition_predicate("(s = 'a' OR s = 'b''c')") == [
            ("s", "in", ["a", "b'c"])
        ]

    def test_mixed_or_never_prunes(self):
        from trino_private_spark.sources.iceberg import (
            parse_partition_predicate,
        )

        assert parse_partition_predicate("(k = 1 OR j = 2)") == []
        assert parse_partition_predicate("(k = 1 OR k > 2)") == []
        assert parse_partition_predicate("k = 1 OR k = 2") == []
        assert parse_partition_predicate("NOT (k = 1 OR k = 2)") == []
        assert parse_partition_predicate("(k = 1 OR lower(s) = 'x')") == []

    def test_qualified_predicate_split(self):
        from trino_private_spark.sources.iceberg import (
            parse_qualified_predicate,
        )

        got = parse_qualified_predicate(
            "a.k = 3 AND b.d >= DATE '2021-01-01' AND plain = 7 "
            "AND a.k = b.j AND a.x BETWEEN 1 AND 5"
        )
        assert got[None] == [("plain", "=", 7)]
        assert ("k", "=", 3) in got["a"]
        assert ("x", ">=", 1) in got["a"] and ("x", "<=", 5) in got["a"]
        assert got["b"][0][0] == "d"
        # depth-0 OR poisons everything
        assert parse_qualified_predicate("a.k = 1 OR b.j = 2") == {}


class TestExecutorSideFooterMaps:
    def test_distributed_footer_resolution_matches_driver(
        self, spark, tmp_path, monkeypatch
    ):
        from trino_private_spark.sources.iceberg_write import iceberg_alter

        loc = str(tmp_path / "t")
        iceberg_create(
            spark.range(0, 24).selectExpr("id AS k", "id * 2 AS v")
            .repartition(6),
            loc,
        )
        iceberg_alter(loc, rename_columns={"v": "w"}, add_columns={"z": "long"})
        iceberg_append(
            spark.createDataFrame([(100, 1, 2)], "k long, w long, z long"),
            loc,
        )
        t = IcebergTable(loc)
        driver_rows = sorted(
            (r.k, r.w, r.z) for r in t.read(spark).collect()
        )
        # force the DISTRIBUTED mapInArrow path and compare
        monkeypatch.setattr(IcebergTable, "FOOTER_DRIVER_THRESHOLD", 1)
        dist_rows = sorted(
            (r.k, r.w, r.z) for r in IcebergTable(loc).read(spark).collect()
        )
        assert dist_rows == driver_rows
        assert len(dist_rows) == 25


class TestPartitionSpecEvolution:
    """Partition-spec evolution (spec §"Partition Evolution"; the
    reference's ALTER TABLE ... SET PROPERTIES partitioning): a new
    default spec is a metadata-only commit; old files keep their spec
    and stay prunable under it, new writes lay out under the new one."""

    def test_evolve_and_prune_both_specs(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import (
            iceberg_set_partitioning,
        )

        loc = str(tmp_path / "t")
        df = spark.range(0, 40).select(
            F.col("id").alias("k"),
            (F.col("id") % 4).alias("grp"),
            (F.col("id") % 5).alias("seg"),
        )
        iceberg_create(df, loc, partition_by=["grp"])
        sid = iceberg_set_partitioning(loc, ["seg"])
        assert sid == 1
        iceberg_append(
            spark.range(100, 120).select(
                F.col("id").alias("k"),
                (F.col("id") % 4).alias("grp"),
                (F.col("id") % 5).alias("seg"),
            ),
            loc,
        )
        t = IcebergTable(loc)
        assert t.read(spark).count() == 60
        # grp filter prunes OLD files (their spec partitions on grp);
        # new-spec files are never pruned by it (conservative)
        out = t.read(spark, partition_filter=[("grp", "=", 1)])
        # old: 1 of 4 grp files; new: all 5 seg files kept
        assert t.last_scan["scanned_data_files"] == 6
        assert out.where("grp = 1").count() == 15
        # seg filter prunes NEW files only
        t.read(spark, partition_filter=[("seg", "=", 2)])
        assert t.last_scan["scanned_data_files"] == 4 + 1

    def test_field_id_reuse_for_same_transform(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import (
            iceberg_set_partitioning,
        )

        loc = str(tmp_path / "t")
        df = spark.range(0, 8).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
        )
        iceberg_create(df, loc, partition_by=["grp"])
        iceberg_set_partitioning(loc, ["k", "grp"])
        specs = IcebergTable(loc).metadata["partition-specs"]
        by_sid = {s["spec-id"]: s["fields"] for s in specs}
        grp0 = next(f for f in by_sid[0] if f["name"] == "grp")
        grp1 = next(f for f in by_sid[1] if f["name"] == "grp")
        k1 = next(f for f in by_sid[1] if f["name"] == "k")
        assert grp0["field-id"] == grp1["field-id"]  # reused
        assert k1["field-id"] == grp0["field-id"] + 1  # fresh, never reused


class TestAlterTableSql:
    def _eng_table(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        loc = str(tmp_path / "t")
        eng.ctas(
            "alt_t",
            "SELECT id AS k, id % 4 AS grp FROM RANGE(40)",
            path=loc, fmt="iceberg", partition_by=["grp"],
            dialect="spark",
        )
        return eng, loc

    def test_add_rename_drop_column(self, spark, tmp_path):
        eng, loc = self._eng_table(spark, tmp_path)
        eng.sql("ALTER TABLE alt_t ADD COLUMN note varchar")
        assert "note" in spark.table("alt_t").columns
        eng.sql("ALTER TABLE alt_t RENAME COLUMN note TO remark")
        cols = spark.table("alt_t").columns
        assert "remark" in cols and "note" not in cols
        eng.sql("ALTER TABLE alt_t DROP COLUMN remark")
        assert "remark" not in spark.table("alt_t").columns
        assert eng.sql(
            "SELECT COUNT(*) AS c FROM alt_t", dialect="spark"
        ).collect()[0].c == 40

    def test_execute_optimize(self, spark, tmp_path):
        eng, loc = self._eng_table(spark, tmp_path)
        iceberg_append(
            spark.createDataFrame([(100, 1)], "k long, grp long"), loc
        )
        eng.sql("ALTER TABLE alt_t EXECUTE optimize")
        files = [
            f for f in IcebergTable(loc).data_files() if f.content == 0
        ]
        assert len(files) == 4  # one per partition tuple after compaction
        assert spark.table("alt_t").count() == 41

    def test_set_properties_partitioning(self, spark, tmp_path):
        eng, loc = self._eng_table(spark, tmp_path)
        eng.sql(
            "ALTER TABLE alt_t SET PROPERTIES partitioning = "
            "ARRAY['bucket(k, 8)']"
        )
        md = IcebergTable(loc).metadata
        assert md["default-spec-id"] == 1
        spec = next(
            s for s in md["partition-specs"] if s["spec-id"] == 1
        )
        assert spec["fields"][0]["transform"] == "bucket[8]"
        iceberg_append(
            spark.createDataFrame([(500, 0)], "k long, grp long"), loc
        )
        assert eng.sql(
            "SELECT COUNT(*) AS c FROM alt_t WHERE k = 500",
            dialect="spark",
        ).collect()[0].c == 1

    def test_non_iceberg_alter_falls_through(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        # not a registered iceberg view -> Spark's own ALTER error path
        with pytest.raises(Exception):
            eng.sql("ALTER TABLE definitely_missing_t DROP COLUMN x")


class TestSqlDmlAndTimeTravel:
    """DELETE/UPDATE as SQL text (SqlBase.g4:61,160) and queryPeriod
    time travel (FOR VERSION/TIMESTAMP AS OF) through Engine.sql."""

    def _eng(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        loc = str(tmp_path / "t")
        eng.ctas(
            "dml_t",
            "SELECT id AS k, id % 4 AS grp FROM RANGE(40)",
            path=loc, fmt="iceberg", partition_by=["grp"],
            dialect="spark",
        )
        return eng, loc

    def test_sql_delete_and_update(self, spark, tmp_path):
        eng, loc = self._eng(spark, tmp_path)
        out = eng.sql("DELETE FROM dml_t WHERE k >= 30").collect()
        assert out[0].rows == 10
        assert spark.table("dml_t").count() == 30
        out = eng.sql(
            "UPDATE dml_t SET k = k + 100 WHERE grp = 1"
        ).collect()
        assert out[0].rows == 8  # k in {1,5,...,29}: 8 rows remain
        got = sorted(
            r.k for r in spark.table("dml_t").where("grp = 1").collect()
        )
        assert got[0] == 101 and got[-1] == 129
        # both mutations are snapshots: the pre-delete state time-travels
        snaps = eng.sql(
            f"SELECT COUNT(*) AS c FROM dml_t FOR VERSION AS OF 1",
            dialect="spark",
        ).collect()
        assert snaps[0].c == 40

    def test_sql_time_travel_by_tag_and_timestamp(self, spark, tmp_path):
        import time as _time

        eng, loc = self._eng(spark, tmp_path)
        eng.sql("ALTER TABLE dml_t CREATE TAG before_dml")
        before_ms = int(_time.time() * 1000) + 500
        _time.sleep(1)
        eng.sql("DELETE FROM dml_t WHERE k < 20")
        assert spark.table("dml_t").count() == 20
        by_tag = eng.sql(
            "SELECT COUNT(*) AS c FROM dml_t FOR VERSION AS OF 'before_dml'",
            dialect="spark",
        ).collect()
        assert by_tag[0].c == 40
        import datetime as _dt

        # FULL millisecond precision: truncating to whole seconds races
        # the setup commits' own millisecond timestamps under load (the
        # floor can land BEFORE the pre-delete snapshot) — flaked in
        # contended full-suite runs
        ts = _dt.datetime.fromtimestamp(
            before_ms / 1000, _dt.timezone.utc
        ).strftime("%Y-%m-%d %H:%M:%S.%f+00:00")
        by_ts = eng.sql(
            f"SELECT COUNT(*) AS c FROM dml_t "
            f"FOR TIMESTAMP AS OF TIMESTAMP '{ts}'",
            dialect="spark",
        ).collect()
        assert by_ts[0].c == 40

    def test_dml_on_unknown_table_errors(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        with pytest.raises(ValueError, match="not a mutable table"):
            eng.sql("DELETE FROM missing_tbl WHERE x = 1")
        with pytest.raises(ValueError, match="not a mutable table"):
            eng.sql("UPDATE missing_tbl SET x = 1")

    def test_sql_dml_on_cow_table(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        eng.create_cow_table(
            "cow_dml_t",
            "SELECT id AS k FROM RANGE(10)",
            str(tmp_path / "cow"),
            dialect="spark",
        )
        assert eng.sql("DELETE FROM cow_dml_t WHERE k >= 8").collect()[0].rows == 2
        assert eng.sql(
            "UPDATE cow_dml_t SET k = k * 10 WHERE k < 2"
        ).collect()[0].rows == 2
        got = sorted(r.k for r in spark.table("cow_dml_t").collect())
        assert got == [0, 2, 3, 4, 5, 6, 7, 10]


class TestSqlCtasAndInsert:
    def test_create_table_with_properties_as(self, spark, tmp_path):
        from trino_private_spark.api import Engine
        from trino_private_spark.sources.iceberg import IO_SCAN_INFO

        eng = Engine(spark)
        loc = str(tmp_path / "ct")
        eng.sql(
            f"CREATE TABLE ctas_ice WITH (format = 'ICEBERG', "
            f"partitioning = ARRAY['grp'], location = '{loc}') AS "
            "SELECT id AS k, id % 4 AS grp FROM RANGE(40)",
            dialect="spark",
        )
        assert spark.table("ctas_ice").count() == 40
        # it is a REAL iceberg tree with a recorded spec
        t = IcebergTable(loc)
        assert t.partition_specs()[0].fields[0].transform == "identity"
        # and per-query pruning works on it
        assert eng.sql(
            "SELECT COUNT(*) AS c FROM ctas_ice WHERE grp = 2",
            dialect="spark",
        ).collect()[0].c == 10
        assert IO_SCAN_INFO[loc]["scanned_data_files"] == 1

    def test_insert_into_iceberg_view(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        loc = str(tmp_path / "ins")
        eng.ctas(
            "ins_ice",
            "SELECT id AS k, id % 4 AS grp FROM RANGE(10)",
            path=loc, fmt="iceberg", partition_by=["grp"],
            dialect="spark",
        )
        out = eng.sql(
            "INSERT INTO ins_ice SELECT id AS k, id % 4 AS grp "
            "FROM RANGE(100, 105)",
            dialect="spark",
        ).collect()
        assert out[0].rows == 5
        assert spark.table("ins_ice").count() == 15
        # appended files follow the default spec (still prunable)
        t = IcebergTable(loc)
        t.read(spark, partition_filter=[("grp", "=", 0)])
        assert t.last_scan["scanned_data_files"] == 2  # create + append

    def test_plain_format_falls_back_to_file_ctas(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        p = str(tmp_path / "plainct")
        eng.sql(
            f"CREATE TABLE ctas_plain WITH (format = 'PARQUET', "
            f"location = '{p}') AS SELECT id AS k FROM RANGE(7)",
            dialect="spark",
        )
        assert spark.table("ctas_plain").count() == 7
        assert spark.read.parquet(p).count() == 7
