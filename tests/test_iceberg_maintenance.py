"""Iceberg maintenance: expire_snapshots / remove_orphan_files / OPTIMIZE
compaction + sorted_by write order (sources/iceberg_maintenance.py,
iceberg_write sort orders).

Reference parity: plugin/trino-iceberg ExpireSnapshotsProcedure,
RemoveOrphanFilesProcedure, the OPTIMIZE table-execute procedure, and the
sorted_by table property (SortFieldUtils / spec §"Sort Orders").
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from trino_private_spark.sources.iceberg import IcebergTable, read_iceberg
from trino_private_spark.sources.iceberg_maintenance import (
    iceberg_expire_snapshots,
    iceberg_optimize,
    iceberg_remove_orphan_files,
)
from trino_private_spark.sources.iceberg_write import (
    iceberg_append,
    iceberg_create,
    iceberg_delete,
)


@pytest.fixture()
def churned(spark, tmp_path):
    """Partitioned table after create + 3 single-row appends + a delete:
    7 data files, 1 position-delete file, 5 snapshots."""
    loc = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
    )
    iceberg_create(df, loc, partition_by=["grp"])
    for i in range(3):
        iceberg_append(
            spark.createDataFrame([(1000 + i, i % 4)], "k long, grp long"),
            loc,
        )
    iceberg_delete(spark, loc, "k % 10 = 0")
    return loc


class TestOptimize:
    def test_compacts_absorbs_deletes_preserves_rows(self, spark, churned):
        before = read_iceberg(spark, churned).count()
        t = IcebergTable(churned)
        assert len([f for f in t.data_files() if f.content == 0]) == 7
        # one pos-delete file PER SPARK PARTITION of the matched rows
        assert len([f for f in t.data_files() if f.content == 1]) >= 1
        stats = iceberg_optimize(spark, churned)
        assert stats["rewritten_files"] == 4  # one per partition tuple
        t2 = IcebergTable(churned)
        assert len([f for f in t2.data_files() if f.content == 0]) == 4
        assert len([f for f in t2.data_files() if f.content == 1]) == 0
        assert read_iceberg(spark, churned).count() == before

    def test_time_travel_survives_optimize(self, spark, churned):
        first = IcebergTable(churned).snapshots()[0]["snapshot-id"]
        iceberg_optimize(spark, churned)
        assert read_iceberg(spark, churned, snapshot_id=first).count() == 100

    def test_unpartitioned_size_targeted(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        df = spark.range(0, 1000).select(F.col("id").alias("k"))
        iceberg_create(df.repartition(16), loc)
        assert len(IcebergTable(loc).data_files()) == 16
        iceberg_optimize(spark, loc)  # default target >> table size -> 1
        assert len(IcebergTable(loc).data_files()) == 1
        assert read_iceberg(spark, loc).count() == 1000


class TestExpireSnapshots:
    def test_expire_keeps_current_drops_files(self, spark, churned):
        rows = read_iceberg(spark, churned).count()
        res = iceberg_expire_snapshots(churned, keep_last=1)
        assert res["expired_snapshots"] == 4
        # every DATA file is still referenced by the kept snapshot's
        # manifest list (append-style history) — only the four dropped
        # snapshots' own manifest LIST files become unreachable
        assert res["deleted_files"] == 4
        t = IcebergTable(churned)
        assert len(t.snapshots()) == 1
        assert read_iceberg(spark, churned).count() == rows

    def test_expire_after_optimize_deletes_old_files(self, spark, churned):
        rows = read_iceberg(spark, churned).count()
        iceberg_optimize(spark, churned)
        res = iceberg_expire_snapshots(churned, keep_last=1)
        assert res["expired_snapshots"] == 5
        # pre-optimize data + delete files are now unreachable -> gone
        assert res["deleted_files"] >= 8
        assert read_iceberg(spark, churned).count() == rows
        # expired snapshots are no longer time-travelable
        with pytest.raises(KeyError):
            read_iceberg(spark, churned, snapshot_id=1)

    def test_keep_last_n(self, spark, churned):
        res = iceberg_expire_snapshots(churned, keep_last=3)
        assert res["expired_snapshots"] == 2
        assert len(IcebergTable(churned).snapshots()) == 3


class TestRemoveOrphans:
    def test_removes_only_unreferenced(self, spark, churned):
        rows = read_iceberg(spark, churned).count()
        orphan = os.path.join(churned, "data", "orphan-crash-leftover.parquet")
        with open(orphan, "wb") as fh:
            fh.write(b"junk")
        gone = iceberg_remove_orphan_files(churned)
        assert gone == [orphan]
        assert read_iceberg(spark, churned).count() == rows
        assert iceberg_remove_orphan_files(churned) == []


class TestSortedBy:
    def test_sorted_write_tightens_bounds_and_prunes(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        # hash-distributed input: WITHOUT sorted_by every file spans the
        # whole key range and metrics pruning is useless
        df = (
            spark.range(0, 800)
            .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
            .repartition(8, "v")
        )
        iceberg_create(df, loc, sorted_by=["k"])
        t = IcebergTable(loc)
        md = t.metadata
        assert md["default-sort-order-id"] == 1
        assert md["sort-orders"][1]["fields"][0]["direction"] == "asc"
        t.read(spark, partition_filter=[("k", "=", 5)])
        assert t.last_scan["scanned_data_files"] == 1
        t.read(spark, partition_filter=[("k", ">=", 700)])
        assert t.last_scan["scanned_data_files"] == 1

    def test_unsorted_same_input_does_not_prune(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        df = (
            spark.range(0, 800)
            .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
            .repartition(8, "v")
        )
        iceberg_create(df, loc)
        t = IcebergTable(loc)
        t.read(spark, partition_filter=[("k", "=", 5)])
        # every file spans the whole k range -> nothing prunes
        assert (
            t.last_scan["scanned_data_files"]
            == t.last_scan["candidate_data_files"]
        )

    def test_append_reapplies_sort_order(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        iceberg_create(
            spark.range(0, 100).select(F.col("id").alias("k")),
            loc,
            sorted_by=["k"],
        )
        iceberg_append(
            spark.range(100, 900)
            .select(F.col("id").alias("k"))
            .repartition(8),
            loc,
        )
        t = IcebergTable(loc)
        t.read(spark, partition_filter=[("k", "=", 500)])
        assert t.last_scan["scanned_data_files"] == 1
        assert read_iceberg(spark, loc).count() == 900

    def test_desc_direction(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        iceberg_create(
            spark.range(0, 100).select(F.col("id").alias("k")).repartition(4),
            loc,
            sorted_by=[("k", "desc")],
        )
        t = IcebergTable(loc)
        t.read(spark, partition_filter=[("k", "<", 10)])
        assert t.last_scan["scanned_data_files"] == 1


class TestCallProcedures:
    def test_call_routes_to_iceberg(self, spark, churned):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        rows = read_iceberg(spark, churned).count()
        eng.sql(f"CALL system.optimize('{churned}')")
        assert len(IcebergTable(churned).data_files()) == 4
        eng.sql(f"CALL system.expire_snapshots('{churned}', 1)")
        assert len(IcebergTable(churned).snapshots()) == 1
        eng.sql(f"CALL system.remove_orphan_files('{churned}')")
        assert read_iceberg(spark, churned).count() == rows


class TestOptimizeEmptyTable:
    def test_optimize_after_full_delete_keeps_table_readable(
        self, spark, tmp_path
    ):
        # ADVICE r7: OPTIMIZE after a full-table DELETE used to commit a
        # zero-data-file replace snapshot that read() refused to serve
        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 20).selectExpr("id AS k"), loc)
        assert iceberg_delete(spark, loc, "k >= 0") == 20
        assert read_iceberg(spark, loc).count() == 0
        iceberg_optimize(spark, loc)
        out = read_iceberg(spark, loc)
        assert out.count() == 0
        assert out.columns == ["k"]
        # and optimize on the already-empty table is a no-op, not a crash
        iceberg_optimize(spark, loc)
        assert read_iceberg(spark, loc).count() == 0


class TestExpireRetentionThreshold:
    def test_duration_argument_expires_older_than(self, spark, churned):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        # all snapshots are seconds old -> a 7d retention keeps everything
        eng.sql(f"CALL system.expire_snapshots('{churned}', '7d')")
        assert len(IcebergTable(churned).snapshots()) == 5
        # a 0s retention expires everything but the current snapshot
        eng.sql(f"CALL system.expire_snapshots('{churned}', '0s')")
        assert len(IcebergTable(churned).snapshots()) == 1
        assert read_iceberg(spark, churned).count() == 92

    def test_interval_literal_and_bad_arg(self, spark, churned):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        eng.sql(
            f"CALL system.expire_snapshots('{churned}', INTERVAL '7' DAY)"
        )
        assert len(IcebergTable(churned).snapshots()) == 5
        with pytest.raises(ValueError, match="retention_threshold"):
            eng.sql(f"CALL system.expire_snapshots('{churned}', 1.5)")

    def test_duration_ms_parser(self):
        from trino_private_spark.api import Engine

        assert Engine._duration_ms("7d") == 7 * 86_400_000
        assert Engine._duration_ms("12H") == 12 * 3_600_000
        assert Engine._duration_ms("30m") == 30 * 60_000
        assert Engine._duration_ms("45s") == 45_000
        assert Engine._duration_ms("250ms") == 250
        assert Engine._duration_ms("INTERVAL '3' HOUR") == 3 * 3_600_000
        assert Engine._duration_ms(7) is None
        assert Engine._duration_ms("7x") is None


class TestRefs:
    def test_tag_pins_snapshot_and_survives_expire(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_maintenance import (
            iceberg_create_ref,
        )

        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 10).selectExpr("id AS k"), loc)
        iceberg_create_ref(loc, "v1", ref_type="tag")
        iceberg_append(spark.range(10, 20).selectExpr("id AS k"), loc)
        iceberg_append(spark.range(20, 30).selectExpr("id AS k"), loc)
        # the tag reads the OLD snapshot's content
        assert read_iceberg(spark, loc, ref="v1").count() == 10
        assert read_iceberg(spark, loc).count() == 30
        # expire keeps the tagged snapshot alive (reference retention)
        iceberg_expire_snapshots(loc, keep_last=1)
        assert read_iceberg(spark, loc, ref="v1").count() == 10
        snaps = {s["snapshot-id"] for s in IcebergTable(loc).snapshots()}
        assert len(snaps) == 2  # current + the tag-pinned one

    def test_refs_metadata_table_and_sql_routes(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        loc = str(tmp_path / "t")
        eng.ctas(
            "ref_t",
            "SELECT id AS k FROM RANGE(5)",
            path=loc, fmt="iceberg", dialect="spark",
        )
        eng.sql("ALTER TABLE ref_t CREATE TAG release_1")
        eng.sql("ALTER TABLE ref_t CREATE BRANCH dev")
        rows = {
            r.name: r.type
            for r in read_iceberg(spark, loc + "$refs").collect()
        }
        assert rows["release_1"] == "TAG" and rows["dev"] == "BRANCH"
        eng.sql("ALTER TABLE ref_t DROP BRANCH dev")
        names = {
            r.name for r in read_iceberg(spark, loc + "$refs").collect()
        }
        assert "dev" not in names and "release_1" in names
        # unknown ref errors with the reference's wording
        with pytest.raises(KeyError, match="reference name"):
            read_iceberg(spark, loc, ref="nope")

    def test_manifests_partition_summaries_column(self, spark, tmp_path):
        import json as _json

        loc = str(tmp_path / "t")
        df = spark.range(0, 20).select(
            F.col("id").alias("k"), (F.col("id") % 4).alias("grp")
        )
        iceberg_create(df, loc, partition_by=["grp"])
        row = read_iceberg(spark, loc + "$manifests").collect()[0]
        summ = _json.loads(row.partition_summaries)
        assert summ[0]["contains_null"] is False
        assert summ[0]["lower_bound"] == 0 and summ[0]["upper_bound"] == 3


class TestMetadataLogEntries:
    def test_log_grows_with_commits(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 5).selectExpr("id AS k"), loc)
        iceberg_append(spark.range(5, 8).selectExpr("id AS k"), loc)
        iceberg_append(spark.range(8, 9).selectExpr("id AS k"), loc)
        rows = read_iceberg(spark, loc + "$metadata_log_entries").collect()
        # 2 previous metadata versions + the current entry
        assert len(rows) == 3
        assert rows[-1].file == "(current)"
        assert rows[-1].latest_snapshot_id == 3
        # the first logged version held snapshot 1
        assert rows[0].latest_snapshot_id == 1
        assert rows[0].file.endswith("v1.metadata.json")


class TestRewriteManifests:
    """rewrite_manifests (iceberg-core RewriteManifests, registered by
    the reference as a table procedure): metadata-only manifest
    compaction — content and delete applicability must be byte-identical
    before and after, pre-rewrite snapshots stay time-travelable, and
    merged field_summaries still manifest-prune."""

    def test_merges_manifests_preserves_content(self, spark, churned):
        from trino_private_spark.sources.iceberg_maintenance import (
            iceberg_rewrite_manifests,
        )

        before = sorted(
            r["k"] for r in read_iceberg(spark, churned).collect()
        )
        pre_snap = IcebergTable(churned).current_snapshot()["snapshot-id"]
        stats = iceberg_rewrite_manifests(churned)
        assert stats["rewritten_manifests"] == 5
        assert stats["new_manifests"] == 2  # one data + one delete group
        t = IcebergTable(churned)
        t.data_files()
        assert t.last_manifest_scan["manifests_total"] == 2
        after = sorted(
            r["k"] for r in read_iceberg(spark, churned).collect()
        )
        assert after == before  # position deletes still apply (seq kept)
        # pre-rewrite time travel sees the old manifest layout
        tt = sorted(
            r["k"]
            for r in read_iceberg(
                spark, churned, snapshot_id=pre_snap
            ).collect()
        )
        assert tt == before

    def test_merged_summaries_still_prune(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_maintenance import (
            iceberg_rewrite_manifests,
        )

        loc = str(tmp_path / "t")
        df = spark.range(0, 50).select(
            F.col("id").alias("k"), (F.col("id") % 2).alias("grp")
        )
        iceberg_create(df, loc, partition_by=["grp"])
        iceberg_append(
            spark.range(50, 100).select(
                F.col("id").alias("k"), (F.col("id") % 2 + 2).alias("grp")
            ),
            loc,
        )
        stats = iceberg_rewrite_manifests(loc)
        assert stats == {"rewritten_manifests": 2, "new_manifests": 1}
        t = IcebergTable(loc)
        t.data_files(partition_filter=[("grp", "=", 99)])
        assert t.last_manifest_scan["manifests_opened"] == 0
        t.data_files(partition_filter=[("grp", "=", 3)])
        assert t.last_manifest_scan["manifests_opened"] == 1
        assert read_iceberg(spark, loc, where="grp = 3").count() == 25

    def test_noop_on_single_manifest(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_maintenance import (
            iceberg_rewrite_manifests,
        )

        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 5).selectExpr("id AS k"), loc)
        snaps_before = len(IcebergTable(loc).snapshots())
        stats = iceberg_rewrite_manifests(loc)
        assert stats["rewritten_manifests"] == 0
        assert len(IcebergTable(loc).snapshots()) == snaps_before


class TestDistributedManifestPrefetch:
    def test_prefetch_matches_serial_walk(self, spark, churned, monkeypatch):
        import trino_private_spark.sources.iceberg as ice

        t = IcebergTable(churned)
        serial = sorted(f.path for f in t.data_files())
        ice._AVRO_CACHE.clear()
        ice._DATAFILE_CACHE.clear()
        # force every manifest through the distributed decode path
        monkeypatch.setattr(ice, "MANIFEST_DRIVER_THRESHOLD", 0)
        monkeypatch.setattr(ice, "MANIFEST_DISTRIBUTED_MIN_BYTES", 0)
        dist = sorted(f.path for f in t.data_files(spark=spark))
        assert dist == serial
        assert len(ice._AVRO_CACHE) > 0  # cache was seeded by the job
        rows = sorted(r["k"] for r in read_iceberg(spark, churned).collect())
        assert len(rows) == 92

    def test_constructed_cache_reuses_entries(self, spark, churned):
        import trino_private_spark.sources.iceberg as ice

        t = IcebergTable(churned)
        first = t.data_files()
        # a second walk serves the SAME immutable tuples from the
        # constructed cache without re-reading any manifest
        ice._AVRO_CACHE.clear()
        second = t.data_files()
        assert [f.path for f in first] == [f.path for f in second]
        assert len(ice._AVRO_CACHE) == 1  # only the manifest LIST re-read


class TestOptimisticCommit:
    """atomic_write_metadata / _commit_snapshot retry: the reference's
    SnapshotProducer optimistic-concurrency shape — a lost race raises
    CommitFailedException on the raw write, and the snapshot-commit
    wrapper re-derives against the new base instead of clobbering."""

    def test_version_conflict_raises(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_write import (
            CommitFailedException,
            atomic_write_metadata,
            iceberg_create,
        )

        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 5).selectExpr("id AS k"), loc)
        t = IcebergTable(loc)
        with pytest.raises(CommitFailedException):
            # v1 is taken: a concurrent writer must NOT clobber it
            atomic_write_metadata(loc, t.metadata, 1)

    def test_commit_retries_against_new_base(self, spark, tmp_path):
        import threading

        from trino_private_spark.sources.iceberg import read_iceberg as ri

        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 10).selectExpr("id AS k"), loc)
        # two appends race: both read base v1, both target v2 — one
        # must lose the link and retry against the winner's v2
        errs: list = []

        def append(lo: int) -> None:
            try:
                iceberg_append(
                    spark.range(lo, lo + 10).selectExpr("id AS k"), loc
                )
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        t1 = threading.Thread(target=append, args=(100,))
        t2 = threading.Thread(target=append, args=(200,))
        t1.start(); t2.start(); t1.join(); t2.join()
        assert not errs
        rows = sorted(r["k"] for r in ri(spark, loc).collect())
        assert rows == sorted(
            list(range(10)) + list(range(100, 110)) + list(range(200, 210))
        )
        # three snapshots: create + both appends survived the race
        assert len(IcebergTable(loc).snapshots()) == 3


class TestRandomDmlModel:
    """Model-based sequence test: random interleavings of append /
    delete / update / optimize / rewrite_manifests must keep the
    readable table equal to a plain Python dict model after EVERY
    operation — the whole-surface interaction pin (deletes must survive
    compaction, rewrites must preserve sequence scoping, updates must
    not resurrect deleted keys)."""

    def test_random_sequences_match_model(self, spark, tmp_path):
        import random

        from trino_private_spark.sources.iceberg_maintenance import (
            iceberg_rewrite_manifests,
        )
        from trino_private_spark.sources.iceberg_write import iceberg_update

        rng = random.Random(20260816)
        next_key = [0]

        def fresh_rows(n: int) -> list[tuple[int, int]]:
            lo = next_key[0]
            next_key[0] += n
            return [(k, k * 10) for k in range(lo, lo + n)]

        for trial in range(3):
            loc = str(tmp_path / f"t{trial}")
            rows = fresh_rows(20)
            model = dict(rows)
            iceberg_create(
                spark.createDataFrame(rows, "k long, v long"), loc
            )
            for _ in range(6):
                op = rng.choice(
                    ["append", "delete", "update", "optimize", "rewrite"]
                )
                if op == "append":
                    rows = fresh_rows(rng.randint(1, 10))
                    iceberg_append(
                        spark.createDataFrame(rows, "k long, v long"), loc
                    )
                    model.update(rows)
                elif op == "delete":
                    m = rng.randint(2, 5)
                    iceberg_delete(spark, loc, f"k % {m} = 0")
                    model = {k: v for k, v in model.items() if k % m != 0}
                elif op == "update":
                    m = rng.randint(2, 5)
                    iceberg_update(
                        spark, loc, {"v": "v + 1"}, f"k % {m} = 1"
                    )
                    model = {
                        k: (v + 1 if k % m == 1 else v)
                        for k, v in model.items()
                    }
                elif op == "optimize":
                    iceberg_optimize(spark, loc)
                else:
                    iceberg_rewrite_manifests(loc)
                got = sorted(
                    (r["k"], r["v"])
                    for r in read_iceberg(spark, loc).collect()
                )
                assert got == sorted(model.items()), (trial, op)


class TestRewritePruneEquivalence:
    """Randomized prune-equivalence: after rewrite_manifests the merged
    field_summaries must NEVER change query results — for random
    predicates, the manifest-pruned read equals the unpruned read
    row-for-row (conservative-skip invariant, end to end)."""

    def test_random_predicates_match_unpruned(self, spark, tmp_path):
        import random

        from trino_private_spark.sources.iceberg_maintenance import (
            iceberg_rewrite_manifests,
        )

        rng = random.Random(8)
        loc = str(tmp_path / "t")
        # three appends with disjoint-ish grp windows so summaries are
        # non-trivial, then a delete so a delete manifest joins the mix
        df = spark.range(0, 60).select(
            F.col("id").alias("k"), (F.col("id") % 5).alias("grp")
        )
        iceberg_create(df, loc, partition_by=["grp"])
        iceberg_append(
            spark.range(60, 120).select(
                F.col("id").alias("k"), (F.col("id") % 4 + 3).alias("grp")
            ),
            loc,
        )
        iceberg_delete(spark, loc, "k % 7 = 0")
        iceberg_rewrite_manifests(loc)
        t = IcebergTable(loc)
        full = {}
        for _ in range(8):
            op = rng.choice(["=", "<", ">", "<=", ">="])
            lit = rng.randint(-1, 8)
            key = (op, lit)
            if key not in full:
                full[key] = sorted(
                    r["k"]
                    for r in t.read(spark)
                    .where(f"grp {op} {lit}")
                    .collect()
                )
            pruned = sorted(
                r["k"]
                for r in t.read(
                    spark, partition_filter=[("grp", op, lit)]
                )
                .where(f"grp {op} {lit}")
                .collect()
            )
            assert pruned == full[key], key


class TestPartialOptimize:
    """Partial OPTIMIZE (the reference's optimize(file_size_threshold)
    + WHERE partition predicate): only matching/small files rewrite;
    everything else — data files AND delete files — carries over as
    EXISTING entries with resolved sequence numbers."""

    def test_where_scopes_compaction(self, spark, churned):
        before = sorted(
            (r["k"], r["grp"])
            for r in read_iceberg(spark, churned).collect()
        )
        t = IcebergTable(churned)
        old = {
            dict(f.partition or ()).get("grp"): f.path
            for f in t.data_files()
            if f.content == 0
            and dict(f.partition or ()).get("grp") != 0
        }
        stats = iceberg_optimize(spark, churned, where="grp = 0")
        assert stats["rewritten_files"] == 1
        assert stats["compacted_files"] == 2
        t2 = IcebergTable(churned)
        d2 = [f for f in t2.data_files() if f.content == 0]
        by_grp: dict = {}
        for f in d2:
            by_grp.setdefault(dict(f.partition or ()).get("grp"), []).append(
                f.path
            )
        assert len(by_grp[0]) == 1  # grp 0 compacted to one file
        # untouched partitions keep their EXACT old files
        for grp, path in old.items():
            assert path in by_grp[grp]
        # deletes on untouched files still apply
        after = sorted(
            (r["k"], r["grp"])
            for r in read_iceberg(spark, churned).collect()
        )
        assert after == before

    def test_threshold_scopes_by_size(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        # one big file + three tiny ones
        iceberg_create(
            spark.range(0, 5000).selectExpr("id AS k").coalesce(1), loc
        )
        for i in range(3):
            iceberg_append(
                spark.createDataFrame([(10_000 + i,)], "k long"), loc
            )
        t = IcebergTable(loc)
        sizes = sorted(
            f.file_size_in_bytes for f in t.data_files()
        )
        thr = sizes[-1]  # everything smaller than the big file
        stats = iceberg_optimize(
            spark, loc, file_size_threshold_bytes=thr
        )
        assert stats["compacted_files"] == 3
        t2 = IcebergTable(loc)
        d2 = [f for f in t2.data_files() if f.content == 0]
        assert len(d2) == 2  # big file untouched + one merged small file
        assert max(f.file_size_in_bytes for f in d2) == sizes[-1]
        assert read_iceberg(spark, loc).count() == 5003

    def test_noop_when_nothing_qualifies(self, spark, churned):
        snaps = len(IcebergTable(churned).snapshots())
        stats = iceberg_optimize(spark, churned, where="grp = 99")
        assert stats == {
            "rewritten_files": 0, "compacted_files": 0, "rows": 0
        }
        assert len(IcebergTable(churned).snapshots()) == snaps
