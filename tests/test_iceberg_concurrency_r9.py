"""Round-9 commit-protocol hardening (r8 ADVICE + VERDICT):

1. metadata-only commits (refs, rollback, expire, rewrite_manifests,
   ANALYZE stats) must CAS against the version they LOADED — a commit
   landing between read and write must surface CommitFailedException,
   never silently erase the concurrent writer's snapshots;
2. replace commits (OPTIMIZE) must validate their planned parent
   snapshot and REFUSE blind retry — a concurrent append between
   optimize planning and commit would otherwise be dropped from the
   replace manifest list (data loss);
3. the streaming Iceberg sink's idempotence check must be O(1)-ish and
   race-safe: two writers replaying the same batch id commit it exactly
   once, with the re-check running INSIDE the optimistic-commit retry.

Reference shape: org.apache.iceberg SnapshotProducer commit validation
and RewriteFiles conflict detection, surfaced through
plugin/trino-iceberg as CommitFailedException.
"""

from __future__ import annotations

import threading

import pytest

from trino_private_spark.sources.iceberg import IcebergTable, read_iceberg
from trino_private_spark.sources.iceberg_write import (
    CommitConflictException,
    CommitFailedException,
    iceberg_append,
    iceberg_create,
)


class TestMetadataOnlyCas:
    def test_loaded_version_recorded(self, spark, tmp_path):
        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 5).selectExpr("id AS k"), loc)
        assert IcebergTable(loc).loaded_version == 1
        iceberg_append(spark.range(5, 8).selectExpr("id AS k"), loc)
        assert IcebergTable(loc).loaded_version == 2

    def test_stale_ref_write_raises_not_clobbers(self, spark, tmp_path):
        """create_ref on a STALE table handle: an append lands between
        the metadata read and the ref write. The CAS must fail loudly —
        before round 9 the stale base silently erased the append's
        snapshot from the written metadata."""
        from trino_private_spark.sources.iceberg_maintenance import (
            _write_metadata,
        )

        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 5).selectExpr("id AS k"), loc)
        stale = IcebergTable(loc)  # loaded v1
        iceberg_append(spark.range(5, 8).selectExpr("id AS k"), loc)  # v2
        md = dict(stale.metadata)
        md["refs"] = {"b1": {"snapshot-id": 1, "type": "branch"}}
        with pytest.raises(CommitFailedException):
            _write_metadata(loc, md, stale.loaded_version)
        # the append's snapshot survived
        assert len(IcebergTable(loc).snapshots()) == 2

    def test_create_ref_still_works(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_maintenance import (
            iceberg_create_ref,
        )

        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 5).selectExpr("id AS k"), loc)
        iceberg_create_ref(loc, "b1", "branch")
        assert "b1" in (IcebergTable(loc).metadata.get("refs") or {})


class TestReplaceConflict:
    def test_optimize_with_concurrent_append_raises(self, spark, tmp_path):
        """A commit that lands between OPTIMIZE's planning read and its
        replace commit must raise CommitConflictException (forcing a
        re-plan), NEVER silently drop the concurrent append's rows —
        the reference's RewriteFiles.validate behavior."""
        from trino_private_spark.sources import iceberg_write as iw

        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 10).selectExpr("id AS k"), loc)
        iceberg_append(spark.range(10, 20).selectExpr("id AS k"), loc)

        real_once = iw._commit_snapshot_once
        raced = {"done": False}

        def once_with_race(location, groups, **kw):
            if not raced["done"] and kw.get("replace"):
                raced["done"] = True
                iceberg_append(
                    spark.range(500, 510).selectExpr("id AS k"), loc
                )
            return real_once(location, groups, **kw)

        iw._commit_snapshot_once = once_with_race
        try:
            from trino_private_spark.sources.iceberg_maintenance import (
                iceberg_optimize,
            )

            with pytest.raises(CommitConflictException):
                iceberg_optimize(spark, loc)
        finally:
            iw._commit_snapshot_once = real_once
        # nothing lost: base rows + both appends all present
        rows = sorted(r["k"] for r in read_iceberg(spark, loc).collect())
        assert rows == sorted(
            list(range(20)) + list(range(500, 510))
        )

    def test_optimize_clean_path_still_works(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_maintenance import (
            iceberg_optimize,
        )

        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 10).selectExpr("id AS k"), loc)
        iceberg_append(spark.range(10, 20).selectExpr("id AS k"), loc)
        stats = iceberg_optimize(spark, loc)
        assert stats["rows"] == 20
        assert read_iceberg(spark, loc).count() == 20


class TestSinkIdempotence:
    def _mk(self, spark, tmp_path):
        loc = str(tmp_path / "sink")
        iceberg_create(
            spark.range(0, 0).selectExpr("id AS k"), loc
        )
        return loc

    def test_max_committed_batch_scan(self, spark, tmp_path):
        from trino_private_spark.streaming.events import (
            _max_committed_batch,
        )

        loc = self._mk(spark, tmp_path)
        assert _max_committed_batch(IcebergTable(loc).metadata) is None
        iceberg_append(
            spark.range(0, 3).selectExpr("id AS k"), loc,
            summary_extra={"streaming-batch-id": "0"},
        )
        # a non-streaming commit interleaves; the scan-back still finds
        # the newest streaming marker
        iceberg_append(spark.range(3, 5).selectExpr("id AS k"), loc)
        assert _max_committed_batch(IcebergTable(loc).metadata) == 0

    def test_sequential_replay_skipped(self, spark, tmp_path):
        from trino_private_spark.streaming.events import (
            _commit_streaming_batch,
        )

        loc = self._mk(spark, tmp_path)
        df = spark.range(0, 5).selectExpr("id AS k")
        _commit_streaming_batch(df, 0, loc)
        _commit_streaming_batch(df, 0, loc)  # replay: must skip
        assert read_iceberg(spark, loc).count() == 5
        _commit_streaming_batch(df, 1, loc)
        assert read_iceberg(spark, loc).count() == 10

    def test_two_writer_race_commits_once(self, spark, tmp_path):
        """Two zombie instances of the same stream replay the SAME batch
        id concurrently: both pass the fast pre-check, the commit-time
        re-check (inside the optimistic retry) must let exactly one
        through."""
        from trino_private_spark.streaming.events import (
            _commit_streaming_batch,
        )

        loc = self._mk(spark, tmp_path)
        df = spark.range(0, 7).selectExpr("id AS k")
        errs: list = []

        def write():
            try:
                _commit_streaming_batch(df, 0, loc)
            except Exception as exc:  # noqa: BLE001
                errs.append(exc)

        ts = [threading.Thread(target=write) for _ in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs
        assert read_iceberg(spark, loc).count() == 7
        marks = [
            (s.get("summary") or {}).get("streaming-batch-id")
            for s in IcebergTable(loc).snapshots()
        ]
        assert marks.count("0") == 1


class TestStatsStaleness:
    def test_equality_deletes_flagged(self, spark, tmp_path):
        """SHOW STATS row_count cannot reflect un-applied equality
        deletes without data IO (the reference's TableStatisticsReader
        has the same blind spot) — the estimate must SAY SO: exactness
        flag off and a [low, high] bound that contains the true count."""
        import os

        import pyarrow as pa

        from trino_private_spark.sources.iceberg_stats import table_stats
        from trino_private_spark.sources.iceberg_testing import (
            write_parquet_with_ids,
        )
        from trino_private_spark.sources.iceberg_write import _commit_snapshot

        loc = str(tmp_path / "t")
        iceberg_create(
            spark.range(0, 20).selectExpr("id AS k", "id % 4 AS g"), loc
        )
        st0 = table_stats(loc)
        assert st0["row_count"] == 20
        assert st0["row_count_is_exact"] is True
        assert st0["row_count_low"] == st0["row_count_high"] == 20

        # commit an equality-delete file on g = 1 (field id 2)
        ed = os.path.join(loc, "data", "ed.parquet")
        write_parquet_with_ids(
            ed, {"g": pa.array([1], type=pa.int64())}, {"g": 2}
        )
        _commit_snapshot(
            loc,
            [(
                [{
                    "path": ed,
                    "record_count": 1,
                    "file_size_in_bytes": os.path.getsize(ed),
                    "equality_ids": [2],
                    "metrics": {},
                }],
                2,
            )],
            operation="delete",
        )
        true_rows = read_iceberg(spark, loc).count()
        st = table_stats(loc)
        assert st["row_count_is_exact"] is False
        assert st["equality_delete_files"] >= 1
        assert st["row_count_low"] <= true_rows <= st["row_count_high"]

    def test_position_deletes_bounded(self, spark, tmp_path):
        from trino_private_spark.sources.iceberg_stats import table_stats
        from trino_private_spark.sources.iceberg_write import iceberg_delete

        loc = str(tmp_path / "t")
        iceberg_create(spark.range(0, 30).selectExpr("id AS k"), loc)
        iceberg_delete(spark, loc, "k < 10")
        st = table_stats(loc)
        assert st["row_count"] == 20
        assert st["row_count_is_exact"] is False  # estimate post-deletes
        assert st["row_count_low"] <= 20 <= st["row_count_high"]
