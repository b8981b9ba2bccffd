"""Round-10 fixes from the round-9 VERDICT/ADVICE punch list:

- __icep_* pruned-view lifecycle holds at SESSION scope (What's wrong #2:
  per-Engine tracking leaked views from abandoned Engine instances).
- $snapshots matches the reference schema (SnapshotsTable.java:53-58:
  committed_at TIMESTAMP WITH TIME ZONE, parent_id BIGINT).
- expire_snapshots commits the trimmed metadata BEFORE deleting files
  (ADVICE #1: the reverse order strands survivors on a CAS conflict).
- ANALYZE-promoted CBO tables are demoted when uncommitted files appear
  in data/ (ADVICE #2: the directory-scan table would serve dirty rows).
- absent contains_null in a manifest field_summary widens instead of
  pruning IS NULL (ADVICE #3).
- INSERT column lists accept reserved-word and quoted column names
  (ADVICE #5).
"""

import glob
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from trino_private_spark import api as api_mod
from trino_private_spark.api import Engine
from trino_private_spark.sources.iceberg import IcebergTable, read_iceberg
from trino_private_spark.sources.iceberg_write import (
    iceberg_append,
    iceberg_create,
)


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


def _register(eng, spark, name, df, partition_by=None):
    loc = tempfile.mkdtemp(prefix=f"tps_r10_{name}_") + "/t"
    iceberg_create(df, loc, partition_by=partition_by)
    if not hasattr(eng, "_iceberg_views"):
        eng._iceberg_views = {}
    eng._iceberg_views[name] = loc
    read_iceberg(spark, loc).createOrReplaceTempView(name)
    return loc


class TestIcepSessionLifecycle:
    def _icep_views(self, spark):
        return {
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("__icep_")
        }

    def test_abandoned_engine_views_swept(self, spark):
        df = spark.range(0, 100).select(
            (F.col("id") % 3).cast("int").alias("grp"),
            F.col("id").alias("v"),
        )
        e1 = Engine(spark)
        _register(e1, spark, "lc_a", df, partition_by=["grp"])
        e1.sql("SELECT COUNT(*) AS n FROM lc_a WHERE grp = 1").collect()
        leaked = self._icep_views(spark)
        assert leaked, "expected e1 to have created pruned views"
        # abandon e1; a DIFFERENT engine's next statement must sweep them
        e2 = Engine(spark)
        _register(e2, spark, "lc_b", df, partition_by=["grp"])
        e2.sql("SELECT COUNT(*) AS n FROM lc_b WHERE grp = 2").collect()
        now = self._icep_views(spark)
        assert not (leaked & now), f"abandoned engine's views leaked: {leaked & now}"
        # only e2's CURRENT statement's views remain, all ledgered
        ledger = set(
            api_mod._ICEP_LIVE_BY_SESSION.get(spark, [])
        )
        assert now <= ledger

    def test_session_catalog_bounded_over_statements(self, spark):
        df = spark.range(0, 60).select(
            (F.col("id") % 3).cast("int").alias("grp"),
            F.col("id").alias("v"),
        )
        e = Engine(spark)
        _register(e, spark, "lc_c", df, partition_by=["grp"])
        for i in range(8):
            e.sql(
                f"SELECT COUNT(*) AS n FROM lc_c WHERE grp = {i % 3}"
            ).collect()
        # bounded: at most the LAST statement's views survive
        assert len(self._icep_views(spark)) <= 1


class TestSnapshotsReferenceSchema:
    def test_shape_and_parent_ids(self, eng, spark):
        loc = _register(
            eng, spark, "snap_t",
            spark.range(0, 10).selectExpr("id AS v"),
        )
        iceberg_append(spark.range(10, 20).selectExpr("id AS v"), loc)
        df = read_iceberg(spark, loc + "$snapshots")
        # SnapshotsTable.java:53-58 column order, + sequence_number ext
        assert df.columns == [
            "committed_at", "snapshot_id", "parent_id", "operation",
            "manifest_list", "summary", "sequence_number",
        ]
        assert dict(df.dtypes)["committed_at"] == "timestamp"
        assert dict(df.dtypes)["parent_id"] == "bigint"
        rows = df.orderBy("committed_at").collect()
        assert rows[0]["parent_id"] is None
        assert rows[1]["parent_id"] == rows[0]["snapshot_id"]

    def test_reference_sql_order_by_committed_at(self, eng, spark):
        ops = [
            r["operation"]
            for r in eng.sql(
                'SELECT operation FROM "snap_t$snapshots" '
                "ORDER BY committed_at"
            ).collect()
        ]
        assert ops == ["append", "append"]


class TestExpireCommitThenClean:
    def _table_with_history(self, spark):
        loc = tempfile.mkdtemp(prefix="tps_r10_exp_") + "/t"
        iceberg_create(spark.range(0, 5).selectExpr("id AS v"), loc)
        iceberg_append(spark.range(5, 10).selectExpr("id AS v"), loc)
        iceberg_append(spark.range(10, 15).selectExpr("id AS v"), loc)
        return loc

    def test_failed_commit_deletes_nothing(self, spark, monkeypatch):
        from trino_private_spark.sources import iceberg_maintenance as M

        loc = self._table_with_history(spark)
        before = set(glob.glob(os.path.join(loc, "**", "*"), recursive=True))

        def boom(*a, **k):
            raise RuntimeError("simulated CommitFailedException")

        monkeypatch.setattr(M, "_write_metadata", boom)
        with pytest.raises(RuntimeError):
            M.iceberg_expire_snapshots(loc, keep_last=1)
        after = set(glob.glob(os.path.join(loc, "**", "*"), recursive=True))
        assert before == after, "files deleted before the commit landed"
        # the table still reads fully and old snapshots are intact
        assert read_iceberg(spark, loc).count() == 15
        assert len(IcebergTable(loc).snapshots()) == 3

    def test_successful_expire_still_cleans(self, spark):
        from trino_private_spark.sources import iceberg_maintenance as M

        loc = self._table_with_history(spark)
        res = M.iceberg_expire_snapshots(loc, keep_last=1)
        assert res["expired_snapshots"] == 2
        assert res["deleted_files"] > 0
        assert read_iceberg(spark, loc).count() == 15  # current unaffected


class TestCboDirtyDirectoryDemotion:
    def test_uncommitted_file_demotes_promotion(self, eng, spark):
        loc = _register(
            eng, spark, "cbo_dirty",
            spark.range(0, 50).selectExpr("id AS v"),
        )
        eng.sql("ANALYZE cbo_dirty")
        assert "cbo_dirty" in getattr(eng, "_iceberg_cbo", {})
        n0 = eng.sql("SELECT COUNT(*) AS n FROM cbo_dirty").collect()[0]["n"]
        assert n0 == 50
        # a writer crashes after writing data files, before its commit:
        # the file is in data/ but in NO manifest
        spark.range(1000, 1100).selectExpr("id AS v").coalesce(
            1
        ).write.mode("overwrite").parquet(os.path.join(loc, "_stage"))
        part = glob.glob(os.path.join(loc, "_stage", "*.parquet"))[0]
        os.rename(part, os.path.join(loc, "data", "orphan-uncommitted.parquet"))
        n1 = eng.sql("SELECT COUNT(*) AS n FROM cbo_dirty").collect()[0]["n"]
        assert n1 == 50, "dirty directory rows served through CBO promotion"
        assert "cbo_dirty" not in getattr(eng, "_iceberg_cbo", {})

    def test_clean_promotion_survives_statements(self, eng, spark):
        _register(
            eng, spark, "cbo_clean",
            spark.range(0, 30).selectExpr("id AS v"),
        )
        eng.sql("ANALYZE cbo_clean")
        for _ in range(3):
            assert (
                eng.sql(
                    "SELECT COUNT(*) AS n FROM cbo_clean"
                ).collect()[0]["n"]
                == 30
            )
        assert "cbo_clean" in eng._iceberg_cbo


class TestContainsNullAbsentWidens:
    def test_absent_contains_null_never_prunes_is_null(self):
        from trino_private_spark.sources.iceberg_partition import (
            PartitionField,
            _summary_possible,
        )

        f = PartitionField(
            name="k", source_name="k",
            source_type="long", transform="identity",
        )
        # spec-required key MISSING (externally written summary)
        assert _summary_possible(f, {}, "isnull", None) is True
        assert _summary_possible(f, {"contains_null": None}, "isnull", None) is True
        # explicit False still proves null-free -> prune allowed
        assert _summary_possible(f, {"contains_null": False}, "isnull", None) is False
        assert _summary_possible(f, {"contains_null": True}, "isnull", None) is True


class TestInsertColumnListGuard:
    def test_column_named_values(self, eng, spark):
        df = spark.createDataFrame([(1, 10)], "k int, values int")
        _register(eng, spark, "ins_vals", df)
        eng.sql("INSERT INTO ins_vals (values, k) SELECT 20, 2")
        rows = sorted(
            (r["k"], r["values"]) for r in spark.table("ins_vals").collect()
        )
        assert rows == [(1, 10), (2, 20)]

    def test_quoted_column_list(self, eng, spark):
        df = spark.createDataFrame([(1, 10)], "k int, v int")
        _register(eng, spark, "ins_q", df)
        eng.sql('INSERT INTO ins_q ("v", "k") VALUES (30, 3)')
        rows = sorted(
            (r["k"], r["v"]) for r in spark.table("ins_q").collect()
        )
        assert rows == [(1, 10), (3, 30)]

    def test_parenthesized_query_still_query(self, eng, spark):
        df = spark.createDataFrame([(1,)], "k int")
        _register(eng, spark, "ins_pq", df)
        eng.sql("INSERT INTO ins_pq (SELECT 9)")
        assert sorted(
            r["k"] for r in spark.table("ins_pq").collect()
        ) == [1, 9]
