"""§2.8 extension surface: parity with the reference's custom-function test
trio (testing/trino-testing CustomAdd.java / CustomSum.java /
CustomRank.java) plus the prepared-statement path (SqlBase.g4:153-155)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from trino_private_spark.extensions import Extensions


def test_custom_add_scalar(spark):
    ext = Extensions(spark)
    ext.scalar("custom_add", lambda a, b: a + b)
    df = spark.range(5).select(
        ext.col("custom_add", F.col("id"), F.lit(10)).alias("v")
    )
    assert [r.v for r in df.collect()] == [10, 11, 12, 13, 14]
    assert ext.registered()["custom_add"] == "scalar"


def test_custom_scalar_python_sql_callable(spark):
    ext = Extensions(spark)
    ext.scalar_python("custom_reverse_upper", lambda s: s[::-1].upper(), "string")
    got = spark.sql("SELECT custom_reverse_upper('abc') AS v").collect()[0].v
    assert got == "CBA"
    got2 = spark.range(1).select(
        ext.col("custom_reverse_upper", F.lit("xyz")).alias("v")
    ).collect()[0].v
    assert got2 == "ZYX"


def test_custom_sum_aggregate(spark):
    ext = Extensions(spark)
    ext.aggregate("custom_sum", lambda v: float(v.sum()), "double")
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 10.0)], "g string, x double"
    )
    got = {
        r.g: r.s
        for r in df.groupBy("g").agg(ext.col("custom_sum", F.col("x")).alias("s")).collect()
    }
    assert got == {"a": 3.0, "b": 10.0}


def test_custom_rank_window(spark):
    ext = Extensions(spark)

    def dense_rank_desc(pdf: pd.DataFrame) -> pd.Series:
        return pdf["x"].rank(method="dense", ascending=False).astype("int64")

    ext.window_rank("custom_rank", dense_rank_desc)
    df = spark.createDataFrame(
        [("a", 5.0), ("a", 7.0), ("a", 7.0), ("b", 1.0)], "g string, x double"
    )
    out = ext.over_partitions("custom_rank", df, "g", "x", "rnk")
    got = sorted((r.g, r.x, r.rnk) for r in out.collect())
    assert got == [("a", 5.0, 2), ("a", 7.0, 1), ("a", 7.0, 1), ("b", 1.0, 1)]


def test_prepare_execute_deallocate(spark):
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach("/root/testdata/sf0.001")
    eng.prepare("top_orders",
                "SELECT o_orderkey FROM orders WHERE o_totalprice > ? "
                "ORDER BY o_orderkey FETCH FIRST 5 ROWS ONLY")
    a = eng.execute("top_orders", 100.0).collect()
    b = eng.execute("top_orders", 100000.0).collect()
    assert len(a) == 5 and len(b) <= 5
    eng.deallocate("top_orders")
    try:
        eng.execute("top_orders")
        raised = False
    except KeyError:
        raised = True
    assert raised


def test_set_time_zone(spark):
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        eng.set_time_zone("America/New_York")
        assert spark.conf.get("spark.sql.session.timeZone") == "America/New_York"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)


def test_materialized_view_lifecycle(spark, tmp_path):
    from trino_private_spark.api import Engine

    eng = Engine(spark)
    eng.attach("/root/testdata/sf0.001")
    mv = str(tmp_path / "mv_orders")
    eng.create_materialized_view(
        "mv_totals",
        "SELECT o_orderstatus, COUNT(*) AS c FROM orders GROUP BY o_orderstatus",
        mv,
    )
    first = {r.o_orderstatus: r.c for r in spark.table("mv_totals").collect()}
    assert sum(first.values()) > 0
    eng.refresh_materialized_view("mv_totals")
    second = {r.o_orderstatus: r.c for r in spark.table("mv_totals").collect()}
    assert first == second  # same definition, same data -> same content
    eng.drop_materialized_view("mv_totals")


class TestTimeTravel:
    """Snapshot versioning + time travel on CoW tables (the Iceberg
    surface the reference ships: FOR VERSION/TIMESTAMP AS OF, $snapshots,
    rollback_to_snapshot)."""

    def _mk(self, spark, tmp_path):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        eng.attach(__import__("tests.conftest", fromlist=["SF_SMOKE"]).SF_SMOKE)
        eng.create_cow_table(
            "tt_orders", "SELECT * FROM orders WHERE o_orderkey <= 100",
            str(tmp_path / "tt_orders"),
        )
        return eng

    def test_versions_accumulate_and_read_back(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path)
        n0 = spark.table("tt_orders").count()
        eng.delete_from("tt_orders", "o_orderkey <= 50")
        n1 = spark.table("tt_orders").count()
        assert n1 < n0
        # v0 still reads the original rows
        assert eng.read_version("tt_orders", 0).count() == n0
        assert eng.read_version("tt_orders", 1).count() == n1
        with pytest.raises(ValueError):
            eng.read_version("tt_orders", 9)

    def test_snapshots_metadata(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path)
        eng.delete_from("tt_orders", "o_orderkey <= 10")
        eng.update("tt_orders", {"o_totalprice": "o_totalprice * 2"}, "o_orderkey > 90")
        snaps = eng.snapshots("tt_orders").orderBy("version").collect()
        assert [s["operation"] for s in snaps] == ["create", "delete", "update"]
        assert [s["is_current"] for s in snaps] == [False, False, True]
        assert all(
            a["committed_at_ms"] <= b["committed_at_ms"]
            for a, b in zip(snaps, snaps[1:])
        )

    def test_timestamp_as_of(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path)
        n0 = spark.table("tt_orders").count()
        t_mid = eng.snapshots("tt_orders").collect()[0]["committed_at_ms"]
        import time

        time.sleep(0.01)
        eng.delete_from("tt_orders", "o_orderkey <= 50")
        assert eng.read_as_of("tt_orders", t_mid).count() == n0
        with pytest.raises(ValueError):
            eng.read_as_of("tt_orders", 0)

    def test_rollback_preserves_history(self, spark, tmp_path):
        eng = self._mk(spark, tmp_path)
        n0 = spark.table("tt_orders").count()
        eng.delete_from("tt_orders", "o_orderkey <= 50")
        eng.rollback_to("tt_orders", 0)
        assert spark.table("tt_orders").count() == n0
        snaps = eng.snapshots("tt_orders").orderBy("version").collect()
        assert snaps[-1]["operation"] == "rollback_to_v0"
        # the deleted snapshot is still readable
        assert eng.read_version("tt_orders", 1).count() < n0


class TestSessionPropertyMap:
    def test_cbo_flags_roundtrip(self, spark):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        eng.set_session("join_distribution_type", "PARTITIONED")
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
        eng.set_session("join_distribution_type", "AUTOMATIC")
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "64MB"
        eng.set_session("join_reordering_strategy", "AUTOMATIC")
        assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "true"
        eng.set_session("join_reordering_strategy", "ELIMINATE_CROSS_JOINS")
        assert spark.conf.get("spark.sql.cbo.joinReorder.enabled") == "false"
        eng.set_session("hash_partition_count", "17")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "17"
        # restore the suite defaults
        eng.set_session("hash_partition_count", "32")
        # unmapped keys pass through verbatim
        eng.set_session("spark.sql.session.timeZone", "UTC")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


class TestAnalyzeShowStats:
    """ANALYZE (SqlBase.g4:79) + SHOW STATS FOR (SqlBase.g4:138) shims —
    reference result-set shape per ShowStatsRewrite.java:196-202, stats fed
    into the Spark catalog so CBO consumes them."""

    def test_analyze_and_show_stats(self, spark):
        from tests.conftest import SF_SMOKE
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        eng.attach(SF_SMOKE)
        try:
            eng.sql("ANALYZE region")
            stats = eng.sql("SHOW STATS FOR region").collect()
            by_col = {r["column_name"]: r for r in stats}
            assert set(by_col) == {"r_regionkey", "r_name", None}
            summary = by_col[None]
            assert summary["row_count"] == 5.0
            rk = by_col["r_regionkey"]
            assert rk["distinct_values_count"] == 5.0
            assert rk["nulls_fraction"] == 0.0
            assert rk["low_value"] == "0" and rk["high_value"] == "4"
            assert by_col["r_name"]["data_size"] is not None
        finally:
            spark.sql("DROP TABLE IF EXISTS region")
            eng.attach(SF_SMOKE)

    def test_cbo_reads_analyze_stats(self, spark):
        """After ANALYZE, the optimized logical plan carries a defined
        rowCount (Catalyst CBO statistics propagated from the catalog) —
        the reference's ANALYZE -> ReorderJoins stats path."""
        from tests.conftest import SF_SMOKE
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        eng.attach(SF_SMOKE)
        # CBO must be on for Catalyst to propagate rowCount (an earlier
        # test may have toggled it via the session-property map)
        prior = spark.conf.get("spark.sql.cbo.enabled")
        spark.conf.set("spark.sql.cbo.enabled", "true")
        try:
            eng.sql("ANALYZE region")
            eng.sql("ANALYZE nation")
            df = eng.sql(
                "SELECT n.n_name, r.r_name FROM nation n "
                "JOIN region r ON n.n_regionkey = r.r_regionkey"
            )
            stats = df._jdf.queryExecution().optimizedPlan().stats()
            assert stats.rowCount().isDefined()
        finally:
            spark.conf.set("spark.sql.cbo.enabled", prior)
            spark.sql("DROP TABLE IF EXISTS region")
            spark.sql("DROP TABLE IF EXISTS nation")
            eng.attach(SF_SMOKE)


class TestShowSessionAndCall:
    """SHOW SESSION and CALL statement routing (SqlBase.g4:94,146-147) —
    reference result shape per ShowQueriesRewrite (Name/Value/Default/
    Type/Description) and connector procedures (RollbackToSnapshotProcedure)."""

    def test_show_session_defaults_and_overrides(self, spark):
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        df = eng.sql("SHOW SESSION")
        assert df.columns == ["Name", "Value", "Default", "Type",
                              "Description"]
        by_name = {r["Name"]: r for r in df.collect()}
        assert "join_reordering_strategy" in by_name
        assert by_name["join_distribution_type"]["Value"] == "AUTOMATIC"
        prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            eng.set_session("join_distribution_type", "PARTITIONED")
            by_name = {
                r["Name"]: r for r in eng.sql("SHOW SESSION").collect()
            }
            assert by_name["join_distribution_type"]["Value"] == "PARTITIONED"
            assert by_name["join_distribution_type"]["Default"] == "AUTOMATIC"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)

    def test_call_rollback_to_snapshot(self, spark, tmp_path):
        from tests.conftest import SF_SMOKE
        from trino_private_spark.api import Engine

        eng = Engine(spark)
        eng.attach(SF_SMOKE)
        eng.create_cow_table("call_t", "SELECT * FROM region",
                             str(tmp_path / "call_t"))
        eng.delete_from("call_t", "r_regionkey < 3")
        assert eng.sql("SELECT count(*) c FROM call_t").collect()[0].c == 2
        eng.sql("CALL system.rollback_to_snapshot('call_t', 0)")
        assert eng.sql("SELECT count(*) c FROM call_t").collect()[0].c == 5

    def test_call_unknown_procedure(self, spark):
        import pytest as _pytest

        from trino_private_spark.api import Engine

        eng = Engine(spark)
        with _pytest.raises(ValueError, match="Procedure not registered"):
            eng.sql("CALL system.create_empty_partition('a', 'b')")


class TestEngineIcebergFormat:
    """Engine-level Iceberg format routing: ctas(fmt='iceberg') commits a
    real v2 table (sources/iceberg_write.py), insert_into appends a
    snapshot, and the registered view reads through the shim."""

    def test_ctas_insert_roundtrip(self, spark, tmp_path):
        from tests.conftest import SF_SMOKE
        from trino_private_spark.api import Engine
        from trino_private_spark.sources.iceberg import IcebergTable

        eng = Engine(spark)
        eng.attach(SF_SMOKE)
        loc = str(tmp_path / "ice_t")
        eng.ctas("ice_t", "SELECT r_regionkey, r_name FROM region",
                 path=loc, fmt="iceberg")
        assert eng.sql("SELECT count(*) c FROM ice_t").collect()[0].c == 5
        eng.insert_into(
            loc,
            "SELECT r_regionkey + 10 AS r_regionkey, r_name FROM region",
            fmt="iceberg",
        )
        t = IcebergTable(loc)
        assert len(t.snapshots()) == 2
        assert t.read(spark).count() == 10
