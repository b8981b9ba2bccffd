"""ANALYZE on an Iceberg view must feed Catalyst's cost-based optimizer
(r8 VERDICT next-round #6): the NDV statistics file made SHOW STATS
work, but Catalyst never saw the stats for registered temp views —
join sizing ran stats-blind. Round 9 promotes a CLEAN analyzed Iceberg
view (no deletes, single schema, all-parquet, no stray files) to a
stats-bearing catalog table, the same one-way promotion Engine.analyze
already performs for attached parquet views; the reference's ANALYZE
has the identical side effect on its CBO (ReorderJoins /
DetermineJoinDistributionType consume connector stats).

The load-bearing assertion: a broadcast decision FLIPS with stats
present — a filtered analyzed table estimates small (ndv-based filter
selectivity) and broadcasts, while the same filter over the un-analyzed
view keeps the full scan size estimate and sort-merge-joins.
"""

from __future__ import annotations

import tempfile

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    from trino_private_spark.api import Engine

    e = Engine(spark)
    e.attach(SF)
    return e


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestCboPromotion:
    def test_analyze_promotes_to_stats_bearing_catalog_table(
        self, eng, spark
    ):
        loc = tempfile.mkdtemp(prefix="tps_cbo_") + "/t"
        eng.ctas(
            "ice_cbo_t",
            "SELECT o_orderkey, o_custkey % 50 AS k FROM orders",
            path=loc, fmt="iceberg",
        )
        eng.sql("ANALYZE ice_cbo_t")
        stats = {
            r.col_name: r.data_type
            for r in spark.sql("DESC EXTENDED ice_cbo_t").collect()
        }
        assert "Statistics" in stats and "rows" in stats["Statistics"]

    def test_promotion_skipped_with_deletes(self, eng, spark):
        """A table with merge-on-read delete files cannot be served by a
        plain parquet catalog table (it would resurrect deleted rows) —
        ANALYZE must keep the view and skip promotion."""
        loc = tempfile.mkdtemp(prefix="tps_cbo_del_") + "/t"
        eng.ctas(
            "ice_cbo_del",
            "SELECT n_nationkey AS k, n_name AS v FROM nation",
            path=loc, fmt="iceberg",
        )
        eng.sql("DELETE FROM ice_cbo_del WHERE k < 5")
        n_before = spark.table("ice_cbo_del").count()
        eng.sql("ANALYZE ice_cbo_del")
        # still the correct merge-on-read contents, not the raw files
        assert spark.table("ice_cbo_del").count() == n_before
        assert eng.sql(
            "SELECT COUNT(*) AS n FROM ice_cbo_del"
        ).collect()[0]["n"] == n_before

    def test_statement_after_write_sees_fresh_data(self, eng, spark):
        """The promoted catalog table must never serve stale rows: a
        write bumps the metadata version, so the next statement drops
        the promotion and re-registers the live view."""
        loc = tempfile.mkdtemp(prefix="tps_cbo_fresh_") + "/t"
        eng.ctas(
            "ice_cbo_fresh",
            "SELECT n_nationkey AS k FROM nation",
            path=loc, fmt="iceberg",
        )
        eng.sql("ANALYZE ice_cbo_fresh")
        n0 = eng.sql(
            "SELECT COUNT(*) AS n FROM ice_cbo_fresh"
        ).collect()[0]["n"]
        eng.sql("INSERT INTO ice_cbo_fresh SELECT 1000 AS k")
        n1 = eng.sql(
            "SELECT COUNT(*) AS n FROM ice_cbo_fresh"
        ).collect()[0]["n"]
        assert n1 == n0 + 1

    def test_broadcast_flips_with_stats(self, eng, spark):
        """cbo + analyzed stats: `small WHERE k = const` estimates
        ~rows/ndv and broadcasts; the identical filter over the
        un-analyzed twin keeps the full size estimate and must not."""
        loc_a = tempfile.mkdtemp(prefix="tps_cbo_a_") + "/t"
        loc_b = tempfile.mkdtemp(prefix="tps_cbo_b_") + "/t"
        q = "SELECT o_orderkey, o_custkey % 50 AS k FROM orders"
        eng.ctas("ice_cbo_an", q, path=loc_a, fmt="iceberg")
        eng.ctas("ice_cbo_raw", q, path=loc_b, fmt="iceberg")
        eng.sql("ANALYZE ice_cbo_an")

        import os

        full_bytes = sum(
            os.path.getsize(os.path.join(loc_a, "data", f))
            for f in os.listdir(os.path.join(loc_a, "data"))
        )
        conf = spark.conf
        saved = {
            k: conf.get(k, None)
            for k in (
                "spark.sql.cbo.enabled",
                "spark.sql.autoBroadcastJoinThreshold",
            )
        }
        try:
            conf.set("spark.sql.cbo.enabled", "true")
            # between the ndv-scaled estimate and the full size
            conf.set(
                "spark.sql.autoBroadcastJoinThreshold",
                str(max(1024, full_bytes // 4)),
            )
            with_stats = eng.sql(
                "SELECT COUNT(*) AS n FROM orders o JOIN "
                "(SELECT * FROM ice_cbo_an WHERE k = 7) s "
                "ON o.o_orderkey = s.o_orderkey"
            )
            without_stats = eng.sql(
                "SELECT COUNT(*) AS n FROM orders o JOIN "
                "(SELECT * FROM ice_cbo_raw WHERE k = 7) s "
                "ON o.o_orderkey = s.o_orderkey"
            )
            assert "BroadcastHashJoin" in _plan(with_stats)
            assert "SortMergeJoin" in _plan(without_stats)
            # and both still compute the same answer
            assert (
                with_stats.collect()[0]["n"]
                == without_stats.collect()[0]["n"]
            )
        finally:
            for k, v in saved.items():
                if v is None:
                    conf.unset(k)
                else:
                    conf.set(k, v)
