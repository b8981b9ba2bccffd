"""Per-block Iceberg pruning inside subqueries and CTEs (r9): the
reference's PushPredicateIntoTableScan recurses over the whole plan
tree, so a derived table's WHERE prunes ITS scan. Until round 9 only
the outermost single-block WHERE pruned; `SELECT ... FROM (SELECT *
FROM ice WHERE seg = 1) t` kept a full read. Pinned here: derived
tables, CTE bodies, IN/EXISTS subqueries, distinct pruned views for
two blocks over the same table, and the CTE-shadowing guard (a CTE
named like a registered view must keep resolving to the CTE).
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
    loc = tempfile.mkdtemp(prefix="tps_subq_") + "/t"
    e.ctas(
        "ice_subq",
        "SELECT o_orderkey, o_totalprice, o_orderkey % 8 AS seg "
        "FROM orders",
        path=loc, fmt="iceberg", partition_by=["seg"],
    )
    e._subq_loc = loc
    return e


def _scanned(eng):
    from trino_private_spark.sources.iceberg import IO_SCAN_INFO

    return IO_SCAN_INFO[eng._subq_loc]["scanned_data_files"]


class TestSubqueryPruning:
    def test_derived_table(self, eng, spark):
        exp = spark.sql(
            "SELECT COUNT(*) AS n FROM ice_subq WHERE seg = 3"
        ).collect()[0]["n"]
        got = eng.sql(
            "SELECT COUNT(*) AS n FROM "
            "(SELECT * FROM ice_subq WHERE seg = 3) t"
        ).collect()[0]["n"]
        assert got == exp and exp > 0
        assert _scanned(eng) == 1

    def test_cte_body(self, eng, spark):
        exp = spark.sql(
            "SELECT COUNT(*) AS n FROM ice_subq WHERE seg = 5"
        ).collect()[0]["n"]
        got = eng.sql(
            "WITH c AS (SELECT * FROM ice_subq WHERE seg = 5) "
            "SELECT COUNT(*) AS n FROM c"
        ).collect()[0]["n"]
        assert got == exp
        assert _scanned(eng) == 1

    def test_exists_subquery(self, eng, spark):
        got = eng.sql(
            "SELECT COUNT(*) AS n FROM nation WHERE EXISTS "
            "(SELECT 1 FROM ice_subq WHERE seg = 2 "
            "AND o_orderkey % 25 = n_nationkey)"
        ).collect()[0]["n"]
        exp = spark.sql(
            "SELECT COUNT(*) AS n FROM nation WHERE EXISTS "
            "(SELECT 1 FROM ice_subq WHERE seg = 2 "
            "AND o_orderkey % 25 = n_nationkey)"
        ).collect()[0]["n"]
        assert got == exp and exp > 0
        assert _scanned(eng) == 1

    def test_two_blocks_distinct_terms_distinct_views(self, eng, spark):
        """Two derived tables over the SAME Iceberg table with
        DIFFERENT prune terms: each must read its own pruned view —
        a shared view name would serve one block the other's subset."""
        exp = spark.sql(
            "SELECT (SELECT COUNT(*) FROM ice_subq WHERE seg = 1) + "
            "(SELECT COUNT(*) FROM ice_subq WHERE seg = 2) AS n"
        ).collect()[0]["n"]
        got = eng.sql(
            "SELECT a.n + b.n AS n FROM "
            "(SELECT COUNT(*) AS n FROM ice_subq WHERE seg = 1) a, "
            "(SELECT COUNT(*) AS n FROM ice_subq WHERE seg = 2) b"
        ).collect()[0]["n"]
        assert got == exp and exp > 0

    def test_nested_derived_tables(self, eng, spark):
        exp = spark.sql(
            "SELECT COUNT(*) AS n FROM ice_subq "
            "WHERE seg = 4 AND o_totalprice > 1000"
        ).collect()[0]["n"]
        got = eng.sql(
            "SELECT COUNT(*) AS n FROM (SELECT * FROM "
            "(SELECT * FROM ice_subq WHERE seg = 4) i "
            "WHERE o_totalprice > 1000) t"
        ).collect()[0]["n"]
        assert got == exp
        assert _scanned(eng) == 1

    def test_outer_block_still_prunes(self, eng, spark):
        eng.sql(
            "SELECT COUNT(*) AS n FROM ice_subq WHERE seg = 6"
        ).collect()
        assert _scanned(eng) == 1


class TestCteShadowing:
    def test_cte_shadowing_view_name_wins(self, eng, spark):
        """A CTE named like the registered Iceberg view: every
        reference must resolve to the CTE (SQL scoping), never be
        rewritten to a pruned table read."""
        got = eng.sql(
            "WITH ice_subq AS (SELECT 42 AS seg) "
            "SELECT COUNT(*) AS n FROM ice_subq WHERE seg = 42"
        ).collect()[0]["n"]
        assert got == 1

    def test_shadowed_in_derived_table(self, eng, spark):
        got = eng.sql(
            "WITH ice_subq AS (SELECT 7 AS seg UNION ALL SELECT 7) "
            "SELECT COUNT(*) AS n FROM "
            "(SELECT * FROM ice_subq WHERE seg = 7) t"
        ).collect()[0]["n"]
        assert got == 2


class TestDmlSubquery:
    def test_delete_with_in_subquery(self, eng, spark):
        """DELETE FROM t WHERE k IN (SELECT ...) — the reference allows
        subqueries in DML conditions; the row filter resolves them and
        the prune parser conservatively contributes no terms."""
        import tempfile as _tf

        loc = _tf.mkdtemp(prefix="tps_dmlsq_") + "/t"
        eng.ctas(
            "ice_dmlsq",
            "SELECT n_nationkey AS k, n_regionkey AS r FROM nation",
            path=loc, fmt="iceberg",
        )
        in_region = spark.sql(
            "SELECT COUNT(*) AS n FROM nation WHERE n_regionkey = 2"
        ).collect()[0]["n"]
        total = spark.table("ice_dmlsq").count()
        eng.sql(
            "DELETE FROM ice_dmlsq WHERE k IN "
            "(SELECT n_nationkey FROM nation WHERE n_regionkey = 2)"
        )
        assert spark.table("ice_dmlsq").count() == total - in_region

    def test_update_with_in_subquery(self, eng, spark):
        import tempfile as _tf

        loc = _tf.mkdtemp(prefix="tps_updsq_") + "/t"
        eng.ctas(
            "ice_updsq",
            "SELECT n_nationkey AS k, n_name AS v, n_regionkey AS r "
            "FROM nation",
            path=loc, fmt="iceberg",
        )
        eng.sql(
            "UPDATE ice_updsq SET v = 'X' WHERE k IN "
            "(SELECT n_nationkey FROM nation WHERE n_regionkey = 2)"
        )
        exp = spark.sql(
            "SELECT COUNT(*) AS n FROM nation WHERE n_regionkey = 2"
        ).collect()[0]["n"]
        assert spark.table("ice_updsq").where("v = 'X'").count() == exp

    def test_insert_values_forms(self, eng, spark):
        import tempfile as _tf

        loc = _tf.mkdtemp(prefix="tps_insv_") + "/t"
        eng.sql(
            f"CREATE TABLE ice_insv (k bigint, v varchar) WITH "
            f"(format='ICEBERG', location='{loc}')"
        )
        eng.sql("INSERT INTO ice_insv VALUES (1, 'a'), (2, 'b')")
        eng.sql("INSERT INTO ice_insv (k) VALUES (3)")
        assert sorted(
            map(tuple, spark.table("ice_insv").collect()), key=str
        ) == [(1, "a"), (2, "b"), (3, None)]


class TestPrunedViewLifecycle:
    def test_previous_statement_views_dropped(self, eng, spark):
        """__icep_* pruned views live only until the NEXT statement —
        a long-lived session's catalog must stay bounded."""
        eng.sql(
            "SELECT COUNT(*) AS n FROM ice_subq WHERE seg = 1"
        ).collect()
        live_after_first = [
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("__icep_")
        ]
        assert live_after_first  # the pruned view exists right now
        df2 = eng.sql("SELECT COUNT(*) AS n FROM ice_subq WHERE seg = 2")
        remaining = {
            t.name
            for t in spark.catalog.listTables()
            if t.name.startswith("__icep_")
        }
        assert not (set(live_after_first) & remaining)
        # the new statement's plan still executes (resolved at analysis)
        assert df2.collect()[0]["n"] >= 0
