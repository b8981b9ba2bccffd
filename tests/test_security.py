"""Roles/grants/transactions (security.py + api.py wiring) — SqlBase.g4
:95-123 (role/grant statements) and :150-152 (transactions); enforcement
model mirrors io.trino.security.AccessControlManager (deny at analysis)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_SMOKE
from trino_private_spark.api import Engine
from trino_private_spark.security import AccessDeniedError


@pytest.fixture()
def eng(spark):
    e = Engine(spark)
    e.attach(SF_SMOKE)
    yield e
    e.enable_enforcement(False)


class TestRoles:
    def test_role_lifecycle(self, eng):
        eng.sql("CREATE ROLE analyst")
        assert [r.role for r in eng.sql("SHOW ROLES").collect()] == ["analyst"]
        with pytest.raises(ValueError):
            eng.sql("CREATE ROLE analyst")
        eng.sql("DROP ROLE analyst")
        assert eng.sql("SHOW ROLES").count() == 0
        with pytest.raises(ValueError):
            eng.sql("DROP ROLE analyst")

    def test_set_role_requires_membership(self, eng):
        eng.sql("CREATE ROLE admin2")
        eng.set_user("alice")
        with pytest.raises(AccessDeniedError):
            eng.sql("SET ROLE admin2")
        eng.sql("GRANT admin2 TO USER alice")
        eng.sql("SET ROLE admin2")
        eng.sql("SET ROLE NONE")
        eng.sql("DROP ROLE admin2")


class TestGrantsEnforcement:
    def test_select_denied_then_granted(self, eng):
        eng.set_user("bob")
        eng.enable_enforcement(True)
        with pytest.raises(AccessDeniedError):
            eng.sql("SELECT * FROM region").collect()
        eng.sql("GRANT SELECT ON region TO USER bob")
        assert eng.sql("SELECT count(*) c FROM region").collect()[0].c == 5
        # joins need grants on EVERY referenced table
        with pytest.raises(AccessDeniedError):
            eng.sql(
                "SELECT count(*) c FROM region r JOIN nation n "
                "ON r.r_regionkey = n.n_regionkey"
            ).collect()
        eng.sql("GRANT SELECT ON TABLE nation TO USER bob")
        assert (
            eng.sql(
                "SELECT count(*) c FROM region r JOIN nation n "
                "ON r.r_regionkey = n.n_regionkey"
            ).collect()[0].c
            == 25
        )
        eng.sql("REVOKE SELECT ON region FROM USER bob")
        with pytest.raises(AccessDeniedError):
            eng.sql("SELECT * FROM region").collect()

    def test_grant_via_role(self, eng):
        eng.sql("CREATE ROLE reader")
        eng.sql("GRANT SELECT ON nation TO ROLE reader")
        eng.sql("GRANT reader TO USER carol")
        eng.set_user("carol")
        eng.enable_enforcement(True)
        with pytest.raises(AccessDeniedError):  # role not yet enabled
            eng.sql("SELECT * FROM nation").collect()
        eng.sql("SET ROLE reader")
        assert eng.sql("SELECT count(*) c FROM nation").collect()[0].c == 25
        eng.enable_enforcement(False)
        eng.sql("DROP ROLE reader")

    def test_show_grants_and_all_privileges(self, eng):
        eng.sql("GRANT ALL PRIVILEGES ON orders TO USER dave")
        rows = eng.sql("SHOW GRANTS ON orders").collect()
        assert {r.privilege for r in rows} == {
            "SELECT", "INSERT", "DELETE", "UPDATE",
        }
        assert all(r.grantee == "user:dave" for r in rows)
        eng.sql("REVOKE ALL ON orders FROM USER dave")
        assert eng.sql("SHOW GRANTS ON orders").count() == 0

    def test_dml_enforcement_on_cow(self, eng, tmp_path):
        eng.create_cow_table(
            "sec_t", "SELECT * FROM region", str(tmp_path / "sec_t")
        )
        eng.set_user("erin")
        eng.enable_enforcement(True)
        with pytest.raises(AccessDeniedError):
            eng.delete_from("sec_t", "r_regionkey = 0")
        with pytest.raises(AccessDeniedError):
            eng.update("sec_t", {"r_name": "'X'"}, "r_regionkey = 0")
        eng.sql("GRANT DELETE, UPDATE ON sec_t TO USER erin")
        assert eng.delete_from("sec_t", "r_regionkey = 0") == 1
        assert eng.update("sec_t", {"r_name": "'X'"}, "r_regionkey = 1") == 1
        eng.enable_enforcement(False)


class TestTransactions:
    def test_rollback_restores_savepoint(self, eng, tmp_path):
        eng.create_cow_table(
            "tx_t", "SELECT * FROM region", str(tmp_path / "tx_t")
        )
        assert eng.sql("SELECT count(*) c FROM tx_t").collect()[0].c == 5
        eng.sql("START TRANSACTION")
        eng.delete_from("tx_t", "r_regionkey < 2")
        eng.update("tx_t", {"r_name": "'ZZZ'"}, "r_regionkey = 3")
        assert eng.sql("SELECT count(*) c FROM tx_t").collect()[0].c == 3
        eng.sql("ROLLBACK")
        assert eng.sql("SELECT count(*) c FROM tx_t").collect()[0].c == 5
        assert (
            eng.sql("SELECT r_name FROM tx_t WHERE r_regionkey = 3")
            .collect()[0].r_name
            != "ZZZ"
        )
        # history preserved: the rollback is itself a commit
        ops = [r.operation for r in eng.snapshots("tx_t").collect()]
        assert any(op.startswith("rollback_to") for op in ops)

    def test_commit_keeps_mutations(self, eng, tmp_path):
        eng.create_cow_table(
            "tx_u", "SELECT * FROM region", str(tmp_path / "tx_u")
        )
        eng.sql("START TRANSACTION")
        eng.delete_from("tx_u", "r_regionkey = 4")
        eng.sql("COMMIT")
        assert eng.sql("SELECT count(*) c FROM tx_u").collect()[0].c == 4
        eng.sql("ROLLBACK")  # no active tx: no-op
        assert eng.sql("SELECT count(*) c FROM tx_u").collect()[0].c == 4


class TestAdviceFixes:
    """Round-5 ADVICE items: enforcement must survive ANALYZE's
    view->catalog-table promotion, cover MATCH_RECOGNIZE sources, and
    check INSERT symmetrically with DELETE/UPDATE."""

    def test_enforce_after_analyze(self, eng, spark):
        # post-ANALYZE the plan shows "SubqueryAlias spark_catalog.default.t";
        # enforcement must still resolve the bare table name (fail-closed)
        try:
            eng.sql("ANALYZE region")
            eng.set_user("carol")
            eng.enable_enforcement(True)
            with pytest.raises(AccessDeniedError):
                eng.sql("SELECT * FROM region").collect()
            eng.sql("GRANT SELECT ON region TO USER carol")
            assert eng.sql("SELECT count(*) c FROM region").collect()[0].c == 5
        finally:
            eng.enable_enforcement(False)
            spark.sql("DROP TABLE IF EXISTS region")
            eng.attach(SF_SMOKE)

    def test_match_recognize_enforced(self, eng, spark):
        spark.createDataFrame(
            [(1, 1, 1.0), (1, 2, 2.0), (1, 3, 3.0)], "k int, ord int, v double"
        ).createOrReplaceTempView("mr_sec_src")
        mr = (
            "SELECT * FROM mr_sec_src MATCH_RECOGNIZE ("
            " PARTITION BY k ORDER BY ord"
            " MEASURES LAST(v) AS last_v ONE ROW PER MATCH"
            " PATTERN (UP{2,}) DEFINE UP AS v > PREV(v))"
        )
        eng.set_user("dave")
        eng.enable_enforcement(True)
        try:
            with pytest.raises(AccessDeniedError):
                eng.sql(mr)
            eng.sql("GRANT SELECT ON mr_sec_src TO USER dave")
            assert eng.sql(mr).count() == 1
        finally:
            eng.enable_enforcement(False)
            spark.catalog.dropTempView("mr_sec_src")

    def test_insert_enforced(self, eng, tmp_path):
        eng.set_user("frank")
        eng.sql("GRANT SELECT ON nation TO USER frank")
        eng.enable_enforcement(True)
        path = str(tmp_path / "ins_t")
        try:
            with pytest.raises(AccessDeniedError):
                eng.ctas("ins_t", "SELECT * FROM nation", path=path)
            with pytest.raises(AccessDeniedError):
                eng.insert_into(path, "SELECT * FROM nation")
            eng.sql("GRANT INSERT ON ins_t TO USER frank")
            eng.ctas("ins_t", "SELECT * FROM nation", path=path)
            eng.sql("GRANT SELECT ON ins_t TO USER frank")
            before = eng.sql("SELECT count(*) c FROM ins_t").collect()[0].c
            eng.insert_into(path, "SELECT * FROM nation WHERE n_nationkey < 3")
            eng.sql("SELECT 1").collect()
            assert (
                eng.spark.read.parquet(path).count() == before + 3
            )
        finally:
            eng.enable_enforcement(False)
            eng.spark.catalog.dropTempView("ins_t")

    def test_analyze_without_attach_clear_error(self, spark):
        from trino_private_spark.api import Engine

        e = Engine(spark)
        with pytest.raises(ValueError, match="no dataset attached"):
            e.analyze("nowhere")
