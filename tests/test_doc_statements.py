"""Documented-STATEMENT reachability sweep (round-11; VERDICT r10 Next
#6) — the same documented-surface method as tests/test_doc_surface.py,
applied to docs/src/main/sphinx/sql/*.rst: every statement doc the
reference ships must have a representative form that executes through
``Engine.sql``, or carry an explicit reasoned exemption.
"""

from __future__ import annotations

import glob
import os

import pytest

from trino_private_spark.api import Engine

SQL_DOCS_GLOB = "/root/reference/docs/src/main/sphinx/sql/*.rst"


def documented_statements() -> set[str]:
    return {os.path.basename(p) for p in glob.glob(SQL_DOCS_GLOB)}


EXEMPT: dict[str, str] = {}


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    e = Engine(spark)
    base = tmp_path_factory.mktemp("doc_stmts")
    import os
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    spark.read.parquet(f"{sf}/nation.parquet").createOrReplaceTempView(
        "docst_src"
    )
    # an Iceberg table for DML/ALTER/ANALYZE statements
    e.sql(
        f"CREATE TABLE docst (k BIGINT, v VARCHAR) WITH ("
        f"format = 'ICEBERG', location = '{base}/docst')"
    )
    e.sql(
        "INSERT INTO docst SELECT CAST(n_nationkey AS BIGINT), n_name "
        "FROM docst_src"
    )
    spark.range(3).createOrReplaceTempView("docst_plain")
    return e


def _seq(*stmts):
    def run(eng):
        out = None
        for s in stmts:
            out = eng.sql(s)
            out.collect()
        return out

    return run


def _call(eng):
    from trino_private_spark.sources.iceberg import IcebergTable

    loc = eng._iceberg_views["docst"]
    snap = IcebergTable(loc).current_snapshot()["snapshot-id"]
    eng.sql(f"CALL system.rollback_to_snapshot('docst', {snap})")


def _mr(eng):
    df = eng.sql(
        """
        SELECT * FROM docst MATCH_RECOGNIZE (
          ORDER BY k
          MEASURES A.k AS ak
          ONE ROW PER MATCH
          PATTERN (A)
          DEFINE A AS true
        )
        """
    )
    df.collect()
    return df


STATEMENTS: dict[str, object] = {
    "alter-materialized-view.rst": _seq(
        "CREATE MATERIALIZED VIEW doc_amv AS SELECT 1 AS one",
        "ALTER MATERIALIZED VIEW doc_amv RENAME TO doc_amv2",
        "DROP MATERIALIZED VIEW doc_amv2",
    ),
    "alter-schema.rst": _seq(
        "CREATE SCHEMA doc_as",
        "ALTER SCHEMA doc_as RENAME TO doc_as2",
        "DROP SCHEMA doc_as2",
    ),
    "alter-table.rst": _seq(
        "ALTER TABLE docst ADD COLUMN extra DOUBLE",
        "ALTER TABLE docst DROP COLUMN extra",
    ),
    "alter-view.rst": _seq(
        "CREATE VIEW doc_av AS SELECT 1 AS one",
        "ALTER VIEW doc_av RENAME TO doc_av2",
        "DROP VIEW doc_av2",
    ),
    "analyze.rst": _seq("ANALYZE docst"),
    "call.rst": _call,
    "comment.rst": _seq("COMMENT ON TABLE docst IS 'doc sweep'"),
    "commit.rst": _seq("START TRANSACTION", "COMMIT"),
    "create-materialized-view.rst": _seq(
        "CREATE MATERIALIZED VIEW doc_cmv AS SELECT 2 AS two",
        "DROP MATERIALIZED VIEW doc_cmv",
    ),
    "create-role.rst": _seq("CREATE ROLE doc_role", "DROP ROLE doc_role"),
    "create-schema.rst": _seq(
        "CREATE SCHEMA doc_cs", "DROP SCHEMA doc_cs"
    ),
    "create-table-as.rst": None,  # built by fixture-adjacent check below
    "create-table.rst": None,  # the fixture itself is CREATE TABLE
    "create-view.rst": _seq(
        "CREATE VIEW doc_cv AS SELECT 1 AS one", "DROP VIEW doc_cv"
    ),
    "deallocate-prepare.rst": _seq(
        "PREPARE doc_q FROM SELECT 1 AS one",
        "DEALLOCATE PREPARE doc_q",
    ),
    "delete.rst": _seq("DELETE FROM docst WHERE k = 999"),
    "describe.rst": _seq("DESCRIBE docst"),
    "describe-input.rst": _seq(
        "PREPARE doc_di FROM SELECT k FROM docst WHERE k = ?",
        "DESCRIBE INPUT doc_di",
        "DEALLOCATE PREPARE doc_di",
    ),
    "describe-output.rst": _seq(
        "PREPARE doc_do FROM SELECT k FROM docst",
        "DESCRIBE OUTPUT doc_do",
        "DEALLOCATE PREPARE doc_do",
    ),
    "drop-materialized-view.rst": _seq(
        "CREATE MATERIALIZED VIEW doc_dmv AS SELECT 1 AS one",
        "DROP MATERIALIZED VIEW doc_dmv",
    ),
    "drop-role.rst": _seq("CREATE ROLE doc_dr", "DROP ROLE doc_dr"),
    "drop-schema.rst": _seq("CREATE SCHEMA doc_ds", "DROP SCHEMA doc_ds"),
    "drop-table.rst": None,  # covered with create-table-as below
    "drop-view.rst": _seq(
        "CREATE VIEW doc_dv AS SELECT 1 AS one", "DROP VIEW doc_dv"
    ),
    "execute.rst": _seq(
        "PREPARE doc_ex FROM SELECT ? AS v",
        "EXECUTE doc_ex USING 42",
        "DEALLOCATE PREPARE doc_ex",
    ),
    "explain.rst": _seq("EXPLAIN SELECT * FROM docst"),
    "explain-analyze.rst": _seq("EXPLAIN ANALYZE SELECT * FROM docst"),
    "grant.rst": _seq(
        "GRANT SELECT ON docst_plain TO USER doc_u",
        "REVOKE SELECT ON docst_plain FROM USER doc_u",
    ),
    "grant-roles.rst": _seq(
        "CREATE ROLE doc_gr",
        "GRANT doc_gr TO USER doc_u2",
        "REVOKE doc_gr FROM USER doc_u2",
        "DROP ROLE doc_gr",
    ),
    "insert.rst": _seq("INSERT INTO docst SELECT CAST(10 AS BIGINT), 'j'"),
    "match-recognize.rst": _mr,
    "pattern-recognition-in-window.rst": _seq(
        """
        SELECT k, v, m OVER w AS m
        FROM docst
        WINDOW w AS (
            ORDER BY k
            MEASURES LAST(v) AS m
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
            PATTERN (A) DEFINE A AS true
        )
        """
    ),
    "prepare.rst": _seq(
        "PREPARE doc_p FROM SELECT 7 AS v",
        "EXECUTE doc_p",
        "DEALLOCATE PREPARE doc_p",
    ),
    "refresh-materialized-view.rst": _seq(
        "CREATE MATERIALIZED VIEW doc_rmv AS SELECT 3 AS three",
        "REFRESH MATERIALIZED VIEW doc_rmv",
        "DROP MATERIALIZED VIEW doc_rmv",
    ),
    "reset-session.rst": _seq(
        "SET SESSION query_max_run_time = '2h'",
        "RESET SESSION query_max_run_time",
    ),
    "revoke.rst": None,  # covered by grant.rst sequence
    "revoke-roles.rst": None,  # covered by grant-roles.rst sequence
    "rollback.rst": _seq("START TRANSACTION", "ROLLBACK"),
    "select.rst": _seq("SELECT k, v FROM docst ORDER BY k LIMIT 1"),
    "set-role.rst": _seq(
        "CREATE ROLE doc_sr",
        "GRANT doc_sr TO USER doc_u3",
        "SET ROLE NONE",
        "DROP ROLE doc_sr",
    ),
    "set-session.rst": _seq("SET SESSION query_max_run_time = '1h'"),
    "set-time-zone.rst": _seq("SET TIME ZONE 'UTC'"),
    "show-catalogs.rst": _seq("SHOW CATALOGS"),
    "show-columns.rst": _seq("SHOW COLUMNS FROM docst"),
    "show-create-materialized-view.rst": _seq(
        "CREATE MATERIALIZED VIEW doc_scmv AS SELECT 1 AS one",
        "SHOW CREATE MATERIALIZED VIEW doc_scmv",
        "DROP MATERIALIZED VIEW doc_scmv",
    ),
    "show-create-schema.rst": _seq(
        "CREATE SCHEMA doc_scs",
        "SHOW CREATE SCHEMA doc_scs",
        "DROP SCHEMA doc_scs",
    ),
    "show-create-table.rst": _seq("SHOW CREATE TABLE docst"),
    "show-create-view.rst": _seq(
        "CREATE VIEW doc_scv AS SELECT 1 AS one",
        "SHOW CREATE VIEW doc_scv",
        "DROP VIEW doc_scv",
    ),
    "show-functions.rst": _seq("SHOW FUNCTIONS"),
    "show-grants.rst": _seq("SHOW GRANTS"),
    "show-role-grants.rst": _seq("SHOW ROLE GRANTS"),
    "show-roles.rst": _seq("SHOW ROLES"),
    "show-schemas.rst": _seq("SHOW SCHEMAS"),
    "show-session.rst": _seq("SHOW SESSION"),
    "show-stats.rst": _seq("SHOW STATS FOR docst"),
    "show-tables.rst": _seq("SHOW TABLES"),
    "start-transaction.rst": None,  # covered by commit/rollback
    "update.rst": _seq("UPDATE docst SET v = 'z' WHERE k = 999"),
    "use.rst": _seq("USE default"),
    "values.rst": _seq("VALUES (1, 'a'), (2, 'b')"),
}


def test_table_covers_every_documented_statement():
    docs = documented_statements()
    assert docs, "reference sql docs not found"
    missing = sorted(
        d for d in docs if d not in STATEMENTS and d not in EXEMPT
    )
    assert missing == [], f"statement docs with no sweep entry: {missing}"


def test_every_documented_statement_executes(eng):
    failures = []
    for doc, run in sorted(STATEMENTS.items()):
        if run is None or doc in EXEMPT:
            continue
        try:
            run(eng)
        except Exception as e:  # noqa: BLE001
            failures.append(f"{doc}: {str(e).splitlines()[0][:140]}")
    assert failures == [], (
        f"{len(failures)} documented statements fail:\n" + "\n".join(failures)
    )


def test_ctas_and_drop_table(eng, tmp_path):
    eng.sql(
        f"CREATE TABLE doc_ctas WITH (format = 'PARQUET', "
        f"location = '{tmp_path}/doc_ctas') AS SELECT 1 AS one"
    )
    assert eng.sql("SELECT * FROM doc_ctas").count() == 1
    eng.sql("DROP TABLE doc_ctas")
