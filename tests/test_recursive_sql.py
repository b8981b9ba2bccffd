"""WITH RECURSIVE SQL-text lowering (plans/recursive_sql.py).

Reference semantics: SqlBase.g4:172 grammar, bounded expansion with the
max_recursion_depth session property (StatementAnalyzer.java:1432-1436).
"""

from __future__ import annotations

import pytest

from trino_private_spark.operators.recursion import RecursionLimitExceeded

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(spark):
    from trino_private_spark.api import Engine

    e = Engine(spark)
    e.attach(SF)
    return e


def test_sequence_walk(eng):
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 5) SELECT n FROM t ORDER BY n"
    ).collect()
    assert [r.n for r in rows] == [1, 2, 3, 4, 5]


def test_union_distinct_terminates_on_cycle(eng):
    # UNION (distinct) recursion over a cyclic step: 1 -> 2 -> 3 -> 1 ...
    # must converge because each level is deduped against the accumulated
    # set — the standard's fixpoint semantics, cycle-safe.
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION "
        "SELECT CASE WHEN n >= 3 THEN 1 ELSE n + 1 END FROM t) "
        "SELECT n FROM t ORDER BY n"
    ).collect()
    assert [r.n for r in rows] == [1, 2, 3]


def test_depth_cap_raises(eng):
    with pytest.raises(RecursionLimitExceeded, match="max_recursion_depth"):
        eng.sql(
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM t) "
            "SELECT count(*) AS c FROM t"
        ).collect()


def test_depth_cap_session_property(eng):
    # SET SESSION max_recursion_depth raises the bound like the reference.
    eng.sql("SET SESSION max_recursion_depth = 64")
    try:
        rows = eng.sql(
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
            "SELECT n + 1 FROM t WHERE n < 40) SELECT max(n) AS m FROM t"
        ).collect()
        assert rows[0].m == 40
    finally:
        eng.sql("RESET SESSION max_recursion_depth")


def test_mixed_with_list_and_sibling_reference(eng):
    # A non-recursive member after the recursive one, referencing it.
    rows = eng.sql(
        "WITH RECURSIVE seq(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM seq WHERE n < 3), "
        "sq AS (SELECT n, n * n AS n2 FROM seq) "
        "SELECT n, n2 FROM sq ORDER BY n"
    ).collect()
    assert [(r.n, r.n2) for r in rows] == [(1, 1), (2, 4), (3, 9)]


def test_join_against_catalog_table(eng):
    rows = eng.sql(
        "WITH RECURSIVE seq(k) AS (SELECT 0 UNION ALL "
        "SELECT k + 1 FROM seq WHERE k < 4) "
        "SELECT count(*) AS c FROM seq JOIN nation ON n_regionkey = seq.k"
    ).collect()
    assert rows[0].c == 25


def test_no_catalog_shadowing(eng, spark):
    # A recursive CTE named like a catalog table must not clobber the
    # registered temp view (internal __rec_* names, dropped afterwards).
    before = spark.table("nation").count()
    rows = eng.sql(
        "WITH RECURSIVE nation(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM nation WHERE n < 2) SELECT max(n) AS m FROM nation"
    ).collect()
    assert rows[0].m == 2
    assert spark.table("nation").count() == before
    assert not any(
        t.name.startswith("__rec_") for t in spark.catalog.listTables()
    )


def test_base_referencing_name_rejected(eng):
    with pytest.raises(ValueError, match="anchor"):
        eng.sql(
            "WITH RECURSIVE t(n) AS (SELECT n FROM t UNION ALL SELECT 1) "
            "SELECT * FROM t"
        )


def test_string_literal_with_union_keyword(eng):
    # literals are shielded: 'union all' inside a string must not split.
    rows = eng.sql(
        "WITH RECURSIVE t(n, s) AS (SELECT 1, 'union all (x' UNION ALL "
        "SELECT n + 1, s FROM t WHERE n < 2) SELECT n, s FROM t ORDER BY n"
    ).collect()
    assert [(r.n, r.s) for r in rows] == [(1, "union all (x"), (2, "union all (x")]


def test_prepare_execute_recursive(eng):
    # PREPARE stores the raw text; EXECUTE re-enters Engine.sql for the
    # iterative lowering, binding ? by escaped-literal substitution
    eng.sql(
        "PREPARE rwalk FROM WITH RECURSIVE t(n) AS "
        "(SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < ?) "
        "SELECT max(n) AS m FROM t"
    )
    try:
        assert eng.sql("EXECUTE rwalk USING 6").collect()[0].m == 6
        assert eng.execute("rwalk", 4).collect()[0].m == 4
        # DESCRIBE OUTPUT types the statement through the same lowering
        out = eng.sql("DESCRIBE OUTPUT rwalk").collect()
        assert [r["Column Name"] for r in out] == ["m"]
    finally:
        eng.sql("DEALLOCATE PREPARE rwalk")


def test_prepare_execute_plain_still_parameterized(eng):
    # non-engine statements keep Spark's injection-safe args binding
    eng.prepare("pq", "SELECT n_name FROM nation WHERE n_nationkey = ?")
    try:
        rows = eng.execute("pq", 3).collect()
        assert len(rows) == 1
    finally:
        eng.deallocate("pq")


def test_explain_analyze_recursive(eng):
    # EXPLAIN ANALYZE recurses into Engine.sql, which lowers RECURSIVE
    out = eng.sql(
        "EXPLAIN ANALYZE WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 3) SELECT count(*) AS c FROM t"
    ).collect()
    assert len(out) == 1 and out[0]["Query Plan"]


def test_multi_branch_anchor_left_assoc(eng):
    # the reference parses set ops LEFT-associatively (AstBuilder
    # visitSetOperation), so base1 UNION ALL base2 UNION ALL step is a
    # valid linearly-recursive query with anchor=(base1 UNION ALL base2)
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL SELECT 2 "
        "UNION ALL SELECT n + 1 FROM t WHERE n < 4) "
        "SELECT n FROM t ORDER BY n"
    ).collect()
    assert [r.n for r in rows] == [1, 2, 2, 3, 3, 4, 4]


def test_recursive_ref_in_anchor_rejected(eng):
    # a recursive reference BEFORE the last top-level UNION lands in the
    # anchor — the reference's analyzer error (StatementAnalyzer.java:1432)
    with pytest.raises(ValueError, match="anchor"):
        eng.sql(
            "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
            "SELECT n + 1 FROM t WHERE n < 4 UNION ALL SELECT 9) "
            "SELECT n FROM t ORDER BY n"
        ).collect()


def test_recsub_views_dropped_after_statement(eng):
    # nested-recursive lowering must not leak __recsub_* temp views —
    # catalog view count is stable across repeated sql() calls
    def recsub_count():
        return sum(
            1
            for t in eng.spark.catalog.listTables()
            if t.name.startswith("__recsub_")
        )

    q = (
        "SELECT SUM(n) AS s FROM (WITH RECURSIVE t(n) AS (SELECT 1 "
        "UNION ALL SELECT n + 1 FROM t WHERE n < 5) SELECT n FROM t) x"
    )
    for _ in range(3):
        assert eng.sql(q).collect()[0].s == 15
        assert recsub_count() == 0


def test_parenthesized_union_in_step_still_allowed(eng):
    # a UNION nested in parens inside the step is not a third branch
    rows = eng.sql(
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 3 AND n IN "
        "(SELECT 1 UNION SELECT 2)) SELECT n FROM t ORDER BY n"
    ).collect()
    assert [r.n for r in rows] == [1, 2, 3]


def test_multi_branch_nonrecursive_member_allowed(eng):
    # a NON-recursive member of a RECURSIVE with-list may hold any number
    # of top-level UNION branches
    rows = eng.sql(
        "WITH RECURSIVE s(n) AS (SELECT 1 UNION ALL SELECT 2 UNION ALL "
        "SELECT 3), t(n) AS (SELECT n FROM s UNION ALL "
        "SELECT n + 10 FROM t WHERE n < 10) SELECT n FROM t ORDER BY n"
    ).collect()
    assert [r.n for r in rows] == [1, 2, 3, 11, 12, 13]


def test_nested_recursive_derived_table(eng):
    rows = eng.sql(
        "SELECT SUM(n) AS s FROM (WITH RECURSIVE t(n) AS (SELECT 1 "
        "UNION ALL SELECT n + 1 FROM t WHERE n < 5) SELECT n FROM t) x"
    ).collect()
    assert rows[0].s == 15


def test_nested_recursive_scalar_subquery(eng):
    rows = eng.sql(
        "SELECT (SELECT MAX(n) FROM (WITH RECURSIVE t(n) AS (SELECT 1 "
        "UNION ALL SELECT n + 1 FROM t WHERE n < 3) SELECT n FROM t)) AS m"
    ).collect()
    assert rows[0].m == 3


def test_nested_recursive_in_ctas_and_insert(eng, tmp_path):
    eng.ctas(
        "rec_ctas_t",
        "WITH RECURSIVE t(n) AS (SELECT 1 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 4) SELECT n FROM t",
    )
    assert eng.sql("SELECT COUNT(*) AS c FROM rec_ctas_t").collect()[0].c == 4
    p = str(tmp_path / "rec_ins")
    eng.ctas(
        "rec_ins_t",
        "WITH RECURSIVE t(n) AS (SELECT 10 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 12) SELECT n FROM t",
        path=p,
    )
    eng.insert_into(
        p,
        "WITH RECURSIVE t(n) AS (SELECT 20 UNION ALL "
        "SELECT n + 1 FROM t WHERE n < 21) SELECT n FROM t",
    )
    import pyspark.sql.functions as F

    got = sorted(
        r.n for r in eng.spark.read.parquet(p).collect()
    )
    assert got == [10, 11, 12, 20, 21]


def test_nested_recursive_string_literal_untouched(eng):
    rows = eng.sql(
        "SELECT '(WITH RECURSIVE fake' AS s, n FROM (WITH RECURSIVE t(n) "
        "AS (SELECT 1 UNION ALL SELECT n + 1 FROM t WHERE n < 2) "
        "SELECT n FROM t) ORDER BY n"
    ).collect()
    assert [r.n for r in rows] == [1, 2]
    assert rows[0].s == "(WITH RECURSIVE fake"
