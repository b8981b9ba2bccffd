"""Adversarial equivalence battery for the per-block pruning rewriter:
every statement executes through Engine.sql (which may rewrite Iceberg
references to pruned views, statement shape permitting) AND through
plain spark.sql on the same registered FULL views (no rewrite) — the
results must be identical. Pruning is an optimization; any divergence
is a wrong-prune or a broken rewrite splice. Shapes chosen to stress
the rewriter: set operations, derived-table joins, correlated
subqueries, SELECT-list subqueries, keywords inside string literals,
comments, OR-predicates, LATERAL-ish nesting, HAVING, windows.
"""

from __future__ import annotations

import tempfile

import pytest

SF = "/root/testdata/sf0.001"

STATEMENTS = [
    # set operation over filtered blocks
    "SELECT COUNT(*) AS n FROM (SELECT * FROM ice_eq WHERE seg = 1) a "
    "UNION ALL SELECT COUNT(*) FROM (SELECT * FROM ice_eq WHERE seg = 2) b",
    # join of two derived tables with aliases
    "SELECT COUNT(*) AS n FROM (SELECT o_orderkey FROM ice_eq WHERE seg = 3) x "
    "JOIN (SELECT o_orderkey FROM ice_eq WHERE seg = 3) y "
    "ON x.o_orderkey = y.o_orderkey",
    # correlated EXISTS with an unqualified partition conjunct
    "SELECT COUNT(*) AS n FROM nation WHERE EXISTS (SELECT 1 FROM ice_eq "
    "WHERE seg = 4 AND o_orderkey % 25 = n_nationkey)",
    # NOT IN subquery
    "SELECT COUNT(*) AS n FROM ice_eq WHERE seg = 5 AND o_orderkey NOT IN "
    "(SELECT o_orderkey FROM ice_eq WHERE seg = 6)",
    # scalar subquery in the SELECT list
    "SELECT (SELECT COUNT(*) FROM ice_eq WHERE seg = 7) AS n",
    # keywords and operators inside string literals
    "SELECT COUNT(*) AS n FROM ice_eq WHERE seg = 1 AND "
    "'FROM ice_eq WHERE seg = 9' <> o_orderstatus",
    # comments interleaved with a live prune conjunct
    "SELECT COUNT(*) AS n FROM ice_eq -- FROM ice_eq WHERE seg = 9\n"
    "WHERE /* seg = 9 AND */ seg = 2",
    # OR at depth 0: nothing may prune, result must still be right
    "SELECT COUNT(*) AS n FROM ice_eq WHERE seg = 1 OR seg = 2",
    # same-column parenthesized OR (prunes as IN)
    "SELECT COUNT(*) AS n FROM ice_eq WHERE (seg = 1 OR seg = 2)",
    # GROUP BY + HAVING over a pruned derived table
    "SELECT seg, COUNT(*) AS n FROM (SELECT * FROM ice_eq WHERE seg >= 5) t "
    "GROUP BY seg HAVING COUNT(*) > 0 ORDER BY seg",
    # window over a pruned CTE
    "WITH c AS (SELECT * FROM ice_eq WHERE seg = 3) "
    "SELECT MAX(rk) AS n FROM (SELECT RANK() OVER (ORDER BY o_orderkey) rk "
    "FROM c) w",
    # BETWEEN + IS NOT NULL + LIKE conjunction
    "SELECT COUNT(*) AS n FROM ice_eq WHERE seg BETWEEN 2 AND 3 "
    "AND o_orderstatus IS NOT NULL AND o_orderstatus LIKE '%a%'",
    # nested derived tables three deep
    "SELECT COUNT(*) AS n FROM (SELECT * FROM (SELECT * FROM "
    "(SELECT * FROM ice_eq WHERE seg = 6) a WHERE o_orderkey > 0) b) c",
    # CTE chain where the second CTE reads the first
    "WITH a AS (SELECT * FROM ice_eq WHERE seg = 1), "
    "b AS (SELECT o_orderkey FROM a WHERE o_orderkey % 2 = 0) "
    "SELECT COUNT(*) AS n FROM b",
    # mixed qualified/unqualified conjuncts over a join
    "SELECT COUNT(*) AS n FROM ice_eq o JOIN nation nt "
    "ON o.o_orderkey % 25 = nt.n_nationkey "
    "WHERE o.seg = 2 AND nt.n_regionkey = 1",
]


@pytest.fixture(scope="module")
def eng(spark):
    from trino_private_spark.api import Engine

    e = Engine(spark)
    e.attach(SF)
    loc = tempfile.mkdtemp(prefix="tps_eq_") + "/t"
    e.ctas(
        "ice_eq",
        "SELECT o_orderkey, o_orderstatus, o_orderkey % 8 AS seg FROM orders",
        path=loc, fmt="iceberg", partition_by=["seg"],
    )
    return e


@pytest.mark.parametrize("stmt", STATEMENTS)
def test_pruned_equals_unpruned(eng, spark, stmt):
    from trino_private_spark.plans.translate import translate

    got = sorted(map(tuple, eng.sql(stmt).collect()))
    exp = sorted(map(tuple, spark.sql(translate(stmt)).collect()))
    assert got == exp, f"pruning rewrite diverged for:\n{stmt}"
