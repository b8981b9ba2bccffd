"""Reference-suite probes, tranche 2: engine-semantics SQL from
``testing/trino-tests/src/test/java/io/trino/tests/AbstractTestEngineOnlyQueries.java``
(NULL-IN three-valued logic, set operations over aggregates, literals) and
the remaining fixture-compatible shapes from ``AbstractTestJoinQueries.java``
(range-predicate joins, interval-arithmetic join bounds, negated theta
join).

Same contract as ``reference_suite.py``: the cited suite SQL (edited only to
alias computed columns, and — where the suite uses Trino's bare
``VALUES 1, 2`` shorthand — with a DuckDB oracle override spelling
``(VALUES (1), (2))``) runs through ``plans/translate.translate()`` over
TPCH-connector-named views; the oracle runs over the identical rename
prologue in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.plans.translate import translate
from trino_private_spark.queries import probe
from trino_private_spark.queries.reference_suite import (
    _PROLOGUE,
    _register_tpch_views,
)

# (probe name, citation, suite SQL, duckdb oracle override or None=same SQL)
_SUITE2: list[tuple[str, str, str, str | None]] = [
    (
        "p_ref_scalar_arith",
        "AbstractTestEngineOnlyQueries.java:253",
        "SELECT 1 + 2 AS a, 3 + 4 AS b",
        None,
    ),
    (
        "p_ref_timestamp_literal",
        "AbstractTestEngineOnlyQueries.java:173",
        "SELECT TIMESTAMP '1960-01-22 3:04:05' AS t",
        None,
    ),
    (
        "p_ref_null_select",
        "AbstractTestEngineOnlyQueries.java:259",
        "SELECT NULL AS x",
        # dtype pinning: DuckDB renders an untyped NULL as float64 NaN,
        # Spark's NullType arrives as pandas object — cast to VARCHAR so
        # both sides land in the object category.
        "SELECT CAST(NULL AS VARCHAR) AS x",
    ),
    (
        "p_ref_intersect_nulls",
        "AbstractTestEngineOnlyQueries.java:470",
        "SELECT NULL AS a, NULL AS b INTERSECT SELECT NULL, NULL FROM nation",
        "SELECT CAST(NULL AS VARCHAR) AS a, CAST(NULL AS VARCHAR) AS b "
        "INTERSECT SELECT CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR) FROM nation",
    ),
    (
        "p_ref_intersect_aggs",
        "AbstractTestEngineOnlyQueries.java:479",
        "SELECT COUNT(*) AS c FROM nation INTERSECT SELECT COUNT(regionkey) FROM nation HAVING SUM(regionkey) IS NOT NULL",
        None,
    ),
    (
        "p_ref_agg_over_intersect",
        "AbstractTestEngineOnlyQueries.java:480",
        "SELECT SUM(nationkey) AS s, COUNT(name) AS c FROM (SELECT nationkey,name FROM nation INTERSECT SELECT regionkey, name FROM nation) n",
        "SELECT CAST(SUM(nationkey) AS BIGINT) AS s, COUNT(name) AS c FROM (SELECT nationkey,name FROM nation INTERSECT SELECT regionkey, name FROM nation) n",
    ),
    (
        "p_ref_group_over_intersect",
        "AbstractTestEngineOnlyQueries.java:483",
        "SELECT COUNT(*) AS c, SUM(2) AS s, regionkey FROM (SELECT nationkey, regionkey FROM nation INTERSECT SELECT regionkey, regionkey FROM nation) n GROUP BY regionkey",
        "SELECT COUNT(*) AS c, CAST(SUM(2) AS BIGINT) AS s, regionkey FROM (SELECT nationkey, regionkey FROM nation INTERSECT SELECT regionkey, regionkey FROM nation) n GROUP BY regionkey",
    ),
    (
        "p_ref_agg_over_except",
        "AbstractTestEngineOnlyQueries.java:537",
        "SELECT SUM(nationkey) AS s, COUNT(name) AS c FROM (SELECT nationkey, name FROM nation WHERE nationkey < 6 EXCEPT SELECT regionkey, name FROM nation) n",
        "SELECT CAST(SUM(nationkey) AS BIGINT) AS s, COUNT(name) AS c FROM (SELECT nationkey, name FROM nation WHERE nationkey < 6 EXCEPT SELECT regionkey, name FROM nation) n",
    ),
    (
        "p_ref_group_over_except",
        "AbstractTestEngineOnlyQueries.java:540",
        "SELECT COUNT(*) AS c, SUM(2) AS s, regionkey FROM (SELECT nationkey, regionkey FROM nation EXCEPT SELECT regionkey, regionkey FROM nation) n GROUP BY regionkey HAVING regionkey < 3",
        "SELECT COUNT(*) AS c, CAST(SUM(2) AS BIGINT) AS s, regionkey FROM (SELECT nationkey, regionkey FROM nation EXCEPT SELECT regionkey, regionkey FROM nation) n GROUP BY regionkey HAVING regionkey < 3",
    ),
    (
        "p_ref_in_reordered",
        "AbstractTestEngineOnlyQueries.java:613",
        "SELECT x FROM (values 1, 2, 3, 4) t(x) WHERE x IN (4, 2, 1)",
        "SELECT x FROM (values (1), (2), (3), (4)) t(x) WHERE x IN (4, 2, 1)",
    ),
    (
        "p_ref_null_in_list",
        "AbstractTestEngineOnlyQueries.java:617",
        "SELECT NULL in (1, 2, 3) AS a, 1 in (1, NULL, 3) AS b, 2 in (1, NULL, 3) AS c",
        None,
    ),
    (
        "p_ref_in_null_filter",
        "AbstractTestEngineOnlyQueries.java:625",
        "SELECT COUNT(*) AS c FROM (values 1) t(x) WHERE x IN (null, 0)",
        "SELECT COUNT(*) AS c FROM (values (1)) t(x) WHERE x IN (null, 0)",
    ),
    (
        "p_ref_null_in_subqueries",
        "AbstractTestEngineOnlyQueries.java:635",
        "SELECT NULL IN (SELECT 1) AS a, NULL IN (SELECT 1 WHERE FALSE) AS b, NULL IN (SELECT CAST(NULL AS BIGINT)) AS c",
        None,
    ),
    (
        "p_ref_length_null",
        "AbstractTestEngineOnlyQueries.java:700",
        "SELECT length(NULL) AS l",
        "SELECT CAST(length(NULL) AS BIGINT) AS l",
    ),
    (
        "p_ref_join_range_predicates",
        "AbstractTestJoinQueries.java:137",
        "SELECT COUNT(*) AS c "
        "FROM (SELECT * FROM lineitem WHERE orderkey % 16 = 0 AND partkey % 2 = 0) lineitem "
        "JOIN (SELECT * FROM orders WHERE orderkey % 16 = 0 AND custkey % 2 = 0) orders "
        "ON lineitem.orderkey % 8 = orders.orderkey % 8 AND lineitem.linenumber % 2 = 0 "
        "AND orders.custkey % 8 < 7 AND lineitem.suppkey % 10 < orders.custkey % 7 AND lineitem.suppkey % 7 > orders.custkey % 7",
        None,
    ),
    (
        "p_ref_join_interval_bound",
        "AbstractTestJoinQueries.java:163",
        "SELECT o.orderkey, o.orderdate, l.shipdate FROM orders o JOIN lineitem l ON l.orderkey = o.orderkey AND l.shipdate < o.orderdate + INTERVAL '10' DAY",
        None,
    ),
    (
        "p_ref_join_interval_band",
        "AbstractTestJoinQueries.java:169",
        "SELECT o.orderkey, o.orderdate, l.shipdate FROM orders o JOIN lineitem l ON o.orderkey=l.orderkey AND o.orderdate + INTERVAL '2' DAY <= l.shipdate AND l.shipdate < o.orderdate + INTERVAL '7' DAY",
        None,
    ),
    (
        "p_ref_join_negated_theta",
        "AbstractTestJoinQueries.java:199",
        "SELECT COUNT(*) AS c FROM "
        "(SELECT orderkey FROM lineitem WHERE orderkey < 1000) a "
        "JOIN "
        "(SELECT orderkey FROM orders WHERE orderkey < 2000) b "
        "ON NOT (a.orderkey <= b.orderkey)",
        None,
    ),
]


def _make(sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_tpch_views(spark, sf_dir)
        return spark.sql(translate(sql))

    return fn


for _name, _cite, _sql, _osql in _SUITE2:
    _fn = _make(_sql)
    _fn.__doc__ = f"Reference suite SQL ({_cite}), via plans/translate."
    probe(_name, oracle=f"{_PROLOGUE}\n{_osql or _sql}", tags=("refsuite",))(_fn)
