"""Reference-suite probes, tranche 5: ROW-type SQL from the reference
suites, run as written — nested ``CAST(ROW(...) AS ROW(name type, ...))``
literals (RowType.java), field access through 1-based array subscripts
(``a.col1[1].col1``), window functions partitioned by row fields
(AbstractTestWindowQueries.java:99,110), row-typed GROUP BY keys
(AbstractTestAggregations.java:192), and row-field dereference out of a
VALUES table (AbstractTestEngineOnlyQueries.java:681).

The translator lowers Trino ROW syntax onto Spark structs: type targets
become DDL ``STRUCT<name: T>`` recursively (arrays/maps of rows included),
``VALUES ROW(..)`` table constructors lose the keyword, scalar ``row(``
becomes ``struct(``. Oracles state the suites' own expected VALUES (their
H2 side) or the suite's relational rewrite over the rename prologue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.plans.translate import translate
from trino_private_spark.queries import probe
from trino_private_spark.queries.reference_suite import (
    _PROLOGUE,
    _register_tpch_views,
)

_ROWTYPE = (
    "ROW(col0 double, col1 array(ROW(col0 integer, col1 double)), "
    "col2 row(col0 integer, col1 double))"
)

_SUITE5: list[tuple[str, str, str, str, bool]] = [
    (
        "p_ref_row_window",
        "AbstractTestWindowQueries.java:99",
        "SELECT a.col0 AS k, "
        "SUM(a.col1[1].col1) OVER(PARTITION BY a.col2.col0) AS s1, "
        "SUM(a.col2.col1) OVER(PARTITION BY a.col2.col0) AS s2 FROM "
        "(VALUES "
        f"ROW(CAST(ROW(1.0, ARRAY[row(31, 14.5E0), row(12, 4.2E0)], row(3, 4.0E0))  AS {_ROWTYPE})), "
        f"ROW(CAST(ROW(2.2, ARRAY[row(41, 13.1E0), row(32, 4.2E0)], row(6, 6.0E0))  AS {_ROWTYPE})), "
        f"ROW(CAST(ROW(2.2, ARRAY[row(41, 17.1E0), row(45, 4.2E0)], row(7, 16.0E0)) AS {_ROWTYPE})), "
        f"ROW(CAST(ROW(2.2, ARRAY[row(41, 13.1E0), row(32, 4.2E0)], row(6, 6.0E0))  AS {_ROWTYPE})), "
        f"ROW(CAST(ROW(3.1, ARRAY[row(41, 13.1E0), row(32, 4.2E0)], row(6, 6.0E0))  AS {_ROWTYPE}))) t(a) ",
        # E0 suffixes keep the oracle DOUBLE (bare decimals are DECIMAL in
        # DuckDB, which pandas renders as object)
        "SELECT * FROM (VALUES (1.0E0, 14.5E0, 4.0E0), (2.2E0, 39.3E0, 18.0E0), "
        "(2.2E0, 39.3E0, 18.0E0), (2.2E0, 17.1E0, 16.0E0), (3.1E0, 39.3E0, 18.0E0)) t(k, s1, s2)",
        False,
    ),
    (
        "p_ref_row_filter",
        "AbstractTestWindowQueries.java:110",
        "SELECT a.col1[1].col0 AS k, "
        "SUM(a.col0) OVER(PARTITION BY a.col1[1].col0) AS s0, "
        "SUM(a.col1[1].col1) OVER(PARTITION BY a.col1[1].col0) AS s1, "
        "SUM(a.col2.col1) OVER(PARTITION BY a.col1[1].col0) AS s2 FROM "
        "(VALUES "
        f"ROW(CAST(ROW(1.0, ARRAY[row(31, 14.5E0), row(12, 4.2E0)], row(3, 4.0E0)) AS {_ROWTYPE})), "
        f"ROW(CAST(ROW(3.1, ARRAY[row(41, 13.1E0), row(32, 4.2E0)], row(6, 6.0E0)) AS {_ROWTYPE})), "
        f"ROW(CAST(ROW(2.2, ARRAY[row(31, 14.2E0), row(22, 5.2E0)], row(5, 4.0E0)) AS {_ROWTYPE}))) t(a) "
        "WHERE a.col1[2].col1 > a.col2.col0",
        "SELECT * FROM (VALUES (31, 3.2E0, 28.7E0, 8.0E0), (31, 3.2E0, 28.7E0, 8.0E0)) t(k, s0, s1, s2)",
        False,
    ),
    (
        "p_ref_row_cast_access",
        "AbstractTestEngineOnlyQueries.java:681",
        "SELECT a.Col0 AS v FROM (VALUES row(cast(ROW(1,2) AS ROW(col0 integer, col1 integer)))) AS t (a)",
        "SELECT 1 AS v",
        False,
    ),
    (
        "p_ref_row_group_key",
        "AbstractTestAggregations.java:192",
        "SELECT col.col1 AS c1, cnt FROM (SELECT CAST(row(custkey, custkey) AS row(col0 bigint, col1 bigint)) col, COUNT(*) cnt FROM orders GROUP BY 1)",
        "SELECT custkey AS c1, COUNT(*) AS cnt FROM orders GROUP BY custkey",
        True,
    ),
]


def _make(sql: str, needs_views: bool):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        if needs_views:
            _register_tpch_views(spark, sf_dir)
        return spark.sql(translate(sql))

    return fn


for _name, _cite, _sql, _osql, _views in _SUITE5:
    _fn = _make(_sql, _views)
    _fn.__doc__ = f"Reference suite SQL ({_cite}), via plans/translate."
    _oracle = f"{_PROLOGUE}\n{_osql}" if _views else _osql
    probe(_name, oracle=_oracle, tags=("refsuite",))(_fn)
