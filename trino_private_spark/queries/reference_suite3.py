"""Reference-suite probes, tranche 3: window-framing and ORDER-BY shapes
from ``AbstractTestWindowQueries.java`` (pre-sorted window inputs, Trino's
window-ORDER-BY null-default, value window functions over an explicit
ROWS frame) and ``AbstractTestOrderByQueries.java`` (LIMIT ALL, ORDER BY
similar expressions, ORDER BY under projections, group-by-derived-letter).

Same contract as ``reference_suite.py``: cited suite SQL (edits limited to
aliasing computed columns), translated via ``plans/translate``, over
TPCH-connector-named views; DuckDB oracle = identical SQL over the rename
prologue. Determinism: every LIMIT sits on a unique total order
(``orderkey``/``row_number`` over a one-null key), so the prefix is stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.plans.translate import translate
from trino_private_spark.queries import probe
from trino_private_spark.queries.reference_suite import (
    _PROLOGUE,
    _register_tpch_views,
)

_SUITE3: list[tuple[str, str, str]] = [
    (
        "p_ref_window_presorted_count",
        "AbstractTestWindowQueries.java:503",
        "SELECT orderkey, COUNT(*) OVER (ORDER BY orderkey, custkey) AS c "
        "FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) "
        "ORDER BY orderkey LIMIT 5",
    ),
    (
        "p_ref_window_nulls_first",
        "AbstractTestWindowQueries.java:556",
        "SELECT orderkey, row_number() OVER (ORDER BY nullif(orderkey, 3) NULLS FIRST) AS rn "
        "FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) "
        "ORDER BY 2 ASC LIMIT 5",
    ),
    (
        "p_ref_window_nulls_default",
        "AbstractTestWindowQueries.java:581",
        # Trino's window ORDER BY default is NULLS LAST (the suite asserts
        # it matches the explicit NULLS LAST variant); the translator
        # spells that out for Spark, whose default is NULLS FIRST.
        "SELECT orderkey, row_number() OVER (ORDER BY nullif(orderkey, 3)) AS rn "
        "FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) "
        "ORDER BY 2 DESC LIMIT 5",
    ),
    (
        "p_ref_window_value_functions",
        "AbstractTestWindowQueries.java:592",
        "SELECT * FROM ( "
        "  SELECT orderkey, orderstatus "
        "    , first_value(orderkey + 1000) OVER (PARTITION BY orderstatus ORDER BY orderkey) fvalue "
        "    , nth_value(orderkey + 1000, 2) OVER (PARTITION BY orderstatus ORDER BY orderkey "
        "        ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) nvalue "
        "    FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) x "
        "  ) x "
        "ORDER BY orderkey LIMIT 5",
    ),
    (
        "p_ref_orderby_limit_all",
        "AbstractTestOrderByQueries.java:127",
        "SELECT custkey, totalprice FROM orders ORDER BY orderkey LIMIT ALL",
    ),
    (
        "p_ref_orderby_similar_exprs",
        "AbstractTestOrderByQueries.java:210",
        "WITH t AS (SELECT orderkey x, totalprice y, orderkey z FROM orders) "
        "SELECT x, y, z FROM t ORDER BY x, y, z LIMIT 1",
    ),
    (
        "p_ref_orderby_under_projections",
        "AbstractTestOrderByQueries.java:217",
        "SELECT nationkey, arbitrary_column + arbitrary_column AS s "
        "FROM "
        "( "
        "   SELECT nationkey, COALESCE(arbitrary_column, 0) arbitrary_column "
        "   FROM ( "
        "      SELECT nationkey, 1 arbitrary_column "
        "      FROM nation "
        "      ORDER BY 1 ASC))",
    ),
    (
        "p_ref_orderby_derived_letter",
        "AbstractTestOrderByQueries.java:117",
        "SELECT count(*) AS c, letter FROM (SELECT substr(name,1,1) letter FROM nation) x GROUP BY letter ORDER BY letter",
    ),
]


def _make(sql: str):
    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register_tpch_views(spark, sf_dir)
        return spark.sql(translate(sql))

    return fn


# Oracle-side dtype pinning (see reference_suite._ORACLE_OVERRIDES):
# DuckDB's row_number() is BIGINT, Spark's is INT.
_ORACLE_OVERRIDES3: dict[str, str] = {
    "p_ref_window_nulls_first": (
        "SELECT orderkey, CAST(row_number() OVER (ORDER BY nullif(orderkey, 3) NULLS FIRST) AS INTEGER) AS rn "
        "FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) "
        "ORDER BY 2 ASC LIMIT 5"
    ),
    "p_ref_window_nulls_default": (
        "SELECT orderkey, CAST(row_number() OVER (ORDER BY nullif(orderkey, 3) NULLS LAST) AS INTEGER) AS rn "
        "FROM (SELECT * FROM orders ORDER BY orderkey LIMIT 10) "
        "ORDER BY 2 DESC LIMIT 5"
    ),
}

for _name, _cite, _sql in _SUITE3:
    _fn = _make(_sql)
    _fn.__doc__ = f"Reference suite SQL ({_cite}), via plans/translate."
    _osql = _ORACLE_OVERRIDES3.get(_name, _sql)
    # A query that itself opens a WITH merges into the prologue's CTE list.
    if _osql.upper().startswith("WITH "):
        _oracle = f"{_PROLOGUE},\n{_osql[5:]}"
    else:
        _oracle = f"{_PROLOGUE}\n{_osql}"
    probe(_name, oracle=_oracle, tags=("refsuite",))(_fn)
