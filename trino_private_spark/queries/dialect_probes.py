"""End-to-end Trino-dialect probe: a query written in Trino SQL (grammar
core/trino-parser/.../SqlBase.g4 — double-quoted identifiers, ARRAY[..]
literals with 1-based subscripts, strpos, date_diff('unit',..), OFFSET ..
FETCH FIRST .. ROWS ONLY) is run through plans/translate.translate() and
executed verbatim by spark.sql — proving a reference user's SQL text runs
unmodified. The oracle states the same query in DuckDB's dialect (which is
near-Trino for these constructs)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.plans.translate import translate
from trino_private_spark.queries import T, probe

_TRINO_SQL = """
SELECT "o_orderpriority" AS prio,
       count(*) AS cnt,
       ARRAY['lo','hi'][2] AS tag,
       strpos('hello', 'll') AS pos
FROM v_dialect_orders
WHERE date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) >= 0
GROUP BY o_orderpriority
ORDER BY prio
OFFSET 1 ROWS
FETCH FIRST 3 ROWS ONLY
"""


@probe(
    "p_trino_dialect_roundtrip",
    oracle="""
    SELECT o_orderpriority AS prio,
           count(*) AS cnt,
           ['lo','hi'][2] AS tag,
           CAST(strpos('hello', 'll') AS BIGINT) AS pos
    FROM orders
    WHERE date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) >= 0
    GROUP BY o_orderpriority
    ORDER BY prio
    LIMIT 3 OFFSET 1
    """,
    tags=("dialect",),
)
def p_trino_dialect_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("v_dialect_orders")
    return spark.sql(translate(_TRINO_SQL))
