"""MATCH_RECOGNIZE probe. DuckDB has no row-pattern matching, but THIS
pattern — greedy ``(up+ down)`` with AFTER MATCH SKIP PAST LAST ROW — has a
closed relational form, so the probe gets a full hash oracle: every maximal
run of consecutive price-rise rows terminated by a price-drop row is
exactly one match (the NFA's failure path consumes one row at a time, so it
can neither split nor merge such runs). Hand-computed NFA expectations live
in tests/test_match_recognize.py as well."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe

_MR_ORACLE = """
WITH base AS (
  SELECT CAST(o_custkey AS VARCHAR) AS cust, o_custkey AS ck, o_orderkey,
         o_totalprice,
         LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pp
  FROM orders WHERE o_custkey <= 200),
flagged AS (
  SELECT *, CASE WHEN pp IS NULL THEN 'N'
                 WHEN o_totalprice > pp THEN 'U'
                 WHEN o_totalprice < pp THEN 'D' ELSE 'N' END AS flag
  FROM base),
bucketed AS (
  SELECT *, COALESCE(COUNT(*) FILTER (WHERE flag <> 'U')
              OVER (PARTITION BY ck ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rs
  FROM flagged),
agg AS (
  SELECT cust, ck, rs,
         COUNT(*) FILTER (WHERE flag = 'U') AS n_up,
         MIN(o_orderkey) FILTER (WHERE flag = 'U') AS start_k,
         MAX(CASE WHEN flag <> 'U' THEN o_orderkey END) AS end_k,
         MAX(CASE WHEN flag <> 'U' THEN flag END) AS term_flag
  FROM bucketed GROUP BY cust, ck, rs)
SELECT cust,
       ROW_NUMBER() OVER (PARTITION BY ck ORDER BY rs) - 1 AS match_id,
       CAST(start_k AS VARCHAR) AS start_val,
       CAST(end_k AS VARCHAR) AS end_val,
       n_up + 1 AS n_rows, n_up, CAST(1 AS BIGINT) AS n_down
FROM agg WHERE n_up >= 1 AND term_flag = 'D'
ORDER BY ck, match_id
"""


@probe("p_match_recognize", oracle=_MR_ORACLE, tags=("custom",))
def p_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching (SURVEY §2.1 #37, PatternRecognitionNode +
    window/matcher/Matcher.java): find per-customer "rising streak then
    drop" order-value patterns — (up+ down) over order history."""
    from trino_private_spark.operators.match_recognize import (
        Symbol,
        match_recognize,
    )

    t = T(spark, sf_dir)
    orders = t.orders.where(F.col("o_custkey") <= 200).select(
        F.col("o_custkey").cast("string").alias("cust"),
        "o_orderkey",
        "o_totalprice",
    )
    up = Symbol(
        "up",
        lambda cur, prev: prev is not None and cur.o_totalprice > prev.o_totalprice,
        "+",
    )
    down = Symbol(
        "down",
        lambda cur, prev: prev is not None and cur.o_totalprice < prev.o_totalprice,
        "1",
    )
    return match_recognize(
        orders,
        partition_by=["cust"],
        order_by=["o_orderkey"],
        pattern=[up, down],
        measure_col="o_orderkey",
    ).orderBy(F.col("cust").cast("bigint"), "match_id")
