"""MATCH_RECOGNIZE probe (rows-only: DuckDB has no row-pattern matching;
correctness is pinned by hand-computed expectations in
tests/test_match_recognize.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


@probe("p_match_recognize", oracle=None, tags=("custom",))
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
