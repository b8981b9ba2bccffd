"""IGNORE NULLS window navigation + bitwise/base-conversion scalar probes
(SURVEY §2.4 'IGNORE NULLS for first/last/nth_value + lag/lead', §2.5
bitwise family)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


@probe(
    "p_ignore_nulls",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderstatus = 'O' THEN NULL
                  ELSE ROUND(o_totalprice, 2) END AS px
      FROM orders)
    SELECT o_orderkey,
           LAG(px IGNORE NULLS) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_px,
           FIRST_VALUE(px IGNORE NULLS) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_px
    FROM t ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("core",),
)
def p_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/first_value with IGNORE NULLS (reference window functions accept
    the modifier; Spark exposes it as the ignoreNulls/ignorenulls arg)."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    # DataFrame API exposes ignoreNulls only for first/last/nth_value;
    # LAG ... IGNORE NULLS needs the SQL form.
    return spark.sql(
        """
        WITH t AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderstatus = 'O' THEN NULL
                      ELSE ROUND(o_totalprice, 2) END AS px
          FROM orders)
        SELECT o_orderkey,
               LAG(px) IGNORE NULLS OVER (
                 PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_px,
               FIRST_VALUE(px) IGNORE NULLS OVER (
                 PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_px
        FROM t ORDER BY o_orderkey LIMIT 1000
        """
    )


@probe(
    "p_bitwise_scalar",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS ba, o_orderkey | 16 AS bo,
           xor(o_orderkey, 5) AS bx,
           CAST(bit_count(CAST(o_orderkey AS BIGINT)) AS INT) AS bc,
           o_orderkey << 2 AS shl, o_orderkey >> 1 AS shr
    FROM orders ORDER BY o_orderkey LIMIT 500
    """,
    tags=("functions",),
)
def p_bitwise_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (BitwiseFunctions.java: and/or/xor/bit_count/
    shift_left/shift_right)."""
    t = T(spark, sf_dir)
    k = F.col("o_orderkey")
    return (
        t.orders.select(
            "o_orderkey",
            k.bitwiseAND(255).alias("ba"),
            k.bitwiseOR(16).alias("bo"),
            k.bitwiseXOR(5).alias("bx"),
            F.bit_count(k).alias("bc"),
            F.shiftleft(k, 2).alias("shl"),
            F.shiftright(k, 1).alias("shr"),
        )
        .orderBy("o_orderkey")
        .limit(500)
    )


@probe(
    "p_base_conv",
    oracle="""
    SELECT o_orderkey,
           ltrim(lower(to_hex(o_orderkey)), '0') AS hx,
           to_binary(o_orderkey) AS bn
    FROM orders WHERE o_orderkey BETWEEN 1 AND 300 ORDER BY o_orderkey
    """,
    tags=("functions",),
)
def p_base_conv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_base/to_base (MathFunctions.java) -> conv; hex/binary digit
    strings (DuckDB to_hex pads differently per width? both lowercase
    unpadded for positive bigints)."""
    t = T(spark, sf_dir)
    k = F.col("o_orderkey")
    return (
        t.orders.where(k.between(1, 300))
        .select(
            "o_orderkey",
            F.lower(F.conv(k.cast("string"), 10, 16)).alias("hx"),
            F.conv(k.cast("string"), 10, 2).alias("bn"),
        )
        .orderBy("o_orderkey")
    )
