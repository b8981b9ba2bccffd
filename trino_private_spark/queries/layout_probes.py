"""Z-order curve probe: the Morton interleave arithmetic and its
box-pruning monotonicity property, full-hash-oracled.

The DuckDB oracle replays the IDENTICAL bit arithmetic (shift/and/or),
generated from the same (bits, dims) parameters, so the probe pins the
exact z-value per row plus the property that makes z-layouts prunable:
for every row inside the query box, z(row) lies within [z(lo), z(hi)].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.operators.layout import morton_code
from trino_private_spark.queries import T, probe

_BITS = 4
_BOX = ((2, 9), (1, 6))  # x in [2,9], y in [1,6]


def _morton_sql(xs: str, ys: str, bits: int) -> str:
    """DuckDB expression replaying morton_code([x, y], bits)."""
    parts = [f"((({xs} >> {i}) & 1) << {2 * i})" for i in range(bits)]
    parts += [f"((({ys} >> {i}) & 1) << {2 * i + 1})" for i in range(bits)]
    return " | ".join(parts)


def _z_const(x: int, y: int, bits: int = _BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


(_XLO, _XHI), (_YLO, _YHI) = _BOX
_ZLO, _ZHI = _z_const(_XLO, _YLO), _z_const(_XHI, _YHI)


@probe(
    "p_zorder_curve",
    oracle=f"""
    SELECT n_nationkey AS k,
           x, y,
           CAST({_morton_sql('x', 'y', _BITS)} AS BIGINT) AS z,
           (NOT (x BETWEEN {_XLO} AND {_XHI} AND y BETWEEN {_YLO} AND {_YHI})
            OR ({_morton_sql('x', 'y', _BITS)} BETWEEN {_ZLO} AND {_ZHI})) AS in_zrange
    FROM (SELECT n_nationkey, n_nationkey % 16 AS x, (n_nationkey * 7 + n_regionkey) % 16 AS y
          FROM nation)
    ORDER BY k
    """,
    tags=("layout",),
)
def p_zorder_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton z-values over a 16x16 grid derived from nation, plus the
    componentwise-dominance monotonicity flag: points inside the query box
    must have z within [z(box_lo), z(box_hi)] (always TRUE)."""
    t = T(spark, sf_dir)
    base = t.nation.select(
        F.col("n_nationkey").alias("k"),
        (F.col("n_nationkey") % 16).alias("x"),
        ((F.col("n_nationkey") * 7 + F.col("n_regionkey")) % 16).alias("y"),
    )
    z = morton_code([F.col("x"), F.col("y")], _BITS).alias("z")
    out = base.select("k", "x", "y", z)
    in_box = (
        F.col("x").between(_XLO, _XHI) & F.col("y").between(_YLO, _YHI)
    )
    return out.withColumn(
        "in_zrange", ~in_box | F.col("z").between(_ZLO, _ZHI)
    ).orderBy("k")
