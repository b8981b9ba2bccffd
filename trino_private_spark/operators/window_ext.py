"""Window-frame extensions: GROUPS framing, missing from Spark.

Reference: operator/window/GroupsFraming.java (338 LoC) — frames counted in
peer groups (rows tied on the ORDER BY key) instead of physical rows.

Spark-first rewrite (no Python in the hot path): a GROUPS frame
``GROUPS BETWEEN a PRECEDING AND b FOLLOWING`` is exactly a RANGE frame over
``dense_rank()`` of the ORDER BY key:

    dr = dense_rank() OVER (PARTITION BY p ORDER BY k)
    agg(x) OVER (PARTITION BY p ORDER BY dr RANGE BETWEEN a PRECEDING AND b FOLLOWING)

because dense_rank is 1 per peer group and consecutive. Two window passes
over the same (partition, order) keys -> Catalyst reuses one sort+shuffle
(both Window nodes share child ordering), so the cost is one extra
column, not an extra shuffle — scales like any other window agg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def groups_frame_agg(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    agg: Column,
    preceding: int,
    following: int,
    out_col: str,
    _dr_col: str = "__groups_dr",
) -> DataFrame:
    """Apply ``agg`` (an unevaluated aggregate over column expressions, e.g.
    ``F.count(F.lit(1))`` or ``F.sum("x")``) with a GROUPS frame."""
    w_rank = Window.partitionBy(*partition_by).orderBy(*order_by)
    with_dr = df.withColumn(_dr_col, F.dense_rank().over(w_rank))
    w_groups = (
        Window.partitionBy(*partition_by)
        .orderBy(_dr_col)
        .rangeBetween(-preceding, following)
    )
    return with_dr.withColumn(out_col, agg.over(w_groups)).drop(_dr_col)


def groups_frame_count(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[str],
    preceding: int,
    following: int,
    out_col: str,
) -> DataFrame:
    return groups_frame_agg(
        df, partition_by, order_by, F.count(F.lit(1)), preceding, following, out_col
    )
