"""Z-order layout: curve arithmetic, write path, and the pruning payoff
(multi-dimensional min/max file skipping) measured from real parquet
footers."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from trino_private_spark.operators.layout import (
    file_minmax_stats,
    morton_code,
    pruning_fraction,
    zorder_key,
    zorder_write,
)


def _grid(spark, n=64):
    return (
        spark.range(n * n)
        .select(
            (F.col("id") % n).alias("x"),
            (F.col("id") / n).cast("long").alias("y"),
            F.col("id").alias("payload"),
        )
    )


def test_morton_monotone_componentwise(spark):
    # z is monotone under componentwise dominance: the box-pruning property
    df = _grid(spark, 16).withColumn(
        "z", morton_code([F.col("x"), F.col("y")], 4)
    )
    rows = {(r.x, r.y): r.z for r in df.collect()}
    for (x, y), z in rows.items():
        if x + 1 < 16:
            assert rows[(x + 1, y)] > z
        if y + 1 < 16:
            assert rows[(x, y + 1)] > z


def test_morton_is_jvm_side(spark):
    plan = (
        _grid(spark, 8)
        .withColumn("z", morton_code([F.col("x"), F.col("y")], 3))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_zorder_key_buckets_full_range(spark):
    df = _grid(spark, 32)
    z = zorder_key(df, ["x", "y"], bits=5)
    mm = df.select(z.alias("z")).agg(F.min("z"), F.max("z")).collect()[0]
    assert mm[0] == 0
    assert mm[1] == 2**10 - 1  # both extremes reached at bits=5 x 2 dims


def test_zorder_pruning_beats_linear(spark, tmp_path):
    df = _grid(spark, 64)  # 4096 rows over a 64x64 key space
    zpath = str(tmp_path / "zorder")
    lpath = str(tmp_path / "linear")
    zorder_write(df, zpath, ["x", "y"], bits=6, num_files=16)
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lpath)
    )

    stats = file_minmax_stats(zpath, ["x", "y"])
    assert sum(s["rows"] for s in stats) == 64 * 64

    box = {"x": (8, 23), "y": (8, 23)}  # a 16x16 box = 1/16 of the space
    z_frac = pruning_fraction(zpath, box)
    l_frac_y = pruning_fraction(lpath, {"y": (8, 23)})
    # z-order prunes a 2-D box to a minority of files; the x-sorted layout
    # cannot prune on y at all
    assert z_frac <= 0.5, f"z-order box fraction {z_frac}"
    assert l_frac_y == 1.0
    # and a y-only predicate still prunes under z-order
    assert pruning_fraction(zpath, {"y": (8, 23)}) < 1.0
