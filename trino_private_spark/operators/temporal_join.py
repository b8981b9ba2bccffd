"""As-of join and range (interval) join — operators the reference expresses
only as inefficient inequality joins (NestedLoopJoin over a theta predicate,
operator/LookupJoinOperator fallback path) and Spark lacks as builtins.
Both are first-class in time-series/feature-store workloads, so they get
scale-correct Spark-native implementations here.

Design notes (the 100 TB posture):

- asof_join is the union+window formulation: ONE hash shuffle on the key,
  no join node at all in the physical plan (plan-asserted in test_plans).
  The per-key sorted pass carries last-seen right values forward — O(n log
  n/partition) with Spark's external sort, no state beyond the row stream.
- range_join_points bins the interval side so a point-in-interval join
  becomes an equi-join on (key, bin) + residual filter. Candidate pairs are
  bounded by interval_span/bin_width per interval instead of |L|x|R|; the
  plan is a hash join, never BroadcastNestedLoopJoin (plan-asserted).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_on: str,
    right_on: str,
    value_cols: Sequence[str],
    tolerance=None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """For each left row, attach `value_cols` from the latest right row with
    ``right.right_on <= left.left_on`` within the same `keys` (backward
    as-of, pandas merge_asof / DuckDB ASOF JOIN semantics, ties inclusive).

    `tolerance`: optional max allowed gap (a Column interval or numeric
    delta); matches farther back are nulled. `matched_ts_col`: if given,
    also emit the matched right timestamp under that name.

    Rights with duplicate (keys, right_on) should be pre-aggregated — which
    of the ties wins is otherwise unspecified (same as the reference's
    unordered NestedLoopJoin output).
    """
    keys = list(keys)
    value_cols = list(value_cols)
    overlap = set(value_cols) & set(left.columns)
    assert not overlap, f"rename right value cols colliding with left: {overlap}"

    left_cols = left.columns
    l = left.withColumn("_ts", F.col(left_on)).withColumn("_src", F.lit(1))
    for v in value_cols:
        l = l.withColumn(v, F.lit(None))
    r = right.select(
        *keys, F.col(right_on).alias("_ts"), F.lit(0).alias("_src"), *value_cols
    )
    for c in left_cols:
        if c not in keys and c not in r.columns:
            r = r.withColumn(c, F.lit(None))
    cols = keys + [c for c in left_cols if c not in keys] + ["_ts", "_src"] + value_cols
    u = l.select(*cols).unionByName(r.select(*cols))

    # rights sort before lefts at equal ts (_src 0 < 1) -> inclusive match
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = u.withColumn(
        "_rts", F.last(F.when(F.col("_src") == 0, F.col("_ts")), ignorenulls=True).over(w)
    )
    filled = {v: F.last(v, ignorenulls=True).over(w) for v in value_cols}
    if tolerance is not None:
        gap_ok = F.col("_ts") - F.col("_rts") <= tolerance
        filled = {v: F.when(gap_ok, c).otherwise(F.lit(None)) for v, c in filled.items()}
    out = u.select(
        *left_cols,
        *[filled[v].alias(v) for v in value_cols],
        F.col("_rts").alias(matched_ts_col or "_rts"),
        "_src",
    ).where(F.col("_src") == 1)
    drop = ["_src"] + ([] if matched_ts_col else ["_rts"])
    return out.drop(*drop)


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Join each point row to every interval row with
    ``start_col <= point_col <= end_col`` (and equal `keys`, if given).

    The interval side explodes into ceil(span/bin_width)+1 bin replicas;
    points hash to one bin. The equi-join on (keys..., bin) prunes
    candidates to co-binned pairs; a residual filter applies the exact
    predicate. bin_width should be on the order of the typical interval
    span: shorter wastes replicas, longer widens candidate sets.

    Numeric domains (cast timestamps to epoch first); interval bounds
    inclusive.
    """
    keys = list(keys)
    p = points.withColumn(
        "_bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    i = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / F.lit(bin_width)).cast("long"),
                F.floor(F.col(end_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    cond = [p["_bin"] == i["_bin"]] + [p[k] == i[k] for k in keys]
    joined = p.join(i, cond)
    out = joined.where(
        (F.col(start_col) <= F.col(point_col))
        & (F.col(point_col) <= F.col(end_col))
    )
    return out.drop(p["_bin"]).drop(i["_bin"]).drop(*[i[k] for k in keys])
