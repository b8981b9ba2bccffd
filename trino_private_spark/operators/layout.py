"""Z-order (Morton-curve) data layout for multi-dimensional file pruning.

At 100 TB, a scan's cost is decided by how many files/row-groups the
engine can SKIP via parquet min/max statistics. A layout sorted on one
column prunes range predicates on that column only; interleaving the bits
of several columns' rank buckets (the Morton / Z-order curve) clusters
rows so every participating dimension gets partial pruning — the standard
lakehouse technique (Delta OPTIMIZE ZORDER BY, Iceberg sort orders) that
the reference's Hive connector leans on bucketing/sorted-by table
properties for (``plugin/trino-hive/.../HiveTableProperties.java``
``bucketed_by``/``sorted_by``; this module is the multi-dimensional
generalization, built Spark-first).

Everything is JVM-side column arithmetic (shift/and/or — whole-stage
codegen); the only driver traffic is one min/max aggregate row for the
bucketizer. Writing uses ``repartitionByRange`` on the z-value (one range
shuffle) + ``sortWithinPartitions`` so each output file owns a compact
z-range, i.e. a small hyper-rectangle of the key space.

Morton monotonicity (the property that makes box queries prunable): the
code is monotone under componentwise dominance — if ``a_j <= b_j`` for
every dimension ``j`` then ``z(a) <= z(b)`` — so every point of a query
box ``[lo, hi]`` has ``z`` within ``[z(lo), z(hi)]`` (probe
``p_zorder_curve`` oracles this per row).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _spread_bits(col: Column, bits: int, stride: int, offset: int) -> Column:
    """Write ``col``'s low ``bits`` bits into positions
    ``offset, offset+stride, offset+2*stride, ...`` (bit interleaving)."""
    out = None
    for i in range(bits):
        part = F.shiftleft(
            F.shiftright(col, i).bitwiseAND(F.lit(1)), i * stride + offset
        )
        out = part if out is None else out.bitwiseOR(part)
    return out


def morton_code(bucket_cols: list[Column], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each bucket column into one
    BIGINT z-value. All JVM-side; ``len(bucket_cols) * bits`` must be
    <= 63."""
    n = len(bucket_cols)
    if n * bits > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed BIGINT")
    z = None
    for j, c in enumerate(bucket_cols):
        s = _spread_bits(c.cast("long"), bits, n, j)
        z = s if z is None else z.bitwiseOR(s)
    return z


def bucketize(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map numeric ``col`` from [lo, hi] onto integer buckets
    [0, 2**bits - 1] (clamped; constant span degrades to bucket 0)."""
    span = float(hi) - float(lo)
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) / F.lit(span) * F.lit(2**bits)
    )
    return F.least(F.lit(2**bits - 1), F.greatest(F.lit(0), scaled)).cast("long")


def zorder_key(df: DataFrame, cols: list[str], bits: int = 12) -> Column:
    """Z-value column for ``df`` over ``cols``: one min/max stats pass
    (a single aggregated row to the driver), then pure JVM bucketize +
    interleave."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    stats = df.agg(*aggs).collect()[0]
    buckets = [
        bucketize(F.col(c), stats[f"__lo_{c}"], stats[f"__hi_{c}"], bits)
        for c in cols
    ]
    return morton_code(buckets, bits)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int = 16,
) -> None:
    """Write ``df`` as parquet z-ordered on ``cols``: range-partition on
    the z-value (one shuffle) and sort within partitions so every file
    covers a compact z-range."""
    z = zorder_key(df, cols, bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def file_minmax_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max from the parquet footers (what a reader's
    row-group pruner sees). Returns one dict per data file."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        meta = pq.ParquetFile(f).metadata
        lo: dict = {}
        hi: dict = {}
        for rg in range(meta.num_row_groups):
            g = meta.row_group(rg)
            for ci in range(g.num_columns):
                col = g.column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                st = col.statistics
                if st.min is not None:
                    lo[name] = min(lo.get(name, st.min), st.min)
                if st.max is not None:
                    hi[name] = max(hi.get(name, st.max), st.max)
        out.append(
            {"file": os.path.basename(f), "rows": meta.num_rows, "min": lo, "max": hi}
        )
    return out


def pruning_fraction(path: str, box: dict[str, tuple]) -> float:
    """Fraction of data files a min/max pruner must still read for a
    conjunctive range predicate ``{col: (lo, hi)}`` — the scan-cost proxy
    the layout is optimizing. 1.0 = no pruning."""
    stats = [s for s in file_minmax_stats(path, list(box)) if s["rows"]]
    if not stats:
        return 1.0
    hit = 0
    for s in stats:
        overlaps = True
        for c, (lo, hi) in box.items():
            if c not in s["min"] or s["min"][c] > hi or s["max"][c] < lo:
                overlaps = False
                break
        if overlaps:
            hit += 1
    return hit / len(stats)
