"""Approximate/sketch functions (SURVEY.md §2.3, §2.5 sketch scalars).

Reference -> Spark mapping:

- approx_distinct            -> approx_count_distinct (HLL++)
- approx_set / merge /
  cardinality(hll)           -> hll_sketch_agg / hll_union_agg /
                                hll_sketch_estimate (Datasketches, Spark 3.5+)
- approx_percentile          -> percentile_approx
- qdigest/tdigest value_at_quantile -> percentile_approx (final-value path);
  mergeable-sketch column     -> reservoir_agg below (binary, mergeable)
- setdigest (HLL+MinHash:
  jaccard_index,
  intersection_cardinality)  -> element-wise-min MinHash signature aggregate
                                (JVM-side; no Python in the agg path)
- approx_most_frequent       -> approx_top_k / exact two-phase top-k

Sketch binary formats are NOT interchangeable with the reference
(capability-equivalent, per SURVEY §1.2); property tests pin error bounds.
"""

from __future__ import annotations

import pickle
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trino_private_spark.llm.dedup import _MERSENNE_P, _hash64


def approx_distinct(col) -> Column:
    return F.approx_count_distinct(col)


def approx_set(col) -> Column:
    """HLL sketch aggregate (Trino approx_set -> Datasketches HLL binary)."""
    return F.hll_sketch_agg(col)


def merge_hll(col) -> Column:
    """Trino merge(HyperLogLog) -> union of sketches."""
    return F.hll_union_agg(col)


def hll_cardinality(col) -> Column:
    return F.hll_sketch_estimate(col)


def approx_percentile(col, percentage, accuracy: int = 10000) -> Column:
    return F.percentile_approx(col, percentage, F.lit(accuracy))


def approx_most_frequent(
    df: DataFrame, col: str, k: int, group_by: list[str] | None = None
) -> DataFrame:
    """Heavy hitters (Trino approx_most_frequent, SpaceSaving-based:
    BigintApproximateMostFrequent.java). Spark-first: exact two-phase
    aggregation — partial count per partition (map-side combine keeps the
    shuffle at |distinct values| per partition, the same memory bound
    SpaceSaving targets), final top-k. Exact where the sketch is
    approximate — a strict upgrade at equal shuffle cost for moderate
    cardinality; for ultra-high-cardinality keys use approx_top_k below."""
    keys = group_by or []
    counted = df.groupBy(*keys, col).agg(F.count(F.lit(1)).alias("cnt"))
    if not keys:
        return counted.orderBy(F.col("cnt").desc(), F.col(col)).limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(F.col("cnt").desc(), F.col(col))
    return (
        counted.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .drop("rnk")
    )


def approx_top_k(col, k: int = 10) -> Column:
    """True sketch path (Datasketches frequent-items, Spark 3.5+)."""
    return F.approx_top_k(col, F.lit(k))


# --- mergeable quantile sketch stand-in (qdigest/tdigest column type) -------

_RESERVOIR_SIZE = 4096


class ReservoirSketch:
    """Fixed-size uniform reservoir — a mergeable quantile sketch stand-in
    for Trino's qdigest/tdigest *column* use (mergeable partial state;
    quantile extraction at the end). Deterministic given the seed ordering.
    Error: O(1/sqrt(size)) quantile error — property-tested."""

    __slots__ = ("n", "sample")

    def __init__(self) -> None:
        self.n = 0
        self.sample: list[float] = []

    def add(self, x: float) -> None:
        self.n += 1
        if len(self.sample) < _RESERVOIR_SIZE:
            self.sample.append(x)
        else:
            j = random.Random(self.n * 2654435761 % (1 << 32)).randrange(self.n)
            if j < _RESERVOIR_SIZE:
                self.sample[j] = x

    def merge(self, other: "ReservoirSketch") -> "ReservoirSketch":
        out = ReservoirSketch()
        out.n = self.n + other.n
        combined = self.sample + other.sample
        if len(combined) <= _RESERVOIR_SIZE:
            out.sample = combined
        else:
            rnd = random.Random(out.n * 40503 % (1 << 32))
            out.sample = rnd.sample(combined, _RESERVOIR_SIZE)
        return out

    def value_at_quantile(self, q: float) -> float:
        s = sorted(self.sample)
        if not s:
            return float("nan")
        idx = min(int(q * len(s)), len(s) - 1)
        return s[idx]

    def serialize(self) -> bytes:
        return pickle.dumps((self.n, self.sample), protocol=4)

    @staticmethod
    def deserialize(b: bytes) -> "ReservoirSketch":
        sk = ReservoirSketch()
        sk.n, sk.sample = pickle.loads(b)
        return sk


def reservoir_agg(df: DataFrame, value_col: str, group_cols: list[str]) -> DataFrame:
    """qdigest_agg/tdigest_agg stand-in: per-group mergeable sketch as a
    binary column, built with applyInPandas (Arrow-batched; one shuffle on
    the group keys — partial sketches per partition would need a custom
    JVM UDAF, acceptable trade at this state size)."""
    schema = ", ".join(f"{c} string" for c in group_cols) + ", sketch binary"

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = ReservoirSketch()
        for x in pdf[value_col]:
            if x is not None and not pd.isna(x):
                sk.add(float(x))
        head = pdf.iloc[0]
        row = {c: str(head[c]) for c in group_cols}
        row["sketch"] = sk.serialize()
        return pd.DataFrame([row])

    return df.groupBy(*group_cols).applyInPandas(build, schema=schema)


def sketch_quantile(sketch_col, q: float):
    """Scalar extraction from the binary sketch (pandas UDF)."""

    @F.pandas_udf("double")
    def _extract(s: pd.Series) -> pd.Series:
        return s.map(
            lambda b: ReservoirSketch.deserialize(b).value_at_quantile(q)
        )

    return _extract(sketch_col)


# --- SetDigest stand-in (MinHash-based jaccard / intersection) --------------


def setdigest_agg(col, num_hashes: int = 64, seed: int = 42) -> Column:
    """MinHash signature of a *grouped set of rows* (Trino setdigest
    SetDigestFunctions.java powers jaccard_index/intersection_cardinality).
    Element-wise min across rows per hash function — pure JVM aggregates,
    expressed as an array of per-hash MIN aggregate columns."""
    rnd = random.Random(seed)
    parts = []
    p_dec = F.lit(_MERSENNE_P).cast("decimal(38,0)")
    for _ in range(num_hashes):
        a = F.lit(rnd.randrange(1, _MERSENNE_P)).cast("decimal(38,0)")
        b = F.lit(rnd.randrange(0, _MERSENNE_P)).cast("decimal(38,0)")
        h = F.pmod(a * _hash64(col).cast("decimal(38,0)") + b, p_dec).cast("bigint")
        parts.append(F.min(h))
    return F.array(*parts)


def jaccard_index(sig_a, sig_b) -> Column:
    """Estimated Jaccard similarity of two setdigest signatures."""
    matches = F.size(
        F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda m: m)
    )
    return matches / F.size(sig_a).cast("double")


def intersection_cardinality(sig_a, sig_b, card_a, card_b) -> Column:
    """|A ∩ B| ≈ J * |A ∪ B| = J * (|A| + |B|) / (1 + J) given exact or HLL
    cardinalities of each side."""
    j = jaccard_index(sig_a, sig_b)
    return F.round(j * (card_a + card_b) / (F.lit(1.0) + j), 0).cast("bigint")


def hash_counts(col, num_hashes: int = 8, seed: int = 42) -> Column:
    """SetDigestFunctions.java hash_counts: expose the digest's internal
    hash -> multiplicity table. Aggregate expression: collect the group's
    64-bit value hashes once, then per hash function compute (min, count
    attaining min) with scalar HOFs over that array — all JVM-side.

    Diagnostic function (as in the reference): the collect materializes the
    group, so use on bounded groups; the scale path is setdigest_agg, which
    keeps only per-hash minima."""
    rnd = random.Random(seed)
    p_dec = F.lit(_MERSENNE_P).cast("decimal(38,0)")
    vals = F.collect_list(_hash64(col))
    mins, counts = [], []
    for _ in range(num_hashes):
        a = F.lit(rnd.randrange(1, _MERSENNE_P)).cast("decimal(38,0)")
        b = F.lit(rnd.randrange(0, _MERSENNE_P)).cast("decimal(38,0)")

        def mk(a=a, b=b):
            # factory: keeps the HOF lambda 1-arg (pyspark counts default
            # args toward lambda arity)
            return lambda v: F.pmod(a * v.cast("decimal(38,0)") + b, p_dec).cast("bigint")

        hashed = F.transform(vals, mk())
        hmin = F.array_min(hashed)

        def eq_min(hmin=hmin):
            return lambda h: h == hmin

        mins.append(hmin)
        counts.append(F.size(F.filter(hashed, eq_min())).cast("bigint"))
    return F.map_from_arrays(F.array(*mins), F.array(*counts))


# -- NumericHistogram: the reference's real numeric_histogram sketch -------
# (operator/aggregation/NumericHistogram.java: bounded bucket array; when
# full, greedily merge the adjacent pair with the smallest value gap into
# its weighted average — weight-sum and weighted-mean preserving by
# construction. DoubleHistogramAggregation drives it; output is
# map<double, double> bucket-value -> weight.)


class NumericHistogram:
    """Python twin of NumericHistogram.java (same greedy
    closest-adjacent-pair merge rule; weighted mean/total weight exactly
    preserved under merges)."""

    def __init__(self, max_buckets: int):
        import numpy as np

        self.max_buckets = int(max_buckets)
        self.values = np.empty(0, dtype=float)
        self.weights = np.empty(0, dtype=float)

    def add_all(self, vals, wts=None) -> None:
        import numpy as np

        vals = np.asarray(vals, dtype=float)
        wts = np.ones_like(vals) if wts is None else np.asarray(wts, dtype=float)
        # incremental compaction, like the reference: the entry array holds
        # at most 2x capacity and compacts down to capacity when full —
        # keeps each greedy pass O(capacity^2) instead of O(n^2) one-shot
        step = max(self.max_buckets, 16)
        for i in range(0, len(vals), step):
            self.values = np.concatenate([self.values, vals[i : i + step]])
            self.weights = np.concatenate([self.weights, wts[i : i + step]])
            self._compact()

    def merge(self, other: "NumericHistogram") -> "NumericHistogram":
        self.add_all(other.values, other.weights)
        return self

    def _compact(self) -> None:
        import numpy as np

        if len(self.values) == 0:
            return
        order = np.argsort(self.values, kind="mergesort")
        v, w = self.values[order], self.weights[order]
        # merge equal buckets first (mergeSameBuckets)
        uniq, inv = np.unique(v, return_inverse=True)
        if len(uniq) < len(v):
            w = np.bincount(inv, weights=w)
            v = uniq
        # greedy closest-adjacent-pair merges down to capacity
        v_list, w_list = list(v), list(w)
        while len(v_list) > self.max_buckets:
            diffs = [v_list[i + 1] - v_list[i] for i in range(len(v_list) - 1)]
            i = min(range(len(diffs)), key=diffs.__getitem__)
            nw = w_list[i] + w_list[i + 1]
            nv = (v_list[i] * w_list[i] + v_list[i + 1] * w_list[i + 1]) / nw
            v_list[i : i + 2] = [nv]
            w_list[i : i + 2] = [nw]
        self.values = np.array(v_list, dtype=float)
        self.weights = np.array(w_list, dtype=float)

    def buckets(self) -> dict:
        return {float(v): float(w) for v, w in zip(self.values, self.weights)}


def numeric_histogram(
    df, col: str, buckets: int = 10, weight_col: str | None = None
) -> dict:
    """Distributed numeric_histogram (DoubleHistogramAggregation): one
    mapInPandas pass builds a bounded partial histogram per partition
    (<= ``buckets`` entries each), the driver merges the tiny partials —
    O(partitions x buckets) driver traffic regardless of row count, the
    same partial/final split the reference's aggregation framework
    applies. Returns the bucket-value -> weight map."""
    import pandas as pd

    from pyspark.sql import functions as F

    cols = [F.col(col).cast("double").alias("_v")]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("double").alias("_w"))
    src = df.select(*cols).dropna(subset=["_v"])

    def partial(batches):
        h = NumericHistogram(buckets)
        for pdf in batches:
            if len(pdf):
                h.add_all(
                    pdf["_v"].to_numpy(),
                    pdf["_w"].to_numpy() if "_w" in pdf else None,
                )
        yield pd.DataFrame(
            {"v": [h.values.tolist()], "w": [h.weights.tolist()]}
        )

    parts = src.mapInPandas(partial, "v array<double>, w array<double>").collect()
    final = NumericHistogram(buckets)
    for r in sorted(parts, key=lambda r: (r["v"], r["w"])):
        if r["v"]:
            final.add_all(r["v"], r["w"])
    return final.buckets()
