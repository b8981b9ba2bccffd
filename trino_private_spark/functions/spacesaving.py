"""SpaceSaving heavy-hitters sketch — the real ``approx_most_frequent``.

Reference: ``operator/aggregation/BigintApproximateMostFrequent.java`` /
``VarcharApproximateMostFrequent.java`` (registry ``FunctionRegistry.java:
630-631``), which aggregate through an ``ApproximateMostFrequentHistogram``
implementing the SpaceSaving algorithm (Metwally, Agrawal, El Abbadi,
ICDT'05) with a bounded bucket count.

Guarantees (the classic SpaceSaving invariants, property-tested):
- every estimate overestimates: ``est >= true_count``;
- the overestimate is bounded: ``est - true_count <= n / capacity``;
- any item with ``true_count > n / capacity`` is retained in the sketch.

Merging two sketches (Agarwal et al., "Mergeable Summaries", PODS'12):
sum estimates+errors for shared keys, offset absent keys by the other
sketch's min-threshold, re-truncate to capacity — the error bound becomes
``n_total / capacity`` and the guarantees survive, which is what makes the
two-phase Spark plan correct: mapInPandas folds each partition into one
KB-sized sketch (map-side combine, NO data shuffle), applyInPandas merges
the sketches per group.
"""

from __future__ import annotations

import pickle

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["SpaceSaving", "approx_most_frequent_sketch"]


class SpaceSaving:
    """Bounded-size heavy-hitters summary: key -> (count_estimate, error)."""

    __slots__ = ("capacity", "counts", "errors", "n")

    def __init__(self, capacity: int = 64):
        self.capacity = int(capacity)
        self.counts: dict = {}
        self.errors: dict = {}
        self.n = 0

    def add(self, key, weight: int = 1) -> "SpaceSaving":
        self.n += weight
        if key in self.counts:
            self.counts[key] += weight
            return self
        if len(self.counts) < self.capacity:
            self.counts[key] = weight
            self.errors[key] = 0
            return self
        # evict the current minimum: the newcomer inherits min+weight with
        # error = min (the SpaceSaving replacement step)
        mk = min(self.counts, key=lambda k: (self.counts[k], str(k)))
        mv = self.counts.pop(mk)
        self.errors.pop(mk)
        self.counts[key] = mv + weight
        self.errors[key] = mv
        return self

    def add_many(self, keys) -> "SpaceSaving":
        for k in keys:
            self.add(k)
        return self

    def merge(self, other: "SpaceSaving") -> "SpaceSaving":
        """Mergeable-summaries combine: keys absent on one side are charged
        that side's worst-case count (its min estimate), keeping the
        overestimate invariant, then the union is re-truncated."""
        self_min = min(self.counts.values(), default=0) if len(self.counts) >= self.capacity else 0
        other_min = (
            min(other.counts.values(), default=0)
            if len(other.counts) >= other.capacity
            else 0
        )
        keys = set(self.counts) | set(other.counts)
        merged_counts, merged_errors = {}, {}
        for k in keys:
            if k in self.counts and k in other.counts:
                merged_counts[k] = self.counts[k] + other.counts[k]
                merged_errors[k] = self.errors[k] + other.errors[k]
            elif k in self.counts:
                merged_counts[k] = self.counts[k] + other_min
                merged_errors[k] = self.errors[k] + other_min
            else:
                merged_counts[k] = other.counts[k] + self_min
                merged_errors[k] = other.errors[k] + self_min
        if len(merged_counts) > self.capacity:
            top = sorted(
                merged_counts, key=lambda k: (-merged_counts[k], str(k))
            )[: self.capacity]
            keep = set(top)
            merged_counts = {k: v for k, v in merged_counts.items() if k in keep}
            merged_errors = {k: v for k, v in merged_errors.items() if k in keep}
        self.counts, self.errors = merged_counts, merged_errors
        self.n += other.n
        return self

    def top_k(self, k: int) -> list[tuple]:
        """(key, estimate, error) for the k largest estimates,
        deterministic tie-break on the key string."""
        order = sorted(self.counts, key=lambda key: (-self.counts[key], str(key)))
        return [(key, self.counts[key], self.errors[key]) for key in order[:k]]

    def serialize(self) -> bytes:
        return pickle.dumps(
            {
                "capacity": self.capacity,
                "counts": self.counts,
                "errors": self.errors,
                "n": self.n,
            },
            protocol=4,
        )

    @staticmethod
    def deserialize(b: bytes) -> "SpaceSaving":
        d = pickle.loads(bytes(b))
        sk = SpaceSaving(d["capacity"])
        sk.counts, sk.errors, sk.n = d["counts"], d["errors"], d["n"]
        return sk


def approx_most_frequent_sketch(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    buckets: int = 10,
    capacity: int | None = None,
) -> DataFrame:
    """Distributed approx_most_frequent via SpaceSaving.

    Returns one row per group with an exploded top-``buckets`` list:
    group cols + ``item string, est bigint, err bigint, rank int``.
    ``capacity`` defaults to ``4 * buckets`` (the reference sizes its
    histogram above the requested bucket count for accuracy too)."""
    group_cols = group_cols or []
    cap = capacity or 4 * buckets
    if group_cols:
        gschema = df.select(*group_cols).schema
        gfields = (
            ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in gschema.fields)
            + ", "
        )
    else:
        gfields = ""
    sk_schema = f"{gfields}ss binary"
    out_schema = f"{gfields}item string, est bigint, err bigint, rank int"

    def partial(batches):
        acc: dict[tuple, SpaceSaving] = {}
        for pdf in batches:
            if group_cols:
                for key, grp in pdf.groupby(group_cols, sort=False, dropna=False):
                    kk = key if isinstance(key, tuple) else (key,)
                    acc.setdefault(kk, SpaceSaving(cap)).add_many(
                        grp[key_col].astype(str)
                    )
            else:
                acc.setdefault((), SpaceSaving(cap)).add_many(
                    pdf[key_col].astype(str)
                )
        rows = [
            dict(zip(group_cols, kk)) | {"ss": sk.serialize()}
            for kk, sk in acc.items()
        ]
        if rows:
            yield pd.DataFrame(rows)

    partials = df.select(*group_cols, key_col).mapInPandas(partial, sk_schema)

    def _rows(keys: dict, sk: SpaceSaving):
        return [
            keys | {"item": str(item), "est": int(est), "err": int(err), "rank": r + 1}
            for r, (item, est, err) in enumerate(sk.top_k(buckets))
        ]

    if not group_cols:

        def merge_all(batches):
            sk = SpaceSaving(cap)
            for pdf in batches:
                for b in pdf["ss"]:
                    sk.merge(SpaceSaving.deserialize(b))
            yield pd.DataFrame(_rows({}, sk), columns=["item", "est", "err", "rank"])

        return partials.coalesce(1).mapInPandas(merge_all, out_schema)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = SpaceSaving(cap)
        for b in pdf["ss"]:
            sk.merge(SpaceSaving.deserialize(b))
        keys = {c: pdf.iloc[0][c] for c in group_cols}
        cols = group_cols + ["item", "est", "err", "rank"]
        return pd.DataFrame(_rows(keys, sk), columns=cols)

    return partials.groupBy(*group_cols).applyInPandas(final, out_schema)
