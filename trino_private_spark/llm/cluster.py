"""Distributed k-means (Lloyd's algorithm) over embedding columns.

The 100-TB design constraint is REPRODUCIBILITY: floating-point summation
order varies with partitioning, so a naive double-precision Lloyd produces
different centroids (and eventually different assignments) on 32 cores vs
1000 executors. This implementation quantizes vectors to fixed-point
BIGINTs once up front (``scale`` = 1e6 keeps unit-norm embeddings exact to
6 decimals), after which every distance and every centroid-update sum is
EXACT integer arithmetic — commutative, associative, partition-order
independent. The same property makes the whole algorithm replayable
query-for-query in DuckDB, so the probe carries a full value-level oracle
(p_kmeans) instead of a property gate.

Plan shape per iteration (k centroids, d dims):
- assignment: one scan; distances to all k centroids are a single
  whole-stage-codegen expression (zip_with + aggregate over the quantized
  array against k literal arrays), argmin via array_min over
  struct(dist, j) — ties break to the lowest centroid index;
- update: one groupBy(cluster) with d per-dimension F.sum columns +
  count — partial (map-side) aggregation means the shuffle carries only
  ``partitions x k x (d+1)`` longs; the k x d result is collected to the
  driver (bounded, like the reference's KdbTree sample build).

New centroid components are floor(sum/count) back in the fixed-point
domain (identical IEEE division + floor both engines); a cluster that
loses all members keeps its previous centroid. Reference parity note: the
reference engine (Trino 364) ships only closed-model evaluators
(trino-ml's classify/regress); iterative training like this is
beyond-reference, north-star surface (same discipline as llm/dedup.py).

Overflow headroom: |q| <= scale (unit-ish embeddings), squared-diff sums
<= d * (2*scale)^2 ~ 2.6e14 for d=64; per-cluster component sums stay
exact while n_cluster * scale < 2^63 (~9.2e12 rows at scale=1e6).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize_fixed(vec: Column, scale: int = 1_000_000) -> Column:
    """array<float|double> -> array<bigint>: floor(x * scale). Float inputs
    are widened to double first (exact), so the multiply and floor are
    bit-identical across engines."""
    s = F.lit(float(scale))
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * s).cast("bigint")
    )


def _sqdist_to(qvec: Column, centroid: list[int]) -> Column:
    """Exact integer squared L2 distance from a quantized vector to a
    literal centroid."""
    lit = F.array(*[F.lit(int(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(qvec, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def assign_clusters(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Append ``cluster`` = argmin squared distance over the centroid list
    (ties -> lowest index). One scan, zero shuffles."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _sqdist_to(F.col("__q"), c).alias("d"),
                    F.lit(j).alias("j"),
                )
                for j, c in enumerate(centroids)
            ]
        )
    )
    return qdf.withColumn("cluster", best["j"])


def kmeans_fit(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
) -> list[list[int]]:
    """Run ``iters`` Lloyd iterations; return the k quantized centroids.

    Deterministic init: the k lowest-id vectors (the same discipline as
    similarity.ivf_topk / dedup.semantic_dedup — reproducible and
    oracle-able; callers wanting k-means++ can pass their own start via
    assign_clusters and iterate externally).
    """
    qdf = df.select(
        F.col(id_col).alias("__id"),
        quantize_fixed(F.col(vec_col), scale).alias("__q"),
    ).localCheckpoint(eager=True)  # iterated input: cut lineage once
    cents = [
        list(r["__q"])
        for r in qdf.orderBy("__id").limit(k).select("__q").collect()
    ]
    if not cents:
        raise ValueError("kmeans_fit: input has no rows")
    k = len(cents)  # fewer rows than k: every row is its own centroid
    d = len(cents[0])
    sums = [
        F.sum(F.element_at(F.col("__q"), i + 1)).alias(f"s{i}")
        for i in range(d)
    ]
    for _ in range(iters):
        agg = (
            assign_clusters(qdf, cents)
            .groupBy("cluster")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        new = {
            r["cluster"]: [
                # int -> double conversions then one IEEE division + floor:
                # bit-identical in any engine
                int(math.floor(float(r[f"s{i}"]) / float(r["n"])))
                for i in range(d)
            ]
            for r in agg
        }
        cents = [new.get(j, cents[j]) for j in range(k)]  # empty keeps old
    return cents


def kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 2,
    scale: int = 1_000_000,
) -> DataFrame:
    """Assignments after ``iters`` Lloyd iterations: (id, cluster, sqdist)
    where sqdist is the exact fixed-point squared L2 distance to the
    assigned centroid."""
    cents = kmeans_fit(df, id_col, vec_col, k, iters, scale)
    qdf = df.select(
        F.col(id_col).alias("id"),
        quantize_fixed(F.col(vec_col), scale).alias("__q"),
    )
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _sqdist_to(F.col("__q"), c).alias("d"),
                    F.lit(j).alias("j"),
                )
                for j, c in enumerate(cents)
            ]
        )
    )
    return qdf.select(
        "id",
        best["j"].alias("cluster"),
        best["d"].alias("sqdist"),
    )
