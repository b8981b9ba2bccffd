"""Similarity search over embedding columns (array<float>).

- ``cosine``            — JVM-side cosine via zip_with + aggregate (no Python)
- ``brute_force_topk``  — exact top-k: broadcast the (small) query set against
                          the corpus; one scan, no corpus shuffle
- ``lsh_ann_topk``      — approximate NN via random-hyperplane LSH buckets:
                          corpus is bucketed once, probes join only their
                          bucket — the 100 TB path
- ``ivf_topk``          — IVF-style: coarse-quantize to the nearest of K
                          centroid buckets, search only n_probe buckets

Scale notes: brute force is O(|Q| * |corpus|) compute but zero shuffle when
|Q| is broadcastable; per-query top-k uses WindowGroupLimit (heap per
partition) so nothing near the full corpus crosses the shuffle. LSH/IVF cut
the compute side by bucketing; both keep one row per (vector, bucket).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns in double precision."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k of each query vector against the corpus.

    The query side is broadcast (it is the small side by construction), so
    the corpus is scanned in place — no shuffle of corpus rows; the only
    exchange is the per-query top-k heap merge. Deterministic tie-break:
    (score DESC, neighbor id ASC) on the 6-decimal-rounded score, so the
    result is stable across engines and runs."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = q.crossJoin(c).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "score", F.col("rank").cast("bigint").alias("rank")
        )
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    import random

    rnd = random.Random(seed)
    return [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane, packed into a
    bigint. Vectors close in cosine land in the same bucket w.h.p."""
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0).cast("double"),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i).cast("bigint")).otherwise(0)
    return bucket


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: corpus and queries are hashed to sign-LSH buckets;
    scoring happens only within a query's bucket.

    Recall tuning: fewer planes -> bigger buckets -> higher recall, more
    compute; ``n_tables`` independent hash tables (distinct hyperplane
    seeds) multiply recall the way classic multi-table LSH does — a true
    neighbor is found if ANY table buckets it with the query.  Shuffle
    profile: each side is exploded n_tables times and hash-shuffled on
    (table, bucket); candidate pairs are deduplicated before scoring so a
    pair found by several tables is scored once."""
    tables = [
        (ti, _hyperplanes(dim, n_planes, seed + 1000 * ti)) for ti in range(n_tables)
    ]

    # All tables' buckets in ONE Arrow-batched matmul: X (n x dim) against
    # the stacked plane matrix (dim x T*B), signs packed per table. The
    # equivalent per-plane zip_with/aggregate expressions evaluate
    # INTERPRETED (Spark HOF lambdas never enter codegen), which at
    # T x B = 80 planes costs ~10x more than this numpy path; identical
    # bucket ids (same planes, same bit packing).
    plane_mat = np.array(
        [p for _, planes in tables for p in planes], dtype=float
    ).T  # (dim, T*B)
    bit_weights = 1 << np.arange(n_planes, dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def _table_buckets(v: pd.Series) -> pd.Series:
        X = np.vstack(v.map(np.asarray).to_numpy()).astype(float)
        signs = (X @ plane_mat) > 0  # (n, T*B)
        packed = (
            signs.reshape(len(X), len(tables), n_planes) * bit_weights
        ).sum(axis=2)
        return pd.Series([row.tolist() for row in packed])

    def hashed(df: DataFrame, ident: str, out_id: str, vec_out: str) -> DataFrame:
        return df.select(
            F.col(ident).alias(out_id),
            F.col(vec_col).alias(vec_out),
            F.posexplode(_table_buckets(F.col(vec_col))).alias("tbl", "bucket"),
        )

    c = hashed(corpus, id_col, "neighbor_id", "cv")
    q = hashed(queries, query_id_col, "query_id", "qv")
    pairs = (
        q.join(c, ["tbl", "bucket"])
        .select("query_id", "neighbor_id", "qv", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "score", F.col("rank").cast("bigint").alias("rank")
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style ANN: sample ``n_centroids`` corpus vectors as centroids
    (deterministic: lowest ids), assign each corpus vector to its nearest
    centroid (broadcast centroids — tiny), and search each query only in its
    ``n_probe`` nearest centroid cells. At 100 TB the assignment is one
    broadcast-join scan; the per-cell search shuffles only cell-matched rows."""
    cents = F.broadcast(
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_v"))
    )
    # corpus -> nearest centroid
    c_scored = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).crossJoin(cents).select(
        "neighbor_id",
        "cv",
        "cent_id",
        F.round(cosine(F.col("cv"), F.col("cent_v")), 6).alias("cs"),
    )
    w_c = Window.partitionBy("neighbor_id").orderBy(F.col("cs").desc(), F.col("cent_id"))
    c_cells = (
        c_scored.withColumn("r", F.row_number().over(w_c))
        .where(F.col("r") == 1)
        .select("neighbor_id", "cv", "cent_id")
    )
    # queries -> n_probe nearest centroids
    q_scored = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("qv")
    ).crossJoin(cents).select(
        "query_id",
        "qv",
        "cent_id",
        F.round(cosine(F.col("qv"), F.col("cent_v")), 6).alias("cs"),
    )
    w_q = Window.partitionBy("query_id").orderBy(F.col("cs").desc(), F.col("cent_id"))
    q_cells = (
        q_scored.withColumn("r", F.row_number().over(w_q))
        .where(F.col("r") <= n_probe)
        .select("query_id", "qv", "cent_id")
    )
    scored = q_cells.join(c_cells, "cent_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", "score", F.col("rank").cast("bigint").alias("rank")
        )
    )
