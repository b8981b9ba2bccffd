"""Scalar quantization (SQ8) for embedding columns — the storage/compute
scale path for similarity search.

At 100 TB an `array<float>` embedding column dominates storage and shuffle
width. SQ8 maps each dimension to an 8-bit code against per-dimension
[min, max] bounds fit in ONE aggregate pass, shrinking vectors 4x (and the
ANN candidate-scan bandwidth with them). Search runs approximate scoring on
the codes, takes an oversampled candidate set per query, then refines
exactly on the float vectors for just those candidates — the standard
quantize-then-rerank ANN recipe (FAISS-style), expressed entirely in
DataFrame ops:

- fit:      one groupless aggregate with 2*dim JVM expressions (no shuffle
            beyond the final single-row reduce);
- encode:   F.transform with per-dim bounds as literal arrays — whole-stage
            codegen, no Python;
- search:   approx scores on decoded codes (broadcast query side), top
            k*oversample per query via WindowGroupLimit, exact rescore of
            the tiny candidate set joined back by id.

Everything is deterministic: fixed bounds, round-half-up codes, (score
DESC, id ASC) tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from trino_private_spark.llm.similarity import cosine


def fit_sq8(
    corpus: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[list[float], list[float]]:
    """Per-dimension [min, max] bounds in one aggregate pass."""
    aggs = []
    for i in range(dim):
        e = F.element_at(F.col(vec_col), i + 1)
        aggs.append(F.min(e).alias(f"mn{i}"))
        aggs.append(F.max(e).alias(f"mx{i}"))
    row = corpus.agg(*aggs).collect()[0]
    mins = [float(row[f"mn{i}"]) for i in range(dim)]
    maxs = [float(row[f"mx{i}"]) for i in range(dim)]
    return mins, maxs


def _lit_arr(vals: list[float]) -> Column:
    return F.array(*[F.lit(v).cast("double") for v in vals])


def sq8_encode(vec: Column, mins: list[float], maxs: list[float]) -> Column:
    """array<float> -> array<int> of codes in [0, 255].

    code_i = round(clip((x_i - min_i) / (max_i - min_i), 0, 1) * 255);
    constant dimensions (max == min) encode to 0."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    with_mn = F.zip_with(
        vec, mn, lambda x, m: F.struct(x.cast("double").alias("x"), m.alias("mn"))
    )
    return F.zip_with(
        with_mn,
        mx,
        lambda s, m: F.when(m == s["mn"], F.lit(0)).otherwise(
            F.round(
                F.least(
                    F.greatest((s["x"] - s["mn"]) / (m - s["mn"]), F.lit(0.0)),
                    F.lit(1.0),
                )
                * 255
            ).cast("int")
        ),
    )


def sq8_decode(codes: Column, mins: list[float], maxs: list[float]) -> Column:
    """array<int> codes -> array<double> reconstruction (midpoint-free:
    x ~ min + code/255 * (max - min))."""
    mn, mx = _lit_arr(mins), _lit_arr(maxs)
    with_mn = F.zip_with(
        codes, mn, lambda c, m: F.struct(c.cast("double").alias("c"), m.alias("mn"))
    )
    return F.zip_with(
        with_mn,
        mx,
        lambda s, m: s["mn"] + s["c"] / F.lit(255.0) * (m - s["mn"]),
    )


def sq8_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    oversample: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    bounds: tuple[list[float], list[float]] | None = None,
) -> DataFrame:
    """Quantize-then-rerank top-k: approximate cosine on SQ8 codes selects
    k*oversample candidates per query; the exact float rescore touches only
    those. Output: (query_id, neighbor_id, score, rank)."""
    mins, maxs = bounds if bounds is not None else fit_sq8(corpus, vec_col, dim)
    c_codes = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        sq8_decode(
            sq8_encode(F.col(vec_col), mins, maxs), mins, maxs
        ).alias("cv_approx"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("qv"),
            sq8_decode(
                sq8_encode(F.col(vec_col), mins, maxs), mins, maxs
            ).alias("qv_approx"),
        )
    )
    approx = q.crossJoin(c_codes).select(
        "query_id",
        "qv",
        "neighbor_id",
        F.round(cosine(F.col("qv_approx"), F.col("cv_approx")), 6).alias("ascore"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("ascore").desc(), F.col("neighbor_id")
    )
    candidates = (
        approx.withColumn("r", F.row_number().over(w))
        .where(F.col("r") <= k * oversample)
        .select("query_id", "qv", "neighbor_id")
    )
    exact = candidates.join(
        corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
        ),
        "neighbor_id",
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "score",
            F.col("rank").cast("bigint").alias("rank"),
        )
    )
