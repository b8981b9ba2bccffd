"""Model-free document embeddings via feature hashing (the hashing trick,
Weinberger et al. 2009, arXiv:0902.2206): each token is hashed to a
dimension and a sign, and the document vector is the signed count sum —
a fixed-width integer vector any clustering/dedup stage can consume
(composes with llm/cluster.kmeans and llm/dedup.semantic_dedup when no
learned embedding model is available).

Scale + determinism posture (the house discipline):
- ZERO shuffles: the whole embedding is one codegen'd scan. Per token,
  (dim, sign) is materialized ONCE via an outer transform (HOF lambda
  bodies are not subexpression-eliminated — embedding md5 inside the
  per-dimension lambda would hash d times per token), then a fold updates
  the d-wide integer accumulator.
- EXACT integer vectors: signed counts, no floats — identical under any
  partitioning and engine, so the probe is FULL-hash-oracled (md5 is the
  dimension hash precisely because DuckDB computes the same md5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_dim_sign(tok: Column, d: int) -> Column:
    """struct(dim, sign) for one token: dim = first 8 md5 hex chars mod d,
    sign from the parity of the 9th hex char."""
    m = F.md5(tok.cast("binary"))
    h = F.conv(F.substring(m, 1, 8), 16, 10).cast("bigint")
    parity = F.conv(F.substring(m, 9, 1), 16, 10).cast("bigint") % 2
    sign = F.when(parity == 0, F.lit(1)).otherwise(F.lit(-1)).cast("bigint")
    return F.struct((h % d).alias("dim"), sign.alias("sign"))


def hashed_vector(text: Column, d: int = 32) -> Column:
    """Signed-count hashed vector (array<bigint> of length d) for a text
    column. One expression; no shuffle, no UDF."""
    toks = F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")
    hs = F.transform(toks, lambda t: token_dim_sign(t, d))
    acc0 = F.expr(
        f"CAST(array_repeat(0, {int(d)}) AS array<bigint>)"
    )

    def step(acc, e):
        return F.transform(
            acc,
            lambda x, i: x
            + F.when(i.cast("bigint") == e["dim"], e["sign"]).otherwise(
                F.lit(0).cast("bigint")
            ),
        )

    return F.aggregate(hs, acc0, step)


def hashed_vectors(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    d: int = 32,
) -> DataFrame:
    """(id, vec): feature-hashed document vectors, ready for
    llm/cluster.kmeans (vec_col='vec', scale=1)."""
    return df.select(
        F.col(id_col).alias("id"),
        hashed_vector(F.col(text_col), d).alias("vec"),
    )
