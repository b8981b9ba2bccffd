"""Character-bigram language-model scoring for corpus quality bucketing.

CCNet (Wenzek et al. 2020, arXiv:1911.00359) buckets web documents by
language-model perplexity; the distributable, dependency-free analogue is
a character-bigram model trained on the corpus itself — repetitive or
gibberish documents score far from the corpus average. Two design calls
keep this exact, partition-order independent and cross-engine replayable
(the same determinism discipline as llm/cluster.py and llm/bpe.py):

- **No logarithms.** libm vs JVM transcendentals differ in ULPs, and
  float sums depend on partition order. Each bigram's add-one-smoothed
  conditional probability p = (cnt+1)/(ctx_cnt+V) — an exact-integer-
  derived double, identical in any engine — is quantized once, model-side,
  to an integer likelihood q = floor(1e9 * p). Per-document scores are
  then INTEGER sums (commutative/associative), and the final mean is one
  exact int/int division.
- **Model stays a DataFrame; scoring is a broadcast join.** The bigram
  model has at most V^2 rows (alphabet-squared — thousands), so scoring
  100 TB is: one zero-shuffle scan exploding (doc, bigram) pairs, a
  broadcast hash join against the model, and a groupBy(doc) whose
  map-side partial aggregation shrinks the shuffle to one row per doc per
  partition.

Scoring the training corpus itself (the CCNet use) never meets an unseen
bigram; ``score_docs`` still COALESCEs unseen pairs to the floor
likelihood q=0 so held-out text scores conservatively.

Reference parity note: the reference engine (Trino 364) has no LM-scoring
surface; beyond-reference training-pipeline work (llm/ north star).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000


def char_bigrams(text: Column) -> Column:
    """Adjacent character pairs of lowercased text (spaces included — word
    boundaries carry signal), via two shifted slices zipped together."""
    cs = F.split(F.lower(text), "")
    n = F.greatest(F.size(cs) - 1, F.lit(0))
    return F.zip_with(
        F.slice(cs, 1, n), F.slice(cs, 2, n), lambda a, b: F.concat(a, b)
    )


def charlm_train(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Bigram model (gram, q): q = floor(SCALE * (cnt+1)/(ctx_cnt+V))
    with V = distinct characters (add-one smoothing). One corpus-scale
    aggregation; the result is alphabet^2-bounded."""
    grams = df.select(
        F.explode(char_bigrams(F.col(text_col))).alias("gram")
    )
    counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("cnt"))
    ctx = counts.groupBy(F.substring("gram", 1, 1).alias("c1")).agg(
        F.sum("cnt").alias("ctx_cnt")
    )
    vocab = counts.select(
        F.countDistinct(F.substring("gram", 2, 1)).alias("v")
    )
    return (
        counts.join(ctx, F.substring("gram", 1, 1) == F.col("c1"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "gram",
            F.floor(
                F.lit(float(SCALE))
                * ((F.col("cnt") + 1) / (F.col("ctx_cnt") + F.col("v")))
            )
            .cast("bigint")
            .alias("q"),
        )
    )


def score_docs(
    df: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_bigrams, sum_q, score): score = mean integer likelihood —
    higher means more corpus-typical text. Exact at any parallelism."""
    grams = df.select(
        F.col(id_col).alias("id"),
        F.explode(char_bigrams(F.col(text_col))).alias("gram"),
    )
    return (
        grams.join(F.broadcast(model), "gram", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(F.coalesce(F.col("q"), F.lit(0))).alias("sum_q"),
        )
        .withColumn("score", F.col("sum_q") / F.col("n_bigrams"))
    )


def charlm_self_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Train on ``df`` and score ``df`` — the CCNet bucketing shape."""
    return score_docs(df, charlm_train(df, text_col), id_col, text_col)
