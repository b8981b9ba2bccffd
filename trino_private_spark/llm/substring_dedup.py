"""Cross-document EXACT SUBSTRING deduplication (training-data pipeline op).

The method of Lee et al., "Deduplicating Training Data Makes Language
Models Better" (ACL 2022, public): find maximal token spans of length
>= L that occur verbatim in more than one document.  The paper builds a
corpus-wide suffix array; the Spark-first equivalent is a k-gram
hash-join + diagonal island merge, which is fully relational and scales
horizontally:

1. tokenize + emit one k-gram per position — all JVM-side
   (``split`` / ``sequence`` / ``transform`` / ``slice`` /
   ``array_join`` + ``explode``; no Python);
2. self-join grams across documents (doc_a < doc_b) — ONE shuffle on the
   gram; any shared span of >= L tokens contains a run of shared k-grams
   at consecutive positions on one (doc_a, doc_b, pos_a - pos_b)
   diagonal;
3. gaps-and-islands over each diagonal (ONE window) merges runs into
   maximal spans: span_tokens = max(pos_a) - min(pos_a) + k.

Skew/scale note: ultra-common k-grams (boilerplate) make the self-join
quadratic in their document frequency — exactly the hot-shingle problem
LSH banding sidesteps.  ``max_gram_df`` drops grams appearing in more
than N documents before the join (the paper's suffix-array walk has the
same effective cutoff); at 100 TB set it to a small constant and handle
dropped boilerplate with the document-level MinHash pass instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["token_kgrams", "shared_spans", "substring_drop_list"]


def token_kgrams(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", k: int = 5
) -> DataFrame:
    """One row per (doc, 1-based position): the whitespace-token k-gram
    starting there.  Pure JVM expressions — survives codegen."""
    # Built from k SHIFTED SLICES zipped together: a per-index
    # slice/element_at inside a transform lambda re-evaluates the
    # tokenizer per element (lambda bodies are not CSE'd) — O(len^2)
    # splits per row.  The zip form references the token array a constant
    # k times.  (greatest(...,0) also sidesteps Spark's descending
    # sequence(1, 0) == [1, 0].)
    toks = F.split(F.col(text_col), " ")
    m = F.greatest(F.size(toks) - (k - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, k):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return (
        df.select(F.col(id_col).alias("doc_id"), grams.alias("_g"))
        .select("doc_id", F.posexplode("_g").alias("pos0", "gram"))
        .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "gram")
    )


def shared_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_tokens: int | None = None,
    max_gram_df: int | None = None,
) -> DataFrame:
    """Maximal verbatim shared spans of >= max(k, min_tokens) tokens.

    Returns (doc_a, doc_b, a_start, b_start, span_tokens), doc_a < doc_b,
    positions 1-based."""
    min_tokens = max(min_tokens or k, k)
    g = token_kgrams(df, text_col, id_col, k)
    if max_gram_df is not None:
        hot = (
            g.groupBy("gram")
            .agg(F.countDistinct("doc_id").alias("df"))
            .where(F.col("df") > max_gram_df)
            .select("gram")
        )
        g = g.join(F.broadcast(hot), "gram", "left_anti")
    a = g.alias("a")
    b = g.alias("b")
    m = a.join(b, F.col("a.gram") == F.col("b.gram")).where(
        F.col("a.doc_id") < F.col("b.doc_id")
    ).select(
        F.col("a.doc_id").alias("doc_a"),
        F.col("b.doc_id").alias("doc_b"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    isl = m.withColumn("grp", F.col("pa") - F.row_number().over(w))
    spans = (
        isl.groupBy("doc_a", "doc_b", "diag", "grp")
        .agg(
            F.min("pa").alias("a_start"),
            F.min("pb").alias("b_start"),
            (F.max("pa") - F.min("pa") + k).alias("span_tokens"),
        )
        .where(F.col("span_tokens") >= min_tokens)
        .select("doc_a", "doc_b", "a_start", "b_start", "span_tokens")
    )
    return spans


def substring_drop_list(spans: DataFrame) -> DataFrame:
    """Keep-lowest-id policy over span pairs: every doc that shares a span
    with a lower-id doc is dropped (same policy as the document-level
    dedup_keep_list)."""
    return spans.select(F.col("doc_b").alias("doc_id")).distinct()
