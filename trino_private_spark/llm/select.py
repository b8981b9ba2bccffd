"""Target-distribution data selection over hashed n-gram features —
the DSIR discipline (Data Selection via Importance Resampling, Xie et
al. 2023, arXiv:2302.03169): score raw-corpus documents by how much
their hashed token distribution leans toward a small TARGET corpus
(the domain you want more of) versus the raw distribution, then keep
the top slice.

Exactness variant: DSIR sums per-token log likelihood ratios; floating
logs are not bit-portable across engines (glibc vs JVM ln differ in the
last ulp), so the score here is the per-token likelihood-ratio TEST
vote — a token votes "target" iff

    (ct(b) + 1) * (Tr + B)  >  (cr(b) + 1) * (Tt + B)

i.e. the add-one-smoothed target probability of its hash bucket exceeds
the raw probability (exactly the SIGN of DSIR's per-token log ratio).
All integer arithmetic (DECIMAL(38,0) cross-products, overflow-safe to
~1e19-token corpora), so the document score n_lean / n_tokens replays
bit-identically in any engine — full-hash oracle-able. The bucket hash
is md5-derived for the same reason (the hashing trick, Weinberger 2009;
same dimension hash as llm/embed.py).

Scale: the target is small by definition — its bucket table and the
raw corpus' B-row bucket table broadcast. Corpus-side IO is exactly TWO
scans: one builds the ≤B-row bucket table (map-side-combined groupBy),
one scores per token (explode, broadcast join on bucket, groupBy(doc));
the token totals Tt/Tr derive from the bucket tables (tr = sum(cr),
tt = sum(ct)) rather than re-scanning either side. No driver hop
carries more than B rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def token_bucket(tok: Column, n_buckets: int) -> Column:
    """md5-derived hash bucket (cross-engine replayable, cf.
    embed.token_dim_sign)."""
    h = F.conv(F.substring(F.md5(tok.cast("binary")), 1, 8), 16, 10)
    return h.cast("bigint") % n_buckets


def _bucket_counts(
    df: DataFrame, text_col: str, n_buckets: int, out: str
) -> DataFrame:
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    return (
        df.select(F.explode(toks).alias("tok"))
        .select(token_bucket(F.col("tok"), n_buckets).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias(out))
    )


def target_affinity_scores(
    corpus: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
) -> DataFrame:
    """(id, n_tokens, n_lean, affinity): per-document fraction of tokens
    whose smoothed hashed-bucket probability is higher under the target
    corpus than under the raw corpus. Rank by affinity (desc) and keep
    the head to select target-like training data."""
    # ONE scan per side builds the ≤B-row bucket tables; the corpus/target
    # token totals are exactly their sums, so no second full scan of either
    # side exists (at 100 TB the extra total-count scans were a third of
    # the job's IO). The ≤B-row merge + exact integer cross-products run
    # driver-side in arbitrary-precision Python — bit-identical to the
    # DECIMAL(38,0) formulation in any engine.
    ct = {
        r["b"]: r["ct"]
        for r in _bucket_counts(target, text_col, n_buckets, "ct").collect()
    }
    cr = {
        r["b"]: r["cr"]
        for r in _bucket_counts(corpus, text_col, n_buckets, "cr").collect()
    }
    tt = sum(ct.values())
    tr = sum(cr.values())
    lean_rows = [
        (
            int(b),
            int(
                (ct.get(b, 0) + 1) * (tr + n_buckets)
                > (cr.get(b, 0) + 1) * (tt + n_buckets)
            ),
        )
        for b in set(ct) | set(cr)
    ]
    table = corpus.sparkSession.createDataFrame(
        lean_rows, "b bigint, lean bigint"
    )
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")
    per_tok = corpus.select(
        F.col(id_col).alias("id"), F.explode(toks).alias("tok")
    ).select("id", token_bucket(F.col("tok"), n_buckets).alias("b"))
    return (
        per_tok.join(F.broadcast(table), "b", "left")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.coalesce("lean", F.lit(0))).alias("n_lean"),
        )
        .withColumn(
            "affinity",
            F.round(F.col("n_lean") / F.col("n_tokens").cast("double"), 6),
        )
    )
