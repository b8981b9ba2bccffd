"""Asymmetric containment near-duplicate detection + corpus boilerplate
fraction — the superset/subset cases resemblance (Jaccard) dedup misses.

Containment c(A -> B) = |S(A) ∩ S(B)| / |S(A)| over k-gram shingle sets:
a short document wholly embedded in a long one has c ≈ 1 while Jaccard
≈ |A|/|B| ≈ 0, so MinHash-LSH resemblance banding never surfaces the
pair. Containment search is the published LSH-Ensemble problem (Zhu,
Nandi, Miller — "LSH Ensemble: Internet-Scale Domain Search", VLDB 2016);
the scale path here keeps its two load-bearing ideas — a NECESSARY size
bound (|B| >= t·|A|) and banding tuned for the containment-to-Jaccard
conversion J = c·r / (1 + r − c·r), r = |A|/|B| — in a Spark-first shape:

- exact comparator (``containment_pairs``): one shuffle of (shingle, doc)
  pairs through the inverted-index join, df-capped against hot-shingle
  skew — the verification-grade path, also usable directly at moderate
  corpus sizes;
- candidate generator (``containment_candidates_lsh``): single-row bands
  (rows_per_band = 1) over the standard MinHash signature, because a
  contained-in-much-larger pair has SMALL Jaccard — per-hash collision
  probability is exactly J, so 64 single-row bands give recall
  1 − (1 − J)^64 (≥ 99.9% for c ≥ 0.8 up to an 8× size ratio), where
  2-row resemblance bands would give (J²-powered) ≈ 0. Size filter
  |B| ≥ t·|A| prunes impossible pairs before any join output grows.
- ``boilerplate_fraction``: per-document fraction of distinct shingles
  that appear in at least one OTHER document — the corpus-level
  boilerplate signal (headers, footers, licence blocks) curation
  pipelines threshold on; one shuffle on shingles.

Everything shuffles shingle hashes / signatures, never documents, and no
driver hop carries data rows — the same 100-TB discipline as llm/dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trino_private_spark.llm.dedup import (
    _hash31,
    minhash_signature,
    with_shingles,
)

__all__ = [
    "containment_pairs",
    "containment_candidates_lsh",
    "boilerplate_fraction",
]


def _shingle_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_shingle_df: int | None,
) -> DataFrame:
    """(doc, sz, sh): one row per distinct shingle per doc, with the
    doc's distinct-shingle count; optionally drops shingles whose
    document frequency exceeds ``max_shingle_df`` (hot boilerplate is
    skew AND noise for containment — a licence block shared by 10^6 docs
    should not make everything 'contained' in everything)."""
    sh = with_shingles(df.select(id_col, text_col), text_col, n).select(
        F.col(id_col).alias("doc"),
        F.size("shingles").alias("sz"),
        F.explode("shingles").alias("sh"),
    )
    if max_shingle_df is not None:
        freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_count"))
        sh = sh.join(
            freq.where(F.col("df_count") <= max_shingle_df).select("sh"),
            "sh",
        )
    return sh


#: default document-frequency cap for the exact containment path. The
#: inverted-index self-join emits df² rows PER SHINGLE — a licence block
#: shared by 10^6 documents would alone produce 10^12 join rows, so an
#: uncapped run on a real corpus is quadratic on its hottest boilerplate.
#: A shingle in >10k documents is corpus boilerplate, not signal (the
#: same reasoning as LSH Ensemble's frequency-based pruning); pass
#: ``max_shingle_df=None`` explicitly to disable.
DEFAULT_MAX_SHINGLE_DF = 10_000


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = DEFAULT_MAX_SHINGLE_DF,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Exact containment pairs: (doc_a, doc_b, containment) for every
    ordered pair a != b sharing >= 1 shingle with
    containment = |S(a) ∩ S(b)| / |S(a)| >= threshold. Asymmetric by
    construction — (a contained in b) and (b contained in a) are separate
    rows.

    Without ``candidates``: inverted-index SELF-join on the shingle (the
    only shuffle), df-capped by default (see DEFAULT_MAX_SHINGLE_DF) so a
    corpus-wide boilerplate shingle cannot make the join quadratic.

    With ``candidates`` (a (doc_a, doc_b) frame, e.g. the LSH output):
    the exact comparison is SCOPED to those pairs — the a-side shingle
    index joins the candidate set first, then probes the b-side on
    (shingle, doc_b), so the work is O(candidate pairs x shingles(a))
    instead of O(df²) per shingle. This is the LSH-Ensemble
    candidate/verify split, the same shape llm/dedup uses for Jaccard
    verification."""
    sh = _shingle_index(df, id_col, text_col, n, max_shingle_df)
    a = sh.select(
        F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"), "sh"
    )
    if candidates is not None:
        cand = candidates.select("doc_a", "doc_b").distinct()
        b = sh.select(F.col("doc").alias("doc_b"), "sh")
        joined = (
            a.join(cand, "doc_a")
            .join(b, ["doc_b", "sh"])
            .where(F.col("doc_a") != F.col("doc_b"))
        )
    else:
        b = sh.select(F.col("doc").alias("doc_b"), "sh")
        joined = a.join(b, "sh").where(F.col("doc_a") != F.col("doc_b"))
    return (
        joined.groupBy("doc_a", "doc_b", "sz_a")
        .agg(F.count(F.lit(1)).alias("common"))
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / F.col("sz_a").cast("double"), 6
            ).alias("containment"),
        )
        .where(F.col("containment") >= threshold)
    )


def containment_candidates_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Candidate (doc_a, doc_b) pairs for containment(a -> b) >= threshold
    via SINGLE-ROW MinHash banding + the LSH-Ensemble size bound.

    Why single-row bands: the pair we must not miss is a small document
    inside a much larger one — its Jaccard is J = c·r/(1 + r − c·r) with
    r = |A|/|B|, tiny for large ratios. A per-hash collision fires with
    probability exactly J, so ``num_hashes`` independent single-row bands
    recall 1 − (1−J)^num_hashes; resemblance-style multi-row bands (J^rows
    per band) would square away exactly the pairs this operator exists
    for. Size bound: c >= t needs |B| >= t·|A| (the intersection can't
    exceed |B|), applied as a cheap filter on the joined pair.

    Each side ships (minhash value, band index) rows — signatures and
    counts only, never text. Candidates feed ``containment_pairs`` (or
    any exact comparator) for verification, the LSH-Ensemble
    candidate/verify split."""
    base = with_shingles(df.select(id_col, text_col), text_col, n).select(
        F.col(id_col).alias("doc"),
        F.size("shingles").alias("sz"),
        F.transform("shingles", lambda s: _hash31(s)).alias("hs"),
    )
    sig = minhash_signature(num_hashes=num_hashes, seed=seed)
    signed = base.select(
        "doc", "sz", sig(F.col("hs"), prehashed=True).alias("sig")
    ).localCheckpoint(eager=True)
    bands = signed.select(
        "doc",
        "sz",
        F.posexplode("sig").alias("band", "mh"),
    )
    a = bands.select(
        F.col("doc").alias("doc_a"),
        F.col("sz").alias("sz_a"),
        "band",
        "mh",
    )
    b = bands.select(
        F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"), "band", "mh"
    )
    return (
        a.join(b, ["band", "mh"])
        .where(
            (F.col("doc_a") != F.col("doc_b"))
            & (
                F.col("sz_b").cast("double")
                >= F.lit(threshold) * F.col("sz_a")
            )
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def boilerplate_fraction(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """(doc_id, n_shingles, n_shared, boilerplate): per document, the
    fraction of its DISTINCT n-gram shingles that occur in at least one
    other document. High values flag template/boilerplate documents
    (and, aggregated, template-heavy sources) — the corpus-level signal
    CCNet-style pipelines threshold before training. One shuffle: the
    shingle df table (shingle -> doc count) joins back to the exploded
    shingles."""
    sh = _shingle_index(df, id_col, text_col, n, None)
    freq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_count"))
    return (
        sh.join(freq, "sh")
        .groupBy(F.col("doc").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("df_count") > 1).cast("long")).alias("n_shared"),
        )
        .select(
            id_col,
            "n_shingles",
            "n_shared",
            F.round(
                F.col("n_shared") / F.col("n_shingles").cast("double"), 6
            ).alias("boilerplate"),
        )
    )
