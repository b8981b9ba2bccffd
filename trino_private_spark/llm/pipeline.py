"""End-to-end corpus curation — the composition a 100 TB training-data
pipeline actually runs, built entirely from the JVM-side primitives in
llm/text.py and llm/dedup.py:

    profile -> language/length/quality gate -> exact dedup -> near dedup

Every stage is a narrow transformation or a keyed shuffle the individual
modules already bound (see SCALE.md's LLM-operator table); composing them
adds no new shuffle beyond the stages' own. Stage row counts are the only
driver-side values, and only when report=True (one count() action per
stage — at 100 TB run with report=False and read counts from the Spark UI
/ a streaming metrics sink instead)."""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from trino_private_spark.llm import dedup, text


@dataclass
class CurationResult:
    curated: DataFrame
    stage_counts: dict[str, int] = field(default_factory=dict)
    # persisted intermediates the pipeline created; release them once the
    # curated result is materialized (unpersist is a cache hint only —
    # any later action on `curated` still recomputes correctly)
    handles: list[DataFrame] = field(default_factory=list)

    def unpersist(self) -> None:
        for h in self.handles:
            h.unpersist()
        self.handles.clear()


def profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the per-document features the gates read — one scan-local
    projection, all whole-stage-codegen expressions."""
    c = F.col(text_col)
    return df.select(
        "*",
        text.token_count(c).alias("_tokens"),
        text.quality_score(c).alias("_quality"),
        text.language_id(c).alias("_lang"),
        text.fingerprint(c).alias("_fp"),
    )


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    languages: tuple[str, ...] = ("en",),
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_quality: float = 0.3,
    near_dup_jaccard: float = 0.8,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
    report: bool = False,
    gopher: bool = False,
    gopher_kwargs: dict | None = None,
    min_lm_score: float | None = None,
) -> CurationResult:
    """The standard curation recipe:

    1. gate: language allowlist, token-count band, quality threshold
       (pure filters — pushed into the scan, zero shuffles);
    1b. optional Gopher rule gate (``gopher=True`` — heuristics.py
       repetition + quality rules, still scan-only) and optional char-LM
       score floor (``min_lm_score`` — charlm.py self-scoring, one
       broadcast-model join);
    2. exact dedup on the text fingerprint: keep the smallest id per
       fingerprint (one shuffle of (fp, id) pairs);
    3. near dedup: MinHash+LSH candidates verified by n-gram Jaccard,
       connected components, keep the component minimum (the bounded
       bucket-join pipeline from llm/dedup.py — never O(n^2)).

    Deterministic for a fixed seed; returns the curated DataFrame plus
    optional per-stage surviving-row counts."""
    counts: dict[str, int] = {}

    def tick(name: str, d: DataFrame) -> DataFrame:
        if report:
            counts[name] = d.count()
        return d

    tick("input", df)
    p = profile(df, text_col)
    gated = tick(
        "gated",
        p.where(
            F.col("_lang").isin(*languages)
            & F.col("_tokens").between(min_tokens, max_tokens)
            & (F.col("_quality") >= min_quality)
        ),
    )

    if gopher:
        from trino_private_spark.llm.heuristics import gopher_quality_filter

        gq = gopher_quality_filter(
            gated,
            text_col=text_col,
            **{"id_col": id_col, **(gopher_kwargs or {})},
        )
        gated = tick("gopher_gated", gq.where("keep").select(*gated.columns))

    if min_lm_score is not None:
        from trino_private_spark.llm.charlm import charlm_self_score

        keep_ids = (
            charlm_self_score(gated, id_col=id_col, text_col=text_col)
            .where(F.col("score") >= min_lm_score)
            .select(F.col("id").alias(id_col))
        )
        gated = tick("lm_gated", gated.join(keep_ids, id_col, "left_semi"))

    # exact dedup: min id per fingerprint survives
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    exact = (
        gated.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
        # this stage feeds LSH discovery, the verify subset AND the final
        # keep-join — persist so the scan+gate+window runs once, not 3x
        # (MEMORY_AND_DISK: spills rather than recomputes at 100 TB)
        .persist()
    )
    tick("exact_deduped", exact)

    # near dedup on the exact-deduped survivors
    cand = dedup.minhash_lsh_candidates(
        exact, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, bands=bands, seed=seed,
    )
    # verifier runs on candidate docs only (SCALE.md: jaccard is the
    # verify stage, never the discovery stage)
    cand_docs = (
        cand.select(F.col("doc_a").alias(id_col))
        .unionByName(cand.select(F.col("doc_b").alias(id_col)))
        .distinct()
    )
    subset = exact.join(cand_docs, id_col, "left_semi")
    verified = dedup.ngram_jaccard_pairs(
        subset, id_col=id_col, text_col=text_col, threshold=near_dup_jaccard
    ).join(cand, ["doc_a", "doc_b"], "left_semi")
    near = tick("near_deduped", dedup.dedup_keep_list(exact, verified, id_col))

    curated = near.drop("_tokens", "_quality", "_lang", "_fp")
    # hand the persisted intermediate back so a long-lived session can
    # release its cached blocks once `curated` is materialized
    return CurationResult(
        curated=curated, stage_counts=counts, handles=[exact]
    )
