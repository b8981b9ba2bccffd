"""LLM-data-pipeline probes over documents/embeddings (SURVEY.md §7 step 8).

Deterministic, SQL-expressible ops carry a value-level DuckDB oracle.
Hash-seeded approximate ops (MinHash/SimHash/LSH-ANN — their xxhash64 base
has no DuckDB twin) compute their recall/error/invariant PROPERTIES
relationally inside the probe and emit booleans hash-checked against a
TRUE oracle — a property regression flips the driver's t2 gate. Deeper
distribution tests live in tests/test_llm_ops.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe, spread


@probe(
    "p_text_stats",
    oracle=r"""
    SELECT doc_id,
           len(string_split(text, ' ')) AS n_tok,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS n_bpe,
           length(text) AS n_char,
           ROUND(len(list_filter(string_split(lower(text), ' '),
                 x -> x IN ('the','a','of','and','to','in','is','it','for','on')))
                 / GREATEST(len(string_split(text, ' ')), 1), 6) AS stop_ratio,
           ROUND((length(text) - length(replace(text, ' ', '')) )
                 / GREATEST(length(text), 1), 6) AS space_ratio
    FROM documents ORDER BY doc_id LIMIT 300
    """,
    tags=("llm",),
)
def p_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex), stopword ratio, char
    stats — the quality-scoring building blocks (llm/text.py). All JVM-side
    expressions; one scan, zero shuffles at any scale."""
    from trino_private_spark.llm import text as tx

    t = T(spark, sf_dir)
    c = F.col("text")
    toks = F.split(c, " ")
    stop_hits = F.size(
        F.filter(
            F.split(F.lower(c), " "),
            lambda x: x.isin(*tx.STOPWORDS["en"]),
        )
    )
    return (
        t.documents.select(
            "doc_id",
            F.size(toks).cast("bigint").alias("n_tok"),
            F.size(
                F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), F.lit(0))
            ).cast("bigint").alias("n_bpe"),
            F.length(c).cast("bigint").alias("n_char"),
            F.round(stop_hits / F.greatest(F.size(toks), F.lit(1)), 6).alias(
                "stop_ratio"
            ),
            F.round(
                (F.length(c) - F.length(F.replace(c, F.lit(" "), F.lit(""))))
                / F.greatest(F.length(c), F.lit(1)),
                6,
            ).alias("space_ratio"),
        )
        .orderBy("doc_id")
        .limit(300)
    )


@probe(
    "p_dedup_exact",
    oracle="""
    WITH fp AS (
      SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
      FROM documents)
    SELECT COUNT(*) AS n_groups,
           CAST(COALESCE(SUM(n - 1), 0) AS BIGINT) AS n_dups
    FROM (SELECT h, COUNT(*) AS n FROM fp GROUP BY h HAVING COUNT(*) > 1)
    """,
    tags=("llm",),
)
def p_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup summary: duplicate groups + removable rows, via the
    normalized-content fingerprint (llm/dedup.exact_duplicates).
    One shuffle on a 16-byte key — the at-scale exact-dedup plan."""
    from trino_private_spark.llm.dedup import exact_duplicates

    t = T(spark, sf_dir)
    groups = exact_duplicates(t.documents)
    return groups.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("bigint").alias("n_dups"),
    )


@probe(
    "p_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents WHERE doc_id < 250),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS r(i)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           ROUND(common / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) AS jaccard
    FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
    WHERE ROUND(common / CAST(sa.sz + sb.sz - common AS DOUBLE), 6) >= 0.1
    ORDER BY doc_a, doc_b
    """,
    tags=("llm",),
)
def p_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs via the shingle inverted index
    (llm/dedup.ngram_jaccard_pairs). Shuffles (shingle, doc) pairs — the
    verification-grade comparator fed by LSH candidates at scale."""
    from trino_private_spark.llm.dedup import ngram_jaccard_pairs

    t = T(spark, sf_dir)
    docs = t.documents.where(F.col("doc_id") < 250).select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    return ngram_jaccard_pairs(docs, threshold=0.1).orderBy("doc_a", "doc_b")


@probe(
    "p_minhash_lsh",
    oracle="SELECT TRUE AS has_truth, TRUE AS recall_ok",
    tags=("llm",),
)
def p_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (llm/dedup.minhash_lsh_candidates).
    The signature depends on Spark's xxhash64 (no DuckDB equivalent), so
    the oracle checks the RECALL PROPERTY instead: every exact-Jaccard
    >= 0.8 pair (computed relationally by ngram_jaccard_pairs) must be
    recovered by the banded candidates — deterministic for the fixed
    seed, so a regression in the banding or signature math flips the
    hash."""
    from trino_private_spark.llm.dedup import minhash_lsh_candidates, ngram_jaccard_pairs

    t = T(spark, sf_dir)
    # cutoff scales with the table (0.4 * n == 200 at sf0.01) so the
    # truth set stays non-vacuous at every SF — injected dup partners are
    # spread uniformly over the id range
    cut = int(t.documents.count() * 0.4)
    docs = t.documents.where(F.col("doc_id") < cut)
    cand = minhash_lsh_candidates(docs, num_hashes=32, bands=8)
    # both actions below consume the exact-Jaccard comparator — persist so
    # the k-gram self-join runs once (plain persist: free on first pass)
    truth = (
        ngram_jaccard_pairs(docs, threshold=0.8)
        .select("doc_a", "doc_b")
        .persist()
    )
    n_truth = truth.count()
    n_found = truth.join(cand, ["doc_a", "doc_b"]).count()
    truth.unpersist()
    return spark.createDataFrame(
        [(n_truth > 0, n_truth > 0 and n_found >= 0.9 * n_truth)],
        "has_truth boolean, recall_ok boolean",
    )


@probe(
    "p_simhash",
    oracle="SELECT TRUE AS near_tight, TRUE AS separated",
    tags=("llm",),
)
def p_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures (llm/dedup.simhash64); xxhash64-based, so the
    oracle checks the SEPARATION PROPERTY. For shingle-Jaccard J the
    expected hamming distance is ~64*(1-J)/(1+J), i.e. <= 16 at the
    J >= 0.6 cutoff, vs ~32 for unrelated pairs — so the invariants are
    the AVERAGE over near pairs staying under 20 (expectation + margin;
    a broken bit-vote lands near 32) and the near-pair average sitting
    well below the all-pairs average. (A fixed MAX cutoff is wrong at
    scale: boundary-J pairs legitimately reach ~16+ with short docs.)"""
    from trino_private_spark.llm.dedup import hamming64, ngram_jaccard_pairs, simhash64

    t = T(spark, sf_dir)
    cut = int(t.documents.count() * 0.6)  # == 300 at sf0.01; scales with SF
    docs = t.documents.where(F.col("doc_id") < cut)
    sims = simhash64(docs)
    pa = sims.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    pb = sims.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    near = ngram_jaccard_pairs(docs, threshold=0.6).select("doc_a", "doc_b")
    near_ham = (
        near.join(pa, "doc_a")
        .join(pb, "doc_b")
        .agg(
            F.avg(hamming64(F.col("ha"), F.col("hb"))).alias("av"),
            F.count("*").alias("n"),
        )
    ).collect()[0]
    all_avg = (
        pa.crossJoin(pb)
        .where(F.col("doc_a") < F.col("doc_b"))
        .agg(F.avg(hamming64(F.col("ha"), F.col("hb"))).alias("av"))
    ).collect()[0].av
    return spark.createDataFrame(
        [
            (
                near_ham.n > 0 and near_ham.av <= 20.0,
                near_ham.n > 0 and near_ham.av < 0.7 * all_avg,
            )
        ],
        "near_tight boolean, separated boolean",
    )


@probe(
    "p_embedding_topk",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id < 5),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             ROUND(list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])), 6) AS score
      FROM q CROSS JOIN embeddings e),
    ranked AS (
      SELECT query_id, neighbor_id, score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score DESC, neighbor_id) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, score, rank FROM ranked
    WHERE rank <= 10 ORDER BY query_id, rank
    """,
    tags=("llm",),
)
def p_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 (llm/similarity.brute_force_topk): broadcast
    query set, corpus scanned in place, per-query heap via WindowGroupLimit.
    Scores rounded to 6 decimals before ranking on both engines so FP noise
    cannot flip the rank order."""
    from trino_private_spark.llm.similarity import brute_force_topk

    t = T(spark, sf_dir)
    emb = t.embeddings
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return brute_force_topk(emb, queries, k=10).orderBy("query_id", "rank")


@probe(
    "p_lsh_ann",
    oracle="SELECT TRUE AS scores_exact, TRUE AS recall_ok",
    tags=("llm",),
)
def p_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table LSH approximate NN (llm/similarity.lsh_ann_topk,
    16 tables x 5 planes) — the scale path for similarity search.  The
    oracle checks two properties: every returned score equals the exact
    cosine for that (query, neighbor) pair (the bucketing may drop
    neighbors but must never corrupt a score), and recall@10 vs brute
    force stays above the multi-table floor (>= 0.5 — measured 0.7-0.8
    across fixture scales; deterministic for the fixed seeds)."""
    from trino_private_spark.llm.similarity import (
        brute_force_topk,
        cosine,
        lsh_ann_topk,
    )

    t = T(spark, sf_dir)
    emb = t.embeddings
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # both results feed two actions each (recall count + exact re-score /
    # hit join) — persist so the 16-table bucketing and the brute-force
    # scan run once, not twice
    ann = lsh_ann_topk(emb, queries, k=10, n_planes=5, n_tables=16).persist()
    bf = brute_force_topk(emb, queries, k=10).select("query_id", "neighbor_id").persist()
    n_bf = bf.count()
    n_hit = bf.join(ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]).count()
    # re-score every ANN pair exactly and compare
    rescored = (
        ann.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv")),
            "neighbor_id",
        )
        .join(
            queries.select("query_id", F.col("embedding").alias("qv")),
            "query_id",
        )
        .select(
            (F.abs(F.col("score") - F.round(cosine(F.col("qv"), F.col("nv")), 6)) <= 1e-6).alias("ok")
        )
        .agg(F.min("ok").alias("all_ok"))
    ).collect()[0].all_ok
    # both persisted inputs are fully consumed above — release the cached
    # blocks so repeated probe runs in a long session don't accumulate
    ann.unpersist()
    bf.unpersist()
    return spark.createDataFrame(
        [(bool(rescored), n_hit >= 0.5 * n_bf)],
        "scores_exact boolean, recall_ok boolean",
    )


@probe(
    "p_langid",
    oracle="""
    WITH s AS (
      SELECT doc_id,
             len(list_filter(string_split(lower(text), ' '),
                 x -> x IN ('der','die','das','und','zu','den','von','mit','ist','im'))) AS de_s,
             len(list_filter(string_split(lower(text), ' '),
                 x -> x IN ('the','a','of','and','to','in','is','it','for','on'))) AS en_s,
             len(list_filter(string_split(lower(text), ' '),
                 x -> x IN ('el','la','de','y','que','en','un','una','los','por'))) AS es_s,
             len(list_filter(string_split(lower(text), ' '),
                 x -> x IN ('le','la','de','et','les','des','un','une','du','est'))) AS fr_s
      FROM documents)
    SELECT doc_id,
           CASE WHEN de_s >= en_s AND de_s >= es_s AND de_s >= fr_s THEN 'de'
                WHEN en_s >= es_s AND en_s >= fr_s THEN 'en'
                WHEN es_s >= fr_s THEN 'es'
                ELSE 'fr' END AS lang_guess
    FROM s ORDER BY doc_id LIMIT 300
    """,
    tags=("llm",),
)
def p_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-vote language ID (llm/text.language_id) with alphabetical
    tie-break — mirrored exactly by the CASE cascade in the oracle."""
    from trino_private_spark.llm.text import language_id

    t = T(spark, sf_dir)
    return (
        t.documents.select("doc_id", language_id(F.col("text")).alias("lang_guess"))
        .orderBy("doc_id")
        .limit(300)
    )


@probe(
    "p_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
           md5(array_to_string(list_sort(list_distinct(string_split(lower(text), ' '))), ' ')) AS bag_fp
    FROM documents ORDER BY doc_id LIMIT 300
    """,
    tags=("llm",),
)
def p_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: normalized-content md5 + bag-of-words md5
    (llm/text.fingerprint / shingle_fingerprint)."""
    from trino_private_spark.llm.text import fingerprint, shingle_fingerprint

    t = T(spark, sf_dir)
    return (
        t.documents.select(
            "doc_id",
            fingerprint(F.col("text")).alias("fp"),
            shingle_fingerprint(F.col("text")).alias("bag_fp"),
        )
        .orderBy("doc_id")
        .limit(300)
    )


@probe(
    "p_quality_filter",
    oracle="""
    SELECT COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE len(string_split(text, ' ')) >= 40) AS n_long,
           COUNT(*) FILTER (WHERE n_chars >= 300) AS n_big_meta
    FROM documents
    """,
    tags=("llm",),
)
def p_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality thresholding counts (the filter step of a data pipeline);
    the composite score itself is covered by unit tests (monotonicity)."""
    t = T(spark, sf_dir)
    return t.documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.size(F.split(F.col("text"), " ")) >= 40).alias("n_long"),
        F.count_if(F.col("n_chars") >= 300).alias("n_big_meta"),
    )


@probe(
    "p_multimodal_features",
    oracle="""
    SELECT CAST(i AS BIGINT) AS media_id,
           CASE CAST(i % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS kind,
           CAST(128 + (i % 5) * 32 AS BIGINT) AS n_bytes,
           TRUE AS f0_ok
    FROM range(48) t(i) ORDER BY media_id
    """,
    tags=("llm",),
)
def p_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: synthetic binary media -> Arrow-batched feature
    extraction via mapInPandas (llm/multimodal.extract_features; decode
    kernel stubbed, pipeline real).  The oracle replays the deterministic
    media-table shape (kind cycle, payload length 128 + (id%5)*32) and
    asserts the extracted feature vector is present and finite — so the
    mapInPandas schema/batching path is hash-gated end to end."""
    from trino_private_spark.llm.multimodal import extract_features, synthetic_media

    media = synthetic_media(spark, n=48)
    feats = extract_features(media)
    f0 = F.element_at("feature", 1)
    return feats.select(
        "media_id",
        "kind",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        (f0.isNotNull() & ~F.isnan(f0)).alias("f0_ok"),
    ).orderBy("media_id")


@probe(
    "p_curate_corpus",
    oracle="SELECT TRUE AS nonempty, TRUE AS no_exact_dups, TRUE AS subset_ok",
    tags=("llm",),
)
def p_curate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full curation recipe (llm/pipeline.curate_corpus): gates ->
    exact dedup -> LSH-discovered, jaccard-verified near dedup.  The
    LSH/connected-components stages are not SQL-expressible, so the oracle
    gates the pipeline INVARIANTS instead: output nonempty, zero exact
    duplicates survive (exact_duplicates over the curated set is empty),
    and the curated ids are a subset of the input ids.  Stage semantics
    are additionally unit-tested with injected duplicates in
    test_llm_ops."""
    from trino_private_spark.llm.pipeline import curate_corpus
    from trino_private_spark.llm.text import fingerprint, language_id

    t = T(spark, sf_dir)
    docs = t.documents.select("doc_id", "text")
    # gate on the corpus' DOMINANT detected language instead of a literal
    # 'en': the n-gram heuristic is what's under test, and a synthetic
    # corpus (the sf1 soak generator) may classify wholesale as another
    # language — a fixed literal then empties the pipeline vacuously
    lang = (
        docs.select(language_id(F.col("text")).alias("l"))
        .groupBy("l").count().orderBy(F.desc("count"), "l")
        .first()["l"]
    )
    res = curate_corpus(
        docs,
        languages=(lang,),
        min_tokens=1,
        min_quality=0.0,
        near_dup_jaccard=0.6,
        num_hashes=16,
        bands=4,
    )
    # ALL THREE invariants in ONE action (was: persist + 3 jobs): per
    # curated row compute its content fingerprint and an input-membership
    # flag, group by fingerprint, then roll the groups up — total rows
    # (nonempty), groups with n > 1 (exact_duplicates' group count), and
    # rows whose doc_id never matched the input (the anti-join count).
    stats = (
        res.curated.select("doc_id", fingerprint(F.col("text")).alias("__fp"))
        .join(
            docs.select("doc_id").distinct().withColumn("__in", F.lit(1)),
            "doc_id",
            "left",
        )
        .groupBy("__fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias("orph"),
        )
        .agg(
            F.coalesce(F.sum("n"), F.lit(0)).alias("n_rows"),
            F.count_if(F.col("n") > 1).alias("n_dup_groups"),
            F.coalesce(F.sum("orph"), F.lit(0)).alias("n_orphans"),
        )
        .collect()[0]
    )
    # invariants computed — release the pipeline's cached blocks
    # (ADVICE r5: repeated invocations were accumulating)
    res.unpersist()
    return spark.createDataFrame(
        [
            (
                stats.n_rows > 0,
                stats.n_dup_groups == 0,
                stats.n_orphans == 0,
            )
        ],
        "nonempty boolean, no_exact_dups boolean, subset_ok boolean",
    )


@probe(
    "p_sq8_quantize",
    oracle="""
    WITH elems AS (
      SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(1, 65)) AS r(i)),
    dims AS (SELECT i, MIN(x) AS mn, MAX(x) AS mx FROM elems GROUP BY i),
    codes AS (
      SELECT vec_id,
             CASE WHEN mx = mn THEN 0
                  ELSE CAST(round(LEAST(GREATEST((x - mn) / (mx - mn), 0), 1) * 255)
                       AS BIGINT) END AS code
      FROM elems e JOIN dims d ON e.i = d.i)
    SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum,
           MIN(code) AS code_min, MAX(code) AS code_max
    FROM codes WHERE vec_id <= 100
    GROUP BY vec_id ORDER BY vec_id
    """,
    tags=("llm",),
)
def p_sq8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 scalar quantization of the embedding column (llm/quantize.py):
    per-dimension bounds fit over the FULL corpus in one aggregate, codes
    computed JVM-side; the probe checksums each vector's codes. The oracle
    replays the identical fit+encode arithmetic relationally. The 4x
    storage shrink is the similarity-search scale path (SCALE.md)."""
    from trino_private_spark.llm.quantize import fit_sq8, sq8_encode

    t = T(spark, sf_dir)
    emb = t.embeddings
    mins, maxs = fit_sq8(emb, "embedding", 64)
    codes = sq8_encode(F.col("embedding"), mins, maxs)
    return (
        emb.where(F.col("vec_id") <= 100)
        .select(
            "vec_id",
            F.aggregate(
                codes, F.lit(0).cast("long"), lambda acc, c: acc + c.cast("long")
            ).alias("code_sum"),
            F.array_min(codes).cast("long").alias("code_min"),
            F.array_max(codes).cast("long").alias("code_max"),
        )
        .orderBy("vec_id")
    )


@probe(
    "p_stratified_sample",
    oracle="""
    SELECT lang, CAST(LEAST(CAST(COUNT(*) AS BIGINT), 40) AS BIGINT) AS n_sampled
    FROM documents GROUP BY lang ORDER BY lang
    """,
    tags=("llm",),
)
def p_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-stratum quota sampling (llm/packing.
    stratified_sample): rank by xxhash64 within each language, keep 40.
    Survivor counts are closed-form (min(quota, stratum size)), so the
    probe carries a full arithmetic oracle even though the selection hash
    has no DuckDB equivalent."""
    from trino_private_spark.llm.packing import stratified_sample

    t = T(spark, sf_dir)
    out = stratified_sample(t.documents, "lang", quota=40)
    return (
        out.groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_sampled"))
        .orderBy("lang")
    )


@probe(
    "p_pack_sequences",
    oracle="SELECT TRUE AS all_assigned, TRUE AS no_overflow, TRUE AS fill_consistent",
    tags=("llm",),
)
def p_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (llm/packing.pack_sequences): greedy
    FFD per partition, zero shuffles.  The oracle gates the packing
    invariants relationally: every doc assigned exactly once, no bin over
    the budget (docs themselves never exceed it here), and the reported
    bin_fill equals the actual per-bin token sum."""
    from trino_private_spark.llm.packing import pack_sequences
    from trino_private_spark.llm.text import token_count

    t = T(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", token_count(F.col("text")).cast("long").alias("n_tokens")
    ).where(F.col("n_tokens") <= 2048)
    n_docs = docs.count()
    packed = pack_sequences(docs, budget=2048)
    stats = packed.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("doc_id").alias("n_ids"),
    ).collect()[0]
    per_bin = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("actual"),
        F.max("bin_fill").alias("reported"),
        F.min("bin_fill").alias("reported_min"),
    )
    checks = per_bin.agg(
        F.max("actual").alias("max_fill"),
        F.min(
            (F.col("actual") == F.col("reported"))
            & (F.col("reported") == F.col("reported_min"))
        ).alias("consistent"),
    ).collect()[0]
    return spark.createDataFrame(
        [
            (
                stats.n_rows == n_docs and stats.n_ids == n_docs,
                bool(checks.max_fill <= 2048),
                bool(checks.consistent),
            )
        ],
        "all_assigned boolean, no_overflow boolean, fill_consistent boolean",
    )


@probe(
    "p_token_budget_mix",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    cum AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum_tokens
      FROM toks)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tok_total
    FROM cum WHERE cum_tokens <= 2000
    GROUP BY lang ORDER BY lang
    """,
    tags=("llm",),
)
def p_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture quota fill (llm/packing.token_budget_take): per
    language, the id-ordered document prefix within a 2000-token budget —
    one shuffle + one running-sum window, fully oracle-checked."""
    from trino_private_spark.llm.packing import token_budget_take
    from trino_private_spark.llm.text import token_count

    t = T(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", "lang", token_count(F.col("text")).cast("long").alias("n_tokens")
    )
    took = token_budget_take(docs, "lang", budget=2000)
    return (
        took.groupBy("lang")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tok_total"),
        )
        .orderBy("lang")
    )


@probe(
    "p_decontaminate",
    oracle="""
    WITH ctoks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
    csh AS (
      SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM ctoks, UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS r(i)),
    etoks AS (
      SELECT doc_id AS eval_id, string_split(lower(text), ' ') AS t
      FROM documents WHERE doc_id < 5),
    esh AS (
      SELECT DISTINCT eval_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM etoks, UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS r(i))
    SELECT c.doc_id, e.eval_id, CAST(COUNT(DISTINCT c.s) AS BIGINT) AS n_shared
    FROM csh c JOIN esh e ON c.s = e.s
    GROUP BY 1, 2 HAVING COUNT(DISTINCT c.s) >= 5
    ORDER BY doc_id, eval_id
    """,
    tags=("llm",),
)
def p_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (llm/dedup.contamination_flags): corpus
    docs sharing >= 5 distinct 3-gram shingles with any doc of a small
    eval set (here: the first five documents).  The eval shingle index
    broadcasts; fully oracle-checked via the relational shingle join."""
    from trino_private_spark.llm.dedup import contamination_flags

    t = T(spark, sf_dir)
    corpus = t.documents.select("doc_id", F.lower(F.col("text")).alias("text"))
    evals = (
        t.documents.where(F.col("doc_id") < 5)
        .select(F.col("doc_id").alias("eval_id"), F.lower(F.col("text")).alias("text"))
    )
    return contamination_flags(corpus, evals, min_shared=5).orderBy(
        "doc_id", "eval_id"
    )


@probe(
    "p_repetition_ratio",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
    g AS (
      SELECT doc_id,
             CASE WHEN len(w) >= 3
                  THEN [w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                        FOR i IN range(1, len(w) - 1)]
                  ELSE [] END AS grams
      FROM t)
    SELECT doc_id,
           ROUND(CASE WHEN len(grams) > 0
                 THEN 1.0 - len(list_distinct(grams)) / CAST(len(grams) AS DOUBLE)
                 ELSE 0.0 END, 6) AS rep_ratio
    FROM g ORDER BY doc_id LIMIT 400
    """,
    tags=("llm",),
)
def p_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repeated-3-gram fraction (llm/text.
    repeated_ngram_ratio) — the boilerplate/degeneration quality gate,
    computed as scan-only HOF math and fully oracle-checked."""
    from trino_private_spark.llm.text import repeated_ngram_ratio

    t = T(spark, sf_dir)
    return (
        t.documents.select(
            "doc_id",
            F.round(repeated_ngram_ratio(F.col("text")), 6).alias("rep_ratio"),
        )
        .orderBy("doc_id")
        .limit(400)
    )


# --------------------------------------------------------------------------
# trino-ml plugin probes (functions/ml.py — LearnClassifierAggregation,
# ClassifyFunction, LearnRegressorAggregation, RegressFunction,
# EvaluateClassifierPredictionsAggregation)
# --------------------------------------------------------------------------


@probe(
    "p_ml_evaluate",
    oracle="""
    WITH scored AS (
      SELECT CASE WHEN CAST(embedding[1] AS DOUBLE) > 0 THEN 1 ELSE 0 END AS actual,
             CASE WHEN CAST(embedding[2] AS DOUBLE) > 0 THEN 1 ELSE 0 END AS predicted
      FROM embeddings),
    agg AS (
      SELECT CAST(SUM(CASE WHEN actual=1 AND predicted=1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
             CAST(SUM(CASE WHEN actual=0 AND predicted=1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
             CAST(SUM(CASE WHEN actual=1 AND predicted=0 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
             CAST(SUM(CASE WHEN actual=0 AND predicted=0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
      FROM scored)
    SELECT tp, fp, fn, tn,
           ROUND((tp + tn) / CAST(tp + fp + fn + tn AS DOUBLE), 6) AS accuracy,
           ROUND(tp / CAST(GREATEST(tp + fp, 1) AS DOUBLE), 6) AS precision,
           ROUND(tp / CAST(GREATEST(tp + fn, 1) AS DOUBLE), 6) AS recall,
           ROUND(2 * tp / CAST(GREATEST(2 * tp + fp + fn, 1) AS DOUBLE), 6) AS f1
    FROM agg
    """,
    tags=("llm",),
)
def p_ml_evaluate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """evaluate_classifier_predictions with FULL hash oracle: actual and
    predicted labels are deterministic sign rules over embedding dims, so
    DuckDB reproduces tp/fp/fn/tn and all four metrics exactly."""
    from trino_private_spark.functions.ml import evaluate_classifier_predictions

    t = T(spark, sf_dir)
    scored = t.embeddings.select(
        (F.element_at("embedding", 1).cast("double") > 0).cast("int").alias("actual"),
        (F.element_at("embedding", 2).cast("double") > 0).cast("int").alias("predicted"),
    )
    return evaluate_classifier_predictions(scored, "actual", "predicted")


@probe(
    "p_ml_classifier",
    oracle="""
    SELECT TRUE AS acc_ok,
           (SELECT COUNT(*) FROM embeddings) AS n_scored
    """,
    tags=("llm",),
)
def p_ml_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """learn_classifier + classify end-to-end: labels follow a linear sign
    rule over three embedding dims (separable by construction), the model
    is trained with the distributed gradient pass and must score >= 90%
    training accuracy; scoring is pure JVM-side."""
    from trino_private_spark.functions.ml import classify, learn_classifier

    t = T(spark, sf_dir)
    labeled = t.embeddings.select(
        "vec_id",
        "embedding",
        (
            (
                F.element_at("embedding", 1).cast("double")
                + F.element_at("embedding", 2).cast("double")
                - F.element_at("embedding", 3).cast("double")
            )
            > 0
        )
        .cast("int")
        .alias("y"),
    )
    # lr/iterations sized for clustered inputs too (the sf1 soak corpus):
    # plain GD at lr=1.0/60 iters converges to only ~0.84 there
    model = learn_classifier(labeled, "y", "embedding", iterations=200, lr=5.0)
    scored = labeled.select(
        "y", classify(F.col("embedding"), model).alias("pred")
    )
    return scored.agg(
        (F.avg((F.col("y") == F.col("pred")).cast("double")) >= 0.9).alias("acc_ok"),
        F.count(F.lit(1)).alias("n_scored"),
    )


@probe(
    "p_ml_regressor",
    oracle="SELECT TRUE AS resid_ok, TRUE AS bias_ok",
    tags=("llm",),
)
def p_ml_regressor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """learn_regressor + regress: the target is an exact linear function of
    two embedding dims, so the one-pass normal-equations solve must recover
    it to float precision (max residual < 1e-3, bias within 1e-3 of 1)."""
    from trino_private_spark.functions.ml import learn_regressor, regress

    t = T(spark, sf_dir)
    labeled = t.embeddings.select(
        "embedding",
        (
            2.0 * F.element_at("embedding", 1).cast("double")
            - 3.0 * F.element_at("embedding", 2).cast("double")
            + 1.0
        ).alias("target"),
    )
    model = learn_regressor(labeled, "target", "embedding")
    scored = labeled.select(
        "target", regress(F.col("embedding"), model).alias("pred")
    )
    return scored.agg(
        (F.max(F.abs(F.col("target") - F.col("pred"))) < 1e-3).alias("resid_ok"),
        F.lit(abs(model.bias - 1.0) < 1e-3).alias("bias_ok"),
    )


@probe(
    "p_substring_dedup",
    oracle="""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
    g AS (SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
                 array_to_string(toks[u.i:u.i+4], ' ') AS gram
          FROM d, UNNEST(range(1, GREATEST(len(toks) - 4, 0) + 1)) AS u(i)),
    m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb,
                 a.pos - b.pos AS diag
          FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id),
    isl AS (SELECT *, pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, diag ORDER BY pa) AS grp
            FROM m)
    SELECT doc_a, doc_b,
           CAST(MIN(pa) AS BIGINT) AS a_start,
           CAST(MIN(pb) AS BIGINT) AS b_start,
           CAST(MAX(pa) - MIN(pa) + 5 AS BIGINT) AS span_tokens
    FROM isl GROUP BY doc_a, doc_b, diag, grp
    HAVING MAX(pa) - MIN(pa) + 5 >= 8
    ORDER BY doc_a, doc_b, a_start, b_start
    """,
    tags=("llm",),
)
def p_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document EXACT SUBSTRING dedup (llm/substring_dedup.py — the
    Lee et al. ACL'22 op as a k-gram hash-join + diagonal island merge):
    maximal verbatim spans of >= 8 tokens shared between documents.  The
    whole pipeline is relational, so DuckDB replays it exactly — FULL hash
    oracle (the fixture's documents contain real injected near-duplicates,
    so the result is non-empty)."""
    from trino_private_spark.llm.substring_dedup import shared_spans

    t = T(spark, sf_dir)
    return shared_spans(t.documents, "text", "doc_id", k=5, min_tokens=8).orderBy(
        "doc_a", "doc_b", "a_start", "b_start"
    )


@probe(
    "p_ivf_ann",
    oracle="SELECT TRUE AS recall_ok, TRUE AS k_ok",
    tags=("llm",),
)
def p_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN (llm/similarity.ivf_topk — deterministic centroid
    sample, broadcast assignment, n_probe-cell search).  The oracle gates
    recall@10 vs brute force (>= 0.5 with 4/16 cells probed,
    deterministic) and that every query returns exactly k neighbors."""
    from trino_private_spark.llm.similarity import brute_force_topk, ivf_topk

    t = T(spark, sf_dir)
    emb = t.embeddings
    queries = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # same double-consumption shape as p_lsh_ann (which already persists):
    # ann feeds the hit join AND the per-query count, bf feeds two counts
    ann = ivf_topk(emb, queries, k=10, n_centroids=16, n_probe=4).persist()
    bf = (
        brute_force_topk(emb, queries, k=10)
        .select("query_id", "neighbor_id")
        .persist()
    )
    n_bf = bf.count()
    n_hit = bf.join(
        ann.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"]
    ).count()
    per_q = ann.groupBy("query_id").agg(F.count(F.lit(1)).alias("c"))
    k_ok = per_q.agg(F.min(F.col("c") == 10).alias("ok")).collect()[0]["ok"]
    ann.unpersist()
    bf.unpersist()
    return spark.createDataFrame(
        [(n_hit >= 0.5 * n_bf, bool(k_ok))],
        "recall_ok boolean, k_ok boolean",
    )


@probe(
    "p_pii_scrub",
    oracle=r"""
    WITH synth AS (
      SELECT doc_id,
             'user' || CAST(doc_id AS VARCHAR) || '@mail.example.com wrote: '
               || text || ' call (415) 555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
               || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
      FROM documents WHERE doc_id <= 100)
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b(?:\d[ -]?){13,16}\b', '[CC]', 'g'),
             '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g'),
             '(?:\+?\d{1,2}[ .-]?)?(?:\(\d{3}\)|\d{3})[ .-]?\d{3}[ .-]?\d{4}\b', '[PHONE]', 'g'),
             '\b(?:\d{1,3}\.){3}\d{1,3}\b', '[IP]', 'g') AS scrubbed
    FROM synth ORDER BY doc_id
    """,
    tags=("llm",),
)
def p_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (llm/text.scrub_pii — the redaction pass before
    tokenization): synthetic emails/phones/IPs injected around real
    document text, masked by the RE2-compatible JVM regex chain; DuckDB
    replays the identical chain — full hash oracle."""
    from trino_private_spark.llm.text import scrub_pii

    t = T(spark, sf_dir)
    synth = t.documents.where(F.col("doc_id") <= 100).select(
        "doc_id",
        F.concat(
            F.lit("user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com wrote: "), F.col("text"),
            F.lit(" call (415) 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" from 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
        ).alias("t"),
    )
    return synth.select("doc_id", scrub_pii(F.col("t")).alias("scrubbed")).orderBy("doc_id")


@probe(
    "p_media_meta",
    oracle="""
    SELECT s_suppkey,
           CAST(s_suppkey % 512 + 16 AS INT) AS width,
           CAST(s_suppkey % 256 + 16 AS INT) AS height,
           'png' AS fmt,
           CAST(8000 * (s_suppkey % 4 + 1) AS INT) AS sample_rate,
           CAST(1000 * (s_suppkey % 3 + 1) AS INT) AS duration_ms
    FROM supplier WHERE s_suppkey <= 150 ORDER BY s_suppkey
    """,
    tags=("llm",),
)
def p_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multimodal metadata decode (llm/multimodal image_meta /
    wav_meta — published PNG IHDR and RIFF/WAVE layouts, stdlib only):
    per-row generated real PNG bytes and WAV streams with key-derived
    dimensions/rates, decoded back — full closed-form oracle."""
    from trino_private_spark.llm.multimodal import (
        image_meta,
        png_of,
        wav_meta,
        wav_of,
    )

    t = T(spark, sf_dir)
    base = t.supplier.where(F.col("s_suppkey") <= 150).select(
        "s_suppkey",
        (F.col("s_suppkey") % 512 + 16).cast("int").alias("w"),
        (F.col("s_suppkey") % 256 + 16).cast("int").alias("h"),
        (8000 * (F.col("s_suppkey") % 4 + 1)).cast("int").alias("rate"),
        (F.col("s_suppkey") % 3 + 1).cast("int").alias("secs"),
    )
    withmeta = base.select(
        "s_suppkey", "rate", "secs",
        image_meta(png_of(F.col("w"), F.col("h"))).alias("im"),
        wav_meta(wav_of(F.col("rate"), F.col("secs"))).alias("wm"),
    )
    return withmeta.select(
        "s_suppkey",
        F.col("im.width").alias("width"),
        F.col("im.height").alias("height"),
        F.col("im.format").alias("fmt"),
        F.col("wm.sample_rate").alias("sample_rate"),
        F.col("wm.duration_ms").alias("duration_ms"),
    ).orderBy("s_suppkey")


@probe(
    "p_det_shuffle",
    oracle="""
    SELECT doc_id,
           (55749544 * (doc_id % 2147483647) + 324116777) % 2147483647 AS shuffle_key,
           CAST(ROW_NUMBER() OVER (
               ORDER BY (55749544 * (doc_id % 2147483647) + 324116777) % 2147483647,
                        doc_id) AS INTEGER) AS pos
    FROM documents
    ORDER BY doc_id
    """,
    tags=("llm",),
)
def p_det_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch reshuffle (llm/packing.deterministic_shuffle):
    the permutation key is exact 31-bit-field affine arithmetic, so the
    FULL key and the resulting global position replay bit-identically in
    the oracle (seed=42, epoch=1 -> a=55749544, b=324116777). At scale the
    order materializes via repartitionByRange + sortWithinPartitions; the
    probe exposes it as an explicit rank column so the order itself is
    hash-checked."""
    from pyspark.sql import Window

    from trino_private_spark.llm.packing import deterministic_shuffle

    t = T(spark, sf_dir)
    shuffled = deterministic_shuffle(
        t.documents.select("doc_id"), id_col="doc_id", seed=42, epoch=1
    )
    w = Window.orderBy("shuffle_key", "doc_id")
    return (
        shuffled.select("doc_id", "shuffle_key")
        .withColumn("pos", F.row_number().over(w))
        .orderBy("doc_id")
    )


@probe(
    "p_semantic_dedup",
    oracle="""
    WITH RECURSIVE e AS (
      SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      ORDER BY vec_id LIMIT 2048),
    cents AS (SELECT id AS cent_id, v AS cent_v FROM e ORDER BY id LIMIT 16),
    scored AS (SELECT e.id, e.v, c.cent_id,
                      ROUND(list_cosine_similarity(e.v, c.cent_v), 6) AS cs
               FROM e CROSS JOIN cents c),
    cells AS (SELECT id, v, cent_id FROM (
                SELECT id, v, cent_id,
                       ROW_NUMBER() OVER (PARTITION BY id
                                          ORDER BY cs DESC, cent_id) AS r
                FROM scored) WHERE r = 1),
    pairs AS (SELECT a.id AS id_a, b.id AS id_b
              FROM cells a JOIN cells b
                ON a.cent_id = b.cent_id AND a.id < b.id
              WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.45),
    edges AS (SELECT id_a AS s, id_b AS t FROM pairs
              UNION SELECT id_b, id_a FROM pairs),
    walk(s, t) AS (SELECT s, t FROM edges
                   UNION
                   SELECT w.s, e2.t FROM walk w JOIN edges e2 ON w.t = e2.s),
    comp AS (SELECT s AS id, LEAST(s, MIN(t)) AS component
             FROM walk GROUP BY s)
    SELECT cells.id, COALESCE(comp.component, cells.id) AS component,
           (cells.id = COALESCE(comp.component, cells.id)) AS keep
    FROM cells LEFT JOIN comp ON cells.id = comp.id
    ORDER BY cells.id
    """,
    tags=("llm",),
)
def p_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (llm/dedup.semantic_dedup): IVF-cell
    bucketed cosine near-dup pairs -> connected components -> keep lowest
    id. Fully hash-oracled: the DuckDB side replays centroid selection
    (lowest ids), nearest-cell assignment (6dp-rounded cosine, ties by
    cent_id), the within-cell threshold, and a recursive transitive
    closure reproducing connected_components' min-label semantics.

    The probe verifies on the 2048 lowest-id vectors (covers the whole
    sf0.001/sf0.01/sf0.1 fixtures unchanged): the ORACLE's transitive
    closure is O(sum of component^2) and goes intractable on the scale
    soak's tightly-clustered 20k-vector corpus, where threshold 0.45
    merges whole clusters into near-cliques. The OPERATOR itself stays
    unbounded — banded cells + distributed label propagation."""
    from trino_private_spark.llm.dedup import semantic_dedup

    t = T(spark, sf_dir)
    capped = t.embeddings.orderBy("vec_id").limit(2048)
    return semantic_dedup(capped, threshold=0.45).orderBy("id")


@probe(
    "p_gopher_repetition",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, n,
             unnest([array_to_string(t[i:i+n-1], ' ')
                     for i in range(1, greatest(len(t)-n+2, 1))]) AS g
      FROM toks, (VALUES (2),(3),(4),(5)) ns(n)),
    gs AS (SELECT doc_id, n, g, count(*) AS c, length(g) AS lg
           FROM grams GROUP BY ALL),
    agg AS (SELECT doc_id, n,
                   CAST(max(c*lg) AS DOUBLE) / sum(c*lg) AS topf,
                   COALESCE(CAST(sum(CASE WHEN c > 1 THEN c*lg END) AS DOUBLE), 0)
                     / sum(c*lg) AS dupf
            FROM gs GROUP BY doc_id, n)
    SELECT doc_id,
           max(CASE WHEN n=2 THEN topf END) AS top_2gram_frac,
           max(CASE WHEN n=3 THEN topf END) AS top_3gram_frac,
           max(CASE WHEN n=4 THEN topf END) AS top_4gram_frac,
           max(CASE WHEN n=2 THEN dupf END) AS dup_2gram_frac,
           max(CASE WHEN n=5 THEN dupf END) AS dup_5gram_frac
    FROM agg GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm",),
)
def p_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition metrics (llm/heuristics.py; Rae et al. 2021 A1.1):
    per-doc fraction of n-gram characters covered by the most frequent
    word n-gram (n=2,3,4) and by duplicated n-grams (n=2,5). Single scan,
    zero shuffles — each metric is one array_sort + one F.aggregate
    run-length pass, all JVM-side. Exact integer ratios, so fully
    hash-oracled against DuckDB's GROUP-BY-over-unnested-grams replay."""
    from trino_private_spark.llm import heuristics as H

    t = T(spark, sf_dir)
    d = spread(t.documents).withColumn(
        "__toks", F.split(F.lower(F.col("text")), r"\s+")
    )
    toks = F.col("__toks")
    return d.select(
        "doc_id",
        H.top_ngram_char_fraction(toks, 2).alias("top_2gram_frac"),
        H.top_ngram_char_fraction(toks, 3).alias("top_3gram_frac"),
        H.top_ngram_char_fraction(toks, 4).alias("top_4gram_frac"),
        H.duplicate_ngram_char_fraction(toks, 2).alias("dup_2gram_frac"),
        H.duplicate_ngram_char_fraction(toks, 5).alias("dup_5gram_frac"),
    ).orderBy("doc_id")


@probe(
    "p_gopher_quality",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, text, string_split(lower(text), ' ') AS t FROM documents),
    m AS (
      SELECT doc_id,
             len(t) AS word_count,
             CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
               / greatest(len(t), 1) AS mwl,
             (length(text) - length(replace(text, '#', ''))
              + len(regexp_extract_all(text, '\.\.\.|…')))
               / CAST(greatest(len(t), 1) AS DOUBLE) AS symr,
             len(list_filter(t, x -> regexp_matches(x, '[A-Za-z]')))
               / CAST(greatest(len(t), 1) AS DOUBLE) AS alphaf,
             len(list_intersect(t, ['the','be','to','of','and','that',
                                    'have','with'])) AS stopword_hits
      FROM toks),
    g2 AS (
      SELECT doc_id,
             unnest([array_to_string(t[i:i+1], ' ')
                     for i in range(1, greatest(len(t), 1))]) AS g
      FROM toks),
    r2 AS (
      SELECT doc_id, CAST(max(c*lg) AS DOUBLE) / sum(c*lg) AS top2
      FROM (SELECT doc_id, g, count(*) AS c, length(g) AS lg
            FROM g2 GROUP BY ALL)
      GROUP BY doc_id),
    g5 AS (
      SELECT doc_id,
             unnest([array_to_string(t[i:i+4], ' ')
                     for i in range(1, greatest(len(t)-3, 1))]) AS g
      FROM toks),
    r5 AS (
      SELECT doc_id,
             COALESCE(CAST(sum(CASE WHEN c > 1 THEN c*lg END) AS DOUBLE), 0)
               / sum(c*lg) AS dup5
      FROM (SELECT doc_id, g, count(*) AS c, length(g) AS lg
            FROM g5 GROUP BY ALL)
      GROUP BY doc_id),
    rules AS (
      SELECT m.doc_id, m.word_count, m.stopword_hits,
             m.word_count BETWEEN 20 AND 80 AS ok_word_count,
             m.mwl BETWEEN 3.0 AND 4.6 AS ok_mean_word_len,
             m.symr <= 0.1 AS ok_symbol_ratio,
             m.alphaf >= 0.8 AS ok_alpha_words,
             m.stopword_hits >= 1 AS ok_stopwords,
             r2.top2 <= 0.04 AS ok_top_2gram,
             r5.dup5 <= 0.15 AS ok_dup_5gram
      FROM m JOIN r2 USING (doc_id) JOIN r5 USING (doc_id))
    SELECT doc_id, word_count, stopword_hits,
           ok_word_count, ok_mean_word_len, ok_stopwords, ok_top_2gram,
           (ok_word_count AND ok_mean_word_len AND ok_symbol_ratio
            AND ok_alpha_words AND ok_stopwords AND ok_top_2gram
            AND ok_dup_5gram) AS keep
    FROM rules ORDER BY doc_id
    """,
    tags=("llm",),
)
def p_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher quality filter (llm/heuristics.gopher_quality_filter) with
    fixture-tuned thresholds so every rule is non-vacuous on the synthetic
    word-soup corpus (word_count 10-99, mean word len 3.7-5.3, stopword
    hits 0-1, top-2gram frac up to 0.19): word bounds 20-80, mean-word-len
    3.0-4.6, >=1 required stopword, top-2gram <= 0.04. Published Gopher
    thresholds stay the library defaults (heuristics.py). One scan, zero
    shuffles; per-rule booleans + keep are hash-oracled."""
    from trino_private_spark.llm.heuristics import gopher_quality_filter

    t = T(spark, sf_dir)
    out = gopher_quality_filter(
        spread(t.documents),
        min_words=20,
        max_words=80,
        min_mean_word_len=3.0,
        max_mean_word_len=4.6,
        max_symbol_word_ratio=0.1,
        min_alpha_word_frac=0.8,
        min_stopword_hits=1,
        top_ngram_max={2: 0.04},
        dup_ngram_max={5: 0.15},
    )
    return out.select(
        "doc_id",
        "word_count",
        "stopword_hits",
        "ok_word_count",
        "ok_mean_word_len",
        "ok_stopwords",
        "ok_top_2gram",
        "keep",
    ).orderBy("doc_id")


@probe(
    "p_kmeans",
    oracle="""
    WITH e AS (
      SELECT vec_id AS id,
             [CAST(FLOOR(CAST(x AS DOUBLE)*1000000) AS BIGINT)
              for x in embedding] AS q
      FROM embeddings),
    c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS j, q AS c
           FROM (SELECT id, q FROM e ORDER BY id LIMIT 8)),

    a1 AS (
      SELECT id, q, j AS cluster FROM (
        SELECT e.id, e.q, c0.j,
               ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                 list_sum(list_transform(range(1, len(e.q)+1),
                   i -> (e.q[i]-c0.c[i])*(e.q[i]-c0.c[i]))), c0.j) AS r
        FROM e CROSS JOIN c0) WHERE r = 1),
    u1 AS (
      SELECT cluster, i, SUM(qi) AS s, COUNT(*) AS cnt
      FROM (SELECT cluster, unnest(range(1, len(q)+1)) AS i, unnest(q) AS qi
            FROM a1)
      GROUP BY cluster, i),
    nc1 AS (
      SELECT cluster AS j,
             list(CAST(FLOOR(CAST(s AS DOUBLE)/cnt) AS BIGINT) ORDER BY i) AS c
      FROM u1 GROUP BY cluster),
    c1 AS (
      SELECT c0.j, COALESCE(nc1.c, c0.c) AS c
      FROM c0 LEFT JOIN nc1 USING (j)),

    a2 AS (
      SELECT id, q, j AS cluster FROM (
        SELECT e.id, e.q, c1.j,
               ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                 list_sum(list_transform(range(1, len(e.q)+1),
                   i -> (e.q[i]-c1.c[i])*(e.q[i]-c1.c[i]))), c1.j) AS r
        FROM e CROSS JOIN c1) WHERE r = 1),
    u2 AS (
      SELECT cluster, i, SUM(qi) AS s, COUNT(*) AS cnt
      FROM (SELECT cluster, unnest(range(1, len(q)+1)) AS i, unnest(q) AS qi
            FROM a2)
      GROUP BY cluster, i),
    nc2 AS (
      SELECT cluster AS j,
             list(CAST(FLOOR(CAST(s AS DOUBLE)/cnt) AS BIGINT) ORDER BY i) AS c
      FROM u2 GROUP BY cluster),
    c2 AS (
      SELECT c1.j, COALESCE(nc2.c, c1.c) AS c
      FROM c1 LEFT JOIN nc2 USING (j)),

    fin AS (
      SELECT id, j AS cluster, CAST(dist AS BIGINT) AS sqdist FROM (
        SELECT e.id, c2.j,
               list_sum(list_transform(range(1, len(e.q)+1),
                 i -> (e.q[i]-c2.c[i])*(e.q[i]-c2.c[i]))) AS dist,
               ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY
                 list_sum(list_transform(range(1, len(e.q)+1),
                   i -> (e.q[i]-c2.c[i])*(e.q[i]-c2.c[i]))), c2.j) AS r
        FROM e CROSS JOIN c2) WHERE r = 1)
    SELECT id, cluster, sqdist FROM fin ORDER BY id

    """,
    tags=("llm",),
)
def p_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd k-means (llm/cluster.kmeans, k=8, 2 iterations)
    over the embeddings table. Fixed-point BIGINT arithmetic makes every
    distance and centroid-update sum EXACT — partition-order independent
    (the reproducibility you need at 1000 executors) and therefore fully
    hash-oracled: the DuckDB side replays quantization, lowest-id init,
    both assignment+update iterations (ties -> lowest centroid index,
    floor(sum/count) updates, empty cluster keeps its centroid) and the
    final assignment, value-for-value."""
    from trino_private_spark.llm.cluster import kmeans

    t = T(spark, sf_dir)
    out = kmeans(t.embeddings, k=8, iters=2)
    return out.select(
        "id", F.col("cluster").cast("bigint").alias("cluster"), "sqdist"
    ).orderBy("id")


@probe(
    "p_tfidf",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents),
    terms AS (SELECT doc_id, unnest(t) AS term FROM toks),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms
           GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    n AS (SELECT count(*) AS n FROM documents),
    scored AS (SELECT tf.doc_id AS id, tf.term, tf.tf, dfreq.df,
                      tf.tf * ((n.n + 1.0) / (dfreq.df + 1)) AS score
               FROM tf JOIN dfreq USING (term) CROSS JOIN n),
    ranked AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                 ORDER BY score DESC, term ASC) AS "rank" FROM scored)
    SELECT id, term, tf, df, score,
           CAST("rank" AS INTEGER) AS "rank" FROM ranked
    WHERE "rank" <= 3 ORDER BY id, "rank"
    """,
    tags=("llm",),
)
def p_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document (llm/text.tfidf_top_terms).
    Rational idf (N+1)/(df+1) keeps every score an exact-integer-derived
    double, so ranking and values replay bit-identically in DuckDB
    (full-hash). Spark plan: zero-shuffle run-length term counts ->
    distinct-triple explode -> broadcast df join -> WindowGroupLimit
    top-k."""
    from trino_private_spark.llm.text import tfidf_top_terms

    t = T(spark, sf_dir)
    return tfidf_top_terms(t.documents, k=3).orderBy("id", "rank")


@probe(
    "p_bpe_pairs",
    oracle="""
    WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word
               FROM documents),
    wf AS (SELECT word, count(*) AS freq FROM w WHERE word <> ''
           GROUP BY word),
    cs AS (SELECT freq, [word[i] for i in range(1, len(word)+1)] AS c
           FROM wf),
    p AS (SELECT freq, unnest(c[1:len(c)-1]) AS a, unnest(c[2:len(c)]) AS b
          FROM cs)
    SELECT a, b, CAST(SUM(freq) AS BIGINT) AS cnt FROM p GROUP BY a, b
    ORDER BY cnt DESC, a, b LIMIT 20
    """,
    tags=("llm",),
)
def p_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First BPE training iteration (llm/bpe.pair_counts): freq-weighted
    adjacent character-pair counts over the word-frequency table, top 20
    under the training tie-break order (cnt desc, pair asc). Exact integer
    counts -> full-hash vs the DuckDB replay. This is the aggregation each
    distributed merge round runs; the word table (not the corpus) is its
    input, which is why training scales."""
    from trino_private_spark.llm.bpe import chars_of, pair_counts, word_freqs

    t = T(spark, sf_dir)
    words = word_freqs(t.documents).select(
        chars_of(F.col("word")).alias("syms"), "freq"
    )
    return (
        pair_counts(words)
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(20)
    )


@probe(
    "p_bpe",
    oracle="""
    SELECT TRUE AS ok_deterministic, TRUE AS ok_first_merge_argmax,
           TRUE AS ok_roundtrip, TRUE AS ok_compresses
    """,
    tags=("llm",),
)
def p_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE train+apply invariants (llm/bpe.py), property-oracled booleans:
    the merge list is deterministic across runs; the first merge equals
    the independently-computed argmax pair; encoding is lossless (token
    concatenation reproduces the text modulo whitespace) for EVERY doc;
    and the corpus token count is strictly below the character count."""
    from trino_private_spark.llm.bpe import (
        bpe_apply,
        bpe_train,
        chars_of,
        pair_counts,
        word_freqs,
    )

    t = T(spark, sf_dir)
    docs = t.documents.select("doc_id", "text")
    m1 = bpe_train(docs, n_merges=6)
    m2 = bpe_train(docs, n_merges=6)
    words = word_freqs(docs).select(
        chars_of(F.col("word")).alias("syms"), "freq"
    )
    top = (
        pair_counts(words)
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(1)
        .collect()[0]
    )
    enc = bpe_apply(docs, m1).join(docs, F.col("id") == F.col("doc_id"))
    stripped = F.regexp_replace(F.lower(F.col("text")), r"\s+", "")
    return enc.agg(
        F.lit(m1 == m2).alias("ok_deterministic"),
        F.lit(m1[0] == (top["a"], top["b"])).alias("ok_first_merge_argmax"),
        F.bool_and(F.concat_ws("", F.col("tokens")) == stripped).alias(
            "ok_roundtrip"
        ),
        (F.sum("n_tokens") < F.sum(F.length(stripped))).alias("ok_compresses"),
    )


@probe(
    "p_charlm",
    oracle="""
    WITH cs AS (SELECT doc_id, lower(text) AS t FROM documents),
    g AS (SELECT doc_id, unnest([t[i:i+1] for i in range(1, len(t))]) AS gram
          FROM cs),
    cnts AS (SELECT gram, count(*) AS cnt FROM g GROUP BY gram),
    ctx AS (SELECT substr(gram, 1, 1) AS c1, SUM(cnt) AS ctx_cnt
            FROM cnts GROUP BY 1),
    v AS (SELECT count(DISTINCT substr(gram, 2, 1)) AS v FROM cnts),
    model AS (SELECT gram,
                     CAST(FLOOR(1000000000.0 *
                       ((cnt + 1.0) / (ctx_cnt + v))) AS BIGINT) AS q
              FROM cnts JOIN ctx ON substr(gram, 1, 1) = c1 CROSS JOIN v),
    sc AS (SELECT doc_id AS id, count(*) AS n_bigrams,
                  CAST(SUM(COALESCE(q, 0)) AS BIGINT) AS sum_q
           FROM g LEFT JOIN model USING (gram) GROUP BY doc_id)
    SELECT id, n_bigrams, sum_q,
           CAST(sum_q AS DOUBLE) / n_bigrams AS score
    FROM sc ORDER BY id
    """,
    tags=("llm",),
)
def p_charlm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style LM quality scoring (llm/charlm.charlm_self_score):
    train a char-bigram model on the corpus, score each doc by mean
    likelihood. Log-free integer-quantized likelihoods make per-doc sums
    exact and partition-order independent, so the whole train+score
    pipeline is FULL-hash-oracled against a DuckDB replay."""
    from trino_private_spark.llm.charlm import charlm_self_score

    t = T(spark, sf_dir)
    return charlm_self_score(t.documents).orderBy("id")


@probe(
    "p_hashed_vector",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
      FROM documents),
    hs AS (SELECT doc_id,
                  CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 32 AS dim,
                  CASE WHEN CAST('0x' || substr(md5(tok), 9, 1) AS BIGINT)
                            % 2 = 0
                       THEN 1 ELSE -1 END AS s
           FROM toks WHERE tok <> ''),
    sums AS (SELECT doc_id, dim, SUM(s) AS v FROM hs GROUP BY doc_id, dim),
    dims AS (SELECT doc_id, unnest(range(0, 32)) AS dim
             FROM (SELECT DISTINCT doc_id FROM toks)),
    vecs AS (SELECT d.doc_id,
                    list(CAST(COALESCE(s.v, 0) AS BIGINT)
                         ORDER BY d.dim) AS vec
             FROM dims d LEFT JOIN sums s
               ON d.doc_id = s.doc_id AND d.dim = s.dim
             GROUP BY d.doc_id)
    SELECT doc_id AS id, array_to_string(vec, ',') AS vec_s,
           CAST(list_sum(list_transform(vec, x -> abs(x))) AS BIGINT) AS l1
    FROM vecs ORDER BY id
    """,
    tags=("llm",),
)
def p_hashed_vector(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature-hashed document embeddings (llm/embed.hashed_vectors,
    d=32): signed token-count vectors via the hashing trick — the
    model-free embedding that feeds kmeans/semantic_dedup. Exact integer
    vectors built in ONE zero-shuffle codegen'd scan; md5 is the dimension
    hash precisely so DuckDB replays it — FULL-hash oracle."""
    from trino_private_spark.llm.embed import hashed_vectors

    t = T(spark, sf_dir)
    v = hashed_vectors(t.documents, d=32)
    return v.select(
        "id",
        F.concat_ws(",", F.col("vec")).alias("vec_s"),
        F.aggregate(
            F.col("vec"),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + F.abs(x),
        ).alias("l1"),
    ).orderBy("id")


@probe(
    "p_temperature_mixture",
    oracle="""
    WITH c AS (SELECT source AS s, count(*) AS n FROM documents GROUP BY 1),
    tw AS (SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY s),
                              (a, b) -> a + b) AS tot FROM c),
    e AS (SELECT s, n, 600 * sqrt(CAST(n AS DOUBLE)) / tw.tot AS ex
          FROM c CROSS JOIN tw),
    f AS (SELECT s, n, ex, CAST(FLOOR(ex) AS BIGINT) AS fq FROM e),
    r AS (SELECT 600 - SUM(fq) AS rem FROM f),
    q AS (SELECT s, n,
                 fq + CASE WHEN ROW_NUMBER()
                                OVER (ORDER BY ex - fq DESC, s) <= r.rem
                           THEN 1 ELSE 0 END AS quota
          FROM f CROSS JOIN r)
    SELECT s AS source, n AS n_docs, quota,
           LEAST(quota, n) AS n_sampled
    FROM q ORDER BY source
    """,
    tags=("llm",),
)
def p_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture sampling (llm/packing.temperature_mixture,
    alpha=0.5, total=600): per-source quotas proportional to sqrt(count)
    with largest-remainder fill, so quotas sum to exactly 600. The probe
    emits (source, n_docs, quota, n_sampled) with n_sampled measured from
    the actual sampled output — full-hash against DuckDB recomputing
    quotas with the SAME ordered weight fold (list_reduce over sources
    sorted by name) + the same remainder rule, and the closed-form
    survivor count min(quota, n)."""
    from trino_private_spark.llm.packing import (
        mixture_quotas,
        temperature_mixture,
    )

    t = T(spark, sf_dir)
    docs = t.documents.select("doc_id", "source")
    sampled = temperature_mixture(docs, total=600, alpha=0.5)
    per_source = sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_sampled")
    )
    base = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    counts = {r["source"]: r["n_docs"] for r in base.collect()}
    quotas = mixture_quotas(counts, total=600, alpha=0.5)
    qdf = spark.createDataFrame(
        [(s, q) for s, q in sorted(quotas.items())],
        "source string, quota bigint",
    )
    return (
        base.join(qdf, "source")
        .join(per_source, "source", "left")
        .select(
            "source",
            "n_docs",
            "quota",
            F.coalesce("n_sampled", F.lit(0)).alias("n_sampled"),
        )
        .orderBy("source")
    )


@probe(
    "p_chunk_documents",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents),
    d AS (SELECT id, t,
                 GREATEST(1, CAST(FLOOR((len(t) - 8 + 23) / 24.0) AS BIGINT)
                 ) AS nc
          FROM toks),
    g AS (SELECT id,
                 unnest(range(0, nc)) AS ci,
                 unnest([t[i*24+1 : i*24+32] for i in range(0, nc)]) AS c
          FROM d)
    SELECT id, CAST(ci AS INTEGER) AS chunk_idx,
           CAST(len(c) AS BIGINT) AS n_chunk_tokens,
           array_to_string(c, ' ') AS chunk_text
    FROM g ORDER BY id, chunk_idx
    """,
    tags=("llm",),
)
def p_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (llm/packing.chunk_documents,
    chunk_tokens=32, overlap=8): overlapping token windows with
    tail-covering chunk count max(1, ceil((n-overlap)/stride)). Pure JVM
    slice arithmetic, one scan, zero shuffles — exact integers, so fully
    hash-oracled against the DuckDB list-slicing replay (non-vacuous:
    fixture docs are 10-99 words -> 1-4 chunks each)."""
    from trino_private_spark.llm.packing import chunk_documents

    t = T(spark, sf_dir)
    return chunk_documents(
        t.documents, chunk_tokens=32, overlap=8
    ).orderBy("id", "chunk_idx")


@probe(
    "p_gopher_repetition_agg",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, n,
             unnest([array_to_string(t[i:i+n-1], ' ')
                     for i in range(1, greatest(len(t)-n+2, 1))]) AS g
      FROM toks, (VALUES (2),(3),(4)) ns(n)),
    gs AS (SELECT doc_id, n, g, count(*) AS c, length(g) AS lg
           FROM grams GROUP BY ALL),
    agg AS (SELECT doc_id, n,
                   CAST(max(c*lg) AS DOUBLE) / sum(c*lg) AS topf
            FROM gs GROUP BY doc_id, n)
    SELECT doc_id,
           max(CASE WHEN n=2 THEN topf END) AS top_2gram_frac,
           max(CASE WHEN n=3 THEN topf END) AS top_3gram_frac,
           max(CASE WHEN n=4 THEN topf END) AS top_4gram_frac
    FROM agg GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm",),
)
def p_gopher_repetition_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SHUFFLE physical plan for the Gopher repetition metrics
    (heuristics.with_gopher_metrics(method='shuffle'): explode +
    whole-stage-codegen hash aggregates + join-back — measured 4.4x
    faster than the zero-shuffle fold at 50k docs, SCALE.md). Same exact
    integer arithmetic, same DuckDB oracle family as p_gopher_repetition:
    the gate proves the two physical plans agree value-for-value."""
    from trino_private_spark.llm.heuristics import with_gopher_metrics

    t = T(spark, sf_dir)
    return with_gopher_metrics(
        t.documents.select("doc_id", "text"),
        id_col="doc_id",
        method="shuffle",
    ).select(
        "doc_id", "top_2gram_frac", "top_3gram_frac", "top_4gram_frac"
    ).orderBy("doc_id")


@probe(
    "p_span_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id AS id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents),
    d AS (SELECT id, t,
                 CAST(CEIL(len(t) / 2.0) AS BIGINT) AS nc FROM toks
          WHERE len(t) > 0),
    g AS (SELECT id,
                 unnest(range(0, nc)) AS pos,
                 unnest([array_to_string(t[i*2+1 : i*2+2], ' ')
                         for i in range(0, nc)]) AS span
          FROM d),
    k AS (SELECT id, pos, span,
                 ROW_NUMBER() OVER (PARTITION BY span
                                    ORDER BY id, pos) AS rk FROM g),
    agg AS (SELECT id,
                   COALESCE(string_agg(span, ' ' ORDER BY pos)
                            FILTER (WHERE rk = 1), '') AS text,
                   CAST(COUNT(*) AS BIGINT) AS n_spans,
                   CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_spans_kept
            FROM k GROUP BY id)
    SELECT a.doc_id AS id, COALESCE(g.text, '') AS text,
           COALESCE(g.n_spans, 0) AS n_spans,
           COALESCE(g.n_spans_kept, 0) AS n_spans_kept
    FROM documents a LEFT JOIN agg g ON a.doc_id = g.id
    ORDER BY id
    """,
    tags=("llm",),
)
def p_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span deduplication (llm/dedup.span_dedup; Raffel 2020
    arXiv:1910.10683 §2.2 — discard all but the FIRST occurrence of any
    repeated span corpus-wide, rebuild documents from survivors). The
    probe uses 2-token spans so the small-vocabulary fixture produces
    real cross-document duplicates (8-token spans would pass vacuously);
    full-hash against DuckDB replaying the identical tokenize -> span ->
    global first-occurrence window -> ordered reassembly."""
    from trino_private_spark.llm.dedup import span_dedup

    t = T(spark, sf_dir)
    return span_dedup(
        t.documents.select("doc_id", "text"), span_tokens=2
    ).orderBy("id")


@probe(
    "p_target_affinity",
    oracle="""
    WITH ttk AS (SELECT unnest(list_filter(
                   string_split_regex(lower(text), '\s+'),
                   x -> x <> '' AND x < 'm')) AS tok
                 FROM documents),
    rtk AS (SELECT doc_id AS id,
                   unnest(list_filter(string_split_regex(lower(text), '\s+'),
                          x -> x <> '')) AS tok FROM documents),
    tb AS (SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024 AS b,
                  COUNT(*) AS ct FROM ttk GROUP BY 1),
    rb AS (SELECT CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024 AS b,
                  COUNT(*) AS cr FROM rtk GROUP BY 1),
    tot AS (SELECT (SELECT COUNT(*) FROM ttk) AS tt,
                   (SELECT COUNT(*) FROM rtk) AS tr),
    tbl AS (SELECT COALESCE(tb.b, rb.b) AS b, COALESCE(ct, 0) AS ct,
                   COALESCE(cr, 0) AS cr
            FROM tb FULL JOIN rb ON tb.b = rb.b),
    lean AS (SELECT b, CASE WHEN (ct + 1) * (tot.tr + 1024)
                               > (cr + 1) * (tot.tt + 1024)
                            THEN 1 ELSE 0 END AS lean
             FROM tbl CROSS JOIN tot),
    pt AS (SELECT id,
                  CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 1024 AS b
           FROM rtk)
    SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(COALESCE(lean, 0)) AS BIGINT) AS n_lean,
           ROUND(SUM(COALESCE(lean, 0)) / CAST(COUNT(*) AS DOUBLE), 6)
               AS affinity
    FROM pt LEFT JOIN lean USING (b) GROUP BY id ORDER BY id
    """,
    tags=("llm",),
)
def p_target_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style target-distribution selection (llm/select.py; Xie 2023
    arXiv:2302.03169): the target corpus is the documents restricted to
    tokens < 'm' — a deliberately skewed vocabulary slice, because the
    synthetic sources share one distribution and a same-distribution
    target votes 0 everywhere (vacuous-probe trap). Each document scores
    the fraction of its tokens whose add-one-smoothed hashed-bucket
    probability is higher under the target than under the raw corpus —
    the exact-integer SIGN of DSIR's per-token log ratio, so the whole
    score replays bit-identically in DuckDB (md5 buckets, DECIMAL
    cross-products). Affinity here ~= each doc's share of < 'm' tokens,
    varying per doc — discriminative, non-vacuous."""
    from trino_private_spark.llm.select import target_affinity_scores

    t = T(spark, sf_dir)
    docs = t.documents.select("doc_id", "text")
    target = docs.select(
        F.array_join(
            F.filter(
                F.split(F.lower(F.col("text")), r"\s+"),
                lambda w: (w != "") & (w < "m"),
            ),
            " ",
        ).alias("text")
    )
    return target_affinity_scores(docs, target, n_buckets=1024).orderBy("id")


@probe(
    "p_dedup_best_rep",
    oracle="""
    WITH fp AS (
      SELECT doc_id, n_chars,
             md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h
      FROM documents),
    r AS (SELECT doc_id, n_chars, h,
                 ROW_NUMBER() OVER (PARTITION BY h
                                    ORDER BY n_chars DESC, doc_id) AS rk,
                 COUNT(*) OVER (PARTITION BY h) AS grp_n
          FROM fp)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           CAST(SUM(CASE WHEN grp_n > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS reps_of_dup_groups
    FROM r WHERE rk = 1
    """,
    tags=("llm",),
)
def p_dedup_best_rep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware exact-dedup representatives
    (llm/dedup.exact_dedup_keep with quality_col): per duplicate group the
    LONGEST document survives (ties by min id) instead of whichever
    crawled first — the curation-grade choice. Full-hash: DuckDB replays
    the md5 fingerprint and the same (quality desc, id) window."""
    from trino_private_spark.llm.dedup import exact_dedup_keep

    t = T(spark, sf_dir)
    kept = exact_dedup_keep(
        t.documents.select("doc_id", "text", "n_chars"),
        quality_col="n_chars",
    )
    dup_groups = (
        t.documents.groupBy(
            F.md5(
                F.trim(
                    F.regexp_replace(F.lower(F.col("text")), r"\s+", " ")
                ).cast("binary")
            ).alias("h")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
    )
    return kept.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("n_chars").cast("bigint").alias("kept_chars"),
    ).select(
        "n_kept",
        "kept_chars",
        F.lit(dup_groups.count()).cast("bigint").alias("reps_of_dup_groups"),
    )


@probe(
    "p_containment",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t
      FROM documents
      WHERE doc_id < (SELECT CAST(FLOOR(COUNT(*) / 2.0) AS BIGINT)
                      FROM documents)),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS r(i)),
    -- mirror of DEFAULT_MAX_SHINGLE_DF: the exact path drops shingles
    -- shared by > 10000 docs (sizes stay over the UNCAPPED set)
    shf AS (
      SELECT sh.* FROM sh
      JOIN (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 10000) f
      USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           ROUND(common / CAST(sa.sz AS DOUBLE), 6) AS containment
    FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
    WHERE ROUND(common / CAST(sa.sz AS DOUBLE), 6) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    tags=("llm",),
)
def p_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ASYMMETRIC containment pairs |S(a)∩S(b)|/|S(a)| >= 0.5
    (llm/containment.containment_pairs) — the superset/subset near-dups
    resemblance Jaccard misses (a short doc inside a long one has
    Jaccard ~ |A|/|B| but containment ~ 1). One (shingle, doc) shuffle
    through the inverted-index join; both directions emitted."""
    from trino_private_spark.llm.containment import containment_pairs

    t = T(spark, sf_dir)
    # cutoff derived from the corpus size — a FIXED id slice goes vacuous
    # at other scale factors (dup partners are uniform over the id range)
    cut = t.documents.count() // 2
    docs = t.documents.where(F.col("doc_id") < cut).select("doc_id", "text")
    return containment_pairs(docs, threshold=0.5).orderBy("doc_a", "doc_b")


@probe(
    "p_containment_lsh_recall",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t
      FROM documents
      WHERE doc_id < (SELECT CAST(FLOOR(COUNT(*) / 2.0) AS BIGINT)
                      FROM documents)),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS r(i)),
    shf AS (
      SELECT sh.* FROM sh
      JOIN (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 10000) f
      USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, 1.0 AS recall
    FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
    WHERE ROUND(common / CAST(sa.sz AS DOUBLE), 6) >= 0.5
    """,
    tags=("llm",),
)
def p_containment_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment LSH candidate generation (LSH-Ensemble shape, Zhu 2016:
    single-row MinHash bands — per-hash collision prob is exactly the
    Jaccard, so 64 bands recall 1-(1-J)^64 even for the small-in-large
    pairs whose J is tiny — plus the necessary |B| >= t|A| size bound).
    Property oracle: every exact containment pair at t=0.5 must appear
    among the candidates (recall = 1.0 at the fixed seed), candidates
    shuffle signatures only."""
    from trino_private_spark.llm.containment import (
        containment_candidates_lsh,
        containment_pairs,
    )

    t = T(spark, sf_dir)
    cut = t.documents.count() // 2
    docs = t.documents.where(F.col("doc_id") < cut).select("doc_id", "text")
    # the anti-join AND the count below both consume the exhaustive
    # comparator — persist so its inverted-index self-join runs once
    # (measured cold A/B: 4.6-5.6 s -> 3.4-3.8 s; plain persist, unlike a
    # localCheckpoint, costs nothing extra on the first pass)
    exact = containment_pairs(docs, threshold=0.5).select("doc_a", "doc_b").persist()
    cand = containment_candidates_lsh(docs, threshold=0.5)
    missed = exact.join(cand, ["doc_a", "doc_b"], "left_anti").count()
    n_exact = exact.count()
    exact.unpersist()
    return spark.createDataFrame(
        [(n_exact, round(1.0 - missed / max(1, n_exact), 6))],
        "n_exact long, recall double",
    )


@probe(
    "p_containment_lsh_verified",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t
      FROM documents
      WHERE doc_id < (SELECT CAST(FLOOR(COUNT(*) / 2.0) AS BIGINT)
                      FROM documents)),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS r(i)),
    shf AS (
      SELECT sh.* FROM sh
      JOIN (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 10000) f
      USING (s)),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
      FROM shf a JOIN shf b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b,
           ROUND(common / CAST(sa.sz AS DOUBLE), 6) AS containment
    FROM pairs JOIN sizes sa ON sa.doc_id = doc_a
    WHERE ROUND(common / CAST(sa.sz AS DOUBLE), 6) >= 0.5
    ORDER BY doc_a, doc_b
    """,
    tags=("llm",),
)
def p_containment_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The complete LSH-Ensemble candidate/VERIFY pipeline at scale
    shape: single-row-band MinHash candidates (signatures only through
    the shuffle) -> EXACT containment verification SCOPED to the
    candidate pairs (containment_pairs(candidates=...): the a-side
    shingle index joins the candidate set, then probes (shingle, doc_b)
    — O(pairs x shingles) work, never the full inverted-index
    self-join). Full-hash oracle: the verified output must equal the
    exhaustive exact comparator's result."""
    from trino_private_spark.llm.containment import (
        containment_candidates_lsh,
        containment_pairs,
    )

    t = T(spark, sf_dir)
    cut = t.documents.count() // 2
    docs = t.documents.where(F.col("doc_id") < cut).select("doc_id", "text")
    cand = containment_candidates_lsh(docs, threshold=0.5)
    return containment_pairs(
        docs, threshold=0.5, candidates=cand
    ).orderBy("doc_a", "doc_b")


@probe(
    "p_boilerplate",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS t
      FROM documents WHERE doc_id < 300),
    sh AS (
      SELECT DISTINCT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
      FROM toks, UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS r(i)),
    freq AS (SELECT s, COUNT(*) AS c FROM sh GROUP BY s)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_shared,
           ROUND(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS boilerplate
    FROM sh JOIN freq USING (s)
    GROUP BY doc_id ORDER BY doc_id
    """,
    tags=("llm",),
)
def p_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document boilerplate fraction (llm/containment.
    boilerplate_fraction): share of a doc's distinct 3-gram shingles that
    occur in >= 1 other document — the corpus-level template signal
    CCNet-style curation thresholds on. One shuffle (shingle df table
    joined back); full-hash oracle."""
    from trino_private_spark.llm.containment import boilerplate_fraction

    t = T(spark, sf_dir)
    docs = t.documents.where(F.col("doc_id") < 300).select("doc_id", "text")
    return boilerplate_fraction(docs).orderBy("doc_id")
