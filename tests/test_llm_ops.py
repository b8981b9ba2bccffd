"""Property tests for the approximate LLM-data operators (no DuckDB oracle:
their hash base is Spark's xxhash64). Validates the statistical contracts:
MinHash/LSH recall against exact Jaccard, SimHash hamming separation,
LSH-ANN recall against brute force, multimodal pipeline determinism."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from trino_private_spark.catalog import load_table


@pytest.fixture(scope="module")
def documents(spark):
    return load_table(spark, SF_SMOKE, "documents")


@pytest.fixture(scope="module")
def embeddings(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_minhash_lsh_recall(spark, documents):
    """LSH candidates must cover (almost) all high-Jaccard pairs. With
    32 hashes / 8 bands (r=4), a pair at J=0.7 is caught by a band with
    p = 1-(1-0.7^4)^8 ≈ 0.90 — require >= 0.8 recall at J >= 0.7."""
    from trino_private_spark.llm.dedup import (
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    docs = documents.limit(150).select(
        "doc_id", F.lower(F.col("text")).alias("text")
    )
    exact = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.7).collect()
    }
    cand = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(docs, num_hashes=32, bands=8).collect()
    }
    if exact:
        recall = len(exact & cand) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall} over {len(exact)} true pairs"
    # determinism: same seed -> same candidates
    cand2 = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_candidates(docs, num_hashes=32, bands=8).collect()
    }
    assert cand == cand2


def test_simhash_separates_duplicates(spark, documents):
    """A doc concatenated with itself (identical token set) must have
    hamming distance 0 to the original; unrelated docs should be far."""
    from trino_private_spark.llm.dedup import hamming64, simhash64

    docs = documents.limit(50)
    near = docs.select(
        "doc_id", F.concat(F.col("text"), F.lit(" "), F.col("text")).alias("text")
    )
    h1 = simhash64(docs).withColumnRenamed("simhash", "h1")
    h2 = simhash64(near).withColumnRenamed("simhash", "h2")
    joined = h1.join(h2, "doc_id").select(
        hamming64(F.col("h1"), F.col("h2")).alias("d")
    )
    assert joined.agg(F.max("d")).collect()[0][0] == 0

    # cross-doc distances: average should be near 32 (random), well above 8
    pairs = (
        h1.alias("a")
        .crossJoin(h1.alias("b"))
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(hamming64(F.col("a.h1"), F.col("b.h1")).alias("d"))
    )
    avg_d = pairs.agg(F.avg("d")).collect()[0][0]
    assert avg_d > 8, f"cross-doc simhash distance too small: {avg_d}"


def test_lsh_ann_recall_vs_brute_force(spark, embeddings):
    from trino_private_spark.llm.similarity import brute_force_topk, lsh_ann_topk

    queries = embeddings.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(embeddings, queries, k=5).collect()
    approx = lsh_ann_topk(embeddings, queries, k=5, n_planes=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    # 4 planes -> 16 buckets over 500 vecs; self-match always found
    assert recall >= 0.3, f"ANN recall {recall}"
    # every query must at least find itself with score 1.0
    self_hits = {r.query_id for r in approx if r.neighbor_id == r.query_id}
    assert len(self_hits) == 10


def test_ivf_topk_self_match(spark, embeddings):
    from trino_private_spark.llm.similarity import ivf_topk

    queries = embeddings.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = ivf_topk(embeddings, queries, k=5, n_centroids=8, n_probe=2).collect()
    self_hits = {r.query_id for r in res if r.neighbor_id == r.query_id}
    assert len(self_hits) == 8, "IVF must find the query vector itself"


def test_multimodal_pipeline_deterministic(spark):
    from trino_private_spark.llm.multimodal import (
        extract_features,
        frame_sample_plan,
        synthetic_media,
    )

    media = synthetic_media(spark, n=24)
    f1 = extract_features(media).orderBy("media_id").collect()
    f2 = extract_features(media).orderBy("media_id").collect()
    assert [r.feature for r in f1] == [r.feature for r in f2]
    assert all(len(r.feature) == 8 for r in f1)
    assert all(abs(sum(r.feature) - 1.0) < 0.01 for r in f1)

    frames = frame_sample_plan(media, every_ms=1000)
    per_video = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 6 for r in per_video)  # 0..5000 step 1000


def test_exact_dedup_finds_planted_duplicate(spark, documents):
    from trino_private_spark.llm.dedup import exact_duplicates

    docs = documents.limit(20).select("doc_id", "text")
    clone = docs.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.upper(F.col("text")).alias("text"),  # case-normalized away
    )
    groups = exact_duplicates(docs.unionByName(clone)).collect()
    assert len(groups) == 20
    assert all(g.n == 2 for g in groups)
    assert all(g.keep_id < 10_000 for g in groups)


def test_quality_score_monotone(spark):
    from trino_private_spark.llm.text import quality_score

    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it is a fine day for all of us"),
            (2, "x"),
        ],
        "id int, text string",
    )
    rows = {
        r.id: r.q
        for r in df.select("id", quality_score(F.col("text")).alias("q")).collect()
    }
    assert rows[1] > rows[2], rows


def test_connected_components_clusters(spark):
    from trino_private_spark.llm.dedup import connected_components, dedup_keep_list

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a bigint, doc_b bigint",
    )
    comps = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in [1, 2, 3, 5, 10, 11, 20, 21, 22, 23]],
        "doc_id bigint, text string",
    )
    kept = sorted(r.doc_id for r in dedup_keep_list(docs, pairs).collect())
    # one survivor per component + untouched doc 5
    assert kept == [1, 5, 10, 20]


# --- end-to-end curation pipeline (llm/pipeline.py) -------------------------


def test_curate_corpus_end_to_end(spark):
    from pyspark.sql import functions as F

    from trino_private_spark.catalog import load_table
    from trino_private_spark.llm.pipeline import curate_corpus

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    # inject an exact duplicate and a near duplicate of doc 0 at fresh ids
    d0 = docs.where(F.col("doc_id") == 0).select("text").collect()[0].text
    extra = spark.createDataFrame(
        [(100001, d0), (100002, d0 + " appended tail words")],
        "doc_id long, text string",
    )
    res = curate_corpus(
        docs.unionByName(extra),
        languages=("en",),
        min_tokens=1,
        min_quality=0.0,
        near_dup_jaccard=0.6,
        report=True,
    )
    ids = {r.doc_id for r in res.curated.select("doc_id").collect()}
    sc = res.stage_counts
    assert sc["input"] == 502 and sc["gated"] <= sc["input"]
    # the exact dup loses to the original (min id wins) at the exact stage
    assert sc["exact_deduped"] == sc["gated"] - 1
    assert 100001 not in ids
    # the near dup is caught by LSH+jaccard and dropped at the near stage
    assert sc["near_deduped"] <= sc["exact_deduped"] - 1
    assert 100002 not in ids
    # pipeline is deterministic for a fixed seed
    res2 = curate_corpus(
        docs.unionByName(extra),
        languages=("en",),
        min_tokens=1,
        min_quality=0.0,
        near_dup_jaccard=0.6,
    )
    ids2 = {r.doc_id for r in res2.curated.select("doc_id").collect()}
    assert ids == ids2


def test_sq8_quantize_roundtrip_and_recall(spark, embeddings):
    """SQ8 codes bounded, reconstruction error bounded by half a step per
    dimension, and quantize-then-rerank recall@5 near-perfect (exact
    rescore of an oversampled candidate set)."""
    from trino_private_spark.llm.quantize import (
        fit_sq8,
        sq8_decode,
        sq8_encode,
        sq8_topk,
    )
    from trino_private_spark.llm.similarity import brute_force_topk

    mins, maxs = fit_sq8(embeddings, "embedding", 64)
    codes = sq8_encode(F.col("embedding"), mins, maxs)
    bounds = embeddings.select(
        F.array_min(codes).alias("lo"), F.array_max(codes).alias("hi")
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).collect()[0]
    assert bounds.lo >= 0 and bounds.hi <= 255

    # max abs reconstruction error <= step/2 (+ float noise) per dimension
    recon = sq8_decode(codes, mins, maxs)
    step = max(
        (mx - mn) / 255.0 for mn, mx in zip(mins, maxs) if mx > mn
    )
    err = embeddings.select(
        F.array_max(
            F.zip_with(
                F.col("embedding"), recon, lambda x, r: F.abs(x.cast("double") - r)
            )
        ).alias("e")
    ).agg(F.max("e")).collect()[0][0]
    assert err <= step / 2 + 1e-9, (err, step)

    queries = embeddings.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = brute_force_topk(embeddings, queries, k=5).collect()
    approx = sq8_topk(embeddings, queries, k=5, oversample=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.9, f"SQ8 rerank recall {recall}"
    self_hits = {r.query_id for r in approx if r.neighbor_id == r.query_id}
    assert len(self_hits) == 10


def test_lsh_ann_multi_table_improves_recall(spark, embeddings):
    from trino_private_spark.llm.similarity import brute_force_topk, lsh_ann_topk

    queries = embeddings.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(embeddings, queries, k=5).collect()}

    def recall(n_tables):
        got = {
            (r.query_id, r.neighbor_id)
            for r in lsh_ann_topk(
                embeddings, queries, k=5, n_planes=6, n_tables=n_tables
            ).collect()
        }
        return len(exact & got) / len(exact)

    r1, r8 = recall(1), recall(8)
    assert r8 >= r1, f"multi-table did not help: {r1} -> {r8}"
    assert r8 >= 0.3, f"8-table recall {r8}"


def test_contamination_flags_self_and_clean(spark):
    from trino_private_spark.llm.dedup import contamination_flags

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "completely different words about astronomy and physics research"),
            (3, "the quick brown fox jumps over the lazy dog again and again"),
        ],
        ["doc_id", "text"],
    )
    evals = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog today")],
        ["eval_id", "text"],
    )
    hits = {(r.doc_id, r.eval_id): r.n_shared for r in contamination_flags(corpus, evals, min_shared=3).collect()}
    assert (1, 100) in hits      # exact copy flags
    assert (3, 100) in hits      # near-copy shares the long prefix
    assert (2, 100) not in hits  # unrelated doc stays clean


def test_semantic_dedup_keep_min_per_component(spark):
    """semantic_dedup: identical vectors dedup to the lowest id; distinct
    directions survive (SemDeDup keep-one-per-group contract)."""
    from trino_private_spark.llm.dedup import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]),       # centroid / cell 1
        (2, [0.0, 1.0, 0.0]),       # centroid / cell 2
        (3, [0.0, 0.0, 1.0]),       # centroid / cell 3
        (4, [1.0, 0.0, 0.0]),       # exact dup of 1
        (5, [0.999, 0.001, 0.0]),   # near-dup of 1, same cell
        (6, [0.0, 0.7, 0.7]),       # between cells 2/3, below threshold
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.id: (r.component, r.keep)
           for r in semantic_dedup(df, threshold=0.9, n_centroids=3).collect()}
    assert out[1] == (1, True)
    assert out[4] == (1, False)
    assert out[5] == (1, False)
    assert out[2][1] and out[3][1] and out[6][1]
    assert len(out) == 6


def test_gopher_repetition_hand_computed(spark):
    """top/dup n-gram char fractions match hand-computed values."""
    from trino_private_spark.llm.heuristics import (
        duplicate_ngram_char_fraction,
        top_ngram_char_fraction,
        word_ngrams,
    )

    rows = [(1, "the cat sat on the cat mat"), (2, "a b c d e f g h")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string") \
        .withColumn("toks", F.split(F.lower("text"), r"\s+"))
    toks = F.col("toks")
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            F.size(word_ngrams(toks, 2)).alias("n2"),
            top_ngram_char_fraction(toks, 2).alias("top2"),
            duplicate_ngram_char_fraction(toks, 2).alias("dup2"),
        ).collect()
    }
    # doc 1: 6 bigrams; "the cat" x2 (7 chars) -> top = dup = 14/40
    assert out[1].n2 == 6
    assert abs(out[1].top2 - 14 / 40) < 1e-12
    assert abs(out[1].dup2 - 14 / 40) < 1e-12
    # doc 2: 7 distinct 3-char bigrams -> top 3/21, no dups
    assert out[2].n2 == 7
    assert abs(out[2].top2 - 3 / 21) < 1e-12
    assert out[2].dup2 == 0.0


def test_gopher_quality_filter_rules(spark):
    """Each Gopher rule fires on its own violation; clean doc keeps."""
    from trino_private_spark.llm.heuristics import gopher_quality_filter

    good = (
        "the quality of training data and that which we have built with "
        "care matters more than sheer volume because models learn rich "
        "patterns from every token they consume"
    )
    rows = [
        (1, good),                            # passes everything
        (2, "tiny doc"),                      # word count too small
        (3, "#### " * 60 + good),             # symbol ratio too high
        (4, ("zz " * 60).strip()),            # no stopwords, dup bigrams
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in gopher_quality_filter(df, min_words=20).collect()}
    assert out[1].keep
    assert not out[2].keep and not out[2].ok_word_count
    assert not out[3].keep and not out[3].ok_symbol_ratio
    assert not out[4].keep and not out[4].ok_stopwords
    assert not out[4].ok_dup_5gram  # "zz zz zz zz zz" repeats throughout


def test_kmeans_separated_clusters(spark):
    """Three well-separated groups resolve to three distinct clusters."""
    from trino_private_spark.llm.cluster import kmeans

    rows = []
    for g, base in enumerate([0.0, 10.0, -10.0]):
        for i in range(5):
            # interleave ids so the lowest-id init picks one seed per group
            rows.append((i * 3 + g, [base + 0.01 * i, base - 0.01 * i]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = kmeans(df, k=3, iters=3).collect()
    by_group = {}
    for r in out:
        by_group.setdefault(r.id % 3, set()).add(r.cluster)
    assert all(len(s) == 1 for s in by_group.values())      # groups cohere
    assert len({s.pop() for s in by_group.values()}) == 3   # and separate


def test_kmeans_partitioning_invariant(spark):
    """Fixed-point arithmetic makes assignments identical under any
    partitioning — the 1000-executor reproducibility property."""
    from trino_private_spark.llm.cluster import kmeans

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    a = {(r.id, r.cluster, r.sqdist)
         for r in kmeans(emb.coalesce(1), k=4, iters=2).collect()}
    b = {(r.id, r.cluster, r.sqdist)
         for r in kmeans(emb.repartition(13), k=4, iters=2).collect()}
    assert a == b and len(a) > 0


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """A centroid that attracts no members survives the update step."""
    from trino_private_spark.llm.cluster import kmeans_fit

    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [10.0, 10.0])]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    cents = kmeans_fit(df, k=3, iters=2)
    assert len(cents) == 3
    assert cents[1] == [0, 0]  # id-1 duplicate centroid kept verbatim


def test_tfidf_top_terms_hand_computed(spark):
    from trino_private_spark.llm.text import tfidf_top_terms

    rows = [(1, "apple banana apple cherry"), (2, "banana durian banana banana")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = tfidf_top_terms(df, k=3)
    got = {(r.id, r.term): (r.tf, r.df, r.score, r.rank) for r in out.collect()}
    # N=2: idf(df=1) = 3/2, idf(df=2) = 1
    assert got[(1, "apple")] == (2, 1, 3.0, 1)
    assert got[(1, "cherry")] == (1, 1, 1.5, 2)
    assert got[(1, "banana")] == (1, 2, 1.0, 3)
    assert got[(2, "banana")] == (3, 2, 3.0, 1)
    assert got[(2, "durian")] == (1, 1, 1.5, 2)
    # plan: top-k rank is executed as a group-limit, df side broadcasts
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert "BroadcastHashJoin" in plan


def test_charlm_hand_computed(spark):
    """Bigram model q-values and doc scores match hand arithmetic."""
    from trino_private_spark.llm.charlm import charlm_train, score_docs

    df = spark.createDataFrame([(1, "abab"), (2, "abba")], "doc_id bigint, text string")
    model = {r.gram: r.q for r in charlm_train(df).collect()}
    # bigrams: ab x3, ba x2, bb x1; ctx a: 3, ctx b: 3; V = 2 (a, b)
    assert model["ab"] == int((3 + 1) / (3 + 2) * 1_000_000_000)
    assert model["ba"] == int((2 + 1) / (3 + 2) * 1_000_000_000)
    assert model["bb"] == int((1 + 1) / (3 + 2) * 1_000_000_000)
    out = {r.id: r for r in score_docs(df, charlm_train(df)).collect()}
    assert out[1].n_bigrams == 3 and out[1].sum_q == 2 * model["ab"] + model["ba"]
    assert out[1].score == out[1].sum_q / 3


def test_charlm_gibberish_scores_lower(spark):
    """Corpus-typical text outscores a character-soup outlier."""
    from trino_private_spark.llm.charlm import charlm_self_score

    normal = [
        (i, "the quick brown fox jumps over the lazy dog again and again")
        for i in range(20)
    ]
    rows = normal + [(99, "zq xj qz jx vk kv wz zw qq jj zx xq kw")]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.id: r.score for r in charlm_self_score(df).collect()}
    assert out[99] < min(out[i] for i in range(20))


def test_charlm_partitioning_invariant(spark):
    from trino_private_spark.llm.charlm import charlm_self_score

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {(r.id, r.sum_q) for r in charlm_self_score(docs.coalesce(1)).collect()}
    b = {(r.id, r.sum_q) for r in charlm_self_score(docs.repartition(11)).collect()}
    assert a == b and len(a) > 0


def test_hashed_vectors_compose_with_kmeans(spark):
    """Feature-hashed vectors feed kmeans: exact duplicates get identical
    vectors and land in the same cluster; vectors are deterministic."""
    from trino_private_spark.llm.cluster import kmeans
    from trino_private_spark.llm.embed import hashed_vectors

    rows = [
        (0, "spark shuffles data between stages"),
        (1, "tokens flow through the byte pair encoder"),
        (2, "spark shuffles data between stages"),          # dup of 0
        (3, "tokens flow through the byte pair encoder"),   # dup of 1
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    vecs = hashed_vectors(df, d=16)
    got = {r.id: list(r.vec) for r in vecs.collect()}
    assert got[0] == got[2] and got[1] == got[3] and got[0] != got[1]
    cl = {
        r.id: r.cluster
        for r in kmeans(vecs, id_col="id", vec_col="vec", k=2, iters=2).collect()
    }
    assert cl[0] == cl[2] and cl[1] == cl[3] and cl[0] != cl[1]


def test_gopher_scan_and_shuffle_paths_agree(spark, documents):
    """The zero-shuffle fold and the explode+aggregate plan produce
    identical metric values (exact integer ratios both ways)."""
    from trino_private_spark.llm.heuristics import with_gopher_metrics

    docs = documents.limit(60).select("doc_id", "text")
    cols = [
        "doc_id", "word_count", "top_2gram_frac", "top_3gram_frac",
        "top_4gram_frac", "dup_5gram_frac", "dup_10gram_frac",
    ]
    a = {r.doc_id: r for r in with_gopher_metrics(docs).select(cols).collect()}
    b = {
        r.doc_id: r
        for r in with_gopher_metrics(
            docs, id_col="doc_id", method="shuffle"
        ).select(cols).collect()
    }
    assert a.keys() == b.keys()
    for k in a:
        assert a[k] == b[k], (k, a[k], b[k])


def test_temperature_mixture_quota_semantics(spark):
    """alpha=0.5 flattens source proportions; survivors = min(quota, n)."""
    import math

    from trino_private_spark.llm.packing import temperature_mixture

    rows = [(i, "big") for i in range(900)] + [(900 + i, "small") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = temperature_mixture(df, total=100, alpha=0.5)
    got = {r.source: r.n for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    tot_w = math.sqrt(900.0) + math.sqrt(100.0)
    assert got["big"] == math.floor(100 * math.sqrt(900.0) / tot_w)    # 75
    assert got["small"] == math.floor(100 * math.sqrt(100.0) / tot_w)  # 25
    # natural proportions would be 90/10: alpha=0.5 flattened to 75/25
    # determinism
    out2 = temperature_mixture(df, total=100, alpha=0.5)
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_curate_corpus_gopher_and_lm_stages(spark):
    """The optional Gopher and char-LM gates drop the docs they target."""
    from trino_private_spark.llm.pipeline import curate_corpus

    good = (
        "the quality of training data and that which we have built with "
        "care matters more than sheer volume because models learn rich "
        "patterns from every token they consume today"
    )
    rows = [(i, good + f" variant {i} unique suffix") for i in range(12)]
    rows.append((100, ("spam ham " * 20).strip()))        # dup 2-grams -> gopher
    rows.append((101, "zq xj qz jx vk kv wz zw qq jj zx xq kw of the and"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    res = curate_corpus(
        df,
        languages=("en",),
        min_tokens=1,
        min_quality=0.0,
        gopher=True,
        gopher_kwargs={"min_words": 5, "min_stopword_hits": 1},
        min_lm_score=None,
        near_dup_jaccard=0.99,  # gates under test, not the dedup stages
        report=True,
    )
    kept = {r.doc_id for r in res.curated.collect()}
    assert 100 not in kept                  # repetitive doc gopher-dropped
    assert set(range(12)) <= kept
    assert "gopher_gated" in res.stage_counts

    res2 = curate_corpus(
        df, languages=("en",), min_tokens=1, min_quality=0.0,
        min_lm_score=400_000_000, near_dup_jaccard=0.99, report=True,
    )
    kept2 = {r.doc_id for r in res2.curated.collect()}
    assert "lm_gated" in res2.stage_counts
    assert 101 not in kept2                 # gibberish scores below floor


def test_chunk_documents_coverage_and_overlap(spark):
    """Chunks tile the doc with the requested overlap and cover the tail;
    short docs produce exactly one chunk; reconstruction is lossless."""
    from trino_private_spark.llm.packing import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame(
        [(1, text), (2, "a b")], "doc_id bigint, text string"
    )
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: (r.id, r.chunk_idx),
    )
    d1 = [r for r in rows if r.id == 1]
    assert [r.chunk_text for r in d1] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9",
    ]
    # stitched back together (dropping the 1-token overlaps) = original
    stitched = d1[0].chunk_text.split() + [
        t for r in d1[1:] for t in r.chunk_text.split()[1:]
    ]
    assert stitched == text.split()
    assert [r.chunk_text for r in rows if r.id == 2] == ["a b"]

    import pytest

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4).collect()


def test_kmeans_k_exceeds_rows(spark):
    """k larger than the row count clamps to one centroid per row."""
    from trino_private_spark.llm.cluster import kmeans

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [5.0, 5.0])], "vec_id bigint, embedding array<double>"
    )
    out = {r.id: r for r in kmeans(df, k=8, iters=2).collect()}
    assert len(out) == 2
    assert out[0].sqdist == 0 and out[1].sqdist == 0
    assert out[0].cluster != out[1].cluster


def test_temperature_mixture_null_source(spark):
    """A NULL source is its own stratum (null-safe quota join)."""
    from trino_private_spark.llm.packing import temperature_mixture

    rows = [(i, "a") for i in range(40)] + [(100 + i, None) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = temperature_mixture(df, total=20, alpha=0.5)
    got = {r.source: r.n for r in out.groupBy("source")
           .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got.get("a") == 10 and got.get(None) == 10


class TestSpanDedup:
    def test_first_occurrence_survives(self, spark):
        from trino_private_spark.llm.dedup import span_dedup

        df = spark.createDataFrame(
            [
                (1, "a b c d e f g h"),   # spans (k=4): "a b c d", "e f g h"
                (2, "a b c d x y z w"),   # first span duplicates doc 1's
                (3, ""),                  # empty doc must survive as empty
            ],
            "doc_id long, text string",
        )
        out = {r.id: r for r in span_dedup(df, span_tokens=4).collect()}
        assert out[1].text == "a b c d e f g h"
        assert out[1].n_spans == 2 and out[1].n_spans_kept == 2
        assert out[2].text == "x y z w"   # duplicate span dropped
        assert out[2].n_spans == 2 and out[2].n_spans_kept == 1
        assert out[3].text == "" and out[3].n_spans == 0

    def test_tail_span_and_within_doc_duplicates(self, spark):
        from trino_private_spark.llm.dedup import span_dedup

        df = spark.createDataFrame(
            [(1, "p q p q p")], "doc_id long, text string"
        )
        # k=2 spans: "p q", "p q", "p" — the second "p q" is a later
        # occurrence even within the same document
        out = span_dedup(df, span_tokens=2).collect()[0]
        assert out.text == "p q p"
        assert out.n_spans == 3 and out.n_spans_kept == 2


class TestQualityRepresentatives:
    def test_exact_dedup_keep_best(self, spark):
        from trino_private_spark.llm.dedup import exact_dedup_keep

        df = spark.createDataFrame(
            [
                (1, "same  text", 5),
                (2, "same text", 9),   # same fingerprint, higher quality
                (3, "same TEXT", 9),   # tie on quality -> min id (2) wins
                (4, "other", 1),
            ],
            "doc_id long, text string, q long",
        )
        kept = {r.doc_id for r in exact_dedup_keep(df, quality_col="q").collect()}
        assert kept == {2, 4}
        # default: min id
        kept_min = {r.doc_id for r in exact_dedup_keep(df).collect()}
        assert kept_min == {1, 4}

    def test_dedup_keep_list_quality(self, spark):
        from trino_private_spark.llm.dedup import dedup_keep_list

        df = spark.createDataFrame(
            [(1, 10), (2, 99), (3, 50), (4, 7)],
            "doc_id long, q long",
        )
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "doc_a long, doc_b long"
        )
        # component {1,2,3}: quality rep = 2; doc 4 unpaired -> kept
        kept = {
            r.doc_id
            for r in dedup_keep_list(df, pairs, quality_col="q").collect()
        }
        assert kept == {2, 4}
        # default keeps the min id of the component
        kept_min = {r.doc_id for r in dedup_keep_list(df, pairs).collect()}
        assert kept_min == {1, 4}
