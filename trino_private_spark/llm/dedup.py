"""Deduplication operators for training-data pipelines.

Five strategies, all pure DataFrame transforms:

- exact_duplicates        — hash-groupBy on a normalized fingerprint
- ngram_jaccard_pairs     — exact set-similarity via shingle inverted index
- minhash_lsh_candidates  — MinHash signatures + LSH banding (approximate,
                            subquadratic: only same-bucket pairs are compared)
- simhash                 — 64-bit SimHash signature per doc
- embedding_near_dup      — cosine-threshold pairs over embeddings

Scale notes (100 TB): exact dedup is one shuffle on a 16-byte key. The
shingle inverted index shuffles (shingle, doc_id) pairs — hot shingles are
capped (df filter) to bound skew, the same trick as stopword removal. LSH
shuffles one row per (band, doc): 8-16 rows per doc regardless of doc size,
then joins only within buckets — this is the scale path; the exact Jaccard
join is the verifier run on candidate pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trino_private_spark.llm.text import fingerprint, tokens

# Mersenne prime modulus for the universal-hash family; fits comfortably in
# a 64-bit signed long even after multiply-by-coefficient when the base hash
# is first reduced mod p.
_MERSENNE_P = (1 << 61) - 1


def _word_shingles(text_col, n: int = 3):
    """Distinct n-word shingles as an array column (JVM-side HOFs only).

    Built from n SHIFTED SLICES zipped together rather than per-index
    element_at inside a transform lambda: lambda-bound expressions are not
    CSE'd, so the element_at form re-evaluated the tokenizer once per
    element access — O(len^2) splits per row (measured ~9s for 5000 docs;
    the zip_with form is ~40x faster)."""
    toks = tokens(F.lower(text_col))
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    shingled = F.slice(toks, 1, k)
    for j in range(1, n):
        shingled = F.zip_with(
            shingled, F.slice(toks, j + 1, k), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.array_distinct(shingled)


def with_shingles(df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    return df.withColumn("shingles", _word_shingles(F.col(text_col), n))


def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact dedup: group by normalized-content fingerprint; returns one row
    per duplicate group with the member ids and the kept (min) id.
    One shuffle on a 16-byte hash key — works at any scale."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(id_col).alias("keep_id"),
            F.array_sort(F.collect_list(id_col)).alias("member_ids"),
        )
        .where(F.col("n") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    Plan: explode distinct shingles -> inverted index (shingle -> docs) ->
    self-join per shingle counts common shingles -> join doc sizes ->
    jaccard = common / (|A| + |B| - common). ``max_shingle_df`` drops
    ultra-common shingles (skew + noise control at scale)."""
    sh = (
        with_shingles(df.select(id_col, text_col), text_col, n)
        .select(
            F.col(id_col).alias("doc"),
            F.size("shingles").alias("sz"),
            F.explode("shingles").alias("sh"),
        )
    )
    if max_shingle_df is not None:
        w_count = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_count"))
        sh = sh.join(
            w_count.where(F.col("df_count") <= max_shingle_df).select("sh"), "sh"
        )
    a = sh.select(
        F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"), "sh"
    )
    b = sh.select(
        F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"), "sh"
    )
    common = (
        a.join(b, "sh")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    jac = common.select(
        "doc_a",
        "doc_b",
        F.round(
            F.col("common")
            / (F.col("sz_a") + F.col("sz_b") - F.col("common")).cast("double"),
            6,
        ).alias("jaccard"),
    )
    return jac.where(F.col("jaccard") >= threshold)


def _hash64(col):
    """Base shingle hash, reduced into [0, p): xxhash64 is Spark's JVM-side
    64-bit hash (no Python)."""
    return F.pmod(F.xxhash64(col), F.lit(_MERSENNE_P))


_P31 = (1 << 31) - 1


def _hash31(col):
    """Shingle hash reduced to the 31-bit universal-hash domain: keeps
    a*x+b exactly inside BIGINT (a, x < 2^31 -> product < 2^62), so the
    whole family runs as codegen'd integer math — the DECIMAL(38,0)
    variant this replaced fell out of whole-stage codegen and recomputed
    xxhash64 once per hash function (measured 52s -> ~3s on 5000 docs)."""
    return F.pmod(F.xxhash64(col), F.lit(_P31))


def minhash_signature(num_hashes: int = 64, seed: int = 42):
    """Returns a builder: shingle-array column -> array<bigint> MinHash
    signature of length ``num_hashes``, using the universal-hash family
    h_i(x) = (a_i * x + b_i) mod p over a 31-bit base hash (see _hash31).
    Coefficients derive deterministically from the seed.  Pass
    ``prehashed=True`` when the column already holds _hash31 values —
    candidates materialize the base ONCE instead of per hash function."""
    import random

    rnd = random.Random(seed)
    sigs = [
        (rnd.randrange(1, _P31), rnd.randrange(0, _P31))
        for _ in range(num_hashes)
    ]
    p = F.lit(_P31)

    def one_hash(a: int, b: int):
        # single-param lambda: pyspark counts lambda params for HOF arity
        return lambda x: F.pmod(F.lit(a) * x + F.lit(b), p)

    def sig_expr(col, prehashed: bool = False):
        base = col if prehashed else F.transform(col, lambda x: _hash31(x))
        return F.array(
            *[F.array_min(F.transform(base, one_hash(a, b))) for a, b in sigs]
        )

    return sig_expr


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-dup candidates via MinHash + LSH banding.

    rows_per_band = num_hashes // bands. Docs agreeing on all rows of any
    band land in the same bucket; only same-bucket pairs are emitted. The
    shuffle volume is bands x docs (constant per doc), never O(docs^2) —
    this is the 100 TB path; feed the candidates to ngram_jaccard_pairs or
    an exact comparator for verification."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sig_fn = minhash_signature(num_hashes, seed)
    docs = with_shingles(df.select(id_col, text_col), text_col, n).where(
        F.size("shingles") > 0
    )
    # materialize the base hash array once; the 32-64 signature entries
    # then reuse it (otherwise each entry recomputes xxhash64 per shingle)
    hashed = docs.select(
        F.col(id_col).alias("doc"),
        F.transform(F.col("shingles"), lambda x: _hash31(x)).alias("hbase"),
    )
    sigs = hashed.select("doc", sig_fn(F.col("hbase"), prehashed=True).alias("sig"))
    band_rows = sigs.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.array_join(
                            F.transform(
                                F.slice(F.col("sig"), bi * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                            "_",
                        ).alias("bucket"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = band_rows.select(F.col("doc").alias("doc_a"), "band", "bucket")
    b = band_rows.select(F.col("doc").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per bit, sum +-1 votes of each
    token's xxhash64 bit, sign -> bit. Near-dup docs differ in few bits
    (compare with hamming distance). Pure per-row HOF math: scan-only.

    ONE aggregate pass with a 64-counter array accumulator: the earlier
    64-separate-aggregate form re-evaluated tokenize+hash once PER BIT
    per row (64x the hashing work; the SQL expr form is used because
    pyspark's shiftleft/bit_get wrappers only take literal positions)."""
    votes_sql = (
        # \\s+ with an empty-token filter, like every other tokenizer in
        # this module — a literal single space hashed empty/merged tokens
        # on tab/newline/multi-space text (ADVICE r5)
        f"aggregate("
        f"  transform(array_distinct(filter(split(lower({text_col}), '\\\\s+'),"
        f"            t -> t <> '')), t -> xxhash64(t)),"
        f"  array_repeat(0L, 64),"
        f"  (acc, h) -> zip_with(acc, sequence(0, 63),"
        f"    (a, i) -> a + if(getbit(h, cast(i as int)) = 1, 1L, -1L)))"
    )
    sim_sql = (
        f"aggregate("
        f"  zip_with({votes_sql}, sequence(0, 63),"
        f"    (v, i) -> if(v > 0, shiftleft(1L, cast(i as int)), 0L)),"
        f"  0L, (acc, x) -> acc | x)"
    )
    return df.select(F.col(id_col), F.expr(sim_sql).alias("simhash"))


def hamming64(a, b):
    return F.bit_count(a.bitwiseXOR(b))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Embedding near-duplicates: all pairs with cosine >= threshold.

    Exact quadratic form for verification; at scale, route through
    similarity.lsh_ann to generate candidates first."""
    from trino_private_spark.llm.similarity import cosine

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos")
        )
        .where(F.col("cos") >= threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    n_centroids: int = 16,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster embeddings, call two documents duplicates
    when their cosine exceeds ``threshold`` WITHIN a cluster, keep one
    representative per duplicate group.

    Spark plan, never all-pairs: (1) nearest-centroid assignment is one
    broadcast cross join against ``n_centroids`` sampled centroids
    (deterministic: lowest ids, same discipline as similarity.ivf_topk);
    (2) candidate pairs form only inside a cell (equi-join on cent_id);
    (3) pair components resolve via connected_components (guarded
    union-find / distributed label propagation); (4) keep = lowest id of
    each component. At 100 TB: scale n_centroids ~ sqrt(N) so cells stay
    bounded; the only shuffles are the cell equi-join and the component
    join, both on compact ids. Cosines are rounded to 6 decimals before
    thresholding so FP noise cannot flip a boundary pair.

    Returns (id, component, keep) for every input row.
    """
    from pyspark.sql import Window

    from trino_private_spark.llm.similarity import cosine

    cents = F.broadcast(
        df.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("cent_id"), F.col(vec_col).alias("cent_v"))
    )
    scored = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(cents)
        .select(
            "id",
            "v",
            "cent_id",
            F.round(cosine(F.col("v"), F.col("cent_v")), 6).alias("cs"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("cs").desc(), F.col("cent_id"))
    cells = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("id", "v", "cent_id")
    )
    a = cells.select("cent_id", F.col("id").alias("id_a"), F.col("v").alias("va"))
    b = cells.select("cent_id", F.col("id").alias("id_b"), F.col("v").alias("vb"))
    pairs = (
        a.join(b, "cent_id")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos"),
        )
        .where(F.col("cos") >= threshold)
    )
    comp = connected_components(pairs, "id_a", "id_b")
    return (
        cells.select("id")
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("component"))
        .withColumn("keep", F.col("id") == F.col("component"))
    )


def connected_components(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 30,
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Cluster near-duplicate pairs into groups: iterative min-label
    propagation (each node adopts the smallest id reachable so far) until a
    fixpoint. Returns (id, component) with component = min member id.

    The dedup endgame: pairs from minhash_lsh_candidates/ngram_jaccard_pairs
    become keep/drop groups (keep = id == component). Iterations are
    O(diameter) — near-dup clusters are tiny (2-5 docs), so 2-3 rounds
    converge; each round is one join+groupBy on the id key. No driver-side
    data, safe at any pair count."""
    edges_plan = (
        pairs.select(F.col(a_col).alias("x"), F.col(b_col).alias("y"))
        .union(pairs.select(F.col(b_col).alias("x"), F.col(a_col).alias("y")))
        .distinct()
    )
    # Near-dup pair sets are tiny relative to the corpus (LSH emits
    # candidates, not the cross product): below the threshold solve the
    # components with one collect + union-find on the driver — O(E α(E)) in
    # milliseconds instead of per-round Spark jobs. ONE action decides the
    # path AND fetches the edges: limit(threshold+1) returns the full edge
    # set whenever it fits, so the old count()-then-collect() pair (plus
    # the pre-checkpoint the iterative path needs) collapses to a single
    # job. The iterative label-propagation path below remains for
    # genuinely large edge sets.
    head = edges_plan.limit(driver_threshold + 1).collect()
    spark = pairs.sparkSession
    if len(head) <= driver_threshold:
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in head:
            x, y = r["x"], r["y"]
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            rx, ry = find(x), find(y)
            if rx != ry:
                if ry < rx:
                    rx, ry = ry, rx
                parent[ry] = rx
        rows = [(k, find(k)) for k in parent]
        if not rows:
            # empty, lineage-free frame with the edge key's type
            id_type = edges_plan.schema["x"].dataType
            return spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("id", id_type),
                        T.StructField("component", id_type),
                    ]
                ),
            )
        return spark.createDataFrame(rows, ["id", "component"])
    # large edge set: cut the lineage ONCE — edges joins into every
    # iteration, and without this the whole upstream candidate pipeline
    # (LSH bucketing, jaccard verification) would re-execute per round
    edges = edges_plan.localCheckpoint(eager=True)
    # self-edges keep isolated endpoints in the label table
    labels = (
        edges.select(F.col("x").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
    )
    for i in range(max_iterations):
        # each node proposes min(its component, neighbors' components)
        neighbor_min = (
            edges.join(labels, edges["y"] == labels["id"])
            .groupBy(F.col("x").alias("id"))
            .agg(F.min("component").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_comp"), F.col("component"))
                ).alias("component"),
                # convergence flag computed IN the round's own pass: the
                # old/new comparison rides along instead of a second join
                (
                    F.least(
                        F.col("component"),
                        F.coalesce(F.col("nbr_comp"), F.col("component")),
                    )
                    != F.col("component")
                ).alias("__changed"),
            )
        )
        # LAZY checkpoint + a full-scan count: ONE job both materializes
        # every partition (so the next round reads cached blocks, never
        # re-deriving this round) and answers the convergence probe — the
        # eager-checkpoint-then-probe form cost two jobs per round
        checkpointed = new_labels.localCheckpoint(eager=False)
        changed = checkpointed.where(F.col("__changed")).count()
        labels = checkpointed.select("id", "component")
        if changed == 0:
            break
    return labels


def dedup_keep_list(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """End-to-end dedup decision: given candidate near-dup pairs, keep ONE
    representative of every component plus all unpaired docs. Returns df
    filtered to the keep set — the materialization step of the pipeline.

    Default representative = minimum id (deterministic, metadata-only).
    With ``quality_col``, the component member with the HIGHEST quality
    survives (ties by min id) — the curation-grade choice: duplicate
    clusters usually contain one canonical copy and several truncated or
    boilerplate-wrapped ones, and min-id keeps whichever crawled first.
    Costs one extra broadcast-scale join of (id, quality) onto the
    component table; the component computation is unchanged."""
    comps = connected_components(pairs)
    if quality_col is None:
        drop = comps.where(F.col("id") != F.col("component")).select(
            F.col("id").alias(id_col)
        )
        return df.join(drop, id_col, "left_anti")
    q = df.select(
        F.col(id_col).alias("id"), F.col(quality_col).alias("_q")
    )
    w = Window.partitionBy("component").orderBy(
        F.col("_q").desc(), F.col("id")
    )
    drop = (
        comps.join(q, "id")
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") != 1)
        .select(F.col("id").alias(id_col))
    )
    return df.join(drop, id_col, "left_anti")


def exact_dedup_keep(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_col: str | None = None,
) -> DataFrame:
    """Exact dedup materialization: one surviving row per content
    fingerprint — min id by default, best ``quality_col`` (ties by min
    id) when given. One shuffle on the 16-byte fingerprint; the window
    replaces a groupBy+join (same exchange, no second pass)."""
    order = [F.col(id_col)]
    if quality_col is not None:
        order.insert(0, F.col(quality_col).desc())
    w = Window.partitionBy("_fp__").orderBy(*order)
    return (
        df.withColumn("_fp__", fingerprint(F.col(text_col)))
        .withColumn("_rk__", F.row_number().over(w))
        .where(F.col("_rk__") == 1)
        .drop("_fp__", "_rk__")
    )


def contamination_flags(
    corpus: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    eval_id_col: str = "eval_id",
    n: int = 3,
    min_shared: int = 5,
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing >= ``min_shared``
    distinct word n-gram shingles with any eval/benchmark document.

    Returns (id, eval_id, n_shared) pairs above the threshold — the rows a
    pipeline drops (or flags) before training.  The eval set is tiny next
    to a 100 TB corpus, so its exploded shingle index BROADCASTS; the
    corpus side streams through one scan + one aggregation keyed on
    (doc, eval) — never a doc x doc comparison."""
    c = with_shingles(corpus.select(id_col, text_col), text_col, n).select(
        F.col(id_col), F.explode(F.array_distinct("shingles")).alias("s")
    )
    e = with_shingles(eval_docs.select(eval_id_col, text_col), text_col, n).select(
        F.col(eval_id_col), F.explode(F.array_distinct("shingles")).alias("s")
    )
    return (
        c.join(F.broadcast(e), "s")
        .groupBy(id_col, eval_id_col)
        .agg(F.countDistinct("s").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


def span_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 8,
) -> DataFrame:
    """C4-style span-level deduplication (Raffel et al. 2020,
    arXiv:1910.10683 §2.2: "we discarded all but one of any three-sentence
    span occurring more than once in the data set" — here the span unit is
    ``span_tokens`` consecutive tokens, the fixture corpus having no
    sentence boundaries). Every document splits into consecutive
    non-overlapping k-token spans; of all occurrences of an identical span
    across the WHOLE corpus, only the first (smallest (doc, position))
    survives; documents reassemble from their surviving spans in order.

    Returns (id, text, n_spans, n_spans_kept) — text rebuilt with single
    spaces, possibly empty when every span was a later duplicate.

    Scale: two shuffles, both keyed and skew-free — (1) a hash exchange on
    the span string for the first-occurrence window (spans of k >= 8
    tokens are near-unique, so partitions balance; the degenerate
    all-identical corpus degrades to one hot key exactly like any global
    dedup), carrying (span, id, pos) — never whole documents; (2) the
    groupBy(id) reassembly, carrying only surviving spans. Span extraction
    itself is scan-local slice arithmetic on the tokenized array."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    n_spans = F.ceil(F.size(toks) / F.lit(span_tokens)).cast("int")
    spans = F.transform(
        F.sequence(F.lit(0), F.greatest(n_spans - 1, F.lit(0))),
        lambda i: F.array_join(
            F.slice(toks, i * span_tokens + 1, span_tokens), " "
        ),
    )
    exploded = (
        df.select(
            F.col(id_col).alias("id"),
            F.when(F.size(toks) > 0, spans)
            .otherwise(F.array().cast("array<string>"))
            .alias("spans"),
        )
        .select("id", F.posexplode("spans").alias("pos", "span"))
    )
    w = Window.partitionBy("span").orderBy("id", "pos")
    kept = exploded.withColumn("_rk", F.row_number().over(w))
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_rk") == 1,
                            F.struct(F.col("pos"), F.col("span")),
                        )
                    )
                ),
                lambda s: s["span"],
            ),
            " ",
        ).alias("text"),
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum((F.col("_rk") == 1).cast("bigint")).alias("n_spans_kept"),
    )
    # documents with no tokens at all never reach the explode — restore
    # them with empty text so the op is total. Derived directly from the
    # token count (one scan + filter), NOT by anti-joining against the
    # rebuilt side, which would re-run the whole span pipeline a third
    # time just to find the empty docs.
    empties = df.where(F.size(toks) == 0).select(
        F.col(id_col).alias("id"),
        F.lit("").alias("text"),
        F.lit(0).cast("bigint").alias("n_spans"),
        F.lit(0).cast("bigint").alias("n_spans_kept"),
    )
    return rebuilt.unionByName(empties)
