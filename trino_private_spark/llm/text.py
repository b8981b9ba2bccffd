"""Text analysis for training-data pipelines: tokenization, quality scoring,
language ID, fingerprinting.

Everything here is built from JVM-side expressions (split/regexp/HOFs) —
no Python UDFs — so a pass over 100 TB of documents is a single scan with
whole-stage codegen and zero shuffles (all per-row transforms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace tokenizer + a BPE-ish regex tokenizer (words / digits / punct).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "una", "los", "por"],
    "de": ["der", "die", "das", "und", "zu", "den", "von", "mit", "ist", "im"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une", "du", "est"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokens."""
    return F.split(text, r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bpe_token_count(text: Column) -> Column:
    """Token count under a BPE-ish regex (letters / digit runs / punct marks):
    a cheap, deterministic stand-in for a real subword tokenizer."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), F.lit(0))).cast(
        "bigint"
    )


def char_count(text: Column) -> Column:
    return F.length(text).cast("bigint")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are punctuation."""
    puncts = F.length(F.regexp_replace(text, r"[^.,!?;:'\"()\[\]-]", ""))
    return F.round(puncts / F.greatest(F.length(text), F.lit(1)), 6)


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    return F.round(hits / F.greatest(F.size(toks), F.lit(1)), 6)


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return F.round(total / F.greatest(F.size(toks), F.lit(1)), 6)


def quality_score(text: Column) -> Column:
    """Composite heuristic quality score in [0,1]: rewards mid-length docs,
    healthy stopword density, low punctuation noise. Deterministic and
    monotone in its inputs — thresholding it is a stable quality filter."""
    n_tok = token_count(text)
    length_term = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return F.round((length_term + stop_term + punct_term) / 3, 6)


def _isin_pred(values: list[str]):
    # NB: must return a single-parameter lambda — pyspark counts lambda
    # params (including defaults) to pick the 1/2/3-arg HOF form.
    return lambda t: t.isin(*values)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, _isin_pred(sw)))
        for lang, sw in STOPWORDS.items()
    }


def language_id(text: Column) -> Column:
    """Stopword-vote language ID with deterministic alphabetical tie-break:
    the winner is the lexicographically-first language among max scorers."""
    scores = lang_scores(text)
    pairs = F.array(
        *[F.struct((-scores[lang]).alias("neg"), F.lit(lang).alias("lang"))
          for lang in sorted(scores)]
    )
    return F.array_sort(pairs)[0]["lang"]


def fingerprint(text: Column) -> Column:
    """Content fingerprint: md5 of whitespace-normalized lowercase text.
    Equal fingerprints == exact duplicates modulo whitespace/case."""
    return F.md5(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")).cast("binary")
    )


def shingle_fingerprint(text: Column) -> Column:
    """Bag-of-words fingerprint: md5 over the sorted distinct token set —
    invariant to token order, catches shuffled near-duplicates."""
    toks = F.array_sort(F.array_distinct(tokens(F.lower(text))))
    return F.md5(F.array_join(toks, " ").cast("binary"))


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass profile of a document table (scan-only; scales linearly)."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t),
            "n_bpe_tokens": bpe_token_count(t),
            "n_chars_calc": char_count(t),
            "punct_ratio": punct_ratio(t),
            "stopword_ratio": stopword_ratio(t),
            "avg_token_len": avg_token_len(t),
            "quality": quality_score(t),
            "lang_guess": language_id(t),
            "fingerprint": fingerprint(t),
        }
    )


def repeated_ngram_ratio(text: Column, n: int = 3) -> Column:
    """Intra-document repetition: 1 - distinct/total over word n-grams —
    the "repeated n-gram fraction" quality gate (high values flag boilerplate
    and degenerate repetition). Pure JVM HOF math, scan-only."""
    # k shifted slices zipped together — slice-per-index inside a transform
    # lambda re-tokenizes per element (lambda bodies are not CSE'd)
    toks = F.split(F.lower(text), " ")
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, k)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, k), lambda a, b: F.concat_ws(" ", a, b)
        )
    total = F.size(grams)
    return F.when(total > 0, 1.0 - F.size(F.array_distinct(grams)) / total).otherwise(
        0.0
    )


# --------------------------------------------------------------------------
# PII scrubbing (training-data pipeline hygiene op)
# --------------------------------------------------------------------------

# Pattern set chosen to be RE2-compatible (no lookaround/backrefs) so the
# DuckDB oracle replays the identical chain; order matters — cards before
# phones (a 16-digit card would otherwise part-match the phone pattern),
# emails before bare domains.
_PII_RULES = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(?:\d[ -]?){13,16}\b", "[CC]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (r"(?:\+?\d{1,2}[ .-]?)?(?:\(\d{3}\)|\d{3})[ .-]?\d{3}[ .-]?\d{4}\b", "[PHONE]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
]


def scrub_pii(text: Column) -> Column:
    """Mask common PII shapes (emails, card/SSN/phone numbers, IPv4) with
    typed placeholders — the redaction pass every training-data pipeline
    runs before tokenization.  A chain of JVM regexp_replace calls: stays
    in whole-stage codegen, scan-only at 100 TB."""
    out = text
    for pat, repl in _PII_RULES:
        out = F.regexp_replace(out, pat, repl)
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category match counts (audit/reporting side of the scrub)."""
    return {
        repl.strip("[]").lower(): F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0)))
        for pat, repl in _PII_RULES
    }


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF keywords per document: (id, term, tf, df, score, rank).

    IDF uses the rational form (N+1)/(df+1) instead of its logarithm: the
    ranking it induces per document is identical (log is monotone and tf
    multiplies both the same way at equal tf; at different tf the relative
    weighting changes slightly, which is an accepted variant), and exact
    integer ratios stay bit-identical across engines and partitionings —
    the same determinism discipline as llm/cluster.py.

    Plan shape: per-doc term counts come from ONE zero-shuffle run-length
    pass over the sorted token array (no raw-token explode); only the
    (doc, distinct-term, tf) triples are exploded. Document frequency is
    one groupBy(term) whose partial aggregation shrinks the shuffle to
    distinct terms per partition; the tiny vocabulary then broadcast-joins
    back. Top-k per doc is a row_number window Spark executes as
    WindowGroupLimit (rank pushed before the sort). At 100 TB the only
    full shuffles carry (doc, term, tf) triples and the window keys.
    """
    from pyspark.sql import Window

    n_docs = df.count()
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.expr("CAST(array() AS array<struct<term string, tf bigint>>)").alias(
            "out"
        ),
    )

    def step(acc, tok):
        same = acc["prev"] == tok
        return F.struct(
            tok.alias("prev"),
            F.when(same, acc["run"] + 1)
            .otherwise(F.lit(1).cast("bigint"))
            .alias("run"),
            F.when(
                same | (acc["run"] == 0), acc["out"]
            )  # continue run / first token
            .otherwise(
                F.array_append(
                    acc["out"],
                    F.struct(
                        acc["prev"].alias("term"), acc["run"].alias("tf")
                    ),
                )
            )
            .alias("out"),
        )

    def finish(acc):
        return F.when(acc["run"] > 0, F.array_append(
            acc["out"],
            F.struct(acc["prev"].alias("term"), acc["run"].alias("tf")),
        )).otherwise(acc["out"])

    # drop empty tokens from leading/trailing whitespace BEFORE sorting —
    # '' terms would pollute per-doc counts and the document-frequency
    # table (consistent with bpe.word_freqs / embed.hashed_vector)
    toks_sorted = F.array_sort(
        F.array_remove(F.split(F.lower(F.col(text_col)), r"\s+"), "")
    )
    terms = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.aggregate(toks_sorted, acc0, step, finish)).alias("t"),
    ).select("id", F.col("t.term").alias("term"), F.col("t.tf").alias("tf"))
    docfreq = terms.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        terms.join(F.broadcast(docfreq), "term")
        .withColumn(
            "score",
            F.col("tf") * (F.lit(float(n_docs + 1)) / (F.col("df") + 1)),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("id", "term", "tf", "df", "score", "rank")
    )
