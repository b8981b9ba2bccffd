"""Gopher-style repetition and quality heuristics for training-data curation.

Implements the document-level filter rules published in Rae et al. 2021
("Scaling Language Models: ... Gopher", arXiv:2112.11446, Table A1) and the
C4 cleanup heuristics (Raffel et al. 2020, arXiv:1910.10683 §2.2) that are
expressible over this corpus' single-line documents:

- repetition metrics: fraction of characters inside the most frequent word
  n-gram (n=2..4) and inside duplicated word n-grams (n=5..10);
- quality metrics: word count bounds, mean word length bounds, symbol-to-word
  ratio, fraction of words with an alphabetic character, required-stopword
  count.

Everything is JVM-side (split / array HOFs / regexp) with NO Python UDFs:
a quality-filter pass over 100 TB of documents is one scan inside
whole-stage codegen with zero shuffles.  The only per-row superlinear cost
is an O(n log n) array_sort over the n-gram array.

The per-row accumulators use ``F.aggregate`` with a struct accumulator over
the SORTED n-gram array, so "most frequent n-gram" falls out of a single
run-length scan (ties broken toward the lexicographically smallest gram —
the sorted order makes that automatic) and "duplicated n-gram characters"
out of run lengths > 1.  The DuckDB oracles replay the identical
definitions with GROUP BY over unnested n-grams (queries/llm.py
p_gopher_repetition / p_gopher_quality).

Reference parity note: the reference engine (Trino 364) has no such
curation surface — these are the beyond-reference training-pipeline
operators this project treats as first-class (same discipline as
llm/dedup.py, llm/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_ngrams(toks: Column, n: int) -> Column:
    """Word n-grams from a token-array COLUMN (pass a materialized column,
    not an expression — lambda bodies are not subexpression-eliminated, so
    an expensive expression here would re-evaluate once per element).
    Built from n shifted slices zipped together: O(n * len) JVM work."""
    if n == 1:
        return toks
    k = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, k)
    for j in range(1, n):
        grams = F.zip_with(
            grams, F.slice(toks, j + 1, k), lambda a, b: F.concat_ws(" ", a, b)
        )
    return grams


def _run_length_stats(grams_sorted: Column) -> Column:
    """Single scan over a sorted gram array returning
    struct(top_chars bigint, dup_chars bigint, tot_chars bigint):

    - top_chars: MAX over distinct grams of occurrences x length — the char
      coverage of the single best-covering gram.  A pure max over products,
      so no gram tie-break is ever needed (the fraction depends only on the
      value);
    - dup_chars: sum of occurrences x length over grams occurring > 1 time;
    - tot_chars: sum of occurrences x length over all grams.
    """
    acc0 = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).cast("bigint").alias("run"),
        F.lit(0).cast("bigint").alias("best"),
        F.lit(0).cast("bigint").alias("dup"),
        F.lit(0).cast("bigint").alias("tot"),
    )

    def step(acc, g):
        same = acc["prev"] == g
        run = F.when(same, acc["run"] + 1).otherwise(F.lit(1).cast("bigint"))
        # close the previous run when the gram changes: if it repeated,
        # its chars count toward dup_chars
        closed_dup = F.when(
            same | (acc["run"] <= 1), F.lit(0).cast("bigint")
        ).otherwise(acc["run"] * F.length(acc["prev"]))
        best = F.greatest(acc["best"], run * F.length(g))
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            best.alias("best"),
            (acc["dup"] + closed_dup).alias("dup"),
            (acc["tot"] + F.length(g)).alias("tot"),
        )

    def finish(acc):
        # flush the final run
        last_dup = F.when(
            acc["run"] > 1, acc["run"] * F.length(acc["prev"])
        ).otherwise(F.lit(0).cast("bigint"))
        return F.struct(
            acc["best"].alias("top_chars"),
            (acc["dup"] + last_dup).alias("dup_chars"),
            acc["tot"].alias("tot_chars"),
        )

    return F.aggregate(grams_sorted, acc0, step, finish)


def top_ngram_char_fraction(toks: Column, n: int) -> Column:
    """Gopher repetition rule (arXiv:2112.11446 A1.1): fraction of n-gram
    characters covered by the single highest-coverage word n-gram
    (max over distinct grams of occurrences x gram length, over total gram
    chars).  The fraction is a ratio of exact integers -> bit-identical
    across engines (no rounding needed for the oracle hash)."""
    s = _run_length_stats(F.array_sort(word_ngrams(toks, n)))
    return F.when(s["tot_chars"] > 0, s["top_chars"] / s["tot_chars"]).otherwise(0.0)


def duplicate_ngram_char_fraction(toks: Column, n: int) -> Column:
    """Gopher repetition rule (A1.1): fraction of n-gram characters inside
    word n-grams that occur more than once (all occurrences counted)."""
    s = _run_length_stats(F.array_sort(word_ngrams(toks, n)))
    return F.when(s["tot_chars"] > 0, s["dup_chars"] / s["tot_chars"]).otherwise(0.0)


def symbol_to_word_ratio(text: Column, toks: Column) -> Column:
    """Gopher quality rule: (# of '#' or '...' symbols) / word count."""
    hashes = F.length(F.regexp_replace(text, r"[^#]", ""))
    ellipses = F.size(F.regexp_extract_all(text, F.lit(r"\.\.\.|…"), F.lit(0)))
    return (hashes + ellipses) / F.greatest(F.size(toks), F.lit(1))


def alpha_word_fraction(toks: Column) -> Column:
    """Gopher quality rule: fraction of words containing >= 1 alphabetic
    character (the 80% rule)."""
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    return alpha / F.greatest(F.size(toks), F.lit(1))


def required_stopword_count(toks: Column, lang: str = "en") -> Column:
    """Gopher quality rule: number of DISTINCT required stopwords present
    (the reference rule wants >= 2 of: the, be, to, of, and, that, have,
    with)."""
    required = ["the", "be", "to", "of", "and", "that", "have", "with"]
    _ = lang
    lowered = F.transform(toks, F.lower)
    return F.size(F.array_intersect(lowered, F.array(*[F.lit(w) for w in required])))


def mean_word_length(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    return total / F.greatest(F.size(toks), F.lit(1))


def repetition_stats_agg(
    df: DataFrame,
    id_col: str,
    toks: Column,
    ns: tuple[int, ...],
) -> DataFrame:
    """The n-gram repetition stats as an explode + two-level hash
    aggregate: (id, top_{n}, dup_{n}, tot_{n} ...) — one row per doc.

    Same exact integer arithmetic as the per-row fold (_run_length_stats),
    different physical plan: whole-stage-codegen'd hash aggregates instead
    of interpreted HOF folds. Measured 4.4x faster on 50k docs (15 s vs
    68 s, SCALE.md) at the cost of shuffling the (doc, n, gram) stream —
    prefer this when CPU-bound, the scan path when network-bound.
    Equivalence of the two paths is pinned by tests/test_llm_ops.py."""
    stacked = None
    for n in ns:
        part = df.select(
            F.col(id_col).alias("__id"),
            F.lit(n).alias("__n"),
            F.explode(word_ngrams(toks, n)).alias("__g"),
        )
        stacked = part if stacked is None else stacked.unionByName(part)
    per_gram = stacked.groupBy("__id", "__n", "__g").agg(
        F.count(F.lit(1)).alias("c")
    )
    cl = F.col("c") * F.length("__g")
    per_doc = per_gram.groupBy("__id", "__n").agg(
        F.max(cl).alias("top"),
        F.sum(F.when(F.col("c") > 1, cl).otherwise(0)).alias("dup"),
        F.sum(cl).alias("tot"),
    )
    aggs = []
    for n in ns:
        hit = F.col("__n") == n
        aggs.append(F.max(F.when(hit, F.col("top"))).alias(f"top_{n}"))
        aggs.append(F.max(F.when(hit, F.col("dup"))).alias(f"dup_{n}"))
        aggs.append(F.max(F.when(hit, F.col("tot"))).alias(f"tot_{n}"))
    return per_doc.groupBy("__id").agg(*aggs)


def with_gopher_metrics(
    df: DataFrame,
    text_col: str = "text",
    lang: str = "en",
    id_col: str | None = None,
    method: str = "auto",
) -> DataFrame:
    """Append the full Gopher metric set as columns.  Materializes the token
    array ONCE (``__toks``) so every HOF lambda touches a cheap attribute
    reference instead of re-tokenizing per element, then drops it.

    ``method='scan'`` computes the n-gram repetition stats with
    zero-shuffle per-row folds; ``method='shuffle'`` (requires ``id_col``,
    a unique key) uses explode + codegen'd hash aggregates + a join back —
    identical values, different plan (see repetition_stats_agg).
    ``method='auto'`` (default) picks shuffle whenever ``id_col`` is
    given: Spark evaluates HOF lambdas INTERPRETED, and the measured gap
    is 4.4x CPU in shuffle's favor (SCALE.md, 50k docs: 68 s fold vs 15 s
    explode+codegen), so on a CPU-bound cluster the extra exchange pays
    for itself; prefer 'scan' explicitly only when the network is the
    binding constraint or no unique key exists."""
    if method == "auto":
        method = "shuffle" if id_col is not None else "scan"
    t = F.col(text_col)
    out = df.withColumn("__toks", F.split(F.lower(t), r"\s+"))
    toks = F.col("__toks")
    metrics = {
        "word_count": F.size(toks).cast("bigint"),
        "mean_word_len": mean_word_length(toks),
        "symbol_word_ratio": symbol_to_word_ratio(t, toks),
        "alpha_word_frac": alpha_word_fraction(toks),
        "stopword_hits": required_stopword_count(toks, lang).cast("bigint"),
    }
    top_ns, dup_ns = (2, 3, 4), (5, 10)
    if method == "shuffle":
        if id_col is None:
            raise ValueError("method='shuffle' needs id_col (a unique key)")
        stats = repetition_stats_agg(
            out, id_col, toks, tuple(sorted({*top_ns, *dup_ns}))
        )
        out = out.withColumns(metrics).join(
            stats, F.col(id_col) == F.col("__id"), "left"
        )
        frac = {}
        for n in top_ns:
            frac[f"top_{n}gram_frac"] = F.when(
                F.col(f"tot_{n}") > 0, F.col(f"top_{n}") / F.col(f"tot_{n}")
            ).otherwise(0.0)
        for n in dup_ns:
            frac[f"dup_{n}gram_frac"] = F.when(
                F.col(f"tot_{n}") > 0, F.col(f"dup_{n}") / F.col(f"tot_{n}")
            ).otherwise(0.0)
        drop = ["__id"] + [
            f"{p}_{n}"
            for n in sorted({*top_ns, *dup_ns})
            for p in ("top", "dup", "tot")
        ]
        return out.withColumns(frac).drop("__toks", *drop)
    for n in top_ns:
        metrics[f"top_{n}gram_frac"] = top_ngram_char_fraction(toks, n)
    for n in dup_ns:
        metrics[f"dup_{n}gram_frac"] = duplicate_ngram_char_fraction(toks, n)
    return out.withColumns(metrics).drop("__toks")


# Gopher A1 thresholds (top-n-gram: n->max fraction; dup-n-gram: n->max).
GOPHER_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
GOPHER_DUP_NGRAM_MAX = {5: 0.15, 10: 0.10}


def gopher_quality_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_word_ratio: float = 0.1,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    top_ngram_max: dict[int, float] | None = None,
    dup_ngram_max: dict[int, float] | None = None,
    id_col: str | None = None,
    method: str = "auto",
) -> DataFrame:
    """Apply the Gopher rule set; returns the input plus every metric, a
    per-rule boolean, and an overall ``keep`` flag — keep the metrics so a
    pipeline can audit WHY a document was dropped (the standard curation
    reporting shape).  One scan, no shuffle, with ``method='scan'``;
    ``method='shuffle'`` trades a (doc, gram) shuffle for codegen'd
    aggregates — 4.4x less CPU measured (see with_gopher_metrics), which
    'auto' picks whenever ``id_col`` is given. Filter afterwards with
    ``.where('keep')``."""
    top_ngram_max = top_ngram_max or GOPHER_TOP_NGRAM_MAX
    dup_ngram_max = dup_ngram_max or GOPHER_DUP_NGRAM_MAX
    out = with_gopher_metrics(df, text_col, id_col=id_col, method=method)
    rules = {
        "ok_word_count": F.col("word_count").between(min_words, max_words),
        "ok_mean_word_len": F.col("mean_word_len").between(
            min_mean_word_len, max_mean_word_len
        ),
        "ok_symbol_ratio": F.col("symbol_word_ratio") <= max_symbol_word_ratio,
        "ok_alpha_words": F.col("alpha_word_frac") >= min_alpha_word_frac,
        "ok_stopwords": F.col("stopword_hits") >= min_stopword_hits,
    }
    for n, mx in top_ngram_max.items():
        rules[f"ok_top_{n}gram"] = F.col(f"top_{n}gram_frac") <= mx
    for n, mx in dup_ngram_max.items():
        rules[f"ok_dup_{n}gram"] = F.col(f"dup_{n}gram_frac") <= mx
    out = out.withColumns(rules)
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("keep", keep)
