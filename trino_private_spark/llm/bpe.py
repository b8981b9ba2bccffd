"""Distributed BPE (byte-pair encoding) tokenizer training and application.

Sennrich et al. 2016 (arXiv:1508.07909) train BPE on the WORD-FREQUENCY
table, not the corpus: one corpus-scale shuffle builds (word, freq) — at
100 TB the distinct-word table is millions of rows, thousands of times
smaller than the corpus — and every merge iteration then runs on that
compact table. This module keeps that discipline:

- ``bpe_train``: n_merges Lloyd-style rounds; each round is (a) one
  groupBy over exploded adjacent symbol pairs, weighted by word freq,
  with map-side partial aggregation (the shuffle carries distinct pairs
  per partition), (b) a 1-row driver collect of the argmax pair
  (count desc, pair asc — deterministic under any partitioning since
  counts are exact integers), (c) a JVM-side left-to-right fold that
  merges the pair inside each word's symbol array. The word table is
  localCheckpoint'ed each round (iterated-input rule).
- ``bpe_apply``: tokenizes text with a learned merge list. Two plans:
  a JVM fold chain (one expression per merge — zero shuffles, but Spark
  evaluates higher-order-function lambdas INTERPRETED, and Catalyst
  cannot plan a 30k-deep chained expression tree, so this path is gated
  to small merge lists) and an Arrow path (``mapInPandas`` applying the
  standard rank-dict BPE loop per word with per-batch word memoization —
  the industry encode shape, tiktoken/HF style; cost is independent of
  the merge-list length). ``method='auto'`` picks by list size; both
  paths are equivalence-tested on trained merge lists.

Determinism: exact integer counts + total tie-break order makes the merge
list independent of partitioning and engine. The left-to-right
non-overlapping merge emerges from the fold comparing against the ALREADY
MERGED last symbol (e.g. pair (a,a) on "aaa" -> [aa, a]).

Reference parity note: the reference engine (Trino 364) has no tokenizer
surface; this is beyond-reference, north-star training-pipeline work
(same discipline as llm/cluster.py, llm/heuristics.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_freqs(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over whitespace-split lowercased text — the one
    corpus-scale aggregation of BPE training."""
    return (
        df.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def chars_of(word: Column) -> Column:
    """Initial symbol array: the word's characters."""
    return F.split(word, "")


def merge_pair(syms: Column, a: str, b: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (a, b) into a+b."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    acc0 = F.expr("CAST(array() AS array<string>)")

    def step(acc, s):
        n = F.size(acc)
        can = (n > 0) & (F.element_at(acc, -1) == la) & (s == lb)
        return F.when(
            can, F.concat(F.slice(acc, 1, n - 1), F.array(lab))
        ).otherwise(F.array_append(acc, s))

    return F.aggregate(syms, acc0, step)


def pair_counts(words: DataFrame) -> DataFrame:
    """freq-weighted counts of adjacent symbol pairs over the word table.
    ``words`` must have (syms array<string>, freq bigint)."""
    n = F.size(F.col("syms"))
    pairs = F.zip_with(
        F.slice(F.col("syms"), 1, F.greatest(n - 1, F.lit(0))),
        F.slice(F.col("syms"), 2, F.greatest(n - 1, F.lit(0))),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        words.select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _local_bpe(
    pairs: list[tuple[str, int]], n_merges: int, min_count: int
) -> list[tuple[str, str]]:
    """Driver-side BPE over a collected (word, freq) table — semantically
    IDENTICAL to the distributed rounds (exact counts, (cnt desc, pair
    asc) tie-break, left-to-right merge); equivalence is pinned by
    tests/test_bpe.py."""
    words = [(list(w), f) for w, f in pairs]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        cnt: dict[tuple[str, str], int] = {}
        for syms, f in words:
            for p in zip(syms, syms[1:]):
                cnt[p] = cnt.get(p, 0) + f
        if not cnt:
            break
        (a, b), c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_count:
            break
        merges.append((a, b))
        nxt = []
        for syms, f in words:
            out: list[str] = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = a + b
                else:
                    out.append(s)
            nxt.append((out, f))
        words = nxt
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 10,
    min_count: int = 2,
    driver_threshold: int = 100_000,
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges; stops early when the best pair
    falls below ``min_count``. Returns [(a, b), ...] in merge order.

    A vocabulary within ``driver_threshold`` distinct words is collected
    and trained driver-side (Sennrich's own regime — the word table fits
    in memory even for web-scale corpora); larger vocabularies run the
    distributed per-merge rounds. Both paths are exact and identical
    (guarded fast path, same discipline as dedup.connected_components)."""
    wf = word_freqs(df, text_col)
    if driver_threshold > 0:
        head = wf.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            return _local_bpe(
                [(r["word"], r["freq"]) for r in head], n_merges, min_count
            )
    words = wf.select(
        chars_of(F.col("word")).alias("syms"), "freq"
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        top = (
            pair_counts(words)
            .orderBy(F.col("cnt").desc(), F.col("a"), F.col("b"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        words = words.select(
            merge_pair(F.col("syms"), a, b).alias("syms"), "freq"
        ).localCheckpoint(eager=True)
    return merges


def bpe_segment(word: Column, merges: list[tuple[str, str]]) -> Column:
    """Symbol array for one word column after applying ``merges`` in
    order — chained JVM folds, zero shuffles."""
    syms = chars_of(word)
    for a, b in merges:
        syms = merge_pair(syms, a, b)
    return syms


#: above this many merges the fold plan's expression tree is the
#: bottleneck (interpreted lambdas, Catalyst planning depth) — switch to
#: the Arrow rank-dict encoder, whose cost is independent of list length.
FOLD_MAX_MERGES = 64


def _segment_rank(
    word: str,
    ranks: dict[tuple[str, str], int],
    cache: dict[str, list[str]],
) -> list[str]:
    """Rank-dict BPE segmentation of one word (Sennrich 2016 / the
    GPT-2-style encode loop): repeatedly merge every non-overlapping
    occurrence of the lowest-rank adjacent pair. The merge pass itself is
    byte-identical to merge_pair's left-to-right fold."""
    hit = cache.get(word)
    if hit is not None:
        return hit
    syms = list(word)
    while len(syms) > 1:
        best_r = None
        best = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_r is None or r < best_r):
                best_r, best = r, p
        if best is None:
            break
        a, b = best
        out: list[str] = []
        for s in syms:
            if out and out[-1] == a and s == b:
                out[-1] = a + b
            else:
                out.append(s)
        syms = out
    cache[word] = syms
    return syms


def _bpe_apply_arrow(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Arrow encode path: one mapInPandas scan, rank-dict loop per word,
    per-batch memoization over distinct words (natural text repeats words
    heavily, so the loop runs once per distinct word per batch). This is
    the 100-TB path — work per row is O(tokens), independent of the
    merge-list length, and the merge dict broadcasts with the closure."""
    import pyspark.sql.types as T

    ranks = {(a, b): i for i, (a, b) in enumerate(merges)}
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id", id_type),
            T.StructField("tokens", T.ArrayType(T.StringType())),
            T.StructField("n_tokens", T.LongType()),
        ]
    )

    def run(batches):
        import re

        import pandas as pd

        ws = re.compile(r"\s+")
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            toks = []
            for text in pdf[text_col]:
                row: list[str] = []
                if text is not None:
                    for w in ws.split(str(text).lower()):
                        if w:
                            row.extend(_segment_rank(w, ranks, cache))
                toks.append(row)
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "tokens": toks,
                    "n_tokens": [len(t) for t in toks],
                }
            )

    return df.select(id_col, text_col).mapInPandas(run, out_schema)


def bpe_apply(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "auto",
) -> DataFrame:
    """Tokenize documents with a learned merge list: (id, tokens, n_tokens).
    One scan either way; ``method`` 'fold' chains one JVM fold per merge
    (fine for small lists, interpreted + planning-bound beyond
    FOLD_MAX_MERGES), 'arrow' runs the rank-dict loop per word in a
    mapInPandas pass (real-vocabulary path), 'auto' picks by list size.
    Null text yields empty tokens on both paths."""
    if method == "auto":
        method = "fold" if len(merges) <= FOLD_MAX_MERGES else "arrow"
    if method == "arrow":
        return _bpe_apply_arrow(df, merges, id_col, text_col)
    if method != "fold":
        raise ValueError(f"unknown bpe_apply method {method!r}")
    words = F.filter(
        F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda w: w != "",
    )
    toks = F.flatten(F.transform(words, lambda w: bpe_segment(w, merges)))
    return df.select(
        F.col(id_col).alias("id"),
        toks.alias("tokens"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
