"""Sequence packing + stratified sampling for training-data pipelines.

Two operators a 100 TB pretraining-data pipeline needs downstream of
dedup/curation (beyond-the-reference north-star surface, like llm/dedup.py):

- ``pack_sequences``: greedy first-fit-decreasing packing of documents into
  fixed token-budget bins (the "sequence packing" step that turns a curated
  corpus into dense training rows).  Packing is done PER PARTITION with
  mapInPandas — no shuffle, no global coordination; bin ids are made
  globally unique by a partition-id prefix.  FFD within a partition wastes
  at most one partially-filled bin per partition-and-residue class, so
  utilization stays near-optimal while the operator scales linearly.

- ``stratified_sample``: deterministic per-stratum quota sampling — rank
  rows inside each stratum by xxhash64(id, seed) and keep the first
  ``quota``.  Exactly min(quota, |stratum|) rows survive (closed form, so
  the probe carries a full arithmetic oracle), the choice is uniform-ish
  and stable under re-runs, and the plan is one hash-partitioned window,
  no collect.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["pack_sequences", "stratified_sample", "deterministic_shuffle"]


def shuffle_key(
    id_col, seed: int = 42, epoch: int = 0
):
    """Exact affine permutation key over the 31-bit Mersenne field:
    ``h = (a * (id mod p) + b) mod p`` with seed/epoch-derived a, b.
    All products stay under 2^62, so the arithmetic is exact BIGINT on any
    engine — the key (unlike engine-specific hash functions) replays
    bit-identically in the DuckDB oracle."""
    p = 2_147_483_647  # 2^31 - 1
    a = (1_103_515_245 * ((seed + 31 * epoch) % 1024 + 1)) % p
    b = (12_345 + 2_654_435_761 * (seed + epoch)) % p
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return (F.lit(a) * (col.cast("bigint") % p) + F.lit(b)) % p


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    epoch: int = 0,
    num_partitions: int | None = None,
) -> DataFrame:
    """Deterministic global reshuffle for training epochs: every epoch is a
    reproducible pseudo-random permutation of the corpus (same seed+epoch
    -> same order on any cluster size), the standard requirement for
    resumable pretraining runs.

    Scale shape: ``repartitionByRange`` on the permutation key (one range
    shuffle over sampled bounds — no single-reducer global sort) +
    ``sortWithinPartitions``, so the output files stream in permuted order
    with full parallelism. The key column rides along as ``shuffle_key``
    (drop it after writing; ties between ids congruent mod p break on the
    id itself)."""
    key = shuffle_key(id_col, seed, epoch).alias("shuffle_key")
    out = df.select("*", key)
    n = num_partitions or out.rdd.getNumPartitions()
    return out.repartitionByRange(n, "shuffle_key", id_col).sortWithinPartitions(
        "shuffle_key", id_col
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
) -> DataFrame:
    """Assign each document to a packing bin: returns (id, n_tokens, bin_id,
    bin_fill) with every bin's total <= budget (documents longer than the
    budget get a dedicated overflow bin each, flagged by bin_fill > budget
    so the caller can truncate).

    Greedy first-fit-decreasing per partition via mapInPandas: sort the
    partition's docs by token count descending, drop each into the first
    bin that still fits.  One scan, zero shuffles; bin ids are unique
    across partitions (pid * 2^40 + local index).
    """

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        # batches is a GENERATOR — always truthy; materialize before the
        # emptiness check or empty partitions (routine once partitions >
        # groups at scale) crash pd.concat with "No objects to concatenate"
        batch_list = list(batches)
        if not batch_list:
            return
        pdf = pd.concat(batch_list, ignore_index=True)
        if len(pdf) == 0:
            return
        pdf = pdf.sort_values(
            [tokens_col, id_col], ascending=[False, True], kind="mergesort"
        )
        fills: list[int] = []
        assign: list[int] = []
        for tok in pdf[tokens_col]:
            placed = -1
            for bi, fill in enumerate(fills):
                if fill + tok <= budget:
                    placed = bi
                    break
            if placed < 0:
                fills.append(int(tok))
                placed = len(fills) - 1
            else:
                fills[placed] += int(tok)
            assign.append(placed)
        base = pid << 40
        out = pd.DataFrame(
            {
                id_col: pdf[id_col].to_numpy(),
                tokens_col: pdf[tokens_col].to_numpy(),
                "bin_id": [base + a for a in assign],
                "bin_fill": [fills[a] for a in assign],
            }
        )
        yield out

    id_t = dict(df.dtypes)[id_col]
    tok_t = dict(df.dtypes)[tokens_col]
    return df.select(id_col, tokens_col).mapInPandas(
        pack, f"{id_col} {id_t}, {tokens_col} {tok_t}, bin_id bigint, bin_fill bigint"
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    quota: int,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Keep exactly min(quota, stratum size) rows per stratum,
    deterministically: rank by xxhash64(id, seed) inside each stratum and
    keep rank <= quota.  One window over a hash shuffle on the stratum key;
    survivor counts are closed-form, so the operation is fully
    oracle-checkable."""
    w = Window.partitionBy(strata_col).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col)
    )
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= quota)
        .drop("_rk")
    )


def token_budget_take(
    df: DataFrame,
    strata_col: str,
    tokens_col: str = "n_tokens",
    budget: int = 100_000,
    id_col: str = "doc_id",
) -> DataFrame:
    """Mixture construction: per stratum (source/language), take the
    deterministic id-ordered prefix whose running token total stays within
    ``budget`` — how a training mixture hits per-source token quotas.

    One hash shuffle on the stratum key + one running-sum window; the
    cumulative total rides along as ``cum_tokens``.  Entirely relational
    (no data-dependent hashing), so the operation is fully oracle-checkable
    on any engine."""
    w = (
        Window.partitionBy(strata_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum(tokens_col).over(w))
        .where(F.col("cum_tokens") <= budget)
    )


def mixture_quotas(
    counts: dict, total: int, alpha: float, tot_w: float | None = None
) -> dict:
    """Largest-remainder per-source quotas for temperature mixing:
    floor(total * count^alpha / W) plus one extra unit to the ``rem``
    sources with the largest fractional parts (deterministic tie-break by
    source name), so the quotas sum to exactly ``total``."""
    import functools
    import math

    weights = {s: math.pow(float(c), alpha) for s, c in counts.items()}
    order = sorted(weights, key=lambda s: (s is None, s))
    if tot_w is None:
        tot_w = functools.reduce(
            lambda a, b: a + b, (weights[s] for s in order), 0.0
        )
    exact = {s: total * weights[s] / tot_w for s in weights}
    quotas = {s: int(math.floor(exact[s])) for s in weights}
    rem = total - sum(quotas.values())
    by_frac = sorted(
        order, key=lambda s: (-(exact[s] - quotas[s]), s is None, s)
    )
    for s in by_frac[: max(0, rem)]:
        quotas[s] += 1
    return quotas


def temperature_mixture(
    df: DataFrame,
    source_col: str = "source",
    total: int = 1000,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Temperature-based mixture sampling (the data-mixing rule behind
    multilingual/multi-domain pretraining, e.g. mBERT/XLM-R's p^alpha
    resampling, arXiv:1911.02116 §5.1): source s receives a quota
    proportional to count(s)^alpha — alpha=1 is natural proportions,
    alpha -> 0 approaches uniform — then quota rows are kept per source
    by deterministic xxhash64 rank (same discipline as
    stratified_sample).

    Quotas are floor(total * w/W) plus a largest-remainder fill: the
    leftover ``total - sum(floors)`` units go to the sources with the
    largest fractional parts (ties broken by source name), so exactly
    ``total`` rows survive whenever every source holds enough rows — a
    bare floor silently under-delivers by up to n_sources - 1.

    Scale/determinism: per-source counts are ONE aggregation collected to
    the driver (bounded by the number of sources); quotas use an ordered
    reduction over sources sorted by name so the float weight sum is a
    fixed-order fold — bit-identical in any engine that replays the same
    fold (DuckDB: list_reduce over list(... ORDER BY source)). Sampling
    itself is one window over a hash shuffle on the source key.
    """
    import functools
    import math

    counts = {
        r["s"]: r["c"]
        for r in df.groupBy(F.col(source_col).alias("s"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    weights = {s: math.pow(float(c), alpha) for s, c in counts.items()}
    order = sorted(weights, key=lambda s: (s is None, s))  # NULL source ok
    tot_w = functools.reduce(
        lambda a, b: a + b, (weights[s] for s in order), 0.0
    )
    quotas = mixture_quotas(counts, total, alpha, tot_w)
    qdf = F.broadcast(
        df.sparkSession.createDataFrame(
            [(s, quotas[s]) for s in order],
            f"_qsrc string, _quota int",
        )
    )
    w = Window.partitionBy(source_col).orderBy(
        F.xxhash64(F.col(id_col), F.lit(seed)), F.col(id_col)
    )
    return (
        df.join(qdf, F.col(source_col).eqNullSafe(F.col("_qsrc")))
        .withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= F.col("_quota"))
        .drop("_rk", "_quota", "_qsrc")
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping context-window chunks:
    (id, chunk_idx, n_chunk_tokens, chunk_text), where chunk i covers
    tokens [1 + i*stride, ... + chunk_tokens) with stride =
    chunk_tokens - overlap, and the chunk count is
    max(1, ceil((n - overlap) / stride)) so the tail is always covered
    (the final chunk may be shorter).

    Pure JVM expressions — tokenize once, generate start offsets with
    sequence/transform, slice per chunk, posexplode. One scan, zero
    shuffles, exact integer arithmetic end to end (full-hash oracle:
    p_chunk_documents). At 100 TB this is the narrow transformation
    between curation and pack_sequences."""
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.col(text_col), r"\s+"), lambda t: t != ""
    )
    d = df.select(
        F.col(id_col).alias("id"), toks.alias("__toks")
    ).withColumn(
        "__nc",
        F.greatest(
            F.lit(1),
            F.expr(
                f"(size(__toks) - {overlap} + {stride - 1}) div {stride}"
            ),
        ).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), F.col("__nc") - 1),
        lambda i: F.slice(F.col("__toks"), i * stride + 1, chunk_tokens),
    )
    return d.select(
        "id", F.posexplode(chunks).alias("chunk_idx", "__c")
    ).select(
        "id",
        "chunk_idx",
        F.size("__c").cast("bigint").alias("n_chunk_tokens"),
        F.array_join("__c", " ").alias("chunk_text"),
    )
