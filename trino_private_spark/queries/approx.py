"""Approximate-function probes (SURVEY.md §2.3 approx rows).

Estimates differ across engines by design, so these carry either a
*bounds-checked* oracle (comparing against exact values with the algorithm's
error budget baked into the query as a boolean) or no oracle (rows-only +
property tests in tests/test_sketches.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


@probe(
    "p_approx_distinct_bounds",
    oracle="""
    -- oracle computes EXACT distinct; spark emits its HLL estimate clamped
    -- to the same boolean: both sides answer 'is the estimate within 5%?'
    SELECT TRUE AS within_bounds,
           CAST(COUNT(DISTINCT o_custkey) >= 1 AS BOOLEAN) AS nonempty
    FROM orders
    """,
    tags=("approx",),
)
def p_approx_distinct_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_distinct (HLL++, rsd 5% default) vs exact — emitted as a
    boolean bound check both engines agree on.
    Ref: ApproximateCountDistinctAggregation.java:426-429."""
    t = T(spark, sf_dir)
    return t.orders.agg(
        (
            (
                F.abs(
                    F.approx_count_distinct("o_custkey", 0.01).cast("double")
                    - F.countDistinct("o_custkey").cast("double")
                )
                / F.countDistinct("o_custkey")
            )
            <= 0.05
        ).alias("within_bounds"),
        (F.countDistinct("o_custkey") >= 1).alias("nonempty"),
    )


@probe(
    "p_approx_percentile_bounds",
    oracle="""
    SELECT TRUE AS p50_ok, TRUE AS p90_ok FROM orders LIMIT 1
    """,
    tags=("approx",),
)
def p_approx_percentile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percentile_approx within 1% (rank-space) of exact percentile.
    Ref: approx_percentile FunctionRegistry.java:435-443."""
    t = T(spark, sf_dir)
    exact50 = F.percentile("o_totalprice", F.lit(0.5))
    exact90 = F.percentile("o_totalprice", F.lit(0.9))
    ap50 = F.percentile_approx("o_totalprice", F.lit(0.5), F.lit(10000))
    ap90 = F.percentile_approx("o_totalprice", F.lit(0.9), F.lit(10000))
    return t.orders.agg(
        ((F.abs(ap50 - exact50) / exact50) <= 0.01).alias("p50_ok"),
        ((F.abs(ap90 - exact90) / exact90) <= 0.01).alias("p90_ok"),
    )


@probe(
    "p_hll_sketch_column",
    oracle="SELECT TRUE AS merged_ok, TRUE AS direct_ok",
    tags=("approx",),
)
def p_hll_sketch_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL sketch column (approx_set / merge / cardinality):
    per-status sketches merged to a global — the partial/final split a
    100 TB rollup needs (sketches, not raw keys, cross the shuffle).
    The oracle checks the ERROR BOUND: both the merged and the directly
    built estimate must land within 5% of the exact distinct count
    (HLL lgK=12 gives ~1.6% standard error), so a broken merge or
    estimator fails the hash even though the estimate itself is not
    SQL-reproducible.
    Ref: ApproximateSetAggregation.java, MergeHyperLogLogAggregation.java."""
    from trino_private_spark.functions.sketches import (
        hll_cardinality,
        merge_hll,
        approx_set,
    )

    t = T(spark, sf_dir)
    per_status = t.orders.groupBy("o_orderstatus").agg(
        approx_set("o_custkey").alias("sk")
    )
    merged = per_status.agg(merge_hll("sk").alias("m")).select(
        hll_cardinality("m").cast("bigint").alias("est")
    )
    direct = t.orders.agg(approx_set("o_custkey").alias("d")).select(
        hll_cardinality("d").cast("bigint").alias("dest")
    )
    exact = t.orders.agg(F.countDistinct("o_custkey").alias("exact"))
    return (
        merged.crossJoin(direct)
        .crossJoin(exact)
        .select(
            (F.abs(F.col("est") - F.col("exact")) / F.col("exact") <= 0.05).alias(
                "merged_ok"
            ),
            (F.abs(F.col("dest") - F.col("exact")) / F.col("exact") <= 0.05).alias(
                "direct_ok"
            ),
        )
    )


@probe(
    "p_approx_most_frequent",
    oracle="""
    SELECT l_returnflag, l_partkey, cnt FROM (
      SELECT l_returnflag, l_partkey, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY COUNT(*) DESC, l_partkey) AS rnk
      FROM lineitem GROUP BY l_returnflag, l_partkey)
    WHERE rnk <= 3
    ORDER BY l_returnflag, cnt DESC, l_partkey
    """,
    tags=("approx",),
)
def p_approx_most_frequent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters per group. Ref: BigintApproximateMostFrequent.java:630.
    Our realization is the exact two-phase count + deterministic top-k
    (functions/sketches.approx_most_frequent), so the probe carries a full
    hash oracle — a strict upgrade over the reference's SpaceSaving
    estimate at equal shuffle cost."""
    from trino_private_spark.functions.sketches import approx_most_frequent

    t = T(spark, sf_dir)
    return approx_most_frequent(
        t.lineitem, "l_partkey", k=3, group_by=["l_returnflag"]
    ).orderBy("l_returnflag", F.col("cnt").desc(), "l_partkey")


@probe(
    "p_setdigest_jaccard",
    oracle="""
    SELECT a.o_orderstatus AS st_a, b.o_orderstatus AS st_b, TRUE AS jaccard_ok
    FROM (SELECT DISTINCT o_orderstatus FROM orders) a
    JOIN (SELECT DISTINCT o_orderstatus FROM orders) b
      ON a.o_orderstatus < b.o_orderstatus
    ORDER BY st_a, st_b
    """,
    tags=("approx",),
)
def p_setdigest_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SetDigest jaccard_index between per-status customer sets, checked
    per pair against the EXACT Jaccard computed relationally (distinct-set
    intersection join).  64 MinHash rows give sigma ~= 0.125; the oracle
    asserts every estimate lands within 0.2 of truth — the signature is
    seed-fixed so the check is deterministic.
    Ref: setdigest/SetDigestFunctions.java (jaccard_index,
    intersection_cardinality)."""
    from trino_private_spark.functions.sketches import jaccard_index, setdigest_agg

    t = T(spark, sf_dir)
    sigs = t.orders.groupBy("o_orderstatus").agg(
        setdigest_agg(F.col("o_custkey")).alias("sig"),
        F.countDistinct("o_custkey").alias("card"),
    )
    # the signature frame is tiny by construction (one row per distinct
    # o_orderstatus — 3 in TPC-H) but its pandas-UDAF subtree is the
    # expensive part of this probe; under the a x b self-join Spark
    # evaluated it TWICE. Materialize it once and self-join the local
    # rows — per-invocation computation, not a cross-run cache.
    sigs = spark.createDataFrame(sigs.collect(), sigs.schema)
    a = sigs.select(
        F.col("o_orderstatus").alias("st_a"),
        F.col("sig").alias("sig_a"),
        F.col("card").alias("card_a"),
    )
    b = sigs.select(
        F.col("o_orderstatus").alias("st_b"),
        F.col("sig").alias("sig_b"),
        F.col("card").alias("card_b"),
    )
    est = a.join(b, F.col("st_a") < F.col("st_b")).select(
        "st_a",
        "st_b",
        "card_a",
        "card_b",
        jaccard_index(F.col("sig_a"), F.col("sig_b")).alias("j_est"),
    )
    # exact jaccard: |A n B| via a distinct-key self-join per status pair
    sets = t.orders.select("o_orderstatus", "o_custkey").distinct()
    inter = (
        sets.select(F.col("o_orderstatus").alias("st_a"), "o_custkey")
        .join(
            sets.select(F.col("o_orderstatus").alias("st_b"), "o_custkey"),
            "o_custkey",
        )
        .where(F.col("st_a") < F.col("st_b"))
        .groupBy("st_a", "st_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        est.join(inter, ["st_a", "st_b"], "left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
        .select(
            "st_a",
            "st_b",
            (
                F.abs(
                    F.col("j_est")
                    - F.col("n_inter")
                    / (F.col("card_a") + F.col("card_b") - F.col("n_inter"))
                )
                <= 0.2
            ).alias("jaccard_ok"),
        )
        .orderBy("st_a", "st_b")
    )


@probe(
    "p_quantile_sketch",
    oracle="""
    SELECT o_orderstatus, TRUE AS p50_ok, TRUE AS p90_ok
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("approx",),
)
def p_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable t-digest column (functions/tdigest.py): per-status binary
    sketches via the two-phase mapInPandas/applyInPandas path, quantiles
    extracted and checked against the EXACT empirical rank relationally —
    the oracle asserts the rank error stays inside the digest's bound
    (adaptive for small groups: max(0.01, 2/n)).
    Ref: TDigestFunctions.java:39, TDigestAggregationFunction.java."""
    from trino_private_spark.functions.tdigest import tdigest_agg, value_at_quantile

    t = T(spark, sf_dir)
    sk = tdigest_agg(t.orders, "o_totalprice", ["o_orderstatus"])
    est = sk.select(
        "o_orderstatus",
        value_at_quantile(F.col("tdigest"), 0.5).alias("e50"),
        value_at_quantile(F.col("tdigest"), 0.9).alias("e90"),
    )
    joined = t.orders.join(F.broadcast(est), "o_orderstatus")
    bound = F.greatest(F.lit(0.01), 2.0 / F.count("*"))
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            (
                F.abs(
                    F.avg((F.col("o_totalprice") <= F.col("e50")).cast("double")) - 0.5
                )
                <= bound
            ).alias("p50_ok"),
            (
                F.abs(
                    F.avg((F.col("o_totalprice") <= F.col("e90")).cast("double")) - 0.9
                )
                <= bound
            ).alias("p90_ok"),
        )
        .orderBy("o_orderstatus")
    )


@probe(
    "p_tablesample_bounds",
    oracle="SELECT TRUE AS in_bounds",
    tags=("approx",),
)
def p_tablesample_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TABLESAMPLE BERNOULLI (SampleNode.java:38-41) — nondeterministic, so
    the probe emits the row-count-within-3-sigma boolean."""
    t = T(spark, sf_dir)
    total = t.orders.count()
    sampled = t.orders.sample(fraction=0.1, seed=42).count()
    import math

    sigma = math.sqrt(total * 0.1 * 0.9)
    ok = abs(sampled - total * 0.1) <= 4 * sigma
    return spark.createDataFrame([(bool(ok),)], "in_bounds boolean")


@probe(
    "p_kll_quantile",
    oracle="""
    SELECT o_orderstatus, TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS rank_ok
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("approx",),
)
def p_kll_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable KLL sketch column (functions/kll.py — the real
    qdigest-family aggregate, QuantileDigestAggregationFunction /
    QuantileDigestFunctions.java): per-status binary sketches via the
    two-phase mapInPandas/applyInPandas path; value_at_quantile estimates
    checked against the EXACT empirical rank relationally, and
    quantile_at_value(median estimate) must sit near 0.5."""
    from trino_private_spark.functions.kll import (
        kll_agg,
        kll_quantile_at_value,
        kll_value_at_quantile,
    )

    t = T(spark, sf_dir)
    sk = kll_agg(t.orders, "o_totalprice", ["o_orderstatus"])
    est = sk.select(
        "o_orderstatus",
        kll_value_at_quantile(F.col("kll"), 0.5).alias("e50"),
        kll_value_at_quantile(F.col("kll"), 0.9).alias("e90"),
        kll_quantile_at_value(F.col("kll"), 300000.0).alias("r300k"),
    )
    joined = t.orders.join(F.broadcast(est), "o_orderstatus")
    bound = F.greatest(F.lit(0.015), 2.0 / F.count("*"))
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            (
                F.abs(
                    F.avg((F.col("o_totalprice") <= F.col("e50")).cast("double")) - 0.5
                )
                <= bound
            ).alias("p50_ok"),
            (
                F.abs(
                    F.avg((F.col("o_totalprice") <= F.col("e90")).cast("double")) - 0.9
                )
                <= bound
            ).alias("p90_ok"),
            (
                F.abs(
                    F.avg((F.col("o_totalprice") < 300000.0).cast("double"))
                    - F.first("r300k")
                )
                <= bound
            ).alias("rank_ok"),
        )
        .orderBy("o_orderstatus")
    )


@probe(
    "p_space_saving_exact",
    oracle="""
    SELECT o_orderpriority AS item, CAST(COUNT(*) AS BIGINT) AS est,
           CAST(0 AS BIGINT) AS err,
           CAST(ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, o_orderpriority) AS INT) AS rank
    FROM orders GROUP BY o_orderpriority ORDER BY rank
    """,
    tags=("approx",),
)
def p_space_saving_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_most_frequent via the real SpaceSaving sketch
    (functions/spacesaving.py — BigintApproximateMostFrequent.java's
    ApproximateMostFrequentHistogram).  With capacity above the distinct
    count the sketch is EXACT (zero error), so this probe carries a full
    hash oracle: top-5 priorities with their true counts."""
    from trino_private_spark.functions.spacesaving import approx_most_frequent_sketch

    t = T(spark, sf_dir)
    return approx_most_frequent_sketch(
        t.orders, "o_orderpriority", buckets=5, capacity=32
    ).orderBy("rank")


@probe(
    "p_space_saving_bounds",
    oracle="SELECT TRUE AS overestimates, TRUE AS bound_ok, TRUE AS n_ok",
    tags=("approx",),
)
def p_space_saving_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpaceSaving under truncation (capacity 64 << distinct custkeys):
    the classic invariants are checked RELATIONALLY against exact counts —
    every estimate overestimates, and the slack is bounded by
    n/capacity."""
    from trino_private_spark.functions.spacesaving import approx_most_frequent_sketch

    t = T(spark, sf_dir)
    n = t.orders.count()
    sk = approx_most_frequent_sketch(
        t.orders, "o_custkey", buckets=64, capacity=64
    )
    exact = t.orders.groupBy(F.col("o_custkey").cast("string").alias("item")).agg(
        F.count(F.lit(1)).alias("true_cnt")
    )
    joined = sk.join(F.broadcast(exact), "item", "left").fillna(0, ["true_cnt"])
    return joined.agg(
        F.min(F.col("est") >= F.col("true_cnt")).alias("overestimates"),
        F.min((F.col("est") - F.col("true_cnt")) <= (n / 64 + 1)).alias("bound_ok"),
        (F.count(F.lit(1)) == 64).alias("n_ok"),
    )


@probe(
    "p_weighted_percentile",
    oracle="""
    SELECT o_orderstatus, TRUE AS w50_ok, TRUE AS w90_ok
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("approx",),
)
def p_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEIGHTED approx_percentile(x, w, p) (FunctionRegistry.java:435-443
    weighted variants; TDigestAggregationFunction weighted input): weight =
    multiplicity.  Estimates are checked against the exact WEIGHTED rank
    computed relationally — sum(w FILTER x <= est) / sum(w) must sit within
    the digest bound of p."""
    from trino_private_spark.functions.tdigest import tdigest_agg, value_at_quantile

    t = T(spark, sf_dir)
    weighted = t.orders.withColumn("wgt", (F.col("o_custkey") % 5 + 1).cast("double"))
    sk = tdigest_agg(weighted, "o_totalprice", ["o_orderstatus"], weight_col="wgt")
    est = sk.select(
        "o_orderstatus",
        value_at_quantile(F.col("tdigest"), 0.5).alias("e50"),
        value_at_quantile(F.col("tdigest"), 0.9).alias("e90"),
    )
    joined = weighted.join(F.broadcast(est), "o_orderstatus")
    wsum = F.sum("wgt")
    bound = F.lit(0.015)
    return (
        joined.groupBy("o_orderstatus")
        .agg(
            (
                F.abs(
                    F.sum(F.when(F.col("o_totalprice") <= F.col("e50"), F.col("wgt")).otherwise(0.0)) / wsum
                    - 0.5
                )
                <= bound
            ).alias("w50_ok"),
            (
                F.abs(
                    F.sum(F.when(F.col("o_totalprice") <= F.col("e90"), F.col("wgt")).otherwise(0.0)) / wsum
                    - 0.9
                )
                <= bound
            ).alias("w90_ok"),
        )
        .orderBy("o_orderstatus")
    )
