"""Map-valued and generic-reduce aggregates.

Covers the last §2.3 registry entries without probes: `map_agg`,
`multimap_agg`, `map_union` (FunctionRegistry.java:582-584, aggregation/
MapAggAggregationFunction / MultimapAggAggregationFunction /
MapUnionAggregation), `reduce_agg` (FunctionRegistry.java:583,
ReduceAggregationFunction.java), and `numeric_histogram`
(DoubleHistogramAggregation.java:465).

Maps hash-stringify differently across engines (pandas dicts vs DuckDB
MAPs, unordered), so every probe materializes the REAL Spark map — via
map_from_entries / map_concat — and then flattens it to a sorted
`k=v`-joined string for the oracle hash; the DuckDB side builds the same
string from sorted lists. The map construction is what's under test; the
string is just a stable wire format.

Scale notes per probe; the common theme is that every map is built AFTER a
grouped pre-aggregation, so the collect_list feeding map_from_entries holds
one entry per distinct key (bounded, small), never one per input row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


def _kv(entry_struct: F.Column) -> F.Column:
    """map_entries struct -> 'key=value' string (value rendered as bigint)."""
    return F.concat(
        entry_struct["key"], F.lit("="), entry_struct["value"].cast("string")
    )


def _flatten_map(m) -> F.Column:
    """Map column -> deterministic 'k1=v1,k2=v2' string, entries sorted."""
    return F.array_join(F.array_sort(F.transform(F.map_entries(m), _kv)), ",")


@probe(
    "p_map_agg",
    oracle="""
    SELECT o_orderstatus,
           array_to_string(
             list_sort(list(o_orderpriority || '=' || CAST(cnt AS VARCHAR))),
             ',') AS kv
    FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
          FROM orders GROUP BY 1, 2)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("functions",),
)
def p_map_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_agg(k, v) ≡ map_from_entries(collect_list(struct(k, v))) — keys
    made unique by the pre-aggregation, as Trino requires. The inner
    count shuffles on (status, priority) ~ a few dozen pairs; the map
    assembly sees one row per pair. Ref: FunctionRegistry.java:582."""
    t = T(spark, sf_dir)
    per_key = (
        t.orders.groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        per_key.groupBy("o_orderstatus")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("o_orderpriority", "cnt"))
            ).alias("m")
        )
        .select("o_orderstatus", _flatten_map("m").alias("kv"))
        .orderBy("o_orderstatus")
    )


@probe(
    "p_multimap_agg",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderstatus || ':' || ks)), ';')
             AS mm
    FROM (
      SELECT o_custkey, o_orderstatus,
             array_to_string(list_sort(list(CAST(o_orderkey AS VARCHAR))), ',')
               AS ks
      FROM orders GROUP BY 1, 2)
    GROUP BY o_custkey ORDER BY o_custkey LIMIT 100
    """,
    tags=("functions",),
)
def p_multimap_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimap_agg(k, v) ≡ map key -> array of values: pre-group by
    (group, key) collecting the value array, then map_from_entries per
    group. Values sorted inside each key for determinism (Trino's order is
    arrival order — unstable). Ref: FunctionRegistry.java:584."""
    t = T(spark, sf_dir)
    per_key = (
        t.orders.groupBy("o_custkey", "o_orderstatus")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list(F.col("o_orderkey").cast("string"))),
                ",",
            ).alias("ks")
        )
    )
    return (
        per_key.groupBy("o_custkey")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("o_orderstatus", "ks"))
            ).alias("m")
        )
        .select(
            "o_custkey",
            F.array_join(
                F.array_sort(
                    F.transform(
                        F.map_entries("m"),
                        lambda e: F.concat(e["key"], F.lit(":"), e["value"]),
                    )
                ),
                ";",
            ).alias("mm"),
        )
        .orderBy("o_custkey")
        .limit(100)
    )


@probe(
    "p_map_union",
    oracle="""
    SELECT array_to_string(
             list_sort(list(k || '=' || CAST(s AS VARCHAR))), ',') AS kv
    FROM (SELECT l_returnflag || l_linestatus AS k,
                 CAST(SUM(l_quantity) AS BIGINT) AS s
          FROM lineitem GROUP BY 1)
    """,
    tags=("functions",),
)
def p_map_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_union: merge single-entry maps across rows into one map via
    aggregate(collect_list(m), map(), map_concat). Keys are disjoint by
    construction (Trino keeps an arbitrary value on collision — not
    reproducible, so the probe avoids it; Spark's default
    mapKeyDedupPolicy=EXCEPTION would throw, a semantics trap noted in
    test_semantics). The rows entering the merge are one per distinct key
    (4 flags x 2 statuses), post-aggregation — the HOF never sees fact
    rows. Ref: FunctionRegistry.java:583, MapUnionAggregation.java."""
    t = T(spark, sf_dir)
    maps = (
        t.lineitem.groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").cast("bigint").alias("s"))
        .select(
            F.create_map(
                F.concat("l_returnflag", "l_linestatus"), F.col("s")
            ).alias("m")
        )
    )
    merged = maps.agg(
        F.aggregate(
            F.collect_list("m"),
            F.expr("map()").cast("map<string,bigint>"),
            lambda acc, x: F.map_concat(acc, x),
        ).alias("m")
    )
    return merged.select(_flatten_map("m").alias("kv"))


@probe(
    "p_reduce_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
                AS BIGINT) AS ssq
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("functions",),
)
def p_reduce_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduce_agg(x, s0, input_fn, combine_fn) — generic fold aggregate,
    probed as sum-of-squares over exact bigints (float folds are
    order-sensitive; Trino demands commutative/associative fns for the same
    reason). This HOF-over-collect_list form is the semantics oracle; the
    production path for a reduce whose combine is associative is a pandas
    UDAF / Aggregator with partial states per partition (extensions.py
    CustomSum shows the shape), so no group's values ever materialize as
    one array. Ref: FunctionRegistry.java:583, ReduceAggregationFunction."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.aggregate(
                F.collect_list(F.col("l_quantity").cast("bigint")),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x * x,
            ).alias("ssq")
        )
        .orderBy("l_returnflag")
    )


@probe(
    "p_numeric_histogram",
    oracle="""
    SELECT CASE WHEN l_extendedprice >= 120000 THEN 11
                ELSE 1 + CAST(FLOOR(l_extendedprice * 10 / 120000) AS BIGINT)
           END AS wb,
           COUNT(*) AS c,
           ROUND(SUM(l_extendedprice), 2) AS s
    FROM lineitem GROUP BY 1 ORDER BY 1
    """,
    tags=("functions",),
)
def p_numeric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numeric_histogram(buckets, x) — Trino's is a streaming 1-D clusterer
    (value-dependent centroids, not reproducible across engines); the
    deterministic equivalent is a fixed-bin width_bucket histogram carrying
    each bin's count and mass. Single scan, partial-aggregated on ≤12
    bucket ids. Ref: DoubleHistogramAggregation.java:465."""
    t = T(spark, sf_dir)
    return (
        t.lineitem.select(
            F.width_bucket(
                "l_extendedprice", F.lit(0.0), F.lit(120000.0), F.lit(10)
            ).alias("wb"),
            "l_extendedprice",
        )
        .groupBy("wb")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.round(F.sum("l_extendedprice"), 2).alias("s"),
        )
        .orderBy("wb")
    )


@probe(
    "p_numeric_histogram_sketch",
    oracle="SELECT TRUE AS bins_ok, TRUE AS weight_ok, TRUE AS mean_ok, TRUE AS range_ok",
    tags=("aggregate",),
)
def p_numeric_histogram_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL numeric_histogram sketch (NumericHistogram.java greedy
    closest-adjacent-pair merging, two-phase partial/final like
    DoubleHistogramAggregation) over o_totalprice.  Bucket values depend
    on partition boundaries, so the oracle gates the algorithm's exact
    invariants instead: bucket count at capacity, total weight equals the
    row count exactly, the weighted mean is preserved exactly (the merge
    rule is a weighted average), and every bucket sits inside the data
    range."""
    from trino_private_spark.functions.sketches import numeric_histogram

    t = T(spark, sf_dir)
    h = numeric_histogram(t.orders, "o_totalprice", buckets=10)
    stats = t.orders.agg(
        F.count("o_totalprice").alias("n"),
        F.avg("o_totalprice").alias("m"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    ).collect()[0]
    total_w = sum(h.values())
    wmean = sum(v * w for v, w in h.items()) / total_w
    return spark.createDataFrame(
        [(
            0 < len(h) <= 10,
            abs(total_w - stats["n"]) < 1e-6,
            abs(wmean - stats["m"]) < 1e-6 * max(1.0, abs(stats["m"])),
            min(h) >= stats["lo"] - 1e-9 and max(h) <= stats["hi"] + 1e-9,
        )],
        "bins_ok boolean, weight_ok boolean, mean_ok boolean, range_ok boolean",
    )
