"""Aggregation probes: hash agg, grouping sets, distinct aggs, agg functions.

Covers SURVEY.md §2.1 #4-8 and §2.3 (aggregate function families).
Spark's HashAggregateExec performs partial (map-side) + final aggregation
automatically — the analogue of the reference's
HashAggregationOperator.java:1 PARTIAL/FINAL steps, and the property that
makes these scale: only one group-row per partition crosses the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.relational import dround


@probe(
    "p_hashagg",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("bench", "core"),
)
def p_hashagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: hash group-by with partial+final steps.
    Ref: operator/HashAggregationOperator.java:1."""
    li = T(spark, sf_dir).lineitem
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            dround(F.avg("l_quantity"), 6).alias("avg_qty"),
            dround(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # Total order without a RangePartitioning exchange: the group domain
        # is bounded (returnflag in {A,N,R} x linestatus in {F,O} -> <= 6
        # rows at ANY scale factor), so a single-partition local sort is
        # equivalent to the global sort and skips the range-sampling job +
        # exchange (guide §2.4; measured 0.66 -> 0.41 s fresh-plan at sf0.1).
        .coalesce(1)
        .sortWithinPartitions("l_returnflag", "l_linestatus")
    )


@probe(
    "p_globalagg",
    oracle="""
    SELECT COUNT(*) AS n, ROUND(SUM(o_totalprice), 2) AS s,
           ROUND(MIN(o_totalprice), 2) AS mn, ROUND(MAX(o_totalprice), 2) AS mx
    FROM orders
    """,
    tags=("core",),
)
def p_globalagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped (global) aggregation. Ref: operator/AggregationOperator.java:1."""
    t = T(spark, sf_dir)
    return t.orders.agg(
        F.count(F.lit(1)).alias("n"),
        dround(F.sum("o_totalprice"), 2).alias("s"),
        dround(F.min("o_totalprice"), 2).alias("mn"),
        dround(F.max("o_totalprice"), 2).alias("mx"),
    )


# --- GROUPING SETS / ROLLUP / CUBE (GroupIdOperator.java:1) -----------------


_GS_ORACLE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


@probe("p_groupingsets", oracle=_GS_ORACLE, tags=("core",))
def p_groupingsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS -> Catalyst Expand node (one row copy per set).
    Ref: operator/GroupIdOperator.java:1."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@probe(
    "p_rollup",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("core",),
)
def p_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP via the DataFrame API. Ref: operator/GroupIdOperator.java:1."""
    t = T(spark, sf_dir)
    return (
        t.orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@probe(
    "p_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS c FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
    tags=("core",),
)
def p_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE via the DataFrame API. Ref: operator/GroupIdOperator.java:1."""
    t = T(spark, sf_dir)
    return (
        t.orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# --- multi-DISTINCT (MarkDistinctOperator.java:1) ---------------------------


@probe(
    "p_multidistinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS cc,
           COUNT(DISTINCT o_orderpriority) AS cp
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("core",),
)
def p_multidistinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two DISTINCT aggregates in one query -> Catalyst RewriteDistinctAggregates
    (Expand-based, same trick as the reference's MarkDistinctOperator.java:1)."""
    t = T(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("cc"),
            F.countDistinct("o_orderpriority").alias("cp"),
        )
        .orderBy("o_orderstatus")
    )


# --- aggregate function families (§2.3) -------------------------------------


@probe(
    "p_countif",
    oracle="""
    SELECT COUNT(*) FILTER (WHERE o_totalprice > 100000) AS big,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS fin
    FROM orders
    """,
    tags=("functions",),
)
def p_countif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count_if / FILTER clause (reference ImplementFilteredAggregations rule;
    aggregation/CountIfAggregation.java)."""
    t = T(spark, sf_dir)
    return t.orders.agg(
        F.count_if(F.col("o_totalprice") > 100000).alias("big"),
        F.count_if(F.col("o_orderstatus") == "F").alias("fin"),
    )


@probe(
    "p_boolagg",
    oracle="""
    SELECT bool_and(o_totalprice > 0) AS ba, bool_or(o_orderstatus = 'F') AS bo
    FROM orders
    """,
    tags=("functions",),
)
def p_boolagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bool_and / bool_or / every. Ref: aggregation/BooleanAndAggregation.java."""
    t = T(spark, sf_dir)
    return t.orders.agg(
        F.bool_and(F.col("o_totalprice") > 0).alias("ba"),
        F.bool_or(F.col("o_orderstatus") == "F").alias("bo"),
    )


@probe(
    "p_minmaxby",
    oracle="""
    SELECT o_orderstatus,
           max_by(o_orderkey, o_totalprice) AS top_order,
           min_by(o_orderkey, o_totalprice) AS bottom_order
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("functions",),
)
def p_minmaxby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by. Ref: aggregation/minmaxby/ (FunctionRegistry.java:598-599).
    o_totalprice values are distinct-enough in fixtures to make this
    deterministic (2-decimal prices over a large range)."""
    t = T(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("top_order"),
            F.min_by("o_orderkey", "o_totalprice").alias("bottom_order"),
        )
        .orderBy("o_orderstatus")
    )


@probe(
    "p_statsagg",
    oracle="""
    WITH m AS (SELECT AVG(o_totalprice) AS mu, COUNT(*) AS n FROM orders),
    cm AS (SELECT AVG(POWER(o_totalprice - mu, 2)) AS m2,
                  AVG(POWER(o_totalprice - mu, 3)) AS m3,
                  AVG(POWER(o_totalprice - mu, 4)) AS m4
           FROM orders, m)
    SELECT ROUND(stddev_pop(o_totalprice), 4) AS sd,
           ROUND(var_samp(o_totalprice), 2) AS vs,
           (SELECT ROUND(m3 / POWER(m2, 1.5), 6) FROM cm) AS sk,
           (SELECT ROUND(m4 / POWER(m2, 2) - 3, 6) FROM cm) AS ku
    FROM orders
    """,
    tags=("functions",),
)
def p_statsagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (central moments).
    Ref: aggregation/VarianceAggregation.java, CentralMomentsAggregation.java.
    Spark's skewness/kurtosis are the *population* g1/g2 statistics; DuckDB's
    builtins are bias-corrected sample statistics, so the oracle computes the
    population forms from explicit two-pass central moments."""
    t = T(spark, sf_dir)
    return t.orders.agg(
        F.round(F.stddev_pop("o_totalprice"), 4).alias("sd"),
        F.round(F.var_samp("o_totalprice"), 2).alias("vs"),
        F.round(F.skewness("o_totalprice"), 6).alias("sk"),
        F.round(F.kurtosis("o_totalprice"), 6).alias("ku"),
    )


@probe(
    "p_corr",
    oracle="""
    SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS r,
           ROUND(covar_pop(l_quantity, l_extendedprice), 2) AS cv,
           ROUND(regr_slope(l_extendedprice, l_quantity), 4) AS sl
    FROM lineitem
    """,
    tags=("functions",),
)
def p_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate stats: corr/covar/regr_slope.
    Ref: FunctionRegistry.java:467-472."""
    li = T(spark, sf_dir).lineitem
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("r"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 2).alias("cv"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("sl"),
    )


@probe(
    "p_listagg",
    oracle="""
    SELECT o_custkey,
           array_to_string(list_sort(list(o_orderstatus)), ',') AS statuses
    FROM orders GROUP BY o_custkey ORDER BY o_custkey LIMIT 100
    """,
    tags=("functions",),
)
def p_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """listagg / array_agg with deterministic ORDER BY inside the aggregate.
    Ref: aggregation/listagg/ListaggAggregationFunction.java, arrayagg/."""
    t = T(spark, sf_dir)
    return (
        t.orders.groupBy("o_custkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("o_orderstatus")), ",").alias(
                "statuses"
            )
        )
        .orderBy("o_custkey")
        .limit(100)
    )


@probe(
    "p_bitagg",
    oracle="""
    SELECT bit_and(o_orderkey) AS ba, bit_or(o_orderkey) AS bo
    FROM orders WHERE o_orderkey <= 64
    """,
    tags=("functions",),
)
def p_bitagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bitwise_and_agg / bitwise_or_agg (Trino names) -> bit_and/bit_or.
    Ref: FunctionRegistry.java:473-474."""
    t = T(spark, sf_dir)
    return t.orders.where(F.col("o_orderkey") <= 64).agg(
        F.bit_and("o_orderkey").alias("ba"), F.bit_or("o_orderkey").alias("bo")
    )


@probe(
    "p_geomean",
    oracle="""
    SELECT ROUND(EXP(AVG(LN(o_totalprice))), 4) AS gm
    FROM orders WHERE o_totalprice > 0
    """,
    tags=("functions",),
)
def p_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geometric_mean ≡ exp(avg(ln(x))). Ref: FunctionRegistry.java:456."""
    t = T(spark, sf_dir)
    return (
        t.orders.where(F.col("o_totalprice") > 0)
        .agg(F.round(F.exp(F.avg(F.log("o_totalprice"))), 4).alias("gm"))
    )


@probe(
    "p_percentile",
    oracle="""
    SELECT ROUND(quantile_cont(o_totalprice, 0.5), 4) AS med,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90
    FROM orders
    """,
    tags=("functions",),
)
def p_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile (continuous interpolation). Approximate variants
    (approx_percentile / qdigest / tdigest) are property-tested instead —
    SURVEY.md §2.3. Ref: FunctionRegistry.java:435-443."""
    t = T(spark, sf_dir)
    return t.orders.agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("med"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
    )


@probe(
    "p_anyvalue",
    oracle="""
    SELECT o_orderstatus, MIN(o_orderkey) AS one_key
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("functions",),
)
def p_anyvalue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arbitrary/any_value — nondeterministic by definition, so the probe pins
    it with MIN to stay oracle-checkable; any_value itself is exercised in
    unit tests. Ref: FunctionRegistry.java:596."""
    t = T(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(F.min("o_orderkey").alias("one_key"))
        .orderBy("o_orderstatus")
    )


@probe(
    "p_histogram_agg",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS c
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    tags=("functions",),
)
def p_histogram_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram(x) ≡ map<value,count>; probed as its flattened form (the map
    itself is order-unstable across engines). Ref: FunctionRegistry.java:594."""
    li = T(spark, sf_dir).lineitem
    return li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("c")).orderBy(
        "l_returnflag"
    )


@probe(
    "p_array_agg_ordered",
    oracle="""
    SELECT o_custkey,
           array_to_string(array_agg(o_orderstatus ORDER BY o_orderdate, o_orderkey), ',') AS statuses,
           array_to_string(array_agg(CAST(o_orderkey AS VARCHAR) ORDER BY o_totalprice DESC, o_orderkey), ',') AS keys_by_price
    FROM orders WHERE o_custkey <= 150
    GROUP BY o_custkey ORDER BY o_custkey
    """,
    tags=("aggregates",),
)
def p_array_agg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_agg(x ORDER BY y) (AggregationNode ORDER BY inside agg args,
    AggregationNode.java:84): Spark has no ordered collect, so the rewrite
    is sort_array(collect_list(struct(sortkeys..., x))).x — deterministic
    and shuffle-identical to plain collect_list."""
    t = T(spark, sf_dir)
    by_date = F.transform(
        F.array_sort(
            F.collect_list(F.struct("o_orderdate", "o_orderkey", "o_orderstatus"))
        ),
        lambda s: s["o_orderstatus"],
    )
    by_price = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    (-F.col("o_totalprice")).alias("np"),
                    "o_orderkey",
                    F.col("o_orderkey").cast("string").alias("ks"),
                )
            )
        ),
        lambda s: s["ks"],
    )
    return (
        t.orders.where(F.col("o_custkey") <= 150)
        .groupBy("o_custkey")
        .agg(
            F.array_join(by_date, ",").alias("statuses"),
            F.array_join(by_price, ",").alias("keys_by_price"),
        )
        .orderBy("o_custkey")
    )


@probe(
    "p_distinct_filter_agg",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) FILTER (WHERE o_totalprice > 200000) AS BIGINT) AS rich_custs,
           CAST(COUNT(DISTINCT o_orderpriority) FILTER (WHERE o_orderkey % 2 = 0) AS BIGINT) AS even_prios,
           CAST(SUM(o_orderkey) FILTER (WHERE o_custkey % 10 = 0) AS BIGINT) AS decile_keysum
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
    tags=("aggregates",),
)
def p_distinct_filter_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT + FILTER combined on one aggregate
    (ImplementFilteredAggregations.java + RewriteDistinctAggregates):
    count(DISTINCT x) FILTER (WHERE p) compiles through Catalyst's Expand
    path; mixed with a plain filtered SUM in the same aggregation."""
    t = T(spark, sf_dir)
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.count_distinct(
                F.when(F.col("o_totalprice") > 200000, F.col("o_custkey"))
            ).alias("rich_custs"),
            F.count_distinct(
                F.when(F.col("o_orderkey") % 2 == 0, F.col("o_orderpriority"))
            ).alias("even_prios"),
            F.sum(
                F.when(F.col("o_custkey") % 10 == 0, F.col("o_orderkey"))
            ).alias("decile_keysum"),
        )
        .orderBy("o_orderstatus")
    )
