"""Round-11 probes: the documented-aggregate SQL-TEXT surface (tier-2
reachability — VERDICT r10 What's missing #1-3) plus the geometry_union
wrong-result fix and the checksum collision-class fix.

Every probe here drives the TRANSLATED SQL-text path (Engine.sql /
translate + spark.sql) — the DataFrame builders already carry probes; what
round 10 showed is that green builders can hide an unreachable or wrong
SQL plane, so these pin the exact spellings a reference user types.

Determinism notes: map-valued results never hash raw maps (engine map
ordering differs) — probes extract per-key scalars, cardinalities, or
bounds-checked booleans, per FIXTURES.md conventions."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from trino_private_spark.queries import T, probe


def _eng(spark: SparkSession):
    from trino_private_spark.api import Engine

    return Engine(spark)


@probe(
    "p_map_agg_sql",
    oracle="""
    SELECT o_orderstatus AS st,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nkeys,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
                AS BIGINT) AS urgent
    FROM orders GROUP BY o_orderstatus ORDER BY st
    """,
    tags=("functions", "sqltext"),
)
def p_map_agg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_agg as SQL TEXT (docs/functions/map.rst; the DataFrame probe is
    p_map_agg) — keys made unique by the inner pre-aggregation, so the
    first-wins dedupe is value-deterministic. Ref:
    MapAggregationFunction.java / FunctionRegistry.java:582."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT st,
               CAST(cardinality(map_agg(prio, cnt)) AS BIGINT) AS nkeys,
               element_at(map_agg(prio, cnt), '1-URGENT') AS urgent
        FROM (SELECT o_orderstatus AS st, o_orderpriority AS prio,
                     COUNT(*) AS cnt
              FROM r11_orders GROUP BY 1, 2)
        GROUP BY st ORDER BY st
        """
    )


@probe(
    "p_histogram_sql",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nkeys,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
                AS BIGINT) AS urgent
    FROM orders
    """,
    tags=("functions", "sqltext"),
)
def p_histogram_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """histogram(x) as SQL TEXT — value->count map over the whole input
    (docs/functions/aggregate.rst; Histogram.java). Counts are exact, so
    per-key extraction is a full-strength oracle."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT CAST(cardinality(histogram(o_orderpriority)) AS BIGINT) AS nkeys,
               element_at(histogram(o_orderpriority), '1-URGENT') AS urgent
        FROM r11_orders
        """
    )


@probe(
    "p_multimap_agg_sql",
    oracle="""
    SELECT o_orderstatus AS st,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nkeys,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END)
                AS BIGINT) AS n_urgent
    FROM orders GROUP BY o_orderstatus ORDER BY st
    """,
    tags=("functions", "sqltext"),
)
def p_multimap_agg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """multimap_agg(k, v) as SQL TEXT — key -> all values
    (MultimapAggregationFunction.java). The per-key list LENGTH is
    order-insensitive, so it oracles exactly."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT o_orderstatus AS st,
               CAST(cardinality(multimap_agg(o_orderpriority, o_orderkey))
                    AS BIGINT) AS nkeys,
               CAST(cardinality(element_at(
                    multimap_agg(o_orderpriority, o_orderkey), '1-URGENT'))
                    AS BIGINT) AS n_urgent
        FROM r11_orders GROUP BY o_orderstatus ORDER BY st
        """
    )


@probe(
    "p_map_union_sql",
    oracle="""
    SELECT CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS nkeys
    FROM orders
    """,
    tags=("functions", "sqltext"),
)
def p_map_union_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_union over per-status priority->count maps (MapUnionAggregation
    .java). The key SET is deterministic; per-key values are 'an arbitrary
    input map's value' in the reference, so only cardinality oracles (the
    first-wins value rule is pinned by tests/test_r11_fixes.py)."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT CAST(cardinality(map_union(m)) AS BIGINT) AS nkeys
        FROM (SELECT o_orderstatus, map_agg(o_orderpriority, cnt) AS m
              FROM (SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
                    FROM r11_orders GROUP BY 1, 2)
              GROUP BY o_orderstatus)
        """
    )


@probe(
    "p_reduce_agg_sql",
    oracle="""
    SELECT o_orderstatus AS st, CAST(SUM(o_orderkey) AS BIGINT) AS tot
    FROM orders GROUP BY o_orderstatus ORDER BY st
    """,
    tags=("functions", "sqltext"),
)
def p_reduce_agg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reduce_agg with the documented bare-0 initial state
    (ReduceAggregationFunction.java; FunctionRegistry.java:583) — the
    integer-literal init widens to BIGINT at translate time."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT o_orderstatus AS st,
               reduce_agg(o_orderkey, 0, (s, x) -> s + x,
                          (a, b) -> a + b) AS tot
        FROM r11_orders GROUP BY o_orderstatus ORDER BY st
        """
    )


@probe(
    "p_approx_set_sql",
    oracle="SELECT TRUE AS within_bounds, TRUE AS nonempty",
    tags=("approx", "sqltext"),
)
def p_approx_set_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documented HLL chain cardinality(merge(approx_set(x))) as SQL
    TEXT (docs/functions/hyperloglog.rst) — per-status sketches merged
    then estimated, bounds-checked against the exact distinct count (the
    TPHL sketch is in its high-accuracy linear-counting regime at these
    cardinalities). `cardinality` resolves through the _FN_TEMPLATES_ALT
    analysis retry."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT abs(CAST(est AS DOUBLE) / CAST(exact AS DOUBLE) - 1.0)
                 <= 0.05 AS within_bounds,
               est > 0 AS nonempty
        FROM (SELECT cardinality(merge(s)) AS est
              FROM (SELECT o_orderstatus, approx_set(o_custkey) AS s
                    FROM r11_orders GROUP BY o_orderstatus))
        CROSS JOIN (SELECT COUNT(DISTINCT o_custkey) AS exact
                    FROM r11_orders)
        """
    )


@probe(
    "p_qdigest_sql",
    oracle="SELECT TRUE AS p50_ok, TRUE AS p90_ok",
    tags=("approx", "sqltext"),
)
def p_qdigest_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """qdigest_agg + value_at_quantile as SQL TEXT (docs/functions/
    qdigest.rst; QuantileDigestAggregationFunction.java) — rank-space
    bounds vs the exact percentile."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT abs(value_at_quantile(qdigest_agg(o_totalprice), 0.5)
                   / exact50 - 1.0) <= 0.05 AS p50_ok,
               abs(value_at_quantile(qdigest_agg(o_totalprice), 0.9)
                   / exact90 - 1.0) <= 0.05 AS p90_ok
        FROM r11_orders
        CROSS JOIN (SELECT percentile(o_totalprice, 0.5) AS exact50,
                           percentile(o_totalprice, 0.9) AS exact90
                    FROM r11_orders)
        GROUP BY exact50, exact90
        """
    )


@probe(
    "p_tdigest_sql",
    oracle="SELECT TRUE AS p50_ok, TRUE AS qv_ok",
    tags=("approx", "sqltext"),
)
def p_tdigest_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tdigest_agg + value_at_quantile + quantile_at_value as SQL TEXT
    (docs/functions/tdigest.rst; TDigestAggregationFunction.java)."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT abs(value_at_quantile(tdigest_agg(o_totalprice), 0.5)
                   / exact50 - 1.0) <= 0.02 AS p50_ok,
               abs(quantile_at_value(tdigest_agg(o_totalprice), exact50)
                   - 0.5) <= 0.02 AS qv_ok
        FROM r11_orders
        CROSS JOIN (SELECT percentile(o_totalprice, 0.5) AS exact50
                    FROM r11_orders)
        GROUP BY exact50
        """
    )


@probe(
    "p_setdigest_sql",
    oracle="""
    WITH a AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'),
         b AS (SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O')
    SELECT CAST((SELECT COUNT(*) FROM a) AS BIGINT) AS card_a,
           ROUND(CAST((SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS DOUBLE)
                 / CAST((SELECT COUNT(*) FROM (SELECT * FROM a UNION SELECT * FROM b)) AS DOUBLE), 6) AS j,
           CAST((SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS BIGINT) AS ic
    """,
    tags=("approx", "sqltext"),
)
def p_setdigest_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """make_set_digest / cardinality / jaccard_index /
    intersection_cardinality as SQL TEXT (docs/functions/setdigest.rst).
    At sf0.01 the digests stay in their EXACT regime (< 8192 distinct), so
    cardinality, jaccard, and intersection oracle EXACTLY against DuckDB
    set algebra — a full-strength hash oracle, not a bounds check."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT cardinality(a) AS card_a,
               round(jaccard_index(a, b), 6) AS j,
               intersection_cardinality(a, b) AS ic
        FROM (SELECT make_set_digest(o_custkey) AS a
              FROM r11_orders WHERE o_orderstatus = 'F')
        CROSS JOIN (SELECT make_set_digest(o_custkey) AS b
                    FROM r11_orders WHERE o_orderstatus = 'O')
        """
    )


@probe(
    "p_approx_most_frequent_sql",
    oracle="""
    SELECT CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
                AS BIGINT) AS urgent,
           CAST(LEAST(COUNT(DISTINCT o_orderpriority), 5) AS BIGINT) AS nkeys
    FROM orders
    """,
    tags=("approx", "sqltext"),
)
def p_approx_most_frequent_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_most_frequent(buckets, value, capacity) as SQL TEXT
    (ApproximateMostFrequentFunction.java). buckets=5 >= the priority
    domain, so every key survives and counts are exact."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT element_at(approx_most_frequent(5, o_orderpriority, 100),
                          '1-URGENT') AS urgent,
               CAST(cardinality(approx_most_frequent(5, o_orderpriority, 100))
                    AS BIGINT) AS nkeys
        FROM r11_orders
        """
    )


@probe(
    "p_numeric_histogram_sql",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS total_weight, TRUE AS bounded
    FROM orders
    """,
    tags=("approx", "sqltext"),
)
def p_numeric_histogram_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """numeric_histogram(buckets, x) as SQL TEXT (DoubleHistogram
    Aggregation.java / NumericHistogram.java). Bucket POSITIONS depend on
    input order; the invariants that don't — total weight preserved
    exactly, bucket count bounded — oracle deterministically."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        SELECT CAST(round(aggregate(map_values(
                   numeric_histogram(10, o_totalprice)),
                   CAST(0 AS DOUBLE), (a, x) -> a + x)) AS BIGINT)
                 AS total_weight,
               cardinality(numeric_histogram(10, o_totalprice)) <= 10
                 AS bounded
        FROM r11_orders
        """
    )


@probe(
    "p_cosine_map",
    oracle="""
    SELECT ROUND((2.0*3.0) / (SQRT(1.0+4.0) * SQRT(9.0+16.0)), 9) AS lit,
           ROUND(1.0, 9) AS self_sim
    """,
    tags=("functions", "sqltext"),
)
def p_cosine_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cosine_similarity over map(varchar,double) — the DOCUMENTED
    signature (MathFunctions.java:1313, key-joined dot product; round-10
    VERDICT What's missing #3: this exact call died DATATYPE_MISMATCH).
    Missing keys contribute zero; a map against itself is 1."""
    return _eng(spark).sql(
        """
        SELECT round(cosine_similarity(
                   MAP(ARRAY['a','b'], ARRAY[1.0, 2.0]),
                   MAP(ARRAY['b','c'], ARRAY[3.0, 4.0])), 9) AS lit,
               round(cosine_similarity(
                   MAP(ARRAY['x','y'], ARRAY[3.0, 4.0]),
                   MAP(ARRAY['x','y'], ARRAY[3.0, 4.0])), 9) AS self_sim
        """
    )


@probe(
    "p_geom_sql_entry",
    oracle="""
    SELECT 'ST_Point' AS typ,
           ROUND(SQRT(CAST(n_nationkey * n_nationkey
                 + n_regionkey * n_regionkey AS DOUBLE)), 6) AS d,
           CAST(1 AS BIGINT) AS np
    FROM nation ORDER BY d, n_nationkey
    """,
    tags=("geometry", "sqltext"),
)
def p_geom_sql_entry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-spelled WKT entry chain — ST_GeometryFromText /
    ST_GeometryType / ST_NumPoints / ST_Distance (GeoFunctions.java
    documented spellings; round-10 VERDICT: ST_GeometryFromText was
    UNRESOLVED_ROUTINE, locking reference geometry SQL out entirely)."""
    t = T(spark, sf_dir)
    t.nation.createOrReplaceTempView("r11_nation")
    return _eng(spark).sql(
        """
        SELECT ST_GeometryType(ST_GeometryFromText(w)) AS typ,
               round(ST_Distance(ST_GeometryFromText(w),
                                 ST_GeometryFromText('POINT (0 0)')), 6) AS d,
               CAST(ST_NumPoints(ST_GeometryFromText(w)) AS BIGINT) AS np
        FROM (SELECT concat('POINT (', CAST(n_nationkey AS VARCHAR), ' ',
                            CAST(n_regionkey AS VARCHAR), ')') AS w,
                     n_nationkey
              FROM r11_nation)
        ORDER BY d, n_nationkey
        """
    )


@probe(
    "p_geometry_union_mixed",
    oracle="""
    SELECT 'POINT (1 2)' AS pts,
           'GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), POINT (5 5))' AS mixed,
           'MULTIPOINT (1 2, 3 4)' AS multi
    """,
    tags=("geometry", "sqltext"),
)
def p_geometry_union_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geometry_union over non-polygon and mixed arrays — the round-10
    CONFIRMED wrong result (What's wrong #1: duplicate points returned
    POLYGON EMPTY). Dimension-bucketed union per GeoFunctions.java
    stUnion:858-902: duplicate points dedupe, interior points absorb into
    polygons, disjoint classes collect."""
    return _eng(spark).sql(
        """
        SELECT ST_AsText(geometry_union(
                 ARRAY[ST_Point(1.0, 2.0), ST_Point(1.0, 2.0)])) AS pts,
               ST_AsText(geometry_union(ARRAY[
                 'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))',
                 'POINT (1 1)', 'POINT (5 5)'])) AS mixed,
               ST_AsText(geometry_union(
                 ARRAY[ST_Point(1.0, 2.0), ST_Point(3.0, 4.0),
                       ST_Point(1.0, 2.0)])) AS multi
        """
    )


@probe(
    "p_geom_agg_sql",
    oracle="""
    SELECT 'MULTIPOINT (0 0, 2 0, 1 2)' AS u,
           'POLYGON ((0 0, 2 0, 1 2, 0 0))' AS h
    """,
    tags=("geometry", "sqltext"),
)
def p_geom_agg_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """geometry_union_agg + convex_hull_agg as SQL TEXT over a sorted
    deterministic point set (aggregation/GeometryUnionAgg.java,
    ConvexHullAggregation.java)."""
    return _eng(spark).sql(
        """
        SELECT ST_AsText(geometry_union_agg(w)) AS u,
               ST_AsText(convex_hull_agg(w)) AS h
        FROM (SELECT concat('POINT (', CAST(x AS VARCHAR), ' ',
                            CAST(y AS VARCHAR), ')') AS w
              FROM (VALUES (0, 0), (2, 0), (1, 2), (0, 0)) AS t(x, y))
        """
    )


@probe(
    "p_ml_sql",
    oracle="SELECT TRUE AS clf_ok, TRUE AS reg_ok",
    tags=("functions", "sqltext"),
)
def p_ml_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """learn_classifier/classify + learn_regressor/regress + features as
    SQL TEXT (docs/functions/ml.rst). A linearly-separable rule derived
    from nation keys must be recovered (accuracy 1.0); the regressor must
    recover an exact linear map within 1e-3 (ridge bias)."""
    t = T(spark, sf_dir)
    t.nation.createOrReplaceTempView("r11_nation")
    return _eng(spark).sql(
        """
        SELECT
          (SELECT avg(CAST((classify(features(CAST(n_nationkey AS DOUBLE)),
                                     m) = CAST(n_nationkey > 12 AS INT))
                      AS DOUBLE))
           FROM r11_nation
           CROSS JOIN (SELECT learn_classifier(
                         CAST(CAST(n_nationkey > 12 AS INT) AS DOUBLE),
                         features(CAST(n_nationkey AS DOUBLE))) AS m
                       FROM r11_nation)) >= 0.95 AS clf_ok,
          (SELECT max(abs(regress(features(CAST(n_nationkey AS DOUBLE)), m)
                          - (3.0 * n_nationkey + 7.0)))
           FROM r11_nation
           CROSS JOIN (SELECT learn_regressor(
                         3.0 * n_nationkey + 7.0,
                         features(CAST(n_nationkey AS DOUBLE))) AS m
                       FROM r11_nation)) <= 0.001 AS reg_ok
        """
    )


@probe(
    "p_checksum_sql",
    oracle="SELECT TRUE AS split_invariant, TRUE AS dup_differs",
    tags=("functions", "sqltext"),
)
def p_checksum_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """checksum — wrapping-SUM semantics (ChecksumAggregationFunction
    .java:124-139; round-10 ADVICE: the xor variant cancelled even
    multiplicities). split_invariant: checksum(A) == combined checksum of
    any 2-way split (additivity). dup_differs: duplicating ONE subset must
    CHANGE the checksum — the exact collision the xor form had
    (checksum([x,x,y]) == checksum([y]))."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("r11_orders")
    return _eng(spark).sql(
        """
        WITH half1 AS (SELECT o_orderkey AS k FROM r11_orders
                       WHERE o_orderkey % 2 = 0),
             half2 AS (SELECT o_orderkey AS k FROM r11_orders
                       WHERE o_orderkey % 2 = 1),
             whole AS (SELECT o_orderkey AS k FROM r11_orders)
        SELECT (SELECT checksum(k) FROM whole) =
               (SELECT checksum(k)
                FROM (SELECT k FROM half1 UNION ALL SELECT k FROM half2))
                 AS split_invariant,
               (SELECT checksum(k) FROM whole) <>
               (SELECT checksum(k)
                FROM (SELECT k FROM whole UNION ALL SELECT k FROM half1
                      UNION ALL SELECT k FROM half1)) AS dup_differs
        """
    )


@probe(
    "p_rpr_window",
    oracle="""
    WITH t AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn,
             CASE WHEN o_totalprice < lag(o_totalprice) OVER w
                  THEN 1 ELSE 0 END AS dec
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), g AS (
      SELECT *, SUM(1 - dec) OVER (PARTITION BY o_custkey ORDER BY rn)
                  AS isl
      FROM t
    )
    SELECT o_custkey, o_orderkey,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey, isl ORDER BY rn
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2)
             AS run_sum
    FROM g WHERE dec = 1
    ORDER BY o_custkey, o_orderkey
    """,
    tags=("window", "sqltext"),
)
def p_rpr_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row pattern recognition in WINDOW structures (sql/pattern-
    recognition-in-window.rst; operators/row_pattern_window.py): per
    customer, the sum of each maximal strictly-decreasing price run
    anchored at the current row (PATTERN (D+), INITIAL, SKIP TO NEXT
    ROW). FULL-strength oracle: DuckDB reproduces the semantics exactly
    with a gaps-and-islands rewrite — every matched row's run sum must
    hash-match."""
    t = T(spark, sf_dir)
    t.orders.createOrReplaceTempView("rpw_orders")
    return _eng(spark).sql(
        """
        SELECT o_custkey, o_orderkey, round(run_sum, 2) AS run_sum
        FROM (
          SELECT o_custkey, o_orderkey, sum(o_totalprice) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
              AFTER MATCH SKIP TO NEXT ROW
              PATTERN (D+)
              DEFINE D AS D.o_totalprice < PREV(D.o_totalprice)
          ) AS run_sum
          FROM rpw_orders
        )
        WHERE run_sum IS NOT NULL
        ORDER BY o_custkey, o_orderkey
        """
    )
