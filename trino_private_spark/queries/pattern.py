"""MATCH_RECOGNIZE probe. DuckDB has no row-pattern matching, but THIS
pattern — greedy ``(up+ down)`` with AFTER MATCH SKIP PAST LAST ROW — has a
closed relational form, so the probe gets a full hash oracle: every maximal
run of consecutive price-rise rows terminated by a price-drop row is
exactly one match (the NFA's failure path consumes one row at a time, so it
can neither split nor merge such runs). Hand-computed NFA expectations live
in tests/test_match_recognize.py as well."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe

_MR_ORACLE = """
WITH base AS (
  SELECT CAST(o_custkey AS VARCHAR) AS cust, o_custkey AS ck, o_orderkey,
         o_totalprice,
         LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pp
  FROM orders WHERE o_custkey <= 200),
flagged AS (
  SELECT *, CASE WHEN pp IS NULL THEN 'N'
                 WHEN o_totalprice > pp THEN 'U'
                 WHEN o_totalprice < pp THEN 'D' ELSE 'N' END AS flag
  FROM base),
bucketed AS (
  SELECT *, COALESCE(COUNT(*) FILTER (WHERE flag <> 'U')
              OVER (PARTITION BY ck ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rs
  FROM flagged),
agg AS (
  SELECT cust, ck, rs,
         COUNT(*) FILTER (WHERE flag = 'U') AS n_up,
         MIN(o_orderkey) FILTER (WHERE flag = 'U') AS start_k,
         MAX(CASE WHEN flag <> 'U' THEN o_orderkey END) AS end_k,
         MAX(CASE WHEN flag <> 'U' THEN flag END) AS term_flag
  FROM bucketed GROUP BY cust, ck, rs)
SELECT cust,
       ROW_NUMBER() OVER (PARTITION BY ck ORDER BY rs) - 1 AS match_id,
       CAST(start_k AS VARCHAR) AS start_val,
       CAST(end_k AS VARCHAR) AS end_val,
       n_up + 1 AS n_rows, n_up, CAST(1 AS BIGINT) AS n_down
FROM agg WHERE n_up >= 1 AND term_flag = 'D'
ORDER BY ck, match_id
"""


@probe("p_match_recognize", oracle=_MR_ORACLE, tags=("custom",))
def p_match_recognize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-pattern matching (SURVEY §2.1 #37, PatternRecognitionNode +
    window/matcher/Matcher.java): find per-customer "rising streak then
    drop" order-value patterns — (up+ down) over order history."""
    from trino_private_spark.operators.match_recognize import (
        Symbol,
        match_recognize,
    )

    t = T(spark, sf_dir)
    orders = t.orders.where(F.col("o_custkey") <= 200).select(
        F.col("o_custkey").cast("string").alias("cust"),
        "o_orderkey",
        "o_totalprice",
    )
    up = Symbol(
        "up",
        lambda cur, prev: prev is not None and cur.o_totalprice > prev.o_totalprice,
        "+",
    )
    down = Symbol(
        "down",
        lambda cur, prev: prev is not None and cur.o_totalprice < prev.o_totalprice,
        "1",
    )
    return match_recognize(
        orders,
        partition_by=["cust"],
        order_by=["o_orderkey"],
        pattern=[up, down],
        measure_col="o_orderkey",
    ).orderBy(F.col("cust").cast("bigint"), "match_id")


# --------------------------------------------------------------------------
# General row-pattern engine probes (operators/row_pattern.py — alternation,
# ranged/reluctant quantifiers, skip modes, ALL ROWS PER MATCH + CLASSIFIER;
# reference Matcher.java / PatternRecognitionAnalyzer.java).  Each pattern
# is chosen to have a closed relational form so DuckDB can oracle the full
# hash: greedy maximal-run semantics turn into gaps-and-islands SQL.
# --------------------------------------------------------------------------


def _mr_base(spark: SparkSession, sf_dir: str):
    t = T(spark, sf_dir)
    return t.orders.where(F.col("o_custkey") <= 300).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )


def _dir_defines():
    from trino_private_spark.operators.row_pattern import nav_shift, vectorized

    # nav_shift + group_safe=True: classification runs once per Spark
    # partition instead of once per group (guide §4.2)
    return {
        "u": vectorized(
            lambda p: p["o_totalprice"] > nav_shift(p, "o_totalprice", 1),
            group_safe=True,
        ),
        "d": vectorized(
            lambda p: p["o_totalprice"] < nav_shift(p, "o_totalprice", 1),
            group_safe=True,
        ),
    }


@probe(
    "p_mr_alternation",
    oracle="""
    WITH seq AS (
      SELECT o_custkey AS ck, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
             CASE WHEN o_totalprice > LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) THEN 'u'
                  WHEN o_totalprice < LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) THEN 'd' END AS dir
      FROM orders WHERE o_custkey <= 300),
    isl AS (
      SELECT ck, dir, rn, rn - ROW_NUMBER() OVER (PARTITION BY ck, dir ORDER BY rn) AS grp
      FROM seq WHERE dir IS NOT NULL),
    runs AS (SELECT ck, dir, COUNT(*) AS len FROM isl GROUP BY ck, dir, grp)
    SELECT ck AS o_custkey,
           CAST(SUM(CASE WHEN dir='u' THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
           CAST(SUM(CASE WHEN dir='d' THEN 1 ELSE 0 END) AS BIGINT) AS n_dn,
           CAST(SUM(CASE WHEN dir='u' THEN len ELSE 0 END) AS BIGINT) AS rows_up,
           CAST(SUM(CASE WHEN dir='d' THEN len ELSE 0 END) AS BIGINT) AS rows_dn
    FROM runs WHERE len >= 2 GROUP BY ck ORDER BY ck
    """,
    tags=("custom",),
)
def p_mr_alternation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern ``u{2,} | d{2,}`` (alternation of unbounded ranged
    quantifiers), SKIP PAST LAST ROW.  Greedy maximal-run consumption makes
    each match exactly one maximal same-direction island of length >= 2."""
    from trino_private_spark.operators.row_pattern import match_recognize_general

    mr = match_recognize_general(
        _mr_base(spark, sf_dir),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        pattern="u{2,} | d{2,}",
        defines=_dir_defines(),
        mode="one",
        measures={"kind": lambda fr, labs: labs[0]},
        measure_schema="kind string",
    )
    k = F.col("kind")
    return (
        mr.groupBy("o_custkey")
        .agg(
            F.sum(F.when(k == "u", 1).otherwise(0)).alias("n_up"),
            F.sum(F.when(k == "d", 1).otherwise(0)).alias("n_dn"),
            F.sum(F.when(k == "u", F.col("n_rows")).otherwise(0)).alias("rows_up"),
            F.sum(F.when(k == "d", F.col("n_rows")).otherwise(0)).alias("rows_dn"),
        )
        .withColumn("o_custkey", F.col("o_custkey").cast("long"))
        .orderBy("o_custkey")
    )


@probe(
    "p_mr_ranged_quantifier",
    oracle="""
    WITH full_seq AS (
      SELECT o_custkey AS ck, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
             CASE WHEN o_totalprice > 250000 THEN 1 ELSE 0 END AS hi
      FROM orders WHERE o_custkey <= 300),
    isl AS (SELECT ck, rn, rn - ROW_NUMBER() OVER (PARTITION BY ck ORDER BY rn) AS grp
            FROM full_seq WHERE hi = 1),
    runs AS (SELECT ck, COUNT(*) AS len FROM isl GROUP BY ck, grp)
    SELECT ck AS o_custkey,
           CAST(SUM((len // 5) + CASE WHEN len % 5 >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
           CAST(SUM(5 * (len // 5) + CASE WHEN len % 5 >= 3 THEN len % 5 ELSE 0 END) AS BIGINT) AS matched_rows
    FROM runs GROUP BY ck
    HAVING SUM((len // 5) + CASE WHEN len % 5 >= 3 THEN 1 ELSE 0 END) > 0
    ORDER BY ck
    """,
    tags=("custom",),
)
def p_mr_ranged_quantifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern ``h{3,5}`` (bounded ranged quantifier), SKIP PAST LAST ROW.
    Greedy chunking of each maximal high-price run of length L yields
    L//5 + (1 if L%5>=3) matches — a closed arithmetic form."""
    from trino_private_spark.operators.row_pattern import match_recognize_general

    mr = match_recognize_general(
        _mr_base(spark, sf_dir),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        pattern="h{3,5}",
        defines={
            "h": __import__(
                "trino_private_spark.operators.row_pattern",
                fromlist=["vectorized"],
            ).vectorized(
                # row-local predicate: safe over stacked groups
                lambda p: p["o_totalprice"] > 250000,
                group_safe=True,
            )
        },
        mode="one",
    )
    return (
        mr.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.sum("n_rows").alias("matched_rows"),
        )
        .withColumn("o_custkey", F.col("o_custkey").cast("long"))
        .orderBy("o_custkey")
    )


@probe(
    "p_mr_skip_to_next",
    oracle="""
    SELECT ck AS o_custkey, CAST(COUNT(*) AS BIGINT) AS n_matches
    FROM (
      SELECT o_custkey AS ck, o_totalprice AS cur,
             LAG(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS pp,
             LEAD(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS np
      FROM orders WHERE o_custkey <= 300)
    WHERE pp IS NOT NULL AND cur > pp AND np IS NOT NULL AND np > cur
    GROUP BY ck ORDER BY ck
    """,
    tags=("custom",),
)
def p_mr_skip_to_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern ``u{2}`` with AFTER MATCH SKIP TO NEXT ROW: overlapping
    matches — one per position whose next two direction flags are both
    'up'.  Oracle counts rising adjacent pairs with lag/lead."""
    from trino_private_spark.operators.row_pattern import match_recognize_general

    mr = match_recognize_general(
        _mr_base(spark, sf_dir),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        pattern="u{2}",
        defines=_dir_defines(),
        mode="one",
        skip="to_next_row",
    )
    return (
        mr.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .withColumn("o_custkey", F.col("o_custkey").cast("long"))
        .orderBy("o_custkey")
    )


@probe(
    "p_mr_all_rows",
    oracle="""
    WITH seq AS (
      SELECT o_custkey AS ck,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
             CASE WHEN o_totalprice > LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) THEN 'u'
                  WHEN o_totalprice < LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) THEN 'd' END AS dir
      FROM orders WHERE o_custkey <= 300),
    isl AS (SELECT ck, rn, rn - ROW_NUMBER() OVER (PARTITION BY ck ORDER BY rn) AS grp
            FROM seq WHERE dir = 'u'),
    runs AS (SELECT ck, grp, MIN(rn) AS srt FROM isl GROUP BY ck, grp HAVING COUNT(*) >= 2),
    numbered AS (SELECT ck, grp, ROW_NUMBER() OVER (PARTITION BY ck ORDER BY srt) AS mn FROM runs)
    SELECT i.ck AS o_custkey, CAST(i.rn - 1 AS BIGINT) AS row_pos,
           'u' AS classifier, CAST(n.mn AS BIGINT) AS match_number
    FROM isl i JOIN numbered n ON i.ck = n.ck AND i.grp = n.grp
    ORDER BY o_custkey, row_pos
    """,
    tags=("custom",),
)
def p_mr_all_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ALL ROWS PER MATCH with CLASSIFIER() and MATCH_NUMBER() for pattern
    ``u{2,}``: every row of each rising island of length >= 2 is emitted
    with its label and per-partition match ordinal."""
    from trino_private_spark.operators.row_pattern import match_recognize_general

    mr = match_recognize_general(
        _mr_base(spark, sf_dir),
        partition_by=["o_custkey"],
        order_by=["o_orderkey"],
        pattern="u{2,}",
        defines=_dir_defines(),
        mode="all",
    )
    return (
        mr.select(
            F.col("o_custkey").cast("long").alias("o_custkey"),
            "row_pos",
            "classifier",
            "match_number",
        ).orderBy("o_custkey", "row_pos")
    )


@probe(
    "p_mr_sql",
    oracle="""
    WITH seq AS (
      SELECT o_custkey AS ck, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
             CASE WHEN o_totalprice > LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) THEN 'u' END AS dir
      FROM orders WHERE o_custkey <= 300),
    isl AS (SELECT ck, rn, rn - ROW_NUMBER() OVER (PARTITION BY ck ORDER BY rn) AS grp
            FROM seq WHERE dir = 'u'),
    runs AS (SELECT ck, grp, MIN(rn) AS srt, COUNT(*) AS len
             FROM isl GROUP BY ck, grp HAVING COUNT(*) >= 2)
    SELECT ck AS o_custkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY ck ORDER BY srt) AS BIGINT) AS match_number,
           CAST(len AS BIGINT) AS n_rows
    FROM runs ORDER BY o_custkey, match_number
    """,
    tags=("custom",),
)
def p_mr_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's OWN MATCH_RECOGNIZE SQL syntax end-to-end
    (operators/row_pattern_sql.py: grammar parse -> DEFINE compiled to
    vectorized pandas navigation -> NFA engine).  Pattern UP{2,} with
    PREV() navigation; oracle = rising islands >= 2 via gaps-and-islands."""
    from trino_private_spark.operators.row_pattern_sql import sql_match_recognize

    clause = """
    MATCH_RECOGNIZE (
      PARTITION BY o_custkey
      ORDER BY o_orderkey
      MEASURES MATCH_NUMBER() AS mn
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (UP{2,})
      DEFINE UP AS o_totalprice > PREV(o_totalprice)
    )
    """
    out = sql_match_recognize(_mr_base(spark, sf_dir), clause)
    return out.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("match_number").cast("long").alias("match_number"),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).orderBy("o_custkey", "match_number")


@probe(
    "p_mr_subset",
    oracle="""
    WITH seq AS (
      SELECT o_custkey AS ck, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
             CASE WHEN o_totalprice > LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) THEN 'U'
                  WHEN o_totalprice < LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) THEN 'D' END AS dir
      FROM orders WHERE o_custkey <= 300),
    isl AS (SELECT ck, dir, rn, o_orderkey,
                   rn - ROW_NUMBER() OVER (PARTITION BY ck, dir ORDER BY rn) AS grp
            FROM seq WHERE dir IS NOT NULL),
    runs AS (SELECT ck, dir, MIN(rn) AS srn, MAX(rn) AS ern, COUNT(*) AS len,
                    MIN(o_orderkey) AS sk, MAX(o_orderkey) AS ek
             FROM isl GROUP BY ck, dir, grp)
    SELECT u.ck AS o_custkey,
           CAST(u.sk AS BIGINT) AS u_start,
           CAST(u.ek AS BIGINT) AS u_end,
           CAST(d.ek AS BIGINT) AS b_end,
           'D' AS b_cls,
           CAST(u.len + d.len AS BIGINT) AS n_rows
    FROM runs u JOIN runs d
      ON u.ck = d.ck AND u.dir = 'U' AND d.dir = 'D' AND d.srn = u.ern + 1
    WHERE u.len >= 2 AND d.len >= 2
    ORDER BY o_custkey, u_start
    """,
    tags=("custom",),
)
def p_mr_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE SUBSET union variables (SqlBase.g4:339
    subsetDefinition; PatternRecognitionAnalyzer.java): SUBSET B = (U, D)
    referenced in label-aware navigation (FIRST(U.k), LAST(B.k)) and
    CLASSIFIER(B).  Pattern U{2,} D{2,} = maximal rising run >= 2
    immediately followed by a falling run >= 2 — a closed islands-pair
    form for the oracle."""
    from trino_private_spark.operators.row_pattern_sql import sql_match_recognize

    clause = """
    MATCH_RECOGNIZE (
      PARTITION BY o_custkey
      ORDER BY o_orderkey
      MEASURES FIRST(U.o_orderkey) AS u_start, LAST(U.o_orderkey) AS u_end,
               LAST(B.o_orderkey) AS b_end, CLASSIFIER(B) AS b_cls
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (U{2,} D{2,})
      SUBSET B = (U, D)
      DEFINE U AS o_totalprice > PREV(o_totalprice),
             D AS o_totalprice < PREV(o_totalprice)
    )
    """
    out = sql_match_recognize(_mr_base(spark, sf_dir), clause)
    return out.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("u_start").cast("long").alias("u_start"),
        F.col("u_end").cast("long").alias("u_end"),
        F.col("b_end").cast("long").alias("b_end"),
        "b_cls",
        F.col("n_rows").cast("long").alias("n_rows"),
    ).orderBy("o_custkey", "u_start")


@probe(
    "p_mr_exclusion",
    oracle="""
    WITH seq AS (
      SELECT o_custkey AS ck,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
             CASE WHEN o_totalprice > LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) THEN 'U' END AS dir
      FROM orders WHERE o_custkey <= 300),
    isl AS (SELECT ck, rn, rn - ROW_NUMBER() OVER (PARTITION BY ck ORDER BY rn) AS grp
            FROM seq WHERE dir = 'U'),
    runs AS (SELECT ck, grp, MIN(rn) AS srt FROM isl GROUP BY ck, grp HAVING COUNT(*) >= 2),
    numbered AS (SELECT ck, grp, srt, ROW_NUMBER() OVER (PARTITION BY ck ORDER BY srt) AS mn FROM runs)
    SELECT i.ck AS o_custkey, CAST(i.rn - 1 AS BIGINT) AS row_pos,
           'U' AS classifier, CAST(n.mn AS BIGINT) AS match_number
    FROM isl i JOIN numbered n ON i.ck = n.ck AND i.grp = n.grp
    WHERE i.rn > n.srt
    ORDER BY o_custkey, row_pos
    """,
    tags=("custom",),
)
def p_mr_exclusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """{- -} exclusion syntax (SqlBase.g4:601 excludedPattern): pattern
    ({- U -} U+) consumes exactly like U{2,} but ALL ROWS PER MATCH omits
    the excluded first row of each match.  Oracle = rising islands >= 2
    minus each island's first row."""
    from trino_private_spark.operators.row_pattern_sql import sql_match_recognize

    clause = """
    MATCH_RECOGNIZE (
      PARTITION BY o_custkey
      ORDER BY o_orderkey
      ALL ROWS PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN ({- U -} U+)
      DEFINE U AS o_totalprice > PREV(o_totalprice)
    )
    """
    out = sql_match_recognize(_mr_base(spark, sf_dir), clause)
    return out.select(
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("row_pos").cast("long").alias("row_pos"),
        "classifier",
        F.col("match_number").cast("long").alias("match_number"),
    ).orderBy("o_custkey", "row_pos")


@probe(
    "p_mr_composed",
    oracle="""
    WITH seq AS (
      SELECT o_custkey AS ck, o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
             CASE WHEN o_totalprice > LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) THEN 'u' END AS dir
      FROM orders WHERE o_custkey <= 300),
    isl AS (SELECT ck, rn, rn - ROW_NUMBER() OVER (PARTITION BY ck ORDER BY rn) AS grp
            FROM seq WHERE dir = 'u'),
    runs AS (SELECT ck, grp, MIN(rn) AS srt, COUNT(*) AS len
             FROM isl GROUP BY ck, grp HAVING COUNT(*) >= 2)
    SELECT c_name,
           ck AS o_custkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY ck ORDER BY srt) AS BIGINT) AS match_number,
           CAST(len AS BIGINT) AS n_rows
    FROM runs JOIN customer ON ck = c_custkey
    ORDER BY o_custkey, match_number
    """,
    tags=("custom",),
)
def p_mr_composed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE as a table primary INSIDE a composed query
    (SqlBase.g4:339 patternRecognition is allowed anywhere a relation
    is): the pattern result joins a dimension table in one statement.
    api.Engine lowers the clause to a temp view (api.py
    _lower_match_recognize), so Catalyst plans the surrounding join as
    usual.  Oracle = rising islands >= 2 joined to customer."""
    from trino_private_spark.api import Engine
    from trino_private_spark.queries import T

    t = T(spark, sf_dir)
    t.orders.where(F.col("o_custkey") <= 300).select(
        "o_custkey", "o_orderkey", "o_totalprice"
    ).createOrReplaceTempView("mr_comp_orders")
    t.customer.createOrReplaceTempView("mr_comp_cust")
    eng = Engine(spark)
    out = eng.sql(
        """
        SELECT c_name, o_custkey, match_number, n_rows
        FROM mr_comp_orders MATCH_RECOGNIZE (
          PARTITION BY o_custkey
          ORDER BY o_orderkey
          MEASURES MATCH_NUMBER() AS mn
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (UP{2,})
          DEFINE UP AS o_totalprice > PREV(o_totalprice)
        ) AS mr
        JOIN mr_comp_cust ON mr.o_custkey = mr_comp_cust.c_custkey
        """
    )
    return out.select(
        "c_name",
        F.col("o_custkey").cast("long").alias("o_custkey"),
        F.col("match_number").cast("long").alias("match_number"),
        F.col("n_rows").cast("long").alias("n_rows"),
    ).orderBy("o_custkey", "match_number")
