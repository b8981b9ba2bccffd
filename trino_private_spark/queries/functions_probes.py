"""Scalar-function family probes (SURVEY.md §2.5).

One probe per family — string / regex / LIKE / math / datetime / JSON /
conditional / array (incl. HOFs) / map / binary-crypto — each exercising
several functions of the family in one oracle-checked query. Families whose
Trino spelling differs from Spark's are routed through the engine's compat
registry (trino_private_spark.functions) in unit tests; probes here use the
Spark-native spelling since the driver compares values, not SQL text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe
from trino_private_spark.queries.relational import dround


@probe(
    "p_like",
    oracle="""
    SELECT COUNT(*) AS n,
           COUNT(*) FILTER (WHERE p_name LIKE 'a%') AS pre,
           COUNT(*) FILTER (WHERE p_type LIKE '%ED%') AS mid
    FROM part
    """,
    tags=("functions",),
)
def p_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern matching. Ref: type/LikeFunctions.java (compiled patterns)."""
    t = T(spark, sf_dir)
    return t.part.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("p_name").like("a%")).alias("pre"),
        F.count_if(F.col("p_type").like("%ED%")).alias("mid"),
    )


@probe(
    "p_strings",
    oracle="""
    SELECT p_partkey,
           length(p_name) AS len,
           upper(p_brand) AS up,
           substr(p_name, 1, 8) AS sub,
           replace(p_type, ' ', '_') AS rep,
           instr(p_name, 'a') AS pos,
           split_part(p_type, ' ', 2) AS part2,
           lpad(p_brand, 12, '*') AS pad,
           reverse(p_brand) AS rev,
           p_brand || ':' || p_type AS cat,
           trim('  ' || p_brand || '  ') AS tr
    FROM part ORDER BY p_partkey LIMIT 500
    """,
    tags=("functions",),
)
def p_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: length/upper/substr/replace/strpos/split_part/lpad/
    reverse/concat/trim. Ref: operator/scalar/StringFunctions.java (971 LoC);
    Trino `strpos` -> Spark `instr` via the compat registry."""
    t = T(spark, sf_dir)
    return (
        t.part.select(
            "p_partkey",
            F.length("p_name").cast("bigint").alias("len"),
            F.upper("p_brand").alias("up"),
            F.substring("p_name", 1, 8).alias("sub"),
            F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("rep"),
            F.instr(F.col("p_name"), "a").cast("bigint").alias("pos"),
            F.split_part(F.col("p_type"), F.lit(" "), F.lit(2)).alias("part2"),
            F.lpad(F.col("p_brand"), 12, "*").alias("pad"),
            F.reverse(F.col("p_brand")).alias("rev"),
            F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("cat"),
            F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("tr"),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@probe(
    "p_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+)$', 1) AS last_word,
           regexp_replace(p_brand, '[0-9]+', '#', 'g') AS no_digits,
           CASE WHEN regexp_matches(p_name, '^[a-z]+ ') THEN 1 ELSE 0 END AS starts_lower
    FROM part ORDER BY p_partkey LIMIT 500
    """,
    tags=("functions",),
)
def p_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex family: regexp_extract / regexp_replace / regexp_like.
    Ref: operator/scalar/JoniRegexpFunctions.java; Java regex ≈ Joni dialect."""
    t = T(spark, sf_dir)
    return (
        t.part.select(
            "p_partkey",
            F.regexp_extract(F.col("p_type"), r"([A-Z]+)$", 1).alias("last_word"),
            F.regexp_replace(F.col("p_brand"), r"[0-9]+", "#").alias("no_digits"),
            F.when(F.col("p_name").rlike(r"^[a-z]+ "), 1).otherwise(0).alias(
                "starts_lower"
            ),
        )
        .orderBy("p_partkey")
        .limit(500)
    )


@probe(
    "p_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice * l_tax, 2) AS tax_amt,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS ce,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS fl,
           ROUND(SQRT(l_extendedprice), 6) AS sq,
           l_orderkey % 7 AS md,
           ABS(l_discount - 0.05) < 1e-12 AS near5,
           ROUND(POWER(l_quantity, 2), 2) AS p2,
           CAST(SIGN(l_discount - 0.04) AS DOUBLE) AS sg
    FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500
    """,
    tags=("functions",),
)
def p_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family: round/ceil/floor/sqrt/mod/abs/power/sign.
    Ref: operator/scalar/MathFunctions.java (1372 LoC)."""
    li = T(spark, sf_dir).lineitem
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.col("l_extendedprice") * F.col("l_tax"), 2).alias("tax_amt"),
            F.ceil("l_extendedprice").cast("bigint").alias("ce"),
            F.floor("l_extendedprice").cast("bigint").alias("fl"),
            F.round(F.sqrt("l_extendedprice"), 6).alias("sq"),
            (F.col("l_orderkey") % 7).alias("md"),
            (F.abs(F.col("l_discount") - 0.05) < 1e-12).alias("near5"),
            F.round(F.pow("l_quantity", F.lit(2)), 2).alias("p2"),
            F.signum(F.col("l_discount") - 0.04).alias("sg"),
        )
        .orderBy("l_orderkey", "l_linenumber")
        .limit(500)
    )


@probe(
    "p_math_scalar",
    oracle="""
    SELECT ROUND(SIN(1.0), 10) AS s, ROUND(COS(1.0), 10) AS c,
           ROUND(ATAN2(1.0, 2.0), 10) AS a2, ROUND(DEGREES(PI()), 6) AS dg,
           ROUND(RADIANS(180.0), 10) AS rd, ROUND(EXP(1.0), 10) AS e,
           ROUND(LN(10.0), 10) AS l, ROUND(LOG10(1000.0), 6) AS l10,
           ROUND(LOG2(8.0), 6) AS l2, ROUND(CBRT(27.0), 6) AS cb
    """,
    tags=("functions",),
)
def p_math_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcendental scalars on literals (engine-independent values).
    Ref: operator/scalar/MathFunctions.java."""
    return spark.range(1).select(
        F.round(F.sin(F.lit(1.0)), 10).alias("s"),
        F.round(F.cos(F.lit(1.0)), 10).alias("c"),
        F.round(F.atan2(F.lit(1.0), F.lit(2.0)), 10).alias("a2"),
        F.round(F.degrees(F.lit(3.141592653589793)), 6).alias("dg"),
        F.round(F.radians(F.lit(180.0)), 10).alias("rd"),
        F.round(F.exp(F.lit(1.0)), 10).alias("e"),
        F.round(F.log(F.lit(10.0)), 10).alias("l"),
        F.round(F.log10(F.lit(1000.0)), 6).alias("l10"),
        F.round(F.log2(F.lit(8.0)), 6).alias("l2"),
        F.round(F.cbrt(F.lit(27.0)), 6).alias("cb"),
    )


@probe(
    "p_width_bucket",
    oracle="""
    SELECT CASE WHEN o_totalprice < 0 THEN 0
                WHEN o_totalprice >= 600000 THEN 11
                ELSE 1 + CAST(FLOOR(o_totalprice * 10 / 600000) AS BIGINT) END AS wb,
           COUNT(*) AS c
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=("functions",),
)
def p_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """width_bucket histogramming (Ref: MathFunctions.java width_bucket;
    FunctionRegistry.java:629). DuckDB lacks the builtin -> oracle spells out
    the bucket arithmetic."""
    t = T(spark, sf_dir)
    return (
        t.orders.select(
            F.width_bucket("o_totalprice", F.lit(0.0), F.lit(600000.0), F.lit(10)).alias(
                "wb"
            )
        )
        .groupBy("wb")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("wb")
    )


# --- datetime ----------------------------------------------------------------


@probe(
    "p_extract",
    oracle="""
    SELECT EXTRACT(YEAR FROM o_orderdate) AS y, EXTRACT(QUARTER FROM o_orderdate) AS q,
           COUNT(*) AS c
    FROM orders GROUP BY 1, 2 ORDER BY 1, 2
    """,
    tags=("functions",),
)
def p_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXTRACT field family. Ref: operator/scalar/timestamp/ExtractYear.java etc."""
    t = T(spark, sf_dir)
    return (
        t.orders.groupBy(
            F.year("o_orderdate").cast("bigint").alias("y"),
            F.quarter("o_orderdate").cast("bigint").alias("q"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("y", "q")
    )


@probe(
    "p_datetrunc",
    oracle="""
    SELECT date_trunc('month', o_orderdate) AS m, COUNT(*) AS c
    FROM orders GROUP BY 1 ORDER BY 1
    """,
    tags=("functions",),
)
def p_datetrunc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc. Ref: operator/scalar/timestamp/DateTrunc.java."""
    t = T(spark, sf_dir)
    return (
        t.orders.groupBy(F.date_trunc("month", "o_orderdate").alias("m"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("m")
    )


@probe(
    "p_datediff_add",
    oracle="""
    SELECT o_orderkey,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS dd,
           strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS plus30,
           strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS eom
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("functions",),
)
def p_datediff_add(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trino date_diff('day',a,b) / date_add('day',n,x) / last_day_of_month.
    Ref: operator/scalar/DateTimeFunctions.java (675 LoC), DateDiff.java,
    DateAdd.java, LastDayOfMonth.java. The compat registry exposes the Trino
    argument order; this probe checks value semantics."""
    t = T(spark, sf_dir)
    d = F.col("o_orderdate").cast("date")
    return (
        t.orders.select(
            "o_orderkey",
            F.datediff(d, F.lit("1995-01-01").cast("date")).cast("bigint").alias("dd"),
            # dates serialized as ISO strings: engines' pandas conversions
            # disagree on date-vs-midnight-timestamp rendering, values agree
            F.date_format(F.date_add(d, 30), "yyyy-MM-dd").alias("plus30"),
            F.date_format(F.last_day(d), "yyyy-MM-dd").alias("eom"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


@probe(
    "p_dateformat",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS iso, COUNT(*) AS c
    FROM orders GROUP BY 1 ORDER BY 1 LIMIT 400
    """,
    tags=("functions",),
)
def p_dateformat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_format / format_datetime (Trino MySQL-style %-patterns map to Java
    patterns in the compat registry). Ref: DateTimeFunctions.java date_format."""
    t = T(spark, sf_dir)
    return (
        t.orders.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso"))
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("iso")
        .limit(400)
    )


@probe(
    "p_unixtime",
    oracle="""
    SELECT o_orderkey, CAST(epoch(o_orderdate) AS BIGINT) AS ut
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("functions",),
)
def p_unixtime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_unixtime / from_unixtime round trip.
    Ref: DateTimeFunctions.java toUnixTime."""
    t = T(spark, sf_dir)
    return (
        t.orders.select(
            "o_orderkey", F.unix_timestamp("o_orderdate").alias("ut")
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


# --- JSON --------------------------------------------------------------------


@probe(
    "p_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS kn
    FROM events ORDER BY event_id LIMIT 200
    """,
    tags=("functions",),
)
def p_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_extract_scalar -> get_json_object; JSON casts.
    Ref: operator/scalar/JsonFunctions.java (461 LoC), JsonExtract.java."""
    t = T(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k")
    return (
        t.events.select("event_id", k.alias("k"), k.cast("bigint").alias("kn"))
        .orderBy("event_id")
        .limit(200)
    )


# --- conditional -------------------------------------------------------------


@probe(
    "p_conditional",
    oracle="""
    SELECT o_orderkey,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st,
           CASE WHEN o_totalprice > 200000 THEN 'big'
                WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS sz,
           TRY_CAST(o_orderpriority AS INTEGER) AS pri_int,
           IF(o_orderstatus = 'F', 1, 0) AS is_final
    FROM orders ORDER BY o_orderkey LIMIT 1000
    """,
    tags=("functions",),
)
def p_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """coalesce/nullif/CASE/try_cast/if. Ref: TryCastFunction.java:613,
    TryFunction.java:563; CASE in the grammar."""
    t = T(spark, sf_dir)
    return (
        t.orders.select(
            "o_orderkey",
            F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("open")).alias(
                "st"
            ),
            F.when(F.col("o_totalprice") > 200000, "big")
            .when(F.col("o_totalprice") > 50000, "mid")
            .otherwise("small")
            .alias("sz"),
            F.expr("try_cast(o_orderpriority AS INTEGER)").alias("pri_int"),
            F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("is_final"),
        )
        .orderBy("o_orderkey")
        .limit(1000)
    )


# --- arrays ------------------------------------------------------------------


@probe(
    "p_array_hof",
    oracle="""
    SELECT vec_id, len(embedding) AS n,
           (SELECT ROUND(SUM(CAST(x AS DOUBLE)), 4) FROM UNNEST(embedding) AS u(x)) AS s,
           (SELECT ROUND(MAX(CAST(x AS DOUBLE)), 6) FROM UNNEST(embedding) AS u(x)) AS mx
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    tags=("functions",),
)
def p_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (aggregate/transform) over the embedding
    column — JVM-side lambda evaluation, no Python.
    Ref: operator/scalar/ReduceFunction.java, ArrayTransformFunction.java."""
    t = T(spark, sf_dir)
    emb = F.col("embedding")
    return (
        t.embeddings.select(
            "vec_id",
            F.size(emb).cast("bigint").alias("n"),
            F.round(
                F.aggregate(
                    emb, F.lit(0.0).cast("double"), lambda acc, x: acc + x.cast("double")
                ),
                4,
            ).alias("s"),
            F.round(F.array_max(F.transform(emb, lambda x: x.cast("double"))), 6).alias(
                "mx"
            ),
        )
        .orderBy("vec_id")
        .limit(200)
    )


@probe(
    "p_array_funcs",
    oracle="""
    SELECT vec_id,
           ROUND(CAST(embedding[1] AS DOUBLE), 6) AS first_e,
           ROUND(CAST(embedding[64] AS DOUBLE), 6) AS last_e,
           len(embedding[1:4]) AS sl,
           (SELECT COUNT(*) FROM UNNEST(embedding) AS u(x) WHERE x > 0) AS n_pos
    FROM embeddings ORDER BY vec_id LIMIT 200
    """,
    tags=("functions",),
)
def p_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array access family: element_at (1-based, Trino discipline per
    SURVEY §1.2), slice, filter-count.
    Ref: operator/scalar/ArraySubscriptOperator.java, ArraySliceFunction.java,
    ArrayFilterFunction.java."""
    t = T(spark, sf_dir)
    emb = F.col("embedding")
    return (
        t.embeddings.select(
            "vec_id",
            F.round(F.element_at(emb, 1).cast("double"), 6).alias("first_e"),
            F.round(F.element_at(emb, 64).cast("double"), 6).alias("last_e"),
            F.size(F.slice(emb, 1, 4)).cast("bigint").alias("sl"),
            F.size(F.filter(emb, lambda x: x > 0)).cast("bigint").alias("n_pos"),
        )
        .orderBy("vec_id")
        .limit(200)
    )


@probe(
    "p_array_set_ops",
    oracle="""
    SELECT doc_id,
           len(list_distinct(string_split(text, ' '))) AS n_uniq,
           len(string_split(text, ' ')) AS n_tok,
           array_to_string(list_sort(list_distinct(string_split(substr(text, 1, 40), ' '))), '|') AS head_words
    FROM documents WHERE doc_id <= 50 ORDER BY doc_id
    """,
    tags=("functions",),
)
def p_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_distinct / array_sort / array_join / cardinality over tokenized
    text. Ref: ArrayDistinctFunction.java, ArraySortFunction.java,
    ArrayJoin.java, CardinalityFunction.java."""
    t = T(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    head = F.split(F.substring(F.col("text"), 1, 40), " ")
    return (
        t.documents.where(F.col("doc_id") <= 50)
        .select(
            "doc_id",
            F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq"),
            F.size(toks).cast("bigint").alias("n_tok"),
            F.array_join(F.array_sort(F.array_distinct(head)), "|").alias("head_words"),
        )
        .orderBy("doc_id")
    )


# --- maps --------------------------------------------------------------------


@probe(
    "p_map_funcs",
    oracle="""
    SELECT o_custkey,
           COUNT(DISTINCT o_orderstatus) AS n_statuses,
           NULLIF(COUNT(*) FILTER (WHERE o_orderstatus = 'F'), 0) AS f_cnt,
           array_to_string(list_sort(list_distinct(list(o_orderstatus))), ',') AS ks
    FROM orders GROUP BY o_custkey ORDER BY o_custkey LIMIT 200
    """,
    tags=("functions",),
)
def p_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: build map<status,count> per customer with map_from_entries,
    then read it back via map_keys / element_at / cardinality. The oracle
    computes the same values relationally (DuckDB map syntax differs).
    Ref: MapFromEntriesFunction.java, MapKeys.java, MapSubscriptOperator."""
    t = T(spark, sf_dir)
    per_status = t.orders.groupBy("o_custkey", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    as_map = per_status.groupBy("o_custkey").agg(
        F.map_from_entries(
            F.collect_list(F.struct("o_orderstatus", "cnt"))
        ).alias("m")
    )
    return (
        as_map.select(
            "o_custkey",
            F.size("m").cast("bigint").alias("n_statuses"),
            F.element_at(F.col("m"), "F").alias("f_cnt"),
            F.array_join(F.array_sort(F.map_keys("m")), ",").alias("ks"),
        )
        .orderBy("o_custkey")
        .limit(200)
    )


# --- binary / crypto ---------------------------------------------------------


@probe(
    "p_crypto",
    oracle="""
    SELECT c_custkey, md5(c_name) AS m, sha256(c_name) AS s
    FROM customer ORDER BY c_custkey LIMIT 100
    """,
    tags=("functions",),
)
def p_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 / sha256 hex digests. Ref: operator/scalar/VarbinaryFunctions.java."""
    t = T(spark, sf_dir)
    return (
        t.customer.select(
            "c_custkey",
            F.md5(F.col("c_name").cast("binary")).alias("m"),
            F.sha2(F.col("c_name").cast("binary"), 256).alias("s"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


@probe(
    "p_year_of_week",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS y,
           CAST(isoyear(o_orderdate) AS INT) AS yow,
           CAST(week(o_orderdate) AS INT) AS wk,
           COUNT(*) AS c
    FROM orders GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    tags=("functions",),
)
def p_year_of_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO week-year (year_of_week/yow) + ISO week number, oracle-checked
    against DuckDB isoyear()/week(). Ref: DateTimeFunctions.java yearOfWeek;
    registry straggler sweep 3 (Thursday-of-week rewrite, no UDF)."""
    from trino_private_spark.functions.registry import TRINO_FUNCTIONS as TF

    t = T(spark, sf_dir)
    return (
        t.orders.select(
            F.year("o_orderdate").cast("int").alias("y"),
            TF["year_of_week"](F.col("o_orderdate")).cast("int").alias("yow"),
            F.weekofyear("o_orderdate").cast("int").alias("wk"),
        )
        .groupBy("y", "yow", "wk")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy("y", "yow", "wk")
    )


@probe(
    "p_combinations",
    oracle="""
    WITH w AS (
      SELECT p_partkey,
             string_split(p_name || ' ' || p_brand || ' ' || p_type || ' ' || p_size, ' ') AS ws
      FROM part WHERE p_partkey <= 300
    ),
    pairs AS (
      SELECT p_partkey, 2 AS n,
             unnest(flatten([[ws[i] || '|' || ws[j]
                              FOR j IN range(i+1, len(ws)+1)]
                             FOR i IN range(1, len(ws)+1)])) AS combo
      FROM w
    ),
    triples AS (
      SELECT p_partkey, 3 AS n,
             unnest(flatten(flatten([[[ws[i] || '|' || ws[j] || '|' || ws[k]
                                       FOR k IN range(j+1, len(ws)+1)]
                                      FOR j IN range(i+1, len(ws)+1)]
                                     FOR i IN range(1, len(ws)+1)]))) AS combo
      FROM w
    )
    SELECT p_partkey, n, combo FROM pairs
    UNION ALL
    SELECT p_partkey, n, combo FROM triples
    """,
    tags=("functions",),
)
def p_combinations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """combinations(arr, n) for n=2 and n=3 over p_name word arrays, exploded
    so the driver's order-insensitive hash covers exact membership. Ref:
    operator/scalar/ArrayCombinationsFunction.java (colex order, n <= 5)."""
    from trino_private_spark.functions.registry import TRINO_FUNCTIONS as R

    t = T(spark, sf_dir)
    base = t.part.filter(F.col("p_partkey") <= 300).select(
        "p_partkey",
        F.split(
            F.concat_ws(
                " ", "p_name", "p_brand", "p_type", F.col("p_size").cast("string")
            ),
            " ",
        ).alias("ws"),
    )
    parts = [
        base.select(
            "p_partkey",
            F.lit(n).cast("int").alias("n"),
            F.explode(R["combinations"](F.col("ws"), n)).alias("c"),
        ).select("p_partkey", "n", F.array_join(F.col("c"), "|").alias("combo"))
        for n in (2, 3)
    ]
    return parts[0].unionAll(parts[1])
