"""Registry SQL-text reachability audit (round-9 VERDICT What's missing
#1: ``starts_with`` was implemented AND prune-lowered but unreachable
from SQL text — UNRESOLVED_ROUTINE — because no mechanism carried the
name to Spark's catalog).

Every ``@trino_fn`` registry entry must now be reachable from trino-
dialect SQL text through ONE of:

- a Spark builtin of the same name (DESCRIBE FUNCTION resolves),
- a translate-time rename (``_FN_RENAMES``),
- a translate-time macro template (``_FN_TEMPLATES``),
- a session SQL-UDF / pandas-UDF shim (functions/sql_shims.py,
  installed by register_all — DESCRIBE FUNCTION resolves),
- a dedicated translate rewrite (the EXEMPT_REWRITE set below, each
  pinned by its own end-to-end test here).

The only hard exemption is ``combinations`` — its expression SHAPE
depends on the literal n argument (registry builds the combination
index tree in Python), so no fixed-text mechanism can front it.
"""

import pytest

from trino_private_spark.api import Engine
from trino_private_spark.functions import geo as _geo  # noqa: F401
from trino_private_spark.functions.registry import TRINO_FUNCTIONS
from trino_private_spark.plans.translate import _FN_RENAMES, _FN_TEMPLATES

# geo.py contributes its @trino_fn entries on IMPORT — pull it in
# explicitly so the audited set is the same whether or not another test
# module imported it first (the round-10 full-suite run caught exactly
# this: the audit passed in isolation and failed suite-wide)

# reachable through dedicated translate() rewrites rather than the
# catalog — each has an end-to-end test in TestRewriteReachable
EXEMPT_REWRITE = {
    "try",        # TRY(x / y) -> try_divide, TRY(CAST ..) -> TRY_CAST
    "try_cast",   # native Spark TRY_CAST syntax
    "date_parse",        # literal-pattern rewrite (_rewrite_pattern_calls)
    "to_char",           # Teradata pattern rewrite
    "to_timestamp_td",   # Teradata pattern rewrite
    "to_date_td",        # Teradata pattern rewrite
}

# expression shape depends on a literal argument; DataFrame-API only
EXEMPT_HARD = {"combinations"}


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


def test_every_registry_entry_is_sql_reachable(eng):
    unreachable = []
    for name in sorted(TRINO_FUNCTIONS):
        low = name.lower()
        if low in EXEMPT_REWRITE or low in EXEMPT_HARD:
            continue
        if low in _FN_RENAMES or low in _FN_TEMPLATES:
            continue
        try:
            eng.spark.sql(f"DESCRIBE FUNCTION {name}").collect()
        except Exception:  # noqa: BLE001
            unreachable.append(name)
    assert unreachable == [], (
        f"registry entries unreachable from SQL text: {unreachable}"
    )


class TestRewriteReachable:
    """End-to-end pins for the EXEMPT_REWRITE set."""

    def test_try_divide(self, eng):
        assert eng.sql("SELECT TRY(1 / 0) AS v").collect()[0]["v"] is None

    def test_try_cast(self, eng):
        r = eng.sql("SELECT TRY(CAST('x' AS INTEGER)) AS v").collect()[0]
        assert r["v"] is None

    def test_date_parse(self, eng):
        r = eng.sql(
            "SELECT CAST(date_parse('2026*01*02', '%Y*%m*%d') AS DATE) AS d"
        ).collect()[0]
        assert str(r["d"]) == "2026-01-02"

    def test_to_char(self, eng):
        r = eng.sql(
            "SELECT to_char(TIMESTAMP '2026-01-02 03:04:05', "
            "'YYYY-MM-DD HH24:MI:SS') AS s"
        ).collect()[0]
        assert r["s"] == "2026-01-02 03:04:05"

    def test_to_timestamp_td(self, eng):
        r = eng.sql(
            "SELECT to_timestamp_td('2026-01-02 03:04:05', "
            "'YYYY-MM-DD HH24:MI:SS') AS t"
        ).collect()[0]
        assert str(r["t"]).startswith("2026-01-02 03:04:05")

    def test_to_date_td(self, eng):
        r = eng.sql(
            "SELECT to_date_td('2026-01-02', 'YYYY-MM-DD') AS d"
        ).collect()[0]
        assert str(r["d"]) == "2026-01-02"


class TestShimSemantics:
    """Spot checks: SQL-text results match the reference semantics the
    registry builders encode (citations in functions/registry.py)."""

    CASES = [
        ("starts_with('prefixed', 'pre')", True),
        ("day_of_week(DATE '2026-08-16')", 7),  # ISO: Sunday = 7
        ("dow(DATE '2026-08-16')", 7),          # documented alias
        ("week(DATE '2026-01-08')", 2),          # alias of week_of_year
        ("day_of_month(DATE '2026-08-16')", 16),  # alias of day
        ("day_of_year(DATE '2026-02-01')", 32),
        ("year_of_week(DATE '2024-12-31')", 2025),  # ISO week-year
        ("millisecond(TIMESTAMP '2026-01-01 01:02:03.456')", 456),
        ("from_base('1e', 16)", 30),
        ("to_base(30, 16)", "1e"),
        ("bitwise_left_shift(1, 70)", 0),  # NOT mod-64
        ("bitwise_right_shift_arithmetic(-8, 2)", -2),
        ("hamming_distance('abcde', 'abzde')", 1),
        ("char2hexint('A')", "0041"),
        ("luhn_check('79927398713')", True),
        ("luhn_check('79927398714')", False),
        ("is_json_scalar('[1,2]')", False),
        ("json_size('{\"x\":[1,2,3]}', '$.x')", 3),
        ("json_array_get('[\"a\",\"b\",\"c\"]', -1)", "c"),
        ("json_array_contains('[1, 2, 3]', 2)", True),
        # type-strict: the string '2' does not match the number 2
        ("json_array_contains('[1, 2, 3]', '2')", False),
        ("json_array_contains('[true, false]', true)", True),
        ("url_extract_port('https://h:8080/p')", 8080),
        ("from_big_endian_64(to_big_endian_64(-12345))", -12345),
        ("from_big_endian_32(to_big_endian_32(-7))", -7),
        ("from_ieee754_64(to_ieee754_64(2.5))", 2.5),
        ("contains_sequence(ARRAY[1,2,3,4], ARRAY[2,3])", True),
        ("contains_sequence(ARRAY[1,2,3,4], ARRAY[2,4])", False),
        ("regexp_position('ababab', 'b', 3)", 4),
        ("regexp_position('xyz', 'q')", -1),
        ("index('hello', 'll')", 3),
        ("rgb(255, 0, 0)", 16711680),
        # Bing-tile family (BingTileFunctions.java; tile = x*2^28+y*32+z)
        ("bing_tile(3, 5, 4)", 3 * (1 << 28) + 5 * 32 + 4),
        ("bing_tile_zoom_level(bing_tile(3, 5, 4))", 4),
        ("bing_tile_coordinates(bing_tile(3, 5, 4)).x", 3),
        ("bing_tile_coordinates(bing_tile(3, 5, 4)).y", 5),
        # digits i=4..1: (x>>i-1 & 1) + 2*(y>>i-1 & 1) for x=3,y=5
        ("bing_tile_quadkey(bing_tile(3, 5, 4))", "0213"),
        ("bing_tile(bing_tile_quadkey(bing_tile(3, 5, 4)))",
         3 * (1 << 28) + 5 * 32 + 4),
        ("bing_tile_zoom_level(bing_tile_at(47.6, -122.3, 10))", 10),
        ("cardinality(bing_tiles_around(47.6, -122.3, 10))", 9),
        # BNA -> LAX, the reference's own doc example (~2886.449 km)
        ("round(great_circle_distance(36.12, -86.67, 33.94, -118.40), 3)",
         2886.449),
        ("st_x(st_point(1.5, 2.5))", 1.5),
        ("st_y(st_point(1.5, 2.5))", 2.5),
        ("st_distance(st_point(0, 0), st_point(3, 4))", 5.0),
        ("human_readable_seconds(93784)",
         "1 days, 2 hours, 3 minutes, 4 seconds"),
        ("to_milliseconds(parse_duration('5.4s'))", 5400),
        ("cardinality(trim_array(ARRAY[1,2,3], 1))", 2),
        ("cosine_similarity(ARRAY[1.0, 0.0], ARRAY[0.0, 1.0])", 0.0),
        ("word_stem('running')", "runn"),
        ("timezone_hour(TIMESTAMP '2026-01-01 00:00:00', "
         "'America/New_York')", -5),
    ]

    @pytest.mark.parametrize("expr,want", CASES)
    def test_case(self, eng, expr, want):
        got = eng.sql(f"SELECT {expr} AS v").collect()[0]["v"]
        if isinstance(want, float):
            assert abs(got - want) < 1e-9
        else:
            assert got == want

    def test_aggregate_templates(self, eng, spark):
        spark.range(1, 5).selectExpr("id AS x").createOrReplaceTempView(
            "reach_t"
        )
        gm = eng.sql(
            "SELECT geometric_mean(x) AS v FROM reach_t"
        ).collect()[0]["v"]
        assert abs(gm - 24 ** 0.25) < 1e-9
        cs = eng.sql("SELECT checksum(x) AS v FROM reach_t").collect()[0]["v"]
        assert isinstance(cs, int)
        # order-insensitive: same set, different order, same checksum
        spark.sql("SELECT x FROM reach_t ORDER BY x DESC").createOrReplaceTempView(
            "reach_t2"
        )
        cs2 = eng.sql("SELECT checksum(x) AS v FROM reach_t2").collect()[0]["v"]
        assert cs == cs2

    def test_starts_with_prunes_partitions(self, eng, spark):
        """The prune branch iceberg.py lowers for starts_with is now
        reachable from SQL text: scanned-file count drops."""
        import tempfile

        from trino_private_spark.sources.iceberg import (
            IO_SCAN_INFO,
            _local,
            read_iceberg,
        )
        from trino_private_spark.sources.iceberg_write import iceberg_create
        from pyspark.sql import functions as F

        loc = tempfile.mkdtemp(prefix="tps_swprune_") + "/t"
        df = spark.range(0, 100).select(
            F.concat(
                F.when(F.col("id") % 2 == 0, "px").otherwise("qx"),
                (F.col("id") % 5).cast("string"),
            ).alias("seg"),
            F.col("id").alias("v"),
        )
        iceberg_create(df, loc, partition_by=["seg"])
        if not hasattr(eng, "_iceberg_views"):
            eng._iceberg_views = {}
        eng._iceberg_views["sw_t"] = loc
        read_iceberg(spark, loc).createOrReplaceTempView("sw_t")
        n = eng.sql(
            "SELECT COUNT(*) AS n FROM sw_t WHERE starts_with(seg, 'px')"
        ).collect()[0]["n"]
        assert n == 50
        scan = IO_SCAN_INFO[_local(loc)]
        assert scan["scanned_data_files"] < scan["candidate_data_files"]
        assert scan["pruned_data_files"] > 0
