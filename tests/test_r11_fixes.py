"""Round-11 fix pins: the r10 VERDICT/ADVICE items, each with the repro
that motivated it.

- checksum: wrapping SUM of xxhash64*PRIME64 (ChecksumAggregationFunction
  .java:124-139) — property-tested against a Python reference model,
  including the xor collision class (ADVICE medium).
- _rewrite_pattern_calls re-shields converted literals (ADVICE low).
- from_unixtime_nanos exact across int64 (ADVICE low).
- split_to_map literal delimiters (ADVICE low).
- _ICEP_LIVE_BY_SESSION weakref keying (ADVICE low).
- geometry_union non-polygon semantics (VERDICT What's wrong #1).
- cosine_similarity map signature (VERDICT What's missing #3).
- map_agg/map_union first-wins + null-key semantics (tier-2).
- Iceberg explicit-schema guard samples multiple footers (VERDICT #7).
"""

from __future__ import annotations

import random

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from trino_private_spark.api import Engine

P64 = 0x9E3779B185EBCA87
TWO64, TWO63 = 1 << 64, 1 << 63


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark)


def _ref_checksum(hashes) -> int | None:
    """Python model of ChecksumAggregationFunction: wrapping 64-bit sum of
    hash*PRIME64, null rows contributing PRIME64; null on empty input."""
    if not hashes:
        return None
    acc = 0
    for h in hashes:
        acc = (acc + (P64 if h is None else (h % TWO64) * P64)) % TWO64
    return acc - TWO64 if acc >= TWO63 else acc


class TestChecksum:
    def _spark_hashes(self, spark, vals):
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        return [
            None if r["x"] is None else r["h"]
            for r in df.select("x", F.xxhash64("x").alias("h")).collect()
        ]

    def test_matches_reference_model_with_nulls(self, eng, spark):
        vals = [5, 5, 7, None, -3, None]
        spark.createDataFrame([(v,) for v in vals], "x long") \
            .createOrReplaceTempView("ck_r11")
        got = eng.sql("SELECT checksum(x) AS c FROM ck_r11").collect()[0]["c"]
        assert got == _ref_checksum(self._spark_hashes(spark, vals))

    def test_dataframe_plane_matches_sql_plane(self, eng, spark):
        from trino_private_spark.functions.registry import checksum

        vals = [1, 2, 2, None, 9]
        df = spark.createDataFrame([(v,) for v in vals], "x long")
        df.createOrReplaceTempView("ck_r11b")
        df_v = df.agg(checksum(F.col("x")).alias("c")).collect()[0]["c"]
        sql_v = eng.sql("SELECT checksum(x) AS c FROM ck_r11b").collect()[0]["c"]
        assert df_v == sql_v

    def test_even_duplicates_do_not_cancel(self, eng, spark):
        """The xor collision class (r10 ADVICE): checksum([x, x, y]) must
        NOT equal checksum([y])."""
        spark.createDataFrame([(5,), (5,), (7,)], "x long") \
            .createOrReplaceTempView("ck_dup")
        spark.createDataFrame([(7,)], "x long") \
            .createOrReplaceTempView("ck_single")
        a = eng.sql("SELECT checksum(x) AS c FROM ck_dup").collect()[0]["c"]
        b = eng.sql("SELECT checksum(x) AS c FROM ck_single").collect()[0]["c"]
        assert a != b

    def test_empty_group_is_null(self, eng, spark):
        spark.createDataFrame([(1,)], "x long").createOrReplaceTempView("ck_e")
        r = eng.sql(
            "SELECT checksum(x) AS c FROM ck_e WHERE x > 100"
        ).collect()[0]["c"]
        assert r is None

    def test_order_insensitive_random(self, eng, spark):
        rnd = random.Random(17)
        vals = [rnd.randrange(-(2**62), 2**62) for _ in range(40)] + [None]
        for seed in (1, 2):
            shuffled = list(vals)
            random.Random(seed).shuffle(shuffled)
            spark.createDataFrame([(v,) for v in shuffled], "x long") \
                .createOrReplaceTempView(f"ck_o{seed}")
        a = eng.sql("SELECT checksum(x) AS c FROM ck_o1").collect()[0]["c"]
        b = eng.sql("SELECT checksum(x) AS c FROM ck_o2").collect()[0]["c"]
        assert a == b == _ref_checksum(self._spark_hashes(spark, vals))


class TestPatternLiteralShield:
    def test_paren_in_pattern_stays_shielded(self):
        from trino_private_spark.plans.translate import translate

        out = translate("SELECT checksum(date_format(ts, '(%Y')) FROM t")
        # the converted pattern must survive as ONE literal and the
        # statement must stay paren-balanced
        assert "date_format(ts, '(yyyy')" in out
        # paren balance OUTSIDE string literals (the pattern itself
        # legitimately holds an unmatched paren INSIDE its literal)
        from trino_private_spark.plans.translate import _shield_strings

        shielded, _ = _shield_strings(out)
        assert shielded.count("(") == shielded.count(")")

    def test_pattern_paren_executes(self, eng, spark):
        spark.sql(
            "SELECT TIMESTAMP '2024-03-05 10:30:45' AS ts"
        ).createOrReplaceTempView("pp_t")
        r = eng.sql(
            "SELECT date_format(ts, '(%Y)') AS v FROM pp_t"
        ).collect()[0]["v"]
        assert r == "(2024)"


class TestFromUnixtimeNanos:
    @given(st.integers(min_value=-(2**62), max_value=2**62))
    @settings(
        max_examples=30,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def test_exact_floor_division(self, eng, n):
        got = eng.sql(
            f"SELECT unix_micros(from_unixtime_nanos({n})) AS us"
        ).collect()[0]["us"]
        assert got == n // 1000  # python // is floor division


class TestSplitToMapLiteralDelims:
    def test_pipe_and_dot(self, eng):
        r = eng.sql(
            "SELECT split_to_map('a=1|b=2', '|', '=') AS m, "
            "split_to_multimap('x.1|x.2', '|', '.') AS mm"
        ).collect()[0]
        assert r["m"] == {"a": "1", "b": "2"}
        assert dict(r["mm"]) == {"x": ["1", "2"]}


class TestIcepLedgerWeakref:
    def test_ledger_is_weak(self):
        import weakref

        from trino_private_spark import api as api_mod

        assert isinstance(
            api_mod._ICEP_LIVE_BY_SESSION, weakref.WeakKeyDictionary
        )


class TestGeometryUnionSemantics:
    """GeoFunctions.java stUnion:858-902 — dimension-bucketed union."""

    CASES = [
        # the r10 confirmed wrong result: POLYGON EMPTY for dup points
        ("ARRAY[ST_Point(1.0, 2.0), ST_Point(1.0, 2.0)]", "POINT (1 2)"),
        (
            "ARRAY[ST_Point(1.0, 2.0), ST_Point(3.0, 4.0)]",
            "MULTIPOINT (1 2, 3 4)",
        ),
        # interior point absorbed, exterior survives as a collection
        (
            "ARRAY['POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', 'POINT (1 1)']",
            "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
        ),
        (
            "ARRAY['LINESTRING (0 0, 1 1)', 'LINESTRING (0 0, 1 1)']",
            "LINESTRING (0 0, 1 1)",
        ),
        # disjoint polygons keep their original rings
        (
            "ARRAY['POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))', "
            "'POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))']",
            "MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), "
            "((5 5, 6 5, 6 6, 5 6, 5 5)))",
        ),
        # contained polygon collapses into the container
        (
            "ARRAY['POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))', "
            "'POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))']",
            "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
        ),
        # all-null input -> null (reference returns null on no geometries)
        ("ARRAY[CAST(NULL AS VARCHAR)]", None),
    ]

    @pytest.mark.parametrize("arr,want", CASES)
    def test_cases(self, eng, arr, want):
        got = eng.sql(
            f"SELECT ST_AsText(geometry_union({arr})) AS w"
        ).collect()[0]["w"]
        assert got == want

    def test_mixed_collection(self, eng):
        got = eng.sql(
            "SELECT ST_AsText(geometry_union(ARRAY["
            "'POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))', 'POINT (1 1)', "
            "'POINT (9 9)', 'LINESTRING (0 5, 1 6)'])) AS w"
        ).collect()[0]["w"]
        assert got == (
            "GEOMETRYCOLLECTION (POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)), "
            "LINESTRING (0 5, 1 6), POINT (9 9))"
        )

    def test_permutation_invariant_point_set(self, eng):
        base = ["ST_Point(1.0, 1.0)", "ST_Point(2.0, 2.0)",
                "ST_Point(1.0, 1.0)"]
        results = set()
        for perm in ([0, 1, 2], [2, 1, 0], [1, 0, 2]):
            arr = "ARRAY[" + ", ".join(base[i] for i in perm) + "]"
            got = eng.sql(
                f"SELECT ST_AsText(geometry_union({arr})) AS w"
            ).collect()[0]["w"]
            # dedupe is set-semantics; emitted order follows first
            # occurrence, so compare as sets of points
            pts = got.replace("MULTIPOINT (", "").rstrip(")").split(", ")
            results.add(frozenset(pts))
        assert len(results) == 1


class TestCosineMapSignature:
    def test_documented_map_form(self, eng):
        got = eng.sql(
            "SELECT cosine_similarity(MAP(ARRAY['a', 'b'], ARRAY[1.0, 2.0]), "
            "MAP(ARRAY['b', 'c'], ARRAY[3.0, 4.0])) AS c"
        ).collect()[0]["c"]
        import math

        assert abs(got - (2 * 3) / (math.sqrt(5) * math.sqrt(25))) < 1e-12

    def test_key_join_not_positional(self, eng):
        # same values, keys shifted: positional dot would be wrong
        got = eng.sql(
            "SELECT cosine_similarity(MAP(ARRAY['a', 'b'], ARRAY[1.0, 2.0]), "
            "MAP(ARRAY['b', 'a'], ARRAY[1.0, 2.0])) AS c"
        ).collect()[0]["c"]
        # dot = 1*2 + 2*1 = 4; norms sqrt(5) each
        assert abs(got - 4.0 / 5.0) < 1e-12

    def test_array_form_still_works(self, eng):
        got = eng.sql(
            "SELECT cosine_similarity(ARRAY[3.0, 4.0], ARRAY[3.0, 4.0]) AS c"
        ).collect()[0]["c"]
        assert abs(got - 1.0) < 1e-12

    def test_map_columns_via_retry(self, eng, spark):
        spark.sql(
            "SELECT map('x', CAST(3.0 AS DOUBLE)) AS m1, "
            "map('x', CAST(4.0 AS DOUBLE)) AS m2"
        ).createOrReplaceTempView("cm_cols")
        got = eng.sql(
            "SELECT cosine_similarity(m1, m2) AS c FROM cm_cols"
        ).collect()[0]["c"]
        assert abs(got - 1.0) < 1e-12


class TestMapAggSemantics:
    def test_first_wins_and_null_keys_dropped(self, eng, spark):
        spark.sql(
            "SELECT * FROM VALUES ('a', 1L), ('a', 9L), "
            "(CAST(NULL AS STRING), 5L), ('b', 2L) AS t(k, v)"
        ).createOrReplaceTempView("ma_r11")
        r = eng.sql(
            "SELECT element_at(map_agg(k, v), 'a') AS va, "
            "cardinality(map_agg(k, v)) AS n FROM ma_r11"
        ).collect()[0]
        # KeyValuePairs.java:122: only the FIRST value per key is kept;
        # null keys never enter the map
        assert r["va"] == 1 and r["n"] == 2

    def test_map_union_first_wins(self, eng, spark):
        spark.sql(
            "SELECT 1 AS ord, map('k', 10L) AS m "
            "UNION ALL SELECT 2, map('k', 99L)"
        ).createOrReplaceTempView("mu_r11")
        r = eng.sql(
            "SELECT element_at(map_union(m), 'k') AS v FROM "
            "(SELECT m FROM mu_r11 ORDER BY ord)"
        ).collect()[0]["v"]
        assert r in (10, 99)  # 'arbitrary map's value' — but exactly one


class TestRegexpTwoArgDefaults:
    def test_regexp_extract_group0(self, eng):
        # Trino 2-arg = whole match; Spark's default group 1 returned the
        # group (wrong result) or errored without groups
        r = eng.sql(
            "SELECT regexp_extract('a1b22c', '[0-9]+') AS whole, "
            "regexp_extract('a1b22c', '([a-z])([0-9]+)', 2) AS grp2, "
            "regexp_extract_all('a1b22c', '[0-9]+') AS alls, "
            "regexp_replace('a1b22c', '[0-9]+') AS removed"
        ).collect()[0]
        assert r["whole"] == "1"
        assert r["grp2"] == "1"
        assert list(r["alls"]) == ["1", "22"]
        assert r["removed"] == "abc"


class TestMultiFooterGuard:
    def test_mixed_width_second_file_keeps_inference(self, spark, tmp_path):
        """A table whose FIRST file matches the declared widths but whose
        LAST doesn't must take the inference path (field-id resolution),
        not the explicit-schema fast path (VERDICT r10 #7 — the one-footer
        sample trusted files[0] for all files)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from trino_private_spark.sources.iceberg import IcebergTable

        eng = Engine(spark)
        spark.range(4).select(
            F.col("id").cast("bigint").alias("k")
        ).createOrReplaceTempView("mixw_src")
        loc = str(tmp_path / "mixw")
        eng.ctas(
            "mixw_t", "SELECT k FROM mixw_src", path=loc, fmt="iceberg"
        )
        t = IcebergTable(loc)
        files = [f.path for f in t.data_files()]
        assert files
        # rewrite ONE data file with a narrower physical width (int32)
        # under the same name — an externally-written file
        victim = sorted(files)[-1]
        tbl = pq.read_table(victim)
        narrow = tbl.cast(pa.schema([pa.field("k", pa.int32())]))
        pq.write_table(narrow, victim)
        out = IcebergTable(loc).read(spark)
        assert dict(out.dtypes)["k"] == "bigint"
        assert out.count() == 4
