"""TIMESTAMP(p>6) — LongTimestamp struct layout (functions/timestamp_hp.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trino_private_spark.functions import timestamp_hp as H


def one(spark, col):
    return spark.range(1).select(col.alias("v")).head()["v"]


class TestParseFormat:
    def test_roundtrip_12_digits(self, spark):
        s = "2023-06-15 10:20:30.123456789012"
        got = one(spark, H.ts_hp_format(H.ts_hp_parse(F.lit(s))))
        assert got == s

    def test_parse_fields(self, spark):
        v = one(spark, H.ts_hp_parse(F.lit("2023-06-15 10:20:30.123456789012")))
        assert v["micros"] % 1_000_000 == 123456
        assert v["picos"] == 789012

    def test_short_fraction_pads(self, spark):
        got = one(spark, H.ts_hp_format(H.ts_hp_parse(F.lit("2023-06-15 10:20:30.5"))))
        assert got == "2023-06-15 10:20:30.500000000000"

    def test_no_fraction(self, spark):
        v = one(spark, H.ts_hp_parse(F.lit("2023-06-15 10:20:30")))
        assert v["picos"] == 0 and v["micros"] % 1_000_000 == 0

    def test_precision_rendering(self, spark):
        t = H.ts_hp_parse(F.lit("2023-06-15 10:20:30.123456789012"))
        assert one(spark, H.ts_hp_format(t, 9)) == "2023-06-15 10:20:30.123456789"
        assert one(spark, H.ts_hp_format(t, 0)) == "2023-06-15 10:20:30"

    def test_iso_t_separator(self, spark):
        got = one(spark, H.ts_hp_format(H.ts_hp_parse(F.lit("2023-06-15T10:20:30.25"))))
        assert got.startswith("2023-06-15 10:20:30.25")


class TestRoundTrunc:
    def test_round_to_nanos(self, spark):
        t = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.000000000500"))
        assert one(spark, H.ts_hp_format(H.ts_hp_round(t, 9), 9)) == "2023-01-01 00:00:00.000000001"

    def test_round_carries_into_micros(self, spark):
        t = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.000000999999"))
        v = one(spark, H.ts_hp_round(t, 9))
        assert v["micros"] % 1_000_000 == 1 and v["picos"] == 0

    def test_round_to_millis(self, spark):
        t = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.123500000000"))
        assert one(spark, H.ts_hp_format(H.ts_hp_round(t, 3), 3)) == "2023-01-01 00:00:00.124"

    def test_trunc_nanosecond(self, spark):
        t = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.123456789999"))
        assert one(spark, H.ts_hp_format(H.ts_hp_trunc("nanosecond", t))) == "2023-01-01 00:00:00.123456789000"

    def test_trunc_second(self, spark):
        t = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.987654321000"))
        assert one(spark, H.ts_hp_format(H.ts_hp_trunc("second", t), 0)) == "2023-01-01 00:00:00"


class TestAddDiff:
    def test_add_picos_carry(self, spark):
        t = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.000000999999"))
        v = one(spark, H.ts_hp_add("picosecond", F.lit(1), t))
        assert v["picos"] == 0 and v["micros"] % 1_000_000 == 1

    def test_add_negative_picos_borrow(self, spark):
        t = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.000001000000"))
        v = one(spark, H.ts_hp_add("picosecond", F.lit(-1), t))
        assert v["picos"] == 999_999 and v["micros"] % 1_000_000 == 0

    def test_add_nanos(self, spark):
        t = H.ts_hp_parse(F.lit("2023-01-01 00:00:00"))
        got = one(spark, H.ts_hp_format(H.ts_hp_add("nanosecond", F.lit(1234), t)))
        assert got == "2023-01-01 00:00:00.000001234000"

    def test_diff_picos(self, spark):
        a = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.000000000001"))
        b = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.000000001001"))
        assert one(spark, H.ts_hp_diff("picosecond", a, b)) == 1000
        assert one(spark, H.ts_hp_diff("nanosecond", a, b)) == 1

    def test_diff_seconds_truncates_toward_zero(self, spark):
        a = H.ts_hp_parse(F.lit("2023-01-01 00:00:00.5"))
        b = H.ts_hp_parse(F.lit("2023-01-01 00:00:02.0"))
        assert one(spark, H.ts_hp_diff("second", a, b)) == 1
        assert one(spark, H.ts_hp_diff("second", b, a)) == -1

    def test_diff_subunit_picos_tiebreak(self, spark):
        # exactly -2 seconds plus +1 pico -> -1 (trunc toward zero)
        a = H.ts_hp_parse(F.lit("2023-01-01 00:00:02"))
        b = H.ts_hp_add("picosecond", F.lit(1), H.ts_hp_parse(F.lit("2023-01-01 00:00:00")))
        assert one(spark, H.ts_hp_diff("second", a, b)) == -1

    def test_diff_days(self, spark):
        a = H.ts_hp_parse(F.lit("2023-01-01 12:00:00"))
        b = H.ts_hp_parse(F.lit("2023-03-01 11:59:59.999999999999"))
        assert one(spark, H.ts_hp_diff("day", a, b)) == 58


class TestExtractOrdering:
    def test_extract_fields(self, spark):
        t = H.ts_hp_parse(F.lit("2023-06-15 10:20:30.123456789012"))
        assert one(spark, H.ts_hp_extract("picosecond", t)) == 123456789012
        assert one(spark, H.ts_hp_extract("nanosecond", t)) == 123456789
        assert one(spark, H.ts_hp_extract("microsecond", t)) == 123456
        assert one(spark, H.ts_hp_extract("year", t)) == 2023

    def test_struct_ordering_sorts_on_picos(self, spark):
        rows = [
            ("b", "2023-01-01 00:00:00.000000000002"),
            ("a", "2023-01-01 00:00:00.000000000001"),
            ("c", "2023-01-01 00:00:00.000000000010"),
        ]
        df = spark.createDataFrame(rows, "tag string, s string")
        got = [
            r["tag"]
            for r in df.select("tag", H.ts_hp_parse(F.col("s")).alias("t"))
            .orderBy("t")
            .collect()
        ]
        assert got == ["a", "b", "c"]

    def test_invalid_units_raise(self, spark):
        t = H.ts_hp_parse(F.lit("2023-01-01 00:00:00"))
        with pytest.raises(ValueError):
            H.ts_hp_trunc("fortnight", t)
        with pytest.raises(ValueError):
            H.ts_hp_add("week", F.lit(1), t)
