"""Per-value TIMESTAMP WITH TIME ZONE (functions/timestamptz.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trino_private_spark.functions import timestamptz as Z


def one(spark, col):
    return spark.range(1).select(col.alias("v")).head()["v"]


class TestParseFormat:
    def test_roundtrip(self, spark):
        s = "2023-06-15 10:20:30.123+05:30"
        assert one(spark, Z.tstz_format(Z.parse_tstz(F.lit(s)))) == s

    def test_negative_offset_roundtrip(self, spark):
        s = "2023-06-15 10:20:30.000-08:00"
        assert one(spark, Z.tstz_format(Z.parse_tstz(F.lit(s)))) == s

    def test_instant_is_utc(self, spark):
        # 10:00 at +02:00 == 08:00 UTC
        v = one(spark, Z.parse_tstz(F.lit("2023-01-01 10:00:00+02:00")))
        u = one(spark, Z.parse_tstz(F.lit("2023-01-01 08:00:00+00:00")))
        assert v["millis"] == u["millis"]
        assert v["offset_minutes"] == 120

    def test_same_instant_different_zones_equal_key(self, spark):
        a = Z.parse_tstz(F.lit("2023-01-01 10:00:00+02:00"))
        b = Z.parse_tstz(F.lit("2023-01-01 03:00:00-05:00"))
        assert one(spark, Z.tstz_instant_millis(a) == Z.tstz_instant_millis(b))


class TestZoneOps:
    def test_at_timezone_keeps_instant(self, spark):
        t = Z.parse_tstz(F.lit("2023-01-01 10:00:00+02:00"))
        moved = Z.tstz_at_timezone(t, F.lit(-300))
        assert one(spark, Z.tstz_format(moved)) == "2023-01-01 03:00:00.000-05:00"

    def test_extract_local_fields(self, spark):
        t = Z.parse_tstz(F.lit("2023-06-15 23:45:10.250+09:00"))
        assert one(spark, Z.tstz_extract("hour", t)) == 23
        assert one(spark, Z.tstz_extract("day", t)) == 15
        assert one(spark, Z.tstz_extract("millisecond", t)) == 250

    def test_timezone_hour_minute_truncate(self, spark):
        t = Z.parse_tstz(F.lit("2023-01-01 00:00:00-05:30"))
        assert one(spark, Z.tstz_timezone_hour(t)) == -5
        assert one(spark, Z.tstz_timezone_minute(t)) == -30


class TestArithmetic:
    def test_add_preserves_offset(self, spark):
        t = Z.parse_tstz(F.lit("2023-01-01 10:00:00+02:00"))
        got = one(spark, Z.tstz_format(Z.tstz_add("hour", F.lit(25), t)))
        assert got == "2023-01-02 11:00:00.000+02:00"

    def test_diff_zone_independent(self, spark):
        a = Z.parse_tstz(F.lit("2023-01-01 10:00:00+02:00"))
        b = Z.parse_tstz(F.lit("2023-01-01 03:30:00-05:00"))  # 08:30 UTC
        assert one(spark, Z.tstz_diff("minute", a, b)) == 30

    def test_diff_truncates_toward_zero(self, spark):
        a = Z.parse_tstz(F.lit("2023-01-01 00:00:00+00:00"))
        b = Z.parse_tstz(F.lit("2023-01-01 00:00:01.500+00:00"))
        assert one(spark, Z.tstz_diff("second", a, b)) == 1
        assert one(spark, Z.tstz_diff("second", b, a)) == -1

    def test_ordering_by_instant(self, spark):
        rows = [
            ("late", "2023-01-01 23:00:00+10:00"),   # 13:00 UTC
            ("early", "2023-01-01 05:00:00-05:00"),  # 10:00 UTC
        ]
        df = spark.createDataFrame(rows, "tag string, s string")
        got = [
            r["tag"]
            for r in df.select("tag", Z.parse_tstz(F.col("s")).alias("t"))
            .orderBy("t")
            .collect()
        ]
        assert got == ["early", "late"]

    def test_bad_units_raise(self, spark):
        t = Z.parse_tstz(F.lit("2023-01-01 00:00:00+00:00"))
        with pytest.raises(ValueError):
            Z.tstz_add("month", F.lit(1), t)
        with pytest.raises(ValueError):
            Z.tstz_diff("year", t, t)


class TestNamedZones:
    def test_parse_format_roundtrip(self, spark):
        s = "2023-07-01 12:30:45.120 America/New_York"
        got = one(spark, Z.tstz_named_format(Z.parse_tstz_named(F.lit(s))))
        assert got == s

    def test_dst_offsets(self, spark):
        summer = Z.parse_tstz_named(F.lit("2023-07-01 12:00:00 America/New_York"))
        winter = Z.parse_tstz_named(F.lit("2023-01-01 12:00:00 America/New_York"))
        assert one(spark, Z.tstz_named_offset_minutes(summer)) == -240  # EDT
        assert one(spark, Z.tstz_named_offset_minutes(winter)) == -300  # EST

    def test_instant_is_utc(self, spark):
        # 12:00 EDT == 16:00 UTC
        v = one(spark, Z.parse_tstz_named(F.lit("2023-07-01 12:00:00 America/New_York")))
        u = one(spark, Z.parse_tstz(F.lit("2023-07-01 16:00:00+00:00")))
        assert v["millis"] == u["millis"]

    def test_at_timezone_across_zones(self, spark):
        t = Z.parse_tstz_named(F.lit("2023-07-01 12:00:00 America/New_York"))
        moved = Z.tstz_named_at_timezone(t, F.lit("Asia/Kolkata"))
        # 16:00 UTC -> 21:30 IST
        assert one(spark, Z.tstz_named_format(moved)) == "2023-07-01 21:30:00.000 Asia/Kolkata"

    def test_extract_local_dst_aware(self, spark):
        t = Z.parse_tstz_named(F.lit("2023-07-01 23:30:00 Europe/Paris"))
        assert one(spark, Z.tstz_named_extract("hour", t)) == 23
        assert one(spark, Z.tstz_named_extract("day", t)) == 1
        # same instant in UTC is 21:30 the same day
        u = Z.tstz_named_at_timezone(t, F.lit("UTC"))
        assert one(spark, Z.tstz_named_extract("hour", u)) == 21

    def test_half_hour_zone(self, spark):
        t = Z.parse_tstz_named(F.lit("2023-01-01 00:00:00 Asia/Kolkata"))
        assert one(spark, Z.tstz_named_offset_minutes(t)) == 330
