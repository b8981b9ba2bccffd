"""TIME picos-of-day stand-in: parse/format round trip, wraparound add
(TimeFunctions.java:106 mod-day semantics incl. negatives), diff."""

from __future__ import annotations

from pyspark.sql import functions as F

from trino_private_spark.functions import timeofday as tod


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_parse_format_roundtrip(spark):
    picos = one(spark, tod.parse_time(F.lit("13:45:07.123")))
    assert picos == (
        13 * tod.PICOS_PER_HOUR
        + 45 * tod.PICOS_PER_MINUTE
        + 7 * tod.PICOS_PER_SECOND
        + 123 * tod.PICOS_PER_MILLI
    )
    assert one(spark, tod.time_format(F.lit(picos), 3)) == "13:45:07.123"
    assert one(spark, tod.time_format(F.lit(picos), 0)) == "13:45:07"


def test_extractions(spark):
    t = tod.parse_time(F.lit("23:59:58.999"))
    row = (
        spark.range(1)
        .select(
            tod.hour(t).alias("h"),
            tod.minute(t).alias("m"),
            tod.second(t).alias("s"),
            tod.millisecond(t).alias("ms"),
        )
        .collect()[0]
    )
    assert (row.h, row.m, row.s, row.ms) == (23, 59, 58, 999)


def test_add_wraps_forward_and_backward(spark):
    t = tod.parse_time(F.lit("23:00:00"))
    assert one(spark, tod.hour(tod.time_add("hour", F.lit(2), t))) == 1
    t0 = tod.parse_time(F.lit("01:00:00"))
    assert one(spark, tod.hour(tod.time_add("hour", F.lit(-2), t0))) == 23
    # delta larger than a day reduces mod day first (reference semantics)
    assert one(spark, tod.hour(tod.time_add("hour", F.lit(49), t0))) == 2


def test_trunc_and_diff(spark):
    t = tod.parse_time(F.lit("10:20:30.400"))
    assert one(spark, tod.time_trunc("minute", t)) == (
        10 * tod.PICOS_PER_HOUR + 20 * tod.PICOS_PER_MINUTE
    )
    t2 = tod.parse_time(F.lit("11:00:00"))
    assert one(spark, tod.time_diff("minute", t, t2)) == 39
    assert one(spark, tod.time_diff("minute", t2, t)) == -39


class TestTimeWithTimeZone:
    def test_parse_format_roundtrip(self, spark):
        from trino_private_spark.functions import timeofday as TOD
        import pyspark.sql.functions as F

        df = spark.createDataFrame(
            [(1, "10:15:30.123+05:30"), (2, "23:59:59.000-08:00"), (3, "00:00:00.000+00:00")],
            ["id", "s"],
        )
        out = df.select(
            "id", TOD.timetz_format(TOD.parse_timetz(F.col("s"))).alias("f")
        ).orderBy("id").collect()
        assert [r.f for r in out] == [
            "10:15:30.123+05:30", "23:59:59.000-08:00", "00:00:00.000+00:00"
        ]

    def test_utc_normalization_equates_instants(self, spark):
        from trino_private_spark.functions import timeofday as TOD
        import pyspark.sql.functions as F

        # 10:00+02:00 and 09:00+01:00 are the same instant (08:00 UTC)
        df = spark.createDataFrame(
            [("10:00:00.000+02:00", "09:00:00.000+01:00")], ["a", "b"]
        )
        row = df.select(
            TOD.timetz_to_utc_picos(TOD.parse_timetz(F.col("a"))).alias("ua"),
            TOD.timetz_to_utc_picos(TOD.parse_timetz(F.col("b"))).alias("ub"),
        ).collect()[0]
        assert row.ua == row.ub == 8 * 3600 * 10**12

    def test_at_offset_preserves_instant(self, spark):
        from trino_private_spark.functions import timeofday as TOD
        import pyspark.sql.functions as F

        df = spark.createDataFrame([("10:15:00.000+05:30",)], ["s"])
        t = TOD.parse_timetz(F.col("s"))
        moved = TOD.timetz_at_offset(t, F.lit(-300))  # -05:00
        row = df.select(
            TOD.timetz_format(moved).alias("f"),
            TOD.timetz_to_utc_picos(t).alias("u1"),
            TOD.timetz_to_utc_picos(moved).alias("u2"),
        ).collect()[0]
        assert row.u1 == row.u2
        assert row.f == "23:45:00.000-05:00"  # 04:45 UTC - 5h, wrapped

    def test_extraction_is_local(self, spark):
        from trino_private_spark.functions import timeofday as TOD
        import pyspark.sql.functions as F

        df = spark.createDataFrame([("10:15:30.000-08:00",)], ["s"])
        t = TOD.parse_timetz(F.col("s"))
        row = df.select(
            TOD.timetz_hour(t).alias("h"),
            TOD.timetz_minute(t).alias("m"),
            TOD.timetz_timezone_hour(t).alias("th"),
            TOD.timetz_timezone_minute(t).alias("tm"),
        ).collect()[0]
        assert (row.h, row.m) == (10, 15)
        assert (row.th, row.tm) == (-8, 0)

    def test_negative_half_hour_offset(self, spark):
        from trino_private_spark.functions import timeofday as TOD
        import pyspark.sql.functions as F

        df = spark.createDataFrame([("05:00:00.000-09:30",)], ["s"])
        t = TOD.parse_timetz(F.col("s"))
        row = df.select(
            TOD.timetz_timezone_hour(t).alias("th"),
            TOD.timetz_timezone_minute(t).alias("tm"),
            TOD.timetz_format(t).alias("f"),
        ).collect()[0]
        assert (row.th, row.tm) == (-9, -30)
        assert row.f == "05:00:00.000-09:30"
