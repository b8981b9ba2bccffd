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
