"""Unit tests for the third straggler sweep of the Trino function registry:
binary conversions, data-size/duration parsing, CDFs, Luhn, split_to_map
family, regexp extensions, ISO week-year. Reference implementations:
StringFunctions.java, VarbinaryFunctions.java, MathFunctions.java,
DateTimeFunctions.java, JoniRegexpFunctions.java (see registry docstrings).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from trino_private_spark.functions.registry import TRINO_FUNCTIONS as T


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_luhn_check(spark):
    # 79927398713 is the canonical valid Luhn example; flipping a digit breaks it.
    assert one(spark, T["luhn_check"](F.lit("79927398713"))) is True
    assert one(spark, T["luhn_check"](F.lit("79927398714"))) is False
    assert one(spark, T["luhn_check"](F.lit("4242424242424242"))) is True
    assert one(spark, T["luhn_check"](F.lit("not-digits"))) is False


def test_split_to_map(spark):
    m = one(spark, T["split_to_map"](F.lit("a=1,b=2"), ",", "="))
    assert m == {"a": "1", "b": "2"}


def test_split_to_multimap(spark):
    m = one(spark, T["split_to_multimap"](F.lit("a=1,b=2,a=3"), ",", "="))
    assert m == {"a": ["1", "3"], "b": ["2"]}


def test_big_endian_64_roundtrip(spark):
    for v in (0, 1, -1, 2**62, -(2**62), 9007199254740993):
        b = one(spark, T["to_big_endian_64"](F.lit(v)))
        assert len(b) == 8 and b == v.to_bytes(8, "big", signed=True)
        back = one(spark, T["from_big_endian_64"](F.lit(b)))
        assert back == v


def test_big_endian_32_roundtrip(spark):
    for v in (0, 1, -1, 2**31 - 1, -(2**31)):
        b = one(spark, T["to_big_endian_32"](F.lit(v)))
        assert len(b) == 4 and b == v.to_bytes(4, "big", signed=True)
        assert one(spark, T["from_big_endian_32"](F.lit(b))) == v


def test_ieee754_roundtrip(spark):
    for v in (0.0, 1.5, -3.25, math.pi):
        b = one(spark, T["to_ieee754_64"](F.lit(v)))
        assert len(b) == 8
        assert one(spark, T["from_ieee754_64"](F.lit(b))) == v
    b32 = one(spark, T["to_ieee754_32"](F.lit(1.5)))
    assert len(b32) == 4
    assert one(spark, T["from_ieee754_32"](F.lit(b32))) == 1.5


def test_parse_data_size(spark):
    assert int(one(spark, T["parse_data_size"](F.lit("2kB")))) == 2048
    assert int(one(spark, T["parse_data_size"](F.lit("2.3MB")))) == int(2.3 * 1024**2)
    assert int(one(spark, T["parse_data_size"](F.lit("42B")))) == 42


def test_parse_duration_and_to_milliseconds(spark):
    ms = one(spark, T["to_milliseconds"](T["parse_duration"](F.lit("5.4s"))))
    assert ms == 5400
    ms = one(spark, T["to_milliseconds"](T["parse_duration"](F.lit("2h"))))
    assert ms == 7200000
    ms = one(spark, T["to_milliseconds"](T["parse_duration"](F.lit("3ms"))))
    assert ms == 3


def test_timezone_hour_minute(spark):
    ts = F.to_timestamp(F.lit("2024-06-15 12:00:00"))
    assert one(spark, T["timezone_hour"](ts, "America/New_York")) == -4  # EDT
    assert one(spark, T["timezone_hour"](ts, "Asia/Kathmandu")) == 5
    assert one(spark, T["timezone_minute"](ts, "Asia/Kathmandu")) == 45
    assert one(spark, T["timezone_hour"](ts)) == 0


def test_from_unixtime_nanos(spark):
    ts = one(spark, T["from_unixtime_nanos"](F.lit(1_500_000_000_123_456_789)))
    assert ts.microsecond == 123456


def test_json_array_get(spark):
    j = F.lit('["a","b","c"]')
    assert one(spark, T["json_array_get"](j, 0)) == "a"
    assert one(spark, T["json_array_get"](j, 2)) == "c"
    assert one(spark, T["json_array_get"](j, -1)) == "c"


def test_regexp_count_position(spark):
    s = F.lit("1a 2b 14m")
    assert one(spark, T["regexp_count"](s, F.lit(r"\d+"))) == 3
    assert one(spark, T["regexp_position"](s, F.lit(r"\d+"))) == 1
    assert one(spark, T["regexp_position"](s, F.lit(r"[a-z]"))) == 2
    assert one(spark, T["regexp_position"](s, F.lit(r"x"))) == -1
    assert one(spark, T["regexp_position"](s, F.lit(r"\d+"), F.lit(3))) == 4


def test_normal_cdf(spark):
    # Known values: Phi(0)=0.5, Phi(1.96)≈0.975 (A-S approx good to 1.5e-7).
    assert abs(one(spark, T["normal_cdf"](0.0, 1.0, F.lit(0.0))) - 0.5) < 1e-7
    assert abs(one(spark, T["normal_cdf"](0.0, 1.0, F.lit(1.959964))) - 0.975) < 1e-5
    assert abs(one(spark, T["normal_cdf"](10.0, 2.0, F.lit(10.0))) - 0.5) < 1e-7


def test_inverse_normal_cdf(spark):
    assert abs(one(spark, T["inverse_normal_cdf"](0.0, 1.0, F.lit(0.975))) - 1.959964) < 1e-5
    assert abs(one(spark, T["inverse_normal_cdf"](5.0, 3.0, F.lit(0.5))) - 5.0) < 1e-9
    # round-trip
    p = one(spark, T["normal_cdf"](0.0, 1.0, F.lit(0.7)))
    assert abs(one(spark, T["inverse_normal_cdf"](0.0, 1.0, F.lit(p))) - 0.7) < 1e-5


def test_beta_cdf(spark):
    # Beta(1,1) is uniform: CDF(x)=x. Beta(2,2): CDF(0.5)=0.5 by symmetry.
    assert abs(one(spark, T["beta_cdf"](1.0, 1.0, F.lit(0.3))) - 0.3) < 1e-9
    assert abs(one(spark, T["beta_cdf"](2.0, 2.0, F.lit(0.5))) - 0.5) < 1e-9
    # Beta(2,1): CDF(x)=x^2
    assert abs(one(spark, T["beta_cdf"](2.0, 1.0, F.lit(0.6))) - 0.36) < 1e-9


def test_inverse_beta_cdf(spark):
    assert abs(one(spark, T["inverse_beta_cdf"](2.0, 1.0, F.lit(0.36))) - 0.6) < 1e-6
    p = one(spark, T["beta_cdf"](3.0, 5.0, F.lit(0.4)))
    assert abs(one(spark, T["inverse_beta_cdf"](3.0, 5.0, F.lit(p))) - 0.4) < 1e-6


def test_year_of_week(spark):
    # 2021-01-01 is a Friday in ISO week 53 of 2020.
    assert one(spark, T["year_of_week"](F.to_date(F.lit("2021-01-01")))) == 2020
    assert one(spark, T["year_of_week"](F.to_date(F.lit("2021-01-04")))) == 2021
    assert one(spark, T["yow"](F.to_date(F.lit("2019-12-30")))) == 2020  # Monday of wk 1 2020


def test_doy(spark):
    assert one(spark, T["doy"](F.to_date(F.lit("2024-02-01")))) == 32
