"""Unit tests for the fourth straggler sweep of the Trino function registry:
bitwise scalar family (BitwiseFunctions.java), calendar aliases and
millisecond (DateTimeFunctions.java), starts_with (StringFunctions.java),
try_cast (TryCastFunction.java), map constructor (MapConstructor.java),
url_extract_fragment/port (UrlFunctions.java), json_array_contains
(JsonFunctions.java:229), murmur3 (VarbinaryFunctions.java:288 via
io.airlift.slice.Murmur3Hash128), current_groups (SessionFunctions).
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from trino_private_spark.functions.registry import (
    AGGREGATE_ALIASES,
    TRINO_FUNCTIONS as T,
    _murmur3_x64_128,
)


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_bitwise_scalars(spark):
    # Expected values from BitwiseFunctions.java semantics (64-bit two's complement)
    assert one(spark, T["bitwise_and"](F.lit(19), F.lit(25))) == 17
    assert one(spark, T["bitwise_or"](F.lit(19), F.lit(25))) == 27
    assert one(spark, T["bitwise_xor"](F.lit(19), F.lit(25))) == 10
    assert one(spark, T["bitwise_and"](F.lit(-1), F.lit(12345))) == 12345


def test_bitwise_shifts_not_mod_64(spark):
    # Trino: shift >= 64 fully shifts out (NOT Java's mod-64 behavior)
    assert one(spark, T["bitwise_left_shift"](F.lit(1), F.lit(2))) == 4
    assert one(spark, T["bitwise_left_shift"](F.lit(1), F.lit(64))) == 0
    assert one(spark, T["bitwise_right_shift"](F.lit(8), F.lit(2))) == 2
    assert one(spark, T["bitwise_right_shift"](F.lit(-1), F.lit(64))) == 0
    # logical right shift of a negative fills with zeros
    assert one(spark, T["bitwise_right_shift"](F.lit(-8), F.lit(60))) == 15
    # arithmetic right shift sign-extends, and >= 64 yields all sign bits
    assert one(spark, T["bitwise_right_shift_arithmetic"](F.lit(-8), F.lit(2))) == -2
    assert one(spark, T["bitwise_right_shift_arithmetic"](F.lit(-8), F.lit(100))) == -1
    assert one(spark, T["bitwise_right_shift_arithmetic"](F.lit(8), F.lit(100))) == 0


def test_calendar_aliases(spark):
    ts = F.lit("2024-02-29 10:11:12.345").cast("timestamp")
    assert one(spark, T["date"](ts)) == datetime.date(2024, 2, 29)
    assert one(spark, T["millisecond"](ts)) == 345
    assert one(spark, T["from_iso8601_date"](F.lit("2024-02-29"))) == datetime.date(
        2024, 2, 29
    )


def test_starts_with(spark):
    assert one(spark, T["starts_with"](F.lit("trino-spark"), F.lit("trino"))) is True
    assert one(spark, T["starts_with"](F.lit("trino-spark"), F.lit("spark"))) is False


def test_try_cast(spark):
    assert one(spark, T["try_cast"](F.lit("42"), "bigint")) == 42
    assert one(spark, T["try_cast"](F.lit("nope"), "bigint")) is None


def test_map_constructor(spark):
    assert one(spark, T["map"]()) == {}
    m = one(
        spark,
        T["map"](F.array(F.lit("a"), F.lit("b")), F.array(F.lit(1), F.lit(2))),
    )
    assert m == {"a": 1, "b": 2}


def test_url_fragment_port(spark):
    u = F.lit("https://user@example.com:8443/p/a?q=1#frag")
    assert one(spark, T["url_extract_fragment"](u)) == "frag"
    assert one(spark, T["url_extract_port"](u)) == 8443
    assert one(spark, T["url_extract_port"](F.lit("https://example.com/x"))) is None


def test_json_array_contains(spark):
    j = F.lit('[1, 2.5, "three", true, null]')
    assert one(spark, T["json_array_contains"](j, "three")) is True
    assert one(spark, T["json_array_contains"](j, 1)) is True
    assert one(spark, T["json_array_contains"](j, 2.5)) is True
    assert one(spark, T["json_array_contains"](j, True)) is True
    # 1 (number) must not match "1" (string), and vice versa
    assert one(spark, T["json_array_contains"](j, "1")) is False
    assert one(spark, T["json_array_contains"](F.lit('["1"]'), 1)) is False
    assert one(spark, T["json_array_contains"](F.lit("not json"), 1)) is None
    assert one(spark, T["json_array_contains"](F.lit('{"a":1}'), 1)) is None


def test_murmur3_reference_vectors():
    # Exact vectors from the reference's TestVarbinaryFunctions.java:327-328
    assert _murmur3_x64_128(b"").hex().upper() == "00000000000000000000000000000000"
    assert (
        _murmur3_x64_128(b"hashme").hex().upper()
        == "93192FE805BE23041C8318F67EC4F2BC"
    )


def test_murmur3_column(spark):
    got = one(spark, T["murmur3"](F.lit(b"hashme")))
    assert bytes(got).hex().upper() == "93192FE805BE23041C8318F67EC4F2BC"
    assert one(spark, T["murmur3"](F.lit(None).cast("binary"))) is None


def test_current_groups(spark):
    assert one(spark, T["current_groups"]()) == []


def test_hll_aggregate_aliases():
    assert AGGREGATE_ALIASES["approx_set"] == "hll_sketch_agg"
    assert AGGREGATE_ALIASES["merge"] == "hll_union_agg"


def test_spooky_hash_v2_reference_vectors():
    """Vectors from the reference TestVarbinaryFunctions.java:341-344."""
    from trino_private_spark.functions.registry import _spooky_hash_v2_128

    h_empty, _ = _spooky_hash_v2_128(b"")
    assert h_empty.to_bytes(8, "big").hex().upper() == "232706FC6BF50919"
    h_hello, _ = _spooky_hash_v2_128(b"hello")
    assert h_hello.to_bytes(8, "big").hex().upper() == "3768826AD382E6CA"


def test_spooky_hash_v2_path_coverage():
    """Exercise every length class of the algorithm: <16 (tail only),
    16..31 (one 16-byte half block), >=32 (short 32-byte blocks),
    >=192 (long path, 96-byte Mix blocks), exact block boundaries."""
    from trino_private_spark.functions.registry import _spooky_hash_v2_128

    data = bytes(range(256)) * 2
    seen = set()
    for n in (0, 1, 8, 9, 15, 16, 17, 31, 32, 95, 96, 191, 192, 193, 287, 288, 500):
        h1, h2 = _spooky_hash_v2_128(data[:n])
        assert 0 <= h1 <= 0xFFFFFFFFFFFFFFFF and 0 <= h2 <= 0xFFFFFFFFFFFFFFFF
        assert (h1, h2) == _spooky_hash_v2_128(data[:n])  # deterministic
        seen.add((h1, h2))
    assert len(seen) == 17  # every length hashes differently


def test_spooky_hash_v2_column(spark):
    got64 = one(spark, T["spooky_hash_v2_64"](F.lit(b"hello")))
    assert bytes(got64).hex().upper() == "3768826AD382E6CA"
    got32 = one(spark, T["spooky_hash_v2_32"](F.lit(b"hello")))
    assert bytes(got32).hex().upper() == "D382E6CA"
    assert one(spark, T["spooky_hash_v2_64"](F.lit(None).cast("binary"))) is None
