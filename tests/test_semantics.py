"""Semantic-fidelity tests (SURVEY.md §7 'semantics traps'): the behaviors
where Trino and stock Spark disagree, pinned to the Trino-compatible side
under the engine session (ANSI on, EXCEPTION map-key policy, UTC)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException


def test_ansi_int_overflow_errors(spark):
    """Trino errors on bigint overflow; ANSI mode matches
    (vs legacy Spark silent wraparound)."""
    with pytest.raises(Exception) as e:
        spark.sql("SELECT 9223372036854775807 + CAST(1 AS BIGINT)").collect()
    assert "overflow" in str(e.value).lower() or "ARITHMETIC" in str(e.value)


def test_ansi_divide_by_zero_errors(spark):
    """Trino: division by zero -> error (DecimalOperators); ANSI matches."""
    with pytest.raises(Exception) as e:
        spark.sql("SELECT 1/0").collect()
    assert "DIVIDE_BY_ZERO" in str(e.value) or "zero" in str(e.value).lower()


def test_try_divide_returns_null(spark):
    """Trino try(x/y) -> NULL; Spark try_divide."""
    assert spark.sql("SELECT try_divide(1, 0) AS v").collect()[0].v is None


def test_duplicate_map_keys_raise(spark):
    """Trino raises DuplicateMapKeyException; engine sets
    spark.sql.mapKeyDedupPolicy=EXCEPTION to match."""
    assert spark.conf.get("spark.sql.mapKeyDedupPolicy") == "EXCEPTION"
    with pytest.raises(Exception) as e:
        spark.sql("SELECT map_from_arrays(array(1,1), array('a','b'))").collect()
    assert "DUPLICATED_MAP_KEY" in str(e.value) or "duplicate" in str(e.value).lower()


def test_element_at_one_based_and_oob(spark):
    """Trino subscripts are 1-based and error out-of-bounds under ANSI."""
    row = spark.sql(
        "SELECT element_at(array(10,20,30), 1) AS first, "
        "element_at(array(10,20,30), -1) AS last"
    ).collect()[0]
    assert (row.first, row.last) == (10, 30)
    with pytest.raises(Exception):
        spark.sql("SELECT element_at(array(1), 5)").collect()


def test_invalid_cast_errors_and_try_cast_nulls(spark):
    """Trino CAST('abc' AS INTEGER) errors; try_cast -> NULL."""
    with pytest.raises(Exception):
        spark.sql("SELECT CAST('abc' AS INT)").collect()
    assert spark.sql("SELECT try_cast('abc' AS INT) AS v").collect()[0].v is None


def test_null_ordering_explicit(spark):
    """Spark default ASC = NULLS FIRST, Trino = NULLS LAST: probes must spell
    it out. Verify both orders are honored when explicit."""
    df = spark.createDataFrame([(1,), (None,), (2,)], "v int")
    first = [r.v for r in df.orderBy(F.col("v").asc_nulls_last()).collect()]
    assert first == [1, 2, None]
    last = [r.v for r in df.orderBy(F.col("v").asc_nulls_first()).collect()]
    assert last == [None, 1, 2]


def test_count_star_vs_count_col(spark):
    df = spark.createDataFrame([(1,), (None,), (2,)], "v int")
    row = df.agg(
        F.count(F.lit(1)).alias("star"), F.count("v").alias("col")
    ).collect()[0]
    assert (row.star, row.col) == (3, 2)


def test_substr_semantics(spark):
    """Trino substr: 1-based; negative start counts from the end."""
    row = spark.sql(
        "SELECT substr('hello', 2, 3) AS mid, substr('hello', -3) AS tail"
    ).collect()[0]
    assert (row.mid, row.tail) == ("ell", "llo")


def test_split_no_limit_keeps_empty_trailing(spark):
    """Trino split('a,b,,',',') keeps empties; Spark split with -1 limit
    matches (default drops trailing empties in some engines)."""
    row = spark.sql("SELECT split('a,b,,', ',', -1) AS parts").collect()[0]
    assert row.parts == ["a", "b", "", ""]


def test_session_timezone_utc(spark):
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_decimal_division_scale(spark):
    """Decimal division result scale (Trino: max(6, s1+p2+1) capped at 38;
    Spark: similar ANSI rules) — pin the engine's actual behavior."""
    row = spark.sql(
        "SELECT CAST(1 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2)) AS q"
    ).collect()[0]
    assert abs(float(row.q) - 1 / 3) < 1e-6
