"""TIME(p) probes: the picos-of-day BIGINT stand-in for Trino's TIME type
(functions/timeofday.py; reference operator/scalar/time/TimeFunctions.java).
The oracle replicates the picos arithmetic directly in DuckDB SQL."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.functions import timeofday as tod
from trino_private_spark.queries import T, probe


@probe(
    "p_time_of_day",
    oracle="""
    WITH t AS (
      SELECT event_id,
             (epoch_us(ts) % 86400000000) * 1000000 AS p
      FROM events WHERE event_id <= 500)
    SELECT event_id,
           p AS t_picos,
           p // 3600000000000000 AS hh,
           (p // 60000000000000) % 60 AS mi,
           (p // 1000000000000) % 60 AS ss,
           (p // 1000000000) % 1000 AS ms,
           (p // 60000000000000) * 60000000000000 AS t_minute,
           (p + 7 * 3600000000000000) % 86400000000000000 AS t_plus7h,
           (p - 0) // 60000000000000 AS mins_since_midnight,
           lpad(CAST(p // 3600000000000000 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((p // 60000000000000) % 60 AS VARCHAR), 2, '0') || ':' ||
           lpad(CAST((p // 1000000000000) % 60 AS VARCHAR), 2, '0') || '.' ||
           substr(lpad(CAST(p % 1000000000000 AS VARCHAR), 12, '0'), 1, 3) AS fmt
    FROM t ORDER BY event_id
    """,
    tags=("time",),
)
def p_time_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME extraction / trunc / wrap-add / diff / format over events.ts.
    Ref: TimeFunctions.java:47-168 (hour..millisecond, date_trunc,
    date_add mod-day wrap, date_diff)."""
    t = T(spark, sf_dir)
    p = tod.time_from_timestamp(F.col("ts"))
    return (
        t.events.where(F.col("event_id") <= 500)
        .select(
            "event_id",
            p.alias("t_picos"),
            tod.hour(p).alias("hh"),
            tod.minute(p).alias("mi"),
            tod.second(p).alias("ss"),
            tod.millisecond(p).alias("ms"),
            tod.time_trunc("minute", p).alias("t_minute"),
            tod.time_add("hour", F.lit(7), p).alias("t_plus7h"),
            tod.time_diff("minute", F.lit(0), p).alias("mins_since_midnight"),
            tod.time_format(p, 3).alias("fmt"),
        )
        .orderBy("event_id")
    )


@probe(
    "p_timetz",
    oracle="""
    WITH v AS (
      SELECT c_custkey,
             c_custkey % 86400 AS local_sec,
             (c_custkey % 53 - 26) * 30 AS off_min
      FROM customer WHERE c_custkey <= 500)
    SELECT c_custkey,
           CAST(local_sec // 3600 AS BIGINT) AS local_hour,
           CAST(((local_sec - off_min * 60) % 86400 + 86400) % 86400 AS BIGINT) AS utc_sec,
           CAST(TRUNC(off_min / 60.0) AS INT) AS tz_hour,
           CAST(off_min - TRUNC(off_min / 60.0) * 60 AS INT) AS tz_min
    FROM v ORDER BY c_custkey
    """,
    tags=("time",),
)
def p_timetz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME WITH TIME ZONE stand-in (functions/timeofday.py timetz family —
    the reference's LongTimeWithTimeZone picos+offsetMinutes packing):
    local extraction, UTC normalization with day wraparound, and
    truncate-toward-zero timezone_hour/minute, verified against
    closed-form integer arithmetic."""
    from trino_private_spark.functions import timeofday as TOD

    t = T(spark, sf_dir)
    v = t.customer.where(F.col("c_custkey") <= 500).select(
        "c_custkey",
        ((F.col("c_custkey") % 86400) * TOD.PICOS_PER_SECOND).alias("local_picos"),
        ((F.col("c_custkey") % 53 - 26) * 30).alias("off_min"),
    )
    tz = TOD.timetz(F.col("local_picos"), F.col("off_min"))
    return v.select(
        "c_custkey",
        TOD.timetz_hour(tz).cast("long").alias("local_hour"),
        (TOD.timetz_to_utc_picos(tz) / TOD.PICOS_PER_SECOND)
        .cast("long")
        .alias("utc_sec"),
        TOD.timetz_timezone_hour(tz).cast("int").alias("tz_hour"),
        TOD.timetz_timezone_minute(tz).cast("int").alias("tz_min"),
    ).orderBy("c_custkey")


@probe(
    "p_timestamp_hp",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS sec_str,
             (o_orderkey * 815365) % 900000000000 AS frac12
      FROM orders WHERE o_orderkey <= 2000)
    SELECT o_orderkey,
           sec_str || '.' || lpad(CAST(frac12 AS VARCHAR), 12, '0') AS hp_str,
           CAST(frac12 // 1000 AS BIGINT) AS nanos,
           CAST(frac12 % 1000000 AS BIGINT) AS pico_rem,
           sec_str || '.' || lpad(CAST(frac12 // 1000 + o_orderkey % 1000 AS VARCHAR), 9, '0') AS plus_ns
    FROM base ORDER BY o_orderkey
    """,
    tags=("temporal",),
)
def p_timestamp_hp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP(12) via the LongTimestamp struct layout
    (functions/timestamp_hp.py — spi/type/LongTimestamp.java epochMicros +
    picosOfMicro): parse -> format round trip, picosecond extract,
    date_diff('picosecond') against the microsecond truncation, and
    date_add('nanosecond') — every output is closed-form string/integer
    arithmetic DuckDB replays exactly (fraction kept below 9e11 so the
    nanosecond add never carries into seconds)."""
    from trino_private_spark.functions import timestamp_hp as H

    t = T(spark, sf_dir)
    base = t.orders.where(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("sec_str"),
        ((F.col("o_orderkey") * 815365) % 900000000000).alias("frac12"),
    )
    s = F.concat(
        F.col("sec_str"), F.lit("."),
        F.lpad(F.col("frac12").cast("string"), 12, "0"),
    )
    hp = H.ts_hp_parse(s)
    return base.select(
        "o_orderkey",
        H.ts_hp_format(hp).alias("hp_str"),
        H.ts_hp_extract("nanosecond", hp).alias("nanos"),
        H.ts_hp_diff("picosecond", H.ts_hp_trunc("microsecond", hp), hp).alias("pico_rem"),
        H.ts_hp_format(
            H.ts_hp_add("nanosecond", F.col("o_orderkey") % 1000, hp), 9
        ).alias("plus_ns"),
    ).orderBy("o_orderkey")


@probe(
    "p_timestamptz",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS sec_str,
             (o_orderkey % 27 - 13) * 45 AS off_min,
             o_orderkey % 1000 AS ms
      FROM orders WHERE o_orderkey <= 2000),
    b2 AS (
      SELECT *,
             epoch_ms(strptime(sec_str, '%Y-%m-%d %H:%M:%S')) + ms
               - off_min * 60000 AS utc_ms
      FROM base)
    SELECT o_orderkey,
           sec_str || '.' || lpad(CAST(ms AS VARCHAR), 3, '0')
             || CASE WHEN off_min < 0 THEN '-' ELSE '+' END
             || lpad(CAST(abs(off_min) // 60 AS VARCHAR), 2, '0') || ':'
             || lpad(CAST(abs(off_min) % 60 AS VARCHAR), 2, '0') AS tz_str,
           CAST(utc_ms AS BIGINT) AS instant_ms,
           CAST((utc_ms // 3600000) % 24 AS BIGINT) AS utc_hour,
           CAST(off_min // 60 AS INT) AS tz_hour,
           CAST(off_min % 60 AS INT) AS tz_min
    FROM b2 ORDER BY o_orderkey
    """,
    tags=("temporal",),
)
def p_timestamptz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-value TIMESTAMP WITH TIME ZONE (functions/timestamptz.py — the
    TimestampWithTimeZoneType epochMillis + per-value zone packing, fixed
    offsets): parse -> canonical format round trip, the UTC instant, an
    hour extracted AFTER AT TIME ZONE '+00:00' (= UTC wall hour), and
    truncate-toward-zero timezone_hour/timezone_minute — all closed-form
    integer/string arithmetic for DuckDB.  Offsets span -9:45..+9:45 in
    45-minute steps, so sub-hour zones are exercised."""
    from trino_private_spark.functions import timestamptz as Z

    t = T(spark, sf_dir)
    base = t.orders.where(F.col("o_orderkey") <= 2000).select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("sec_str"),
        ((F.col("o_orderkey") % 27 - 13) * 45).alias("off_min"),
        (F.col("o_orderkey") % 1000).alias("ms"),
    )
    off = F.col("off_min")
    s = F.concat(
        F.col("sec_str"), F.lit("."), F.lpad(F.col("ms").cast("string"), 3, "0"),
        F.when(off < 0, "-").otherwise("+"),
        F.lpad((F.abs(off) / 60).cast("int").cast("string"), 2, "0"),
        F.lit(":"),
        F.lpad((F.abs(off) % 60).cast("string"), 2, "0"),
    )
    z = Z.parse_tstz(s)
    return base.select(
        "o_orderkey",
        Z.tstz_format(z).alias("tz_str"),
        Z.tstz_instant_millis(z).alias("instant_ms"),
        Z.tstz_extract("hour", Z.tstz_at_timezone(z, F.lit(0))).cast("long").alias("utc_hour"),
        Z.tstz_timezone_hour(z).alias("tz_hour"),
        Z.tstz_timezone_minute(z).alias("tz_min"),
    ).orderBy("o_orderkey")


@probe(
    "p_timestamptz_named",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CASE o_orderkey % 4
               WHEN 0 THEN 'America/New_York'
               WHEN 1 THEN 'Europe/Paris'
               WHEN 2 THEN 'Asia/Kolkata'
               ELSE 'UTC' END AS zone,
             CASE WHEN o_orderkey % 2 = 0 THEN '2023-07-01' ELSE '2023-01-01' END AS d,
             o_orderkey % 24 AS utc_hour
      FROM orders WHERE o_orderkey <= 1000),
    expect AS (
      SELECT *,
             -- tzdb facts: NY -4h Jul / -5h Jan; Paris +2h Jul / +1h Jan;
             -- Kolkata +5:30 always; UTC 0
             CASE zone
               WHEN 'America/New_York' THEN CASE WHEN d = '2023-07-01' THEN -240 ELSE -300 END
               WHEN 'Europe/Paris'     THEN CASE WHEN d = '2023-07-01' THEN  120 ELSE   60 END
               WHEN 'Asia/Kolkata'     THEN 330
               ELSE 0 END AS off_min
      FROM base)
    SELECT o_orderkey, zone,
           CAST(off_min AS INT) AS offset_minutes,
           CAST(((utc_hour * 60 + off_min) % 1440 + 1440) % 1440 // 60 AS BIGINT) AS local_hour,
           CAST(((utc_hour * 60 + off_min) % 1440 + 1440) % 1440 % 60 AS BIGINT) AS local_minute
    FROM expect ORDER BY o_orderkey
    """,
    tags=("temporal",),
)
def p_timestamptz_named(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NAMED tz-database zones with per-value DST resolution
    (functions/timestamptz.py named family — the TimeZoneKey registry
    path, resolved by the JVM tzdb per row via from_utc_timestamp over a
    zone COLUMN).  The oracle pins well-known tzdb facts: New York is
    -4h in July / -5h in January, Paris +2h/+1h, Kolkata +5:30 year-round
    — offset AND the local wall clock derived from them."""
    from trino_private_spark.functions import timestamptz as Z

    t = T(spark, sf_dir)
    base = t.orders.where(F.col("o_orderkey") <= 1000).select(
        "o_orderkey",
        F.element_at(
            F.array(
                F.lit("America/New_York"), F.lit("Europe/Paris"),
                F.lit("Asia/Kolkata"), F.lit("UTC"),
            ),
            (F.col("o_orderkey") % 4 + 1).cast("int"),
        ).alias("zone"),
        F.when(F.col("o_orderkey") % 2 == 0, "2023-07-01").otherwise("2023-01-01").alias("d"),
        (F.col("o_orderkey") % 24).alias("utc_hour"),
    )
    utc_str = F.concat(
        F.col("d"), F.lit(" "),
        F.lpad(F.col("utc_hour").cast("string"), 2, "0"), F.lit(":00:00+00:00"),
    )
    inst = Z.parse_tstz(utc_str)
    named = Z.tstz_named(Z.tstz_instant_millis(inst), F.col("zone"))
    return base.select(
        "o_orderkey",
        "zone",
        Z.tstz_named_offset_minutes(named).alias("offset_minutes"),
        Z.tstz_named_extract("hour", named).cast("long").alias("local_hour"),
        Z.tstz_named_extract("minute", named).cast("long").alias("local_minute"),
    ).orderBy("o_orderkey")
