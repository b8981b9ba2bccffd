"""Events-table probes: time-series batch shapes over the stream-shaped
table (reference treats streams as tables — plugin/trino-kafka; SURVEY §2.6).
The ns->µs truncation of `ts` matches DuckDB's own parquet read, so ts is
safe in oracle output at hour granularity and above."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trino_private_spark.queries import T, probe


@probe(
    "p_events_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS h, event_type,
           COUNT(*) AS n, ROUND(SUM(value), 4) AS sv
    FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 500
    """,
    tags=("events",),
)
def p_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling-window batch aggregation (the batch twin of
    streaming.tumbling_counts)."""
    t = T(spark, sf_dir)
    return (
        t.events.groupBy(
            F.date_trunc("hour", "ts").alias("h"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sv"))
        .orderBy("h", "event_type")
        .limit(500)
    )


@probe(
    "p_events_sessions",
    oracle="""
    WITH gaps AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id) > 1800000000
                  THEN 1 ELSE 0 END AS new_s
      FROM events),
    sess AS (
      SELECT user_id,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM gaps)
    SELECT user_id, COUNT(DISTINCT sid) AS n_sessions
    FROM sess GROUP BY user_id ORDER BY user_id LIMIT 200
    """,
    tags=("events",),
)
def p_events_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization in batch: gap > 30min starts a new session (the batch
    twin of streaming.sessionize). Built on lag + running sum windows —
    one shuffle on user_id. Tie-safe: both windows order by (ts, event_id);
    gap compared in epoch microseconds (second-truncation would misclassify
    gaps within 1s of the threshold)."""
    t = T(spark, sf_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    us = F.unix_micros(F.col("ts"))
    gaps = t.events.select(
        "user_id",
        "ts",
        "event_id",
        F.when(us - F.lag(us).over(w) > 1_800_000_000, 1).otherwise(0).alias("new_s"),
    )
    sess = gaps.select("user_id", F.sum("new_s").over(w_run).alias("sid"))
    return (
        sess.groupBy("user_id")
        .agg(F.countDistinct("sid").alias("n_sessions"))
        .orderBy("user_id")
        .limit(200)
    )


@probe(
    "p_events_pivot",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase
    FROM events GROUP BY user_id ORDER BY user_id LIMIT 200
    """,
    tags=("events",),
)
def p_events_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (conditional aggregation) — one pass, map-side partials."""
    t = T(spark, sf_dir)
    return (
        t.events.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase"])
        .count()
        .na.fill(0, ["click", "view", "purchase"])
        .select(
            "user_id",
            F.col("click").alias("click"),
            F.col("view").alias("view"),
            F.col("purchase").alias("purchase"),
        )
        .orderBy("user_id")
        .limit(200)
    )


@probe(
    "p_events_topk_json",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, COUNT(*) AS n
    FROM events WHERE event_type = 'click'
    GROUP BY 1 ORDER BY n DESC, k LIMIT 20
    """,
    tags=("events",),
)
def p_events_topk_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + JSON extraction + top-k heavy hitters (exact)."""
    t = T(spark, sf_dir)
    return (
        t.events.where(F.col("event_type") == "click")
        .groupBy(
            F.get_json_object("props", "$.k").cast("bigint").alias("k")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "k")
        .limit(20)
    )


@probe(
    "p_kafka_count_columns",
    oracle="""
    SELECT COUNT(event_id) AS c_id, COUNT(user_id) AS c_user,
           COUNT(event_type) AS c_type, COUNT(value) AS c_value,
           COUNT(*) AS c_all,
           COUNT(CASE WHEN event_type = 'click' THEN user_id END) AS c_csv_user
    FROM events
    """,
    tags=("events", "bench"),
)
def p_kafka_count_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Kafka-scan benchmark shape (benchmarks/presto/
    kafka.yaml: count / count_column_{1,10,100} over decoded messages;
    decoders lib/trino-record-decoder). Batch stand-in: each event row is
    serialized to a JSON message and a CSV message, pushed through the
    sources.decoders JSON/CSV paths (from_json/from_csv — JVM-side, the
    same expressions a kafka readStream value column uses), then
    per-column counted. Encode->decode->count keeps the decoder in the
    measured path while staying oracle-checkable against the undecoded
    table."""
    from trino_private_spark.sources.decoders import decoded_table

    t = T(spark, sf_dir)
    json_msgs = t.events.select(
        F.to_json(
            F.struct("event_id", "user_id", "event_type", "value", "props")
        ).alias("msg")
    )
    decoded = decoded_table(
        json_msgs,
        "msg",
        "json",
        "event_id bigint, user_id bigint, event_type string, value double, props string",
    )
    csv_msgs = t.events.where(F.col("event_type") == "click").select(
        F.concat_ws("|", "event_id", "user_id", "event_type").alias("msg")
    )
    csv_decoded = decoded_table(
        csv_msgs,
        "msg",
        "csv",
        "event_id bigint, user_id bigint, event_type string",
        sep="|",
    )
    counts = decoded.agg(
        F.count("event_id").alias("c_id"),
        F.count("user_id").alias("c_user"),
        F.count("event_type").alias("c_type"),
        F.count("value").alias("c_value"),
        F.count(F.lit(1)).alias("c_all"),
    )
    csv_counts = csv_decoded.agg(F.count("user_id").alias("c_csv_user"))
    return counts.crossJoin(csv_counts)


@probe(
    "p_avro_decode",
    oracle="""
    SELECT event_id, event_type, ROUND(value, 6) AS value
    FROM events WHERE event_id <= 500 ORDER BY event_id
    """,
    tags=("sources",),
)
def p_avro_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AVRO record decoder (sources/decoders.decode_avro — pure-Python
    Avro binary per the public spec; the reference's
    decoder/avro/AvroRowDecoder.java path): events rows are encoded to
    Avro binary (zigzag varints, length-prefixed strings, null union) and
    decoded back — the oracle is simply the original columns."""
    import json

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from trino_private_spark.sources.decoders import (
        _EVENT_AVRO_SCHEMA,
        _avro_event_encoder,
        decode_avro,
    )

    t = T(spark, sf_dir)
    enc = _avro_event_encoder()
    payload = t.events.where(F.col("event_id") <= 500).select(
        enc(F.col("event_id"), F.col("event_type"), F.col("value")).alias("b")
    )
    target = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    dec = payload.select(
        decode_avro(F.col("b"), json.dumps(_EVENT_AVRO_SCHEMA), target).alias("r")
    )
    return dec.select(
        F.col("r.event_id").alias("event_id"),
        F.col("r.event_type").alias("event_type"),
        F.round(F.col("r.value"), 6).alias("value"),
    ).orderBy("event_id")
