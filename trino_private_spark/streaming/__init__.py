"""Structured Streaming operators over the events table.

The reference has no streaming runtime (SURVEY.md: Kafka/Kinesis/Redis are
batch connectors over streams) — this module is Spark-native surplus
capability: windowed aggregations with watermarks and custom stateful
sessionization, the operators a production events pipeline needs.
"""

from trino_private_spark.streaming.events import (
    events_stream,
    tumbling_counts,
    sliding_value_avg,
    sessionize,
)

__all__ = ["events_stream", "tumbling_counts", "sliding_value_avg", "sessionize"]
