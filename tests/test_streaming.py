"""Structured Streaming: the streaming result of each operator must equal
the batch result of the same transform (Structured Streaming's contract),
exercised with the availableNow trigger into a memory sink."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE, compare_frames
from trino_private_spark.catalog import load_table
from trino_private_spark.streaming.events import (
    events_stream,
    run_stream_to_memory,
    sessionize,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def batch_events(spark):
    return load_table(spark, SF_SMOKE, "events")


def test_tumbling_counts_stream_equals_batch(spark, batch_events):
    batch = tumbling_counts(batch_events).toPandas()
    stream = events_stream(spark, SF_SMOKE)
    got = run_stream_to_memory(
        spark, tumbling_counts(stream), "t_tumbling"
    ).toPandas()
    compare_frames(got, batch, "tumbling stream==batch")


def test_sessionize_stream_runs(spark, batch_events):
    batch = sessionize(batch_events).toPandas()
    assert len(batch) > 0
    stream = events_stream(spark, SF_SMOKE)
    got = run_stream_to_memory(spark, sessionize(stream), "t_sessions").toPandas()
    # session windows in complete mode over a bounded stream == batch result
    compare_frames(got, batch, "sessionize stream==batch")
