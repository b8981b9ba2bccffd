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


def test_budget_sessionize_stateful(spark):
    """Custom stateful operator (applyInPandasWithState): sessions close on a
    value budget; verify emitted sessions respect the budget invariant."""
    import os
    from trino_private_spark.streaming.stateful import budget_sessionize

    stream = events_stream(spark, SF_SMOKE)
    out = budget_sessionize(stream, value_budget=50.0)
    q = (
        out.writeStream.format("memory")
        .queryName("t_budget_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/tps_ckpt_budget_{os.getpid()}")
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_budget_sessions").collect()
    assert len(got) > 0
    # every closed session crossed the budget exactly once
    assert all(r.total_value >= 50.0 for r in got)
    assert all(r.n_events >= 1 for r in got)


def test_catalog_shims(spark):
    from trino_private_spark.catalog import (
        analyze_table_stats,
        information_schema_columns,
        information_schema_tables,
        register_tables,
    )

    register_tables(spark, SF_SMOKE)
    tables = {r.table_name for r in information_schema_tables(spark).collect()}
    assert {"orders", "lineitem", "nation"} <= tables
    cols = information_schema_columns(spark, "nation").collect()
    assert [c.column_name for c in cols] == ["n_nationkey", "n_name", "n_regionkey"]
    stats = {r.column_name: r for r in analyze_table_stats(spark, "nation").collect()}
    assert stats["n_nationkey"].null_fraction == 0.0
    assert stats["n_nationkey"].row_count == 25
    assert 20 <= stats["n_nationkey"].approx_ndv <= 30


def test_dedup_stream_equals_batch_distinct(spark, batch_events):
    """dropDuplicatesWithinWatermark over a stream with injected duplicates
    must converge to the batch distinct count (SURVEY.md §2.6: reference
    treats streams as static tables; our dedup is a real streaming
    operator with bounded state)."""
    from trino_private_spark.streaming.events import dedup_events

    batch_n = dedup_events(batch_events.union(batch_events)).count()
    stream = events_stream(spark, SF_SMOKE)
    doubled = stream.union(events_stream(spark, SF_SMOKE))
    got = run_stream_to_memory(
        spark, dedup_events(doubled), "t_dedup", output_mode="append"
    )
    assert got.count() == batch_n == batch_events.count()


def test_click_view_join_stream_equals_batch(spark, batch_events):
    """Stream-stream time-bounded inner join == the identical batch range
    join (append-mode rows are final, so the sets must match exactly)."""
    from trino_private_spark.streaming.events import click_view_join

    batch = click_view_join(batch_events).toPandas()
    assert len(batch) > 0, "fixture yields no click-view pairs; widen horizon"
    got = run_stream_to_memory(
        spark,
        click_view_join(events_stream(spark, SF_SMOKE)),
        "t_ssjoin",
        output_mode="append",
    ).toPandas()
    compare_frames(got, batch, "click-view join stream==batch")


def test_stream_static_enrich_equals_batch(spark, batch_events):
    """Stream-static broadcast join == identical batch join; the static dim
    must never force a stream shuffle."""
    from trino_private_spark.streaming.events import enrich_with_dim

    dim = spark.read.parquet(f"{SF_SMOKE}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    batch = (
        enrich_with_dim(batch_events, dim)
        .select("event_id", "c_mktsegment")
        .toPandas()
    )
    got = run_stream_to_memory(
        spark,
        enrich_with_dim(events_stream(spark, SF_SMOKE), dim).select(
            "event_id", "c_mktsegment"
        ),
        "t_enrich",
        output_mode="append",
    ).toPandas()
    compare_frames(got, batch, "stream-static enrich")


def test_parquet_sink_exactly_once_round_trip(spark, batch_events, tmp_path):
    """availableNow drain to a parquet sink: committed rows == source rows,
    and a second drain of the same (fully consumed) source commits nothing
    new — the checkpoint makes the sink idempotent."""
    from trino_private_spark.streaming.events import parquet_sink

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    parquet_sink(events_stream(spark, SF_SMOKE), out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == batch_events.count()
    parquet_sink(events_stream(spark, SF_SMOKE), out, ckpt)
    assert spark.read.parquet(out).count() == n1


def test_windowed_approx_distinct_stream_equals_batch(spark, batch_events):
    """Streaming HLL windows must equal the batch HLL of the same data AND
    sit within 5% of the exact per-window distinct count."""
    from trino_private_spark.streaming.events import windowed_approx_distinct

    batch = windowed_approx_distinct(batch_events).toPandas()
    stream = events_stream(spark, SF_SMOKE)
    got = run_stream_to_memory(
        spark, windowed_approx_distinct(stream), "t_whll"
    ).toPandas()
    compare_frames(got, batch, "windowed_approx_distinct stream==batch")

    exact = (
        batch_events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
        .toPandas()
    )
    merged = batch.merge(exact, on=["window_start", "event_type"])
    assert len(merged) == len(batch)
    rel = (merged["approx_users"] - merged["n"]).abs() / merged["n"].clip(lower=1)
    assert rel.max() <= 0.05, rel.max()


def test_windowed_quantile_sketch_stateful(spark, batch_events):
    """Streaming t-digest state: last emission per (type, window) must agree
    with the exact batch quantiles within the digest's rank-error bound."""
    import os
    from trino_private_spark.streaming.stateful import windowed_quantile_sketch

    stream = events_stream(spark, SF_SMOKE)
    out = windowed_quantile_sketch(stream, width_s=86400 * 7)
    q = (
        out.writeStream.format("memory")
        .queryName("t_win_quant")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/tps_ckpt_quant_{os.getpid()}")
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("t_win_quant").toPandas()
    assert len(got) > 0
    # keep the highest-n (latest) emission per key
    last = got.sort_values("n").groupby(["event_type", "window_start"]).tail(1)
    batch = batch_events.toPandas()
    batch["window_start"] = (
        batch.ts.astype("int64") // 10**9 // (86400 * 7) * (86400 * 7)
    ).astype("datetime64[s]")
    for _, row in last.iterrows():
        vals = batch[
            (batch.event_type == row.event_type)
            & (batch.window_start == row.window_start)
        ].value.to_numpy()
        assert len(vals) == row.n
        for q_, est in ((0.5, row.p50), (0.9, row.p90)):
            err = abs((vals <= est).mean() - q_)
            assert err <= max(0.011, 2.0 / len(vals)), (row.event_type, q_, err)


def test_rising_run_detector_stream_equals_batch(spark, batch_events):
    """Streaming rising-chain detection must find exactly the chains the
    batch lag/island query finds (one emission per chain reaching k)."""
    import os
    from trino_private_spark.streaming.stateful import (
        rising_run_detector,
        rising_runs_batch,
    )

    k = 3
    stream = events_stream(spark, SF_SMOKE)
    out = rising_run_detector(stream, k=k)
    q = (
        out.writeStream.format("memory")
        .queryName("t_rising")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/tps_ckpt_rising_{os.getpid()}")
        .start()
    )
    q.awaitTermination(120)
    got = (
        spark.table("t_rising")
        .groupBy("user_id")
        .count()
        .toPandas()
        .set_index("user_id")["count"]
        .to_dict()
    )
    want = (
        rising_runs_batch(batch_events, k=k)
        .toPandas()
        .set_index("user_id")["n_chains"]
        .to_dict()
    )
    assert len(want) > 0
    assert got == want


def test_click_view_left_outer_stream_equals_batch(spark, batch_events, tmp_path):
    """LEFT OUTER stream-stream join: unmatched clicks emit null-padded
    rows only after the watermark passes their match window, so the stream
    is split into TWO microbatches (maxFilesPerTrigger=1) — batch 2's
    events advance the watermark and flush batch 1's unmatched state.  The
    comparison is restricted to the watermark-CLOSED region, where stream
    output must equal the plain batch left range join exactly."""
    import os

    from trino_private_spark.streaming.events import (
        click_view_join_outer,
        run_stream_to_memory,
    )

    stream_dir = str(tmp_path / "two_batch_events")
    os.makedirs(stream_dir, exist_ok=True)
    bounds = batch_events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).head()
    lo, hi = bounds["lo"], bounds["hi"]
    split = lo + (hi - lo) * 6 // 10 if isinstance(hi, int) else lo + (hi - lo) * 0.6
    early = batch_events.where(F.col("ts") <= F.lit(split))
    late = batch_events.where(F.col("ts") > F.lit(split))
    assert early.count() > 0 and late.count() > 0
    for i, part in enumerate((early, late)):
        sub = str(tmp_path / f"w{i}")
        part.coalesce(1).write.mode("overwrite").parquet(sub)
        src = next(
            f for f in os.listdir(sub) if f.endswith(".parquet") and f.startswith("part-")
        )
        dst = os.path.join(stream_dir, f"{i}_batch.parquet")
        os.replace(os.path.join(sub, src), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    got = run_stream_to_memory(
        spark,
        click_view_join_outer(stream),
        "t_cv_outer",
        output_mode="append",
    ).toPandas()

    batch = click_view_join_outer(batch_events).toPandas()
    # closed region: watermark after batch 1 = max(early.ts) - 2h; clicks
    # whose whole match window is older than that (minus the 1h horizon)
    # are fully resolved in the stream output
    wm1 = early.agg(F.max("ts")).head()[0]
    import pandas as pd

    cutoff = pd.Timestamp(wm1) - pd.Timedelta(hours=3, minutes=5)
    got_c = got[pd.to_datetime(got["click_ts"]) <= cutoff]
    batch_c = batch[pd.to_datetime(batch["click_ts"]) <= cutoff]
    assert len(batch_c) > 0, "closed region must be non-trivial"
    assert (batch_c["view_id"].isna().sum()) > 0, "need real unmatched clicks"
    compare_frames(
        got_c.sort_values(["click_id", "view_id"]).reset_index(drop=True),
        batch_c.sort_values(["click_id", "view_id"]).reset_index(drop=True),
        "click_view_left_outer (closed region)",
    )


def test_streaming_match_recognize_equals_batch(spark, tmp_path):
    """Streaming MATCH_RECOGNIZE (bounded pattern, stateful tail buffer):
    the drained two-microbatch stream must equal the batch engine exactly —
    trailing non-matching rows in batch 2 decide every real match."""
    import os

    import pandas as pd

    from trino_private_spark.operators.row_pattern import vectorized
    from trino_private_spark.streaming.stateful import (
        batch_match_recognize_spans,
        streaming_match_recognize,
    )

    defines = {"up": vectorized(lambda p: p["v"] > p["v"].shift(1))}
    base = pd.Timestamp("2023-01-01")
    rows1, rows2 = [], []
    for uid in (1, 2):
        vals1 = [1, 2, 3, 1, 2, 3, 4, 5, 2] if uid == 1 else [5, 1, 2, 1, 7, 8]
        for i, v in enumerate(vals1):
            rows1.append((uid, (base + pd.Timedelta(minutes=i)).to_pydatetime(), float(v)))
        # trailing strictly-decreasing rows: no 'up' can start or extend here
        for j in range(6):
            rows2.append((uid, (base + pd.Timedelta(minutes=100 + j)).to_pydatetime(), float(-j)))

    stream_dir = str(tmp_path / "mr_stream")
    os.makedirs(stream_dir, exist_ok=True)
    for i, rows in enumerate((rows1, rows2)):
        sub = str(tmp_path / f"mrw{i}")
        spark.createDataFrame(
            rows, "user_id long, ts timestamp, value double"
        ).coalesce(1).write.mode("overwrite").parquet(sub)
        src = next(f for f in os.listdir(sub) if f.startswith("part-"))
        dst = os.path.join(stream_dir, f"{i}_batch.parquet")
        os.replace(os.path.join(sub, src), dst)
        os.utime(dst, (1_700_000_000 + i * 100,) * 2)

    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    from trino_private_spark.streaming.events import run_stream_to_memory

    got = run_stream_to_memory(
        spark,
        streaming_match_recognize(stream, "up{2,4}", defines),
        "t_stream_mr",
        output_mode="append",
    ).toPandas()

    batch_df = spark.read.parquet(stream_dir)
    want = batch_match_recognize_spans(batch_df, "up{2,4}", defines).toPandas()
    key = ["user_id", "match_number", "start_ts", "end_ts", "n_rows"]
    got_s = got[key].sort_values(key).reset_index(drop=True)
    want_s = want[key].sort_values(key).reset_index(drop=True)
    assert len(want_s) > 0
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_streaming_match_recognize_rejects_unbounded(spark):
    from trino_private_spark.operators.row_pattern import vectorized
    from trino_private_spark.streaming.stateful import streaming_match_recognize

    with pytest.raises(ValueError):
        streaming_match_recognize(
            spark.readStream.format("rate").load(),
            "up+",
            {"up": vectorized(lambda p: p["value"] > 0)},
        )


def test_click_view_full_outer_stream_equals_batch(spark, batch_events, tmp_path):
    """FULL OUTER stream-stream join: the closed region must carry real
    unmatched rows from BOTH sides (clicks with no view AND views with no
    click), each equal to the batch full range join. Two microbatches so
    the second advances the watermark and flushes the first's unmatched
    state on both stores."""
    import os

    from trino_private_spark.streaming.events import (
        click_view_join_full,
        run_stream_to_memory,
    )

    stream_dir = str(tmp_path / "two_batch_events_full")
    os.makedirs(stream_dir, exist_ok=True)
    bounds = batch_events.agg(
        F.min("ts").alias("lo"), F.max("ts").alias("hi")
    ).head()
    lo, hi = bounds["lo"], bounds["hi"]
    split = lo + (hi - lo) * 6 // 10 if isinstance(hi, int) else lo + (hi - lo) * 0.6
    early = batch_events.where(F.col("ts") <= F.lit(split))
    late = batch_events.where(F.col("ts") > F.lit(split))
    assert early.count() > 0 and late.count() > 0
    for i, part in enumerate((early, late)):
        sub = str(tmp_path / f"fw{i}")
        part.coalesce(1).write.mode("overwrite").parquet(sub)
        src = next(
            f for f in os.listdir(sub) if f.endswith(".parquet") and f.startswith("part-")
        )
        dst = os.path.join(stream_dir, f"{i}_batch.parquet")
        os.replace(os.path.join(sub, src), dst)
        os.utime(dst, (1_700_000_000 + i * 100, 1_700_000_000 + i * 100))

    schema = spark.read.parquet(stream_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    got = run_stream_to_memory(
        spark,
        click_view_join_full(stream),
        "t_cv_full",
        output_mode="append",
    ).toPandas()

    batch = click_view_join_full(batch_events).toPandas()
    wm1 = early.agg(F.max("ts")).head()[0]
    import pandas as pd

    cutoff = pd.Timestamp(wm1) - pd.Timedelta(hours=3, minutes=5)

    def closed(df):
        key_ts = pd.to_datetime(df["click_ts"]).fillna(pd.to_datetime(df["view_ts"]))
        out = df[key_ts <= cutoff]
        return out.sort_values(
            ["click_id", "view_id"], na_position="last"
        ).reset_index(drop=True)

    got_c, batch_c = closed(got), closed(batch)
    assert len(batch_c) > 0, "closed region must be non-trivial"
    assert batch_c["view_id"].isna().sum() > 0, "need unmatched clicks"
    assert batch_c["click_id"].isna().sum() > 0, "need unmatched views"
    compare_frames(got_c, batch_c, "click_view_full_outer (closed region)")


def test_iceberg_sink_exactly_once_round_trip(spark, batch_events, tmp_path):
    """availableNow drain into an ICEBERG table: committed rows == source
    rows, one append snapshot per micro-batch with its batch id in the
    snapshot summary, and a second drain of the fully-consumed source
    commits nothing new (checkpoint + batch-id markers make it
    idempotent). A replayed batch id is also skipped WITHOUT the
    checkpoint's help."""
    from trino_private_spark.sources.iceberg import IcebergTable, read_iceberg
    from trino_private_spark.streaming.events import iceberg_sink

    out, ckpt = str(tmp_path / "ice"), str(tmp_path / "ckpt")
    iceberg_sink(events_stream(spark, SF_SMOKE), out, ckpt)
    n1 = read_iceberg(spark, out).count()
    assert n1 == batch_events.count()
    snaps = IcebergTable(out).snapshots()
    batch_ids = [
        (s.get("summary") or {}).get("streaming-batch-id") for s in snaps
    ]
    assert "0" in batch_ids  # batch 0 committed with its marker
    # drain again: source fully consumed -> no new snapshots with rows
    iceberg_sink(events_stream(spark, SF_SMOKE), out, ckpt)
    assert read_iceberg(spark, out).count() == n1
    # a REAL replay: drain the same source with a FRESH checkpoint, so
    # the restarted query re-emits the data as batch 0 — only the
    # snapshot-summary batch-id marker stands between that and
    # duplicate rows
    iceberg_sink(
        events_stream(spark, SF_SMOKE), out, str(tmp_path / "ckpt2")
    )
    assert read_iceberg(spark, out).count() == n1
