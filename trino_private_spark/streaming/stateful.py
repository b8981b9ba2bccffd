"""Custom stateful streaming operator: value-dependent sessionization via
applyInPandasWithState.

The native session_window (streaming/events.py) covers fixed-gap sessions;
this operator demonstrates arbitrary per-key state — sessions that close on
a *value* condition (cumulative value budget exhausted) as well as the time
gap, something no built-in window expresses. State per key is O(1) (a few
scalars), the streaming state store bounds memory, and timeouts evict idle
keys — the pattern scales to any key cardinality the state store holds.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_id bigint, n_events bigint, total_value double"
)
STATE_SCHEMA = "session_id bigint, n_events bigint, total_value double"


def budget_sessionize(
    events: DataFrame,
    value_budget: float = 100.0,
    idle_timeout_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Per-user sessions that close when the cumulative `value` exceeds
    ``value_budget`` (emitting the finished session) or the key idles past
    the timeout. Works only on streaming frames (uses GroupState)."""

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            sid, n, tot = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_id": sid,
                        "n_events": n,
                        "total_value": round(tot, 4),
                    }
                ]
            )
            return
        sid, n, tot = state.get if state.exists else (0, 0, 0.0)
        done = []
        for pdf in pdfs:
            for v in pdf["value"]:
                n += 1
                tot += float(v or 0.0)
                if tot >= value_budget:
                    done.append(
                        {
                            "user_id": user_id,
                            "session_id": sid,
                            "n_events": n,
                            "total_value": round(tot, 4),
                        }
                    )
                    sid, n, tot = sid + 1, 0, 0.0
        state.update((sid, n, tot))
        state.setTimeoutDuration(idle_timeout_ms)
        if done:
            yield pd.DataFrame(done)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# --------------------------------------------------------------------------
# Streaming windowed quantiles over a mergeable t-digest state
# --------------------------------------------------------------------------

QUANTILE_OUTPUT_SCHEMA = (
    "event_type string, window_start timestamp, p50 double, p90 double, n bigint"
)
QUANTILE_STATE_SCHEMA = "sketch binary, n bigint"


def windowed_quantile_sketch(
    events: DataFrame,
    width_s: int = 3600,
    idle_timeout_ms: int = 10 * 60 * 1000,
) -> DataFrame:
    """Per-(event_type, tumbling window) value quantiles via a t-digest held
    in streaming state (functions/tdigest.TDigest).

    The 100 TB streaming shape: state per key is the ~KB digest, never the
    raw values — the same partial/merge split the batch tdigest_agg uses,
    lifted into applyInPandasWithState.  Runs in update mode: every trigger
    re-emits the key's current quantiles (a dashboard sink keeps the latest
    row per key); idle keys are evicted by timeout after a final emission.
    Batch parity: the last emission per key must agree with the exact batch
    quantiles within the digest's rank-error bound
    (tests/test_streaming.test_windowed_quantile_sketch_stateful).
    """
    from trino_private_spark.functions.tdigest import TDigest

    def fn(key, pdfs, state: GroupState):
        event_type, wstart = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            sk, n = state.get
            td = TDigest.deserialize(bytes(sk))
        else:
            td, n = TDigest(100.0), 0
        for pdf in pdfs:
            vals = pdf["value"].astype(float).to_numpy()
            td.add(vals)
            n += len(vals)
        state.update((td.serialize(), n))
        state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(
            [
                {
                    "event_type": event_type,
                    "window_start": pd.Timestamp(wstart),
                    "p50": td.value_at_quantile(0.5),
                    "p90": td.value_at_quantile(0.9),
                    "n": n,
                }
            ]
        )

    keyed = events.select(
        "event_type",
        (
            (F.unix_timestamp("ts") - F.unix_timestamp("ts") % width_s).cast(
                "timestamp"
            )
        ).alias("window_start"),
        "value",
    )
    return keyed.groupBy("event_type", "window_start").applyInPandasWithState(
        fn,
        outputStructType=QUANTILE_OUTPUT_SCHEMA,
        stateStructType=QUANTILE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


# --------------------------------------------------------------------------
# Streaming pattern detection — MATCH_RECOGNIZE-lite on an event stream
# --------------------------------------------------------------------------

RUN_OUTPUT_SCHEMA = "user_id bigint, run_len bigint"
RUN_STATE_SCHEMA = "last_value double, run_len bigint"


def rising_run_detector(events: DataFrame, k: int = 3) -> DataFrame:
    """Detect strictly-rising value chains of length >= k per user — the
    streaming counterpart of the batch MATCH_RECOGNIZE 'up{k,}' pattern
    (operators/match_recognize.py).

    Emits ONE row per chain at the moment it reaches length k (further
    growth does not re-emit), so a bounded replay produces exactly the
    chains the equivalent batch lag/island query finds — the parity test in
    test_streaming compares the two.  State per key is two scalars; rows
    inside a micro-batch are processed in event-time order."""

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        last, run_len = state.get if state.exists else (None, 0)
        hits = []
        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values("ts", kind="mergesort")
        for v in pdf["value"].astype(float):
            if last is not None and v > last:
                run_len += 1
                if run_len == k:
                    hits.append({"user_id": user_id, "run_len": run_len})
            else:
                run_len = 1
            last = v
        state.update((float(last), int(run_len)))
        state.setTimeoutDuration(30 * 60 * 1000)
        if hits:
            yield pd.DataFrame(hits)

    return events.select("user_id", "ts", "value").groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=RUN_OUTPUT_SCHEMA,
        stateStructType=RUN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def rising_runs_batch(events: DataFrame, k: int = 3) -> DataFrame:
    """Batch twin of rising_run_detector: per user, count of strictly-rising
    chains reaching length >= k, via the lag-flag + islands rewrite."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = (
        events.select("user_id", "ts", "event_id", "value")
        .withColumn("prev", F.lag("value").over(w))
        .withColumn("up", (F.col("prev").isNotNull() & (F.col("value") > F.col("prev"))).cast("int"))
        .withColumn("rn", F.row_number().over(w))
    )
    ups = flagged.where(F.col("up") == 1)
    w2 = Window.partitionBy("user_id").orderBy("rn")
    islands = ups.withColumn("anchor", F.col("rn") - F.row_number().over(w2))
    return (
        islands.groupBy("user_id", "anchor")
        .agg((F.count("*") + 1).alias("chain_len"))
        .where(F.col("chain_len") >= k)
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("n_chains"))
    )


# --------------------------------------------------------------------------
# Streaming MATCH_RECOGNIZE — bounded patterns over a stateful tail buffer
# --------------------------------------------------------------------------
#
# The reference has no streaming runtime at all (SURVEY preamble); this is
# the Spark-native extension of the general NFA engine
# (operators/row_pattern.py) to unbounded inputs.  Restriction: the
# pattern must have a BOUNDED maximum match length L (no unbounded
# quantifiers) — then a greedy match attempt starting at position s is
# fully decided once s + L rows are buffered, so per-key state is at most
# L-1 undecided tail rows plus the match counter.  Each micro-batch:
# append new rows (assumed per-key ordered — enforce upstream with a
# watermark + sort), run the matcher up to the decided frontier, emit
# finished matches, keep the tail.  Idle keys flush their buffer via
# processing-time timeout, deciding everything that remains.

PATTERN_OUTPUT_SCHEMA = (
    "user_id bigint, match_number bigint, start_ts timestamp, end_ts timestamp, "
    "n_rows bigint"
)
PATTERN_STATE_SCHEMA = "ts array<timestamp>, vals array<double>, match_no bigint"


def _max_match_len(prog, entry) -> int:
    """Longest row-consuming path through the NFA; raises on cycles
    (= unbounded quantifiers)."""
    from functools import lru_cache

    n = len(prog)
    WHITE, GRAY, BLACK = 0, 1, 2
    color = [WHITE] * n
    best = [0] * n

    def dfs(pc: int) -> int:
        if color[pc] == GRAY:
            raise ValueError(
                "streaming MATCH_RECOGNIZE requires a bounded pattern "
                "(no unbounded quantifiers)"
            )
        if color[pc] == BLACK:
            return best[pc]
        color[pc] = GRAY
        ins = prog[pc]
        if ins[0] == "match":
            r = 0
        elif ins[0] == "sym":
            r = 1 + dfs(ins[2])
        elif ins[0] == "split":
            r = max(dfs(x) for x in ins[1])
        else:  # jmp / anchors
            r = dfs(ins[1])
        color[pc] = BLACK
        best[pc] = r
        return r

    return dfs(entry)


def streaming_match_recognize(
    events: DataFrame,
    pattern: str,
    defines: dict,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    idle_timeout_ms: int = 60_000,
) -> DataFrame:
    """Streaming row-pattern detection: one output row per completed match
    with its time span.  ``defines`` are the engine's (optionally
    vectorized) predicates over a frame with columns [ts, v]."""
    from trino_private_spark.operators.row_pattern import PatternMatcher

    matcher = PatternMatcher(pattern, defines)
    L = _max_match_len(matcher.prog, matcher.entry)
    if L < 1:
        raise ValueError("pattern matches only the empty sequence")

    def _run(uid, pdf: pd.DataFrame, match_no: int, final: bool):
        """Run the matcher over the buffer; emit decided matches; return
        (rows_out, new_match_no, keep_from)."""
        n = len(pdf)
        cutoff = n if final else max(n - L + 1, 0)
        out = []
        i = 0
        for mno, start, labels in matcher.find_matches(pdf):
            if start >= cutoff:
                break
            out.append(
                {
                    "user_id": uid,
                    "match_number": match_no + len(out) + 1,
                    "start_ts": pdf["ts"].iloc[start],
                    "end_ts": pdf["ts"].iloc[start + len(labels) - 1],
                    "n_rows": len(labels),
                }
            )
            i = start + max(len(labels), 1)
        keep_from = max(i, cutoff) if not final else n
        return out, match_no + len(out), min(keep_from, n)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            ts_list, vals, match_no = state.get
            state.remove()
            if ts_list:
                pdf = pd.DataFrame({"ts": pd.to_datetime(pd.Series(ts_list)), "v": vals})
                out, _, _ = _run(uid, pdf, match_no, final=True)
                if out:
                    yield pd.DataFrame(out)
            return
        ts_list, vals, match_no = state.get if state.exists else ([], [], 0)
        frames = [pd.DataFrame({"ts": pd.to_datetime(pd.Series(ts_list)), "v": vals})] if ts_list else []
        for pdf in pdfs:
            frames.append(
                pdf.sort_values(ts_col).rename(columns={ts_col: "ts", value_col: "v"})[
                    ["ts", "v"]
                ]
            )
        buf = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame({"ts": [], "v": []})
        out, match_no, keep_from = _run(uid, buf, match_no, final=False)
        tail = buf.iloc[keep_from:]
        # state serializer wants plain datetimes, not pandas Timestamps
        ts_out = [pd.Timestamp(t).to_pydatetime() for t in tail["ts"]]
        state.update((ts_out, [float(x) for x in tail["v"]], match_no))
        state.setTimeoutDuration(idle_timeout_ms)
        if out:
            yield pd.DataFrame(out)

    return events.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=PATTERN_OUTPUT_SCHEMA,
        stateStructType=PATTERN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def batch_match_recognize_spans(
    events: DataFrame,
    pattern: str,
    defines: dict,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """The batch reference semantics for streaming_match_recognize: the
    general engine over the same frame shape, emitting the same span
    columns — the stream's drained output must equal this exactly."""
    from trino_private_spark.operators.row_pattern import match_recognize_general

    src = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
    )
    out = match_recognize_general(
        src,
        partition_by=["user_id"],
        order_by=["ts"],
        pattern=pattern,
        defines=defines,
        mode="one",
        measures={
            "start_ts": lambda fr, labs: fr["ts"].iloc[0],
            "end_ts": lambda fr, labs: fr["ts"].iloc[-1],
        },
        measure_schema="start_ts timestamp, end_ts timestamp",
    )
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        "match_number",
        "start_ts",
        "end_ts",
        "n_rows",
    )
