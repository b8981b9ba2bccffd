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
