"""Timer-driven session closing via ``applyInPandasWithState`` +
event-time timeouts.

The built-in ``session_window`` (streaming/windows.py ``sessionized``)
emits a session only when the watermark passes its end — and says nothing
about *why* or *when* it closed. This operator is the custom-timer
variant a production pipeline needs: sessions that end because a new
event arrived after the gap are emitted IMMEDIATELY in that micro-batch
(tagged ``closed_by='gap'``), while idle sessions are closed by an
event-time TIMER that fires when the watermark passes ``last_event +
gap`` (tagged ``closed_by='timeout'``), so state for dormant users is
reclaimed without waiting for their next visit.

Scale posture: one small tuple of state per active user, partitioned by
the group key; the timer bound makes total state proportional to users
active within one gap horizon, not all users ever seen. Arrow batches per
key — no per-row Python.

Reference parity: the reference has no streaming layer at all (SURVEY
§2.9 — its pipelines are batch pandas; cf. `main.py` full-ETL loop);
this is part of the engine's beyond-reference streaming surface, matching
the semantics of its batch sessionization (`session_islands` gap logic)
incrementally.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_last_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("closed_by", T.StringType()),
    ]
)

SESSION_STATE = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def session_close_on_timeout(
    events: DataFrame, gap_minutes: int = 360, watermark: str = "1 hour"
) -> DataFrame:
    """Gap-based user sessions with eager gap closes and timer-driven
    idle closes. ``events`` needs ``user_id``, ``ts`` (timestamp),
    ``value`` columns; the watermark drives the event-time timers."""
    gap_us = gap_minutes * 60 * 1_000_000
    gap_ms = gap_minutes * 60 * 1_000

    def _frame(user_id: int, cur: list, closed_by: str) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start_us": [cur[0]],
                "session_last_us": [cur[1]],
                "n_events": [cur[2]],
                "total_value": [round(cur[3], 4)],
                "closed_by": [closed_by],
            }
        )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            cur = list(state.get)
            state.remove()
            yield _frame(user_id, cur, "timeout")
            return

        parts = [pdf for pdf in pdfs if len(pdf)]
        if not parts:
            return
        batch = pd.concat(parts, ignore_index=True)
        # unit-safe int64 microseconds regardless of Arrow's ns/us choice
        batch["ts_us"] = batch["ts"].astype("datetime64[us]").astype("int64")
        batch = batch.sort_values(["ts_us"], kind="mergesort")

        cur = list(state.get) if state.exists else None
        for ts_us, value in zip(batch["ts_us"], batch["value"]):
            if cur is None:
                cur = [int(ts_us), int(ts_us), 0, 0.0]
            elif ts_us - cur[1] > gap_us:
                yield _frame(user_id, cur, "gap")
                cur = [int(ts_us), int(ts_us), 0, 0.0]
            # min/max, not assignment: a LATE (within-watermark) event
            # from a later micro-batch can sort before the session's
            # current bounds — overwriting last_us would regress it,
            # firing false gap splits and a premature event-time timer
            # (round-10 review); sort_values only orders within ONE
            # batch, so cross-batch disorder reaches this line
            cur[0] = min(cur[0], int(ts_us))
            cur[1] = max(cur[1], int(ts_us))
            cur[2] += 1
            cur[3] += float(value)
        state.update(tuple(cur))
        # Event-time timer: fire when the watermark passes last + gap. The
        # timestamp must sit above the current watermark or Spark rejects it
        # (old keys replaying history would otherwise set timers in the past).
        timeout_ms = max(cur[1] // 1000 + gap_ms, state.getCurrentWatermarkMs() + 1)
        state.setTimeoutTimestamp(timeout_ms)

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=SESSION_OUTPUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
