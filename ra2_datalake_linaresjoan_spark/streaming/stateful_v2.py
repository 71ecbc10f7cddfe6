"""Custom stateful streaming via ``transformWithStateInPandas`` (Spark 4's
stateful-processor API — the successor to ``applyInPandasWithState``, which
``streaming/stateful.py`` demonstrates).

Same operator semantics as ``running_user_totals`` there (incremental
per-user count/sum/last-ts), re-expressed with the v2 API, which adds
named state variables (ValueState/ListState/MapState), per-state TTL, and
timers — the pieces a production-grade custom operator needs for bounded
state at scale. State lives in the state store partitioned by the group
key; Arrow moves each group's rows, no per-row Python.

Runtime note: the v2 state protocol requires ``protobuf`` (standard on
Spark 4 clusters; absent in this test container, where the paired test
skips). ``streaming/stateful.py`` remains the dependency-free path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql import types as T

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


class RunningTotalsProcessor(StatefulProcessor):
    """ValueState-backed running (count, sum, last-ts) per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState(
            "totals", "n BIGINT, total DOUBLE, last_us BIGINT"
        )

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, total, last_us = (
            self._state.get() if self._state.exists() else (0, 0.0, 0)
        )
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            if len(pdf):
                # unit-safe like stateful.py: Arrow hands datetime64[ns]
                # OR [us] depending on the source timestamp type — the
                # previous raw int64 view assumed nanos and reported
                # milliseconds-as-micros (1000x off) on micros-NTZ data
                ts_us = pdf["ts"].astype("datetime64[us]").astype("int64")
                last_us = max(last_us, int(ts_us.max()))
        self._state.update((n, total, last_us))
        (user_id,) = key
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [round(total, 4)],
                "last_ts_us": [last_us],
            }
        )

    def close(self) -> None:
        pass


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
