"""Custom stateful operator (applyInPandasWithState): running per-user
totals must converge to the batch groupBy result."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from ra2_datalake_linaresjoan_spark.streaming.stateful import running_user_totals
from ra2_datalake_linaresjoan_spark.streaming.windows import (
    read_events_stream,
    run_to_memory,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stateful")
    shutil.copy(f"{SF}/events.parquet", d / "events.parquet")
    return str(d)


def test_running_totals_match_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    out = run_to_memory(
        running_user_totals(stream), "t_state", spark, output_mode="update"
    )
    # last emitted row per user == running total after all data
    latest = {r["user_id"]: r for r in out.collect()}

    from ra2_datalake_linaresjoan_spark.queries import _events

    batch = (
        _events(spark, SF)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max(F.unix_micros("ts")).alias("last_ts_us"),
        )
    )
    for r in batch.collect():
        s = latest[r["user_id"]]
        assert s["n_events"] == r["n_events"], r["user_id"]
        assert abs(s["total_value"] - r["total_value"]) < 1e-6
        assert s["last_ts_us"] == r["last_ts_us"]


def test_running_totals_v2_match_batch(spark, events_dir):
    """Same operator via transformWithStateInPandas (stateful v2 API).

    The v2 state protocol needs protobuf at runtime, which this container
    lacks — skip there; the operator runs on any standard Spark 4 cluster."""
    pytest.importorskip("google.protobuf")
    from ra2_datalake_linaresjoan_spark.streaming.stateful_v2 import (
        running_user_totals_v2,
    )

    stream = read_events_stream(spark, events_dir)
    out = run_to_memory(
        running_user_totals_v2(stream), "t_state_v2", spark, output_mode="update"
    )
    latest = {r["user_id"]: r for r in out.collect()}

    from ra2_datalake_linaresjoan_spark.queries import _events

    batch = (
        _events(spark, SF)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
            F.max(F.unix_micros("ts")).alias("last_ts_us"),
        )
    )
    for r in batch.collect():
        s = latest[r["user_id"]]
        assert s["n_events"] == r["n_events"], r["user_id"]
        assert abs(s["total_value"] - r["total_value"]) < 1e-6
        assert s["last_ts_us"] == r["last_ts_us"]
