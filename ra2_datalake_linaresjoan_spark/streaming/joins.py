"""Streaming joins: stream–stream (watermarked, time-bounded) and
stream–static (broadcast dimension enrichment).

The reference has no streaming at all (SURVEY §2.9); these complete the
engine's Structured Streaming extension next to the windowed aggregates
(`windows.py`) and custom stateful ops (`stateful.py`). Semantics are
pinned by batch-equivalence tests: the same join expressions applied to
bounded DataFrames are the ground truth.

At scale the stream–stream join is the state-heavy operator: each side
buffers rows in the state store until the watermark plus the join's time
bound passes them by. BOTH of those bounds are therefore mandatory here —
an unbounded-time stream–stream join grows state forever. The stream–
static join holds no state: the dimension is broadcast per micro-batch,
picking up dimension updates between batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Inner join of two event streams on ``key`` where the right event
    happens in ``[left.ts, left.ts + within]`` — the "action followed by
    outcome" attribution shape (e.g. click → purchase).

    Both sides are watermarked and the join condition time-bounds the
    match window, so the state store can evict: a buffered left row is
    droppable once the right watermark passes ``left.ts + within``.
    Output columns are renamed (``l_``/``r_`` prefixes) so downstream
    code never juggles ambiguous names.
    """
    lw = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col("event_type").alias("l_type"),
        F.col("ts").alias("l_ts"),
        F.col("value").alias("l_value"),
    )
    rw = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col("event_type").alias("r_type"),
        F.col("ts").alias("r_ts"),
        F.col("value").alias("r_value"),
    )
    return lw.join(
        rw,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
    )


def stream_static_enrich(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Enrich a stream with a static (or slowly refreshed) dimension via a
    broadcast inner join — stateless; the dimension is re-resolved every
    micro-batch, so replacing the underlying table between batches is
    picked up without restarting the query."""
    return stream.join(F.broadcast(dim), on=key, how="inner")
