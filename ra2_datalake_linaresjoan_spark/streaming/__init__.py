"""Structured Streaming surface (SURVEY §2.9, engine extension §7.4)."""

from ra2_datalake_linaresjoan_spark.streaming.foreach_sink import stream_merge_sink
from ra2_datalake_linaresjoan_spark.streaming.windows import (
    read_events_stream,
    sessionized,
    stream_dedup,
    tumbling_agg,
)

__all__ = [
    "read_events_stream",
    "sessionized",
    "stream_dedup",
    "stream_merge_sink",
    "tumbling_agg",
]
