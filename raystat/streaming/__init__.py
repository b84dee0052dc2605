"""Streaming layer: epoch-driven event-time processing with watermarks,
hash-partitioned stateful actor state stores, a stateful join against a
late-arriving metadata stream, exactly-once Parquet commits, and
per-partition checkpointing (SURVEY.md §3.2, §4.2).

Three state kinds share the epoch/watermark/checkpoint conventions:
sum-mergeable moment state (`StreamDriver`), stream-stream interval-join
row buffers (`IntervalStreamDriver`), and idempotent max-merge HLL
register state (`HllStreamDriver`).
"""

from raystat.streaming.driver import StreamConfig, StreamDriver
from raystat.streaming.interval import IntervalJoinConfig, IntervalStreamDriver
from raystat.streaming.sink import ExactlyOnceParquetSink
from raystat.streaming.sketch import HllStreamDriver

__all__ = [
    "StreamConfig",
    "StreamDriver",
    "ExactlyOnceParquetSink",
    "IntervalJoinConfig",
    "IntervalStreamDriver",
    "HllStreamDriver",
]
