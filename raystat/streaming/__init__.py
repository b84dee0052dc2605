"""Streaming layer: epoch-driven event-time processing with watermarks,
hash-partitioned stateful actor state stores, a stateful join against a
late-arriving metadata stream, exactly-once Parquet commits, and
per-partition checkpointing (SURVEY.md §3.2, §4.2).
"""

from raystat.streaming.driver import StreamConfig, StreamDriver
from raystat.streaming.sink import ExactlyOnceParquetSink

__all__ = ["StreamConfig", "StreamDriver", "ExactlyOnceParquetSink"]
