"""raystat — a Ray-Data-native streaming statistics engine.

Re-creates the aggregation surface of the public reference
``kcharkseliani/ksql-udaf-statistics`` (ksqlDB UDAFs: weighted average,
weighted stddev, skewness, kurtosis — population/sample, weighted and
unweighted) as mergeable moment accumulators evaluated over Ray Data
pipelines: zero-copy Arrow ``map_batches`` stages, partial+final grouped
aggregation, tumbling/hopping/session event-time windows, a streaming
driver with watermarks, stateful actor state stores, a stateful join
against a late-arriving metadata stream, and an idempotent exactly-once
Parquet sink.  See SURVEY.md for the blueprint and reference citations.
"""

from raystat.scratch import tune_allocator

tune_allocator()  # see scratch.tune_allocator — perf-critical in this VM

from raystat.accumulators import AggregatorSpec, get_spec, register, REGISTRY

__all__ = ["AggregatorSpec", "get_spec", "register", "REGISTRY"]
__version__ = "0.1.0"
