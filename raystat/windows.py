"""Event-time window assignment (vectorized, Arrow/NumPy).

The reference delegates windowing to ksqlDB (``WINDOW TUMBLING (SIZE 5
MINUTES)``, README.md:160-171; HOPPING/SESSION are the same ksqlDB
surface — SESSION is why every UDAF must implement ``merge``).  Here
windows are pure arithmetic on an event-time column, assigned inside
``map_batches`` — no shuffle, no sort.

Conventions:
- window sizes/hops/gaps are given in **seconds** (integers).
- the assigned ``window_start`` column is int64 **epoch seconds**
  (exact integer math; SQL oracle twin:
  ``cast(floor(epoch(ts)/S)*S as bigint)``).
- input ``ts`` column may be an Arrow timestamp (any unit) or an
  int64/float epoch-seconds column.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

__all__ = ["Tumbling", "Hopping", "Session", "ts_to_epoch_us", "assign_windows"]


@dataclass(frozen=True)
class Tumbling:
    """Fixed, non-overlapping windows: ``[k*size, (k+1)*size)``."""

    size_s: int


@dataclass(frozen=True)
class Hopping:
    """Overlapping windows of ``size_s`` starting every ``hop_s``
    (ksqlDB HOPPING): a row with time t belongs to every window start
    w ≡ 0 (mod hop) with ``t - size < w <= t``."""

    size_s: int
    hop_s: int

    def __post_init__(self):
        if self.hop_s <= 0 or self.size_s <= 0 or self.hop_s > self.size_s:
            raise ValueError("require 0 < hop_s <= size_s")


@dataclass(frozen=True)
class Session:
    """Gap-based per-key sessions (ksqlDB SESSION): events of one key
    whose successive gaps are <= ``gap_s`` share a window."""

    gap_s: int


def ts_to_epoch_us(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Normalize a timestamp / numeric column to int64 epoch microseconds."""
    typ = col.type
    if pa.types.is_timestamp(typ):
        col = col.cast(pa.timestamp("us"))
        return col.cast(pa.int64()).to_numpy(zero_copy_only=False)
    arr = col.to_numpy(zero_copy_only=False)
    # numeric: interpreted as epoch seconds
    return (np.asarray(arr, dtype=np.float64) * 1_000_000.0).astype(np.int64)


def assign_windows(
    batch: pa.Table, ts_col: str, window
) -> tuple[pa.Table, np.ndarray]:
    """Return (possibly row-expanded batch, window_start epoch-seconds
    int64 array aligned with its rows).  Tumbling keeps the batch
    as-is; Hopping repeats rows once per covering window (zero-copy
    ``Table.take``).  Session is handled by the dedicated session
    operator, not here."""
    ts_us = ts_to_epoch_us(batch[ts_col])
    # dispatch by class NAME, not isinstance: when the driver ships
    # raystat by value (cloudpickle register_pickle_by_value in
    # __ray_entry__) a worker that can ALSO import raystat from its
    # sys.path ends up with two copies of these classes, and a window
    # instance pickled from one copy fails isinstance against the other
    kind = type(window).__name__
    if kind == "Tumbling":
        size_us = window.size_s * 1_000_000
        ws = (ts_us // size_us) * window.size_s
        return batch, ws
    if kind == "Hopping":
        hop_us = window.hop_s * 1_000_000
        size_us = window.size_s * 1_000_000
        k_max = ts_us // hop_us
        k_min = (ts_us - size_us) // hop_us + 1
        counts = (k_max - k_min + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(ts_us), dtype=np.int64), counts)
        # per expanded element: k = k_min[row] + offset_within_row
        offs = np.arange(idx.size, dtype=np.int64) - np.repeat(
            np.cumsum(counts) - counts, counts
        )
        ws = (np.repeat(k_min, counts) + offs) * window.hop_s
        return batch.take(pa.array(idx)), ws
    raise TypeError(f"unsupported window {window!r} (Session uses session_moments)")
