"""Per-worker scratch-buffer pool.

Fresh multi-MB numpy allocations are served by mmap and pay full
page-fault cost on every batch (measured ~100-500ms per ~12 MB in this
environment vs ~2ms compute into a reused buffer).  Worker processes
persist across map_batches tasks, so module-level buffers amortize the
faults to once per worker.  Buffers grow geometrically and are reused
by (name, dtype).
"""

from __future__ import annotations

import numpy as np

_POOL: dict[tuple[str, str], np.ndarray] = {}


def buf(name: str, n: int, dtype=np.float64) -> np.ndarray:
    """A length-n view of a reusable buffer (contents undefined)."""
    key = (name, np.dtype(dtype).str)
    b = _POOL.get(key)
    if b is None or b.size < n:
        b = np.empty(int(n * 1.25) + 16, dtype=dtype)
        _POOL[key] = b
    return b[:n]


def astype_f8(name: str, arr: np.ndarray) -> np.ndarray:
    """arr cast to float64 into a pooled buffer."""
    if arr.dtype == np.float64:
        return arr
    out = buf(name, arr.size, np.float64)
    np.copyto(out, arr, casting="unsafe")
    return out
