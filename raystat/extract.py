"""Extraction stages for the token table (stateless map_batches fns).

The reference's per-row "extract (value, weight) from the payload"
stage (UDAF args ``(col1)`` / ``(col1, col2)``, AllUdafIT.java:586-599)
becomes vectorized Arrow kernels here:

- token-length statistics: value = ``n_tok``, weight = 1 or ``n_tok``
- token-value statistics: flatten ``tokens`` with zero-copy
  ``pc.list_flatten`` / ``pc.list_parent_indices`` (no Python loops)

Event time is DERIVED from ``doc_id`` (the input schema has no ts
column, BASELINE.json:input_hint): a multiplicative Knuth hash of the
numeric id, SQL-expressible so DuckDB oracles can reproduce it:

    ts_us = T0_US + ((id % 1_000_000) * 2654435761) % HORIZON_US

Any reader recomputes the same event time, so per-row passthrough can
emit input rows byte-identical while the engine still windows them.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

T0_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch microseconds
HORIZON_US = 7 * 86_400 * 1_000_000  # event times span 7 days
_KNUTH = np.int64(2654435761)
_ID_MOD = np.int64(1_000_000)

__all__ = [
    "T0_US",
    "HORIZON_US",
    "numeric_doc_id",
    "event_time_us_from_numeric",
    "add_event_time",
    "flatten_tokens",
    "EVENT_TIME_SQL",
]

# DuckDB twin of event_time_us_from_numeric (doc_id already numeric):
EVENT_TIME_SQL = (
    "(1704067200000000 + ((doc_id % 1000000) * 2654435761) % 604800000000)"
)


import re as _re

_PREFIX_RE = _re.compile(r"^(.*?)(\d+)$", _re.DOTALL)


def numeric_doc_id(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """int64 id from a doc_id column: numeric columns pass through;
    string ids use their trailing digit suffix (``doc-%012d``).

    Fast path: when all ids share the first row's non-digit prefix
    (the fixture layout), a slice + int cast replaces the 3x-slower
    per-row regex; any irregular id falls back to the regex."""
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(col):
        first = col[0].as_py()
        m = _PREFIX_RE.match(first) if first is not None else None
        if m and (not m.group(1) or pc.all(
            pc.starts_with(col, m.group(1))
        ).as_py()):
            try:
                sliced = pc.utf8_slice_codeunits(col, len(m.group(1)))
                return sliced.cast(pa.int64()).to_numpy(zero_copy_only=False)
            except pa.ArrowInvalid:
                pass  # digits-after-prefix assumption broken somewhere
    digits = pc.extract_regex(col, r"(?P<d>\d+)$")
    flat = pc.struct_field(digits, "d")
    return flat.cast(pa.int64()).to_numpy(zero_copy_only=False)


def event_time_us_from_numeric(ids: np.ndarray) -> np.ndarray:
    return T0_US + ((ids % _ID_MOD) * _KNUTH) % np.int64(HORIZON_US)


def add_event_time(batch: pa.Table, doc_id_col: str = "doc_id") -> pa.Table:
    """Append a derived ``ts`` timestamp[us] column."""
    ev = event_time_us_from_numeric(numeric_doc_id(batch[doc_id_col]))
    return batch.append_column("ts", pa.array(ev).cast(pa.timestamp("us")))


def flatten_tokens(
    batch: pa.Table, keep: tuple[str, ...] = ("source",), tokens_col: str = "tokens"
) -> pa.Table:
    """Explode the token lists: one row per token, repeating ``keep``
    columns via zero-copy take on list_parent_indices."""
    col = batch[tokens_col].combine_chunks()
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    out = {k: batch[k].take(parents) for k in keep}
    out["token"] = flat
    return pa.table(out)
