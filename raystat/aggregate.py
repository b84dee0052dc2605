"""Distributed grouped moment aggregation — the batch query path.

Three stages, mirroring the reference's partial/final UDAF contract
(``aggregate`` per event → ``merge`` across partitions → ``map``,
e.g. WeightedStdDevUdaf.java:94-163) but vectorized and Ray-Data-first:

1. **partial** — one ``map_batches(batch_format="pyarrow")`` computes
   per-batch power sums per (keys, window) with Arrow's C++ hash
   aggregation.  Each input batch collapses to at most
   |distinct groups in batch| rows, so the shuffle moves partial
   aggregates, not rows (SURVEY.md §4.2).
2. **merge** — ``groupby(keys).aggregate(Sum(...))`` over the tiny
   partials (the only all-to-all exchange; field-wise addition ==
   the reference's ``merge``).
3. **finalize** — a final ``map_batches`` evaluates every requested
   statistic for all groups in one vectorized NumPy expression
   (== the reference's ``map``, non-destructive).

Scales to arbitrary input size: stages 1 and 3 stream; stage 2's
input is O(batches × groups) rows of ≤10 float64 columns.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raystat.accumulators import AggregatorSpec, canonical_sums_for, get_spec
from raystat.scratch import buf, tune_allocator
from raystat.windows import Hopping, Session, Tumbling, assign_windows, ts_to_epoch_us

__all__ = ["grouped_moments", "session_moments", "partial_sums"]

_GLOBAL_KEY = "_all"  # constant group key for global aggregates
# (mirrors the reference's GROUP BY 'singleton', AllUdafIT.java:596-598)


def _resolve(specs) -> dict[str, AggregatorSpec]:
    return {
        out: (get_spec(s) if isinstance(s, str) else s) for out, s in specs.items()
    }


def partial_sums(
    group_arrays: Mapping[str, "pa.Array | pa.ChunkedArray | np.ndarray"],
    x: np.ndarray,
    w: np.ndarray | None,
    u_order: int,
    w_order: int,
) -> pa.Table:
    """Per-batch partial power sums per group (Arrow hash aggregation).

    ``x``/``w`` are float64 arrays with nulls already removed.
    Returns one row per distinct group with canonical sum columns.
    """
    tune_allocator()  # idempotent; needed under by-value pickling
    n = x.size
    arrays: dict[str, np.ndarray] = {}
    # weight is literally the value array (e.g. n_tok-weighted n_tok):
    # every weighted sum is an unweighted power sum one order up
    alias_w = w is x and u_order >= w_order + 1
    # power columns go into named per-worker scratch buffers: fresh
    # mmap'd allocations cost ~100x the compute in this environment;
    # pa.table() wraps them zero-copy and group_by consumes them
    # before the next batch reuses the buffers.
    if u_order:
        ones = buf("ps_ones", n, np.int64)
        ones.fill(1)
        arrays["u_n"] = ones
        arrays["u_s1"] = x
        prev = x
        for i in range(2, u_order + 1):
            pb = buf(f"ps_u{i}", n)
            np.multiply(prev, x, out=pb)
            arrays[f"u_s{i}"] = pb
            prev = pb
    if w_order and alias_w:
        arrays["w_sw"] = arrays["u_s1"]
        arrays["w_sv"] = arrays["u_s2"]
        for i in range(2, w_order + 1):
            arrays[f"w_s{i}"] = arrays[f"u_s{i + 1}"]
    elif w_order:
        assert w is not None
        arrays["w_sw"] = w
        wv = buf("ps_wv", n)
        np.multiply(w, x, out=wv)
        arrays["w_sv"] = wv
        prev = x
        for i in range(2, w_order + 1):
            pb = buf(f"ps_p{i}", n)
            np.multiply(prev, x, out=pb)
            wb = buf(f"ps_w{i}", n)
            np.multiply(w, pb, out=wb)
            arrays[f"w_s{i}"] = wb
            prev = pb
    group_cols = list(group_arrays)
    data = {k: v for k, v in group_arrays.items()}
    data.update(arrays)
    t = pa.table(data)
    agg = t.group_by(group_cols).aggregate([(c, "sum") for c in arrays])
    return agg.rename_columns(group_cols + list(arrays))


def _clean_xw(batch: pa.Table, value: str, weight: str | None):
    """Extract float64 value/weight arrays, dropping null rows
    (SQL-aggregate null semantics; ksqlDB likewise skips null events)."""
    mask = None
    if batch[value].null_count:
        mask = pc.is_valid(batch[value])
    if weight is not None and batch[weight].null_count:
        wv = pc.is_valid(batch[weight])
        mask = wv if mask is None else pc.and_(mask, wv)
    if mask is not None:
        batch = batch.filter(mask)
    x = batch[value].cast(pa.float64()).to_numpy(zero_copy_only=False)
    if weight == value:
        w = x  # identical object => partial_sums can alias power sums
    elif weight is not None:
        w = batch[weight].cast(pa.float64()).to_numpy(zero_copy_only=False)
    else:
        w = None
    return batch, x, w


def grouped_moments(
    ds,
    specs: Mapping[str, "AggregatorSpec | str"],
    keys: list[str] | None = None,
    *,
    value: str,
    weight: str | None = None,
    window: "Tumbling | Hopping | None" = None,
    ts: str = "ts",
    batch_size: int | None = None,
):
    """Grouped (optionally windowed) statistics over a Dataset.

    ``specs`` maps output column name -> registered aggregator name (or
    spec).  ``keys=None``/[] computes a global aggregate (constant
    group, like the reference's ``GROUP BY 'singleton'``).  ``window``
    (Tumbling/Hopping over ``ts``) adds an int64 epoch-seconds
    ``window_start`` group column.  Returns a lazy Dataset with columns
    ``keys + [window_start?] + list(specs)``.
    """
    from ray.data.aggregate import Sum

    resolved = _resolve(specs)
    needed, u_order, w_order = canonical_sums_for(resolved.values())
    if not needed:
        raise ValueError("no aggregators requested")
    if w_order and weight is None:
        raise ValueError("weighted aggregator requested but weight column is None")
    # name-based check: isinstance breaks across by-value module copies
    # (see windows.assign_windows)
    if window is not None and type(window).__name__ not in ("Tumbling", "Hopping"):
        raise TypeError(
            f"grouped_moments supports Tumbling/Hopping windows, got {window!r}; "
            "use session_moments() for Session windows"
        )
    keys = list(keys or [])
    group_cols = keys + (["window_start"] if window is not None else [])
    out_group_cols = group_cols or [_GLOBAL_KEY]

    def partial(batch: pa.Table) -> pa.Table:
        ws = None
        if window is not None:
            batch, ws = assign_windows(batch, ts, window)
            batch = batch.append_column(
                "window_start", pa.array(ws, type=pa.int64())
            )
        batch, x, w = _clean_xw(batch, value, weight)
        if keys or window is not None:
            groups = {k: batch[k] for k in group_cols}
        else:
            groups = {_GLOBAL_KEY: np.zeros(x.size, dtype=np.int8)}
        return partial_sums(groups, x, w, u_order, w_order)

    kwargs = {"batch_format": "pyarrow", "zero_copy_batch": True}
    if batch_size is not None:
        kwargs["batch_size"] = batch_size
    partials = ds.map_batches(partial, **kwargs)
    agg = partials.groupby(out_group_cols).aggregate(
        *[Sum(c, alias_name=c) for c in needed]
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {
            c: batch[c].to_numpy(zero_copy_only=False) for c in needed
        }
        out: dict[str, object] = {k: batch[k] for k in group_cols}
        for name, spec in resolved.items():
            out[name] = pa.array(
                np.atleast_1d(spec.finalize_arrays(cols)), type=pa.float64()
            )
        return pa.table(out)  # global aggregates drop the constant _all key

    return agg.map_batches(finalize, batch_format="pyarrow")


def session_moments(
    ds,
    specs: Mapping[str, "AggregatorSpec | str"],
    keys: list[str],
    *,
    value: str,
    weight: str | None = None,
    ts: str = "ts",
    gap_s: int = 300,
):
    """Session-window statistics (ksqlDB SESSION semantics: per-key
    events whose successive gaps are <= gap share a window).

    Partial sessions are built per batch (vectorized pandas), then
    merged per key with an interval cummax sweep — the step where the
    reference's ``merge()`` on overlapping partials is load-bearing.
    Output: keys + session_start_us + session_end_us (int64 epoch
    microseconds) + one column per spec.

    Partitioning assumption: all partial sessions of one key meet in
    one ``map_groups`` group (hash shuffle on ``keys``); partials are
    O(batches × keys), not O(rows).
    """
    import pandas as pd

    resolved = _resolve(specs)
    needed, u_order, w_order = canonical_sums_for(resolved.values())
    if w_order and weight is None:
        raise ValueError("weighted aggregator requested but weight column is None")
    gap_us = int(gap_s) * 1_000_000
    sum_cols = list(needed)

    def partial(batch: pa.Table) -> pa.Table:
        batch, x, w = _clean_xw(batch, value, weight)
        ts_us = ts_to_epoch_us(batch[ts])
        df = pd.DataFrame({k: batch[k].to_numpy(zero_copy_only=False) for k in keys})
        df["_ts"] = ts_us
        if u_order:
            df["u_n"] = np.ones(x.size, dtype=np.int64)
            df["u_s1"] = x
            p = x
            for i in range(2, u_order + 1):
                p = p * x
                df[f"u_s{i}"] = p
        if w_order:
            df["w_sw"] = w
            df["w_sv"] = w * x
            p = x
            for i in range(2, w_order + 1):
                p = p * x
                df[f"w_s{i}"] = w * p
        df = df.sort_values(keys + ["_ts"], kind="stable", ignore_index=True)
        key_change = np.zeros(len(df), dtype=bool)
        for k in keys:
            kv = df[k].to_numpy()
            key_change[1:] |= kv[1:] != kv[:-1]
        tsv = df["_ts"].to_numpy()
        brk = key_change.copy()
        brk[1:] |= (tsv[1:] - tsv[:-1]) > gap_us
        brk[0] = True
        df["_sess"] = np.cumsum(brk)
        g = df.groupby(keys + ["_sess"], sort=False, as_index=False).agg(
            **{c: (c, "sum") for c in sum_cols},
            session_start_us=("_ts", "min"),
            session_end_us=("_ts", "max"),
        )
        return pa.Table.from_pandas(g.drop(columns=["_sess"]), preserve_index=False)

    def merge_sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("session_start_us", kind="stable", ignore_index=True)
        ends = g["session_end_us"].to_numpy()
        starts = g["session_start_us"].to_numpy()
        run_end = np.maximum.accumulate(ends)
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (starts[1:] - run_end[:-1]) > gap_us
        g["_m"] = np.cumsum(brk)
        out = g.groupby(keys + ["_m"], sort=False, as_index=False).agg(
            **{c: (c, "sum") for c in sum_cols},
            session_start_us=("session_start_us", "min"),
            session_end_us=("session_end_us", "max"),
        )
        return out.drop(columns=["_m"])

    merged = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(keys)
        .map_groups(merge_sessions, batch_format="pandas")
    )

    def finalize(batch: pa.Table) -> pa.Table:
        cols = {c: batch[c].to_numpy(zero_copy_only=False) for c in needed}
        out = {k: batch[k] for k in keys + ["session_start_us", "session_end_us"]}
        for name, spec in resolved.items():
            out[name] = pa.array(
                np.atleast_1d(spec.finalize_arrays(cols)), type=pa.float64()
            )
        return pa.table(out)

    return merged.map_batches(finalize, batch_format="pyarrow")
