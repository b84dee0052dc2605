"""Mergeable cardinality sketches: HyperLogLog (Flajolet et al. 2007,
the standard public algorithm) plus an exact distributed distinct
count.

The HLL state is a ``2**p``-register uint8 array; ``aggregate`` is a
vectorized scatter-max per batch, ``merge`` is element-wise max (both
commutative/idempotent — safe under replay), ``map`` is the closed-form
estimate with the small-range linear-counting correction.  At 100 TB
the shuffle carries one 4 KiB register row per (group, batch) —
row-count independent, like the moment partials.

Exact path: per-batch local dedup shrinks the shuffle to distinct
pairs per batch; one groupby counts uniques per key.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raystat.windows import assign_windows

from raystat.dataops.pairs import splitmix64

__all__ = [
    "hll_init",
    "hll_add",
    "hll_merge",
    "hll_estimate",
    "grouped_hll_distinct",
    "grouped_exact_distinct",
    "grouped_entropy",
    "mg_merge",
    "grouped_mg_topk",
    "CMS_DEPTH",
    "CMS_WIDTH",
    "cms_init",
    "cms_add",
    "cms_add_weighted",
    "cms_merge",
    "cms_estimate",
    "cms_join_size",
    "grouped_cms",
]

HLL_P = 12  # 4096 registers, ~1.6% standard error
_M = 1 << HLL_P
_SUFFIX_BITS = 64 - HLL_P  # 52: suffix fits a float64 mantissa exactly
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)


def hll_init() -> np.ndarray:
    return np.zeros(_M, dtype=np.uint8)


def _rho_and_idx(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    h = splitmix64(values.astype(np.uint64, copy=False))
    idx = (h >> np.uint64(_SUFFIX_BITS)).astype(np.int64)
    suffix = (h & np.uint64((1 << _SUFFIX_BITS) - 1)).astype(np.float64)
    # bit_length via frexp: exact for integers < 2^53 (suffix < 2^52)
    _, exp = np.frexp(suffix)
    rho = np.where(suffix > 0, _SUFFIX_BITS - exp + 1, _SUFFIX_BITS + 1).astype(
        np.uint8
    )
    return idx, rho


def hll_add(regs: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Vectorized aggregate: scatter-max of rank into registers."""
    idx, rho = _rho_and_idx(np.asarray(values))
    np.maximum.at(regs, idx, rho)
    return regs


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return np.maximum(a, b)


def hll_estimate(regs: np.ndarray) -> float:
    e = _ALPHA * _M * _M / float(np.sum(np.exp2(-regs.astype(np.float64))))
    if e <= 2.5 * _M:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            return float(_M * np.log(_M / zeros))  # linear counting
    return float(e)


def grouped_hll_distinct(ds, key: str, value: str):
    """Approximate distinct ``value`` per ``key``: per-batch register
    partials (one 4 KiB row per (key, batch)) -> element-wise-max merge
    per key -> estimate.  Returns a Dataset of (key, approx_distinct)."""

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key].to_numpy(zero_copy_only=False)
        vals = batch[value].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(keys)
        idx, rho = _rho_and_idx(vals)
        # one flat scatter-max across all groups in the batch
        regs = np.zeros(len(uniq) * _M, dtype=np.uint8)
        np.maximum.at(regs, codes * _M + idx, rho)
        return pa.table(
            {
                key: pa.array(uniq),
                "regs": pa.array(
                    [regs[i * _M : (i + 1) * _M].tobytes() for i in range(len(uniq))],
                    pa.binary(),
                ),
            }
        )

    def merge_and_estimate(g: pd.DataFrame) -> pd.DataFrame:
        acc = hll_init()
        for b in g["regs"]:
            np.maximum(acc, np.frombuffer(b, dtype=np.uint8), out=acc)
        return pd.DataFrame(
            {key: [g[key].iloc[0]], "approx_distinct": [hll_estimate(acc)]}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge_and_estimate, batch_format="pandas")
    )


def grouped_exact_distinct(ds, key, value: str, *, window=None, ts: str = "ts"):
    """Exact distinct ``value`` per key (a column name or list of
    names, optionally plus a tumbling/hopping window over ``ts``):
    per-batch local dedup (the combiner — shuffle volume is
    distinct-tuples-per-batch, not rows) -> per-key unique count.
    Returns (keys..., [window_start,] n_distinct)."""
    keys = [key] if isinstance(key, str) else list(key)

    def local_dedup(batch: pa.Table) -> pa.Table:
        if window is not None:
            batch, ws = assign_windows(batch, ts, window)
            batch = batch.append_column(
                "window_start", pa.array(ws, type=pa.int64())
            )
        gcols = keys + (["window_start"] if window is not None else [])
        t = pa.table({c: batch[c] for c in gcols + [value]})
        return t.group_by(gcols + [value]).aggregate([])

    gcols = keys + (["window_start"] if window is not None else [])

    def count_unique(g: pd.DataFrame) -> pd.DataFrame:
        out = {c: [g[c].iloc[0]] for c in gcols}
        out["n_distinct"] = [int(g[value].nunique())]
        return pd.DataFrame(out)

    return (
        ds.map_batches(local_dedup, batch_format="pyarrow")
        .groupby(gcols)
        .map_groups(count_unique, batch_format="pandas")
    )


def grouped_entropy(ds, key: str, value: str):
    """Shannon entropy (nats) of the ``value`` distribution per key,
    from the same mergeable count-histogram partials as the quantile
    family: shuffle is bounded by |key| x |distinct value| per batch,
    the finalize is one vectorized -sum(p ln p) per group."""
    from ray.data.aggregate import Sum

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key], value: batch[value]})
        agg = t.group_by([key, value]).aggregate([([], "count_all")])
        return agg.rename_columns([key, value, "n"])

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        n = g["n"].to_numpy().astype(np.float64)
        p = n / n.sum()
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "entropy": [float(-(p * np.log(p)).sum())],
                "n_distinct": [np.int64(len(g))],
            }
        )

    return (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby([key, value])
        .aggregate(Sum("n", alias_name="n"))
        .groupby(key)
        .map_groups(finalize, batch_format="pandas")
    )


def mg_merge(counters: pd.Series, k: int) -> pd.Series:
    """Misra-Gries MERGE (Agarwal et al. 2012, public algorithm): sum
    counters by item, then if more than k-1 survive, subtract the k-th
    largest count from all and drop the non-positive — the summary
    keeps <= k-1 counters and under-counts any item by at most n/k."""
    if len(counters) <= k - 1:
        return counters
    vals = counters.to_numpy()
    kth = np.partition(vals, len(vals) - k)[len(vals) - k]
    out = counters - kth
    return out[out > 0]


def grouped_mg_topk(ds, key: str, value: str, k: int = 64, top: int = 10):
    """Approximate per-group heavy hitters via mergeable Misra-Gries
    summaries: per-batch exact (key, value) counts collapse each batch
    (the combiner), one groupby merges summaries with the MG rule —
    state is <= k-1 counters per group regardless of the value domain,
    the property the exact histogram path loses on unbounded vocab.
    Counts are exact whenever a group's distinct-value count stays
    below k (no decrement ever fires); pytest covers the lossy
    regime's n/k error bound.  Returns top-``top`` per group
    (ties -> smallest value), like the exact heavy-hitter query."""

    def count_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({key: batch[key], value: batch[value]})
        agg = t.group_by([key, value]).aggregate([([], "count_all")])
        return agg.rename_columns([key, value, "n"])

    def merge_topk(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(value)["n"].sum()
        c = mg_merge(c, k)
        out = c.reset_index().sort_values(
            ["n", value], ascending=[False, True], ignore_index=True
        ).head(top)
        out[key] = g[key].iloc[0]
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out[[key, value, "n", "rank"]]

    return (
        ds.map_batches(count_partial, batch_format="pyarrow")
        .groupby(key)
        .map_groups(merge_topk, batch_format="pandas")
    )


# -- Count-Min sketch (Cormode & Muthukrishnan 2005) -------------------------
#
# Fixed-size frequency sketch: DEPTH x WIDTH int64 counters, row j
# indexed by splitmix64(v ^ seed_j) % WIDTH.  add = vectorized
# bincount scatter; merge = element-wise SUM (counters are linear —
# exact under any merge order, the additive dual of HLL's idempotent
# max).  Point estimate = min over rows (never underestimates; the
# over-estimate is bounded by (e/WIDTH) * N with prob 1 - e**-DEPTH).
# At 100 TB the shuffle carries one 256 KiB counter row per
# (group, batch) — row-count independent, like the HLL registers.

CMS_DEPTH = 4
CMS_WIDTH = 8192
# deterministic per-row seeds: splitmix64 finalizer of j * golden ratio
_CMS_SEEDS = splitmix64(
    (np.arange(1, CMS_DEPTH + 1, dtype=np.uint64))
    * np.uint64(0x9E3779B97F4A7C15)
)


def cms_init() -> np.ndarray:
    return np.zeros(CMS_DEPTH * CMS_WIDTH, dtype=np.int64)


def _cms_flat_idx(values: np.ndarray) -> np.ndarray:
    """(DEPTH, n) flat counter indices j*WIDTH + h_j(v)."""
    v = np.asarray(values).astype(np.uint64, copy=False)
    rows = []
    for j in range(CMS_DEPTH):
        h = splitmix64(v ^ _CMS_SEEDS[j]) % np.uint64(CMS_WIDTH)
        rows.append(h.astype(np.int64) + j * CMS_WIDTH)
    return np.stack(rows)


def cms_add(counts: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Vectorized aggregate: one bincount over all DEPTH index rows."""
    if len(values):
        idx = _cms_flat_idx(values).ravel()
        counts += np.bincount(idx, minlength=CMS_DEPTH * CMS_WIDTH).astype(
            np.int64
        )
    return counts


def cms_add_weighted(
    counts: np.ndarray, values: np.ndarray, weights: np.ndarray
) -> np.ndarray:
    """Add pre-aggregated (value, count) pairs — the streaming partials
    path, where the router already collapsed each batch to distinct
    items.  Equivalent to ``cms_add`` over the expanded multiset."""
    if len(values):
        idx = _cms_flat_idx(values)
        w = np.asarray(weights, dtype=np.int64)
        np.add.at(counts, idx.ravel(), np.tile(w, CMS_DEPTH))
    return counts


def cms_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    return a + b


def cms_estimate(counts: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Per-value point estimate: min over the DEPTH counter rows."""
    if not len(values):
        return np.zeros(0, dtype=np.int64)
    return counts[_cms_flat_idx(values)].min(axis=0)


def cms_join_size(a: np.ndarray, b: np.ndarray) -> int:
    """Equi-join cardinality estimate (Cormode-Muthukrishnan §4.2):
    min over rows of the per-row inner product of two sketches built
    with the SAME hashes — estimates sum_v fA(v)*fB(v), never below
    the true join size, over by at most (e/WIDTH)*N_A*N_B with prob
    1 - e**-DEPTH."""
    ra = a.reshape(CMS_DEPTH, CMS_WIDTH)
    rb = b.reshape(CMS_DEPTH, CMS_WIDTH)
    return int((ra * rb).sum(axis=1).min())


def grouped_cms(ds, key: str, value: str):
    """Per-key merged Count-Min sketch: one fixed-size counter blob per
    (key, batch) partial (256 KiB, row-count independent), one tiny
    groupby to sum them.  Returns a Dataset of (key, n, cms) with n =
    total ingested rows (the estimate-error scale) and cms = the
    int64-LE counter blob."""

    def partial(batch: pa.Table) -> pa.Table:
        keys, blobs, ns = [], [], []
        kcol = batch[key].to_numpy(zero_copy_only=False)
        vals = batch[value].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(kcol, sort=False)
        for c, k in enumerate(uniq):
            v = vals[codes == c]
            keys.append(k)
            ns.append(len(v))
            blobs.append(cms_add(cms_init(), v).tobytes())
        return pa.table(
            {
                key: pa.array(keys),
                "n": pa.array(np.asarray(ns, dtype=np.int64)),
                "cms": pa.array(blobs, pa.binary()),
            }
        )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        acc = cms_init()
        for b in g["cms"]:
            acc = cms_merge(acc, np.frombuffer(b, dtype=np.int64))
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "n": [int(g["n"].sum())],
                "cms": [acc.tobytes()],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .map_groups(merge, batch_format="pandas")
    )
