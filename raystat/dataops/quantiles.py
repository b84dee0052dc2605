"""Exact distributed quantiles over integer-valued columns.

For discrete domains (token lengths, counts, sizes) exact quantiles
need no sketch: per-batch value HISTOGRAMS are mergeable partials, so
the shuffle carries at most |groups| x |distinct values| x #batches
rows — row-count independent — and the final per-group pass is a
cumsum over the merged histogram.  (Continuous domains at 100 TB would
swap the histogram for a mergeable sketch — t-digest / KLL — behind the
same two-stage shape; the discrete path is exact, which is what the
correctness gate wants.)

Selection rule matches DuckDB's ``quantile_disc``: the smallest value
whose cumulative count reaches ``ceil(q * n)`` (empirically pinned,
index = ceil(q*n)-1 of the sorted multiset), so the SQL twin is a
one-liner.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "grouped_exact_quantiles",
    "grouped_weighted_quantiles",
    "grouped_trimmed_mean",
    "grouped_mode",
    "grouped_mad",
    "grouped_topk",
]


def grouped_exact_quantiles(
    ds,
    key: str = "source",
    value: str = "n_tok",
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
    names: tuple[str, ...] = ("p25", "p50", "p75", "p90", "p99"),
):
    """(key, *names) — exact per-group quantiles of an integer column.

    Stage 1 collapses each batch to its (key, value) histogram; stage 2
    merges histograms with a metadata-sized ``groupby().aggregate``;
    stage 3 scans each group's sorted histogram once."""
    from ray.data.aggregate import Sum

    assert len(qs) == len(names)
    qs_arr = np.asarray(qs, dtype=np.float64)

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key: batch[key].to_pandas(),
                value: batch[value].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby([key, value], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value, ignore_index=True)
        c = g["n"].to_numpy().cumsum()
        n = int(c[-1])
        ranks = np.ceil(qs_arr * n)
        idx = np.searchsorted(c, ranks, side="left")
        v = g[value].to_numpy()[np.minimum(idx, len(c) - 1)]
        return pd.DataFrame(
            {key: [g[key].iloc[0]], **{nm: [int(x)] for nm, x in zip(names, v)}}
        )

    return (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, value])
        .aggregate(Sum("n", alias_name="n"))
        .groupby(key)
        .map_groups(finalize, batch_format="pandas")
    )


def grouped_weighted_quantiles(
    ds,
    key: str,
    value: str,
    weight: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    names: tuple[str, ...] = ("wp25", "wp50", "wp75", "wp90"),
):
    """(key, *names) — exact per-group WEIGHTED quantiles of an
    integer column with non-negative INTEGER weights: the smallest
    value whose cumulative weight reaches ``q x total_weight`` —
    the mass-based analog of ``quantile_disc``, completing the
    reference's weighted-moments family (weighted stddev / skew /
    kurt) with weighted order statistics.

    Same mergeable two-stage shape as the unweighted path, with the
    per-batch histogram carrying sum(weight) instead of counts —
    shuffle stays |groups| x |distinct values| x #batches, row-count
    independent.  Integer weights keep the cumulative sums EXACT
    (float weights would make the cumsum order-dependent); the
    ``cw >= q*tw`` threshold compare is then one IEEE double multiply
    both here and in the SQL twin — bit-identical."""
    from ray.data.aggregate import Sum

    assert len(qs) == len(names)
    qs_arr = np.asarray(qs, dtype=np.float64)

    def hist_partial(batch: pa.Table) -> pa.Table:
        w = batch[weight].to_numpy(zero_copy_only=False).astype(np.int64)
        if (w < 0).any():
            raise ValueError("weighted quantiles need non-negative weights")
        df = pd.DataFrame(
            {
                key: batch[key].to_pandas(),
                value: batch[value].to_numpy(zero_copy_only=False).astype(np.int64),
                "wn": w,
            }
        )
        g = df.groupby([key, value], sort=False)["wn"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value, ignore_index=True)
        c = g["wn"].to_numpy().cumsum()
        tw = int(c[-1])
        idx = np.searchsorted(c, qs_arr * tw, side="left")
        v = g[value].to_numpy()[np.minimum(idx, len(c) - 1)]
        return pd.DataFrame(
            {key: [g[key].iloc[0]], **{nm: [int(x)] for nm, x in zip(names, v)}}
        )

    return (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, value])
        .aggregate(Sum("wn", alias_name="wn"))
        .groupby(key)
        .map_groups(finalize, batch_format="pandas")
    )


def grouped_trimmed_mean(ds, key: str = "source", value: str = "n_tok",
                         trim: float = 0.05):
    """Exact per-group trimmed mean of an integer column: drop the
    lowest and highest ``floor(trim * n)`` observations, average the
    rest.  Same mergeable-histogram partials as
    :func:`grouped_exact_quantiles`; the finalize distributes each
    histogram bin's count across the kept rank interval (one cumsum,
    no expansion back to rows).  SQL twin: row_number/count window +
    AVG over the kept rank range."""
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key: batch[key].to_pandas(),
                value: batch[value].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby([key, value], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(value, ignore_index=True)
        cnt = g["n"].to_numpy().astype(np.int64)
        hi_c = cnt.cumsum()
        lo_c = hi_c - cnt
        n = int(hi_c[-1])
        cut = int(np.floor(trim * n))
        lo_rank, hi_rank = cut, n - cut  # keep ranks (lo_rank, hi_rank]
        kept = np.clip(np.minimum(hi_c, hi_rank) - np.maximum(lo_c, lo_rank), 0, None)
        total = int(kept.sum())
        vals = g[value].to_numpy().astype(np.float64)
        mean = float((vals * kept).sum() / total) if total else 0.0
        return pd.DataFrame(
            {key: [g[key].iloc[0]], "trimmed_mean": [mean],
             "n_kept": [np.int64(total)]}
        )

    return (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, value])
        .aggregate(Sum("n", alias_name="n"))
        .groupby(key)
        .map_groups(finalize, batch_format="pandas")
    )


def grouped_mode(ds, key: str, value: str):
    """Exact per-group mode (most frequent value; ties -> smallest
    value, the deterministic rule shared with the SQL twin's
    row_number ORDER BY n DESC, value).  Same mergeable-histogram
    partials; finalize is one idxmax per group."""
    from ray.data.aggregate import Sum

    def hist_partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                key: batch[key].to_pandas(),
                value: batch[value].to_numpy(zero_copy_only=False),
            }
        )
        g = df.groupby([key, value], sort=False).size().reset_index(name="n")
        return pa.Table.from_pandas(g, preserve_index=False)

    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([value], ignore_index=True)  # tie-break: smallest value
        i = int(g["n"].to_numpy().argmax())  # argmax takes the FIRST max
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "mode_value": [g[value].iloc[i]],
                "mode_count": [np.int64(g["n"].iloc[i])],
            }
        )

    return (
        ds.map_batches(hist_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([key, value])
        .aggregate(Sum("n", alias_name="n"))
        .groupby(key)
        .map_groups(finalize, batch_format="pandas")
    )


def grouped_mad(ds, ds_again, key: str, value: str):
    """Exact per-group median absolute deviation over an
    integer-valued column, in two histogram passes: (1) per-group
    median, broadcast to (2) a second histogram pass over
    ``|value - median|``.  The broadcast side is O(groups) — the
    canonical small-side pattern; rows never shuffle.

    ``ds`` and ``ds_again`` are two handles on the same input (Ray
    Datasets are consumed by execution; callers pass two readers).
    Returns (key, median, mad) as int64 (quantile_disc selection
    rule on both)."""
    med = (
        grouped_exact_quantiles(ds, key=key, value=value, qs=(0.5,), names=("med",))
        .to_pandas()
    )
    med_map = dict(zip(med[key], med["med"].astype(np.int64)))

    def absdev(batch: pa.Table) -> pa.Table:
        k = batch[key].to_pandas()
        v = batch[value].to_numpy(zero_copy_only=False).astype(np.int64)
        m = k.map(med_map).to_numpy(dtype=np.int64)
        return pa.table({key: batch[key], "absdev": pa.array(np.abs(v - m))})

    mad = grouped_exact_quantiles(
        ds_again.map_batches(absdev, batch_format="pyarrow"),
        key=key,
        value="absdev",
        qs=(0.5,),
        names=("mad",),
    ).to_pandas()
    out = med.merge(mad, on=key)
    return out[[key, "med", "mad"]]


def grouped_topk(ds, key: str, value: str, k: int = 10, extra_cols: list | None = None):
    """Top-k rows per group by ``value`` (desc; ties broken by the
    extra columns' order being irrelevant — callers wanting
    deterministic ties should pass a unique tiebreak in ``value``).
    Per-batch combiner keeps only k rows per (key, batch), so the
    shuffle carries O(k x |keys| x #batches) rows, never the input."""

    extra = list(extra_cols or [])

    def prune(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {c: batch[c].to_pandas() for c in [key, value] + extra}
        )
        g = (
            df.sort_values(value, ascending=False, kind="stable")
            .groupby(key, sort=False)
            .head(k)
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(value, ascending=False, kind="stable").head(k).copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return (
        ds.map_batches(prune, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(key)
        .map_groups(final, batch_format="pandas")
    )
