"""Distributed hash equi-join (big x big) — Ray Data has no native
Dataset.join, so the repartition join is built from primitives:

1. Tag each side and hash-partition BOTH on the join key into
   ``n_parts`` co-partitions (the one all-to-all exchange — the
   inherent cost of a big-big join; small sides should use the
   broadcast pattern instead, see ``customer_stats_by_region``).
2. One ``map_groups`` per PARTITION runs pandas' C hash join over all
   keys in that partition — no per-key Python.

Skew: a hot join key bounds one task's input; because the
per-partition join is hash-based (not pairwise), a hot key costs
O(|left_k| x |right_k|) only in its OUTPUT size, which is the join's
true cardinality — unavoidable.  ``n_parts`` sizes tasks.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raystat.dataops.asof import _key_u64

__all__ = ["hash_join"]


def hash_join(
    left_ds,
    right_ds,
    *,
    on: str,
    n_parts: int = 64,
    how: str = "inner",
):
    """Equi-join two Datasets on column ``on`` (same name both sides).
    ``how``: "inner" or "left".  Returns a Dataset with the union of
    both sides' columns (join key once)."""
    if how not in ("inner", "left"):
        raise ValueError(f"how={how!r}: inner or left")
    ls, rs = left_ds.schema(), right_ds.schema()
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))
    lcols = [c for c in ls.names if c != on]
    rcols = [c for c in rs.names if c != on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"column collision outside join key: {sorted(overlap)}")

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            k = batch[on].to_numpy(zero_copy_only=False)
            part = (_key_u64(k) % np.uint64(n_parts)).astype(np.int32)
            nulls = pa.nulls(batch.num_rows)
            cols: dict[str, object] = {
                on: batch[on],
                "_side": pa.array(np.full(batch.num_rows, side, dtype=np.int8)),
                "_part": pa.array(part),
            }
            for c in lcols:
                cols[c] = batch[c] if side == 1 else nulls.cast(ltypes[c])
            for c in rcols:
                cols[c] = batch[c] if side == 0 else nulls.cast(rtypes[c])
            return pa.table(cols)

        return fn

    both = left_ds.map_batches(tag(1), batch_format="pyarrow").union(
        right_ds.map_batches(tag(0), batch_format="pyarrow")
    )

    def per_partition(g: pd.DataFrame) -> pd.DataFrame:
        lf = g[g["_side"] == 1][[on] + lcols]
        rf = g[g["_side"] == 0][[on] + rcols]
        out = lf.merge(rf, on=on, how=how)
        return out.reset_index(drop=True)

    return both.groupby("_part").map_groups(per_partition, batch_format="pandas")
