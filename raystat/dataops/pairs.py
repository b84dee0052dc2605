"""Shared LSH-pair machinery: bounded bucket pair generation and a
distributed candidate-verify pass.

Both pieces target the two 100-TB failure modes of naive LSH
pipelines:

1. ``capped_bucket_pairs`` — a degenerate hot bucket (many identical
   band hashes: empty texts, zero vectors, boilerplate) makes
   ``np.triu_indices`` emit |b|^2/2 pairs in one task.  Oversized
   buckets are sub-split by a secondary hash of the id into
   ceil(n/cap) sub-buckets, bounding emitted pairs to ~n*cap/2
   (linear in n) per bucket; an overflow sentinel row per oversized
   bucket reports (bucket size) upstream so callers can surface a
   ``bucket_overflow`` metric.  Sub-splitting trades recall only
   ACROSS sub-buckets of the same degenerate bucket — standard LSH
   practice; downstream connected-component dedup recovers the
   cluster via transitivity.

2. ``verify_pairs_distributed`` — exact verification of candidate
   pairs without materializing payloads (texts / shingle sets /
   vectors) on the driver.  Pairs are hash-partitioned by pair key;
   ONE streaming pass over the corpus computes each referenced id's
   payload and replicates it to exactly the partitions whose pairs
   need it (the id->partitions routing map broadcasts via ``ray.put``
   — ids and partition ints only, never payloads); a
   ``groupby("part")`` co-locates pairs with payloads and verifies
   inside the group.  Only id pairs (16 B each — the same magnitude
   as the function's own return value) ever touch the driver.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "splitmix64",
    "capped_bucket_pairs",
    "sort_segments",
    "segmented_capped_pairs",
    "bucket_partition",
    "pop_overflow",
    "verify_pairs_distributed",
    "OVERFLOW_SENTINEL",
]

# sentinel doc_a marking an overflow metric row (doc_b = bucket size)
OVERFLOW_SENTINEL = -1


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (splitmix64 finalizer)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def capped_bucket_pairs(ids: np.ndarray, cap: int) -> pd.DataFrame:
    """All (a < b) pairs within one LSH bucket, bounded.

    Buckets of size <= cap pair exhaustively.  Larger buckets are
    sub-split by ``splitmix64(id) % ceil(n/cap)``; pairs are emitted
    within sub-buckets only, and one sentinel row
    (doc_a=OVERFLOW_SENTINEL, doc_b=bucket_size) reports the overflow.
    Output columns: doc_a, doc_b (int64)."""
    ids = np.sort(np.asarray(ids, dtype=np.int64))
    n = len(ids)
    if n < 2:
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype=np.int64), "doc_b": pd.Series(dtype=np.int64)}
        )
    if n <= cap:
        a, b = np.triu_indices(n, k=1)
        return pd.DataFrame({"doc_a": ids[a], "doc_b": ids[b]})
    nsub = -(-n // cap)  # ceil
    sub = (splitmix64(ids.astype(np.uint64)) % np.uint64(nsub)).astype(np.int64)
    out_a = [np.array([OVERFLOW_SENTINEL], dtype=np.int64)]
    out_b = [np.array([n], dtype=np.int64)]
    order = np.argsort(sub, kind="stable")  # ids stay sorted within sub
    sub_s, ids_s = sub[order], ids[order]
    starts = np.nonzero(np.r_[True, sub_s[1:] != sub_s[:-1]])[0]
    bounds = np.append(starts, n)
    for i in range(len(starts)):
        m = ids_s[bounds[i] : bounds[i + 1]]
        if len(m) >= 2:
            a, b = np.triu_indices(len(m), k=1)
            out_a.append(m[a])
            out_b.append(m[b])
    return pd.DataFrame(
        {"doc_a": np.concatenate(out_a), "doc_b": np.concatenate(out_b)}
    )


def sort_segments(ids: np.ndarray, *keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Lexsort rows by (keys..., ids) and locate bucket boundaries:
    returns (order, starts) where ``order`` sorts all arrays and
    ``starts`` indexes the first row of each distinct key tuple in the
    sorted layout.  The one shared sweep under every partitioned
    pair-gen/loser path (minhash, simhash, exact dedup/pairs,
    embedding LSH)."""
    order = np.lexsort((ids, *reversed(keys)))
    brk = np.zeros(len(ids), dtype=bool)
    if len(ids):
        brk[0] = True
    for k in keys:
        ks = k[order]
        brk[1:] |= ks[1:] != ks[:-1]
    return order, np.flatnonzero(brk)


def segmented_capped_pairs(
    ids_sorted: np.ndarray, starts: np.ndarray, cap: int
) -> pd.DataFrame:
    """Pairs within each segment of an already-sorted (by bucket key,
    then id) id array.  Segment boundaries come from ``starts``;
    singleton segments (the vast majority of LSH buckets) cost one
    vectorized mask, and Python only touches the COLLIDING segments —
    this is what makes bucket pair generation viable when a groupby
    would otherwise invoke a Python fn once per tiny bucket."""
    ends = np.append(starts[1:], len(ids_sorted))
    sizes = ends - starts
    multi = np.nonzero(sizes >= 2)[0]
    if not len(multi):
        return pd.DataFrame(
            {"doc_a": pd.Series(dtype=np.int64), "doc_b": pd.Series(dtype=np.int64)}
        )
    out = [
        capped_bucket_pairs(ids_sorted[starts[i] : ends[i]], cap) for i in multi
    ]
    return pd.concat(out, ignore_index=True)


def bucket_partition(*keys: np.ndarray, n_parts: int = 64) -> np.ndarray:
    """Stable partition assignment for bucket keys (mixed then
    modulo): buckets sharing a partition are processed together by one
    map_groups call instead of one call per bucket.

    SIZE n_parts TO THE DATA: each partition materializes
    ~rows/n_parts (hash, id[, payload]) rows in one task, so pick
    n_parts ~= total_rows / 2M (the default 64 covers up to ~10^8
    rows; a 10^12-row corpus wants n_parts ~ 10^5-10^6).  The
    per-partition Python-call overhead this amortizes is O(n_parts)
    total — negligible at any setting — while the vectorized segment
    sweep inside each call is what removes the per-bucket cost."""
    h = np.zeros(len(keys[0]), dtype=np.uint64)
    for k in keys:
        h = splitmix64(h ^ k.astype(np.uint64))
    return (h % np.uint64(n_parts)).astype(np.int64)


def pop_overflow(cand: pd.DataFrame, metrics: dict | None) -> pd.DataFrame:
    """Split sentinel rows out of a candidate-pair frame; record
    bucket_overflow counts into ``metrics`` (if given)."""
    ovf = cand[cand["doc_a"] == OVERFLOW_SENTINEL]
    if metrics is not None:
        metrics["overflow_buckets"] = int(len(ovf))
        metrics["max_bucket_size"] = int(ovf["doc_b"].max()) if len(ovf) else 0
    return cand[cand["doc_a"] != OVERFLOW_SENTINEL]


def pairwise_set_jaccard(arrs_a: list, arrs_b: list) -> np.ndarray:
    """Exact Jaccard for ALIGNED lists of distinct-value int64 arrays
    in ONE lexsort-merge sweep over the flattened (pair, value) rows:
    within a pair each side is a distinct set, so equal-adjacent rows
    after the (pair, value) sort are exactly the common elements — no
    per-pair Python.  Empty-vs-empty pairs score 1.0 (union 0)."""
    m = len(arrs_a)
    if not m:
        return np.empty(0, dtype=np.float64)
    la = np.fromiter((v.size for v in arrs_a), dtype=np.int64, count=m)
    lb = np.fromiter((v.size for v in arrs_b), dtype=np.int64, count=m)
    flat = np.concatenate(arrs_a + arrs_b)
    pid = np.concatenate(
        [np.repeat(np.arange(m), la), np.repeat(np.arange(m), lb)]
    )
    order = np.lexsort((flat, pid))
    f, p = flat[order], pid[order]
    if f.size < 2:
        inter = np.zeros(m, dtype=np.int64)
    else:
        eq = (f[1:] == f[:-1]) & (p[1:] == p[:-1])
        inter = np.bincount(p[:-1][eq], minlength=m).astype(np.int64)
    union = la + lb - inter
    return np.where(union > 0, inter / np.maximum(union, 1), 1.0)


def verify_pairs_distributed(
    ds,
    cand: pd.DataFrame,
    id_col: str,
    payload_of: Callable[[pa.Table, np.ndarray], list],
    verify_group: Callable[[pd.DataFrame, dict], pd.DataFrame],
    payload_type: pa.DataType,
    out_schema: dict[str, np.dtype],
    pairs_per_partition: int = 2048,
    max_partitions: int = 256,
) -> pd.DataFrame:
    """Exact-verify candidate id pairs in a co-partitioned distributed
    pass (no payloads on the driver).

    ``cand``: DataFrame with doc_a/doc_b int64 columns (deduplicated).
    ``payload_of(batch, row_idx) -> list`` computes the per-row verify
    payload (e.g. sorted shingle array, normalized vector) for the
    selected row indices of a corpus batch.
    ``verify_group(pairs_df, payload_by_id) -> DataFrame`` runs inside
    each partition's ``map_groups`` and emits verified rows.
    ``out_schema``: name->dtype of verify_group's output (for empty
    groups)."""
    import ray
    import ray.data as rd

    empty = pd.DataFrame({c: pd.Series(dtype=t) for c, t in out_schema.items()})
    if not len(cand):
        return empty
    a = cand["doc_a"].to_numpy().astype(np.int64)
    b = cand["doc_b"].to_numpy().astype(np.int64)
    n_part = int(min(max_partitions, max(1, len(a) // pairs_per_partition + 1)))
    part = (
        (splitmix64(a.astype(np.uint64)) ^ splitmix64(~b.astype(np.uint64)))
        % np.uint64(n_part)
    ).astype(np.int64)

    # id -> needing-partitions routing map (CSR over unique ids)
    ids_rep = np.concatenate([a, b])
    parts_rep = np.concatenate([part, part])
    order = np.lexsort((parts_rep, ids_rep))
    ir, pr = ids_rep[order], parts_rep[order]
    keep = np.ones(len(ir), dtype=bool)
    keep[1:] = (ir[1:] != ir[:-1]) | (pr[1:] != pr[:-1])
    ir, pr = ir[keep], pr[keep]
    uids, starts = np.unique(ir, return_index=True)
    offs = np.append(starts, len(ir)).astype(np.int64)
    route = ray.put((uids, offs, pr))

    def empty_payload_tbl() -> pa.Table:
        return pa.table(
            {
                "part": pa.array([], pa.int64()),
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "pid": pa.array([], pa.int64()),
                "payload": pa.array([], payload_type),
            }
        )

    def payload_pass(batch: pa.Table) -> pa.Table:
        uids_, offs_, pflat = ray.get(route)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(uids_, ids)
        pos[pos == uids_.size] = 0
        sel = uids_[pos] == ids
        if not sel.any():
            return empty_payload_tbl()
        rs = np.nonzero(sel)[0]
        p0 = pos[rs]
        cnts = offs_[p0 + 1] - offs_[p0]
        total = int(cnts.sum())
        # flat indices into pflat for each (row, needing-partition)
        base = np.repeat(offs_[p0], cnts)
        within = np.arange(total) - np.repeat(np.cumsum(cnts) - cnts, cnts)
        parts_for = pflat[base + within]
        rep_rows = np.repeat(np.arange(len(rs)), cnts)  # index into rs order
        payloads = payload_of(batch, rs)  # aligned to rs
        return pa.table(
            {
                "part": pa.array(parts_for.astype(np.int64)),
                "doc_a": pa.nulls(total, pa.int64()),
                "doc_b": pa.nulls(total, pa.int64()),
                "pid": pa.array(ids[rs][rep_rows]),
                "payload": pa.array([payloads[k] for k in rep_rows], type=payload_type),
            }
        )

    pair_tbl = pa.table(
        {
            "part": pa.array(part),
            "doc_a": pa.array(a),
            "doc_b": pa.array(b),
            "pid": pa.nulls(len(a), pa.int64()),
            "payload": pa.nulls(len(a), payload_type),
        }
    )

    def run_group(g: pd.DataFrame) -> pd.DataFrame:
        has_pid = g["pid"].notna()
        pl = g[has_pid]
        prs = g[~has_pid]
        if not len(prs):
            return empty
        lookup = {
            int(i): np.asarray(v) for i, v in zip(pl["pid"], pl["payload"])
        }
        out = verify_group(prs, lookup)
        return out if len(out) else empty

    pairs_ds = rd.from_arrow(pair_tbl)
    pl_ds = ds.map_batches(payload_pass, batch_format="pyarrow")
    out = (
        pairs_ds.union(pl_ds)
        .groupby("part")
        .map_groups(run_group, batch_format="pandas")
        .to_pandas()
    )
    if not len(out):
        return empty
    return out.astype({c: t for c, t in out_schema.items() if c in out.columns})
