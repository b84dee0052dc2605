"""Similarity search over an embedding column (``list<float>``).

- brute-force cosine top-k: the query matrix is normalized once and
  broadcast via ``ray.put``; each batch does one float64 matmul
  against it — the baseline and the exact oracle.
- LSH-bucketed near-dup pairs: random-hyperplane signatures ->
  bucket groupby -> exact cosine verify within buckets (the scale
  path: only signatures shuffle; verification touches bucket-local
  vectors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from raystat.dataops.pairs import (
    bucket_partition,
    pop_overflow,
    segmented_capped_pairs,
    sort_segments,
    verify_pairs_distributed,
)

__all__ = [
    "ann_topk",
    "embedding_dup_pairs",
    "embedding_lsh_pairs",
    "train_centroids",
    "ivf_index",
    "ann_topk_ivf",
    "label_centroids",
    "quantize_embeddings",
]


def _stack(batch_col) -> np.ndarray:
    col = batch_col.combine_chunks() if hasattr(batch_col, "combine_chunks") else batch_col
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


def _normalize(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return X / n


def _batch_topk(C: np.ndarray, ids: np.ndarray, k: int):
    """Exact per-column top-k of a (n_batch x n_q) score matrix with
    (cos desc, id asc) ordering — vectorized across ALL queries (no
    per-query Python loop): one argpartition along axis 0, a
    boundary-tie repair (entries equal to the kth value join the
    candidate set, so a tied smaller id can never be dropped), then
    one global lexsort over the ~k*q candidates.  Entries set to -inf
    are excluded.  Returns (col, id, cos) flat arrays, <=k rows per
    column."""
    n, q = C.shape
    if n == 0 or q == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, np.zeros(0, dtype=np.float64)
    kk = min(k, n)
    colsq = np.arange(q)
    part = np.argpartition(-C, kk - 1, axis=0)[:kk]  # (kk, q)
    vmin = C[part, colsq].min(axis=0)  # per-column kth value
    cand = np.zeros(C.shape, dtype=bool)
    cand[part, colsq] = True
    cand |= C == vmin[None, :]
    cand &= np.isfinite(C)  # excluded (-inf) entries never surface
    cols, rows = np.nonzero(cand.T)
    cosv = C[rows, cols]
    idv = ids[rows]
    order = np.lexsort((idv, -cosv, cols))
    cols, idv, cosv = cols[order], idv[order], cosv[order]
    if not len(cols):
        return cols.astype(np.int64), idv.astype(np.int64), cosv
    idxs = np.arange(len(cols))
    first = np.r_[True, cols[1:] != cols[:-1]]
    rank = idxs - np.maximum.accumulate(np.where(first, idxs, 0))
    keep = rank < k
    return cols[keep].astype(np.int64), idv[keep].astype(np.int64), cosv[keep]


def embedding_covariance(ds, vec_col: str = "embedding"):
    """Population covariance matrix of the embedding distribution,
    long-form upper triangle (i, j, cov) — the distributed
    linear-algebra primitive under embedding-quality analysis
    (anisotropy / effective-rank / whitening checks).

    Mergeable Gram partials: each batch collapses to ONE row carrying
    (n, Σx [d floats], X^T X [d² floats]) — the d×d second-moment
    matrix sums associatively, so at 100 TB the driver combines
    O(batches) fixed-size blobs (d=1k ⇒ 8 MB each) and the corpus
    never shuffles.  cov = G/n − mean·meanᵀ."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        X = _stack(batch[vec_col])
        return pa.table(
            {
                "n": pa.array([X.shape[0]], pa.int64()),
                "d": pa.array([X.shape[1]], pa.int64()),
                "s": pa.array([X.sum(axis=0).tobytes()], pa.binary()),
                "g": pa.array([(X.T @ X).tobytes()], pa.binary()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    d = int(parts["d"].iloc[0])
    n = int(parts["n"].sum())
    s = np.zeros(d, dtype=np.float64)
    g = np.zeros((d, d), dtype=np.float64)
    for _, row in parts.iterrows():
        s += np.frombuffer(row["s"], dtype=np.float64)
        g += np.frombuffer(row["g"], dtype=np.float64).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    iu, ju = np.triu_indices(d)
    import pandas as pd

    return pd.DataFrame(
        {"i": iu.astype(np.int64) + 1, "j": ju.astype(np.int64) + 1,
         "cov": cov[iu, ju]}
    )


def label_centroids(ds, label_col: str = "label", vec_col: str = "embedding"):
    """Per-label mean embedding (class centroids), emitted long-form as
    (label, dim, mean).  Per-batch (label -> dim-wise sum, count)
    partials collapse each batch to |labels in batch| x dim rows before
    the one small shuffle — row-count independent, the moment-partial
    shape applied to vectors."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        X = _stack(batch[vec_col])
        labels = batch[label_col].to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(labels)
        sums = np.zeros((len(uniq), X.shape[1]), dtype=np.float64)
        np.add.at(sums, codes, X)
        counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
        d = X.shape[1]
        return pa.table(
            {
                label_col: pa.array(np.repeat(np.asarray(uniq), d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), len(uniq))),
                "s": pa.array(sums.ravel()),
                "n": pa.array(np.repeat(counts, d)),
            }
        )

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby([label_col, "dim"])
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        s = batch["s"].to_numpy(zero_copy_only=False)
        n = batch["n"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                label_col: batch[label_col],
                "dim": batch["dim"],
                "mean": pa.array(s / n, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def quantize_embeddings(ds, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Symmetric per-vector int8 quantization (the storage scale path:
    4x smaller vectors for ANN recall stages).  scale = max|v|/127;
    q = clip(floor(v/scale + 0.5), -127, 127) — the floor(x+0.5)
    rounding is chosen because DuckDB's floor reproduces it exactly
    (SQL twin in queries.py).  Zero-shuffle map_batches; emits the
    int8 vector + scale."""
    import pyarrow as pa

    def qz(batch: pa.Table) -> pa.Table:
        X = _stack(batch[vec_col])
        scale = np.abs(X).max(axis=1) / 127.0
        safe = np.where(scale == 0.0, 1.0, scale)
        q = np.clip(np.floor(X / safe[:, None] + 0.5), -127, 127).astype(np.int8)
        q[scale == 0.0] = 0
        n, d = q.shape
        offs = np.arange(0, (n + 1) * d, d, dtype=np.int32)
        return pa.table(
            {
                id_col: batch[id_col],
                "scale": pa.array(scale, pa.float64()),
                "qvec": pa.ListArray.from_arrays(
                    pa.array(offs), pa.array(q.ravel(), pa.int8())
                ),
            }
        )

    return ds.map_batches(qz, batch_format="pyarrow", zero_copy_batch=True)


def ann_topk(
    ds,
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """Exact cosine top-k: per-batch partial top-k against the
    broadcast query matrix, merged on the driver (k x |queries| rows
    per batch — tiny).  Ties broken by ascending id (deterministic).
    Returns DataFrame (query_id, neighbor_id, cos)."""
    import ray

    Q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    qref = ray.put((Q, np.asarray(query_ids, dtype=np.int64)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        Qm, qids = ray.get(qref)
        X = _normalize(_stack(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        C = X @ Qm.T  # (n_batch, n_q)
        if exclude_self:
            C[ids[:, None] == qids[None, :]] = -np.inf
        cols, nids, cosv = _batch_topk(C, ids, k)
        return pa.table(
            {
                "query_id": pa.array(qids[cols]),
                "neighbor_id": pa.array(nids),
                "cos": pa.array(cosv),
            }
        )

    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return parts
    parts = parts.sort_values(
        ["query_id", "cos", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    return parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def train_centroids(
    ds,
    n_centroids: int = 16,
    sample_size: int = 20_000,
    iters: int = 8,
    seed: int = 7,
    vec_col: str = "embedding",
) -> np.ndarray:
    """Coarse quantizer for IVF: k-means (Lloyd) on a driver-side
    sample of normalized vectors.  Deterministic (seeded init from the
    sample); the sample — not the corpus — bounds driver memory."""
    sample = ds.limit(sample_size).to_pandas()
    X = _normalize(np.stack(sample[vec_col].to_numpy()).astype(np.float64))
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            m = assign == c
            if m.any():
                v = X[m].mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    C[c] = v / n
    return C


def ivf_index(
    ds,
    out_dir: str,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Materialize an IVF index: one Parquet partition directory per
    centroid (``centroid=<c>/``).  This is the 100-TB shape — searches
    prune at the READ (only probed partitions are opened), and a failed
    build can re-run per partition.  One streaming assignment pass."""
    import ray

    cref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = _normalize(_stack(batch[vec_col]))
        a = np.argmax(X @ C.T, axis=1).astype(np.int64)
        # centroid kept as a data column too (partition_cols strips the
        # hive column from the files; search reads files directly)
        return batch.append_column("centroid", pa.array(a)).append_column(
            "centroid_part", pa.array(a)
        )

    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["centroid_part"]
    )
    return out_dir


def ann_topk_ivf(
    index_dir: str,
    centroids: np.ndarray,
    query_vectors: np.ndarray,
    query_ids: np.ndarray,
    k: int = 10,
    nprobe: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
):
    """IVF search over an ``ivf_index`` directory: each query probes
    its ``nprobe`` nearest centroids; only those partitions are READ
    (column/partition pruning does the work Ray-side), then the probed
    subset runs the same broadcast partial-top-k as :func:`ann_topk`.
    ``nprobe=None`` probes everything (exact — equals brute force).
    Returns (query_id, neighbor_id, cos) like ann_topk."""
    import glob
    import os

    import ray
    import ray.data as rd

    C = np.asarray(centroids, dtype=np.float64)
    Q = _normalize(np.asarray(query_vectors, dtype=np.float64))
    nprobe = len(C) if nprobe is None else min(nprobe, len(C))
    probes = np.argsort(-(Q @ C.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    probe_dirs = sorted(
        {
            f
            for c in np.unique(probes)
            for d in glob.glob(os.path.join(index_dir, f"centroid_part={c}"))
            for f in glob.glob(os.path.join(d, "*.parquet"))
        }
    )
    if not probe_dirs:
        import pandas as pd

        return pd.DataFrame(
            {"query_id": pd.Series(dtype=np.int64),
             "neighbor_id": pd.Series(dtype=np.int64),
             "cos": pd.Series(dtype=np.float64)}
        )
    qids = np.asarray(query_ids, dtype=np.int64)
    qref = ray.put((Q, qids, probes))

    n_cent = len(C)

    def partial_topk(batch: pa.Table) -> pa.Table:
        Qm, qi, pr = ray.get(qref)
        X = _normalize(_stack(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cent = batch["centroid"].to_numpy(zero_copy_only=False).astype(np.int64)
        Cb = X @ Qm.T  # (n_batch, n_q)
        # (centroid, query) probe-membership lookup, then one gather:
        # rows outside a query's probed lists are masked to -inf
        allowed = np.zeros((n_cent, Qm.shape[0]), dtype=bool)
        allowed[pr, np.arange(Qm.shape[0])[:, None]] = True
        Cb[~allowed[cent]] = -np.inf
        if exclude_self:
            Cb[ids[:, None] == qi[None, :]] = -np.inf
        cols, nids, cosv = _batch_topk(Cb, ids, k)
        return pa.table(
            {
                "query_id": pa.array(qi[cols]),
                "neighbor_id": pa.array(nids),
                "cos": pa.array(cosv),
            }
        )

    ds = rd.read_parquet(probe_dirs)
    parts = ds.map_batches(partial_topk, batch_format="pyarrow").to_pandas()
    if not len(parts):
        return parts
    parts = parts.sort_values(
        ["query_id", "cos", "neighbor_id"], ascending=[True, False, True],
        kind="stable",
    )
    return parts.groupby("query_id", sort=True).head(k).reset_index(drop=True)


def embedding_dup_pairs(
    ds,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_exact: int = 200_000,
    allow_approx: bool = False,
):
    """All pairs with cosine >= threshold (exact, brute force): the
    full normalized matrix is broadcast; each batch matmuls against
    it and emits only (a < b) passing pairs.  O(N^2) compute but only
    passing pairs leave the tasks — the exact path is explicitly
    guarded to <= ``max_exact`` vectors.  Larger inputs raise (with a
    pointer to ``embedding_lsh_pairs``, the scale path) unless the
    caller opts into the approximate fallback with
    ``allow_approx=True`` — the exactness guarantee never changes
    silently."""
    import ray

    # one cheap metadata pass (count() on a pure read plan uses file
    # metadata; the guard is required before materializing to_pandas)
    n_total = ds.count()
    if n_total > max_exact:
        if not allow_approx:
            raise ValueError(
                f"embedding_dup_pairs is exact and guarded to {max_exact} "
                f"vectors (got {n_total}); use embedding_lsh_pairs (the "
                "approximate scale path) or pass allow_approx=True"
            )
        out = embedding_lsh_pairs(
            ds, threshold=threshold, id_col=id_col, vec_col=vec_col
        )
        return out.rename(columns={"vec_id": id_col})
    full = ds.to_pandas()
    ids_all = full[id_col].to_numpy().astype(np.int64)
    X_all = _normalize(np.stack(full[vec_col].to_numpy()).astype(np.float64))
    ref = ray.put((X_all, ids_all))

    def pairs(batch: pa.Table) -> pa.Table:
        Xa, ia = ray.get(ref)
        X = _normalize(_stack(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        C = X @ Xa.T
        r, c = np.where(C >= threshold)
        a, b = ids[r], ia[c]
        keep = a < b
        return pa.table(
            {
                "vec_a": pa.array(a[keep]),
                "vec_b": pa.array(b[keep]),
                "cos": pa.array(C[r, c][keep]),
            }
        )

    out = ds.map_batches(pairs, batch_format="pyarrow").to_pandas()
    if "vec_a" not in out.columns:  # empty result can drop the schema
        out = pd.DataFrame(
            {"vec_a": pd.Series(dtype=np.int64), "vec_b": pd.Series(dtype=np.int64),
             "cos": pd.Series(dtype=np.float64)}
        )
    return out.sort_values(["vec_a", "vec_b"], ignore_index=True)


def embedding_lsh_pairs(
    ds,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 9,
    bucket_cap: int = 512,
    metrics: dict | None = None,
    n_parts: int = 64,
):
    """Scale path: random-hyperplane LSH.  (table_id, bucket, vec_id)
    rows are the only bucketing shuffle payload (24 B per (vector,
    table)); candidate pairs verify exact cosine in a co-partitioned
    distributed pass (pairs.verify_pairs_distributed) — no vectors
    ever stack on the driver.  Recall is probabilistic (raise
    n_tables for higher recall); exact dups (cos=1) always collide.
    Oversized buckets (e.g. many zero/identical vectors) sub-split at
    ``bucket_cap``; overflow counts land in ``metrics``."""
    rng = np.random.default_rng(seed)
    first = ds.take_batch(1, batch_format="pyarrow")
    dim = len(first[vec_col][0])
    planes = rng.standard_normal((n_tables, n_planes, dim))
    import ray

    pref = ray.put(planes)

    def sig(batch: pa.Table) -> pa.Table:
        # band rows carry ONLY (table_id, bucket, vec_id): the groupby
        # shuffles 24 bytes per (vector, table) — never the vector
        P = ray.get(pref)
        X = _normalize(_stack(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        parts = []
        weights = (np.uint64(1) << np.arange(n_planes, dtype=np.uint64))
        for t in range(n_tables):
            bits = (X @ P[t].T) > 0
            h = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
            parts.append(
                pa.table(
                    {
                        "table_id": pa.array(np.full(len(ids), t, dtype=np.int64)),
                        "bucket": pa.array(h),
                        "vec_id": pa.array(ids),
                        "part": pa.array(
                            bucket_partition(
                                h, np.full(len(ids), t, dtype=np.int64),
                                n_parts=n_parts,
                            )
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # all buckets of one partition in one vectorized sweep
        ids = g["vec_id"].to_numpy().astype(np.int64)
        order, starts = sort_segments(
            ids, g["table_id"].to_numpy(), g["bucket"].to_numpy()
        )
        return segmented_capped_pairs(ids[order], starts, bucket_cap)

    cand = (
        ds.map_batches(sig, batch_format="pyarrow")
        .groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
        .to_pandas()
    )
    empty = pd.DataFrame(
        {"vec_a": pd.Series(dtype=np.int64), "vec_b": pd.Series(dtype=np.int64),
         "cos": pd.Series(dtype=np.float64)}
    )
    if not len(cand):
        return empty
    cand = pop_overflow(cand, metrics).drop_duplicates(ignore_index=True)
    if not len(cand):
        return empty

    # exact-cosine verify in a co-partitioned distributed pass: one
    # streaming pass normalizes ONLY the referenced vectors and routes
    # each to the partitions whose pairs need it — nothing but id
    # pairs reaches the driver
    def payload_of(batch: pa.Table, rows: np.ndarray) -> list:
        sub = batch.take(pa.array(rows))
        Xs = _normalize(_stack(sub[vec_col]))
        return list(Xs)

    def verify(prs: pd.DataFrame, lookup: dict) -> pd.DataFrame:
        ia = np.stack([lookup[int(a)] for a in prs["doc_a"]])
        ib = np.stack([lookup[int(b)] for b in prs["doc_b"]])
        cos = np.einsum("ij,ij->i", ia, ib)
        keep = cos >= threshold
        return pd.DataFrame(
            {"vec_a": prs["doc_a"].to_numpy()[keep].astype(np.int64),
             "vec_b": prs["doc_b"].to_numpy()[keep].astype(np.int64),
             "cos": cos[keep]}
        )

    out = verify_pairs_distributed(
        ds,
        cand,  # capped_bucket_pairs emits doc_a/doc_b column names
        id_col,
        payload_of,
        verify,
        payload_type=pa.list_(pa.float64()),
        out_schema={"vec_a": np.int64, "vec_b": np.int64, "cos": np.float64},
    )
    return out.sort_values(["vec_a", "vec_b"], ignore_index=True)
