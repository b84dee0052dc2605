"""Range-partitioned, resumable Parquet output — the engine's answer
to the 100-TB operational requirement: output lands as one directory
per KEY RANGE (hive ``bucket=K/``), each sealed by its own manifest,
so a failed job skips finished partitions on re-run and downstream
readers prune at the directory level (the write-side complement of
the IVF index's read-side pruning, similarity.ivf_index).

Boundary selection is decoupled from the write:
- ``kll_boundaries`` — the SCALE path: mergeable KLL sketch partials
  (one small blob per batch reaches the driver), approximate
  quantiles, no shuffle of the data itself.
- any exact quantile vector (e.g. quantiles.grouped_exact_quantiles'
  rank rule) — the oracle path at test scale.

The write itself is ONE streaming pass: per-batch searchsorted bucket
assignment + Ray Data's hive-partitioned ``write_parquet``; sealing
moves each bucket directory into place and records rows/files in the
bucket manifest.  Deterministic input + boundaries => re-running a
crashed job regenerates byte-identical buckets, and only UNSEALED
buckets are (re)installed — sealed ones are never touched.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raystat.dataops.kll import KLL

__all__ = ["kll_boundaries", "range_partition_write", "bucket_counts"]


def kll_boundaries(ds, col: str, n_buckets: int, k: int = 4096) -> np.ndarray:
    """n_buckets-1 approximate quantile boundaries of ``col`` from a
    mergeable KLL sketch: each batch contributes one serialized sketch
    (O(k) floats), merged on the driver in canonical order — the
    row-count-independent boundary pass for a 100-TB repartition."""

    def partial(batch: pa.Table) -> pa.Table:
        s = KLL(k=k)
        s.add(
            batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        return pa.table({"blob": pa.array([s.to_bytes()], pa.binary())})

    blobs = ds.map_batches(partial, batch_format="pyarrow").to_pandas()["blob"]
    sk = KLL(k=k)
    for b in sorted(blobs, key=bytes):  # canonical merge order: deterministic
        sk.merge(KLL.from_bytes(bytes(b)))
    qs = np.arange(1, n_buckets) / n_buckets
    return np.array([sk.quantile(q) for q in qs], dtype=np.float64)


def _bucket_dir(out_dir: str, b: int) -> str:
    return os.path.join(out_dir, f"bucket={b}")


def _bucket_manifest(out_dir: str, b: int) -> str:
    return os.path.join(out_dir, "_manifests", f"bucket-{b:05d}.json")


def range_partition_write(
    ds,
    col: str,
    boundaries: np.ndarray,
    out_dir: str,
) -> dict:
    """Write ``ds`` as ``bucket=K/`` hive directories with per-bucket
    seal manifests; bucket(v) = #{i : v >= boundaries[i]} (searchsorted
    right).  Re-running after a crash skips every SEALED bucket and
    (re)installs only unsealed ones.  Returns {bucket: rows}."""
    import ray

    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    n_buckets = len(boundaries) + 1
    sealed = {
        b: json.load(open(_bucket_manifest(out_dir, b)))
        for b in range(n_buckets)
        if os.path.exists(_bucket_manifest(out_dir, b))
    }
    if len(sealed) == n_buckets:  # fully sealed: resume is a no-op
        return {b: m["rows"] for b, m in sealed.items() if m["rows"]}

    bref = ray.put(np.asarray(boundaries, dtype=np.float64))

    def assign(batch: pa.Table) -> pa.Table:
        bounds = ray.get(bref)
        v = batch[col].to_numpy(zero_copy_only=False).astype(np.float64)
        bk = np.searchsorted(bounds, v, side="right").astype(np.int64)
        # bucket kept as a data column too (partition_cols strips the
        # hive column from the files; readers get it either way)
        return batch.append_column("bucket", pa.array(bk)).append_column(
            "bucket_part", pa.array(bk)
        )

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp)
    ds.map_batches(assign, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["bucket_part"]
    )

    out: dict[int, int] = {}
    for b in range(n_buckets):
        src = os.path.join(tmp, f"bucket_part={b}")
        if b in sealed:  # never touch a sealed bucket
            out[b] = sealed[b]["rows"]
            continue
        dst = _bucket_dir(out_dir, b)
        shutil.rmtree(dst, ignore_errors=True)  # unsealed partial: redo
        rows = files = 0
        if os.path.isdir(src):
            os.replace(src, dst)
            for f in os.listdir(dst):
                if f.endswith(".parquet"):
                    rows += pq.read_metadata(os.path.join(dst, f)).num_rows
                    files += 1
        # seal EMPTY buckets too (rows=0 manifest): otherwise a
        # completed job with any empty bucket never reaches the
        # fully-sealed fast path and every re-run rewrites the whole
        # dataset to tmp.  Zero-row entries are filtered from the
        # returned counts (and from bucket_counts) — sealing is a
        # resume contract, not a data claim.
        mpath = _bucket_manifest(out_dir, b)
        with open(mpath + ".tmp", "w") as fh:
            json.dump({"rows": rows, "files": files,
                       "boundaries": list(map(float, boundaries))}, fh)
        os.replace(mpath + ".tmp", mpath)
        if rows:
            out[b] = rows
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def bucket_counts(out_dir: str) -> list[tuple[int, int]]:
    """(bucket, rows) per SEALED non-empty bucket, from the manifests
    (what a resuming job or a monitoring query trusts — not directory
    listings).  rows=0 seals exist purely for resume bookkeeping and
    are skipped here."""
    mdir = os.path.join(out_dir, "_manifests")
    out = []
    for f in sorted(os.listdir(mdir)) if os.path.isdir(mdir) else []:
        if f.startswith("bucket-") and f.endswith(".json"):
            b = int(f[len("bucket-") : -len(".json")])
            rows = json.load(open(os.path.join(mdir, f)))["rows"]
            if rows:
                out.append((b, rows))
    return out
