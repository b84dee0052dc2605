"""Deterministic synthetic token-table fixtures (FIXTURES.md §B).

Input schema per BASELINE.json:input_hint:
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``.

Everything is seeded and reproducible; no external data.  The stream
fixture is written **pre-partitioned by arrival epoch**
(``arrival={e}/part-{i}.parquet``) so the streaming driver reads each
epoch's files directly — at production scale the arrival log is the
stream source, so per-epoch file groups are the natural unit.

Event time is NOT a column (the input schema is fixed); it is derived
deterministically from ``doc_id`` (see :mod:`raystat.extract`), so any
reader — including the passthrough path that must preserve token
arrays byte-for-byte — recomputes identical event times.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from raystat.extract import (
    HORIZON_US,
    T0_US,
    event_time_us_from_numeric,
    numeric_doc_id,
)


def epoch_len_us(n_epochs: int) -> int:
    """Epoch length so the event-time horizon splits into n_epochs."""
    return HORIZON_US // n_epochs

VOCAB = 50257
SOURCES = [
    "web", "code", "books", "wiki", "news", "forum", "social", "papers",
    "legal", "mail", "chat", "docs", "recipes", "reviews", "subtitles", "misc",
]
# Zipf-ish weights: one hot source dominates -> exercises salted-key skew.
_SOURCE_W = 1.0 / np.arange(1, len(SOURCES) + 1) ** 1.2
_SOURCE_P = _SOURCE_W / _SOURCE_W.sum()

__all__ = [
    "SOURCES",
    "VOCAB",
    "synth_token_block",
    "write_stream_fixture",
    "jsonl_stream_from_parquet",
    "metadata_rows",
]


def synth_token_block(
    block_id: int, n_rows: int, seed: int = 42, base: int | None = None
) -> pa.Table:
    """One deterministic block of the token table.  ``base`` is the
    first global row id (defaults to ``block_id * n_rows``; the fixture
    writer passes ``block_id * rows_per_block`` so a short final block
    cannot collide with earlier ids)."""
    rng = np.random.default_rng(seed + block_id)
    if base is None:
        base = block_id * n_rows
    ids = np.arange(base, base + n_rows, dtype=np.int64)
    doc_id = np.char.add("doc-", np.char.zfill(ids.astype(str), 12))
    source = np.array(SOURCES)[rng.choice(len(SOURCES), size=n_rows, p=_SOURCE_P)]
    n_tok = np.clip(
        np.exp(rng.normal(4.0, 1.0, size=n_rows)).astype(np.int32), 1, 2048
    )
    total = int(n_tok.sum())  # per-block, always < 2**31
    flat = rng.integers(0, VOCAB, size=total, dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat))
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.string()),
            "tokens": tokens,
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": pa.array(source, pa.string()),
        }
    )


def arrival_epoch_for(doc_numeric: np.ndarray, event_epoch: np.ndarray) -> np.ndarray:
    """Deterministic arrival assignment: ~2% arrive one epoch late
    (within allowed lateness), a disjoint ~0.5% arrive three epochs
    late (beyond lateness -> must be dropped and counted)."""
    h = (doc_numeric * np.int64(2654435761)) % np.int64(1000)
    late1 = h < 20
    late3 = (h >= 20) & (h < 25)
    return event_epoch + late1.astype(np.int64) + 3 * late3.astype(np.int64)


def _write_fixture_block(
    tmp_root: str, b: int, nr: int, base: int, seed: int, n_epochs: int
) -> None:
    t = synth_token_block(b, nr, seed=seed, base=base)
    ids = numeric_doc_id(t["doc_id"])
    ev_us = event_time_us_from_numeric(ids)
    event_epoch = (ev_us - T0_US) // epoch_len_us(n_epochs)  # 0..n_epochs-1
    arr = arrival_epoch_for(ids, event_epoch)
    for e in np.unique(arr):
        sub = t.filter(pa.array(arr == e))
        d = os.path.join(tmp_root, f"arrival={int(e)}")
        os.makedirs(d, exist_ok=True)
        # dict+snappy (pyarrow defaults) kept deliberately: plain-encoded
        # uncompressed tokens decode ~19% faster SINGLE-threaded, but a
        # controlled 8/32-process A/B (BASELINE.md round-3 appendix)
        # shows identical per-file decode rates under parallelism — the
        # shared fault path, not decode compute, is what saturates — so
        # plain would only double the storage/page-cache footprint.
        pq.write_table(sub, os.path.join(d, f"part-{b:05d}.parquet"))


def write_stream_fixture(
    out_dir: str,
    *,
    n_rows: int = 20_000,
    rows_per_block: int = 5_000,
    n_epochs: int = 6,
    seed: int = 42,
    use_ray: bool = False,
) -> dict:
    """Write the arrival-partitioned stream fixture once; idempotent
    (keyed by a manifest recording the parameters).  ``use_ray=True``
    generates blocks as parallel Ray tasks (bench-scale fixtures)."""
    manifest_path = os.path.join(out_dir, "_fixture.json")
    params = {
        "n_rows": n_rows,
        "rows_per_block": rows_per_block,
        "n_epochs": n_epochs,
        "seed": seed,
        "version": 4,
    }
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            if json.load(f) == params:
                return params
    n_blocks = (n_rows + rows_per_block - 1) // rows_per_block
    tmp_root = out_dir + ".tmp"
    import shutil

    shutil.rmtree(tmp_root, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(tmp_root)
    jobs = [
        (b, min(rows_per_block, n_rows - b * rows_per_block), b * rows_per_block)
        for b in range(n_blocks)
    ]
    if use_ray:
        import ray

        task = ray.remote(_write_fixture_block)
        ray.get(
            [
                task.remote(tmp_root, b, nr, base, seed, n_epochs)
                for b, nr, base in jobs
            ]
        )
    else:
        for b, nr, base in jobs:
            _write_fixture_block(tmp_root, b, nr, base, seed, n_epochs)
    with open(os.path.join(tmp_root, "_fixture.json"), "w") as f:
        json.dump(params, f)
    os.replace(tmp_root, out_dir)
    return params


def jsonl_stream_from_parquet(parquet_root: str, out_root: str) -> str:
    """Re-encode an arrival-partitioned parquet stream fixture as
    newline-delimited JSON (one ``part-*.jsonl`` per parquet part) —
    the reference's ``value_format='json'`` Kafka topics
    (README.md:143, AllUdafIT.java:564) materialized per arrival dir.
    Idempotent via the source manifest: if the parquet fixture's
    ``_fixture.json`` differs from the copy recorded here (or either
    is missing), the whole jsonl tree is rebuilt — a regenerated
    parquet fixture can never be shadowed by stale same-named jsonl
    parts or leftover arrival dirs from a larger previous fixture."""
    import glob as _glob
    import shutil as _shutil

    src_manifest = os.path.join(parquet_root, "_fixture.json")
    dst_manifest = os.path.join(out_root, "_fixture.json")
    src = open(src_manifest).read() if os.path.exists(src_manifest) else None
    dst = open(dst_manifest).read() if os.path.exists(dst_manifest) else ""
    if src is None or src != dst:
        _shutil.rmtree(out_root, ignore_errors=True)
    for pdir in sorted(_glob.glob(os.path.join(parquet_root, "arrival=*"))):
        d = os.path.join(out_root, os.path.basename(pdir))
        os.makedirs(d, exist_ok=True)
        for pf in sorted(_glob.glob(os.path.join(pdir, "*.parquet"))):
            jf = os.path.join(
                d, os.path.basename(pf).replace(".parquet", ".jsonl")
            )
            if os.path.exists(jf):
                continue
            pq.read_table(pf).to_pandas().to_json(
                jf + ".tmp", orient="records", lines=True
            )
            os.replace(jf + ".tmp", jf)
    if src is not None:
        with open(dst_manifest, "w") as f:
            f.write(src)
    return out_root


def metadata_rows(n_epochs: int, seed: int = 42) -> pa.Table:
    """Late-arriving source-metadata stream: one row per source,
    ``quality`` deterministic, ``arrival_epoch`` spread so some sources'
    metadata arrives AFTER their first windows close."""
    rng = np.random.default_rng(seed + 777)
    quality = np.round(rng.uniform(0.0, 1.0, size=len(SOURCES)), 6)
    arrival = np.arange(len(SOURCES), dtype=np.int64) % max(1, n_epochs)
    return pa.table(
        {
            "source": pa.array(SOURCES, pa.string()),
            "quality": pa.array(quality, pa.float64()),
            "arrival_epoch": pa.array(arrival, pa.int64()),
        }
    )
