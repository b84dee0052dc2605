"""Derive the token table from the driver testdata ``documents`` table.

Produces the BASELINE.json:input_hint schema
``(doc_id: string, tokens: list<int32>, n_tok: int32, source: string)``
deterministically: whitespace tokens of ``text``, each mapped to a
polynomial codepoint hash ``poly31(word) % VOCAB`` (stable across
processes/versions AND reproducible in DuckDB via
``list_reduce(list_transform(string_split(w,''), unicode), ...)`` —
see queries.TOKEN_ID_SQL), so BOTH token counts and token VALUES over
this stream have exact SQL oracles.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from raystat.extract import event_time_us_from_numeric, numeric_doc_id
from raystat.fixtures import epoch_len_us
from raystat.scratch import tune_allocator

VOCAB = 50257
_POLY_MOD = 1_000_003
from raystat.dataops.text import WS_RE as _WS  # ASCII token model
_TOKENIZER_VERSION = 2  # poly31 codepoint hash (v1 was crc32)


def word_token_id(w: str) -> int:
    """SQL-reproducible word hash: fold codepoints with base 31 mod
    1_000_003, then mod VOCAB (DuckDB twin: queries.TOKEN_ID_SQL)."""
    h = 0
    for c in w:
        h = (h * 31 + ord(c)) % _POLY_MOD
    return h % VOCAB

__all__ = ["tokenize_batch", "tokenize_documents", "documents_stream_fixture"]


def _string_layout(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """(offsets[int64, n+1], data[uint8]) views of a StringArray,
    honoring a possible array-level slice offset.  Zero-copy."""
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return off, data


def hash_words(words: pa.Array | pa.ChunkedArray) -> np.ndarray:
    """Vectorized ``word_token_id`` over a string array: a positionwise
    Horner fold ``h = (h*31 + byte) % 1_000_003`` over the raw UTF-8
    value buffer (each pass touches only the words still longer than
    the position, so total work is O(total bytes)), then ``% VOCAB``.
    Bytes equal codepoints only for ASCII, so the rare words carrying
    a multibyte character are re-hashed exactly via the scalar fold."""
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    n = len(words)
    if n == 0:
        return np.zeros(0, dtype=np.int32)
    off, data = _string_layout(words)
    starts, lens = off[:-1], off[1:] - off[:-1]
    h = np.zeros(n, dtype=np.int64)
    alive = np.arange(n, dtype=np.int64)
    for j in range(int(lens.max())):
        alive = alive[lens[alive] > j]
        ha = h[alive]
        np.multiply(ha, 31, out=ha)
        ha += data[starts[alive] + j]
        np.remainder(ha, _POLY_MOD, out=ha)
        h[alive] = ha
    codes = (h % VOCAB).astype(np.int32)
    seg = data[off[0] : off[-1]]
    if seg.size and int(seg.max()) >= 0x80:
        # per-word max byte; all words here are non-empty (reduceat-safe)
        mx = np.maximum.reduceat(data, starts) if n > 1 else np.array([seg.max()])
        for i in np.flatnonzero(mx >= 0x80):
            codes[i] = word_token_id(words[int(i)].as_py())
    return codes


def tokenize_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> token-table rows, fully vectorized: Arrow
    ascii_split_whitespace (byte-identical to the WS_RE ``\\S+`` findall
    after dropping the boundary empties it keeps), dictionary-encode so
    each UNIQUE word is hashed once, positionwise-Horner ``hash_words``
    scatter.  No per-row or per-word Python in the hot path."""
    tune_allocator()
    txt = batch["text"].combine_chunks() if isinstance(
        batch["text"], pa.ChunkedArray
    ) else batch["text"]
    wl = pc.ascii_split_whitespace(pc.fill_null(txt, ""))
    if isinstance(wl, pa.ChunkedArray):
        wl = wl.combine_chunks()
    loff = wl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lo = int(loff[0])
    vals = wl.values.slice(lo, int(loff[-1]) - lo)
    # the split keeps ''-tokens at whitespace boundaries; drop them and
    # recount per row via a cumsum over the keep mask
    keep = np.asarray(pc.binary_length(vals)) > 0
    cum = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(keep, out=cum[1:])
    rel = loff - lo
    n_tok = (cum[rel[1:]] - cum[rel[:-1]]).astype(np.int32)
    flat_words = vals.filter(pa.array(keep))
    if len(flat_words):
        d = pc.dictionary_encode(flat_words)
        flat = hash_words(d.dictionary)[
            d.indices.to_numpy(zero_copy_only=False)
        ]
    else:
        flat = np.zeros(0, dtype=np.int32)
    offsets = np.zeros(batch.num_rows + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    doc_id = pc.binary_join_element_wise(
        pa.scalar("doc-"),
        pc.utf8_lpad(pc.cast(batch["doc_id"], pa.string()), 12, "0"),
        pa.scalar(""),
    )
    return pa.table(
        {
            "doc_id": doc_id.combine_chunks()
            if isinstance(doc_id, pa.ChunkedArray)
            else doc_id,
            "tokens": pa.ListArray.from_arrays(pa.array(offsets), pa.array(flat)),
            "n_tok": pa.array(n_tok, pa.int32()),
            "source": batch["source"],
        }
    )


def tokenize_documents(sf_dir: str):
    """Lazy Dataset of token rows derived from ``documents.parquet``."""
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "source"],
    )
    return ds.map_batches(tokenize_batch, batch_format="pyarrow")


def documents_stream_fixture(
    sf_dir: str,
    n_epochs: int = 4,
    root: str = "/tmp/raystat_fixtures",
    lag_source: str | None = None,
) -> str:
    """Materialize the derived token table as an arrival-partitioned
    stream (arrival == event epoch; lateness paths are exercised by the
    synthetic fixture instead).  With ``lag_source`` set, that source's
    rows ALL arrive in the last epoch (still in their own event-time
    order) — the skewed-arrival shape that distinguishes per-source
    from global watermarking.  Cached per sf_dir; returns the dir."""
    import pyarrow.parquet as pq

    tag = sf_dir.strip("/").replace("/", "_")
    lag_tag = f"_lag_{lag_source}" if lag_source else ""
    out = os.path.join(root, f"docs_{tag}_e{n_epochs}{lag_tag}")
    done = os.path.join(out, "_fixture.json")
    params = {
        "sf_dir": sf_dir,
        "n_epochs": n_epochs,
        "tok_v": _TOKENIZER_VERSION,
        "lag_source": lag_source,
    }
    import json

    if os.path.exists(done):
        try:
            with open(done) as f:
                if json.load(f) == params:
                    return out
        except Exception:
            pass  # stale/corrupt manifest: rebuild
    import shutil

    tmp = out + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(tmp)
    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    )
    tok = tokenize_batch(t)
    ev_us = event_time_us_from_numeric(numeric_doc_id(tok["doc_id"]))
    from raystat.extract import T0_US

    epoch = (ev_us - T0_US) // epoch_len_us(n_epochs)
    arrival = np.minimum(epoch, n_epochs - 1)
    if lag_source is not None:
        lag = np.asarray(tok["source"].to_pylist()) == lag_source
        arrival = np.where(lag, n_epochs - 1, arrival)
    for e in np.unique(arrival):
        d = os.path.join(tmp, f"arrival={int(e)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tok.filter(pa.array(arrival == e)), os.path.join(d, "part-00000.parquet"))
    with open(os.path.join(tmp, "_fixture.json"), "w") as f:
        json.dump(params, f)
    os.replace(tmp, out)
    return out
