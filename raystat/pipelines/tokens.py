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

from raystat.extract import event_time_us_from_numeric, numeric_doc_id
from raystat.fixtures import epoch_len_us

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


def tokenize_batch(batch: pa.Table) -> pa.Table:
    """documents rows -> token-table rows (vectorized where possible;
    per-unique-word crc cache keeps the word loop tiny)."""
    from raystat.scratch import tune_allocator

    tune_allocator()
    texts = batch["text"].to_pylist()
    words_per_doc = [_WS.findall(t or "") for t in texts]
    n_tok = np.array([len(w) for w in words_per_doc], dtype=np.int32)
    # hash each UNIQUE word once; scatter back with the factorization
    all_words = np.array(
        [w for ws in words_per_doc for w in ws], dtype=object
    )
    if all_words.size:
        uniq, inv = np.unique(all_words, return_inverse=True)
        codes = np.fromiter(
            (word_token_id(w) for w in uniq), dtype=np.int32, count=len(uniq)
        )
        flat = codes[inv]
    else:
        flat = np.zeros(0, dtype=np.int32)
    offsets = np.zeros(len(texts) + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_id = np.char.add("doc-", np.char.zfill(ids.astype(str), 12))
    return pa.table(
        {
            "doc_id": pa.array(doc_id, pa.string()),
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


def documents_stream_fixture(sf_dir: str, n_epochs: int = 4, root: str = "/tmp/raystat_fixtures") -> str:
    """Materialize the derived token table as an arrival-partitioned
    stream (arrival == event epoch; lateness paths are exercised by the
    synthetic fixture instead).  Cached per sf_dir; returns the dir."""
    import pyarrow.parquet as pq

    tag = sf_dir.strip("/").replace("/", "_")
    out = os.path.join(root, f"docs_{tag}_e{n_epochs}")
    done = os.path.join(out, "_fixture.json")
    params = {"sf_dir": sf_dir, "n_epochs": n_epochs, "tok_v": _TOKENIZER_VERSION}
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
    for e in np.unique(epoch):
        d = os.path.join(tmp, f"arrival={int(e)}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(tok.filter(pa.array(epoch == e)), os.path.join(d, "part-00000.parquet"))
    with open(os.path.join(tmp, "_fixture.json"), "w") as f:
        json.dump(params, f)
    os.replace(tmp, out)
    return out
