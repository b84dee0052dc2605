"""Sequence chunking and cross-document sequence packing over the
input_hint token table (doc_id, tokens, n_tok, source) — the two
canonical LLM-pretraining layout ops.

``chunk_doc_stats``: split each document's token list into fixed-length
blocks (the last block short).  Purely per-row — one zero-copy
``map_batches`` pass, no shuffle, embarrassingly parallel at any scale.

``pack_block_stats``: concatenate each source's token stream in doc_id
order and slice it into fixed-length blocks that CROSS document
boundaries (true packing).  Repacking is inherently one all-to-all of
the token payload (the output is a permutation of every token), so the
design spends exactly one shuffle on it and keeps everything else
metadata-sized:

1. count pass — per-doc (source, bucket, n_tok) only, no token values
   (callers pass ``counts_ds`` projected off the raw text so tokens are
   never materialized twice);
2. per-(source, bucket) token totals via per-batch partials + a tiny
   ``groupby().aggregate(Sum)`` — the exchange is bounded by
   #buckets x #batches;
3. driver-side exclusive scan of the per-bucket totals in (source,
   bucket) order -> base token offset of every bucket (O(#docs /
   bucket_docs) rows; a 10^12-doc corpus at bucket_docs=10^6 scans 10^6
   rows — for more, add a third scan level);
4. one bucketed shuffle of the token rows (each (source, bucket) maps
   wholly into one hash partition) + ``map_groups``: sort docs by id
   within bucket, exclusive-cumsum their lengths onto the bucket base,
   emit per-(source, block) partial sums — blocks spanning bucket
   boundaries merge in the final metadata-sized ``groupby``.

Block contents are summarized ORDER-SENSITIVELY (``tok_wsum`` weights
each token by its 1-based position in the block), so equality against
the SQL oracle proves exact token placement, not just membership.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from raystat.dataops.pairs import splitmix64

__all__ = ["chunk_doc_stats", "pack_block_stats"]

BLOCK_LEN = 64


def _list_layout(batch: pa.Table, col: str) -> tuple[np.ndarray, np.ndarray]:
    """(offsets, values) of a list column, rebased to the chunk slice."""
    arr = batch[col]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.chunk(0) if arr.num_chunks else pa.array([], type=arr.type)
    off = arr.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = arr.values.to_numpy(zero_copy_only=False).astype(np.int64)
    lo = int(off[0])
    return off - lo, vals[lo : int(off[-1])]


def _block_sums(
    vals: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Order-sensitive per-block sums via cumsum boundary differences.

    ``vals``: flat token values; ``starts``/``ends``: flat index range
    of each block.  Position weights are relative to the block start,
    1-based: wsum = sum(val * (flat_pos - start + 1)), computed as one
    weighted cumsum minus start*sum.  Integer cumsums — exact."""
    cs = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(vals, out=cs[1:])
    tok_sum = cs[ends] - cs[starts]
    n = ends - starts
    pos = np.arange(len(vals), dtype=np.int64)
    csw = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(vals * (pos + 1), out=csw[1:])
    tok_wsum = (csw[ends] - csw[starts]) - starts * tok_sum
    return n, tok_sum, tok_wsum


def chunk_doc_stats(tok_ds, block_len: int = BLOCK_LEN):
    """Per-document fixed-length chunk summaries.

    Output: (doc_id, chunk, n_in_chunk, tok_sum, tok_wsum) — one row per
    length-``block_len`` slice of each doc's token list (last slice
    short; empty docs emit nothing).  ``tok_wsum`` = sum(token *
    (position-in-chunk + 1))."""
    L = int(block_len)

    def fn(batch: pa.Table) -> pa.Table:
        off, vals = _list_layout(batch, "tokens")
        n_tok = off[1:] - off[:-1]
        n_chunks = -(-n_tok // L)  # ceil; 0 for empty docs
        total = int(n_chunks.sum())
        if total == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "chunk": pa.array([], pa.int64()),
                    "n_in_chunk": pa.array([], pa.int64()),
                    "tok_sum": pa.array([], pa.int64()),
                    "tok_wsum": pa.array([], pa.int64()),
                }
            )
        doc_of = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_chunks)
        chunk = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(n_chunks) - n_chunks, n_chunks
        )
        starts = off[:-1][doc_of] + chunk * L
        ends = np.minimum(starts + L, off[1:][doc_of])
        n, tok_sum, tok_wsum = _block_sums(vals, starts, ends)
        doc_ids = batch["doc_id"].take(pa.array(doc_of))
        return pa.table(
            {
                "doc_id": doc_ids,
                "chunk": pa.array(chunk),
                "n_in_chunk": pa.array(n.astype(np.int64)),
                "tok_sum": pa.array(tok_sum),
                "tok_wsum": pa.array(tok_wsum),
            }
        )

    return tok_ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _source_hash(src: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable 64-bit hash per source string (dictionary-encoded so each
    distinct source hashes once per batch)."""
    import pyarrow.compute as pc

    col = src.combine_chunks() if isinstance(src, pa.ChunkedArray) else src
    d = pc.dictionary_encode(col)
    vocab = [s.as_py() for s in d.dictionary]
    hs = np.array(
        [int.from_bytes(hashlib.md5(v.encode()).digest()[:8], "big") for v in vocab],
        dtype=np.uint64,
    )
    idx = d.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return hs[idx]


def pack_block_stats(
    tok_ds,
    counts_ds=None,
    block_len: int = BLOCK_LEN,
    bucket_docs: int = 256,
    n_parts: int = 32,
):
    """Cross-document sequence packing per source (doc_id order).

    Output: (source, block, n_in_block, tok_sum, tok_wsum) — one row per
    length-``block_len`` block of the concatenated per-source token
    stream; ``tok_wsum`` = sum(token * (position-in-block + 1)).

    ``counts_ds``: optional (doc_id, n_tok, source) dataset for the
    count pass (pass one projected off the raw text to avoid
    materializing token values twice); defaults to projecting
    ``tok_ds``.  ``bucket_docs`` sets the docs-per-bucket granularity of
    the two-level scan: the driver scans #docs/bucket_docs rows and each
    ``map_groups`` partition holds ~(bucket_docs x docs/bucket) token
    rows — size both to the corpus (see module docstring).  ``n_parts``
    sizes the bucketed shuffle (each partition materializes
    ~corpus/n_parts token rows in one task)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from raystat.extract import numeric_doc_id

    L = int(block_len)
    B = int(bucket_docs)
    NP = int(n_parts)

    # -- pass 1: per-(source, bucket) token totals (metadata only) -------
    if counts_ds is None:
        counts_ds = tok_ds.select_columns(["doc_id", "n_tok", "source"])

    def count_partial(batch: pa.Table) -> pa.Table:
        dkey = numeric_doc_id(batch["doc_id"])
        bucket = dkey // B
        df = pd.DataFrame(
            {
                "source": batch["source"].to_pandas(),
                "bucket": bucket,
                "n": batch["n_tok"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby(["source", "bucket"], sort=False, as_index=False)["n"].sum()
        return pa.Table.from_pandas(g, preserve_index=False)

    totals = (
        counts_ds.map_batches(count_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["source", "bucket"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    # -- pass 2 (driver, metadata-sized): exclusive scan per source ------
    totals = totals.sort_values(["source", "bucket"], ignore_index=True)
    csum = totals.groupby("source", sort=False)["n"].cumsum() - totals["n"]
    base = {
        (s, int(b)): int(c)
        for s, b, c in zip(totals["source"], totals["bucket"], csum)
    }
    # broadcast the base-offset map once via the object store (read
    # zero-copy-ish per task) instead of re-shipping it inside every
    # pack_part task closure — it is O(#docs / bucket_docs) entries
    import ray

    base_ref = ray.put(base)

    # -- pass 3: the one token shuffle, bucketed ------------------------
    def add_part(batch: pa.Table) -> pa.Table:
        dkey = numeric_doc_id(batch["doc_id"])
        bucket = dkey // B
        part = (
            splitmix64(_source_hash(batch["source"]) ^ bucket.astype(np.uint64))
            % np.uint64(NP)
        ).astype(np.int64)
        return batch.append_column("_dkey", pa.array(dkey)).append_column(
            "_bucket", pa.array(bucket)
        ).append_column("part", pa.array(part))

    def pack_part(g: pd.DataFrame) -> pd.DataFrame:
        base = ray.get(base_ref)
        src = g["source"].to_numpy()
        bucket = g["_bucket"].to_numpy().astype(np.int64)
        dkey = g["_dkey"].to_numpy().astype(np.int64)
        order = np.lexsort((dkey, bucket, src))
        src, bucket, dkey = src[order], bucket[order], dkey[order]
        toks = g["tokens"].to_numpy()[order]
        n_tok = np.fromiter((len(t) for t in toks), dtype=np.int64, count=len(toks))
        # doc start offsets: bucket base + exclusive cumsum within the
        # (source, bucket) segment
        seg_new = np.ones(len(src), dtype=bool)
        seg_new[1:] = (src[1:] != src[:-1]) | (bucket[1:] != bucket[:-1])
        cs = np.cumsum(n_tok) - n_tok
        seg_base0 = cs[seg_new]  # cumsum value at each segment start
        seg_id = np.cumsum(seg_new) - 1
        within = cs - seg_base0[seg_id]
        bases = np.array(
            [base.get((s, int(b)), 0) for s, b in zip(src[seg_new], bucket[seg_new])],
            dtype=np.int64,
        )
        doc_off = bases[seg_id] + within  # global start position per doc
        total = int(n_tok.sum())
        if total == 0:
            return pd.DataFrame(
                {
                    "source": pd.Series(dtype=object),
                    "block": pd.Series(dtype=np.int64),
                    "n_in_block": pd.Series(dtype=np.int64),
                    "tok_sum": pd.Series(dtype=np.int64),
                    "tok_wsum": pd.Series(dtype=np.int64),
                }
            )
        vals = np.concatenate([np.asarray(t, dtype=np.int64) for t in toks])
        doc_of = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
        flat_start = np.repeat(cs, n_tok)
        p = doc_off[doc_of] + (np.arange(total, dtype=np.int64) - flat_start)
        blk = p // L
        wpos = p - blk * L + 1
        # factorize (source, block) into a dense composite key so every
        # per-block sum is one bincount (no sort)
        s_idx, vocab = pd.factorize(pd.Series(src[doc_of]), sort=False)
        s_idx = s_idx.astype(np.int64)
        blk_min = int(blk.min())
        blk_rel = blk - blk_min
        width = int(blk_rel.max()) + 1
        comp = s_idx * width + blk_rel
        uniq, inv = np.unique(comp, return_inverse=True)
        n_in = np.bincount(inv)
        tok_sum = np.bincount(inv, weights=vals).astype(np.int64)
        tok_wsum = np.bincount(inv, weights=vals * wpos).astype(np.int64)
        u_s, u_b = np.divmod(uniq, width)
        return pd.DataFrame(
            {
                "source": vocab.to_numpy()[u_s],
                "block": (u_b + blk_min).astype(np.int64),
                "n_in_block": n_in.astype(np.int64),
                "tok_sum": tok_sum,
                "tok_wsum": tok_wsum,
            }
        )

    return (
        tok_ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part")
        .map_groups(pack_part, batch_format="pandas")
        .groupby(["source", "block"])
        .aggregate(
            Sum("n_in_block", alias_name="n_in_block"),
            Sum("tok_sum", alias_name="tok_sum"),
            Sum("tok_wsum", alias_name="tok_wsum"),
        )
    )
