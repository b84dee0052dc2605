"""Text-analysis stages over the ``documents`` table (vectorized
map_batches fns; compiled patterns and lookup tables built at module
import — equivalently once per worker process)."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

__all__ = [
    "WS_CLASS",
    "WS_RE",
    "token_count_batch",
    "bpe_token_count_batch",
    "BPE_PATTERN",
    "quality_score_batch",
    "redact_pii_batch",
    "normalize_text_batch",
    "EMAIL_PATTERN",
    "PHONE_PATTERN",
    "lang_id_batch",
    "fingerprint_batch",
    "window_hashes_4",
    "window_hashes_4_flat",
    "distinct_window_hashes_4",
    "STOPWORDS",
]

# THE token model: explicit ASCII-whitespace class shared VERBATIM
# with every DuckDB twin (queries.SPLIT_WS).  Neither \s variant is
# portable: Python's unicode \s matches \xa0 etc., Python's ASCII \s
# includes \x0b, and RE2's \s excludes \x0b — the explicit class is
# the only spelling both engines interpret identically.  Unicode
# whitespace is a token character on BOTH sides.
WS_CLASS = r" \t\n\x0b\f\r"
WS_RE = re.compile(rf"[^{WS_CLASS}]+")
_WS = WS_RE
_PUNCT = re.compile(r"[.!?,;]")
_ALPHA = re.compile(r"[A-Za-z]")
_CJK = re.compile(r"[一-鿿぀-ヿ가-힯]")
_CYR = re.compile(r"[Ѐ-ӿ]")
STOPWORDS = ("the", "and", "of", "a", "to")
# a whitespace-token equals a stopword iff bounded by the token-model
# whitespace class on both sides — no per-token Python loop
_STOP = re.compile(
    rf"(?<![^{WS_CLASS}])(?:%s)(?![^{WS_CLASS}])" % "|".join(STOPWORDS)
)


def token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tok): whitespace-token count; SQL twin in
    queries.N_TOK_SQL."""
    s = pd.Series(batch["text"].to_pylist(), dtype="object").fillna("")
    n = s.str.count(WS_RE).astype(np.int64)
    return pa.table({"doc_id": batch["doc_id"], "n_tok": pa.array(n)})


# PII scrubbing: RE2-compatible patterns shared VERBATIM with the
# DuckDB twin (regexp_replace(..., 'g') / regexp_extract_all) — both
# engines run RE2, so replacement and match counts agree byte-exactly.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\b\d{3}-\d{4}\b"


def redact_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Replace emails/phone-shaped substrings with <EMAIL>/<PHONE>
    placeholders and count redactions — all in Arrow RE2 kernels, zero
    Python per row."""
    import pyarrow.compute as pc

    t = pc.coalesce(batch[text_col], pa.scalar("", pa.string()))
    n_emails = pc.cast(pc.count_substring_regex(t, pattern=EMAIL_PATTERN), pa.int64())
    red = pc.replace_substring_regex(t, pattern=EMAIL_PATTERN, replacement="<EMAIL>")
    n_phones = pc.cast(pc.count_substring_regex(red, pattern=PHONE_PATTERN), pa.int64())
    red = pc.replace_substring_regex(red, pattern=PHONE_PATTERN, replacement="<PHONE>")
    out = {c: batch[c] for c in batch.column_names if c != text_col}
    out[text_col] = red
    out["n_emails"] = n_emails
    out["n_phones"] = n_phones
    return pa.table(out)


def normalize_text_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Canonical cleaning pass: lowercase (ASCII), strip punctuation
    runs to one space, collapse whitespace runs, trim — all Arrow RE2
    kernels (SQL twin: lower + the same regexp_replace chain)."""
    import pyarrow.compute as pc

    t = pc.coalesce(batch[text_col], pa.scalar("", pa.string()))
    t = pc.ascii_lower(t)
    t = pc.replace_substring_regex(t, pattern=r"[.!?,;:]+", replacement=" ")
    t = pc.replace_substring_regex(
        t, pattern=f"[{WS_CLASS}]+", replacement=" "
    )
    t = pc.replace_substring_regex(t, pattern=r"^ +| +$", replacement="")
    out = {c: batch[c] for c in batch.column_names if c != text_col}
    out[text_col] = t
    return pa.table(out)


# BPE-ish sub-word tokenization (GPT-2-flavoured: contractions, letter
# runs, digit runs, punctuation runs, whitespace runs) — written
# without lookahead, \s, or unicode classes so Python re and DuckDB's
# RE2 match IDENTICALLY (the SQL twin is regexp_extract_all of this
# exact string); zero-width matches are impossible so count ==
# len(findall)
BPE_PATTERN = (
    rf"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+"
    rf"| ?[^{WS_CLASS}A-Za-z0-9]+|[{WS_CLASS}]+"
)
_BPE = re.compile(BPE_PATTERN)


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe): BPE-ish regex token count — the sub-word-level
    twin of the whitespace counter (both mandated counters)."""
    s = pd.Series(batch["text"].to_pylist(), dtype="object").fillna("")
    n = s.str.count(_BPE).astype(np.int64)
    return pa.table({"doc_id": batch["doc_id"], "n_bpe": pa.array(n)})


def quality_score_batch(batch: pa.Table) -> pa.Table:
    """Deterministic quality components + composite score, each with an
    exact DuckDB twin (see queries.py):
      n_chars, n_tok, punct_ratio (of chars), stop_ratio (of tokens),
      score = n_tok/(n_tok+100) - punct_ratio + stop_ratio."""
    s = pd.Series(batch["text"].to_pylist(), dtype="object").fillna("")
    n_chars = s.str.len().astype(np.float64)
    n_tok = s.str.count(WS_RE).astype(np.float64)
    punct = s.str.count(_PUNCT).astype(np.float64)
    stops = s.str.count(_STOP).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        punct_ratio = np.where(n_chars > 0, punct / n_chars, 0.0)
        stop_ratio = np.where(n_tok > 0, stops / n_tok, 0.0)
    score = n_tok / (n_tok + 100.0) - punct_ratio + stop_ratio
    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "n_chars": pa.array(n_chars),
            "n_tok": pa.array(n_tok),
            "punct_ratio": pa.array(punct_ratio),
            "stop_ratio": pa.array(stop_ratio),
            "score": pa.array(score),
        }
    )


def lang_id_batch(batch: pa.Table) -> pa.Table:
    """Heuristic language id from character classes (CJK / Cyrillic /
    Latin alpha-ratio); deterministic — rows-only check."""
    s = pd.Series(batch["text"].to_pylist(), dtype="object").fillna("")
    n = s.str.len().clip(lower=1).astype(np.float64)
    cjk = s.str.count(_CJK).astype(np.float64) / n
    cyr = s.str.count(_CYR).astype(np.float64) / n
    alpha = s.str.count(_ALPHA).astype(np.float64) / n
    pred = np.where(cjk > 0.05, "zh", np.where(cyr > 0.05, "ru", np.where(alpha > 0.4, "en", "unk")))
    return pa.table({"doc_id": batch["doc_id"], "pred_lang": pa.array(pred.astype(object), pa.string())})


def _word_hash(w: str) -> int:
    """32-bit word hash = first 8 hex chars of md5 — chosen over crc32
    because DuckDB (the correctness oracle) can reproduce it exactly:
    ``cast(('0x' || substr(md5(w),1,8)) as bigint)``."""
    return int(hashlib.md5(w.encode()).hexdigest()[:8], 16)


_RK_B, _RK_M = 1_000_003, (1 << 61) - 1
_RK_PW = pow(_RK_B, 3, _RK_M)


def window_hashes_4(words: list[str]) -> list[int]:
    """All rolling 4-gram Rabin-Karp hashes of a word sequence
    (md5-prefix word hashes, mod 2^61-1); empty for <4 words.  The
    shared n-gram unit of the fingerprint and the decontamination
    membership test."""
    if len(words) < 4:
        return []
    hs = [_word_hash(w) for w in words]
    out = []
    acc = 0
    for i, h in enumerate(hs):
        if i < 4:
            acc = (acc * _RK_B + h) % _RK_M
            if i == 3:
                out.append(acc)
        else:
            acc = ((acc - hs[i - 4] * _RK_PW) * _RK_B + h) % _RK_M
            out.append(acc)
    return out


# -- vectorized Rabin-Karp (the batch path of the three 4-gram ops) ---------
#
# (acc * B) % M with M = 2^61-1 needs a 81-bit product; numpy has no
# 128-bit integers, so the multiply is split 64-bit-safe:
#   acc = hi*2^44 + lo;  acc*B = hi*B*2^44 + lo*B
#   lo*B  < 2^44 * 1000003 < 2^64           (exact in uint64)
#   x*2^44 ≡ (x>>17) + ((x & (2^17-1))<<44) (mod M, since 2^61 ≡ 1)
# The result is bit-identical to the scalar Python fold (pytest-pinned
# and oracle-pinned: fingerprint/decontaminate/dup-span queries).

_RK_B64 = np.uint64(_RK_B)
_RK_M64 = np.uint64(_RK_M)
_RK_MASK44 = np.uint64((1 << 44) - 1)
_RK_MASK17 = np.uint64((1 << 17) - 1)


def _mulmod_b(acc: np.ndarray) -> np.ndarray:
    """(acc * _RK_B) % _RK_M elementwise, acc < 2^61, pure uint64."""
    hi = acc >> np.uint64(44)
    lo = acc & _RK_MASK44
    x = hi * _RK_B64
    highpart = (x >> np.uint64(17)) + ((x & _RK_MASK17) << np.uint64(44))
    y = lo * _RK_B64
    y = (y >> np.uint64(61)) + (y & _RK_M64)
    return (y + highpart) % _RK_M64


def _horner_step(acc: np.ndarray, h: np.ndarray) -> np.ndarray:
    """((acc * B) + h) % M elementwise (h < 2^32)."""
    return (_mulmod_b(acc) + h) % _RK_M64


def _split_word_hashes(texts_col) -> tuple[np.ndarray, np.ndarray]:
    """(flat md5-32 word hashes as uint64, word offsets int64[n+1]) for
    a batch text column — Arrow whitespace split (byte-identical to
    WS_RE.findall, see pipelines.tokens), dictionary-encoded so each
    UNIQUE word is md5-hashed once."""
    import pyarrow.compute as pc

    txt = texts_col.combine_chunks() if isinstance(
        texts_col, pa.ChunkedArray
    ) else texts_col
    wl = pc.ascii_split_whitespace(pc.fill_null(txt, ""))
    if isinstance(wl, pa.ChunkedArray):
        wl = wl.combine_chunks()
    loff = wl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lo = int(loff[0])
    vals = wl.values.slice(lo, int(loff[-1]) - lo)
    keep = np.asarray(pc.binary_length(vals)) > 0
    cum = np.zeros(len(vals) + 1, dtype=np.int64)
    np.cumsum(keep, out=cum[1:])
    rel = loff - lo
    offsets = cum[rel]  # int64[n+1]
    flat_words = vals.filter(pa.array(keep))
    if len(flat_words):
        d = pc.dictionary_encode(flat_words)
        uniq = np.fromiter(
            (
                int.from_bytes(hashlib.md5(w.encode()).digest()[:4], "big")
                for w in d.dictionary.to_pylist()
            ),
            dtype=np.uint64,
            count=len(d.dictionary),
        )
        wh = uniq[d.indices.to_numpy(zero_copy_only=False)]
    else:
        wh = np.zeros(0, dtype=np.uint64)
    return wh, offsets


def _windows_from_words(
    wh: np.ndarray, w_off: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(h4 uint64 flat, window offsets int64[n+1]) from flattened word
    hashes — one vectorized 4-step Horner, no per-doc Python."""
    n_words = np.diff(w_off)
    n_win = np.maximum(n_words - 3, 0)
    h4_off = np.zeros(len(n_win) + 1, dtype=np.int64)
    np.cumsum(n_win, out=h4_off[1:])
    total = int(h4_off[-1])
    if not total:
        return np.zeros(0, dtype=np.uint64), h4_off
    # flat start positions of each window (doc-local windows only)
    base = np.repeat(w_off[:-1], n_win)
    within = np.arange(total) - np.repeat(h4_off[:-1], n_win)
    s = base + within
    acc = wh[s]
    for j in (1, 2, 3):
        acc = _horner_step(acc, wh[s + j])
    return acc, h4_off


def window_hashes_4_flat(texts_col) -> tuple[np.ndarray, np.ndarray]:
    """All rolling word-4-gram hashes of a batch text column, flat:
    (h4 int64, window offsets int64[n+1]).  Docs with <4 words get 0
    windows (the scalar convention)."""
    wh, w_off = _split_word_hashes(texts_col)
    acc, h4_off = _windows_from_words(wh, w_off)
    return acc.astype(np.int64), h4_off


def distinct_window_hashes_4(texts_col) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT (and sorted) 4-gram hashes, flat: (h4 int64,
    offsets int64[n+1]) — one lexsort over (doc, h4) + a run-dedup
    mask replaces the per-doc ``np.unique`` loops."""
    h4, off = window_hashes_4_flat(texts_col)
    n = len(off) - 1
    if not h4.size:
        return h4, off
    doc_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(off))
    order = np.lexsort((h4, doc_of))
    ds_, hs_ = doc_of[order], h4[order]
    first = np.ones(hs_.size, dtype=bool)
    first[1:] = (ds_[1:] != ds_[:-1]) | (hs_[1:] != hs_[:-1])
    ds_u, hs_u = ds_[first], hs_[first]
    counts = np.bincount(ds_u, minlength=n)
    out_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=out_off[1:])
    return hs_u, out_off


def _rolling_hash_tokens(words: list[str]) -> int:
    """Winnowing-style fingerprint: min of rolling 4-gram hashes
    (Rabin-Karp over md5-prefix word hashes); deterministic 61-bit."""
    if not words:
        return 0
    if len(words) < 4:
        acc = 0
        for w in words:
            acc = (acc * _RK_B + _word_hash(w)) % _RK_M
        return acc
    return min(window_hashes_4(words))


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint): content fingerprint stable under
    whitespace normalization; identical texts get identical prints.
    Fully vectorized: one Arrow split + unique-word md5 + 4-step
    Horner + ``minimum.reduceat`` per doc; short docs (<4 words) fold
    their words in at most 3 masked vector steps (bit-identical to the
    scalar ``_rolling_hash_tokens``, pytest-pinned)."""
    wh, w_off = _split_word_hashes(batch["text"])
    n = len(w_off) - 1
    n_words = np.diff(w_off)
    fps = np.zeros(n, dtype=np.uint64)
    short = np.flatnonzero((n_words > 0) & (n_words < 4))
    if short.size:
        acc = np.zeros(short.size, dtype=np.uint64)
        for j in range(3):
            sel = np.flatnonzero(n_words[short] > j)
            if not sel.size:
                break
            acc[sel] = _horner_step(acc[sel], wh[w_off[short[sel]] + j])
        fps[short] = acc
    h4, h4_off = _windows_from_words(wh, w_off)
    if h4.size:
        n_win = np.diff(h4_off)
        longd = np.flatnonzero(n_win > 0)
        fps[longd] = np.minimum.reduceat(h4, h4_off[longd])
    return pa.table(
        {"doc_id": batch["doc_id"], "fingerprint": pa.array(fps.astype(np.int64))}
    )
