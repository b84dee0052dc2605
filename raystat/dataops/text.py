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
    whitespace normalization; identical texts get identical prints."""
    texts = batch["text"].to_pylist()
    fps = np.fromiter(
        (_rolling_hash_tokens(_WS.findall(t or "")) for t in texts),
        dtype=np.int64,
        count=len(texts),
    )
    return pa.table({"doc_id": batch["doc_id"], "fingerprint": pa.array(fps)})
