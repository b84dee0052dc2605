"""Training-data operations: planted-duplicate recovery, similarity
search correctness vs brute force, text-analysis determinism,
multimodal actor-pool plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from tests.util import to_pandas

BASE_TEXTS = [
    "the quick brown fox jumps over the lazy dog near the river bank today",
    "a completely different document about distributed data processing engines",
    "streaming statistics with watermarks and windows over token sequences",
    "weighted moments skewness and kurtosis computed from power sums exactly",
    "large scale training data pipelines need deduplication and quality checks",
]


def _docs_table(n=40, seed=3):
    rng = np.random.default_rng(seed)
    texts, srcs = [], []
    for i in range(n):
        base = BASE_TEXTS[i % len(BASE_TEXTS)]
        words = base.split()
        rng.shuffle(words) if i % 7 == 0 else None
        texts.append(" ".join(words) + f" tail{i % 11}")
        srcs.append(f"s{i % 3}")
    # plant exact duplicates: 35<-0, 36<-1
    texts[35] = texts[0]
    texts[36] = texts[1]
    # plant a near duplicate of 2 (one appended word -> shingle
    # jaccard ~0.89, reliably above the LSH band threshold)
    texts[37] = texts[2] + " extraword"
    return pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(srcs, pa.string()),
        }
    )


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(_docs_table())


def test_exact_dedup(docs_ds):
    from raystat.dataops.dedup import exact_dedup

    out = to_pandas(exact_dedup(docs_ds)).sort_values("doc_id")
    assert 35 not in set(out["doc_id"]) and 36 not in set(out["doc_id"])
    assert 0 in set(out["doc_id"]) and 1 in set(out["doc_id"])
    assert len(out) == 38  # 40 - 2 exact dups


def test_minhash_lsh_finds_planted_dups(docs_ds):
    from raystat.dataops.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(docs_ds, threshold=0.7)
    got = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 35) in got and (1, 36) in got  # exact dups (jaccard 1.0)
    assert (2, 37) in got  # near dup
    # verified jaccard values are exact
    j = pairs.set_index(["doc_a", "doc_b"])["jaccard"]
    assert j.loc[(0, 35)] == 1.0


def test_simhash_finds_exact_dups(docs_ds):
    from raystat.dataops.dedup import simhash_pairs

    pairs = simhash_pairs(docs_ds, max_hamming=3)
    got = {(int(a), int(b)) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (0, 35) in got and (1, 36) in got
    ham = pairs.set_index(["doc_a", "doc_b"])["hamming"]
    assert ham.loc[(0, 35)] == 0


def test_ngram_jaccard_symmetry():
    from raystat.dataops.dedup import jaccard, shingle_set

    a = shingle_set(BASE_TEXTS[0])
    b = shingle_set(BASE_TEXTS[0])
    c = shingle_set(BASE_TEXTS[1])
    assert jaccard(a, b) == 1.0
    assert jaccard(a, c) < 0.2
    assert jaccard(a, c) == jaccard(c, a)


def _emb_ds(ray_session, n=60, dim=16, seed=5):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, dim)).astype(np.float32)
    X[50] = X[0]  # exact dup
    X[51] = X[1] + rng.standard_normal(dim).astype(np.float32) * 0.01  # near dup
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(X), type=pa.list_(pa.float32())),
            }
        )
    ), X


def test_embedding_dup_pairs(ray_session):
    from raystat.dataops.similarity import embedding_dup_pairs

    ds, X = _emb_ds(ray_session)
    out = embedding_dup_pairs(ds, threshold=0.95)
    got = {(int(a), int(b)) for a, b in zip(out["vec_a"], out["vec_b"])}
    assert (0, 50) in got and (1, 51) in got


def test_embedding_lsh_recovers_exact_dup(ray_session):
    from raystat.dataops.similarity import embedding_lsh_pairs

    ds, X = _emb_ds(ray_session)
    out = embedding_lsh_pairs(ds, threshold=0.95)
    got = {(int(a), int(b)) for a, b in zip(out["vec_a"], out["vec_b"])}
    assert (0, 50) in got  # identical vectors always collide


def test_ann_topk_matches_bruteforce(ray_session):
    from raystat.dataops.similarity import ann_topk

    ds, X = _emb_ds(ray_session)
    Xn = X.astype(np.float64)
    Xn = Xn / np.linalg.norm(Xn, axis=1, keepdims=True)
    C = Xn @ Xn[:3].T
    out = ann_topk(ds, X[:3], np.arange(3), k=5)
    for q in range(3):
        c = C[:, q].copy()
        ids = np.arange(len(c))
        mask = ids != q
        order = np.lexsort((ids[mask], -c[mask]))[:5]
        expect = list(ids[mask][order])
        got = out[out["query_id"] == q]["neighbor_id"].tolist()
        assert got == expect, (q, got, expect)


def test_text_analysis_deterministic(docs_ds):
    from raystat.dataops.text import (
        fingerprint_batch,
        lang_id_batch,
        quality_score_batch,
        token_count_batch,
    )

    t = _docs_table()
    a = token_count_batch(t)
    assert a["n_tok"][0].as_py() == len(BASE_TEXTS[0].split()) + 1  # + tail word
    q = quality_score_batch(t)
    assert q.num_rows == t.num_rows
    sr = q["stop_ratio"].to_numpy()
    assert (sr >= 0).all() and (sr <= 1).all() and sr[0] > 0
    l = lang_id_batch(t)
    assert set(l["pred_lang"].to_pylist()) <= {"en", "zh", "ru", "unk"}
    f1 = fingerprint_batch(t)["fingerprint"].to_pylist()
    f2 = fingerprint_batch(t)["fingerprint"].to_pylist()
    assert f1 == f2
    assert f1[0] == f1[35]  # identical texts -> identical fingerprints


def test_multimodal_plumbing(docs_ds):
    from raystat.dataops.multimodal import image_features

    out = to_pandas(image_features(docs_ds, concurrency=2, batch_size=16))
    assert len(out) == 40
    assert len(out["features"].iloc[0]) == 8
    # deterministic across runs
    out2 = to_pandas(image_features(docs_ds, concurrency=2, batch_size=16))
    pd.testing.assert_frame_equal(
        out.sort_values("doc_id", ignore_index=True),
        out2.sort_values("doc_id", ignore_index=True),
    )
