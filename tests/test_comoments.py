"""Conformance tests for the bivariate co-moment accumulators
(covariance / correlation, weighted + unweighted): full lifecycle
(initialize / accumulate / merge / finalize) at 1e-9 against
independent NumPy oracles, merge associativity, and vectorized
finalize parity.  No Ray needed here."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from raystat.comoments import CO_REGISTRY, get_comoment

X6 = np.array([3.0, 4.0, 7.0, 13.0, 16.0, 20.0])
Y6 = np.array([1.0, 9.0, 2.0, 8.0, 5.0, 11.0])
W6 = np.array([2.0, 1.0, 2.0, 1.0, 3.0, 1.0])


def run_spec(name, x, y, w=None, n_chunks=3):
    spec = get_comoment(name)
    state = spec.initialize()
    xs = np.array_split(np.asarray(x, float), n_chunks)
    ys = np.array_split(np.asarray(y, float), n_chunks)
    ws = (
        np.array_split(np.asarray(w, float), n_chunks)
        if w is not None
        else [None] * n_chunks
    )
    for xv, yv, wv in zip(xs, ys, ws):
        state = spec.merge(state, spec.accumulate_batch(xv, yv, wv))
    return spec.finalize(state)


def np_cov_pop(x, y):
    return float(np.mean(x * y) - np.mean(x) * np.mean(y))


def np_cov_samp(x, y):
    n = len(x)
    return float((np.sum(x * y) - np.sum(x) * np.sum(y) / n) / (n - 1))


def np_corr(x, y):
    vx = np.mean(x * x) - np.mean(x) ** 2
    vy = np.mean(y * y) - np.mean(y) ** 2
    if vx == 0 or vy == 0:
        return 0.0
    return np_cov_pop(x, y) / np.sqrt(max(vx, 0) * max(vy, 0))


def np_wcov(x, y, w):
    sw = np.sum(w)
    return float(np.sum(w * x * y) / sw - (np.sum(w * x) / sw) * (np.sum(w * y) / sw))


def np_wcorr(x, y, w):
    sw = np.sum(w)
    mx, my = np.sum(w * x) / sw, np.sum(w * y) / sw
    vx = np.sum(w * x * x) / sw - mx * mx
    vy = np.sum(w * y * y) / sw - my * my
    if vx == 0 or vy == 0:
        return 0.0
    return np_wcov(x, y, w) / np.sqrt(max(vx, 0) * max(vy, 0))


CASES = [
    ("covariance", None, np_cov_pop),
    ("covariance_sample", None, np_cov_samp),
    ("correlation", None, np_corr),
    ("covariance_weighted", W6, np_wcov),
    ("correlation_weighted", W6, np_wcorr),
]


@pytest.mark.parametrize("name,w,oracle", CASES, ids=[c[0] for c in CASES])
def test_oracle_1e9(name, w, oracle):
    got = run_spec(name, X6, Y6, w)
    want = oracle(X6, Y6, w) if w is not None else oracle(X6, Y6)
    assert got == pytest.approx(want, rel=1e-9, abs=1e-9)


def test_edge_cases():
    # empty state finalizes to 0.0 (the reference's zero-weight guard style)
    for name in CO_REGISTRY:
        spec = get_comoment(name)
        assert spec.finalize(spec.initialize()) == 0.0
    # constant column => zero variance => correlation 0.0 by convention
    c = np.full(5, 7.0)
    v = np.arange(5, dtype=float)
    assert run_spec("correlation", c, v) == 0.0
    assert run_spec("correlation", v, c) == 0.0
    # single point: sample covariance guard (n < 2)
    assert run_spec("covariance_sample", [3.0], [4.0], n_chunks=1) == 0.0
    # perfect linear relation => |r| == 1
    assert run_spec("correlation", v, 2 * v + 1) == pytest.approx(1.0, abs=1e-12)
    assert run_spec("correlation", v, -3 * v) == pytest.approx(-1.0, abs=1e-12)


@given(
    st.lists(
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False),
        min_size=2,
        max_size=40,
    ),
    st.integers(min_value=0, max_value=2**31),
    st.integers(min_value=1, max_value=5),
)
@settings(max_examples=60, deadline=None)
def test_property_chunking_invariance(xs, seed, n_chunks):
    """Chunked accumulate+merge equals one-shot accumulate for every
    registered comoment (power sums are order/partition insensitive)."""
    rng = np.random.default_rng(seed)
    x = np.asarray(xs, float)
    y = rng.uniform(-1e3, 1e3, size=x.size)
    w = rng.uniform(0.1, 10.0, size=x.size)
    for name, spec in CO_REGISTRY.items():
        wv = w if spec.weighted else None
        one = spec.finalize(spec.accumulate_batch(x, y, wv))
        chunked = run_spec(name, x, y, wv, n_chunks=min(n_chunks, x.size))
        if np.isnan(one):
            # degenerate variance: the (reference-faithful) naive
            # power-sum ratio is NaN; both paths must agree on that
            assert np.isnan(chunked), name
        else:
            assert chunked == pytest.approx(one, rel=1e-7, abs=1e-7), name


def test_merge_associativity():
    rng = np.random.default_rng(7)
    x = rng.normal(size=30)
    y = rng.normal(size=30)
    w = rng.uniform(0.5, 2.0, size=30)
    for name, spec in CO_REGISTRY.items():
        wv = w if spec.weighted else None
        parts = [
            spec.accumulate_batch(
                x[i : i + 10], y[i : i + 10], wv[i : i + 10] if spec.weighted else None
            )
            for i in range(0, 30, 10)
        ]
        left = spec.merge(spec.merge(parts[0], parts[1]), parts[2])
        right = spec.merge(parts[0], spec.merge(parts[1], parts[2]))
        for f in spec.fields:
            assert left[f] == pytest.approx(right[f], rel=1e-12)


def test_finalize_arrays_matches_scalar():
    """Vectorized finalize over stacked group states == per-group scalar."""
    rng = np.random.default_rng(11)
    groups = []
    for _ in range(4):
        n = int(rng.integers(2, 20))
        groups.append(
            (rng.normal(size=n), rng.normal(size=n), rng.uniform(0.1, 3.0, size=n))
        )
    for name, spec in CO_REGISTRY.items():
        states = [
            spec.accumulate_batch(x, y, w if spec.weighted else None)
            for x, y, w in groups
        ]
        cols = {
            c: np.array([s[f] for s in states], dtype=float)
            for c, f in zip(spec.canonical, spec.fields)
        }
        vec = spec.finalize_arrays(cols)
        for i, s in enumerate(states):
            assert vec[i] == pytest.approx(spec.finalize(s), rel=1e-12), name


def test_show_functions_includes_comoments():
    from raystat.accumulators import show_functions

    names = {r["name"] for r in show_functions()}
    assert set(CO_REGISTRY) <= names
    for r in show_functions():
        if r["name"] in CO_REGISTRY:
            assert r["reference"] is False
