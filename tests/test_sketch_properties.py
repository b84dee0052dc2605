"""Property-based invariants for the round-5 pure kernels: Count-Min
(merge linearity/order-freedom, never-undercount, join-size bounds)
and temperature-mixture rates (bounds, monotonicity, threshold
consistency).  No Ray — these are the numpy kernels the distributed
paths compose."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from raystat.dataops.sketches import (
    CMS_WIDTH,
    cms_add,
    cms_add_weighted,
    cms_estimate,
    cms_init,
    cms_join_size,
    cms_merge,
)
from raystat.dataops.sampling import mixture_sample_rates

values = st.lists(
    st.integers(min_value=-(2**40), max_value=2**40), min_size=0, max_size=400
)


@settings(max_examples=60, deadline=None)
@given(values, st.integers(min_value=1, max_value=5))
def test_cms_split_invariance_and_never_undercount(vals, n_splits):
    """Any partition of the multiset into per-batch sketches, merged in
    any order, equals the single-shot sketch; estimates never fall
    below true counts."""
    arr = np.asarray(vals, dtype=np.int64)
    whole = cms_add(cms_init(), arr)
    parts = [
        cms_add(cms_init(), chunk) for chunk in np.array_split(arr, n_splits)
    ]
    acc = cms_init()
    for p in reversed(parts):  # reversed order: merges must commute
        acc = cms_merge(acc, p)
    assert (acc == whole).all()

    if arr.size:
        uniq, cnt = np.unique(arr, return_counts=True)
        est = cms_estimate(whole, uniq)
        assert (est >= cnt).all()
        # weighted-add over distinct counts is the same sketch
        w = cms_add_weighted(cms_init(), uniq, cnt)
        assert (w == whole).all()


@settings(max_examples=40, deadline=None)
@given(values, values)
def test_cms_join_size_bounds(a_vals, b_vals):
    a = np.asarray(a_vals, dtype=np.int64)
    b = np.asarray(b_vals, dtype=np.int64)
    sa, sb = cms_add(cms_init(), a), cms_add(cms_init(), b)
    est = cms_join_size(sa, sb)
    ua, ca = np.unique(a, return_counts=True)
    ub, cb = np.unique(b, return_counts=True)
    common, ia, ib = np.intersect1d(ua, ub, return_indices=True)
    true_join = int((ca[ia] * cb[ib]).sum())
    assert est >= true_join
    assert est == cms_join_size(sb, sa)
    # the (e/W)*Na*Nb bound holds with overwhelming margin at these sizes
    assert est - true_join <= max(1, math.e * a.size * b.size / CMS_WIDTH) * 4


masses = st.dictionaries(
    st.text(min_size=1, max_size=6),
    st.integers(min_value=1, max_value=10**12),
    min_size=1,
    max_size=12,
)


@settings(max_examples=80, deadline=None)
@given(masses)
def test_mixture_rates_bounds_monotone_threshold(m):
    rates = mixture_sample_rates(m)
    m_max = max(m.values())
    for k, (r, t) in rates.items():
        assert 0.0 < r <= 1.0
        assert t == math.floor(r * 2.0**64)
        if m[k] == m_max:
            assert r == 0.5  # the largest stratum keeps exactly rho
    # smaller mass -> keep-rate at least as large (temperature flattening)
    ks = sorted(m, key=lambda k: m[k])
    rs = [rates[k][0] for k in ks]
    assert all(a >= b - 1e-15 for a, b in zip(rs, rs[1:]))
