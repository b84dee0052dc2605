"""Independent NumPy oracles, mirroring the reference's plain-Java IT
oracles (AllUdafIT.java:747-905, centered two-pass forms) and the
commons-math3 sample-statistics definitions used by its unit tests
(SkewnessUdafTest.java:126-145, KurtosisUdafTest.java:129-148).

Deliberately written centered/two-pass — a DIFFERENT formulation from
the engine's raw power sums — so agreement is meaningful.
"""

from __future__ import annotations

import numpy as np


def weighted_average(v, w):
    v, w = np.asarray(v, float), np.asarray(w, float)
    sw = w.sum()
    return 0.0 if sw == 0.0 else float((w * v).sum() / sw)


def weighted_stddev(v, w):
    """AllUdafIT.java:747-767."""
    v, w = np.asarray(v, float), np.asarray(w, float)
    sw = w.sum()
    if sw == 0.0:
        return 0.0
    mu = (w * v).sum() / sw
    var = (w * (v - mu) ** 2).sum() / sw
    return float(np.sqrt(max(var, 0.0)))


def weighted_skewness(v, w):
    """AllUdafIT.java:776-808."""
    v, w = np.asarray(v, float), np.asarray(w, float)
    sw = w.sum()
    if sw == 0.0:
        return 0.0
    mu = (w * v).sum() / sw
    var = (w * (v - mu) ** 2).sum() / sw
    if var == 0.0:
        return 0.0
    m3 = (w * (v - mu) ** 3).sum() / sw
    return float(m3 / max(var, 0.0) ** 1.5)


def weighted_kurtosis(v, w):
    """AllUdafIT.java:873-905."""
    v, w = np.asarray(v, float), np.asarray(w, float)
    sw = w.sum()
    if sw == 0.0:
        return 0.0
    mu = (w * v).sum() / sw
    var = (w * (v - mu) ** 2).sum() / sw
    if var == 0.0:
        return 0.0
    m4 = (w * (v - mu) ** 4).sum() / sw
    return float(m4 / (var * var))


def pop_skewness(v):
    """AllUdafIT.java:815-835."""
    v = np.asarray(v, float)
    n = v.size
    if n == 0:
        return 0.0
    mu = v.mean()
    var = ((v - mu) ** 2).mean()
    if var == 0.0:
        return 0.0
    m3 = ((v - mu) ** 3).mean()
    return float(m3 / var**1.5)


def pop_kurtosis(v):
    """AllUdafIT.java:842-864 (NOT excess: m4/var^2)."""
    v = np.asarray(v, float)
    n = v.size
    if n == 0:
        return 0.0
    mu = v.mean()
    var = ((v - mu) ** 2).mean()
    if var == 0.0:
        return 0.0
    m4 = ((v - mu) ** 4).mean()
    return float(m4 / (var * var))


def sample_skewness(v):
    """commons-math3 Skewness: [n/((n-1)(n-2))] * sum((x-mu)^3)/s^3."""
    v = np.asarray(v, float)
    n = v.size
    if n == 0:
        return 0.0  # count==0 gate precedes the sample gate (SkewnessUdaf.java:157-163)
    if n < 3:
        return float("nan")
    mu = v.mean()
    s2 = ((v - mu) ** 2).sum() / (n - 1)
    if s2 == 0.0:
        return 0.0
    return float(n / ((n - 1) * (n - 2)) * ((v - mu) ** 3).sum() / s2**1.5)


def sample_kurtosis(v):
    """commons-math3 Kurtosis (excess, bias-corrected)."""
    v = np.asarray(v, float)
    n = v.size
    if n == 0:
        return 0.0  # count==0 gate precedes the sample gate (KurtosisUdaf.java:163-170)
    if n < 4:
        return float("nan")
    mu = v.mean()
    s2 = ((v - mu) ** 2).sum() / (n - 1)
    if s2 == 0.0:
        return 0.0
    term = (n * (n + 1)) / ((n - 1) * (n - 2) * (n - 3)) * ((v - mu) ** 4).sum() / (
        s2 * s2
    )
    return float(term - 3.0 * (n - 1) ** 2 / ((n - 2) * (n - 3)))


ORACLES = {
    "weighted_average": weighted_average,
    "stddev_weighted": weighted_stddev,
    "skewness_weighted": weighted_skewness,
    "kurtosis_weighted": weighted_kurtosis,
    "skewness": pop_skewness,
    "kurtosis": pop_kurtosis,
    "skewness_sample": sample_skewness,
    "kurtosis_sample": sample_kurtosis,
}


def evaluate(name: str, values, weights=None):
    fn = ORACLES[name]
    if name in ("weighted_average", "stddev_weighted", "skewness_weighted", "kurtosis_weighted"):
        return fn(values, weights)
    return fn(values)
