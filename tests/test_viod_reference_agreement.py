"""VIOD reference-agreement (VERDICT r2 missing #3).

The engine's VarianceImpactOutlierDetector deviates deliberately from
the reference in one place: the reference's min-side run scan stops at
EITHER end's run boundary (the side-coupled condition in
``_std_delta_for_side``, variance_impact_outlier_detector.py:177-191),
while the engine scans each side independently (outliers.py:17-21).

These tests prove the deviation is contract-equivalent on the
reference's own statistical draws
(tests/VarianceImpactOutlierDetector/test_variance_impact_outlier_detector.py:12-114):

1. the reference's behavioral contracts hold for the engine fit
   (no outliers on Normal / mixture / lognormal / exponential draws,
   planted extremes recovered, exact cutoff specificity);
2. the engine fit's learned bounds and classifications are IDENTICAL
   to a faithful replay of the reference algorithm — side-coupled scan
   included — on every draw.

``_reference_fit`` below is a test-local oracle written from the
reference's published update rule; it reproduces the side-coupled scan
on purpose so any divergence the deviation could cause would surface
here as a bounds mismatch.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from eventstreamml_spark.preprocessing.outliers import VarianceImpactOutlierDetector

# (distribution, N) grid from the reference tests; 1e6 trimmed to one
# representative normal draw to keep suite runtime bounded
SIZES = (10, 100, 1000, 10000)


def _draw(dist: str, n: int) -> np.ndarray:
    rng = np.random  # reference uses the legacy global-seed API
    rng.seed(n)
    if dist == "normal":
        return rng.normal(size=n)
    if dist == "mixture":
        return np.concatenate(
            [rng.normal(loc=-1, size=n // 2), rng.normal(loc=1, size=n // 2)]
        )
    if dist == "lognormal":
        return rng.lognormal(size=n)
    if dist == "exponential":
        return rng.exponential(size=n)
    raise ValueError(dist)


def _reference_fit(
    values: np.ndarray,
    subsample_frac: float = 0.1,
    max_prob: float = 0.05,
    std_delta_thresh: float | None = None,
) -> tuple[float, float]:
    """Replay of the reference fit loop (get_starting_bounds + fit,
    variance_impact_outlier_detector.py:157-216), preserving its
    side-coupled min-side run-termination condition. Returns the
    learned (thresh_small_, thresh_large_)."""

    def thr(n: int) -> float:
        return std_delta_thresh if std_delta_thresh is not None else 10.0 * n ** -0.6

    x = np.sort(np.asarray(values, float).reshape(-1))
    n_all = len(x)
    s, s2 = float(x.sum()), float((x * x).sum())

    def std(n, s_, s2_):
        return math.sqrt(max(s2_ / n - (s_ / n) ** 2, 0.0))

    mean, sd = s / n_all, std(n_all, s, s2)
    d = thr(n_all + 1)
    if abs(d - 1.0) >= math.sqrt((n_all + 1) / n_all):
        dev = float("inf")
    else:
        dev = (n_all + 1) * math.sqrt(
            1.0 / (n_all * (1.0 - d) ** 2) - 1.0 / (n_all + 1)
        )
    lo_b, hi_b = mean - sd * dev, mean + sd * dev
    if math.isnan(lo_b):
        lo_b = float("-inf")
    if math.isnan(hi_b):
        hi_b = float("inf")

    lo, hi = 0, n_all  # active window of the sorted array
    while hi - lo > 1:
        n = hi - lo
        max_l = min(n - 1, int(math.floor(n * (1 - max_prob ** (1 / (subsample_frac * n))))))
        cur = std(n, s, s2)
        if cur == 0.0:
            break

        def side(is_min: bool):
            # the reference's loop: the min-side scan ALSO terminates on
            # the max-side boundary (its `or` clause is unconditional)
            ell, found = 0, False
            for ell in range(1, max_l):
                min_break = x[lo + ell] != x[lo + ell - 1]
                max_break = x[hi - ell] != x[hi - ell - 1]
                if (is_min and min_break) or max_break:
                    found = True
                    break
            if not found:
                return (0.0, 0.0, None)
            v = float(x[lo + ell - 1] if is_min else x[hi - ell])
            ns, ns2 = s - v * ell, s2 - v * v * ell
            return (abs(cur - std(n - ell, ns, ns2)) / cur, v, (ell, ns, ns2))

        mi, ma = side(True), side(False)
        min_more = mi[0] > ma[0]
        delta, v, st = mi if min_more else ma
        if st is None or delta <= thr(n):
            break
        ell, s, s2 = st[0], st[1], st[2]
        if min_more:
            lo_b = v
            lo += ell
        else:
            hi_b = v
            hi -= ell
    return lo_b, hi_b


def _classify(x: np.ndarray, lo: float, hi: float) -> np.ndarray:
    out = np.ones(len(x))
    out[(x <= lo) | (x >= hi)] = -1.0
    return out


@pytest.mark.parametrize("dist", ["normal", "mixture", "lognormal", "exponential"])
def test_no_outliers_on_clean_draws(dist):
    for n in SIZES:
        x = _draw(dist, n)
        det = VarianceImpactOutlierDetector().fit(x)
        assert not math.isnan(det.thresh_small_) and not math.isnan(det.thresh_large_)
        assert (det.predict(x) == 1).all(), f"{dist} N={n} flagged a clean point"


def test_no_outliers_on_large_normal_draw():
    n = 1_000_000
    x = _draw("normal", n)
    det = VarianceImpactOutlierDetector().fit(x)
    assert (det.predict(x) == 1).all()


def test_planted_outliers_recovered():
    for n in (1000, 10000):
        np.random.seed(n)
        x = np.concatenate([np.random.normal(size=n - 2), [1e2, -1e2]])
        det = VarianceImpactOutlierDetector().fit(x)
        assert (det.predict(x) == -1).sum() == 2
        assert det.thresh_large_ == 1e2 and det.thresh_small_ == -1e2


def test_cutoff_specificity():
    """Port of test_outlier_flagging_is_specific: with a fixed std-delta
    threshold, the planted symmetric extremes are the exact bounds."""
    for n in (100, 1000, 10000):
        np.random.seed(n)
        x = np.random.normal(size=n - 2)
        x = (x - x.mean()) / x.std()
        std_delta = 0.1
        pt = np.sqrt((n + 1) * ((n + 1) / n * (1 / std_delta) ** 2 - 1))
        x = np.concatenate([x, [pt, -pt]])
        det = VarianceImpactOutlierDetector(max_std_delta_thresh=std_delta).fit(x)
        assert det.thresh_large_ == pt and det.thresh_small_ == -pt
        assert (det.predict(x) == -1).sum() == 2


@pytest.mark.parametrize("dist", ["normal", "mixture", "lognormal", "exponential"])
def test_bounds_agree_with_reference_algorithm(dist):
    """Engine fit == reference replay (side-coupled scan included):
    identical bounds AND identical inlier/outlier classification."""
    for n in SIZES:
        x = _draw(dist, n)
        lo, hi = _reference_fit(x)
        det = VarianceImpactOutlierDetector().fit(x)
        for got, want in ((det.thresh_small_, lo), (det.thresh_large_, hi)):
            if math.isinf(want):
                assert got == want
            else:
                assert got == pytest.approx(want, rel=1e-12)
        assert (_classify(x, lo, hi) == det.predict(x)).all()


def test_bounds_agree_on_planted_draws():
    for n in (1000, 10000):
        np.random.seed(n)
        x = np.concatenate([np.random.normal(size=n - 2), [1e2, -1e2]])
        lo, hi = _reference_fit(x)
        det = VarianceImpactOutlierDetector().fit(x)
        assert (lo, hi) == (det.thresh_small_, det.thresh_large_)
        assert (_classify(x, lo, hi) == det.predict(x)).all()
