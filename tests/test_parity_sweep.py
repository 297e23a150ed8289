"""Randomized parity sweep: our pipeline vs a sklearn/float64 oracle across
the configuration space (auto/cross, covtype, weights, dims, kmax) — the
north-star |dlnZ| < 1e-6 target (BASELINE.md) checked broadly, not just on
one happy path."""

import math

import numpy as np
import pytest
import scipy.special as sp
from sklearn.neighbors import NearestNeighbors

from mcevidence_tpu import evidence_fn


def oracle(theta, lnl, weights, kmax, *, theta2=None, covtype="all",
           prior_volume=1.0):
    """Reference-formula implementation (MCEvidence.py:1034-1131) in f64."""
    n, ndim = theta.shape
    cross = theta2 is not None
    if covtype == "all":
        allpts = np.concatenate([theta, theta2]) if cross else theta
        cov = np.cov(allpts.T)
        ev, evec = np.linalg.eigh(cov)
        w1 = (theta @ evec) / np.sqrt(ev)
        w2 = (theta2 @ evec) / np.sqrt(ev) if cross else None
        jac = math.sqrt(np.linalg.det(cov))
    else:
        cov = np.cov(theta.T)
        ev, evec = np.linalg.eigh(cov)
        w1 = (theta @ evec) / np.sqrt(ev)
        jac = math.sqrt(np.linalg.det(cov))
        w2 = None
        if cross:
            cov2 = np.cov(theta2.T)
            ev2, evec2 = np.linalg.eigh(cov2)
            w2 = (theta2 @ evec2) / np.sqrt(ev2)
    ref = w2 if cross else w1
    D, _ = NearestNeighbors(n_neighbors=kmax + 1).fit(ref).kneighbors(w1)
    lmax = lnl.max()
    fs = np.exp(lnl - lmax)
    k0 = 0 if cross else 1
    out = []
    for col in range(1, kmax):          # returned columns (quirk Q2)
        k_nn = col + 1 if k0 == 0 else col
        vol = (math.pi ** (ndim / 2) * D[:, col] ** ndim
               / sp.gamma(1 + ndim / 2))
        amax = np.dot(vol / weights, fs) / (n * k_nn + 1.0)
        out.append(math.log(weights.sum() * amax * jac) + lmax
                   - math.log(prior_volume))
    return np.array(out)


@pytest.mark.parametrize("seed", range(8))
def test_random_config_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(300, 1200))
    ndim = int(rng.integers(2, 9))
    kmax = int(rng.integers(2, 6))
    cross = bool(rng.integers(0, 2))
    covtype = "all" if rng.integers(0, 2) else "single"
    int_weights = bool(rng.integers(0, 2))

    scale = np.exp(rng.normal(0, 1, ndim))
    mean = rng.normal(0, 3, ndim)
    theta = rng.normal(mean, scale, size=(n, ndim))
    lnl = -0.5 * np.sum(((theta - mean) / scale) ** 2, axis=1)
    w = (rng.integers(1, 6, n).astype(float) if int_weights
         else rng.random(n) + 0.5)
    pv = float(np.exp(rng.normal(0, 2)))
    theta2 = rng.normal(mean, scale, size=(int(rng.integers(300, 900)),
                                           ndim)) if cross else None

    ours = evidence_fn(theta, lnl, weights=w, samples2=theta2, kmax=kmax,
                       covtype=covtype, prior_volume=pv, engine="xla")
    truth = oracle(theta, lnl, w, kmax, theta2=theta2, covtype=covtype,
                   prior_volume=pv)
    np.testing.assert_allclose(
        ours, truth, rtol=0, atol=1e-6,
        err_msg=f"config: n={n} d={ndim} kmax={kmax} cross={cross} "
                f"covtype={covtype} int_w={int_weights}")


def test_high_k_parity():
    # kmax beyond the usual 2-5 exercises the deep extraction path
    rng = np.random.default_rng(77)
    n, ndim, kmax = 900, 4, 9
    theta = rng.normal(0, 1, size=(n, ndim))
    lnl = -0.5 * np.sum(theta ** 2, axis=1)
    w = np.ones(n)
    ours = evidence_fn(theta, lnl, kmax=kmax, engine="xla")
    truth = oracle(theta, lnl, w, kmax)
    np.testing.assert_allclose(ours, truth, atol=1e-6)


def test_cross_error_reduction_claim():
    """The reference's headline statistical claim (README.md:82-86): the
    auto-evidence error is larger than the cross-evidence error by ~sqrt(2),
    because if B is A's nearest neighbour then A is likely B's.  Checked as
    scatter over repeated synthetic chains with generous bounds — the
    full on-chip measurement (docs/VALIDATION_STUDY.md "Auto vs cross
    scatter") shows the sqrt(2) holds only for matched-size independent
    chains at low d, while split-mode ratios run 0.5-1.0; the bounds here
    cover both regimes."""
    reps, n, ndim = 24, 700, 3
    autos, crosses = [], []
    for s in range(reps):
        rng = np.random.default_rng(5000 + s)
        theta = rng.normal(0, 1, size=(n, ndim))
        lnl = (-0.5 * np.sum(theta ** 2, axis=1)
               - 0.5 * ndim * np.log(2 * np.pi))
        autos.append(evidence_fn(theta, lnl, kmax=2, precision="fast",
                                 engine="xla")[0])
        half = n // 2
        crosses.append(evidence_fn(theta[:half], lnl[:half],
                                   samples2=theta[half:], kmax=2,
                                   precision="fast", engine="xla")[0])
    ratio = np.std(autos, ddof=1) / np.std(crosses, ddof=1)
    # cross uses half the queries, so the pure-claim ratio is diluted;
    # assert the directional claim with wide statistical margins
    assert 0.5 < ratio < 2.5, (ratio, np.std(autos), np.std(crosses))


@pytest.mark.parametrize("seed", range(4))
def test_random_config_parity_device_mode(seed):
    """The device-resident double-float path against the same f64 oracle —
    the production parity mode (precision='device') checked across random
    configs, auto and cross (covtype='all': the device path's cross mode)."""
    rng = np.random.default_rng(2000 + seed)
    n = int(rng.integers(300, 1200))
    ndim = int(rng.integers(2, 9))
    kmax = int(rng.integers(2, 6))
    cross = bool(rng.integers(0, 2))
    int_weights = bool(rng.integers(0, 2))

    scale = np.exp(rng.normal(0, 1, ndim))
    mean = rng.normal(0, 3, ndim)
    theta = rng.normal(mean, scale, size=(n, ndim))
    lnl = -0.5 * np.sum(((theta - mean) / scale) ** 2, axis=1)
    w = (rng.integers(1, 6, n).astype(float) if int_weights
         else rng.random(n) + 0.5)
    pv = float(np.exp(rng.normal(0, 2)))
    theta2 = rng.normal(mean, scale, size=(int(rng.integers(300, 900)),
                                           ndim)) if cross else None

    ours = evidence_fn(theta, lnl, weights=w, samples2=theta2, kmax=kmax,
                       covtype="all", prior_volume=pv, engine="xla",
                       precision="device")
    truth = oracle(theta, lnl, w, kmax, theta2=theta2, covtype="all",
                   prior_volume=pv)
    np.testing.assert_allclose(
        ours, truth, rtol=0, atol=1e-6,
        err_msg=f"device-mode config: n={n} d={ndim} kmax={kmax} "
                f"cross={cross} int_w={int_weights}")
