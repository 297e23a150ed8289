"""Multi-device tests on the fake 8-device CPU mesh (SURVEY.md §4e):
sharded ring-kNN evidence must match the single-device estimator."""

import numpy as np
import pytest

import jax
from jax.sharding import Mesh

from mcevidence_tpu import evidence_fn
from mcevidence_tpu.parallel.ring import sharded_auto_evidence
from tests.conftest import make_gaussian_chain


@pytest.fixture(scope="module")
def mesh8():
    devs = np.array(jax.devices())
    assert len(devs) >= 8, "conftest should have forced 8 CPU devices"
    return Mesh(devs[:8], ("ring",))


# NOTE: the sharded path runs everything (whitening, eigh, logsumexp) in
# f32 on device, while the single-device comparison whitens in f64 on the
# host, so ~1e-3 absolute agreement is the expected f32 envelope.
def test_sharded_matches_single_device(rng, mesh8):
    theta, lnl = make_gaussian_chain(rng, n=1024, ndim=4)
    single = evidence_fn(theta, lnl, kmax=4, precision="fast", engine="xla")
    multi = sharded_auto_evidence(theta, lnl, kmax=4, mesh=mesh8)
    np.testing.assert_allclose(multi, single, atol=2e-3)


def test_sharded_uneven_padding(rng, mesh8):
    # N=1001 not divisible by 8: padded rows must not perturb the result.
    theta, lnl = make_gaussian_chain(rng, n=1001, ndim=3)
    single = evidence_fn(theta, lnl, kmax=3, precision="fast", engine="xla")
    multi = sharded_auto_evidence(theta, lnl, kmax=3, mesh=mesh8)
    np.testing.assert_allclose(multi, single, atol=2e-3)


def test_sharded_with_weights(rng, mesh8):
    theta, lnl = make_gaussian_chain(rng, n=512, ndim=3)
    w = rng.integers(1, 4, size=len(theta)).astype(float)
    single = evidence_fn(theta, lnl, weights=w, kmax=2, precision="fast",
                         engine="xla")
    multi = sharded_auto_evidence(theta, lnl, weights=w, kmax=2, mesh=mesh8)
    np.testing.assert_allclose(multi, single, atol=2e-3)


def test_sharded_cross_matches_single_device(rng, mesh8):
    from mcevidence_tpu.parallel.ring import sharded_cross_evidence
    theta, lnl = make_gaussian_chain(rng, n=1600, ndim=3)
    s1, l1 = theta[:900], lnl[:900]
    s2 = theta[900:]
    single = evidence_fn(s1, l1, samples2=s2, kmax=3, precision="fast",
                         engine="xla")
    multi = sharded_cross_evidence(s1, l1, s2, kmax=3, mesh=mesh8)
    np.testing.assert_allclose(multi, single, atol=2e-3)


def test_sharded_cross_uneven(rng, mesh8):
    from mcevidence_tpu.parallel.ring import sharded_cross_evidence
    theta, lnl = make_gaussian_chain(rng, n=1501, ndim=3)
    s1, l1 = theta[:737], lnl[:737]
    s2 = theta[737:]
    single = evidence_fn(s1, l1, samples2=s2, kmax=2, precision="fast",
                         engine="xla")
    multi = sharded_cross_evidence(s1, l1, s2, kmax=2, mesh=mesh8)
    np.testing.assert_allclose(multi, single, atol=2e-3)


# --- refine precision: the sharded parity path must match the host f64
# refine path (same whitening, same refined distances) to float64 noise.
def test_sharded_refine_matches_refine_oracle(rng, mesh8):
    theta, lnl = make_gaussian_chain(rng, n=1003, ndim=4)
    single = evidence_fn(theta, lnl, kmax=4, precision="refine",
                         engine="xla")
    multi = sharded_auto_evidence(theta, lnl, kmax=4, mesh=mesh8,
                                  precision="refine")
    np.testing.assert_allclose(multi, single, atol=1e-9)


def test_sharded_refine_weighted(rng, mesh8):
    theta, lnl = make_gaussian_chain(rng, n=777, ndim=3)
    w = rng.integers(1, 5, size=len(theta)).astype(float)
    single = evidence_fn(theta, lnl, weights=w, kmax=3, precision="refine",
                         engine="xla")
    multi = sharded_auto_evidence(theta, lnl, weights=w, kmax=3, mesh=mesh8,
                                  precision="refine")
    np.testing.assert_allclose(multi, single, atol=1e-9)


def test_sharded_cross_refine_matches_refine_oracle(rng, mesh8):
    from mcevidence_tpu.parallel.ring import sharded_cross_evidence
    theta, lnl = make_gaussian_chain(rng, n=1600, ndim=3)
    s1, l1 = theta[:901], lnl[:901]
    s2 = theta[901:]
    single = evidence_fn(s1, l1, samples2=s2, kmax=3, precision="refine",
                         engine="xla")
    multi = sharded_cross_evidence(s1, l1, s2, kmax=3, mesh=mesh8,
                                   precision="refine")
    np.testing.assert_allclose(multi, single, atol=1e-9)


def test_grid_refine_matches_refine_oracle(rng):
    from mcevidence_tpu.parallel.ring import sharded_grid_auto_evidence_refine
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("dp", "ring"))
    chains = []
    for n in (700, 903, 801):
        theta, lnl = make_gaussian_chain(rng, n=n, ndim=3)
        chains.append((theta, lnl))
    out = sharded_grid_auto_evidence_refine(
        chains, kmax=3, mesh=mesh2, prior_volumes=[1.0, 2.0, 1.0])
    assert out.shape == (3, 2)
    for i, (theta, lnl) in enumerate(chains):
        single = evidence_fn(theta, lnl, kmax=3, precision="refine",
                             engine="xla",
                             prior_volume=[1.0, 2.0, 1.0][i])
        np.testing.assert_allclose(out[i], single, atol=1e-9)


def test_grid_evidence_2d_mesh(rng):
    from mcevidence_tpu.parallel.ring import sharded_grid_auto_evidence
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("dp", "ring"))
    chains = []
    for n in (700, 900, 801):       # 3 chains -> batch padded to 4
        theta, lnl = make_gaussian_chain(rng, n=n, ndim=3)
        chains.append((theta, lnl))
    out = sharded_grid_auto_evidence(chains, kmax=3, mesh=mesh2,
                                     prior_volumes=[1.0, 2.0, 1.0])
    assert out.shape == (3, 2)
    for i, (theta, lnl) in enumerate(chains):
        single = evidence_fn(theta, lnl, kmax=3, precision="fast",
                             engine="xla",
                             prior_volume=[1.0, 2.0, 1.0][i])
        np.testing.assert_allclose(out[i], single, atol=3e-3)


def test_sharded_device_refine(rng, mesh8):
    # multi-chip 'device' precision: sharded fused selection + double-float
    # refinement, scalars-only fetch — must match the host f64 refine oracle
    from mcevidence_tpu.parallel.ring import sharded_device_refine_evidence
    theta, lnl = make_gaussian_chain(rng, n=1003, ndim=4)
    w = rng.integers(1, 4, size=len(theta)).astype(float)
    single = evidence_fn(theta, lnl, weights=w, kmax=4, precision="refine",
                         engine="xla")
    multi = sharded_device_refine_evidence(theta, lnl, w, kmax=4,
                                           mesh=mesh8, engine="xla")
    np.testing.assert_allclose(multi, single, atol=1e-8)


def test_sharded_device_refine_cross(rng, mesh8):
    from mcevidence_tpu.parallel.ring import sharded_device_refine_evidence
    theta, lnl = make_gaussian_chain(rng, n=1600, ndim=3)
    s1, l1 = theta[:901], lnl[:901]
    single = evidence_fn(s1, l1, samples2=theta[901:], kmax=3,
                         precision="refine", engine="xla")
    multi = sharded_device_refine_evidence(s1, l1, samples2=theta[901:],
                                           kmax=3, mesh=mesh8, engine="xla")
    np.testing.assert_allclose(multi, single, atol=1e-8)


def test_grid_device_refine_matches_oracle(rng):
    """dp x ring device-resident parity path: batched chains, double-float
    refinement on device, scalars-only fetch."""
    from mcevidence_tpu.parallel.ring import (
        sharded_grid_device_refine_evidence)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("dp", "ring"))
    pvs = [1.0, 2.0, 0.5]
    chains = []
    for i, (n, d) in enumerate([(1100, 3), (700, 4), (1500, 3)]):
        th, lnl = make_gaussian_chain(np.random.default_rng(50 + i),
                                      n=n, ndim=d)
        w = np.random.default_rng(60 + i).integers(1, 4, size=n)
        chains.append((th, lnl, w.astype(float)))
    got = sharded_grid_device_refine_evidence(
        chains, kmax=3, prior_volumes=pvs, mesh=mesh2, engine="xla")
    assert got.shape == (3, 2)
    for i, (th, lnl, w) in enumerate(chains):
        want = evidence_fn(th, lnl, weights=w, kmax=3, prior_volume=pvs[i],
                           engine="xla")
        np.testing.assert_allclose(got[i], want, rtol=0, atol=1e-8)


def test_grid_device_refine_importance_sumw(rng):
    from mcevidence_tpu.parallel.ring import (
        sharded_grid_device_refine_evidence)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("dp", "ring"))
    th, lnl = make_gaussian_chain(rng, n=900, ndim=3)
    w = np.ones(900)
    got = sharded_grid_device_refine_evidence(
        [(th, lnl, w)], kmax=2, mesh=mesh2, engine="xla",
        sum_adjusted_weights=[2.0 * w.sum()])
    want = evidence_fn(th, lnl, weights=w, kmax=2, engine="xla",
                       sum_adjusted_weights=2.0 * w.sum())
    np.testing.assert_allclose(got[0], want, rtol=0, atol=1e-8)


def test_grid_device_refine_cross(rng):
    from mcevidence_tpu.parallel.ring import (
        sharded_grid_device_refine_evidence)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("dp", "ring"))
    chains, refs = [], []
    for i, (n, m, d) in enumerate([(800, 600, 3), (500, 900, 4)]):
        th, lnl = make_gaussian_chain(np.random.default_rng(70 + i),
                                      n=n + m, ndim=d)
        chains.append((th[:n], lnl[:n]))
        refs.append(th[n:])
    got = sharded_grid_device_refine_evidence(
        chains, chains2=refs, kmax=3, mesh=mesh2, engine="xla")
    for i, ((th, lnl), r) in enumerate(zip(chains, refs)):
        want = evidence_fn(th, lnl, samples2=r, kmax=3, engine="xla")
        np.testing.assert_allclose(got[i], want, rtol=0, atol=1e-8)


def test_grid_device_refine_defer(rng):
    """defer=True returns a finalize callable whose result is identical to
    the eager call (the per-chain grid driver dispatches many chunks
    before fetching any)."""
    from mcevidence_tpu.parallel.ring import (
        sharded_grid_device_refine_evidence)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh2 = Mesh(devs, ("dp", "ring"))
    chains = []
    for i, (n, d) in enumerate([(900, 3), (650, 4)]):
        th, lnl = make_gaussian_chain(np.random.default_rng(70 + i),
                                      n=n, ndim=d)
        chains.append((th, lnl))
    eager = sharded_grid_device_refine_evidence(chains, kmax=3, mesh=mesh2,
                                                engine="xla")
    fin = sharded_grid_device_refine_evidence(chains, kmax=3, mesh=mesh2,
                                              engine="xla", defer=True)
    assert callable(fin)
    np.testing.assert_array_equal(fin(), eager)


# ---------------------------------------------------------------------------
# round-4 review fixes: tiny references, short chains, overflow fallback
# ---------------------------------------------------------------------------

def test_sharded_device_refine_tiny_reference(rng):
    """kmax > n_ref: the program must be built with kmax_eff (a raw kmax
    sliced past the argsort width -> trace-time IndexError before the
    round-4 fix); undefined columns come back NaN, defined ones match the
    single-device device path."""
    from mcevidence_tpu.ops.pipeline import device_refine_evidence
    from mcevidence_tpu.parallel.ring import sharded_device_refine_evidence
    th, lnl = make_gaussian_chain(rng, n=520, ndim=3)
    ref = th[:3]                                   # n_ref = 3 < kmax = 4
    got = sharded_device_refine_evidence(th, lnl, samples2=ref, kmax=4,
                                         engine="xla")
    want = device_refine_evidence(th, lnl, samples2=ref, kmax=4,
                                  engine="xla")
    assert got.shape == (3,)
    np.testing.assert_allclose(got, want, atol=1e-9, equal_nan=True)
    assert np.isfinite(got[:2]).all() and np.isnan(got[2])


def test_sharded_device_refine_overflow_falls_back(rng, monkeypatch,
                                                   caplog):
    """Non-finite double-float partials must fall back to the sharded
    refine path (before the fix they flowed into finalize as inf lnZ)."""
    import logging

    from mcevidence_tpu.parallel import ring
    th, lnl = make_gaussian_chain(rng, n=640, ndim=3)

    real_make = ring.make_sharded_device_refine

    def bad_make(*a, **k):
        real = real_make(*a, **k)

        def wrapped(*args):
            parts = np.asarray(real(*args), np.float64)
            parts[0, 0] = np.inf
            return parts
        return wrapped

    monkeypatch.setattr(ring, "make_sharded_device_refine", bad_make)
    with caplog.at_level(logging.WARNING,
                         logger="mcevidence_tpu.parallel.ring"):
        got = ring.sharded_device_refine_evidence(th, lnl, kmax=3,
                                                  engine="xla")
    want = evidence_fn(th, lnl, kmax=3, engine="xla")
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert any("double-float overflow" in r.message for r in caplog.records)


def test_grid_refine_short_chain_nan_row(rng):
    """One short chain (n_ref < kmax) in a refine batch must fill only its
    defined columns (rest NaN) instead of killing the whole batch with a
    broadcast error (round-4 review finding)."""
    from mcevidence_tpu.parallel.ring import sharded_grid_evidence_refine
    th1, lnl1 = make_gaussian_chain(rng, n=700, ndim=3)
    th2, lnl2 = make_gaussian_chain(rng, n=3, ndim=3)   # 3 rows < kmax=4
    out = sharded_grid_evidence_refine([(th1, lnl1), (th2, lnl2)], kmax=4)
    assert out.shape == (2, 3)
    assert np.isfinite(out[0]).all()
    want1 = evidence_fn(th1, lnl1, kmax=4, engine="xla")
    np.testing.assert_allclose(out[0], want1, atol=1e-9)
    assert np.isfinite(out[1, :1]).all() and np.isnan(out[1, 2])


def test_sharded_fast_small_n_returns_nan_not_inf(rng):
    """Fast-path wrappers with n (or n_ref) < kmax: columns beyond the last
    real neighbour are NaN, never a silent +inf lnZ."""
    from mcevidence_tpu.parallel.ring import sharded_cross_evidence
    th, lnl = make_gaussian_chain(rng, n=3, ndim=2)
    out = sharded_auto_evidence(th, lnl, kmax=5, precision="fast")
    assert out.shape == (4,)
    assert not np.isinf(out).any()
    assert np.isnan(out[2:]).all()          # k=3,4 need n-1 >= 3
    big, lnlb = make_gaussian_chain(rng, n=500, ndim=2)
    outx = sharded_cross_evidence(big, lnlb, th[:2], kmax=5,
                                  precision="fast")
    assert not np.isinf(outx).any()
    assert np.isnan(outx[2:]).all()         # cross col c needs n2 >= c+1


def test_sharded_device_refine_wide_ndim_falls_back(rng, caplog):
    """ndim > DEVICE_NDIM_MAX must route to the sharded refine path."""
    import logging

    th = rng.normal(size=(400, 17))
    lnl = -0.5 * np.sum(th * th, axis=1)
    from mcevidence_tpu.parallel.ring import sharded_device_refine_evidence
    with caplog.at_level(logging.INFO,
                         logger="mcevidence_tpu.parallel.ring"):
        got = sharded_device_refine_evidence(th, lnl, kmax=2, engine="xla")
    want = sharded_auto_evidence(th, lnl, kmax=2, precision="refine")
    np.testing.assert_allclose(got, want, atol=1e-12)
    assert any("falling back to the sharded refine path" in r.message
               for r in caplog.records)
