"""Whitening tests: correctness vs numpy, degenerate covariance handling
(reference MCEvidence.py:842-947)."""

import numpy as np
import pytest

from mcevidence_tpu.ops.whiten import (apply_whiten, covariance, whiten_jnp,
                                       whiten_moments, whiten_stats)


def test_whiten_unit_covariance(rng):
    x = rng.normal(size=(3000, 4)) @ rng.normal(size=(4, 4)) + [1, 2, 3, 4]
    stats = whiten_stats(x)
    assert stats.posdef
    w = apply_whiten(x, stats)
    np.testing.assert_allclose(np.cov(w.T), np.eye(4), atol=1e-10)
    # Jacobian = sqrt(det C)
    np.testing.assert_allclose(stats.log_jacobian,
                               0.5 * np.linalg.slogdet(covariance(x))[1],
                               rtol=1e-12)


def test_whiten_preserves_knn_distances_vs_reference_transform(rng):
    # distances after OUR eigh whitening == distances after the reference's
    # eig-based transform (orthogonal equivalence; SURVEY.md §7)
    x = rng.normal(size=(500, 3)) * [1.0, 5.0, 0.2]
    stats = whiten_stats(x)
    w1 = apply_whiten(x, stats)
    ev, evec = np.linalg.eig(np.cov(x.T))      # the reference's decomposition
    w2 = (x @ evec) / np.sqrt(ev)
    d1 = np.linalg.norm(w1[:50, None] - w1[None, :50], axis=-1)
    d2 = np.linalg.norm(w2[:50, None] - w2[None, :50], axis=-1)
    np.testing.assert_allclose(d1, d2, atol=1e-9)


def test_degenerate_constant_column(rng):
    # a constant parameter column => zero eigenvalue: the reference would
    # crash on math.log(0); here the warn-and-skip path applies (J=1).
    x = rng.normal(size=(200, 3))
    x[:, 1] = 7.0
    stats = whiten_stats(x)
    assert not stats.posdef
    assert stats.log_jacobian == 0.0
    np.testing.assert_array_equal(apply_whiten(x, stats), x)   # no-op


def test_whiten_jnp_matches_host(rng):
    import jax.numpy as jnp
    x = rng.normal(size=(1000, 3)) * [1.0, 2.0, 0.5]
    stats = whiten_stats(x)
    w_host = apply_whiten(x, stats)
    w_dev, log_j, posdef = whiten_jnp(jnp.asarray(x, jnp.float64)
                                      if False else jnp.asarray(x))
    assert bool(posdef)
    np.testing.assert_allclose(float(log_j), stats.log_jacobian, rtol=1e-4)
    # distances (not coordinates) are the invariant quantity
    d_host = np.linalg.norm(w_host[:20, None] - w_host[None, :20], axis=-1)
    wd = np.asarray(w_dev)
    d_dev = np.linalg.norm(wd[:20, None] - wd[None, :20], axis=-1)
    np.testing.assert_allclose(d_dev, d_host, atol=1e-3)


def test_whiten_moments_matches_cov(rng):
    import jax.numpy as jnp
    x = rng.normal(size=(400, 3)) + [5.0, -2.0, 0.0]
    cov = np.asarray(whiten_moments(jnp.asarray(x)))
    np.testing.assert_allclose(cov, np.cov(x.T), rtol=1e-5, atol=1e-6)


def test_whiten_stats_single_row_degenerate():
    """One row: np.cov is NaN (0/0); must warn-and-skip, not LinAlgError."""
    from mcevidence_tpu.ops.whiten import whiten_stats
    stats = whiten_stats(np.array([[1.0, 2.0, 3.0]]))
    assert not stats.posdef
    assert stats.log_jacobian == 0.0
