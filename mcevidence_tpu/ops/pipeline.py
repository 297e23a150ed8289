"""Fused single-jit evidence pipeline (production fast path).

One device program: masked-moment whitening -> MXU kNN selection -> fused
log-space estimator.  Everything stays in f32 on device; the host only sees
the final (kmax,) MLE row.  Sample counts are padded to compile buckets
(ops/knn.py) with the true count as a runtime scalar, so one compile serves
every chain in a bucket — essential when compiles cost minutes.

This is the "speed mode" counterpart of the facade's default refine path
(host f64 whitening + f64 candidate refinement); same estimator semantics
(reference MCEvidence.py:950-1168), f32 accuracy (~1e-3 in ln Z).
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from .estimator import log_ball_volume_const
from .knn import bucket_size


def _masked_whiten(samples, valid):
    """Whitening from masked moments: padded rows excluded from the
    covariance; rotation applied to all rows (pads are trimmed later)."""
    w = valid[:, None]
    n = jnp.sum(valid)
    sx = jnp.sum(samples * w, axis=0)
    sxx = jnp.dot((samples * w).T, samples,
                  precision=jax.lax.Precision.HIGHEST)
    mean = sx / n
    cov = (sxx - n * jnp.outer(mean, mean)) / (n - 1.0)
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    posdef = jnp.all(eigvals > 0)
    safe = jnp.where(eigvals > 0, eigvals, 1.0)
    log_j = jnp.where(posdef, 0.5 * jnp.sum(jnp.log(safe)), 0.0)
    white = jnp.where(
        posdef,
        jnp.dot(samples, eigvecs,
                precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(safe),
        samples)
    return white, log_j


@functools.partial(jax.jit, static_argnames=("kmax", "ndim", "engine"))
def fused_auto_evidence(samples, lnlike, weights, valid, n_true,
                        log_prior_volume, *, kmax: int, ndim: int,
                        engine: str = "pallas"):
    """Jitted auto-evidence on padded arrays.

    Args:
      samples: (Np, ndim) f32, padded rows zero.
      lnlike:  (Np,) f32, padded rows very negative (contribute exp -> 0).
      weights: (Np,) f32, padded rows 1 (only divide; masked elsewhere).
      valid:   (Np,) f32 0/1 mask.
      n_true:  runtime scalar — true sample count.
      log_prior_volume: runtime scalar.

    Returns (kmax,) MLE row (column 0 unused — quirk Q2 layout).
    """
    white, log_j = _masked_whiten(samples, valid)
    if engine.startswith("pallas"):
        from .knn_pallas import (knn_select_pallas, knn_select_pallas_binned,
                                 knn_select_pallas_packed)
        # fast mode consumes the selection distances directly, so the
        # default dispatch keeps the exact (unquantized) kernels; packed is
        # opt-in here (its <= 2^-12 quantization is within fast-mode's f32
        # envelope but not free).
        sel = {"pallas_binned": knn_select_pallas_binned,
               "pallas_packed": knn_select_pallas_packed}.get(
                   engine, knn_select_pallas)
        d2, _ = sel(white, white, kmax, self_mode=True, nr=n_true)
    else:
        from .knn import knn_select_xla
        d2, _ = knn_select_xla(white, white, kmax, self_mode=True,
                               nr=n_true)

    lnl_max = jnp.max(jnp.where(valid > 0, lnlike, -jnp.inf))
    fs = lnlike - lnl_max
    log_c = log_ball_volume_const(ndim)
    log_d2 = jnp.where(d2 > 0, jnp.log(jnp.where(d2 > 0, d2, 1.0)), -jnp.inf)
    log_terms = (log_c + 0.5 * ndim * log_d2
                 + (fs - jnp.log(weights))[:, None])
    log_terms = jnp.where(valid[:, None] > 0, log_terms, -jnp.inf)
    m = jnp.max(log_terms, axis=0)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    log_dotp = m_safe + jnp.log(jnp.sum(jnp.exp(log_terms - m_safe), axis=0))
    sum_w = jnp.sum(weights * valid)
    k_idx = jnp.arange(kmax)
    log_amax = log_dotp - jnp.log(n_true * k_idx + 1.0)
    mle = jnp.log(sum_w) + log_amax + log_j + lnl_max - log_prior_volume
    return jnp.where(k_idx < 1, 0.0, mle)


def fast_auto_evidence(samples: np.ndarray, lnlike: np.ndarray,
                       weights: Optional[np.ndarray] = None, *,
                       kmax: int = 5, prior_volume: float = 1.0,
                       sum_adjusted_weights: Optional[float] = None,
                       engine: str = "auto") -> np.ndarray:
    """Host wrapper: bucket-pad, run the fused program, return k=1..kmax-1.

    ``sum_adjusted_weights``: importance-adjusted SumW override (quirk Q7);
    applied as a log-shift since only SumW differs from sum(weights).
    """
    kmax = max(2, kmax)
    n, ndim = samples.shape
    if weights is None:
        weights = np.ones(n)
    if engine == "auto":
        engine = "pallas" if jax.default_backend() == "tpu" else "xla"
    nb = bucket_size(n)
    s = np.zeros((nb, ndim), np.float32)
    s[:n] = samples
    lnl = np.full(nb, -1e30, np.float32)
    lnl[:n] = lnlike
    w = np.ones(nb, np.float32)
    w[:n] = weights
    valid = np.zeros(nb, np.float32)
    valid[:n] = 1.0
    mle = fused_auto_evidence(
        jnp.asarray(s), jnp.asarray(lnl), jnp.asarray(w), jnp.asarray(valid),
        jnp.asarray(n, jnp.int32), jnp.asarray(np.log(prior_volume),
                                               jnp.float32),
        kmax=kmax, ndim=ndim, engine=engine)
    mle = np.asarray(mle, np.float64)
    if sum_adjusted_weights is not None:
        mle = mle + (np.log(sum_adjusted_weights)
                     - np.log(float(np.sum(weights))))
        mle[0] = 0.0
    return mle[1:]
