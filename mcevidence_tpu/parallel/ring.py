"""Multi-chip evidence: ring-kNN over an ICI device mesh.

The O(N^2 d) pairwise sweep is the "attention-score"-shaped computation of
this framework (SURVEY.md §2.4): queries stay resident, reference-sample
shards rotate around the ring via ``lax.ppermute`` while every device merges
a running top-k for its query shard — structurally ring attention, with a
k-selection instead of a softmax accumulator.  Whitening statistics are
combined with ``psum`` moments and the final evidence reduction is a
``psum``-logsumexp, so a full multi-chip evidence estimate is ONE jitted
SPMD program with no host round-trips.

This replaces the reference's two parallelism layers — sklearn's n_jobs
thread pool inside kneighbors and the MPI rank-per-dataset driver
(reference MCEvidence.py:1093-1104, planck_mcevidence.py:149-168) — with
sharding that rides the ICI.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.estimator import log_ball_volume_const


def _ring_knn_local(q: jnp.ndarray, r: jnp.ndarray, k: int, axis: str,
                    n_global: int, self_mode: bool
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-device body: rotate ref shards around the ring, merge top-k.

    ``q``: (nq_loc, d) local query shard; ``r``: (nr_loc, d) local ref shard.
    Global row ids are shard-major (device p owns rows [p*loc, (p+1)*loc)).
    Rows with global id >= n_global are padding and never selected.
    In self mode the (global) diagonal pair is pinned to -1 => slot 0.
    """
    p_idx = jax.lax.axis_index(axis)
    p_num = jax.lax.axis_size(axis)
    nq_loc = q.shape[0]
    nr_loc = r.shape[0]
    k = min(k, nr_loc * p_num)

    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    qrow = p_idx * nq_loc + jnp.arange(nq_loc, dtype=jnp.int32)[:, None]
    perm = [(i, (i + 1) % p_num) for i in range(p_num)]

    def step(s, carry):
        run_negd2, run_idx, r_buf = carry
        # shard visiting us at step s originated on device (p - s) mod P
        src = jax.lax.rem(p_idx - s + p_num, p_num)
        offset = src * nr_loc
        r_sq = jnp.sum(r_buf * r_buf, axis=1)[None, :]
        d2 = q_sq + r_sq - 2.0 * jnp.dot(
            q, r_buf.T, precision=jax.lax.Precision.HIGHEST)
        gcol = offset + jnp.arange(nr_loc, dtype=jnp.int32)[None, :]
        d2 = jnp.where(gcol < n_global, d2, jnp.inf)
        if self_mode:
            d2 = jnp.where(gcol == qrow, -1.0, d2)
        neg_blk, loc = jax.lax.top_k(-d2, min(k, nr_loc))
        blk_idx = jnp.take_along_axis(jnp.broadcast_to(gcol, d2.shape), loc,
                                      axis=1)
        cat_neg = jnp.concatenate([run_negd2, neg_blk], axis=1)
        cat_idx = jnp.concatenate([run_idx, blk_idx], axis=1)
        run_negd2, pos = jax.lax.top_k(cat_neg, k)
        run_idx = jnp.take_along_axis(cat_idx, pos, axis=1)
        r_buf = jax.lax.ppermute(r_buf, axis, perm)
        return run_negd2, run_idx, r_buf

    init = (jnp.full((nq_loc, k), -jnp.inf, q.dtype),
            jnp.full((nq_loc, k), -1, jnp.int32), r)
    run_negd2, run_idx, _ = jax.lax.fori_loop(0, p_num, step, init)
    return jnp.maximum(-run_negd2, 0.0), run_idx


def _whiten_local(s: jnp.ndarray, n_real, axis: str):
    """Distributed whitening: psum moments -> replicated eigh -> local apply.

    ``n_real``: (nq_loc,) 0/1 mask of genuine (non-padding) rows.
    Returns (whitened local shard, log_jacobian, posdef).
    """
    w = n_real[:, None]
    n = jax.lax.psum(jnp.sum(n_real), axis)
    sx = jax.lax.psum(jnp.sum(s * w, axis=0), axis)
    sxx = jax.lax.psum(jnp.dot((s * w).T, s, precision=jax.lax.Precision.HIGHEST), axis)
    mean = sx / n
    cov = (sxx - n * jnp.outer(mean, mean)) / (n - 1.0)
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    posdef = jnp.all(eigvals > 0)
    safe = jnp.where(eigvals > 0, eigvals, 1.0)
    log_j = jnp.where(posdef, 0.5 * jnp.sum(jnp.log(safe)), 0.0)
    white = jnp.where(
        posdef,
        jnp.dot(s, eigvecs, precision=jax.lax.Precision.HIGHEST)
        / jnp.sqrt(safe), s)
    return white, log_j, posdef


def _evidence_step_local(samples, lnlike, weights, valid, *, kmax: int,
                         n_global: int, ndim: int, log_prior_volume: float,
                         axis: str):
    """SPMD evidence for an auto-mode chain shard (runs under shard_map)."""
    white, log_j, _ = _whiten_local(samples, valid, axis)
    dknn2, _ = _ring_knn_local(white, white, kmax, axis, n_global,
                               self_mode=True)
    # fused log-space reduction (ops/estimator.py), distributed via psum
    lnl_max = jax.lax.pmax(jnp.max(jnp.where(valid > 0, lnlike, -jnp.inf)),
                           axis)
    fs = lnlike - lnl_max
    log_c = log_ball_volume_const(ndim)
    log_d2 = jnp.where(dknn2 > 0, jnp.log(jnp.where(dknn2 > 0, dknn2, 1.0)),
                       -jnp.inf)
    log_terms = (log_c + 0.5 * ndim * log_d2
                 + (fs - jnp.log(weights))[:, None])
    log_terms = jnp.where(valid[:, None] > 0, log_terms, -jnp.inf)
    m = jax.lax.pmax(jnp.max(log_terms, axis=0), axis)          # (kmax,)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    sums = jax.lax.psum(jnp.sum(jnp.exp(log_terms - m_safe), axis=0), axis)
    log_dotp = m_safe + jnp.log(sums)
    sum_w = jax.lax.psum(jnp.sum(weights * valid), axis)
    k_idx = jnp.arange(kmax)
    log_amax = log_dotp - jnp.log(n_global * k_idx + 1.0)
    mle = (jnp.log(sum_w) + log_amax + log_j + lnl_max - log_prior_volume)
    return jnp.where(k_idx < 1, 0.0, mle)


def make_sharded_evidence(mesh: Mesh, axis: str = "ring", *, kmax: int,
                          n_global: int, ndim: int,
                          log_prior_volume: float = 0.0):
    """Build the jitted multi-chip auto-evidence program for a mesh.

    The returned function takes shard-major padded arrays
    (samples (Np, d), lnlike (Np,), weights (Np,), valid (Np,)) where
    Np = ceil(N / P) * P, and returns the (kmax,) MLE row (column 0 unused,
    matching the single-device estimator's layout).
    """
    from jax.experimental.shard_map import shard_map

    body = functools.partial(_evidence_step_local, kmax=kmax,
                             n_global=n_global, ndim=ndim,
                             log_prior_volume=log_prior_volume, axis=axis)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis)),
        out_specs=P(),
        check_rep=False)
    return jax.jit(sharded)


def pad_for_mesh(samples: np.ndarray, lnlike: np.ndarray,
                 weights: Optional[np.ndarray], n_devices: int):
    """Pad arrays to a multiple of the mesh size; returns (s, lnl, w, valid)."""
    n, d = samples.shape
    if weights is None:
        weights = np.ones(n)
    npad = (-n) % n_devices
    s = np.concatenate([samples, np.zeros((npad, d))], axis=0)
    lnl = np.concatenate([lnlike, np.full(npad, -1e30)])
    w = np.concatenate([weights, np.ones(npad)])
    valid = np.concatenate([np.ones(n), np.zeros(npad)])
    return s, lnl, w, valid


def sharded_auto_evidence(samples: np.ndarray, lnlike: np.ndarray,
                          weights: Optional[np.ndarray] = None,
                          *, kmax: int = 5, prior_volume: float = 1.0,
                          mesh: Optional[Mesh] = None,
                          dtype=jnp.float32) -> np.ndarray:
    """Multi-device auto evidence: convenience wrapper around the SPMD step.

    Returns ln Z for k = 1..kmax-1 (same contract as ``evidence_fn``).
    """
    kmax = max(2, kmax)
    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("ring",))
    axis = mesh.axis_names[0]
    pcount = mesh.devices.size
    n, ndim = samples.shape
    s, lnl, w, valid = pad_for_mesh(samples, lnlike, weights, pcount)
    fn = make_sharded_evidence(mesh, axis, kmax=kmax, n_global=n, ndim=ndim,
                               log_prior_volume=math.log(prior_volume))
    sharding = NamedSharding(mesh, P(axis))
    sharding2 = NamedSharding(mesh, P(axis, None))
    s = jax.device_put(jnp.asarray(s, dtype), sharding2)
    args = [jax.device_put(jnp.asarray(a, dtype), sharding)
            for a in (lnl, w, valid)]
    mle = fn(s, *args)
    return np.asarray(mle)[1:]
