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

    # Sub-block each ring hop: the (nq_loc, nr_loc) distance tile would be
    # O(N^2/P^2) memory — fine for a big ring, fatal for small P (a single
    # chip at P=1 would materialize N x N).  A scan over SUB columns keeps
    # the live tile at (nq_loc, SUB) for any shard size.
    SUB = min(2048, nr_loc)
    pad_r = (-nr_loc) % SUB
    nsub = (nr_loc + pad_r) // SUB
    kb = min(k, SUB)

    def step(s, carry):
        run_negd2, run_idx, r_buf = carry
        # shard visiting us at step s originated on device (p - s) mod P
        src = jax.lax.rem(p_idx - s + p_num, p_num)
        offset = src * nr_loc
        rp = (jnp.concatenate(
            [r_buf, jnp.zeros((pad_r, r_buf.shape[1]), r_buf.dtype)])
            if pad_r else r_buf).reshape(nsub, SUB, -1)

        def sub(carry2, inp):
            run_negd2, run_idx = carry2
            blk_id, rblk = inp
            r_sq = jnp.sum(rblk * rblk, axis=1)[None, :]
            d2 = q_sq + r_sq - 2.0 * jnp.dot(
                q, rblk.T, precision=jax.lax.Precision.HIGHEST)
            lcol = blk_id * SUB + jnp.arange(SUB, dtype=jnp.int32)[None, :]
            gcol = offset + lcol
            d2 = jnp.where((lcol < nr_loc) & (gcol < n_global), d2, jnp.inf)
            if self_mode:
                d2 = jnp.where(gcol == qrow, -1.0, d2)
            neg_blk, loc = jax.lax.top_k(-d2, kb)
            blk_idx = jnp.take_along_axis(
                jnp.broadcast_to(gcol, d2.shape), loc, axis=1)
            cat_neg = jnp.concatenate([run_negd2, neg_blk], axis=1)
            cat_idx = jnp.concatenate([run_idx, blk_idx], axis=1)
            run_negd2, pos = jax.lax.top_k(cat_neg, k)
            run_idx = jnp.take_along_axis(cat_idx, pos, axis=1)
            return (run_negd2, run_idx), None

        (run_negd2, run_idx), _ = jax.lax.scan(
            sub, (run_negd2, run_idx),
            (jnp.arange(nsub, dtype=jnp.int32), rp))
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


def _reduce_mle(dknn2, lnlike, weights, valid, log_j, *, kmax, n_global,
                ndim, log_prior_volume, k_start, axis):
    """Distributed fused log-space reduction (ops/estimator.py semantics,
    psum/pmax across shards)."""
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
    k_nn = k_idx if k_start == 1 else k_idx + 1                 # quirk Q2 layout
    log_amax = log_dotp - jnp.log(n_global * k_nn + 1.0)
    mle = (jnp.log(sum_w) + log_amax + log_j + lnl_max - log_prior_volume)
    return jnp.where(k_idx < k_start, 0.0, mle)


def _evidence_step_local(samples, lnlike, weights, valid, *, kmax: int,
                         n_global: int, ndim: int, log_prior_volume: float,
                         axis: str):
    """SPMD auto-evidence for a chain shard (runs under shard_map)."""
    white, log_j, _ = _whiten_local(samples, valid, axis)
    dknn2, _ = _ring_knn_local(white, white, kmax, axis, n_global,
                               self_mode=True)
    return _reduce_mle(dknn2, lnlike, weights, valid, log_j, kmax=kmax,
                       n_global=n_global, ndim=ndim,
                       log_prior_volume=log_prior_volume, k_start=1,
                       axis=axis)


def _cross_evidence_step_local(s1, lnl1, w1, valid1, s2, valid2, *,
                               kmax: int, n1_global: int, n2_global: int,
                               ndim: int, log_prior_volume: float,
                               axis: str):
    """SPMD cross-evidence: NN of s1 shards searched in rotating s2 shards
    (reference split mode, MCEvidence.py:1073-1096; k0=0 semantics).

    Whitening uses the covariance of ALL samples (covtype='all', quirk Q1):
    moments of s1 and s2 are psum-combined before the eigh.
    """
    # combined moments over both partitions
    m1 = valid1[:, None]
    m2 = valid2[:, None]
    n = jax.lax.psum(jnp.sum(valid1) + jnp.sum(valid2), axis)
    sx = jax.lax.psum(jnp.sum(s1 * m1, axis=0) + jnp.sum(s2 * m2, axis=0),
                      axis)
    sxx = jax.lax.psum(
        jnp.dot((s1 * m1).T, s1, precision=jax.lax.Precision.HIGHEST)
        + jnp.dot((s2 * m2).T, s2, precision=jax.lax.Precision.HIGHEST),
        axis)
    mean = sx / n
    cov = (sxx - n * jnp.outer(mean, mean)) / (n - 1.0)
    eigvals, eigvecs = jnp.linalg.eigh(cov)
    posdef = jnp.all(eigvals > 0)
    safe = jnp.where(eigvals > 0, eigvals, 1.0)
    log_j = jnp.where(posdef, 0.5 * jnp.sum(jnp.log(safe)), 0.0)
    rot = functools.partial(jnp.dot, precision=jax.lax.Precision.HIGHEST)
    w1s = jnp.where(posdef, rot(s1, eigvecs) / jnp.sqrt(safe), s1)
    w2s = jnp.where(posdef, rot(s2, eigvecs) / jnp.sqrt(safe), s2)
    dknn2, _ = _ring_knn_local(w1s, w2s, kmax, axis, n2_global,
                               self_mode=False)
    return _reduce_mle(dknn2, lnl1, w1, valid1, log_j, kmax=kmax,
                       n_global=n1_global, ndim=ndim,
                       log_prior_volume=log_prior_volume, k_start=0,
                       axis=axis)


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


def make_sharded_cross_evidence(mesh: Mesh, axis: str = "ring", *, kmax: int,
                                n1_global: int, n2_global: int, ndim: int,
                                log_prior_volume: float = 0.0):
    """Build the jitted multi-chip cross-evidence program for a mesh.

    Takes shard-major padded arrays (s1 (N1p, d), lnl1, w1, valid1,
    s2 (N2p, d), valid2) and returns the (kmax,) MLE row with k0=0 columns
    (caller slices [1:], preserving quirk Q2)."""
    from jax.experimental.shard_map import shard_map

    body = functools.partial(
        _cross_evidence_step_local, kmax=kmax, n1_global=n1_global,
        n2_global=n2_global, ndim=ndim, log_prior_volume=log_prior_volume,
        axis=axis)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis), P(axis), P(axis),
                  P(axis, None), P(axis)),
        out_specs=P(),
        check_rep=False)
    return jax.jit(sharded)


def sharded_cross_evidence(samples1: np.ndarray, lnlike1: np.ndarray,
                           samples2: np.ndarray,
                           weights1: Optional[np.ndarray] = None,
                           *, kmax: int = 5, prior_volume: float = 1.0,
                           mesh: Optional[Mesh] = None,
                           dtype=jnp.float32) -> np.ndarray:
    """Multi-device cross evidence (same contract as ``evidence_fn`` with
    ``samples2``): returns ln Z for k = 1..kmax-1."""
    kmax = max(2, kmax)
    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs, ("ring",))
    axis = mesh.axis_names[0]
    pcount = mesh.devices.size
    n1, ndim = samples1.shape
    n2 = samples2.shape[0]
    s1, lnl1, w1, valid1 = pad_for_mesh(samples1, lnlike1, weights1, pcount)
    npad2 = (-n2) % pcount
    s2 = np.concatenate([samples2, np.zeros((npad2, ndim))], axis=0)
    valid2 = np.concatenate([np.ones(n2), np.zeros(npad2)])
    fn = make_sharded_cross_evidence(
        mesh, axis, kmax=kmax, n1_global=n1, n2_global=n2, ndim=ndim,
        log_prior_volume=math.log(prior_volume))
    sh1 = NamedSharding(mesh, P(axis))
    sh2 = NamedSharding(mesh, P(axis, None))
    args = (jax.device_put(jnp.asarray(s1, dtype), sh2),
            jax.device_put(jnp.asarray(lnl1, dtype), sh1),
            jax.device_put(jnp.asarray(w1, dtype), sh1),
            jax.device_put(jnp.asarray(valid1, dtype), sh1),
            jax.device_put(jnp.asarray(s2, dtype), sh2),
            jax.device_put(jnp.asarray(valid2, dtype), sh1))
    mle = np.asarray(fn(*args))
    return mle[1:]


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


# ---------------------------------------------------------------------------
# 2-D mesh: data-parallel over chains x ring over samples
# ---------------------------------------------------------------------------

_GRID_PROGRAM_CACHE: dict = {}


def make_sharded_grid_evidence(mesh: Mesh, axes=("dp", "ring"), *, kmax: int,
                               ndim: int):
    """Build the jitted 2-D-mesh program: a BATCH of chains, sharded over the
    ``dp`` axis (the embarrassing model x dataset grid axis the reference
    used MPI ranks for), each chain's samples ring-sharded over ``ring``.

    Takes stacked padded arrays (B, Np, d) / (B, Np) ... plus per-chain
    true counts (B,) and log prior volumes (B,); returns (B, kmax) MLE rows.
    B must be a multiple of the dp axis size; Np of the ring axis size.
    """
    from jax.experimental.shard_map import shard_map

    dp, ring = axes
    # one jitted program per (mesh, kmax, ndim): rebuilding the shard_map
    # closure per call would defeat JAX's jit cache and recompile
    # identical-shape programs on every dataset.
    key = (tuple(d.id for d in mesh.devices.flat), tuple(mesh.axis_names),
           axes, kmax, ndim)
    cached = _GRID_PROGRAM_CACHE.get(key)
    if cached is not None:
        return cached

    def single(s, lnl, w, v, n_glob, log_pv, sumw_shift):
        mle = _evidence_step_local(
            s, lnl, w, v, kmax=kmax, n_global=n_glob, ndim=ndim,
            log_prior_volume=log_pv, axis=ring)
        # importance reweighting enters only through SumW (quirk Q7):
        # applied as a per-chain log shift ln(SumW_adj / SumW).
        k_idx = jnp.arange(kmax)
        return jnp.where(k_idx < 1, mle, mle + sumw_shift)

    batched = jax.vmap(single, in_axes=(0, 0, 0, 0, 0, 0, 0))
    sharded = shard_map(
        batched, mesh=mesh,
        in_specs=(P(dp, ring, None), P(dp, ring), P(dp, ring), P(dp, ring),
                  P(dp), P(dp), P(dp)),
        out_specs=P(dp),
        check_rep=False)
    fn = jax.jit(sharded)
    _GRID_PROGRAM_CACHE[key] = fn
    return fn


def sharded_grid_auto_evidence(chains, *, kmax: int = 2,
                               prior_volumes=None,
                               sumw_log_shifts=None,
                               mesh: Optional[Mesh] = None,
                               dtype=jnp.float32) -> np.ndarray:
    """Auto evidence for MANY chains in one SPMD program.

    ``chains``: sequence of (samples, lnlike[, weights]) tuples (or dicts
    with those keys).  All chains are padded to a common bucketed length and
    the batch is padded to the dp axis size; padding chains/rows never
    contribute.  Returns (len(chains), kmax-1) ln Z values.
    """
    from ..ops.knn import bucket_size

    from ..utils.cache import enable_compilation_cache
    enable_compilation_cache()
    kmax = max(2, kmax)
    if mesh is None:
        devs = np.array(jax.devices())
        mesh = Mesh(devs.reshape(1, -1), ("dp", "ring"))
    dp_n = mesh.shape["dp"]
    ring_n = mesh.shape["ring"]

    norm = []
    for c in chains:
        if isinstance(c, dict):
            s = np.asarray(c["samples"], np.float64)
            l = np.asarray(c["loglikes"], np.float64)
            w = np.asarray(c.get("weights", np.ones(len(s))), np.float64)
        else:
            s = np.asarray(c[0], np.float64)
            l = np.asarray(c[1], np.float64)
            w = (np.asarray(c[2], np.float64) if len(c) > 2
                 else np.ones(len(s)))
        norm.append((s, l, w))
    b_true = len(norm)
    ndim = norm[0][0].shape[1]
    if prior_volumes is None:
        prior_volumes = np.ones(b_true)

    n_pad = bucket_size(max(s.shape[0] for s, _, _ in norm))
    n_pad = ((n_pad + ring_n - 1) // ring_n) * ring_n
    # bucket the batch axis too (next power of two, then dp-divisible):
    # every distinct (B, Np, d) is its own multi-minute remote compile.
    b_pad = 1
    while b_pad < b_true:
        b_pad *= 2
    b_pad = ((b_pad + dp_n - 1) // dp_n) * dp_n

    S = np.zeros((b_pad, n_pad, ndim))
    L = np.full((b_pad, n_pad), -1e30)
    W = np.ones((b_pad, n_pad))
    V = np.zeros((b_pad, n_pad))
    NG = np.ones(b_pad)
    LPV = np.zeros(b_pad)
    SWS = np.zeros(b_pad)
    if sumw_log_shifts is not None:
        SWS[:b_true] = np.asarray(sumw_log_shifts, np.float64)
    for i, (s, l, w) in enumerate(norm):
        n = s.shape[0]
        S[i, :n] = s
        L[i, :n] = l
        W[i, :n] = w
        V[i, :n] = 1.0
        NG[i] = n
        LPV[i] = math.log(prior_volumes[i])
    # padding chains: one fake valid row so reductions stay finite
    for i in range(b_true, b_pad):
        V[i, 0] = 1.0
        L[i, 0] = 0.0

    fn = make_sharded_grid_evidence(mesh, ("dp", "ring"), kmax=kmax,
                                    ndim=ndim)
    sh3 = NamedSharding(mesh, P("dp", "ring", None))
    sh2 = NamedSharding(mesh, P("dp", "ring"))
    sh1 = NamedSharding(mesh, P("dp"))
    args = (jax.device_put(jnp.asarray(S, dtype), sh3),
            jax.device_put(jnp.asarray(L, dtype), sh2),
            jax.device_put(jnp.asarray(W, dtype), sh2),
            jax.device_put(jnp.asarray(V, dtype), sh2),
            jax.device_put(jnp.asarray(NG, dtype), sh1),
            jax.device_put(jnp.asarray(LPV, dtype), sh1),
            jax.device_put(jnp.asarray(SWS, dtype), sh1))
    mle = np.asarray(fn(*args))
    return mle[:b_true, 1:]
