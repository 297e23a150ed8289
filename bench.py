"""Benchmark: TPU evidence wall-clock vs the reference's CPU (sklearn) path.

Workload: auto evidence on a synthetic Planck-sized chain (N=65536, d=8,
kmax=5) — the same shape class as the largest Planck full-grid chains
(~6k-99k rows x 6-8 params, BASELINE.md).  We time the device pipeline
(whiten + MXU kNN selection + fused estimator) end to end and compare with
the sklearn + numpy float64 baseline implementing the reference call stack
(NearestNeighbors.kneighbors + the python estimator loop,
reference MCEvidence.py:1093-1131) on this host's CPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
value   = NN pairs/sec/chip achieved by the TPU path
vs_baseline = sklearn CPU wall-clock / TPU wall-clock (same workload)
plus auxiliary fields (wall-clocks, parity |dlnZ| vs the float64 oracle).
"""

import json
import math
import time

import numpy as np


def synthetic_chain(n, ndim, seed=0):
    rng = np.random.default_rng(seed)
    mean = np.arange(1.0, ndim + 1.0)
    sigma = np.full(ndim, 0.05)
    theta = rng.normal(mean, sigma, size=(n, ndim))
    dm = (theta - mean) / sigma
    lnl = (-0.5 * np.sum(dm * dm, axis=1)
           - 0.5 * ndim * np.log(2 * np.pi) - np.sum(np.log(sigma)))
    return theta, lnl


def sklearn_reference(theta, lnl, kmax):
    """The reference's estimator: sklearn kNN + float64 numpy formula."""
    from sklearn.neighbors import NearestNeighbors
    import scipy.special as sp
    n, ndim = theta.shape
    cov = np.cov(theta.T)
    ev, evec = np.linalg.eigh(cov)
    jac = math.sqrt(np.linalg.det(cov))
    s = (theta @ evec) / np.sqrt(ev)
    D, _ = NearestNeighbors(n_neighbors=kmax + 1, n_jobs=-1).fit(s).kneighbors(s)
    lmax = lnl.max()
    fs = np.exp(lnl - lmax)
    out = []
    for k in range(1, kmax):
        vol = math.pi ** (ndim / 2) * D[:, k] ** ndim / sp.gamma(1 + ndim / 2)
        amax = np.dot(vol, fs) / (n * k + 1.0)
        out.append(math.log(n * amax * jac) + lmax)
    return np.array(out)


def main():
    import jax
    import jax.numpy as jnp
    from mcevidence_tpu.ops.estimator import log_evidence_from_knn
    from mcevidence_tpu.ops.whiten import whiten_jnp

    N, NDIM, KMAX = 65536, 8, 5
    theta, lnl = synthetic_chain(N, NDIM)
    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    if on_tpu:
        from mcevidence_tpu.ops.knn_pallas import knn_select_pallas

        def select(w):
            return knn_select_pallas(w, w, KMAX, self_mode=True)
    else:
        from mcevidence_tpu.ops.knn import knn_select_xla

        def select(w):
            return knn_select_xla(w, w, KMAX, self_mode=True, block_size=2048)

    @jax.jit
    def evidence_step(samples, lnlike, weights):
        white, log_j, _ = whiten_jnp(samples)
        d2, _ = select(white)
        return log_evidence_from_knn(
            jnp.sqrt(d2), lnlike, weights, jnp.sum(weights), NDIM,
            log_jacobian=log_j, log_prior_volume=0.0, k_start=1)

    s32 = jnp.asarray(theta, jnp.float32)
    l32 = jnp.asarray(lnl, jnp.float32)
    w32 = jnp.ones(N, jnp.float32)

    # compile + warm-up
    mle = np.asarray(jax.block_until_ready(evidence_step(s32, l32, w32)))
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = evidence_step(s32, l32, w32)
    jax.block_until_ready(out)
    tpu_s = (time.perf_counter() - t0) / reps

    # CPU sklearn baseline (the reference's engine) on the same workload
    t0 = time.perf_counter()
    oracle = sklearn_reference(theta, lnl, KMAX)
    cpu_s = time.perf_counter() - t0

    pairs_per_s = N * N / tpu_s
    dlnz = float(np.max(np.abs(mle[1:] - oracle)))
    print(json.dumps({
        "metric": "nn_pairs_per_sec_per_chip",
        "value": pairs_per_s,
        "unit": "pairs/s",
        "vs_baseline": cpu_s / tpu_s,
        "tpu_wall_s": tpu_s,
        "sklearn_cpu_wall_s": cpu_s,
        "backend": backend,
        "workload": f"auto evidence N={N} d={NDIM} kmax={KMAX}",
        "max_abs_dlnz_vs_f64_oracle_fastpath": dlnz,
    }))


if __name__ == "__main__":
    main()
