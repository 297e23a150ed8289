"""Merge-cadence experiment measurement (VERDICT r4 item 7).

Times the shipped packed kernel against the packed2 variant (two ref
tiles per grid invocation: one k-pass extraction + one running-top-k
merge per 4096 reference rows instead of two per 2048) over k = 1/5/9,
scan-amortized with per-rep input perturbation (relay memoization).

Usage: python scripts/bench_packed2.py [N] [reps]
Writes one human table; transcribe the result into docs/KERNEL_NOTES.md
(kept or closed either way — the point is the measurement).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mcevidence_tpu.ops import knn_pallas as kp  # noqa: E402
from mcevidence_tpu.utils.cache import enable_compilation_cache  # noqa: E402


def time_kernel(fn, x, k, reps):
    """Scan-amortized wall per rep: REPS perturbed selections chained in one
    jitted program, fetched via one scalar (relay: dispatch returns before
    execution; identical dispatches memoize)."""

    @jax.jit
    def run(x0):
        def body(carry, i):
            xi = x0 + (1e-6 * i).astype(x0.dtype)
            d2, idx = fn(xi, xi, k)
            return carry + jnp.sum(d2[:, -1]) + jnp.sum(idx[:, -1]), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(reps, dtype=jnp.float32))
        return tot

    float(run(x))                       # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / reps


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    d = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    print(f"backend={jax.default_backend()} N={n} d={d} reps={reps}")
    print(f"{'k':>3} {'packed ms':>10} {'packed2 ms':>10} {'speedup':>8}")
    for k in (1, 5, 9):
        tp = time_kernel(
            lambda q, r, kk=k: kp.knn_select_pallas_packed(
                q, r, kk, self_mode=True), x, k, reps)
        t2 = time_kernel(
            lambda q, r, kk=k: kp.knn_select_pallas_packed2(
                q, r, kk, self_mode=True), x, k, reps)
        print(f"{k:>3} {tp * 1e3:>10.2f} {t2 * 1e3:>10.2f} {tp / t2:>7.2f}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
