"""Measure the small-d per-coordinate VPU kernel vs the packed MXU kernel.

VERDICT r2 experiment: at d=8 the 128-lane MXU distance matmul is ~94% zero
padding; `knn_select_pallas_smalld` replaces it with d broadcast
(q_j - r_j)^2 VPU sweeps.  Timing methodology as bench.py: REPS perturbed
runs inside one jitted lax.scan, scalar fetch (the axon relay dispatches
async and memoizes identical calls).

Usage: python scripts/bench_smalld.py [N] [d] [k ...]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from mcevidence_tpu.ops.knn_pallas import (knn_select_pallas_packed,
                                               knn_select_pallas_smalld)
    from mcevidence_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    ks = [int(a) for a in sys.argv[3:]] or [1, 5, 9]
    REPS = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)

    def scanned(sel, k):
        @jax.jit
        def run(x):
            def body(carry, i):
                d2, idx = sel(x + (1e-6 * i).astype(x.dtype), x, k,
                              self_mode=True)
                return carry + d2[0, k - 1], idx[0, 0]
            tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(REPS, dtype=jnp.float32))
            return tot
        return run

    print(f"N={n} d={d} reps={REPS}  (ms/rep, Gpairs/s)")
    for name, sel in (("packed", knn_select_pallas_packed),
                      ("smalld", knn_select_pallas_smalld)):
        for k in ks:
            run = scanned(sel, k)
            float(run(x))                       # compile + warm
            t0 = time.perf_counter()
            float(run(x))
            dt = (time.perf_counter() - t0) / REPS
            print(f"  {name} k={k}: {dt * 1e3:7.1f} ms  "
                  f"{n * n / dt / 1e9:6.1f} G/s")


if __name__ == "__main__":
    main()
