"""Merge-cadence + query-tile sweep (round 5, follows the packed2 win).

Sweeps (n_tiles, tq) over the generalized packedn kernel at the bench
workload shape.  packed2 == (2, 256) is the shipped default; wider
cadences cost one mantissa bit per doubling (adoption of n_tiles=4
still fits the refine guard: 2^-10 d2 quantization => 2^-11 distance,
inside the 2^-10 margin; n_tiles=8 EQUALS the margin — measure-only).

Usage: python scripts/bench_packedn.py [N] [reps]
Transcribe into docs/KERNEL_NOTES.md; adopt only on a measured win.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from mcevidence_tpu.ops import knn_pallas as kp  # noqa: E402
from mcevidence_tpu.utils.cache import enable_compilation_cache  # noqa: E402

CONFIGS = ((2, 256), (2, 512), (4, 128), (4, 256))


def time_kernel(fn, x, reps):
    @jax.jit
    def run(x0):
        def body(carry, i):
            xi = x0 + (1e-6 * i).astype(x0.dtype)
            d2, idx = fn(xi, xi)
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    d = 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    print(f"backend={jax.default_backend()} N={n} d={d} reps={reps}")
    print(f"{'k':>3} {'n_tiles':>8} {'tq':>5} {'ms/rep':>8} {'vs (2,256)':>10}")
    for k in (1, 5):
        base = None
        for nt, tq in CONFIGS:
            try:
                t = time_kernel(
                    lambda q, r, _nt=nt, _tq=tq: kp.knn_select_pallas_packedn(
                        q, r, k, n_tiles=_nt, tq=_tq, self_mode=True),
                    x, reps)
            except Exception as exc:    # VMEM overflow configs fail compile
                print(f"{k:>3} {nt:>8} {tq:>5}   FAILED: "
                      f"{type(exc).__name__}", flush=True)
                continue
            if base is None:
                base = t
            print(f"{k:>3} {nt:>8} {tq:>5} {t * 1e3:>8.2f} "
                  f"{base / t:>9.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
