"""Batched merge-cadence measurement at dp x ring GRID cell sizes.

The single-cell packed2 win (1.12-1.17x at N=32k-65k, KERNEL_NOTES) need
not transfer to the grid paths: Planck cells are 6k-99k rows but batched
GRID_BATCH_QUANTUM cells run at bucket heights ~8k-32k with B members per
dispatch, where per-invocation fixed costs amortize differently.  This
measures packed_batched vs packed2_batched at representative (B, N)
before any default switch.

Usage: python scripts/bench_packed2_batched.py [reps]
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

CONFIGS = ((4, 8192), (4, 32768))     # (B, bucket rows): typical grid cells
K = 6                                  # kmax=2 + pad_candidates=4 (serve/grid)
D = 8


def time_batched(fn, x, nr, reps):
    @jax.jit
    def run(x0):
        def body(carry, i):
            xi = x0 + (1e-6 * i).astype(x0.dtype)
            d2, idx = fn(xi, xi)
            return carry + jnp.sum(d2[:, :, -1]) + jnp.sum(idx[:, :, -1]), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(reps, dtype=jnp.float32))
        return tot

    float(run(x))                       # compile + warm
    t0 = time.perf_counter()
    float(run(x))
    return (time.perf_counter() - t0) / reps


def main():
    enable_compilation_cache()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} d={D} k={K} reps={reps}")
    print(f"{'B':>3} {'N':>7} {'packed ms':>10} {'packed2 ms':>11} "
          f"{'speedup':>8}")
    for b, n in CONFIGS:
        x = jnp.asarray(rng.normal(size=(b, n, D)), jnp.float32)
        nr = jnp.asarray(np.full(b, n - 37), jnp.int32)   # runtime counts
        tp = time_batched(
            lambda q, r: kp.knn_select_pallas_packed_batched(
                q, r, K, self_mode=True, nr=nr), x, nr, reps)
        t2 = time_batched(
            lambda q, r: kp.knn_select_pallas_packed2_batched(
                q, r, K, self_mode=True, nr=nr), x, nr, reps)
        print(f"{b:>3} {n:>7} {tp * 1e3:>10.2f} {t2 * 1e3:>11.2f} "
              f"{tp / t2:>7.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
