"""Per-tile prologue ablation for the packed2 kernel (round 5).

The k=1 fixed cost dominates the refine-path bench (41.7 of 59.3 ms/rep
at N=65536 k=5), and it is mostly elementwise VPU streams over the
(tq, 2*TR) tile, not MXU time.  Three candidate cuts, measured
cumulatively against the shipped kernel:

  A  one wide (tq, dpad)@(dpad, 2*TR) matmul instead of two halves +
     a 4 MB concatenate
  B  sentinel ref rows (1e18, set ONCE outside the grid) replace the
     per-tile `gcol < nr` padding mask + iota
  C  self-pin applied via lax.cond only on the ~1/16 of invocations
     whose tile crosses the diagonal

Experimental only — adopt into knn_pallas.py on a measured win.
Usage: python scripts/bench_prologue.py [N] [reps]
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from mcevidence_tpu.ops import knn_pallas as kp  # noqa: E402
from mcevidence_tpu.utils.cache import enable_compilation_cache  # noqa: E402

TR = kp.TR
LANE = kp.LANE
LOW_BITS = kp.LOW_BITS + 1      # packed2 cadence: 12-bit local columns
TQ = 256
SENTINEL = jnp.float32(1e18)    # d2 ~ 8e36 << f32 max; never wins


def _pack_extract_merge(d2, run_d2, run_idx, j, k):
    """Trimmed _packed_select: pack + k-pass extract + merge, with NO
    nr mask and NO self pin (handled by the wrapper / cond)."""
    tq, tr = d2.shape
    low_mask = jnp.int32((1 << LOW_BITS) - 1)
    lcol = jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 1)
    pk = jax.lax.bitcast_convert_type(d2, jnp.int32)
    pk = (pk & ~low_mask) | lcol
    int_max = jnp.int32(2147483647)
    w = jnp.full((tq, k), int_max)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)
    for jj in range(k):
        m = jnp.min(pk, axis=1, keepdims=True)
        w = jnp.where(wcol == jj, m, w)
        pk = jnp.where(pk == m, int_max, pk)
    dq = jax.lax.bitcast_convert_type(w & ~low_mask, jnp.float32)
    gidx = j * tr + (w & low_mask)
    gidx = jnp.where(jnp.isinf(dq) | (dq > 1e30), -1, gidx)
    cat = jnp.concatenate([run_d2, dq], axis=1)
    cat_idx = jnp.concatenate([run_idx, gidx], axis=1)
    return kp._extract_topk(cat, cat_idx, k)


def _kernel(nr_ref, q_ref, r_ref, d2_out, idx_out, *, k, variant):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        d2_out[:] = jnp.full_like(d2_out, jnp.inf)
        idx_out[:] = jnp.full_like(idx_out, -1)

    q = q_ref[:]
    tr = r_ref.shape[0]
    if variant == "A":                      # one wide matmul, masks kept
        d2 = jnp.maximum(kp._mm_distance(q, r_ref[:]), 0.0)
        nr = nr_ref[0]
        gcol = j * tr + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        d2 = jnp.where(gcol < nr, d2, jnp.inf)
        grow = i * TQ + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        d2 = jnp.where(gcol == grow, -1.0, d2)
        d2_new, idx_new = _pack_extract_merge(d2, d2_out[:], idx_out[:],
                                              j, k)
    elif variant == "AB":                   # sentinel rows, self pin kept
        d2 = jnp.maximum(kp._mm_distance(q, r_ref[:]), 0.0)
        gcol = j * tr + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
        grow = i * TQ + jax.lax.broadcasted_iota(jnp.int32, d2.shape, 0)
        d2 = jnp.where(gcol == grow, -1.0, d2)
        d2_new, idx_new = _pack_extract_merge(d2, d2_out[:], idx_out[:],
                                              j, k)
    else:                                   # ABC: + diagonal-only pin
        d2 = jnp.maximum(kp._mm_distance(q, r_ref[:]), 0.0)

        def _pin(v):
            gcol = j * tr + jax.lax.broadcasted_iota(jnp.int32, v.shape, 1)
            grow = i * TQ + jax.lax.broadcasted_iota(jnp.int32, v.shape, 0)
            return jnp.where(gcol == grow, -1.0, v)

        crosses = (i * TQ < (j + 1) * tr) & (j * tr < (i + 1) * TQ)
        d2 = jax.lax.cond(crosses, _pin, lambda v: v, d2)
        d2_new, idx_new = _pack_extract_merge(d2, d2_out[:], idx_out[:],
                                              j, k)
    d2_out[:] = d2_new
    idx_out[:] = idx_new


@functools.partial(jax.jit, static_argnames=("k", "variant"))
def knn_variant(query, ref, k, variant):
    nq, d = query.shape
    nr = ref.shape[0]
    mu = kp._mu_masked(ref, nr, query.dtype)
    dpad = kp._round_up(max(d, 1), LANE)
    nq_pad = kp._round_up(nq, TQ)
    nr_pad = kp._round_up(nr, 2 * TR)
    q = jnp.zeros((nq_pad, dpad), jnp.float32)
    q = q.at[:nq, :d].set((query - mu).astype(jnp.float32))
    r = jnp.zeros((nr_pad, dpad), jnp.float32)
    r = r.at[:nr, :d].set((ref - mu).astype(jnp.float32))
    if variant != "A":                      # sentinel padding rows
        row_ok = (jnp.arange(nr_pad) < nr)[:, None]
        r = jnp.where(row_ok, r, SENTINEL)
    nr_arr = jnp.asarray(nr, jnp.int32).reshape(1)

    grid = (nq_pad // TQ, nr_pad // (2 * TR))
    kernel = functools.partial(_kernel, k=k, variant=variant)
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TQ, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * TR, dpad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TQ, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TQ, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_pad * nr_pad * dpad,
            bytes_accessed=(q.size + r.size) * 4, transcendentals=0),
    )(nr_arr, q, r)
    d2, idx = d2[:nq], idx[:nq]
    bad = d2 > 1e30                          # sentinel winners = absent
    return (jnp.where(bad, jnp.inf, jnp.maximum(d2, 0.0)),
            jnp.where(bad, -1, idx))


def time_fn(fn, x, reps):
    @jax.jit
    def run(x0):
        def body(carry, i):
            xi = x0 + (1e-6 * i).astype(x0.dtype)
            d2, idx = fn(xi, xi)
            return carry + jnp.sum(d2[:, -1]) + jnp.sum(idx[:, -1]), None
        tot, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(reps, dtype=jnp.float32))
        return tot

    float(run(x))
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

    # correctness gate vs the shipped kernel before timing anything
    ref_d2, ref_idx = kp.knn_select_pallas_packed2(x[:4096], x[:4096], 5,
                                                   self_mode=True)
    for v in ("A", "AB", "ABC"):
        vd2, vidx = knn_variant(x[:4096], x[:4096], 5, v)
        ok_idx = bool(jnp.all(vidx == ref_idx))
        err = float(jnp.max(jnp.abs(vd2 - ref_d2)))
        print(f"parity {v}: idx_equal={ok_idx} max|d2 diff|={err:.3e}")
        if not ok_idx or err > 1e-5:
            print("PARITY FAILURE — not timing this variant")
            return 1

    print(f"{'k':>3} {'variant':>8} {'ms/rep':>8} {'vs shipped':>10}")
    for k in (1, 5):
        base = time_fn(lambda q, r: kp.knn_select_pallas_packed2(
            q, r, k, self_mode=True), x, reps)
        print(f"{k:>3} {'shipped':>8} {base * 1e3:>8.2f} {'1.00x':>10}",
              flush=True)
        for v in ("A", "AB", "ABC"):
            try:
                t = time_fn(lambda q, r, _v=v: knn_variant(q, r, k, _v),
                            x, reps)
            except Exception as exc:
                print(f"{k:>3} {v:>8}   FAILED: {type(exc).__name__}",
                      flush=True)
                continue
            print(f"{k:>3} {v:>8} {t * 1e3:>8.2f} {base / t:>9.2f}x",
                  flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
