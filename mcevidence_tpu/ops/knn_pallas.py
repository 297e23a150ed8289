"""Fused Pallas TPU kernel: tiled pairwise squared-L2 + running exact top-k.

This is the device-native replacement for the reference's sklearn
``kneighbors`` hot loop (reference MCEvidence.py:1093-1104).  The O(Nq*Nr*d)
distance sweep runs as one MXU matmul per (query-tile, ref-tile) pair via
||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b; the running top-k for each query tile
lives in the revisited output block in VMEM and is merged with each new ref
tile by exact iterative min-extraction (k is tiny: kmax <= 5 plus refinement
padding), so nothing O(N^2) ever round-trips to HBM.

Design notes (pallas_guide.md):
* grid = (query tiles, ref tiles) with the ref dimension minor, so each
  query tile's output block stays resident in VMEM across the whole ref sweep
  (standard revisited-output accumulation).
* the contraction dim d (<= ~20 for MCMC chains) is zero-padded to the
  128-lane MXU width; zero columns do not change distances.
* candidate coordinates are pre-centred by the caller so the matmul identity
  stays accurate in f32 (exact_knn refines the winners in f64 anyway).
* self mode pins the diagonal pair to -1 so the self match always occupies
  slot 0 exactly like sklearn's self-first convention; the wrapper clamps
  distances back to >= 0.
* the true reference count ``nr`` is a runtime SMEM scalar, NOT a shape:
  one compiled kernel serves every chain length within a shape bucket
  (remote TPU compiles cost minutes; chain lengths vary per model).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Tile sizes: (TQ, TR) f32 distance tile = 4 MB VMEM (+4 MB merge buffer,
# ~1.3 MB double-buffered inputs).  Measured sweep (docs/KERNEL_NOTES.md):
# larger tiles amortize the ~2 us per-invocation overhead — (512, 2048) gave
# 45 Gpairs/s at k=5 vs 23 Gpairs/s at (256, 512).
TQ = 512
TR = 2048
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _knn_kernel(nr_ref, q_ref, r_ref, d2_out, idx_out, *, k: int,
                self_mode: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        d2_out[:] = jnp.full_like(d2_out, jnp.inf)
        idx_out[:] = jnp.full_like(idx_out, -1)

    nr = nr_ref[0]
    q = q_ref[:]
    r = r_ref[:]
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)            # (TQ, 1)
    r_sq = jnp.sum(r * r, axis=1)[None, :]                  # (1, TR)
    # the MXU pass: (TQ, DPAD) @ (DPAD, TR), full f32 (default matmul
    # precision would truncate inputs to bf16 => ~1% distance error)
    d2 = q_sq + r_sq - 2.0 * jnp.dot(q, r.T,
                                     preferred_element_type=jnp.float32,
                                     precision=jax.lax.Precision.HIGHEST)

    gcol = j * TR + jax.lax.broadcasted_iota(jnp.int32, (TQ, TR), 1)
    d2 = jnp.where(gcol < nr, d2, jnp.inf)                  # mask ref padding
    if self_mode:
        grow = i * TQ + jax.lax.broadcasted_iota(jnp.int32, (TQ, TR), 0)
        d2 = jnp.where(gcol == grow, -1.0, d2)              # pin self to slot 0

    # merge running top-k with this tile's candidates: exact iterative
    # min-extraction over the concatenation (k passes, k <= ~16).
    cat = jnp.concatenate([d2_out[:], d2], axis=1)          # (TQ, k + TR)
    cat_idx = jnp.concatenate([idx_out[:], gcol], axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, cat.shape, 1)
    vals = []
    idxs = []
    neg_big = jnp.int32(-2147483648)
    for _ in range(k):
        am = jnp.argmin(cat, axis=1)[:, None]               # first-min, stable
        mask = col == am
        vals.append(jnp.min(cat, axis=1, keepdims=True))
        idxs.append(jnp.max(jnp.where(mask, cat_idx, neg_big), axis=1,
                            keepdims=True))
        cat = jnp.where(mask, jnp.inf, cat)
    d2_out[:] = jnp.concatenate(vals, axis=1)
    idx_out[:] = jnp.concatenate(idxs, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "self_mode", "interpret"))
def knn_select_pallas(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                      self_mode: bool = False, interpret: bool = False,
                      nr=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact kNN selection on TPU; same contract as ``knn_select_xla``.

    ``nr``: true number of valid reference rows (ref rows beyond it are
    padding and never selected); defaults to ref.shape[0].  Runtime value —
    does not trigger recompilation.

    Returns (d2, idx): (Nq, k) ascending squared distances and ref-row
    indices; absent slots carry +inf / -1.
    """
    nq, d = query.shape
    if nr is None:
        nr = ref.shape[0]
    k = min(k, ref.shape[0])

    mu = jnp.sum(ref, axis=0, keepdims=True) / jnp.maximum(
        jnp.asarray(nr, query.dtype), 1.0)
    dpad = _round_up(max(d, 1), LANE)
    nq_pad = _round_up(nq, TQ)
    nr_pad = _round_up(ref.shape[0], TR)
    q = jnp.zeros((nq_pad, dpad), jnp.float32)
    q = q.at[:nq, :d].set((query - mu).astype(jnp.float32))
    r = jnp.zeros((nr_pad, dpad), jnp.float32)
    r = r.at[:ref.shape[0], :d].set((ref - mu).astype(jnp.float32))
    nr_arr = jnp.asarray(nr, jnp.int32).reshape(1)

    grid = (nq_pad // TQ, nr_pad // TR)
    kernel = functools.partial(_knn_kernel, k=k, self_mode=self_mode)
    flops_mm = 2 * nq_pad * nr_pad * dpad
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TQ, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, dpad), lambda i, j: (j, 0),
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
            flops=flops_mm, bytes_accessed=(q.size + r.size) * 4,
            transcendentals=0),
        interpret=interpret,
    )(nr_arr, q, r)
    return jnp.maximum(d2[:nq], 0.0), idx[:nq]
