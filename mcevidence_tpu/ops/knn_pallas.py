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
import logging
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

logger = logging.getLogger(__name__)

# Tile sizes: (TQ, TR) f32 distance tile = 4 MB VMEM (+4 MB merge buffer,
# ~1.3 MB double-buffered inputs).  Measured sweep (docs/KERNEL_NOTES.md):
# larger tiles amortize the ~2 us per-invocation overhead — (512, 2048) gave
# 45 Gpairs/s at k=5 vs 23 Gpairs/s at (256, 512).
TQ = 512
TR = 2048
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _query_tile(k: int) -> int:
    """Query-tile height for the iterative kernels.

    The k-loop winner buffers plus the merge concat must fit scoped VMEM;
    at the sufficiency-retry regime (retry_pad=24 -> k_sel ~ 26) the full
    TQ=512 tile overflows on v5e, so high-k selections run on 256-row
    tiles.  The threshold is the measured fit boundary — retune here (one
    site) if tiles or hardware change."""
    return 256 if k >= 14 else TQ


def _mu_masked(ref, nr, dtype):
    """Centring mean over the VALID reference rows only.

    Rows >= nr carry NO contract beyond 'never selected' (round-4 review:
    non-zero padding would shift mu and wreck the f32 cast of every centred
    coordinate), so they are excluded explicitly.  Handles both the
    single-cell case (ref (N, d), scalar nr -> mu (1, d)) and the batched
    case (ref (B, N, d), nr (B,) -> mu (B, 1, d))."""
    n = ref.shape[-2]
    nr_a = jnp.asarray(nr)
    ok = (jnp.arange(n) < nr_a[..., None])[..., None]
    return (jnp.sum(jnp.where(ok, ref, 0), axis=-2, keepdims=True)
            / jnp.maximum(nr_a.astype(dtype)[..., None, None], 1.0))


def _mm_distance(q, r, q_sq=None):
    """(tq, tr) squared-distance tile via the MXU identity
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2 a.b.  Full-f32 matmul: Mosaic lowers
    only DEFAULT/HIGHEST, DEFAULT (bf16) would truncate inputs (~1%
    distance error) and measured *slower* than HIGHEST here
    (docs/KERNEL_NOTES.md).  ``q_sq``: precomputed (tq, 1) query norms for
    callers that sweep many ref groups per query tile (binned kernel)."""
    if q_sq is None:
        q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    r_sq = jnp.sum(r * r, axis=1)[None, :]
    return q_sq + r_sq - 2.0 * jnp.dot(q, r.T,
                                       preferred_element_type=jnp.float32,
                                       precision=jax.lax.Precision.HIGHEST)


def _prep_single_mxu(query, ref, nr, k):
    """Shared wrapper prep for the single-cell MXU kernels (iterative and
    binned): masked centring, lane padding of both point sets, runtime-nr
    SMEM scalar.  Returns (q, r, nr_arr, k, tq, dpad, nq_pad, nr_pad)."""
    nq, d = query.shape
    if nr is None:
        nr = ref.shape[0]
    k = min(k, ref.shape[0])
    mu = _mu_masked(ref, nr, query.dtype)
    tq = _query_tile(k)
    dpad = _round_up(max(d, 1), LANE)
    nq_pad = _round_up(nq, tq)
    nr_pad = _round_up(ref.shape[0], TR)
    q = jnp.zeros((nq_pad, dpad), jnp.float32)
    q = q.at[:nq, :d].set((query - mu).astype(jnp.float32))
    r = jnp.zeros((nr_pad, dpad), jnp.float32)
    r = r.at[:ref.shape[0], :d].set((ref - mu).astype(jnp.float32))
    nr_arr = jnp.asarray(nr, jnp.int32).reshape(1)
    return q, r, nr_arr, k, tq, dpad, nq_pad, nr_pad



def _extract_topk(cat, cat_idx, k: int):
    """Exact iterative top-k extraction over a (TQ, m) candidate tile:
    k passes of argmin / first-min mask / masked index gather / invalidate.
    Shared by every kernel's merge/extract step.

    Winners accumulate into ONE (tq, k) buffer per output via static-index
    updates: a list of k live (tq, 1) slices each occupies a full
    lane-padded tile on the Mosaic stack (~256 KB at tq=512), which
    overflows scoped VMEM at the sufficiency-retry k (~26)."""
    col = jax.lax.broadcasted_iota(jnp.int32, cat.shape, 1)
    tq = cat.shape[0]
    colk = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)
    vals = jnp.full((tq, k), jnp.inf, cat.dtype)
    idxs = jnp.full((tq, k), -1, jnp.int32)
    neg_big = jnp.int32(-2147483648)
    for j in range(k):
        am = jnp.argmin(cat, axis=1)[:, None]
        mask = col == am
        # masked column write (Mosaic has no dynamic_update_slice)
        vals = jnp.where(colk == j, jnp.min(cat, axis=1, keepdims=True),
                         vals)
        idxs = jnp.where(colk == j,
                         jnp.max(jnp.where(mask, cat_idx, neg_big), axis=1,
                                 keepdims=True), idxs)
        cat = jnp.where(mask, jnp.inf, cat)
    # absent slots (fewer than k real candidates) must decode to -1: once a
    # winner column is invalidated to inf, a later argmin can land on it
    # again and re-emit its STALE cat_idx — without this mask every kernel
    # returned duplicate real indices for the inf tail (round-4 review),
    # which downstream refine stages would double-count into dotp.
    idxs = jnp.where(jnp.isinf(vals), -1, idxs)
    return vals, idxs


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
    tq, tr = q.shape[0], r.shape[0]   # tile sizes from the block shapes
    d2 = _mm_distance(q, r)

    gcol = j * tr + jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 1)
    d2 = jnp.where(gcol < nr, d2, jnp.inf)                  # mask ref padding
    if self_mode:
        grow = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 0)
        d2 = jnp.where(gcol == grow, -1.0, d2)              # pin self to slot 0

    # merge running top-k with this tile's candidates: exact iterative
    # min-extraction over the concatenation (k passes, k <= ~16).
    cat = jnp.concatenate([d2_out[:], d2], axis=1)          # (TQ, k + TR)
    cat_idx = jnp.concatenate([idx_out[:], gcol], axis=1)
    d2_out[:], idx_out[:] = _extract_topk(cat, cat_idx, k)


# --- packed-selection variant -------------------------------------------
# The iterative extraction above costs ~6 VPU sweeps of the (TQ, k+TR) tile
# per extracted neighbour (argmin, eq-mask, min, masked idx max, invalidate).
# Packing the distance and the candidate's local column into ONE int32 —
# high bits = f32 distance bit pattern (monotone under integer compare for
# values in {-1.0} U [0, inf]), low LOW_BITS = lane column — turns each pass
# into min + eq + select: ~3 sweeps, and the winners carry their indices for
# free.  The cost: the low LOW_BITS of the f32 mantissa are truncated, so
# returned distances are quantized DOWN by <= 2^-12 relative and near-ties
# may swap rank.  The f64 refinement stage (exact_knn default) recomputes
# candidate distances exactly, and its sufficiency guard retries with more
# candidates if the boundary margin is thinner than this quantization.

LOW_BITS = 11
LOW_MASK = (1 << LOW_BITS) - 1
assert TR <= (1 << LOW_BITS), "local column ids must fit the packed low bits"


def _packed_tile(nr, q, r, run_d2, run_idx, i, j, *, k: int,
                 self_mode: bool):
    """Shared body of the packed kernels: one (TQ, TR) ref tile's selection
    merged into the running top-k.  Returns the new (d2, idx) blocks."""
    d2 = _mm_distance(q, r)
    # clamp genuine distances to >= 0 BEFORE packing: f32 cancellation can
    # produce tiny negatives, and negative floats sort reversed under the
    # integer compare — only the exact self pin (-1.0) may stay negative.
    d2 = jnp.maximum(d2, 0.0)
    return _packed_select(d2, nr, run_d2, run_idx, i, j, k=k,
                          self_mode=self_mode)


def _packed_select(d2, nr, run_d2, run_idx, i, j, *, k: int,
                   self_mode: bool, low_bits: int = LOW_BITS):
    """Packed top-k selection over a computed (tq, tr) distance tile,
    merged with the running top-k.  ``d2`` must already be >= 0.  Tile
    sizes come from ``d2``'s block shape (the wrappers shrink the query
    tile at high k to fit scoped VMEM).  ``low_bits``: mantissa bits
    sacrificed for the local column id — the tile width must fit
    (the packed2 experiment sweeps 4096-wide tiles => 12 bits)."""
    tq, tr = d2.shape
    assert tr <= (1 << low_bits), (tr, low_bits)
    low_mask = jnp.int32((1 << low_bits) - 1)
    lcol = jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 1)
    gcol = j * tr + lcol
    d2 = jnp.where(gcol < nr, d2, jnp.inf)
    if self_mode:
        grow = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, tr), 0)
        d2 = jnp.where(gcol == grow, -1.0, d2)

    pk = jax.lax.bitcast_convert_type(d2, jnp.int32)
    pk = (pk & ~low_mask) | lcol
    # winners accumulate into ONE (tq, k) buffer: k live (tq, 1) slices
    # would each hold a full lane-padded tile of Mosaic stack (scoped-VMEM
    # OOM at the sufficiency-retry k on v5e)
    int_max = jnp.int32(2147483647)
    w = jnp.full((tq, k), int_max)
    wcol = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1)
    # NOTE (round-5 measured no-win): a read-only "monotone frontier"
    # variant — m_j = min(where(pk > m_{j-1}, pk, INT_MAX)), no
    # invalidation store, exploiting key uniqueness — was implemented and
    # measured SLOWER on chip (k=5 N=65536: 63.1 ms vs 59.3 ms here):
    # Mosaic materializes the select's full-tile temp rather than fusing
    # it into the lane reduction, so the scheme pays the saved store back
    # with interest.  Keep min + eq-invalidate.
    for jj in range(k):
        m = jnp.min(pk, axis=1, keepdims=True)     # packed (distance, col)
        w = jnp.where(wcol == jj, m, w)   # masked column write (no DUS)
        pk = jnp.where(pk == m, int_max, pk)       # packed keys are unique
    dq = jax.lax.bitcast_convert_type(w & ~low_mask, jnp.float32)
    gidx = j * tr + (w & low_mask)
    gidx = jnp.where(jnp.isinf(dq), -1, gidx)

    # merge with the running top-k: tiny (TQ, 2k) exact extraction
    cat = jnp.concatenate([run_d2, dq], axis=1)
    cat_idx = jnp.concatenate([run_idx, gidx], axis=1)
    return _extract_topk(cat, cat_idx, k)


def _knn_kernel_packed(nr_ref, q_ref, r_ref, d2_out, idx_out, *, k: int,
                       self_mode: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        d2_out[:] = jnp.full_like(d2_out, jnp.inf)
        idx_out[:] = jnp.full_like(idx_out, -1)

    d2_new, idx_new = _packed_tile(nr_ref[0], q_ref[:], r_ref[:],
                                   d2_out[:], idx_out[:], i, j,
                                   k=k, self_mode=self_mode)
    d2_out[:] = d2_new
    idx_out[:] = idx_new


def _knn_kernel_packedn(nr_ref, q_ref, r_ref, d2_out, idx_out, *, k: int,
                        self_mode: bool, n_tiles: int, low_bits: int):
    """Merge-cadence kernel (VERDICT r4 item 7): N ref tiles per grid
    invocation — N MXU distance passes (per-2048-wide sublane slices of
    the ref block), ONE k-pass packed extraction + running-top-k merge
    over the (n_tiles*TR)-wide concatenation.  Wider cadence divides the
    per-k fixed costs (pass-loop setup, the (tq, k) masked writes, merge
    invocations) across more reference columns; each doubling of n_tiles
    costs one more mantissa bit of distance quantization (low_bits =
    LOW_BITS + log2(n_tiles)) — adoption of a wider cadence must re-check
    the refine guard's margin (knn.py 2^-10 on distance) against
    2^(low_bits-23) relative on d2.  The production point is n_tiles=2
    (``knn_select_pallas_packed2``): measured 1.12-1.17x the single-tile
    packed kernel at N=32k-65k over k=1..9 on chip, while 4-wide cadences
    are VMEM-infeasible at production k (docs/KERNEL_NOTES.md round-5
    entries)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        d2_out[:] = jnp.full_like(d2_out, jnp.inf)
        idx_out[:] = jnp.full_like(idx_out, -1)

    q = q_ref[:]
    parts = [_mm_distance(q, r_ref[t * TR:(t + 1) * TR, :])
             for t in range(n_tiles)]
    d2 = jnp.maximum(jnp.concatenate(parts, axis=1), 0.0)
    d2_new, idx_new = _packed_select(d2, nr_ref[0], d2_out[:], idx_out[:],
                                     i, j, k=k, self_mode=self_mode,
                                     low_bits=low_bits)
    d2_out[:] = d2_new
    idx_out[:] = idx_new


@functools.partial(jax.jit, static_argnames=("k", "self_mode", "interpret",
                                             "n_tiles", "tq"))
def knn_select_pallas_packedn(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                              n_tiles: int = 2, tq: int = 256,
                              self_mode: bool = False,
                              interpret: bool = False, nr=None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Generalized merge-cadence wrapper: packed selection with ``n_tiles``
    ref tiles per invocation and query-tile height ``tq``.  The shipped
    production config is (n_tiles=2, tq=256) — ``knn_select_pallas_packed2``
    delegates here; other points are the cadence-sweep harness
    (docs/KERNEL_NOTES.md).  Quantization: <= 2^(log2(n_tiles) - 12)
    relative on d2."""
    assert n_tiles in (1, 2, 4, 8), n_tiles
    low_bits = LOW_BITS + max(0, n_tiles.bit_length() - 1)
    nq, d = query.shape
    if nr is None:
        nr = ref.shape[0]
    k = min(k, ref.shape[0])
    mu = _mu_masked(ref, nr, query.dtype)
    dpad = _round_up(max(d, 1), LANE)
    nq_pad = _round_up(nq, tq)
    nr_pad = _round_up(ref.shape[0], n_tiles * TR)
    q = jnp.zeros((nq_pad, dpad), jnp.float32)
    q = q.at[:nq, :d].set((query - mu).astype(jnp.float32))
    r = jnp.zeros((nr_pad, dpad), jnp.float32)
    r = r.at[:ref.shape[0], :d].set((ref - mu).astype(jnp.float32))
    nr_arr = jnp.asarray(nr, jnp.int32).reshape(1)

    grid = (nq_pad // tq, nr_pad // (n_tiles * TR))
    kernel = functools.partial(_knn_kernel_packedn, k=k,
                               self_mode=self_mode, n_tiles=n_tiles,
                               low_bits=low_bits)
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_tiles * TR, dpad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_pad * nr_pad * dpad,
            bytes_accessed=(q.size + r.size) * 4, transcendentals=0),
        interpret=interpret,
    )(nr_arr, q, r)
    return jnp.maximum(d2[:nq], 0.0), idx[:nq]


def _knn_kernel_packed2_batched(nr_ref, q_ref, r_ref, d2_out, idx_out, *,
                                k: int, self_mode: bool):
    """Batched merge-cadence kernel: grid (B, query tiles, double-width ref
    tiles); the (2*TR)-wide concatenated extraction/merge of
    ``_knn_kernel_packedn`` (n_tiles=2) with per-member runtime counts
    nr_ref[b]."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        d2_out[0] = jnp.full_like(d2_out[0], jnp.inf)
        idx_out[0] = jnp.full_like(idx_out[0], -1)

    q = q_ref[0]
    r = r_ref[0]
    d2a = _mm_distance(q, r[:TR, :])
    d2b = _mm_distance(q, r[TR:, :])
    d2 = jnp.maximum(jnp.concatenate([d2a, d2b], axis=1), 0.0)
    d2_new, idx_new = _packed_select(d2, nr_ref[b], d2_out[0], idx_out[0],
                                     i, j, k=k, self_mode=self_mode,
                                     low_bits=LOW_BITS + 1)
    d2_out[0] = d2_new
    idx_out[0] = idx_new


def _knn_kernel_packed_batched(nr_ref, q_ref, r_ref, d2_out, idx_out, *,
                               k: int, self_mode: bool):
    """Batched packed kernel: grid (B, query tiles, ref tiles); each batch
    member has its own runtime count nr_ref[b].  Kernel-level batching —
    one dispatch covers a whole batch of same-bucket chains."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        d2_out[0] = jnp.full_like(d2_out[0], jnp.inf)
        idx_out[0] = jnp.full_like(idx_out[0], -1)

    d2_new, idx_new = _packed_tile(nr_ref[b], q_ref[0], r_ref[0],
                                   d2_out[0], idx_out[0], i, j,
                                   k=k, self_mode=self_mode)
    d2_out[0] = d2_new
    idx_out[0] = idx_new


@functools.partial(jax.jit, static_argnames=("k", "self_mode", "interpret"))
def knn_select_pallas_packed_batched(query, ref, k: int,
                                     self_mode: bool = False,
                                     interpret: bool = False,
                                     nr=None):
    """Batched packed selection: (B, Nq, d) queries vs (B, Nr, d) refs with
    per-batch runtime counts ``nr`` (B,).  Same per-member contract as
    ``knn_select_pallas_packed``; returns (B, Nq, k) d2 and idx."""
    bsz, nq, d = query.shape
    nr_full = ref.shape[1]
    if nr is None:
        nr = jnp.full((bsz,), nr_full, jnp.int32)
    nr = jnp.asarray(nr, jnp.int32).reshape(bsz)
    k = min(k, nr_full)

    # per-member centring (translation-invariant; conditions the identity)
    mu = _mu_masked(ref, nr, query.dtype)
    tq = _query_tile(k)
    dpad = _round_up(max(d, 1), LANE)
    nq_pad = _round_up(nq, tq)
    nr_pad = _round_up(nr_full, TR)
    q = jnp.zeros((bsz, nq_pad, dpad), jnp.float32)
    q = q.at[:, :nq, :d].set((query - mu).astype(jnp.float32))
    r = jnp.zeros((bsz, nr_pad, dpad), jnp.float32)
    r = r.at[:, :nr_full, :d].set((ref - mu).astype(jnp.float32))

    grid = (bsz, nq_pad // tq, nr_pad // TR)
    kernel = functools.partial(_knn_kernel_packed_batched, k=k,
                               self_mode=self_mode)
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, dpad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TR, dpad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, k), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nq_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nq_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * nq_pad * nr_pad * dpad,
            bytes_accessed=(q.size + r.size) * 4, transcendentals=0),
        interpret=interpret,
    )(nr, q, r)
    return jnp.maximum(d2[:, :nq], 0.0), idx[:, :nq]


@functools.partial(jax.jit, static_argnames=("k", "self_mode", "interpret"))
def knn_select_pallas_packed2_batched(query, ref, k: int,
                                      self_mode: bool = False,
                                      interpret: bool = False,
                                      nr=None):
    """Batched merge-cadence packed2 selection: (B, Nq, d) queries vs
    (B, Nr, d) refs with per-batch runtime counts ``nr`` (B,).  Same
    per-member contract as ``knn_select_pallas_packed2`` (quantization
    <= 2^-11 relative); returns (B, Nq, k) d2 and idx."""
    bsz, nq, d = query.shape
    nr_full = ref.shape[1]
    if nr is None:
        nr = jnp.full((bsz,), nr_full, jnp.int32)
    nr = jnp.asarray(nr, jnp.int32).reshape(bsz)
    k = min(k, nr_full)

    mu = _mu_masked(ref, nr, query.dtype)
    tq = PACKED2_TQ
    dpad = _round_up(max(d, 1), LANE)
    nq_pad = _round_up(nq, tq)
    nr_pad = _round_up(nr_full, 2 * TR)
    q = jnp.zeros((bsz, nq_pad, dpad), jnp.float32)
    q = q.at[:, :nq, :d].set((query - mu).astype(jnp.float32))
    r = jnp.zeros((bsz, nr_pad, dpad), jnp.float32)
    r = r.at[:, :nr_full, :d].set((ref - mu).astype(jnp.float32))

    grid = (bsz, nq_pad // tq, nr_pad // (2 * TR))
    kernel = functools.partial(_knn_kernel_packed2_batched, k=k,
                               self_mode=self_mode)
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, dpad), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * TR, dpad), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, k), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nq_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nq_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * nq_pad * nr_pad * dpad,
            bytes_accessed=(q.size + r.size) * 4, transcendentals=0),
        interpret=interpret,
    )(nr, q, r)
    return jnp.maximum(d2[:, :nq], 0.0), idx[:, :nq]


# --- small-d per-coordinate variant --------------------------------------
# At chain dimensionality d <= ~16 the 128-lane MXU matmul is >= 87% zero
# padding (VERDICT r2: 94% at d=8).  This variant skips the matmul identity
# entirely: the (TQ, TR) distance tile accumulates d broadcast
# (q_j - r_j)^2 sweeps on the VPU — no contraction padding, and exact
# squared differences (no ||a||^2+||b||^2-2ab cancellation), so it is
# MORE accurate than the matmul path in f32.  The reference set is passed
# pre-transposed (d, TR) so coordinate j is a sublane row; the query
# coordinate is a static width-1 lane slice.

SMALLD_MAX = 16


def _knn_kernel_packed_smalld(nr_ref, q_ref, rt_ref, d2_out, idx_out, *,
                              k: int, self_mode: bool, d_real: int):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        d2_out[:] = jnp.full_like(d2_out, jnp.inf)
        idx_out[:] = jnp.full_like(idx_out, -1)

    q = q_ref[:]                     # (TQ, dpad_s)
    acc = None
    for c in range(d_real):          # static unroll: d <= SMALLD_MAX sweeps
        diff = q[:, c:c + 1] - rt_ref[c:c + 1, :]      # (TQ,1)-(1,TR)
        acc = diff * diff if acc is None else acc + diff * diff
    # acc >= 0 by construction: no clamp needed before packing
    d2_new, idx_new = _packed_select(acc, nr_ref[0], d2_out[:], idx_out[:],
                                     i, j, k=k, self_mode=self_mode)
    d2_out[:] = d2_new
    idx_out[:] = idx_new


@functools.partial(jax.jit,
                   static_argnames=("k", "self_mode", "interpret", "d_real"))
def knn_select_pallas_smalld(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                             self_mode: bool = False, interpret: bool = False,
                             nr=None, d_real: "int | None" = None
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-coordinate VPU selection for d <= SMALLD_MAX; packed extraction
    (same <= 2^-12 distance quantization as ``knn_select_pallas_packed``),
    exact f32 squared differences.

    ``d_real``: true coordinate count when the input width is already
    padded (columns >= d_real MUST be zero) — the kernel sweeps exactly
    d_real coordinates instead of paying for all-zero padding columns
    (round-4 review).  Static: callers with runtime-varying ndim within a
    padded width class leave it None (sweep the full width)."""
    nq, d = query.shape
    assert d <= SMALLD_MAX, f"smalld kernel requires d <= {SMALLD_MAX}"
    if d_real is None:
        d_real = d
    assert 0 < d_real <= d, (d_real, d)
    if nr is None:
        nr = ref.shape[0]
    k = min(k, ref.shape[0])

    mu = _mu_masked(ref, nr, query.dtype)
    tq = _query_tile(k)
    dpad_s = _round_up(max(d, 1), 8)             # f32 sublane quantum
    nq_pad = _round_up(nq, tq)
    nr_pad = _round_up(ref.shape[0], TR)
    q = jnp.zeros((nq_pad, dpad_s), jnp.float32)
    q = q.at[:nq, :d].set((query - mu).astype(jnp.float32))
    rt = jnp.zeros((dpad_s, nr_pad), jnp.float32)
    rt = rt.at[:d, :ref.shape[0]].set((ref - mu).astype(jnp.float32).T)
    nr_arr = jnp.asarray(nr, jnp.int32).reshape(1)

    grid = (nq_pad // tq, nr_pad // TR)
    kernel = functools.partial(_knn_kernel_packed_smalld, k=k,
                               self_mode=self_mode, d_real=d_real)
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, dpad_s), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dpad_s, TR), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * nq_pad * nr_pad * d,
            bytes_accessed=(q.size + rt.size) * 4, transcendentals=0),
        interpret=interpret,
    )(nr_arr, q, rt)
    return jnp.maximum(d2[:nq], 0.0), idx[:nq]


def _knn_kernel_packed_smalld_batched(nr_ref, q_ref, rt_ref, d2_out, idx_out,
                                      *, k: int, self_mode: bool,
                                      d_real: int):
    """Batched small-d kernel: grid (B, query tiles, ref tiles), per-batch
    runtime counts — the small-d sibling of ``_knn_kernel_packed_batched``."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        d2_out[0] = jnp.full_like(d2_out[0], jnp.inf)
        idx_out[0] = jnp.full_like(idx_out[0], -1)

    q = q_ref[0]
    rt = rt_ref[0]
    acc = None
    for c in range(d_real):
        diff = q[:, c:c + 1] - rt[c:c + 1, :]
        acc = diff * diff if acc is None else acc + diff * diff
    d2_new, idx_new = _packed_select(acc, nr_ref[b], d2_out[0], idx_out[0],
                                     i, j, k=k, self_mode=self_mode)
    d2_out[0] = d2_new
    idx_out[0] = idx_new


@functools.partial(jax.jit,
                   static_argnames=("k", "self_mode", "interpret", "d_real"))
def knn_select_pallas_smalld_batched(query, ref, k: int,
                                     self_mode: bool = False,
                                     interpret: bool = False,
                                     nr=None, d_real: "int | None" = None):
    """Batched per-coordinate selection: (B, Nq, d) vs (B, Nr, d), d <=
    SMALLD_MAX; same contract as ``knn_select_pallas_packed_batched``.
    ``d_real``: see ``knn_select_pallas_smalld``."""
    bsz, nq, d = query.shape
    assert d <= SMALLD_MAX, f"smalld kernel requires d <= {SMALLD_MAX}"
    if d_real is None:
        d_real = d
    assert 0 < d_real <= d, (d_real, d)
    nr_full = ref.shape[1]
    if nr is None:
        nr = jnp.full((bsz,), nr_full, jnp.int32)
    nr = jnp.asarray(nr, jnp.int32).reshape(bsz)
    k = min(k, nr_full)

    mu = _mu_masked(ref, nr, query.dtype)
    tq = _query_tile(k)
    dpad_s = _round_up(max(d, 1), 8)
    nq_pad = _round_up(nq, tq)
    nr_pad = _round_up(nr_full, TR)
    q = jnp.zeros((bsz, nq_pad, dpad_s), jnp.float32)
    q = q.at[:, :nq, :d].set((query - mu).astype(jnp.float32))
    rt = jnp.zeros((bsz, dpad_s, nr_pad), jnp.float32)
    rt = rt.at[:, :d, :nr_full].set(
        jnp.swapaxes((ref - mu).astype(jnp.float32), 1, 2))

    grid = (bsz, nq_pad // tq, nr_pad // TR)
    kernel = functools.partial(_knn_kernel_packed_smalld_batched, k=k,
                               self_mode=self_mode, d_real=d_real)
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tq, dpad_s), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dpad_s, TR), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, k), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, k), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nq_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nq_pad, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=3 * bsz * nq_pad * nr_pad * d,
            bytes_accessed=(q.size + rt.size) * 4, transcendentals=0),
        interpret=interpret,
    )(nr, q, rt)
    return jnp.maximum(d2[:, :nq], 0.0), idx[:, :nq]


# Base depth of the per-lane bin store in the binned kernel: candidate j
# lands in bin (j mod 128) and each bin retains its depth-L smallest.  A
# true neighbour is lost only when > L of a row's true top-k collide in one
# bin: P ~ C(k, L+1)/128^L ~ 5e-7 per row at L=4, k=9 — and the f64
# refinement stage bounds the ln Z impact of a loss to ~1e-8.  The loss
# probability grows combinatorially with k (C(26, 5)/128^4 ~ 2.4e-4 put ~1
# bad row per 4096-query cert run — caught on chip by the round-5
# sufficiency-retry cert leg), so the store depth scales with k:
BINS_DEPTH = 4
NBINS = 128


def bins_depth_for(k: int) -> int:
    """Smallest bin-store depth L >= BINS_DEPTH that keeps the per-row
    probability of losing a true neighbour (> L of the top-k hashing into
    one of the NBINS lane bins) at or below the long-certified k=9/L=4
    level: C(k, L+1)/NBINS^L <= 5e-7.  k<=9 -> 4 (the certified hot path,
    unchanged), k<=17 -> 5, k<=30 -> 6 (covers the sufficiency-retry
    regime's k~26), then one more level per ~2x k.  Each level costs one
    more insertion sweep per candidate group and one more (tq, NBINS)
    scratch buffer — VMEM-trivial next to the distance tiles."""
    L = BINS_DEPTH
    while math.comb(k, L + 1) / float(NBINS) ** L > 5e-7:
        L += 1
    return L


def _knn_kernel_binned(nr_ref, q_ref, r_ref, d2_out, idx_out, *bins,
                       k: int, self_mode: bool, depth: int):
    """Binned selection (TPU-KNN-style, PAPERS.md): per ref tile, candidates
    stream through a depth-L compare-swap chain into 128 lane bins (cost
    independent of k); the exact top-k extraction runs ONCE per query tile
    over the L*128 bin store after the ref sweep.  ``depth`` scales with k
    (``bins_depth_for``) so the collision-loss probability stays at the
    certified level through the sufficiency-retry regime's k~26.

    ``bins``: 2*depth scratch refs — d2 level buffers then idx level
    buffers, each (TQ, NBINS).  Kept as separate buffers because Mosaic
    rejects lane-dimension strided slices of a wide scratch."""
    bin_d2 = bins[:depth]
    bin_idx = bins[depth:]
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _init():
        for lvl in range(depth):
            bin_d2[lvl][:] = jnp.full_like(bin_d2[lvl], jnp.inf)
            bin_idx[lvl][:] = jnp.full_like(bin_idx[lvl], -1)

    nr = nr_ref[0]
    q = q_ref[:]
    tq = q.shape[0]          # query tile height from the block (k-dependent)
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    if self_mode:
        grow = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, NBINS), 0)

    # stream TR/NBINS candidate groups through the depth-L insertion chain;
    # each group gets its own (TQ, dpad)@(dpad, NBINS) MXU pass (sublane
    # slicing of r — Mosaic rejects lane slices/reshapes of the wide tile).
    # fori_loop keeps the program small: one group body, not TR/NBINS copies.
    iota_cols = jax.lax.broadcasted_iota(jnp.int32, (tq, NBINS), 1)

    def group_body(rblk, levels):
        levels_d2 = list(levels[:depth])
        levels_idx = list(levels[depth:])
        rg = r_ref[pl.ds(rblk * NBINS, NBINS), :]
        c = _mm_distance(q, rg, q_sq=q_sq)
        ci = j * TR + rblk * NBINS + iota_cols
        c = jnp.where(ci < nr, c, jnp.inf)
        if self_mode:
            c = jnp.where(ci == grow, -1.0, c)
        for lvl in range(depth):
            b, bi = levels_d2[lvl], levels_idx[lvl]
            take = c < b
            levels_d2[lvl] = jnp.where(take, c, b)
            levels_idx[lvl] = jnp.where(take, ci, bi)
            c = jnp.where(take, b, c)
            ci = jnp.where(take, bi, ci)
        return tuple(levels_d2) + tuple(levels_idx)

    init = tuple(bin_d2[lvl][:] for lvl in range(depth)) + \
        tuple(bin_idx[lvl][:] for lvl in range(depth))
    levels = jax.lax.fori_loop(0, TR // NBINS, group_body, init)
    levels_d2 = list(levels[:depth])
    levels_idx = list(levels[depth:])
    for lvl in range(depth):
        bin_d2[lvl][:] = levels_d2[lvl]
        bin_idx[lvl][:] = levels_idx[lvl]

    # last ref tile: exact top-k extraction over the small bin store
    @pl.when(j == nj - 1)
    def _extract():
        cat = jnp.concatenate(levels_d2, axis=1)
        cat_idx = jnp.concatenate(levels_idx, axis=1)
        d2_out[:], idx_out[:] = _extract_topk(cat, cat_idx, k)


@functools.partial(jax.jit,
                   static_argnames=("k", "self_mode", "interpret", "packed"))
def knn_select_pallas_binned(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                             self_mode: bool = False, interpret: bool = False,
                             nr=None, packed: bool = False
                             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Binned-selection variant of ``knn_select_pallas``: ~k-independent VPU
    cost; quasi-exact (see BINS_DEPTH note).  Same contract.

    ``packed=True`` stores each bin as one int32 (d2 pattern + group id):
    2 insertion sweeps per level instead of 5 and half the scratch, at the
    packed kernel's <= 2^-12 relative d2 quantization — opt in ONLY where
    a f64 refinement stage recomputes the distances (requires
    nr <= 2^LOW_BITS * NBINS; silently falls back beyond)."""
    nq = query.shape[0]
    depth = bins_depth_for(min(k, NBINS))
    if k > NBINS * depth:
        # the lane-binned layout holds at most NBINS*depth winners; a
        # silent clamp would break 'same contract' callers stacking engines
        logger.warning("binned kNN engine caps k at %d (requested %d); "
                       "use the exact/packed engine for larger k",
                       NBINS * depth, k)
    k = min(k, NBINS * depth)
    q, r, nr_arr, k, tq, dpad, nq_pad, nr_pad = _prep_single_mxu(
        query, ref, nr, k)

    grid = (nq_pad // tq, nr_pad // TR)
    # packed bins (value + group id in one int32: 2 sweeps/level instead of
    # 5, half the scratch) whenever opted in AND the group id fits
    packed_bins = packed and nr_pad <= (1 << LOW_BITS) * NBINS
    if packed_bins:
        kernel = functools.partial(_knn_kernel_binned_packed, k=k,
                                   self_mode=self_mode, depth=depth)
        scratch = [pltpu.VMEM((tq, NBINS), jnp.int32)
                   for _ in range(depth)]
    else:
        kernel = functools.partial(_knn_kernel_binned, k=k,
                                   self_mode=self_mode, depth=depth)
        scratch = ([pltpu.VMEM((tq, NBINS), jnp.float32)
                    for _ in range(depth)]
                   + [pltpu.VMEM((tq, NBINS), jnp.int32)
                      for _ in range(depth)])
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, dpad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nq_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((nq_pad, k), jnp.int32),
        ],
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(
            flops=2 * nq_pad * nr_pad * dpad,
            bytes_accessed=(q.size + r.size) * 4, transcendentals=0),
        interpret=interpret,
    )(nr_arr, q, r)
    return jnp.maximum(d2[:nq], 0.0), idx[:nq]


def _knn_kernel_binned_packed(nr_ref, q_ref, r_ref, d2_out, idx_out, *bins,
                              k: int, self_mode: bool, depth: int):
    """Packed-bin variant of the binned kernel: each lane bin stores ONE
    int32 per level — high bits the f32 d2 pattern, low LOW_BITS the
    candidate's global group id (gcol // NBINS) — so the depth-L insertion
    chain is min/max swaps (2 VPU sweeps per level instead of 5) and the
    scratch halves (no index buffers).  ``depth`` scales with k
    (``bins_depth_for``).  Requires
    nr_pad <= 2^LOW_BITS * NBINS (= 262144 rows); the wrapper falls back
    to the unpacked kernel beyond.  Same quantization caveat as the packed
    iterative kernel (pair with f64 refinement)."""
    bin_pk = bins
    i = pl.program_id(0)
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    int_inf = jnp.int32(0x7F800000)          # +inf f32 bit pattern

    @pl.when(j == 0)
    def _init():
        for lvl in range(depth):
            bin_pk[lvl][:] = jnp.full_like(bin_pk[lvl], int_inf)

    nr = nr_ref[0]
    q = q_ref[:]
    tq = q.shape[0]          # query tile height from the block (k-dependent)
    q_sq = jnp.sum(q * q, axis=1, keepdims=True)
    iota_cols = jax.lax.broadcasted_iota(jnp.int32, (tq, NBINS), 1)
    if self_mode:
        grow = i * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, NBINS), 0)

    def group_body(rblk, levels):
        levels = list(levels)
        rg = r_ref[pl.ds(rblk * NBINS, NBINS), :]
        c = _mm_distance(q, rg, q_sq=q_sq)
        ci = j * TR + rblk * NBINS + iota_cols
        # clamp BEFORE packing (negative patterns sort reversed as ints);
        # only the exact self pin (-1.0) may stay negative — it is the
        # unique negative so the inverted negative order is irrelevant.
        c = jnp.maximum(c, 0.0)
        c = jnp.where(ci < nr, c, jnp.inf)
        if self_mode:
            c = jnp.where(ci == grow, -1.0, c)
        group = j * (TR // NBINS) + rblk          # scalar: global group id
        pk = (jax.lax.bitcast_convert_type(c, jnp.int32)
              & jnp.int32(~LOW_MASK)) | group
        for lvl in range(depth):
            b = levels[lvl]
            t = jnp.minimum(b, pk)
            pk = jnp.maximum(b, pk)
            levels[lvl] = t
        return tuple(levels)

    init = tuple(bin_pk[lvl][:] for lvl in range(depth))
    levels = jax.lax.fori_loop(0, TR // NBINS, group_body, init)
    for lvl in range(depth):
        bin_pk[lvl][:] = levels[lvl]

    # last ref tile: decode the packed bins, then the exact top-k extraction
    @pl.when(j == nj - 1)
    def _extract():
        lane = jax.lax.broadcasted_iota(jnp.int32, (tq, NBINS), 1)
        d2s, idxs_dec = [], []
        for lvl in range(depth):
            w = levels[lvl]
            d2l = jax.lax.bitcast_convert_type(w & jnp.int32(~LOW_MASK),
                                               jnp.float32)
            gl = (w & jnp.int32(LOW_MASK)) * NBINS + lane
            idxs_dec.append(jnp.where(jnp.isinf(d2l), -1, gl))
            d2s.append(d2l)
        cat = jnp.concatenate(d2s, axis=1)
        cat_idx = jnp.concatenate(idxs_dec, axis=1)
        d2_out[:], idx_out[:] = _extract_topk(cat, cat_idx, k)


_ITER_KERNELS = {"exact": _knn_kernel, "packed": _knn_kernel_packed}


@functools.partial(jax.jit,
                   static_argnames=("k", "self_mode", "interpret", "variant"))
def _knn_select_iter(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                     self_mode: bool = False, interpret: bool = False,
                     nr=None, variant: str = "exact"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared wrapper for the iterative-extraction kernels (exact/packed)."""
    nq = query.shape[0]
    q, r, nr_arr, k, tq, dpad, nq_pad, nr_pad = _prep_single_mxu(
        query, ref, nr, k)

    grid = (nq_pad // tq, nr_pad // TR)
    kernel = functools.partial(_ITER_KERNELS[variant], k=k,
                               self_mode=self_mode)
    flops_mm = 2 * nq_pad * nr_pad * dpad
    d2, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tq, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TR, dpad), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tq, k), lambda i, j: (i, 0),
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
    return _knn_select_iter(query, ref, k, self_mode=self_mode,
                            interpret=interpret, nr=nr, variant="exact")


def knn_select_pallas_packed(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                             self_mode: bool = False, interpret: bool = False,
                             nr=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed value+index selection: ~2x cheaper top-k extraction; returned
    squared distances are quantized down by <= 2^-12 relative (the low
    mantissa bits carry the candidate column).  Same contract otherwise —
    pair with f64 refinement for parity-grade distances."""
    return _knn_select_iter(query, ref, k, self_mode=self_mode,
                            interpret=interpret, nr=nr, variant="packed")


PACKED2_TQ = 256        # doubled-width tiles: half-height query tile fits
                        # the concat + packed copies in scoped VMEM


def knn_select_pallas_packed2(query: jnp.ndarray, ref: jnp.ndarray, k: int,
                              self_mode: bool = False,
                              interpret: bool = False, nr=None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Merge-cadence packed selection with TWO ref tiles per invocation.
    Same contract as ``knn_select_pallas_packed`` with quantization
    <= 2^-11 relative (12-bit local columns).  Production refine-path
    default since round 5: measured 1.12-1.17x the single-tile packed
    kernel on chip (docs/KERNEL_NOTES.md).  Delegates to the generalized
    cadence wrapper at its shipped production point — ONE kernel body to
    maintain (round-5 review); the n_tiles loop unrolls at trace time to
    the identical two sublane-slice matmuls, so the compiled program is
    unchanged (re-certified on chip, scripts/tpu_kernel_cert.py)."""
    return knn_select_pallas_packedn(query, ref, k, n_tiles=2,
                                     tq=PACKED2_TQ, self_mode=self_mode,
                                     interpret=interpret, nr=nr)
