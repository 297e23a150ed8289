"""Pallas kernel correctness in interpreter mode (runs on the CPU suite;
the compiled kernel is exercised on real TPU by bench.py / __graft_entry__)."""

import numpy as np
import pytest
from sklearn.neighbors import NearestNeighbors

import jax.numpy as jnp

from mcevidence_tpu.ops.knn_pallas import knn_select_pallas


@pytest.mark.parametrize("n,d,k", [(300, 5, 6), (517, 3, 4)])
def test_pallas_self_mode_interpret(rng, n, d, k):
    x = rng.normal(size=(n, d)).astype(np.float32)
    d2, idx = knn_select_pallas(jnp.asarray(x), jnp.asarray(x), k,
                                self_mode=True, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    sk_d, sk_i = NearestNeighbors(n_neighbors=k).fit(x).kneighbors(x)
    assert np.all(idx[:, 0] == np.arange(n))
    assert np.all(d2[:, 0] == 0.0)
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(sk_i, axis=1))
    np.testing.assert_allclose(np.sqrt(d2), sk_d, atol=1e-4)


def test_pallas_cross_mode_interpret(rng):
    q = rng.normal(size=(130, 4)).astype(np.float32)
    r = rng.normal(size=(1030, 4)).astype(np.float32)   # 2 ref tiles + padding
    d2, idx = knn_select_pallas(jnp.asarray(q), jnp.asarray(r), 5,
                                interpret=True)
    idx = np.asarray(idx)
    assert np.all(idx >= 0) and np.all(idx < 1030)
    sk_d, sk_i = NearestNeighbors(n_neighbors=5).fit(r).kneighbors(q)
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(sk_i, axis=1))
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), sk_d, atol=1e-4)


def test_pallas_binned_self_mode_interpret(rng):
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_binned
    n, d, k = 400, 5, 6
    x = rng.normal(size=(n, d)).astype(np.float32)
    d2, idx = knn_select_pallas_binned(jnp.asarray(x), jnp.asarray(x), k,
                                       self_mode=True, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    sk_d, sk_i = NearestNeighbors(n_neighbors=k).fit(x).kneighbors(x)
    assert np.all(idx[:, 0] == np.arange(n))
    # bin collisions are ~1e-6-probability events; at this size expect exact
    match = np.mean(np.sort(idx, axis=1) == np.sort(sk_i, axis=1))
    assert match == 1.0
    np.testing.assert_allclose(np.sqrt(d2), sk_d, atol=1e-4)


def test_pallas_binned_cross_interpret(rng):
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_binned
    q = rng.normal(size=(70, 4)).astype(np.float32)
    r = rng.normal(size=(900, 4)).astype(np.float32)
    d2, idx = knn_select_pallas_binned(jnp.asarray(q), jnp.asarray(r), 5,
                                       interpret=True)
    sk_d, sk_i = NearestNeighbors(n_neighbors=5).fit(r).kneighbors(q)
    np.testing.assert_array_equal(np.sort(np.asarray(idx), axis=1),
                                  np.sort(sk_i, axis=1))
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), sk_d, atol=1e-4)


@pytest.mark.parametrize("n,d,k", [(300, 5, 6), (517, 3, 4)])
def test_pallas_packed_self_mode_interpret(rng, n, d, k):
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_packed
    x = rng.normal(size=(n, d)).astype(np.float32)
    d2, idx = knn_select_pallas_packed(jnp.asarray(x), jnp.asarray(x), k,
                                       self_mode=True, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    sk_d, sk_i = NearestNeighbors(n_neighbors=k).fit(x).kneighbors(x)
    assert np.all(idx[:, 0] == np.arange(n))
    assert np.all(d2[:, 0] == 0.0)
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(sk_i, axis=1))
    # distances are quantized DOWN by <= 2^-12 relative (low mantissa bits
    # carry the packed column id)
    assert np.all(d2 <= sk_d ** 2 + 1e-6)
    np.testing.assert_allclose(np.sqrt(d2), sk_d, rtol=2.0 ** -12, atol=1e-4)


def test_pallas_packed_cross_interpret(rng):
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_packed
    q = rng.normal(size=(130, 4)).astype(np.float32)
    r = rng.normal(size=(1030, 4)).astype(np.float32)
    d2, idx = knn_select_pallas_packed(jnp.asarray(q), jnp.asarray(r), 5,
                                       interpret=True)
    idx = np.asarray(idx)
    assert np.all(idx >= 0) and np.all(idx < 1030)
    sk_d, sk_i = NearestNeighbors(n_neighbors=5).fit(r).kneighbors(q)
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(sk_i, axis=1))
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), sk_d,
                               rtol=2.0 ** -12, atol=1e-4)


def _f64_dist_at(query, ref, idx):
    """f64 distances recomputed at the returned indices (the cert-script
    criterion: near-ties inside a quantizing kernel's noise legitimately
    swap rank, so raw index equality is not the contract — the recomputed
    k-th distance is)."""
    q = np.asarray(query, np.float64)
    r = np.asarray(ref, np.float64)
    d2 = np.sum((q[:, None, :] - r[np.maximum(idx, 0)]) ** 2, axis=-1)
    return np.sqrt(np.sort(np.where(idx < 0, np.inf, d2), axis=1))


@pytest.mark.parametrize("n,d,k", [(300, 5, 6), (517, 3, 4)])
def test_pallas_packed2_self_mode_interpret(rng, n, d, k):
    """Merge-cadence experiment kernel (two ref tiles per invocation,
    12-bit local columns => <= 2^-11 distance quantization)."""
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_packed2
    x = rng.normal(size=(n, d)).astype(np.float32)
    d2, idx = knn_select_pallas_packed2(jnp.asarray(x), jnp.asarray(x), k,
                                        self_mode=True, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    sk_d, _ = NearestNeighbors(n_neighbors=k).fit(x).kneighbors(x)
    assert np.all(idx[:, 0] == np.arange(n))
    assert np.all(d2[:, 0] == 0.0)
    np.testing.assert_allclose(_f64_dist_at(x, x, idx), sk_d,
                               rtol=2.0 ** -11, atol=1e-4)
    assert np.all(d2 <= sk_d ** 2 + 1e-6)      # quantization is DOWNward
    np.testing.assert_allclose(np.sqrt(d2), sk_d, rtol=2.0 ** -11, atol=1e-4)


def test_pallas_packed2_cross_runtime_nr(rng):
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_packed2
    q = rng.normal(size=(130, 4)).astype(np.float32)
    r = rng.normal(size=(1030, 4)).astype(np.float32)
    r_poison = np.concatenate(
        [r, 1e6 * rng.normal(size=(200, 4)).astype(np.float32)])
    d2, idx = knn_select_pallas_packed2(jnp.asarray(q),
                                        jnp.asarray(r_poison), 5,
                                        interpret=True, nr=1030)
    idx = np.asarray(idx)
    assert np.all(idx >= 0) and np.all(idx < 1030)
    sk_d, _ = NearestNeighbors(n_neighbors=5).fit(r).kneighbors(q)
    np.testing.assert_allclose(_f64_dist_at(q, r, idx), sk_d,
                               rtol=2.0 ** -11, atol=1e-4)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), sk_d,
                               rtol=2.0 ** -11, atol=1e-4)


def test_pallas_packed_nr_masking(rng):
    # rows beyond the runtime nr scalar are padding and must never win
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_packed
    r = rng.normal(size=(600, 3)).astype(np.float32)
    q = r[:100]
    r_padded = np.concatenate([r, np.zeros((200, 3), np.float32)])
    d2, idx = knn_select_pallas_packed(jnp.asarray(q), jnp.asarray(r_padded),
                                       4, self_mode=True, interpret=True,
                                       nr=600)
    assert np.all(np.asarray(idx) < 600)


def test_pallas_packed_batched_interpret(rng):
    # kernel-level batching: per-member runtime counts in an SMEM array
    from mcevidence_tpu.ops.knn_pallas import (knn_select_pallas_packed,
                                               knn_select_pallas_packed_batched)
    xs = [rng.normal(size=(400, 5)).astype(np.float32) for _ in range(3)]
    ns = [400, 311, 287]
    batch = np.zeros((3, 400, 5), np.float32)
    for b, (x, n) in enumerate(zip(xs, ns)):
        batch[b, :n] = x[:n]
    d2b, idxb = knn_select_pallas_packed_batched(
        jnp.asarray(batch), jnp.asarray(batch), 4, self_mode=True,
        interpret=True, nr=np.asarray(ns, np.int32))
    for b, n in enumerate(ns):
        d2s, idxs = knn_select_pallas_packed(
            jnp.asarray(batch[b]), jnp.asarray(batch[b]), 4,
            self_mode=True, interpret=True, nr=n)
        np.testing.assert_array_equal(np.asarray(idxb)[b, :n],
                                      np.asarray(idxs)[:n])
        np.testing.assert_allclose(np.asarray(d2b)[b, :n],
                                   np.asarray(d2s)[:n], rtol=1e-6)


@pytest.mark.parametrize("n_tiles,tq", [(1, 512), (2, 256), (4, 128)])
def test_pallas_packedn_sweep_interpret(rng, n_tiles, tq):
    """Generalized merge-cadence sweep kernel (bench harness): each config
    must return true neighbours with quantization <= 2^(log2(n)-12)."""
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_packedn
    x = rng.normal(size=(530, 5)).astype(np.float32)
    d2, idx = knn_select_pallas_packedn(jnp.asarray(x), jnp.asarray(x), 5,
                                        n_tiles=n_tiles, tq=tq,
                                        self_mode=True, interpret=True)
    idx = np.asarray(idx)
    sk_d, _ = NearestNeighbors(n_neighbors=5).fit(x).kneighbors(x)
    assert np.all(idx[:, 0] == np.arange(530))
    tol = 2.0 ** (max(0, n_tiles.bit_length() - 1) - 12)
    np.testing.assert_allclose(_f64_dist_at(x, x, idx), sk_d,
                               rtol=tol, atol=1e-4)
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), sk_d,
                               rtol=tol, atol=1e-4)


def test_pallas_packed2_batched_interpret(rng):
    # merge-cadence batched variant: per-member runtime counts, each member
    # must match the single-cell packed2 kernel exactly
    from mcevidence_tpu.ops.knn_pallas import (
        knn_select_pallas_packed2, knn_select_pallas_packed2_batched)
    xs = [rng.normal(size=(400, 5)).astype(np.float32) for _ in range(3)]
    ns = [400, 311, 287]
    batch = np.zeros((3, 400, 5), np.float32)
    for b, (x, n) in enumerate(zip(xs, ns)):
        batch[b, :n] = x[:n]
    d2b, idxb = knn_select_pallas_packed2_batched(
        jnp.asarray(batch), jnp.asarray(batch), 4, self_mode=True,
        interpret=True, nr=np.asarray(ns, np.int32))
    for b, n in enumerate(ns):
        d2s, idxs = knn_select_pallas_packed2(
            jnp.asarray(batch[b]), jnp.asarray(batch[b]), 4,
            self_mode=True, interpret=True, nr=n)
        np.testing.assert_array_equal(np.asarray(idxb)[b, :n],
                                      np.asarray(idxs)[:n])
        np.testing.assert_allclose(np.asarray(d2b)[b, :n],
                                   np.asarray(d2s)[:n], rtol=1e-6)
        # sklearn cross-check on the valid rows
        sk_d, _ = NearestNeighbors(n_neighbors=4).fit(
            batch[b, :n]).kneighbors(batch[b, :n])
        np.testing.assert_allclose(
            _f64_dist_at(batch[b, :n], batch[b, :n],
                         np.asarray(idxb)[b, :n]),
            sk_d, rtol=2.0 ** -11, atol=1e-4)


def test_pallas_binned_packed_interpret(rng):
    """Packed-bin variant: exact candidate INDICES (d2 quantized <= 2^-11
    relative — the refine stage recomputes distances in f64)."""
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_binned
    n, d, k = 400, 5, 6
    x = rng.normal(size=(n, d)).astype(np.float32)
    d2, idx = knn_select_pallas_binned(jnp.asarray(x), jnp.asarray(x), k,
                                       self_mode=True, interpret=True,
                                       packed=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    sk_d, sk_i = NearestNeighbors(n_neighbors=k).fit(x).kneighbors(x)
    assert np.all(idx[:, 0] == np.arange(n))
    match = np.mean(np.sort(idx, axis=1) == np.sort(sk_i, axis=1))
    assert match == 1.0
    np.testing.assert_allclose(np.sqrt(d2), sk_d, rtol=2e-3, atol=1e-6)


def test_pallas_binned_packed_cross_runtime_nr(rng):
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_binned
    q = rng.normal(size=(70, 4)).astype(np.float32)
    r = np.zeros((900, 4), np.float32)
    r[:730] = rng.normal(size=(730, 4))
    d2, idx = knn_select_pallas_binned(jnp.asarray(q), jnp.asarray(r), 5,
                                       interpret=True, packed=True, nr=730)
    idx = np.asarray(idx)
    sk_d, sk_i = NearestNeighbors(n_neighbors=5).fit(r[:730]).kneighbors(q)
    assert np.mean(np.sort(idx, axis=1) == np.sort(sk_i, axis=1)) == 1.0
    assert idx.max() < 730


def test_bins_depth_schedule():
    """Pin the k -> bin-store depth schedule: smallest L >= 4 keeping the
    per-row collision-loss probability C(k, L+1)/128^L at or below the
    long-certified k=9/L=4 level (~5e-7).  The hot path (k <= 9) must stay
    at depth 4 — no perf change — while the sufficiency-retry regime
    (k ~ 26) gets the depth that fixes the on-chip k=26 cert failure."""
    from mcevidence_tpu.ops.knn_pallas import bins_depth_for
    assert [bins_depth_for(k) for k in (1, 5, 9)] == [4, 4, 4]
    assert [bins_depth_for(k) for k in (10, 14, 17)] == [5, 5, 5]
    assert [bins_depth_for(k) for k in (18, 26, 30)] == [6, 6, 6]
    assert bins_depth_for(31) == 7


@pytest.mark.parametrize("packed", [False, True])
def test_pallas_binned_survives_bin_collisions_at_retry_k(packed):
    """REGRESSION (round-5 on-chip cert): at the sufficiency-retry regime's
    k~26 the fixed depth-4 bin store lost true neighbours whenever > 4 of a
    row's top-k hashed into one lane bin (P ~ 2.4e-4/row at k=26 — ~1 bad
    row per 4096-query cert run, rel err 1.3e-2 >> the 2^-10 band).  This
    plants SIX of the top-26 in lane bin 7 (indices = 7 mod 128): the old
    kernel provably drops two; the depth-6 store (bins_depth_for(26)) must
    return every planted neighbour, both bin packings."""
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_binned
    nr, d, k = 1024, 4, 26
    planted = 135 + 128 * np.arange(6)            # all in bin 7, >4 deep
    r = np.zeros((nr, d), np.float32)
    r[:, 0] = np.sqrt(10000.0 + np.arange(nr))    # ultra-far floor
    r[16:616, 0] = np.sqrt(100.0 + np.arange(600))  # far band: top-k filler
    r[planted, 0] = np.sqrt(0.01 * (1 + np.arange(6)))   # the planted six
    q = np.zeros((8, d), np.float32)
    d2, idx = knn_select_pallas_binned(jnp.asarray(q), jnp.asarray(r), k,
                                       interpret=True, packed=packed)
    idx = np.asarray(idx)
    for row in range(8):
        assert set(planted) <= set(idx[row]), (
            f"row {row} lost planted neighbours: {sorted(set(idx[row]))}")
    # distance parity against the exact top-k (recomputed from indices)
    all_d2 = np.sum((q[:, None, :] - r[None]) ** 2, axis=-1)
    want = np.sort(all_d2, axis=1)[:, :k]
    got = np.sort(all_d2[np.arange(8)[:, None], idx], axis=1)
    np.testing.assert_allclose(got, want, rtol=2.0 ** -10)


@pytest.mark.parametrize("n,d,k", [(300, 5, 6), (517, 8, 4)])
def test_pallas_smalld_self_mode_interpret(rng, n, d, k):
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_smalld
    x = rng.normal(size=(n, d)).astype(np.float32)
    d2, idx = knn_select_pallas_smalld(jnp.asarray(x), jnp.asarray(x), k,
                                       self_mode=True, interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    sk_d, sk_i = NearestNeighbors(n_neighbors=k).fit(x).kneighbors(x)
    assert np.all(idx[:, 0] == np.arange(n))
    assert np.all(d2[:, 0] == 0.0)
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(sk_i, axis=1))
    # packed extraction: distances quantized down by <= 2^-12 relative
    np.testing.assert_allclose(np.sqrt(d2), sk_d, rtol=2.0 ** -12, atol=1e-4)


def test_pallas_smalld_cross_runtime_nr(rng):
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_smalld
    q = rng.normal(size=(130, 4)).astype(np.float32)
    r = rng.normal(size=(1030, 4)).astype(np.float32)
    # runtime nr masks rows beyond 730
    d2, idx = knn_select_pallas_smalld(jnp.asarray(q), jnp.asarray(r), 5,
                                       interpret=True, nr=730)
    idx = np.asarray(idx)
    assert np.all(idx >= 0) and np.all(idx < 730)
    sk_d, sk_i = NearestNeighbors(n_neighbors=5).fit(r[:730]).kneighbors(q)
    np.testing.assert_array_equal(np.sort(idx, axis=1), np.sort(sk_i, axis=1))
    np.testing.assert_allclose(np.sqrt(np.asarray(d2)), sk_d,
                               rtol=2.0 ** -12, atol=1e-4)


def test_pallas_smalld_batched_interpret(rng):
    # the packed extraction may swap candidates whose distances differ by
    # less than its 2^-12 quantization (resolved downstream by the f64
    # refinement), so assert QUALITY, not identity: every selected
    # candidate's TRUE f64 distance must sit within the quantization
    # window of sklearn's k-th distance.
    from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_smalld_batched
    b, n, d, k = 3, 260, 6, 4
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    ns = [260, 200, 147]
    d2, idx = knn_select_pallas_smalld_batched(
        jnp.asarray(x), jnp.asarray(x), k, self_mode=True, interpret=True,
        nr=np.asarray(ns, np.int32))
    d2, idx = np.asarray(d2), np.asarray(idx)
    for i, nv in enumerate(ns):
        sk_d, _ = NearestNeighbors(n_neighbors=k).fit(
            x[i, :nv]).kneighbors(x[i, :nv])
        assert np.all(idx[i, :nv] >= 0) and np.all(idx[i, :nv] < nv)
        assert np.all(idx[i, :nv, 0] == np.arange(nv))      # self first
        x64 = x[i].astype(np.float64)
        true_d2 = np.sum((x64[:nv, None, :]
                          - x64[idx[i, :nv]]) ** 2, axis=2)
        assert np.all(true_d2 <= (sk_d ** 2) * (1 + 2.0 ** -10) + 1e-6)
        np.testing.assert_allclose(np.sqrt(d2[i, :nv]), sk_d,
                                   rtol=2.0 ** -11, atol=1e-4)


@pytest.mark.parametrize("variant", ["exact", "packed"])
def test_pallas_high_k_small_tile_interpret(rng, variant):
    """k >= 14 switches the iterative kernels to the 256-row query tile
    (the sufficiency-retry regime: retry_pad=24 gives k_sel=26).  The
    TQ=512 tile overflowed scoped VMEM at that k on v5e once the winner
    buffers are accounted (regression: duplicate-heavy chains crashed the
    device pipeline's retry at large row buckets)."""
    from mcevidence_tpu.ops.knn_pallas import (knn_select_pallas,
                                               knn_select_pallas_packed)
    sel = {"exact": knn_select_pallas,
           "packed": knn_select_pallas_packed}[variant]
    n, d, k = 700, 4, 26         # n spans 3 tq=256 tiles incl. padding
    x = rng.normal(size=(n, d)).astype(np.float32)
    d2, idx = sel(jnp.asarray(x), jnp.asarray(x), k, self_mode=True,
                  interpret=True)
    d2, idx = np.asarray(d2), np.asarray(idx)
    sk_d, sk_i = NearestNeighbors(n_neighbors=k).fit(x).kneighbors(x)
    assert np.all(idx[:, 0] == np.arange(n))    # self pin survives offsets
    x64 = x.astype(np.float64)
    if variant == "exact":
        np.testing.assert_array_equal(np.sort(idx, axis=1),
                                      np.sort(sk_i, axis=1))
        np.testing.assert_allclose(np.sqrt(d2), sk_d, rtol=1e-6, atol=1e-4)
    else:
        # packed near-ties within the 2^-12 quantization may swap at the
        # k-th boundary (f64 refinement resolves downstream): assert
        # QUALITY — every selected candidate's true distance within the
        # window of sklearn's k-th
        for r in range(n):
            true_d2 = np.sum((x64[r] - x64[idx[r]]) ** 2, axis=1)
            assert np.all(true_d2 <= (sk_d[r, -1] ** 2) * (1 + 2.0 ** -10)
                          + 1e-6)
        np.testing.assert_allclose(np.sqrt(d2), sk_d, rtol=2.0 ** -11,
                                   atol=1e-4)

    # cross mode at high k: ref padding masked, multi-tile queries
    q = x[:300]
    d2c, idxc = sel(jnp.asarray(q), jnp.asarray(x), k, interpret=True, nr=n)
    sk_dc, sk_ic = NearestNeighbors(n_neighbors=k).fit(x).kneighbors(q)
    idxc = np.asarray(idxc)
    for r in range(q.shape[0]):
        true_d2 = np.sum((x64[r] - x64[idxc[r]]) ** 2, axis=1)
        assert np.all(true_d2 <= (sk_dc[r, -1] ** 2) * (1 + 2.0 ** -10)
                      + 1e-6)


def test_pallas_nonzero_padding_beyond_nr(rng):
    """REGRESSION (round-4 review): the centring mean must exclude rows
    beyond nr.  With garbage (non-zero) padding rows, the unmasked sum
    shifted mu by ~1e8, the f32 cast of (x - mu) lost all signal, and
    every returned neighbour index was wrong."""
    from mcevidence_tpu.ops.knn_pallas import (
        knn_select_pallas, knn_select_pallas_packed,
        knn_select_pallas_packed_batched)
    r = rng.normal(size=(300, 4)).astype(np.float32)
    q = r[:64]
    garbage = np.full((100, 4), 1e8, np.float32)
    r_pad = np.concatenate([r, garbage])
    want_d2, want_idx = knn_select_pallas(
        jnp.asarray(q), jnp.asarray(r), 4, self_mode=False, interpret=True)
    for fn in (knn_select_pallas, knn_select_pallas_packed):
        d2, idx = fn(jnp.asarray(q), jnp.asarray(r_pad), 4,
                     self_mode=False, interpret=True, nr=300)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
        # d2 to the kernels' own noise floors: a 1-ulp mu shift (different
        # summation order over identical rows) surfaces ~|x-mu|^2*eps
        # identity cancellation on self-pairs (atol) and moves packed
        # values across their 2^-12-relative quantization bins (rtol).
        # Downstream consumers refine these distances in f64; the index
        # equality above is the contract.
        np.testing.assert_allclose(np.asarray(d2), np.asarray(want_d2),
                                   rtol=4e-4, atol=2e-6)
    batch_q = np.stack([q, q])
    batch_r = np.stack([r_pad, r_pad])
    d2b, idxb = knn_select_pallas_packed_batched(
        jnp.asarray(batch_q), jnp.asarray(batch_r), 4, self_mode=False,
        interpret=True, nr=np.asarray([300, 300], np.int32))
    for b in range(2):
        np.testing.assert_array_equal(np.asarray(idxb)[b],
                                      np.asarray(want_idx))


def test_absent_slots_return_minus_one(rng):
    """REGRESSION (round-4 review): with fewer than k real reference rows
    (nr < k), the extraction used to re-emit STALE indices for the +inf
    slots — duplicate real neighbours that downstream refine stages would
    double-count into dotp.  Absent slots must decode to (-1, +inf)."""
    from mcevidence_tpu.ops.knn import knn_select_xla
    from mcevidence_tpu.ops.knn_pallas import (
        knn_select_pallas, knn_select_pallas_binned, knn_select_pallas_packed,
        knn_select_pallas_packed_batched, knn_select_pallas_smalld)
    nr, k = 3, 5
    q = rng.normal(size=(8, 4)).astype(np.float32)
    r_pad = np.zeros((4096, 4), np.float32)     # 2 TR tiles
    r_pad[:nr] = rng.normal(size=(nr, 4))
    want_d2, want_idx = knn_select_xla(jnp.asarray(q), jnp.asarray(r_pad),
                                       k, self_mode=False, nr=nr)
    want_idx = np.asarray(want_idx)
    assert np.all(want_idx[:, nr:] == -1)       # the xla oracle's contract
    for fn in (knn_select_pallas, knn_select_pallas_packed,
               knn_select_pallas_binned, knn_select_pallas_smalld):
        d2, idx = fn(jnp.asarray(q), jnp.asarray(r_pad), k,
                     self_mode=False, interpret=True, nr=nr)
        d2, idx = np.asarray(d2), np.asarray(idx)
        assert np.all(idx[:, nr:] == -1), fn.__name__
        assert np.all(np.isinf(d2[:, nr:])), fn.__name__
        np.testing.assert_array_equal(np.sort(idx[:, :nr], axis=1),
                                      np.sort(want_idx[:, :nr], axis=1),
                                      err_msg=fn.__name__)
    # batched with UNEVEN per-member counts: the ring path's k_sel uses the
    # batch max, so the smaller member must pad with -1, not duplicates
    batch_q = np.stack([q, q])
    batch_r = np.stack([r_pad, r_pad])
    big = rng.normal(size=(64, 4)).astype(np.float32)
    batch_r[1, :64] = big
    d2b, idxb = knn_select_pallas_packed_batched(
        jnp.asarray(batch_q), jnp.asarray(batch_r), k, self_mode=False,
        interpret=True, nr=np.asarray([nr, 64], np.int32))
    idxb = np.asarray(idxb)
    assert np.all(idxb[0, :, nr:] == -1)
    assert np.all(idxb[1] >= 0)                 # 64 >= k: all slots real


def test_smalld_d_real_skips_zero_padding_columns(rng):
    """d_real sweeps only the true coordinates of a width-padded input;
    results must match the unpadded call exactly (padding columns are
    zero, so skipping them is exact)."""
    from mcevidence_tpu.ops.knn_pallas import (
        knn_select_pallas_smalld, knn_select_pallas_smalld_batched)
    n, d, dpad, k = 200, 5, 16, 4
    x = rng.normal(size=(n, d)).astype(np.float32)
    xp = np.zeros((n, dpad), np.float32)
    xp[:, :d] = x
    want_d2, want_idx = knn_select_pallas_smalld(
        jnp.asarray(x), jnp.asarray(x), k, self_mode=True, interpret=True)
    d2, idx = knn_select_pallas_smalld(
        jnp.asarray(xp), jnp.asarray(xp), k, self_mode=True, interpret=True,
        d_real=d)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(want_idx))
    np.testing.assert_allclose(np.asarray(d2), np.asarray(want_d2),
                               rtol=0, atol=0)
    d2b, idxb = knn_select_pallas_smalld_batched(
        jnp.asarray(xp[None]), jnp.asarray(xp[None]), k, self_mode=True,
        interpret=True, d_real=d)
    np.testing.assert_array_equal(np.asarray(idxb)[0], np.asarray(want_idx))
