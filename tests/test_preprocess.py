"""Unit tests for burn-in, thinning, splitting (SURVEY.md §4a).

Expected values for the getdist integer-thinning algorithm are hand-computed
by walking the reference algorithm (MCEvidence.py:481-532) on paper.
"""

import numpy as np
import pytest

from mcevidence_tpu.chains import preprocess as pp
from mcevidence_tpu.chains.records import Partition


# ---------------------------------------------------------------- burn-in

def test_burn_fraction():
    chain = np.arange(40.0).reshape(10, 4)
    out = pp.remove_burn(chain, 0.3)
    assert out.shape == (7, 4)
    assert out[0, 0] == 12.0


def test_burn_absolute():
    chain = np.arange(40.0).reshape(10, 4)
    out = pp.remove_burn(chain, 4)
    assert out.shape == (6, 4)
    assert out[0, 0] == 16.0


def test_burn_too_long_raises():
    with pytest.raises(ValueError):
        pp.remove_burn(np.zeros((5, 3)), 7)


# ---------------------------------------------------------------- thinning

def test_thin_indices_coarse_branch():
    # factor >= max(weights): rows grouped by cumsum // factor, first of
    # each group kept.  weights [1,1,1,1,1], factor 2:
    # cumsum//2 = [0,1,1,2,2] -> first indices of {0,1,2} = [0,1,3]
    ix, w = pp.thin_indices(2, np.ones(5))
    np.testing.assert_array_equal(ix, [0, 1, 3])
    np.testing.assert_array_equal(w, [1, 1, 1])


def test_thin_indices_fine_branch():
    # factor < max(weights): hand-walked reference algorithm on
    # weights [3,3], factor 2 emits rows [0,1,1].
    ix, w = pp.thin_indices(2, np.array([3.0, 3.0]))
    np.testing.assert_array_equal(ix, [0, 1, 1])
    np.testing.assert_array_equal(w, [3, 3, 3])


def test_thin_indices_fine_branch_long():
    # weights [2,5,1,4], factor 3, norm=12 -> targets 3,6,9,12
    # cumsum=[2,7,8,12]: rows [1,1,3,3]
    ix, w = pp.thin_indices(3, np.array([2.0, 5.0, 1.0, 4.0]))
    np.testing.assert_array_equal(ix, [1, 1, 3, 3])
    np.testing.assert_array_equal(w, [5, 5, 4, 4])


def test_thin_indices_rejects_float_weights():
    with pytest.raises(ValueError):
        pp.thin_indices(2, np.array([1.5, 2.5, 1.2]))


def test_weighted_thin_keeps_bin_argmax():
    w = np.array([1.0, 9.0, 2.0, 8.0, 3.0, 7.0, 4.0, 6.0])
    ix, new_w = pp.weighted_thin(2, w)   # N2 = 8//2 = 4 bins of 2
    np.testing.assert_array_equal(ix, [1, 3, 5, 7])
    np.testing.assert_array_equal(new_w, [9, 8, 7, 6])


def test_weighted_thin_first_occurrence_tie():
    w = np.array([5.0, 5.0, 3.0, 3.0])
    ix, _ = pp.weighted_thin(2, w)   # ties -> first occurrence (pandas idxmax)
    np.testing.assert_array_equal(ix, [0, 2])


def test_weighted_thin_fraction():
    w = np.ones(10)
    ix, _ = pp.weighted_thin(0.5, w)  # N2 = int(10*0.5) = 5 bins
    assert len(ix) == 5


def test_poisson_thin_statistics(rng):
    w = rng.integers(1, 10, size=5000).astype(float)
    ix, new_w = pp.poisson_thin(0.3, w, rng=rng)
    # E[sum new_w] = 0.3 * sum w
    assert np.isclose(np.sum(new_w), 0.3 * np.sum(w), rtol=0.05)
    assert np.all(new_w > 0)


def test_get_thin_index_dispatch(rng):
    w_int = np.ones(100)
    new_w, ix = pp.get_thin_index(2, w_int, rng=rng)
    assert len(ix) == len(new_w)
    # non-integer weights fall back to weighted binning
    w_float = rng.random(100) + 0.5
    new_w2, ix2 = pp.get_thin_index(2, w_float, rng=rng)
    assert len(ix2) == 50
    # fractional nthin uses Poisson
    new_w3, ix3 = pp.get_thin_index(0.5, w_int, rng=rng)
    assert np.all(new_w3 > 0)


def test_thin_chain_writes_new_weights(rng):
    chain = np.column_stack([np.full(20, 2.0), np.zeros(20),
                             np.arange(20.0)])
    out = pp.thin_chain(chain, 2, rng=rng)
    # integer weights 2, factor 2 (coarse): every row kept once with weight 2
    assert out.shape[1] == 3
    assert np.all(out[:, 0] == 2.0)


# ---------------------------------------------------------------- split

def test_split_rows_partition(rng):
    ix, not_ix = pp.split_rows(100, 0.5, rng=rng)
    assert len(ix) == 50 and len(not_ix) == 50
    assert len(np.intersect1d(ix, not_ix)) == 0
    assert len(np.union1d(ix, not_ix)) == 100


def test_split_rows_injected_indices():
    ix_in = np.array([4, 1, 7])
    ix, not_ix = pp.split_rows(10, 0.3, ix=ix_in)
    np.testing.assert_array_equal(ix, ix_in)   # preserves sampled order
    np.testing.assert_array_equal(not_ix, [0, 2, 3, 5, 6, 8, 9])


def test_build_chain_pair_pipeline(rng):
    chains = [np.column_stack([np.ones(100), np.zeros(100),
                               rng.normal(size=(100, 3))]) for _ in range(4)]
    pair = pp.build_chain_pair(chains, burnlen=0.1, thinlen=0, split=False)
    assert pair.s1.nsamples == 4 * 90
    assert pair.s1.ndim == 3
    assert pair.nchains == 4
    np.testing.assert_array_equal(pair.chain_offsets, [0, 90, 180, 270, 360])

    pair2 = pp.build_chain_pair(chains, split=True, s1frac=0.5, rng=rng)
    assert pair2.split
    assert pair2.s1.nsamples + pair2.s2.nsamples == 400


# ---------------------------------------------------------------- importance

def test_importance_sample_adjusts_only_aweights(rng):
    p = Partition.from_columns(
        np.column_stack([np.full(10, 2.0), np.zeros(10),
                         rng.normal(size=(10, 2))]))
    from mcevidence_tpu.chains.records import ChainPair
    pair = ChainPair(s1=p)
    out = pp.importance_sample(pair, lambda s: np.full(len(s), np.log(2.0)))
    # adjusted weights halved, raw weights untouched (quirk Q7)
    np.testing.assert_allclose(out.s1.adjusted_weights, 1.0)
    np.testing.assert_allclose(out.s1.weights, 2.0)


# ---------------------------------------------------------------- autocorr

def test_autocorr_time_iid_vs_correlated(rng):
    iid = rng.normal(size=4000)
    assert pp.autocorr_time(iid) < 2.0
    # AR(1) with phi=0.9: tau = (1+phi)/(1-phi) = 19
    phi, n = 0.9, 20000
    ar = np.empty(n)
    ar[0] = 0.0
    eps = rng.normal(size=n)
    for i in range(1, n):
        ar[i] = phi * ar[i - 1] + eps[i]
    tau = pp.autocorr_time(ar)
    assert 10 < tau < 30, tau


def test_autocorr_thin_factor_and_pipeline(rng):
    phi, n = 0.8, 5000
    ar = np.empty((n, 2))
    ar[0] = 0.0
    eps = rng.normal(size=(n, 2))
    for i in range(1, n):
        ar[i] = phi * ar[i - 1] + eps[i]
    chain = np.column_stack([np.ones(n), np.zeros(n), ar])
    factor = pp.autocorr_thin_factor(ar)
    assert factor > 3          # tau(0.8) = 9
    pair = pp.build_chain_pair([chain], thinlen=-1.0)
    assert pair.s1.nsamples < n // 3


def test_autocorr_tau_per_chain_not_concatenated(rng):
    """Two nearly-iid chains with different means: the concatenated ACF sees
    the mean shift as long-range correlation and inflates tau; per-chain tau
    (what build_chain_pair uses) stays ~1."""
    n = 4000
    c1 = rng.normal(0.0, 1.0, size=(n, 1))
    c2 = rng.normal(8.0, 1.0, size=(n, 1))
    tau_concat = pp.autocorr_time(np.concatenate([c1, c2])[:, 0])
    tau_per = max(pp.autocorr_time(c1[:, 0]), pp.autocorr_time(c2[:, 0]))
    assert tau_concat > 5 * tau_per, (tau_concat, tau_per)
    assert tau_per < 2.0

    def mk(c):
        m = len(c)
        return np.column_stack([np.ones(m), np.zeros(m), c])

    # the pipeline must use the unbiased per-chain construction: with two
    # iid chains, thinlen=-1 should keep (almost) everything
    pair = pp.build_chain_pair([mk(c1), mk(c2)], thinlen=-1.0)
    assert pair.s1.nsamples == 2 * n


def test_weighted_thin_fractional_factor(rng):
    # thin_unit=2.5 must make N//2.5 bins, not N//2 (floor of the factor)
    ix, _ = pp.weighted_thin(2.5, rng.random(1000) + 0.5)
    assert len(ix) == 400
