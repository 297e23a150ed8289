"""Property-based tests (hypothesis) for the thinning algorithms — these
row-selection routines feed every downstream estimate, and the reference
had no tests at all (SURVEY.md §4)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

from mcevidence_tpu.chains.preprocess import (poisson_thin, remove_burn,
                                              thin_indices, weighted_thin)

int_weights = hnp.arrays(np.int64, st.integers(4, 300),
                         elements=st.integers(1, 20))
pos_weights = hnp.arrays(np.float64, st.integers(4, 300),
                         elements=st.floats(0.1, 50.0, allow_nan=False))


@settings(max_examples=60, deadline=None)
@given(int_weights, st.integers(1, 9))
def test_thin_indices_properties(w, factor):
    # semantics verified bit-identical to the reference's getdist port
    # (docs/PARITY.md): rows may REPEAT when factor < weight (each kept
    # entry is one retained unit sample's row)
    ix, new_w = thin_indices(factor, w)
    assert np.all(np.diff(ix) >= 0)           # non-decreasing
    assert ix.min() >= 0 and ix.max() < len(w)
    np.testing.assert_array_equal(new_w, w[ix])
    norm = int(w.sum())
    if factor >= w.max():
        # unique-cumsum branch: one row per distinct cumsum//factor value
        kept = len(np.unique(np.cumsum(w.astype(np.int64)) // factor))
        assert len(ix) == kept
        assert np.all(np.diff(ix) > 0)        # no repeats in this regime
    else:
        # unit-walk branch keeps exactly norm // factor unit samples
        assert len(ix) == norm // factor
    if factor == 1 and w.max() == 1:
        np.testing.assert_array_equal(ix, np.arange(len(w)))


@settings(max_examples=60, deadline=None)
@given(pos_weights, st.floats(0.05, 0.9))
def test_poisson_thin_properties(w, frac):
    rng = np.random.default_rng(0)
    ix, new_w = poisson_thin(frac, w, rng=rng)
    assert np.all(np.diff(ix) > 0)
    assert np.all(new_w > 0)
    # unbiasedness in expectation: E[sum new_w] = frac * sum w — check a
    # generous 6-sigma Poisson bound
    mean = frac * w.sum()
    assert abs(new_w.sum() - mean) <= 6.0 * np.sqrt(mean) + 1


@settings(max_examples=60, deadline=None)
@given(pos_weights, st.floats(1.0, 8.0))
def test_weighted_thin_properties(w, unit):
    from hypothesis import assume
    assume(int(len(w) // unit) >= 1)    # thin_unit > n legitimately raises
    ix, new_w = weighted_thin(unit, w)
    assert np.all(np.diff(ix) > 0)
    n2 = int(len(w) // unit)
    # one representative per non-empty bin
    assert len(ix) <= max(n2, 1)
    # the kept row of each bin carries that bin's max weight
    assert np.all(np.isin(new_w, w))


@settings(max_examples=60, deadline=None)
@given(st.integers(5, 500), st.floats(0.0, 0.95))
def test_remove_burn_fraction(n, frac):
    chain = np.arange(n, dtype=float).reshape(-1, 1)
    out = remove_burn(chain, frac)
    assert len(out) == n - int(frac * n)
    # keeps the TAIL
    if len(out):
        assert out[-1, 0] == n - 1
