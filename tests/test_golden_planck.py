"""Golden regression against the published Planck full-grid tables.

The reference ships its published run outputs (planck_fullgrid_R2/, the
"no evidence for extensions to LCDM" tables) but NOT the input chains (they
are an external ~multi-GB download).  When a real grid directory is provided
via MCE_PLANCK_GRID (and golden tables via MCE_PLANCK_GOLDEN), this test
recomputes ln E for every available cell and compares against the golden
AllChains values within a PER-CELL tolerance derived from the reference's
own reproducibility scatter: the published ``Err_lnE_k1`` column
(std over 4 chains / sqrt(4), reference planck_mcevidence.py:370-372).

Tolerance = max(3 x Err_lnE_k1, 0.05) per cell — decisive against the
published scatter (~0.01-0.06 in ln E), with a floor because an AllChains
value combines 4x the samples of any single chain (its own scatter is
smaller than the per-chain Err, never larger).  Cells with no published
Err fall back to a loose 0.5 config-mistake bound.

Without the chains the test skips — the mechanism itself is exercised by
tests/test_planck.py on a synthetic mini-grid, and the tolerance
derivation below is unit-tested unconditionally.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

GRID = os.environ.get("MCE_PLANCK_GRID", "")
GOLDEN = os.environ.get("MCE_PLANCK_GOLDEN", "")

TOL_FLOOR = 0.05    # AllChains scatter <= per-chain Err; floor vs tiny Errs
TOL_FALLBACK = 0.5  # no published Err for the cell: config-mistake bound


def _singlechains_csv_for(golden_csv: str) -> str:
    """The SingleChains csv carrying Err_lnE_k1 for the same dataset.

    The published layout is planck_fullgrid_R2/{AllChains,SingleChains}/csv/
    mce_<dataset>.csv; MCE_PLANCK_GOLDEN conventionally points at one of the
    two csv dirs."""
    if os.sep + "SingleChains" + os.sep in golden_csv:
        return golden_csv
    return golden_csv.replace(os.sep + "AllChains" + os.sep,
                              os.sep + "SingleChains" + os.sep)


def per_cell_tolerance(golden_csv: str) -> "pd.Series":
    """model -> |dlnE| tolerance, from the golden run's own Err_lnE_k1."""
    sc = _singlechains_csv_for(golden_csv)
    if os.path.exists(sc):
        df = pd.read_csv(sc, index_col=0)
        if "Err_lnE_k1" in df.columns:
            err = pd.to_numeric(df["Err_lnE_k1"], errors="coerce")
            return (3.0 * err).clip(lower=TOL_FLOOR).fillna(TOL_FALLBACK)
    return pd.Series(dtype=float)


def test_tolerance_derivation_from_bundled_goldens():
    """Unconditional: the tolerance rule applied to the reference's own
    bundled tables (always present at /root/reference) yields decisive
    per-cell bounds, not the old flat 0.5."""
    bundled = sorted(glob.glob(
        "/root/reference/planck_fullgrid_R2/AllChains/csv/mce_*.csv"))
    if not bundled:
        pytest.skip("reference golden tables not present")
    tol = per_cell_tolerance(bundled[0])
    assert len(tol) > 0
    assert (tol >= TOL_FLOOR).all()
    assert (tol.dropna() < TOL_FALLBACK).all()   # all decisive on this file
    # spot value: base @ plikHM_TT_lowTEB has Err 0.0604 -> tol 0.1813
    base = [c for c in bundled if c.endswith("mce_plikHM_TT_lowTEB.csv")]
    if base:
        t = per_cell_tolerance(base[0])
        assert t.loc["base"] == pytest.approx(3 * 0.0604288203275, rel=1e-6)


needs_chains = pytest.mark.skipif(
    not (GRID and os.path.isdir(GRID) and GOLDEN and os.path.isdir(GOLDEN)),
    reason="set MCE_PLANCK_GRID (chain dir) and MCE_PLANCK_GOLDEN "
           "(published csv dir) to run the golden regression")


# The published numbers were produced with k=1 (kmax=2), no burn/thin, and
# the H0 Riess-2016 importance prior (reference planck_mcevidence.py defaults)
@needs_chains
def test_golden_allchains_cells():
    from mcevidence_tpu import planck

    golden_csvs = sorted(glob.glob(os.path.join(GOLDEN, "mce_*.csv")))
    assert golden_csvs, f"no golden csvs under {GOLDEN}"
    checked = 0
    for gcsv in golden_csvs:
        dataset = os.path.basename(gcsv)[len("mce_"):-len(".csv")]
        gold = pd.read_csv(gcsv, index_col=0)
        tol = per_cell_tolerance(gcsv)
        df = planck.dataset_evidence(GRID, dataset, kmax=2, verbose=0)
        if df is None:
            continue
        for model in df.index:
            if model not in gold.index:
                continue
            ours = df.loc[model, "AllChains"]
            theirs = gold.loc[model, "AllChains"]
            if np.isnan(ours) or np.isnan(theirs):
                continue
            bound = float(tol.get(model, TOL_FALLBACK))
            assert abs(ours - theirs) < bound, (dataset, model, ours,
                                                theirs, bound)
            checked += 1
    assert checked > 0, "no overlapping cells were compared"
