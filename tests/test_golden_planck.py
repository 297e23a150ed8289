"""Golden regression against the published Planck full-grid tables.

The reference ships its published run outputs (planck_fullgrid_R2/, the
"no evidence for extensions to LCDM" tables) but NOT the input chains (they
are an external ~multi-GB download).  When a real grid directory is provided
via MCE_PLANCK_GRID (and golden tables via MCE_PLANCK_GOLDEN), this test
recomputes ln E for every available cell and compares against the golden
AllChains values within the reference's own reproducibility tolerance
(Err_lnE_k1 ~ 0.01-0.06 plus cross-chain scatter; SURVEY.md §4.3).

Without the chains the test skips — the mechanism itself is exercised by
tests/test_planck.py on a synthetic mini-grid.
"""

import glob
import os

import numpy as np
import pandas as pd
import pytest

GRID = os.environ.get("MCE_PLANCK_GRID", "")
GOLDEN = os.environ.get("MCE_PLANCK_GOLDEN", "")

pytestmark = pytest.mark.skipif(
    not (GRID and os.path.isdir(GRID) and GOLDEN and os.path.isdir(GOLDEN)),
    reason="set MCE_PLANCK_GRID (chain dir) and MCE_PLANCK_GOLDEN "
           "(published csv dir) to run the golden regression")

# The published numbers were produced with k=1 (kmax=2), no burn/thin, and
# the H0 Riess-2016 importance prior (reference planck_mcevidence.py defaults)
TOL_LNE = 0.5       # |dlnE| per cell: stat. scatter between reruns is
                    # ~0.01-0.06; 0.5 catches config mistakes, not noise


def test_golden_allchains_cells():
    from mcevidence_tpu import planck

    golden_csvs = sorted(glob.glob(os.path.join(GOLDEN, "mce_*.csv")))
    assert golden_csvs, f"no golden csvs under {GOLDEN}"
    checked = 0
    for gcsv in golden_csvs:
        dataset = os.path.basename(gcsv)[len("mce_"):-len(".csv")]
        gold = pd.read_csv(gcsv, index_col=0)
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
            assert abs(ours - theirs) < TOL_LNE, (dataset, model, ours,
                                                  theirs)
            checked += 1
    assert checked > 0, "no overlapping cells were compared"
