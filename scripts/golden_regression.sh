#!/usr/bin/env bash
# Golden regression against the PUBLISHED Planck results (arXiv:1704.03467).
#
# The reference bundles its published output tables
# (planck_fullgrid_R2/AllChains/csv) but NOT the input chains — they are the
# public multi-GB Planck 2015 parameter-chain release.  This script fetches
# the chains (needs network egress + ~10 GB disk), then runs
# tests/test_golden_planck.py, which recomputes ln E per cell with this
# framework and asserts agreement with the published numbers.
#
# Usage: scripts/golden_regression.sh [workdir] [golden_csv_dir]
set -euo pipefail

WORK=${1:-/tmp/planck_grid}
GOLDEN=${2:-/root/reference/planck_fullgrid_R2/AllChains/csv}
TARBALL_URL="http://irsa.ipac.caltech.edu/data/Planck/release_2/ancillary-data/cosmoparams/COM_CosmoParams_fullGrid_R2.00.tar.gz"

mkdir -p "$WORK"
cd "$WORK"
if [ ! -d COM_CosmoParams_fullGrid_R2.00 ]; then
    echo "fetching Planck R2 full-grid chains (~multi-GB) ..."
    curl -fL -O "$TARBALL_URL"
    tar xzf COM_CosmoParams_fullGrid_R2.00.tar.gz
fi

cd "$(dirname "$0")/.."
MCE_PLANCK_GRID="$WORK/COM_CosmoParams_fullGrid_R2.00" \
MCE_PLANCK_GOLDEN="$GOLDEN" \
python -m pytest tests/test_golden_planck.py -v
