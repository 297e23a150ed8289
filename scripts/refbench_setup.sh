#!/usr/bin/env bash
# Build a runnable copy of the REFERENCE driver for apples-to-apples
# benchmarking against this framework on the synthetic grid
# (scripts/synth_grid.py).  The reference is copied (never modified in
# place) and minimally patched — each patch fixes an environment-compat
# issue or a latent bug on its own dead path; none changes the algorithm:
#   1. mpi4py stub (size=1, rank=0): no MPI on the benchmark host.
#   2. sklearn>=1.3 moved DistanceMetric (the symbol is unused).
#   3. numpy 2 removed np.int.
#   4. h0_gauss_lnp does ParSamples.H0 attribute access, which only worked
#      against a getdist object its bundled reader never produces
#      (SURVEY.md §2.2 quirk); the H0 column is last -> [:, -1].
#   5. pandas>=2 removed Categorical.set_categories(inplace=True).
#
# Usage: scripts/refbench_setup.sh [refdir] [outdir]
#        PYTHONPATH=<outdir> python <outdir>/planck_mcevidence.py ...
set -euo pipefail

REF=${1:-/root/reference}
OUT=${2:-/tmp/refbench}

mkdir -p "$OUT/mpi4py"
cp "$REF/MCEvidence.py" "$REF/planck_mcevidence.py" "$OUT/"

cat > "$OUT/mpi4py/__init__.py" <<'EOF'
"""Single-process mpi4py stand-in (size=1, rank=0; collectives are no-ops)."""


class _Comm:
    def Get_size(self):
        return 1

    def Get_rank(self):
        return 0

    def Barrier(self):
        pass

    def gather(self, obj, root=0):
        return [obj]


class _MPIModule:
    COMM_WORLD = _Comm()


MPI = _MPIModule()
EOF

cd "$OUT"
sed -i 's/from sklearn.neighbors import NearestNeighbors, DistanceMetric/from sklearn.neighbors import NearestNeighbors/' MCEvidence.py
sed -i 's/dtype=np\.int)/dtype=int)/g; s/astype(np\.int)/astype(int)/g' MCEvidence.py planck_mcevidence.py
sed -i 's/np\.int(N\*thin_unit)/int(N*thin_unit)/' MCEvidence.py
sed -i 's/np\.linspace(powmin,powmax,self.nbatch,dtype=np\.int)/np.linspace(powmin,powmax,self.nbatch,dtype=int)/' MCEvidence.py
sed -i 's/frac=(ParSamples\.H0 - H0)\/H0_Err/frac=(ParSamples[:,-1] - H0)\/H0_Err/' planck_mcevidence.py
python - <<'EOF'
src = open("planck_mcevidence.py").read()
src = src.replace(
    "        df['l2'] = df['l2'].astype(\"category\")\n"
    "        df['l2'].cat.set_categories(sorter, inplace=True)    \n",
    "        df['l2'] = df['l2'].astype(\"category\")\n"
    "        df['l2'] = df['l2'].cat.set_categories(sorter)\n")
src = src.replace(
    "    s.cat.set_categories(DataSets, inplace=True)\n",
    "    s = s.cat.set_categories(DataSets)\n")
open("planck_mcevidence.py", "w").write(src)
EOF
echo "reference benchmark harness ready in $OUT"
echo "run:  cd <grid parent dir with COM_CosmoParams_fullGrid_R2.00 symlink>"
echo "      PYTHONPATH=$OUT python $OUT/planck_mcevidence.py -o <outdir>"
