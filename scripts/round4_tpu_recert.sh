#!/bin/bash
# Round-4 TPU re-certification: run the moment the relay is reachable.
#
# 1. bench.py (kernel-level pairs/s + MFU + parity fields, phased watchdog)
# 2. serve concurrency scaling (VERDICT r3 item 5: 2k-8k rows, 1/2/4 clients)
# 3. (optional, $1=grid dir) full synthetic Planck grid, warm-process, with
#    cell-by-cell parity vs the reference outputs if $2 points at them.
#
# Everything is bounded: a relay flap mid-run yields failure lines/timeouts,
# never a hang.  Results land in /tmp/r4_recert/.
set -u -o pipefail   # a FAILing cert leg must not vanish behind tee's rc
cd "$(dirname "$0")/.."
OUT=/tmp/r4_recert
mkdir -p "$OUT"

echo "== probe =="
timeout 150 python -c "import jax; print(jax.default_backend(), len(jax.devices()))" \
  || { echo "relay unreachable; aborting recert"; exit 1; }

echo "== kernel certification (all Pallas variants, compiled on chip) =="
timeout 2400 python -u scripts/tpu_kernel_cert.py | tee "$OUT/kernel_cert.txt"

echo "== bench.py =="
timeout 2400 python bench.py | tee "$OUT/bench.json"

echo "== serve concurrency (device precision, 2k-8k rows) =="
timeout 2400 python scripts/bench_serve.py 5 --clients 1,2,4 \
  | tee "$OUT/serve_conc.txt"

if [ $# -ge 1 ] && [ -d "$1" ]; then
  echo "== grid (AllChains + SingleChains, warm process) =="
  timeout 3600 python scripts/bench_grid_r3.py "$1" "$OUT/grid" 0 3 \
    | tee "$OUT/grid_allchains.txt"
  timeout 3600 python scripts/bench_grid_r3.py "$1" "$OUT/grid_sc" 4 3 \
    | tee "$OUT/grid_singlechains.txt"
  if [ $# -ge 2 ] && [ -d "$2" ]; then
    python scripts/compare_grids.py "$2" "$OUT/grid_run2" \
      | tee "$OUT/grid_parity.txt" || true
  fi
fi
echo "recert artifacts in $OUT"
