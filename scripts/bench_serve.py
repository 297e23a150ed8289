"""Serving benchmark: steady-state latency of the resident JSON-lines
service (mcevidence_tpu.serve) on one warm process.

Generates CosmoMC-style toy roots at several chain sizes, starts ONE
service process, replays a shuffled request stream against it, and
reports per-size p50/p95 request wall (the service's own wall_s field,
host prep + device + fetch per request) plus the end-to-end stream
throughput.  First touch of each shape bucket pays the device program
load; the steady-state numbers are what a long-lived deployment sees.

Usage: python scripts/bench_serve.py [reps_per_size]
"""

from __future__ import annotations

import json
import math
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

SIZES = (2000, 8000, 32768, 65536)
NDIM = 6


def make_root(dirpath: str, n: int, rng) -> str:
    root = os.path.join(dirpath, f"toy{n}")
    names = ["omegabh2", "omegach2", "theta", "tau", "ns", "logA"][:NDIM]
    with open(root + ".ranges", "w") as fp:
        for name in names:
            fp.write(f"{name} -1 1\n")
    mean = np.zeros(NDIM)
    sig = np.full(NDIM, 0.05)
    for c in (1, 2):
        theta = rng.normal(mean, sig, size=(n // 2, NDIM))
        dm = (theta - mean) / sig
        lnl = (-0.5 * np.sum(dm * dm, axis=1)
               - 0.5 * NDIM * math.log(2 * math.pi) - np.sum(np.log(sig)))
        np.savetxt(f"{root}_{c}.txt",
                   np.column_stack([np.ones(n // 2), -lnl, theta]),
                   fmt="%.16e")
    return root


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    rng = np.random.default_rng(0)
    tmp = tempfile.mkdtemp(prefix="mce_serve_bench_")
    try:
        return _run(tmp, rng, reps)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _run(tmp: str, rng, reps: int) -> int:
    roots = {n: make_root(tmp, n, rng) for n in SIZES}

    reqs = []
    for r in range(reps):
        for n in SIZES:
            reqs.append({"id": f"{n}:{r}", "root": roots[n], "kmax": 2,
                         "precision": "device"})
    order = np.random.default_rng(1).permutation(len(reqs))
    reqs = [reqs[i] for i in order]

    proc = subprocess.Popen(
        [sys.executable, "-m", "mcevidence_tpu.serve"],
        stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    t0 = time.perf_counter()
    walls: dict = {n: [] for n in SIZES}
    for req in reqs:
        proc.stdin.write(json.dumps(req) + "\n")
        proc.stdin.flush()
        resp = json.loads(proc.stdout.readline())
        assert resp["ok"], resp
        n = int(resp["id"].split(":")[0])
        walls[n].append(resp["wall_s"])
    total = time.perf_counter() - t0
    proc.stdin.close()
    proc.wait(timeout=60)

    print(f"\n{len(reqs)} requests in {total:.1f}s "
          f"({len(reqs) / total:.2f} req/s end-to-end, one process)")
    print(f"{'rows':>7} {'first':>8} {'p50':>8} {'p95':>8}  (request wall_s)")
    for n in SIZES:
        w = walls[n]
        steady = sorted(w[1:]) or w
        p95_ix = min(len(steady) - 1, math.ceil(0.95 * len(steady)) - 1)
        print(f"{n:>7} {w[0]:>8.3f} {steady[len(steady) // 2]:>8.3f} "
              f"{steady[p95_ix]:>8.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
