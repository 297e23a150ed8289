"""Measured host-vs-device split of a serve request (VERDICT r4 item 2).

The serve concurrency leg records ~1.2-1.4x at 2-4 workers — below the
1.5x target — so this script measures WHY: on this 1-CPU-core host only
the device+relay leg of a request can overlap across workers; every
host-side stage (chain parse, preprocess, f64 whitening, double-float
prep, finalize) serializes on the single core.  Amdahl's ceiling for W
workers is therefore T_total / T_host, independent of W.

Method: wrap ``pipeline.fused_refine_dotp`` (the one device
dispatch+fetch of the device-precision path; the HBM-guard test
monkeypatches the same seam) with a blocking fetch + timer, then run
warm ``serve.handle_request`` calls on DISTINCT chain data per rep (the
relay memoizes identical dispatches) at the serve benchmark's shapes.

Usage: python scripts/bench_serve_split.py [reps]
Writes a human table; transcribe into BASELINE.md.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mcevidence_tpu.utils.cache import enable_compilation_cache  # noqa: E402
import mcevidence_tpu.ops.pipeline as pipeline  # noqa: E402
from mcevidence_tpu.serve import handle_request  # noqa: E402
from bench_serve import make_root  # noqa: E402  (same synthetic chains)

SIZES = (2000, 8000)


def main():
    plat = os.environ.get("MCE_FORCE_PLATFORM")
    if plat:
        # same late re-assertion as bench.py: never touch the chip when a
        # CPU smoke is requested (a stray TPU claim can wedge a running
        # measurement's relay session)
        import jax
        jax.config.update("jax_platforms", plat)
    enable_compilation_cache()
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    rng = np.random.default_rng(11)

    dev_times = []
    orig = pipeline.fused_refine_dotp

    def timed(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        np.asarray(out)              # the blocking fetch happens HERE
        dev_times.append(time.perf_counter() - t0)
        return out

    pipeline.fused_refine_dotp = timed

    import jax
    print(f"backend={jax.default_backend()} reps={reps}")
    print(f"{'rows':>7} {'total ms':>9} {'device ms':>10} {'host ms':>8} "
          f"{'host %':>7} {'ceiling':>8}")
    with tempfile.TemporaryDirectory() as tmp:
        for n in SIZES:
            # warm the shape bucket (compile) outside the timing
            root = make_root(tmp, n, rng, tag="_warm")
            handle_request({"id": "w", "root": root, "kmax": 2,
                            "precision": "device"})
            totals, devs = [], []
            for r in range(reps):
                root = make_root(tmp, n, rng, tag=f"_r{r}")
                dev_times.clear()
                t0 = time.perf_counter()
                resp = handle_request({"id": f"{n}:{r}", "root": root,
                                       "kmax": 2, "precision": "device"})
                totals.append(time.perf_counter() - t0)
                assert resp.get("ok"), resp
                devs.append(sum(dev_times))
            tot = float(np.median(totals))
            dev = float(np.median(devs))
            host = tot - dev
            print(f"{n:>7} {tot * 1e3:>9.1f} {dev * 1e3:>10.1f} "
                  f"{host * 1e3:>8.1f} {100 * host / tot:>6.1f}% "
                  f"{tot / host:>7.2f}x", flush=True)
    pipeline.fused_refine_dotp = orig
    return 0


if __name__ == "__main__":
    sys.exit(main())
