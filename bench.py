"""Benchmark: TPU evidence wall-clock vs the reference's CPU (sklearn) path.

Workload: auto evidence on a synthetic Planck-sized chain (N=65536, d=8,
kmax=5) — the same shape class as the largest Planck full-grid chains
(~6k-99k rows x 6-8 params, BASELINE.md).  The device pipeline (whiten +
MXU kNN selection + fused estimator) is timed end to end and compared with
the sklearn + numpy float64 baseline implementing the reference call stack
(NearestNeighbors.kneighbors + the estimator loop, reference
MCEvidence.py:1093-1131) on this host's CPU.

Timing methodology: the accelerator may sit behind an async relay where
dispatch returns before execution, so REPS iterations of the full step run
inside ONE jitted lax.scan (each on a perturbed input so nothing can be
CSE'd) and the scalar result is fetched — total wall / REPS is honest
device time including one host sync.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}
value = NN pairs/sec/chip; vs_baseline = sklearn CPU wall / TPU wall.
"""

import json
import math
import os
import sys
import threading
import time

import numpy as np


def _failure_line(error: str, phase: str = "") -> str:
    """ONE schema-compatible JSON line marking a failed run (value 0).

    ``phase`` names WHICH stage blocked/failed (backend-init vs compile vs
    run) so a driver-side failure record is diagnosable, not just 0."""
    rec = {"metric": "nn_pairs_per_sec_per_chip", "value": 0.0,
           "unit": "pairs/s", "vs_baseline": 0.0, "error": error}
    if phase:
        rec["phase"] = phase
    # a transient-outage failure is not a framework regression: point the
    # reader at the standing healthy-window measurements (BASELINE.md)
    last = _last_healthy_bench()
    if last is not None:
        rec["last_healthy"] = last
    return json.dumps(rec)


def _bench_history():
    """All prior BENCH_r*.json records with value > 0, oldest first.
    Never raises: a failure line must always be emittable."""
    import glob
    import os
    try:
        here = os.path.dirname(os.path.abspath(__file__))
    except NameError:
        here = "."
    out = []
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        try:
            with open(path) as fp:
                rec = json.load(fp)
            rec = rec.get("parsed", rec)   # driver wraps the bench line
            if float(rec.get("value", 0)) > 0:
                out.append({"round_file": os.path.basename(path),
                            "value": rec["value"],
                            "vs_baseline": rec.get("vs_baseline"),
                            "degraded_window": bool(
                                rec.get("degraded_window", False))})
        except Exception:
            continue
    return out


def _last_healthy_bench():
    """Most recent prior record not itself flagged as a degraded relay
    window (round 4's official 2.43e9 pairs/s carried no flag — old
    records are only trusted as 'healthy' when they sit within 3x of the
    best ever recorded, the same band the degradation detector uses)."""
    hist = _bench_history()
    if not hist:
        return None
    best = max(rec["value"] for rec in hist)
    healthy = [rec for rec in hist
               if not rec["degraded_window"] and rec["value"] >= best / 3.0]
    return healthy[-1] if healthy else None


def _is_degraded_rate(pairs_per_s, healthy) -> bool:
    """True when a successful measurement sits >3x below the healthy band —
    the relay's documented sub-band degradation mode (the same code
    measured 6.40e10 and 2.43e9 pairs/s 60 minutes apart on round-4 day);
    a flagged record reads as 'relay window', not 'code regression'."""
    return healthy is not None and pairs_per_s < healthy["value"] / 3.0


class _Watchdog:
    """Phase-scoped deadline: pet() at each stage boundary re-arms the timer
    with that stage's own budget, so a slow-but-alive stage (e.g. a cold
    remote compile) is not killed by an unrelated stage's deadline, while a
    genuinely blocked fetch still emits the failure line naming the stage
    it blocked in (dispatch is async — ANY fetch can be the one that
    blocks)."""

    def __init__(self):
        self._timer = None
        self.phase = "start"

    current_phase = "start"            # class-level: read by __main__'s
                                       # except handler for the failure line

    def pet(self, phase: str, seconds: float) -> None:
        self.cancel()
        self.phase = phase
        _Watchdog.current_phase = phase

        def fire():
            print(_failure_line(
                f"no progress within {seconds:.0f}s during '{phase}' "
                "(accelerator/relay unreachable?)", phase), flush=True)
            os._exit(2)
        self._timer = threading.Timer(seconds, fire)
        self._timer.daemon = True
        self._timer.start()

    def cancel(self) -> None:
        if self._timer is not None:
            self._timer.cancel()
            self._timer = None


def _probe_backend_with_retries(attempts: int = 3, timeout: float = 120.0,
                                backoff: float = 30.0):
    """Bounded backend-init probe: (backend_name, n_devices) or None.

    Shared implementation (mcevidence_tpu/utils/backend_probe.py): each
    attempt initializes the backend in a SUBPROCESS with a hard timeout —
    during a relay outage in-process init blocks forever and cannot be
    cancelled, a child can always be killed; retries with backoff ride out
    transient relay flaps, and an unparseable probe answer counts as a
    failed attempt rather than raising."""
    from mcevidence_tpu.utils.backend_probe import probe_backend_with_retries
    return probe_backend_with_retries(
        attempts=attempts, timeout=timeout, backoff=backoff,
        log=lambda m: print(f"# {m}", file=sys.stderr, flush=True))


def synthetic_chain(n, ndim, seed=0):
    rng = np.random.default_rng(seed)
    mean = np.arange(1.0, ndim + 1.0)
    sigma = np.full(ndim, 0.05)
    theta = rng.normal(mean, sigma, size=(n, ndim))
    dm = (theta - mean) / sigma
    lnl = (-0.5 * np.sum(dm * dm, axis=1)
           - 0.5 * ndim * np.log(2 * np.pi) - np.sum(np.log(sigma)))
    return theta, lnl


def sklearn_reference(theta, lnl, kmax):
    """The reference's estimator: sklearn kNN + float64 numpy formula."""
    from sklearn.neighbors import NearestNeighbors
    import scipy.special as sp
    n, ndim = theta.shape
    cov = np.cov(theta.T)
    ev, evec = np.linalg.eigh(cov)
    jac = math.sqrt(np.linalg.det(cov))
    s = (theta @ evec) / np.sqrt(ev)
    D, _ = NearestNeighbors(n_neighbors=kmax + 1, n_jobs=-1).fit(s).kneighbors(s)
    lmax = lnl.max()
    fs = np.exp(lnl - lmax)
    out = []
    for k in range(1, kmax):
        vol = math.pi ** (ndim / 2) * D[:, k] ** ndim / sp.gamma(1 + ndim / 2)
        amax = np.dot(vol, fs) / (n * k + 1.0)
        out.append(math.log(n * amax * jac) + lmax)
    return np.array(out)


def main():
    # phase 1 — bounded out-of-process init probes with retries: a relay
    # outage is detected and named in <=3*(timeout+backoff) instead of one
    # long in-process hang (VERDICT r3 item 2)
    probed = _probe_backend_with_retries(
        attempts=int(os.environ.get("MCE_BENCH_PROBE_ATTEMPTS", "3")),
        timeout=float(os.environ.get("MCE_BENCH_PROBE_TIMEOUT", "120")))
    if probed is None:
        print(_failure_line("backend init unreachable after bounded "
                            "subprocess probes with retries",
                            "backend-init"), flush=True)
        os._exit(2)
    print(f"# backend probe ok: {probed[0]} x{probed[1]}",
          file=sys.stderr, flush=True)

    # phase 2 — in-process init (should be warm now, but the relay can
    # still flap between probe and use; keep it on its own deadline)
    watchdog = _Watchdog()
    watchdog.pet("backend-init-inprocess", 300.0)
    import jax
    plat = os.environ.get("MCE_FORCE_PLATFORM")
    if plat:
        # same late re-assertion as planck.main/serve.main: env vars are
        # read before sitecustomize force-selects the TPU plugin
        jax.config.update("jax_platforms", plat)
    import jax.numpy as jnp
    from mcevidence_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from mcevidence_tpu.ops.estimator import log_evidence_from_knn
    from mcevidence_tpu.ops.whiten import whiten_jnp

    # canonical workload; MCE_BENCH_N/MCE_BENCH_REPS exist for bounded CPU
    # smoke runs of the full path (the driver always runs the defaults)
    N = int(os.environ.get("MCE_BENCH_N", "65536"))
    NDIM, KMAX = 8, 5
    REPS = int(os.environ.get("MCE_BENCH_REPS", "8"))
    theta, lnl = synthetic_chain(N, NDIM)
    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    if on_tpu:
        # the packed2 merge-cadence kernel is the production selection path
        # since round 5 (ops/knn.py dispatch); its 2^-11 distance
        # quantization shows up in the fast-path dlnz below — the refine
        # path (production default) recomputes candidates in f64 and is
        # parity-grade (BASELINE.md).
        from mcevidence_tpu.ops.knn_pallas import knn_select_pallas_packed2

        def select(w):
            return knn_select_pallas_packed2(w, w, KMAX, self_mode=True)
    else:
        from mcevidence_tpu.ops.knn import knn_select_xla

        def select(w):
            return knn_select_xla(w, w, KMAX, self_mode=True, block_size=2048)

    def evidence_step(samples, lnlike, weights):
        white, log_j, _ = whiten_jnp(samples)
        d2, _ = select(white)
        return log_evidence_from_knn(
            jnp.sqrt(d2), lnlike, weights, jnp.sum(weights), NDIM,
            log_jacobian=log_j, log_prior_volume=0.0, k_start=1)

    @jax.jit
    def evidence_reps(samples, lnlike, weights):
        # REPS perturbed runs chained in one program: relay round-trip and
        # host sync amortize away; perturbation defeats CSE.
        def body(carry, i):
            eps = (1e-6 * i).astype(samples.dtype)
            mle = evidence_step(samples + eps, lnlike, weights)
            return carry + mle[1], mle
        total, all_mle = jax.lax.scan(
            body, jnp.float32(0.0), jnp.arange(REPS, dtype=jnp.float32))
        return total, all_mle[0]

    s32 = jnp.asarray(theta, jnp.float32)
    l32 = jnp.asarray(lnl, jnp.float32)
    w32 = jnp.ones(N, jnp.float32)

    # compile + warm-up (np.asarray is the blocking fetch — dispatch alone
    # returns before execution); cold remote compiles through the relay
    # can cost many minutes, so this stage gets the largest budget
    watchdog.pet("warmup-compile", 1200.0)
    _, mle = evidence_reps(s32, l32, w32)
    mle = np.asarray(mle)

    def timed_attempt():
        t0 = time.perf_counter()
        total, _ = evidence_reps(s32, l32, w32)
        float(total)                   # host sync
        return (time.perf_counter() - t0) / REPS

    def timed_batch(n_attempts, backoff):
        walls = []
        for i in range(n_attempts):
            if i:
                time.sleep(backoff)
            watchdog.pet("timed-run", 300.0)
            walls.append(timed_attempt())
        return walls

    # The relay has a documented sub-band degradation mode: the same binary
    # measured 6.40e10 pairs/s at 00:42 and 2.43e9 at 01:42 on round-4 day
    # (VERDICT r4 "what's weak" #1), and a single-shot timing cannot tell
    # that window from a code regression.  Defense: several timed attempts
    # with short backoff (best-of — a degraded relay only ever slows runs
    # down, it never speeds them up, so min(walls) is the honest device
    # rate); if the best attempt still sits >3x below the last healthy
    # round's record, back off once for longer and retry before accepting,
    # then say so in the output instead of recording a silent 0.0x-context
    # number.
    attempts = int(os.environ.get("MCE_BENCH_TIMED_ATTEMPTS", "3"))
    walls = timed_batch(attempts, backoff=5.0)
    # the BENCH_r* history is an on-chip canonical-workload band; comparing
    # a CPU smoke run (or a resized workload) against it would always trip
    healthy = _last_healthy_bench() if (
        on_tpu and N == 65536 and REPS >= 4) else None

    def is_degraded(ws):
        return _is_degraded_rate(N * N / min(ws), healthy)

    degraded = is_degraded(walls)
    if degraded:
        retry_backoff = float(os.environ.get("MCE_BENCH_DEGRADED_BACKOFF",
                                             "120"))
        print(f"# timed attempts {['%.3f' % w for w in walls]} s/rep are "
              f">3x below the healthy band ({healthy['value']:.3g} pairs/s, "
              f"{healthy['round_file']}); retrying once after "
              f"{retry_backoff:.0f}s", file=sys.stderr, flush=True)
        watchdog.pet("degraded-backoff", retry_backoff + 120.0)
        time.sleep(retry_backoff)
        walls += timed_batch(attempts, backoff=5.0)
        degraded = is_degraded(walls)
    tpu_s = min(walls)

    watchdog.pet("sklearn-baseline", 900.0)
    t0 = time.perf_counter()
    oracle = sklearn_reference(theta, lnl, KMAX)
    cpu_s = time.perf_counter() - t0

    pairs_per_s = N * N / tpu_s
    dlnz = float(np.max(np.abs(mle[1:] - oracle)))

    # parity of the production 'device' mode (double-float refinement on
    # device, scalars-only fetch) on the same workload; timed warm
    watchdog.pet("device-mode-parity", 900.0)
    from mcevidence_tpu.ops.pipeline import (device_refine_auto_evidence,
                                             fast_auto_evidence)
    dev = device_refine_auto_evidence(theta, lnl, kmax=KMAX)
    t0 = time.perf_counter()
    dev = device_refine_auto_evidence(theta, lnl, kmax=KMAX)
    dev_wall = time.perf_counter() - t0
    dlnz_dev = float(np.max(np.abs(dev - oracle)))

    # parity of the production FAST mode (exact kernel for directly-consumed
    # distances — not the packed kernel this bench times above); reported
    # separately so the throughput figure and the accuracy figures each name
    # the kernel they describe
    fast = fast_auto_evidence(theta, lnl, kmax=KMAX)
    dlnz_fast = float(np.max(np.abs(np.asarray(fast) - oracle)))

    # MFU: the MXU work per evidence step is the -2*Q@R^T distance matmul,
    # N^2*d MACs = 2*N^2*d FLOPs (‖a‖²/‖b‖² terms are O(N*d), negligible);
    # normalized against the v5e bf16 MXU peak of 197 TFLOP/s.  Low MFU is
    # expected at d=8: the kernel is selection(VPU)-bound, not matmul-bound
    # (docs/KERNEL_NOTES.md small-d study).  TPU-only: normalizing a CPU
    # run against a v5e peak would be a meaningless number in a
    # machine-readable field.
    mfu_fields = {}
    if on_tpu:
        matmul_tflops = 2.0 * N * N * NDIM / tpu_s / 1e12
        # Two denominators, each labelled: the raw bf16 MXU peak (a LOWER
        # bound on utilization — these kernels never run bf16), and the
        # f32-HIGHEST effective peak = 197/6, since Mosaic lowers an
        # f32-HIGHEST matmul as the 6-pass bf16 decomposition on v5e
        # (KERNEL_NOTES item 4: DEFAULT measured slower, HIGH unsupported —
        # 6 passes is the real achievable ceiling for this kernel).
        mfu_fields = {
            "matmul_tflops_per_s": matmul_tflops,
            "mfu_vs_bf16_peak_lower_bound": matmul_tflops / 197.0,
            "mfu_vs_f32_highest_effective_peak": matmul_tflops / (197.0 / 6),
        }

    degraded_fields = {}
    if degraded:
        degraded_fields = {"degraded_window": True,
                           "last_healthy": healthy}

    watchdog.cancel()
    print(json.dumps({
        "metric": "nn_pairs_per_sec_per_chip",
        "value": pairs_per_s,
        "unit": "pairs/s",
        "vs_baseline": cpu_s / tpu_s,
        **mfu_fields,
        **degraded_fields,
        "timed_rep_walls_s": [round(w, 4) for w in walls],
        "tpu_wall_s": tpu_s,
        "sklearn_cpu_wall_s": cpu_s,
        "backend": backend,
        "workload": f"auto evidence N={N} d={NDIM} kmax={KMAX} reps={REPS}",
        "max_abs_dlnz_vs_f64_oracle_timed_kernel": dlnz,
        "timed_kernel": ("pallas_packed2" if on_tpu else "xla"),
        "max_abs_dlnz_vs_f64_oracle_fast_mode": dlnz_fast,
        "max_abs_dlnz_vs_f64_oracle_device_mode": dlnz_dev,
        "device_mode_wall_s_incl_host_prep": dev_wall,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:     # e.g. RuntimeError: Unable to initialize
        # backend 'axon': UNAVAILABLE — emit the schema line rather than a
        # bare traceback so the driver's record stays machine-readable
        print(_failure_line(f"{type(e).__name__}: {e}",
                            _Watchdog.current_phase), flush=True)
        raise
