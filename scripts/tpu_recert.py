"""On-chip recertification with a COMMITTED artifact (VERDICT r4 item 3).

Round-4's recert wrote its results to /tmp; the 16/16 kernel-cert pass
survived only as a commit message and a BASELINE.md paragraph.  This
runner executes the three on-chip legs bounded, parses each, and writes
ONE auditable JSON artifact (default ``CERT_r{N}.json`` at the repo root,
N inferred from the newest BENCH_r*.json) that a driver/judge can check
without trusting prose:

  1. kernel certification — every Pallas variant compiled + run on chip,
     f64-recompute parity vs the exact XLA reference
     (scripts/tpu_kernel_cert.py; per-check PASS/FAIL + worst rel error).
  2. bench.py — the canonical throughput line, including the new
     degraded-relay-window self-diagnosis fields.
  3. serve concurrency — scripts/bench_serve.py --clients 1,2,4
     (VERDICT r4 item 2: the overlap win was never measured on chip).

Exit 0 iff every executed leg passed (a leg's nonzero rc is NOT swallowed
— the round-4 shell runner lost the cert script's rc behind ``tee``,
ADVICE r4).  Legs can be skipped individually for partial reruns; skipped
legs are recorded as such and don't count as passes.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def infer_round() -> int:
    """Current round = newest BENCH_r*.json round + 1 (the driver writes
    BENCH_r{N} at the END of round N, so during round N only N-1 exists)."""
    rounds = [int(m.group(1)) for p in glob.glob(
        os.path.join(REPO, "BENCH_r*.json"))
        if (m := re.search(r"BENCH_r(\d+)\.json$", p))]
    return (max(rounds) + 1) if rounds else 1


def run_leg(cmd, timeout):
    """Run one leg; never raises.  Returns (rc, stdout, stderr_tail)."""
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=timeout, cwd=REPO)
        return proc.returncode, proc.stdout, proc.stderr[-2000:]
    except subprocess.TimeoutExpired as exc:
        out = exc.stdout.decode() if isinstance(exc.stdout, bytes) else (
            exc.stdout or "")
        return 124, out, f"timeout after {timeout}s"
    except Exception as exc:  # missing interpreter etc.
        return 127, "", f"{type(exc).__name__}: {exc}"


def leg_kernel_cert(timeout):
    rc, out, err = run_leg(
        [sys.executable, "-u", os.path.join("scripts", "tpu_kernel_cert.py")],
        timeout)
    checks = []
    for line in out.splitlines():
        m = re.match(r"(PASS|FAIL)\s+(\S+)\s+max_rel_d2_err=(\S+)", line)
        if m:
            checks.append({"name": m.group(2), "pass": m.group(1) == "PASS",
                           "max_rel_d2_err": float(m.group(3))})
    n_pass = sum(c["pass"] for c in checks)
    backend = next((ln for ln in out.splitlines()
                    if ln.startswith("backend=")), "")
    return {"rc": rc, "ok": rc == 0 and checks and n_pass == len(checks),
            "n_pass": n_pass, "n_total": len(checks), "backend_line": backend,
            "worst_rel_d2_err": max(
                (c["max_rel_d2_err"] for c in checks), default=None),
            "checks": checks, "stderr_tail": err if rc else ""}


def leg_bench(timeout):
    rc, out, err = run_leg([sys.executable, "-u", "bench.py"], timeout)
    parsed = None
    for line in reversed(out.splitlines()):
        try:
            parsed = json.loads(line)
            break
        except ValueError:
            continue
    ok = (rc == 0 and parsed is not None
          and float(parsed.get("value", 0)) > 0)
    return {"rc": rc, "ok": ok, "parsed": parsed,
            "degraded_window": bool((parsed or {}).get("degraded_window")),
            "stderr_tail": err if not ok else ""}


def leg_serve(timeout, clients="1,2,4", reps=5):
    rc, out, err = run_leg(
        [sys.executable, "-u", os.path.join("scripts", "bench_serve.py"),
         str(reps), "--clients", clients], timeout)
    rows = []
    for line in out.splitlines():
        m = re.match(r"\s*(\d+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)x\s*$", line)
        if m:
            rows.append({"clients": int(m.group(1)),
                         "wall_s": float(m.group(2)),
                         "req_per_s": float(m.group(3)),
                         "vs_serial": float(m.group(4))})
    return {"rc": rc, "ok": rc == 0 and len(rows) >= 2,
            "concurrency": rows, "report": out,
            "stderr_tail": err if rc else ""}


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--round", type=int, default=None,
                   help="round number for the artifact name "
                        "(default: inferred from BENCH_r*.json)")
    p.add_argument("--out", default=None, help="artifact path override")
    p.add_argument("--skip-kernel-cert", action="store_true")
    p.add_argument("--skip-bench", action="store_true")
    p.add_argument("--skip-serve", action="store_true")
    p.add_argument("--merge", action="store_true",
                   help="update only the executed legs inside an existing "
                        "artifact (partial rerun) instead of replacing it")
    p.add_argument("--serve-clients", default="1,2,4")
    p.add_argument("--timeout", type=int, default=2400,
                   help="per-leg timeout, seconds")
    args = p.parse_args(argv)

    rnd = args.round if args.round is not None else infer_round()
    out_path = args.out or os.path.join(REPO, f"CERT_r{rnd:02d}.json")

    # bounded backend probe first: a relay outage should yield ONE failed
    # artifact naming the probe, not three 40-minute timeouts
    from mcevidence_tpu.utils.backend_probe import probe_backend_with_retries
    probed = probe_backend_with_retries(
        attempts=2, timeout=150.0, backoff=30.0,
        log=lambda m: print(f"# {m}", file=sys.stderr, flush=True))
    artifact = {"round": rnd, "backend_probe": None, "legs": {}}
    if args.merge and os.path.exists(out_path):
        try:
            with open(out_path) as fp:
                artifact = json.load(fp)
        except ValueError:
            pass
    artifact["backend_probe"] = ({"backend": probed[0],
                                  "n_devices": probed[1]}
                                 if probed else None)
    if probed is None:
        artifact["ok"] = False
        artifact["error"] = "backend unreachable (bounded subprocess probes)"
        with open(out_path, "w") as fp:
            json.dump(artifact, fp, indent=1)
        print(f"UNREACHABLE -> {out_path}")
        return 1

    legs = artifact["legs"]
    if not args.skip_kernel_cert:
        print("== kernel certification ==", flush=True)
        legs["kernel_cert"] = leg_kernel_cert(args.timeout)
        print(f"   -> {legs['kernel_cert']['n_pass']}/"
              f"{legs['kernel_cert']['n_total']} pass", flush=True)
    if not args.skip_bench:
        print("== bench.py ==", flush=True)
        legs["bench"] = leg_bench(max(args.timeout, 3000))
        val = (legs["bench"]["parsed"] or {}).get("value")
        print(f"   -> value={val}", flush=True)
    if not args.skip_serve:
        print("== serve concurrency ==", flush=True)
        legs["serve_concurrency"] = leg_serve(args.timeout,
                                              clients=args.serve_clients)
        for row in legs["serve_concurrency"]["concurrency"]:
            print(f"   -> {row}", flush=True)

    executed = list(legs.values())
    artifact["ok"] = bool(executed) and all(leg["ok"] for leg in executed)
    # a --merge over a previous backend-unreachable artifact must not leave
    # its stale top-level error claim next to ok=true (round-5 review)
    artifact.pop("error", None)
    with open(out_path, "w") as fp:
        json.dump(artifact, fp, indent=1)
    print(f"{'PASS' if artifact['ok'] else 'FAIL'} -> {out_path}")
    return 0 if artifact["ok"] else 1


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    sys.exit(main())
