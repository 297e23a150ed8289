"""Resident evidence service: JSON-lines requests over stdin/stdout.

The steady-state/production story on relay-attached TPUs: a process pays
its device program loads ONCE (cold compiles can cost minutes through a
relay; see BASELINE.md), after which every evidence call runs in
milliseconds-to-seconds.  This service keeps one warm process resident
and answers requests at steady-state speed, instead of paying the cold
cost per invocation the way the one-shot CLI does.  (The reference has no
serving story at all — its CLI, reference MCEvidence.py:1342-1474, is
one-shot only.)

Protocol: one JSON object per input line, one JSON object per output
line (flushed immediately).  Request fields mirror the CLI flags::

    {"root": "/path/chains/toy", "kmax": 3, "burn": 0.1, "thin": 2,
     "cross": false, "seed": 0, "priorvolume": null, "allparams": false,
     "unit_volume_fallback": false, "idchain": 0, "ndim": null,
     "engine": "auto", "precision": "refine", "error": false,
     "bootstrap": 0, "id": "anything-echoed-back"}

Only ``root`` is required.  Responses::

    {"id": ..., "ok": true, "lnz": [...], "kmax": 3,
     "prior_volume": ..., "ndim": ..., "wall_s": ...}
    {"id": ..., "ok": false, "error": "..."}

plus, when ``root`` is a nested-sampling product (MultiNest/PolyChord/
UltraNest), ``sampler_lnz``/``sampler_lnz_err`` — the run's own evidence
parsed from its stats file.

A blank line is ignored; EOF ends the service with exit code 0.  Run as
``python -m mcevidence_tpu.serve`` or the ``mcevidence-serve`` console
script; ``--parse-cache DIR``, ``--warmup N,D`` (pre-compile the
bucket for an N-row, D-param chain before accepting requests) and
``--workers N`` (overlap up to N requests — host prep and device
dispatch for request N+1 run while request N blocks on its fetch;
responses stay strictly in request order, so clients need no changes)
are process-level options.
"""

from __future__ import annotations

import json
import logging
import os
import sys
import time
from argparse import ArgumentParser
from typing import Optional, TextIO

logger = logging.getLogger(__name__)

_ALLOWED = {
    "id", "root", "kmax", "idchain", "ndim", "burn", "thin", "cross",
    "seed", "priorvolume", "allparams", "unit_volume_fallback", "engine",
    "precision", "error", "bootstrap",
}


def _floats(values) -> list:
    """JSON-safe float list: RFC 8259 has no NaN/Infinity tokens, and
    json.dumps would emit them by default, breaking strict client parsers
    mid-protocol — non-finite values become null."""
    import math as _math
    return [float(v) if _math.isfinite(v) else None for v in values]


def handle_request(req: dict) -> dict:
    """One evidence request -> one response dict (raises nothing)."""
    rid = req.get("id") if isinstance(req, dict) else None

    def fail(msg: str) -> dict:
        return {"id": rid, "ok": False, "error": msg}

    if not isinstance(req, dict):
        return fail("request must be a JSON object")
    unknown = set(req) - _ALLOWED
    if unknown:
        return fail(f"unknown request fields: {sorted(unknown)}")
    root = req.get("root")
    if not isinstance(root, str) or not root:
        return fail("request needs a 'root' string (chain root/file path)")

    t0 = time.perf_counter()
    try:
        from .chains.reader import load_chains
        from .evidence import MCEvidence
        from .priors.params_info import get_prior_volume

        priorvolume = req.get("priorvolume")
        prior_volume, ndim_meta = get_prior_volume(
            root, cosmo=not req.get("allparams", False),
            priorvolume=priorvolume,
            allow_unit_fallback=bool(req.get("unit_volume_fallback", False))
            or priorvolume is not None)
        ndim = req.get("ndim", None)
        ndim = ndim if ndim is not None else ndim_meta
        kmax = int(req.get("kmax", 2))
        chains = load_chains(root, idchain=int(req.get("idchain", 0)))
        mce = MCEvidence(chains, split=bool(req.get("cross", False)),
                         ndim=ndim, priorvolume=prior_volume, kmax=kmax,
                         verbose=0, burnlen=float(req.get("burn", 0)),
                         thinlen=float(req.get("thin", 0)),
                         seed=req.get("seed"),
                         engine=req.get("engine", "auto"),
                         precision=req.get("precision", "refine"))
        lnz = mce.evidence()
        # prior_volume can itself be inf ('N' = unbounded in a .ranges file)
        resp = {"id": rid, "ok": True, "lnz": _floats(lnz),
                "kmax": mce.kmax,
                "prior_volume": _floats([prior_volume])[0],
                "ndim": mce.ndim}
        # nested-sampling roots: surface the sampler's own ln Z so clients
        # get the method-paper cross-check in the same response.  (This IS
        # the single parse on this path: MCEvidence received pre-loaded
        # arrays, not the root, so its info dict cannot carry the keys.)
        from .chains.nested import sampler_lnz
        own = sampler_lnz(root)
        if own is not None:
            resp["sampler_lnz"], resp["sampler_lnz_err"] = _floats(own)
    except Exception as e:  # per-request isolation: the service must live on
        logger.info("request failed: %s", e)
        return fail(f"{type(e).__name__}: {e}")
    # optional error-bar legs degrade per leg, like the CLI: a leg failure
    # must not discard the (possibly expensive) evidence just computed
    if req.get("error", False):
        try:
            from .evidence import evidence_with_error
            # split forwarded: the error bar must quantify the SAME
            # estimator (cross vs auto) as the lnz it accompanies
            mean, err, _ = evidence_with_error(
                chains, kmax=kmax, ndim=ndim, priorvolume=prior_volume,
                burnlen=float(req.get("burn", 0)),
                thinlen=float(req.get("thin", 0)), seed=req.get("seed"),
                split=bool(req.get("cross", False)),
                engine=req.get("engine", "auto"),
                precision=req.get("precision", "refine"))
            resp["per_chain_mean"] = _floats(mean)
            resp["per_chain_err"] = _floats(err)
        except Exception as e:
            resp["error_bars_error"] = f"{type(e).__name__}: {e}"
    try:
        # null / non-numeric values must degrade like a failed leg, not
        # escape handle_request's raises-nothing contract and kill the
        # resident service after the evidence was already computed
        nboot = int(req.get("bootstrap") or 0)
    except (TypeError, ValueError) as e:
        resp["bootstrap_error"] = f"bad 'bootstrap' value: {e}"
        nboot = 0
    if nboot > 0:
        try:
            from .evidence import evidence_bootstrap
            blnz, berr, _ = evidence_bootstrap(
                chains, kmax=kmax, n_boot=nboot,
                seed=req.get("seed") or 0, ndim=ndim,
                priorvolume=prior_volume,
                burnlen=float(req.get("burn", 0)),
                thinlen=float(req.get("thin", 0)),
                split=bool(req.get("cross", False)),
                engine=req.get("engine", "auto"),
                precision=req.get("precision", "refine"))
            resp["bootstrap_lnz"] = _floats(blnz)
            resp["bootstrap_err"] = _floats(berr)
        except Exception as e:
            resp["bootstrap_error"] = f"{type(e).__name__}: {e}"
    resp["wall_s"] = round(time.perf_counter() - t0, 6)
    return resp


def serve(stream_in: TextIO, stream_out: TextIO, workers: int = 1) -> int:
    """Request loop.  ``workers>1`` overlaps requests: up to ``workers``
    are in flight at once (one thread each: host prep for request N+1 runs
    while request N blocks on its device fetch — the same
    dispatch-before-fetch overlap the batched grid path uses), while
    responses stay strictly in request order so the single-client protocol
    is byte-identical to serial mode.  Each in-flight request preps into
    its own thread-keyed staging buffers (ops/pipeline._pooled)."""
    if workers <= 1:
        for line in stream_in:
            line = line.strip()
            if not line:
                continue
            try:
                req = json.loads(line)
            except ValueError as e:
                resp = {"id": None, "ok": False, "error": f"bad JSON: {e}"}
            else:
                resp = handle_request(req)
            print(json.dumps(resp), file=stream_out, flush=True)
        return 0

    import threading
    from concurrent.futures import Future, ThreadPoolExecutor
    from queue import Queue

    pool = ThreadPoolExecutor(max_workers=workers)
    out_q: Queue = Queue()          # response futures, request order
    # end-to-end backpressure: the reader blocks once `2*workers` requests
    # are in flight or completed-but-unwritten, so a client that floods
    # requests without reading responses cannot grow memory unboundedly
    slots = threading.Semaphore(2 * workers)
    writer_dead = threading.Event()
    written = [0]                   # writer progress, read by the shutdown
    completed = [0]                 # finished handlers (any order) — a slow
    wedged = [False]                # head-of-line request must not look like
                                    # a wedge while LATER requests complete

    def writer():
        # a DEDICATED writer thread is what makes lock-step clients work:
        # the reader thread blocks on stdin between requests, so it can
        # never be the one to emit a response that completes meanwhile
        while True:
            fut = out_q.get()
            if fut is None:
                return
            try:
                try:
                    resp = fut.result()
                except Exception:
                    # handle_request promises to raise nothing, so this is
                    # a bug — log the traceback and keep the service alive
                    # with an error response (per-request isolation)
                    logger.exception("request handler raised")
                    resp = {"id": None, "ok": False,
                            "error": "internal error (see service log)"}
                if not writer_dead.is_set():
                    print(json.dumps(resp), file=stream_out, flush=True)
                written[0] += 1
            except Exception as e:   # e.g. client closed its read end
                logger.info("writer: output failed (%s: %s); shutting down",
                            type(e).__name__, e)
                writer_dead.set()
            finally:
                slots.release()

    wt = threading.Thread(target=writer, name="serve-writer", daemon=True)
    wt.start()
    try:
        for line in stream_in:
            if writer_dead.is_set():
                break
            line = line.strip()
            if not line:
                continue
            slots.acquire()          # one slot per queued future, ALWAYS
            try:
                req = json.loads(line)
            except ValueError as e:
                fut: Future = Future()   # keep ordering for malformed lines
                fut.set_result({"id": None, "ok": False,
                                "error": f"bad JSON: {e}"})
            else:
                fut = pool.submit(handle_request, req)
            fut.add_done_callback(lambda _f: completed.__setitem__(
                0, completed[0] + 1))
            out_q.put(fut)
    finally:
        out_q.put(None)
        # BOUNDED shutdown: draining in-flight responses can legitimately
        # take minutes (large requests), but a relay-wedged device call
        # blocks its worker thread forever — an unbounded join then keeps a
        # dead-client service alive indefinitely holding its chip claim
        # (observed: a SIGKILLed benchmark left an orphaned --workers
        # process resident for 30 min).  Join as long as requests keep
        # COMPLETING (any order — the writer drains in request order, so a
        # slow head-of-line request must not mask later completions); a
        # full stall window with zero progress means a wedged request —
        # hand rc 2 to main(), which hard-exits: the pool threads are
        # non-daemon and concurrent.futures joins them at interpreter
        # exit, so a plain return would still hang on the wedged call.
        # A single legitimately-slower-than-2*stall request is
        # indistinguishable from a wedge by construction — raise
        # MCE_SERVE_SHUTDOWN_STALL_S for such workloads.
        stall = float(os.environ.get("MCE_SERVE_SHUTDOWN_STALL_S", "120"))
        last = (-1, -1)
        while wt.is_alive():
            wt.join(timeout=stall)
            if not wt.is_alive():
                break
            progress = (written[0], completed[0])
            if progress == last:
                logger.warning(
                    "shutdown: no response progress in %.0fs with requests "
                    "still in flight (wedged device call?); exiting without "
                    "them", stall)
                writer_dead.set()
                wedged[0] = True
                break
            last = progress
        pool.shutdown(wait=False)
    if wedged[0]:
        return 2
    return 1 if writer_dead.is_set() else 0


def _warmup(spec: str) -> None:
    """Pre-compile the device programs for an N-row, D-param chain shape so
    the first real request is already warm."""
    import numpy as np

    from .ops.pipeline import device_refine_evidence
    n, d = (int(x) for x in spec.split(","))
    rng = np.random.default_rng(0)
    theta = rng.normal(size=(n, d))
    lnl = -0.5 * np.sum(theta * theta, axis=1)
    device_refine_evidence(theta, lnl, kmax=2)
    logger.info("warmup compile for (%d, %d) done", n, d)


def main(argv: Optional[list] = None) -> int:
    p = ArgumentParser(
        prog="mcevidence-serve",
        description="Resident MCEvidence service: JSON-lines over "
                    "stdin/stdout (one warm TPU process, many requests)")
    p.add_argument("--parse-cache", default="", metavar="DIR",
                   help="cache raw parsed chain tables as .npy under DIR")
    p.add_argument("--warmup", default="", metavar="N,D",
                   help="pre-compile device programs for an N-row D-param "
                        "chain before accepting requests")
    p.add_argument("--workers", default=1, type=int, metavar="N",
                   help="overlap up to N requests (responses stay in "
                        "request order); 1 = strictly serial")
    p.add_argument("-vb", "--verbose", dest="verbose", default=0, type=int)
    from .utils.backend_probe import apply_forced_platform
    apply_forced_platform()
    args = p.parse_args(argv)
    from .utils.logging import configure
    configure(args.verbose)
    if args.parse_cache:
        from .chains.reader import set_parse_cache
        set_parse_cache(args.parse_cache)
    if args.warmup:
        _warmup(args.warmup)
    rc = serve(sys.stdin, sys.stdout, workers=max(1, args.workers))
    if rc == 2:
        # wedged in-flight device call: the executor's threads are
        # non-daemon and concurrent.futures joins them at interpreter
        # exit, so sys.exit would block forever on the wedged thread and
        # keep this process holding its chip claim.  Flush and hard-exit.
        sys.stdout.flush()
        sys.stderr.flush()
        logging.shutdown()
        os._exit(2)
    return rc


if __name__ == "__main__":
    sys.exit(main())
