"""Resident JSON-lines evidence service (serving story — the reference has
none; its CLI is one-shot only, reference MCEvidence.py:1342-1474)."""

import io
import json
import math

import numpy as np
import pytest

from mcevidence_tpu import evidence_fn, serve
from tests.conftest import make_gaussian_chain


@pytest.fixture
def toy_root(tmp_path, rng):
    """CosmoMC-style root: 2 chains from a normalized Gaussian likelihood
    over the declared prior box (volume 0.2^3)."""
    theta, lnl = make_gaussian_chain(rng, n=1200, ndim=3, sigma=0.02)
    (tmp_path / "toy.ranges").write_text(
        "omegabh2 0.9 1.1\nomegach2 1.9 2.1\ntheta 2.9 3.1\n")
    for i, sl in enumerate((slice(0, 600), slice(600, None)), 1):
        cols = np.column_stack([np.ones(600), -lnl[sl], theta[sl]])
        np.savetxt(tmp_path / f"toy_{i}.txt", cols)
    return str(tmp_path / "toy"), theta, lnl


def _roundtrip(lines):
    out = io.StringIO()
    rc = serve.serve(io.StringIO("\n".join(lines) + "\n"), out)
    assert rc == 0
    return [json.loads(s) for s in out.getvalue().splitlines()]


def test_serve_evidence_and_errors(toy_root):
    root, theta, lnl = toy_root
    resps = _roundtrip([
        json.dumps({"id": "a", "root": root, "kmax": 2, "seed": 0,
                    "engine": "xla"}),
        "",                                            # blank: ignored
        "{not json",
        json.dumps({"id": "b", "root": root, "bogus_field": 1}),
        json.dumps({"id": "c", "root": root + "_missing"}),
        json.dumps({"id": "d", "kmax": 2}),
        json.dumps({"id": "e", "root": root, "kmax": 2, "cross": True,
                    "seed": 7, "engine": "xla", "error": True}),
    ])
    assert len(resps) == 6                             # blank line skipped
    a, bad, b, c, d, e = resps

    assert a["id"] == "a" and a["ok"]
    # truth: chain drawn from its own normalized likelihood => -ln V
    assert abs(a["lnz"][0] - (-math.log(0.2 ** 3))) < 0.3
    assert a["prior_volume"] == pytest.approx(0.2 ** 3)
    assert a["ndim"] == 3 and a["kmax"] == 2 and a["wall_s"] > 0
    # matches the library call exactly (same seed/engine path)
    direct = evidence_fn(theta, lnl, kmax=2, engine="xla",
                         prior_volume=0.2 ** 3)
    assert a["lnz"][0] == pytest.approx(float(direct[0]), abs=1e-10)

    assert not bad["ok"] and "bad JSON" in bad["error"]
    assert not b["ok"] and "bogus_field" in b["error"]
    assert not c["ok"] and b["id"] == "b" and c["id"] == "c"
    assert not d["ok"] and "root" in d["error"]

    assert e["ok"] and len(e["per_chain_mean"]) == 1
    assert e["per_chain_err"][0] >= 0
    assert np.isfinite(e["lnz"]).all()


def test_serve_bootstrap_and_volume_fallback(tmp_path, rng):
    theta, lnl = make_gaussian_chain(rng, n=800, ndim=2, sigma=0.05)
    cols = np.column_stack([np.ones(800), -lnl, theta])
    p = tmp_path / "bare_1.txt"                        # no .ranges file
    np.savetxt(p, cols)
    root = str(tmp_path / "bare")
    resps = _roundtrip([
        json.dumps({"root": root, "kmax": 2}),         # no metadata: error
        json.dumps({"root": root, "kmax": 2, "priorvolume": 2.5,
                    "engine": "xla"}),
        json.dumps({"root": root, "kmax": 2, "unit_volume_fallback": True,
                    "engine": "xla", "bootstrap": 8, "seed": 1}),
    ])
    fail, pv, boot = resps
    assert not fail["ok"]
    assert pv["ok"] and pv["prior_volume"] == 2.5
    assert boot["ok"] and len(boot["bootstrap_lnz"]) == 1
    assert boot["bootstrap_err"][0] > 0
    # explicit volume shifts lnZ by -ln(V) exactly
    assert pv["lnz"][0] == pytest.approx(
        boot["lnz"][0] - math.log(2.5), abs=1e-9)


def test_serve_leg_failure_keeps_evidence(tmp_path, rng):
    """An error-bar leg failure must degrade like the CLI does — the
    already-computed evidence stays in an ok:true response."""
    theta, lnl = make_gaussian_chain(rng, n=400, ndim=2, sigma=0.05)
    np.savetxt(tmp_path / "one_1.txt",
               np.column_stack([np.ones(400), -lnl, theta]))
    resp, = _roundtrip([json.dumps(
        {"root": str(tmp_path / "one"), "kmax": 2, "priorvolume": 1.0,
         "engine": "xla", "error": True})])       # 1 chain: no scatter bar
    assert resp["ok"] and np.isfinite(resp["lnz"]).all()
    assert "error_bars_error" in resp and "per_chain_mean" not in resp


def test_serve_json_is_rfc_strict():
    """Non-finite floats have no RFC 8259 spelling — they must become
    null, never NaN/Infinity tokens a strict client chokes on."""
    assert serve._floats([np.inf, -np.inf, np.nan, 1.5]) == \
        [None, None, None, 1.5]
    line = json.dumps({"lnz": serve._floats([np.nan])})
    assert json.loads(line) == {"lnz": [None]}     # round-trips strictly
    assert "NaN" not in line and "Infinity" not in line


def test_serve_workers_matches_serial_order_and_values(toy_root):
    """Pipelined mode (workers>1, VERDICT r3 item 5): same responses, same
    strict request order, for a mixed stream including malformed lines and
    failing requests — byte-level protocol parity with serial mode."""
    root, _, _ = toy_root
    lines = [
        json.dumps({"id": i, "root": root, "kmax": 2, "seed": 0,
                    "engine": "xla"}) for i in range(4)
    ] + [
        "{not json",
        json.dumps({"id": "x", "root": root + "_missing"}),
        json.dumps({"id": "y", "root": root, "kmax": 2, "cross": True,
                    "seed": 3, "engine": "xla"}),
    ]
    serial_out = io.StringIO()
    assert serve.serve(io.StringIO("\n".join(lines) + "\n"),
                       serial_out) == 0
    for workers in (2, 4):
        out = io.StringIO()
        assert serve.serve(io.StringIO("\n".join(lines) + "\n"), out,
                           workers=workers) == 0
        a = [json.loads(s) for s in serial_out.getvalue().splitlines()]
        b = [json.loads(s) for s in out.getvalue().splitlines()]
        assert len(a) == len(b) == len(lines)
        for ra, rb in zip(a, b):
            assert ra.get("id") == rb.get("id")
            assert ra["ok"] == rb["ok"]
            if ra["ok"]:
                np.testing.assert_allclose(
                    [x for x in ra["lnz"]], [x for x in rb["lnz"]],
                    atol=1e-12)


def test_serve_workers_device_precision_concurrent(toy_root):
    """Concurrent device-precision requests exercise the thread-keyed
    staging buffers (ops/pipeline._pooled): values must match serial."""
    root, _, _ = toy_root
    lines = [json.dumps({"id": i, "root": root, "kmax": 2,
                         "precision": "device", "engine": "xla"})
             for i in range(4)]
    out_s, out_p = io.StringIO(), io.StringIO()
    assert serve.serve(io.StringIO("\n".join(lines) + "\n"), out_s) == 0
    assert serve.serve(io.StringIO("\n".join(lines) + "\n"), out_p,
                       workers=3) == 0
    a = [json.loads(s) for s in out_s.getvalue().splitlines()]
    b = [json.loads(s) for s in out_p.getvalue().splitlines()]
    for ra, rb in zip(a, b):
        assert ra["ok"] and rb["ok"]
        np.testing.assert_allclose(ra["lnz"], rb["lnz"], atol=1e-12)


def test_serve_workers_lockstep_client_no_deadlock(toy_root):
    """REGRESSION (round-4 review): a lock-step client — write one request,
    block on the response before sending the next — must work against
    --workers N.  The first implementation only emitted responses from the
    stdin-reading thread, which was blocked on the next line the client
    would never send: permanent deadlock.  Real pipes required; StringIO
    streams deliver EOF immediately and mask the hang."""
    import subprocess
    import sys
    root, _, _ = toy_root
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from mcevidence_tpu.serve import main; import sys; "
            "sys.exit(main(['--workers', '2']))")
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdin=subprocess.PIPE, stdout=subprocess.PIPE,
                            text=True)
    try:
        import threading

        got = []

        def lockstep():
            for i in range(3):
                proc.stdin.write(json.dumps(
                    {"id": i, "root": root, "kmax": 2,
                     "engine": "xla"}) + "\n")
                proc.stdin.flush()
                got.append(json.loads(proc.stdout.readline()))
            proc.stdin.close()

        t = threading.Thread(target=lockstep, daemon=True)
        t.start()
        t.join(timeout=240)
        assert not t.is_alive(), "lock-step client deadlocked"
        assert [r["id"] for r in got] == [0, 1, 2]
        assert all(r["ok"] for r in got)
        assert proc.wait(timeout=60) == 0
    finally:
        proc.kill()


def test_serve_main_subprocess(toy_root, tmp_path):
    """The real entry point end to end: spawned process, stdin pipe, CPU
    platform re-asserted in-process (this deployment's sitecustomize
    overrides JAX_PLATFORMS in children — docs/TESTING.md)."""
    import subprocess
    import sys
    root, _, _ = toy_root
    req = json.dumps({"id": 1, "root": root, "kmax": 2, "engine": "xla"})
    code = ("import jax; jax.config.update('jax_platforms', 'cpu'); "
            "from mcevidence_tpu.serve import main; import sys; "
            "sys.exit(main([]))")
    r = subprocess.run([sys.executable, "-c", code], input=req + "\n",
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr
    resp = json.loads(r.stdout.strip().splitlines()[-1])
    assert resp["ok"] and resp["id"] == 1


def test_serve_null_bootstrap_degrades_not_crashes(tmp_path, rng):
    """REGRESSION (round-4 review): int(None) on a null bootstrap field
    escaped handle_request's raises-nothing contract and killed the warm
    service after the evidence was already computed."""
    theta, lnl = make_gaussian_chain(rng, n=300, ndim=2, sigma=0.05)
    np.savetxt(tmp_path / "one_1.txt",
               np.column_stack([np.ones(300), -lnl, theta]))
    root = str(tmp_path / "one")
    resp, = _roundtrip([json.dumps(
        {"root": root, "kmax": 2, "priorvolume": 1.0, "engine": "xla",
         "bootstrap": None})])
    assert resp["ok"] and np.isfinite(resp["lnz"]).all()
    resp, = _roundtrip([json.dumps(
        {"root": root, "kmax": 2, "priorvolume": 1.0, "engine": "xla",
         "bootstrap": "many"})])
    assert resp["ok"] and "bootstrap_error" in resp


def test_serve_error_leg_matches_request_estimator(tmp_path, rng,
                                                   monkeypatch):
    """REGRESSION (round-4 review): the per-chain error-bar leg dropped the
    request's cross flag (and the bootstrap leg its precision), pairing an
    error bar from a different estimator with the reported lnz."""
    captured = {}

    def fake_ewe(chains, **kw):
        captured["ewe"] = kw
        return np.array([0.0]), np.array([0.0]), None

    def fake_boot(chains, **kw):
        captured["boot"] = kw
        return np.array([0.0]), np.array([0.0]), None

    import mcevidence_tpu.evidence as ev
    monkeypatch.setattr(ev, "evidence_with_error", fake_ewe)
    monkeypatch.setattr(ev, "evidence_bootstrap", fake_boot)
    theta, lnl = make_gaussian_chain(rng, n=300, ndim=2, sigma=0.05)
    for i, sl in enumerate((slice(0, 150), slice(150, None)), 1):
        np.savetxt(tmp_path / f"two_{i}.txt",
                   np.column_stack([np.ones(150), -lnl[sl], theta[sl]]))
    resp = serve.handle_request(
        {"root": str(tmp_path / "two"), "kmax": 2, "priorvolume": 1.0,
         "engine": "xla", "cross": True, "seed": 0, "error": True,
         "bootstrap": 3, "precision": "fast"})
    assert resp["ok"], resp
    assert captured["ewe"]["split"] is True
    assert captured["boot"]["split"] is True
    assert captured["boot"]["precision"] == "fast"


def test_serve_wedged_shutdown_returns_hard_exit_rc(monkeypatch):
    """REGRESSION (round-5 review): a wedged in-flight device call must not
    keep the service resident after stdin EOF.  The stall loop's plain
    return was not enough — the executor's worker threads are non-daemon
    and concurrent.futures joins them at interpreter exit, so the observed
    orphaned --workers process (30 min holding its chip claim) survived
    the round-4 'bounded' shutdown.  serve() now reports the wedge as
    rc 2 and main() hard-exits (os._exit) on it."""
    import io
    import threading

    import mcevidence_tpu.serve as sv

    release = threading.Event()

    def fake_handle(req):
        if req.get("wedge"):
            release.wait()          # a relay-wedged device call, in effigy
            return {"id": req.get("id"), "ok": False, "error": "late"}
        return {"id": req.get("id"), "ok": True}

    monkeypatch.setattr(sv, "handle_request", fake_handle)
    monkeypatch.setenv("MCE_SERVE_SHUTDOWN_STALL_S", "0.3")
    inp = io.StringIO('{"id": 0, "wedge": true}\n{"id": 1}\n')
    out = io.StringIO()
    try:
        rc = sv.serve(inp, out, workers=2)
    finally:
        release.set()               # let the thread finish so pytest exits
    assert rc == 2


def test_serve_slow_head_of_line_not_dropped(monkeypatch):
    """Round-5 review finding 3: shutdown progress used to be measured only
    by written head-of-line responses, so a legitimately slow FIRST request
    was indistinguishable from a wedge even while later requests completed.
    Progress now counts completions in any order; the slow head's response
    must be delivered and the service must exit rc 0."""
    import io
    import json as _json
    import time as _time

    import mcevidence_tpu.serve as sv

    def fake_handle(req):
        if req["id"] == 0:
            _time.sleep(2.5)        # slower than one stall window
        return {"id": req["id"], "ok": True}

    monkeypatch.setattr(sv, "handle_request", fake_handle)
    monkeypatch.setenv("MCE_SERVE_SHUTDOWN_STALL_S", "2")
    inp = io.StringIO('{"id": 0}\n{"id": 1}\n')
    out = io.StringIO()
    assert sv.serve(inp, out, workers=2) == 0
    resp = [_json.loads(s) for s in out.getvalue().splitlines()]
    assert [r["id"] for r in resp] == [0, 1] and all(r["ok"] for r in resp)
