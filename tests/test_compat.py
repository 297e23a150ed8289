"""Reference-surface compatibility: MCSamples wrapper + CLI main()."""

import numpy as np
import pytest

from mcevidence_tpu.compat import MCSamples, split_var


@pytest.fixture
def files(tmp_path, rng):
    for c in (1, 2):
        a = np.column_stack([np.full(100, 2.0), rng.random(100),
                             rng.normal(size=(100, 3))])
        np.savetxt(tmp_path / f"r_{c}.txt", a)
    return str(tmp_path / "r")


def test_mcsamples_from_files(files):
    gd = MCSamples(files, burnlen=0.1, thinlen=0)
    assert gd.get_shape("s1") == (180, 3)
    s, lnp, w = gd.arrays("s1")
    assert s.shape == (180, 3)
    assert np.all(w == 2.0)
    assert gd.nparamMC == 3
    assert gd.names == ["p0", "p1", "p2"]


def test_mcsamples_split(files, rng):
    gd = MCSamples(files, csplit=split_var(split=True, frac=0.5, shuffle=True),
                   seed=0)
    assert gd.split
    assert gd.get_shape("s1")[0] + gd.get_shape("s2")[0] == 200
    s, lnp, w = gd.arrays("all")
    assert s.shape[0] == 200
    assert "s2" in gd.data


def test_mcsamples_mutating_ops(files):
    gd = MCSamples(files, seed=1)
    gd.removeBurn(0.5, name="s1")
    assert gd.get_shape("s1") == (100, 3)
    gd.importance_sample(lambda s: np.zeros(len(s)), name="s1")
    np.testing.assert_allclose(gd.data["s1"].adjusted_weights,
                               gd.data["s1"].weights)
    gd.thin(2, name="s1")   # integer weights 2, factor 2: coarse branch
    assert gd.get_shape("s1")[0] == 100   # every row kept (w=2 >= factor)


def test_mcsamples_dict_input(rng):
    gd = MCSamples({"samples": rng.normal(size=(50, 4)),
                    "loglikes": rng.normal(size=50)})
    assert gd.get_shape("s1") == (50, 4)


def test_cli_main_end_to_end(tmp_path, rng, capsys):
    # full CLI path on a synthetic CosmoMC root with .ranges metadata
    ndim, n = 3, 1200
    mean = np.array([0.0226, 0.112, 1.041])
    sig = np.array([0.0002, 0.002, 0.0005])
    for c in (1, 2):
        theta = rng.normal(mean, sig, size=(n, ndim))
        neglnl = 0.5 * np.sum(((theta - mean) / sig) ** 2, axis=1)
        np.savetxt(tmp_path / f"toy_{c}.txt",
                   np.column_stack([np.ones(n), neglnl, theta]))
    (tmp_path / "toy.ranges").write_text(
        "omegabh2 0.019 0.026\nomegach2 0.09 0.14\ntheta 1.03 1.05\n")
    from mcevidence_tpu.cli import main
    rc = main([str(tmp_path / "toy"), "-k", "2", "-vb", "0",
               "--engine", "xla"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "ln(B)[k=1]" in out


def test_cli_json_mode(tmp_path, rng, capsys):
    # --json routes through the serve protocol: one parseable line, same
    # numbers as the human report path
    import json
    ndim, n = 2, 800
    theta = rng.normal(0.0, 0.05, size=(n, ndim))
    neglnl = 0.5 * np.sum((theta / 0.05) ** 2, axis=1)
    np.savetxt(tmp_path / f"toy_1.txt",
               np.column_stack([np.ones(n), neglnl, theta]))
    (tmp_path / "toy.ranges").write_text("omegabh2 -1 1\nomegach2 -1 1\n")
    from mcevidence_tpu.cli import main
    rc = main([str(tmp_path / "toy"), "-k", "2", "--json", "--seed", "0",
               "--engine", "xla"])
    assert rc == 0
    resp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert resp["ok"] and resp["ndim"] == 2
    assert resp["prior_volume"] == 4.0
    from mcevidence_tpu import evidence_fn
    direct = evidence_fn(theta, -neglnl, kmax=2, engine="xla",
                         prior_volume=4.0)
    assert resp["lnz"][0] == pytest.approx(float(direct[0]), abs=1e-10)
    # failure is still one JSON line + exit 2
    rc = main([str(tmp_path / "absent"), "--json"])
    assert rc == 2
    resp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert not resp["ok"] and "error" in resp


def test_cli_autocorr_thinning_flag(tmp_path, rng, capsys):
    # thinlen<0 = autocorrelation-length thinning (quirk Q9, implemented
    # here though the reference never did): the CLI must accept it, run,
    # and the help text must document the mode (VERDICT r3 item 6)
    ndim, n = 2, 1500
    theta = rng.normal(0.0, 0.05, size=(n, ndim))
    neglnl = 0.5 * np.sum((theta / 0.05) ** 2, axis=1)
    np.savetxt(tmp_path / "toy_1.txt",
               np.column_stack([np.ones(n), neglnl, theta]))
    (tmp_path / "toy.ranges").write_text("omegabh2 -1 1\nomegach2 -1 1\n")
    from mcevidence_tpu.cli import main
    rc = main([str(tmp_path / "toy"), "-k", "2", "-vb", "0",
               "--thin", "-1", "--engine", "xla"])
    assert rc == 0
    assert "ln(B)[k=1]" in capsys.readouterr().out
    from mcevidence_tpu.cli import build_parser
    assert "autocorrelation" in build_parser().format_help()
    from mcevidence_tpu import planck
    assert "autocorrelation" in planck.build_parser().format_help()


def test_device_precision_fallback_is_logged(rng, caplog):
    # precision='device' on an unsupported config (cross+covtype='single')
    # must announce the refine fallback at INFO (VERDICT r3 item 4)
    import logging

    from mcevidence_tpu import evidence_fn
    theta = rng.normal(size=(400, 3))
    lnl = -0.5 * np.sum(theta * theta, axis=1)
    theta2 = rng.normal(size=(300, 3))
    with caplog.at_level(logging.INFO, logger="mcevidence_tpu.evidence"):
        out = evidence_fn(theta, lnl, samples2=theta2, kmax=2,
                          precision="device", covtype="single", engine="xla")
    assert np.all(np.isfinite(out))
    assert any("falling back to precision='refine'" in r.message
               for r in caplog.records)


def test_cli_missing_root(tmp_path, capsys):
    from mcevidence_tpu.cli import main
    rc = main([str(tmp_path / "absent"), "-vb", "0"])
    assert rc == 2
    assert "error" in capsys.readouterr().err


def test_cli_error_flag(tmp_path, rng, capsys):
    ndim, n = 3, 700
    mean = np.array([0.0226, 0.112, 1.041])
    sig = np.array([0.0002, 0.002, 0.0005])
    for c in (1, 2, 3):
        theta = rng.normal(mean, sig, size=(n, ndim))
        neglnl = 0.5 * np.sum(((theta - mean) / sig) ** 2, axis=1)
        np.savetxt(tmp_path / f"toy_{c}.txt",
                   np.column_stack([np.ones(n), neglnl, theta]))
    (tmp_path / "toy.ranges").write_text(
        "omegabh2 0.019 0.026\nomegach2 0.09 0.14\ntheta 1.03 1.05\n")
    from mcevidence_tpu.cli import main
    rc = main([str(tmp_path / "toy"), "-k", "2", "-vb", "0",
               "--engine", "xla", "--error"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "per-chain ln(B)[k=1]" in out and "+/-" in out


def test_cli_error_flag_parses_once(tmp_path, rng, capsys, monkeypatch):
    # --error must reuse the already-parsed chains (parsing is the host
    # bottleneck; it used to re-ingest every file from disk)
    ndim, n = 3, 500
    mean = np.array([0.0226, 0.112, 1.041])
    sig = np.array([0.0002, 0.002, 0.0005])
    for c in (1, 2):
        theta = rng.normal(mean, sig, size=(n, ndim))
        neglnl = 0.5 * np.sum(((theta - mean) / sig) ** 2, axis=1)
        np.savetxt(tmp_path / f"toy_{c}.txt",
                   np.column_stack([np.ones(n), neglnl, theta]))
    (tmp_path / "toy.ranges").write_text(
        "omegabh2 0.019 0.026\nomegach2 0.09 0.14\ntheta 1.03 1.05\n")
    from mcevidence_tpu.chains import reader
    calls = []
    real = reader.parse_chain_file
    monkeypatch.setattr(reader, "parse_chain_file",
                        lambda p: (calls.append(p), real(p))[1])
    from mcevidence_tpu.cli import main
    rc = main([str(tmp_path / "toy"), "-k", "2", "-vb", "0",
               "--engine", "xla", "--error"])
    assert rc == 0
    assert len(calls) == 2          # one parse per file, total


def test_mcsamples_thin_chain_argument(files, rng):
    gd = MCSamples(files, seed=2)
    chain = np.column_stack([np.full(30, 2.0), np.zeros(30),
                             np.arange(30.0)])
    out = gd.thin(2, chain=chain)
    assert out.shape[1] == 3 and len(out) == 30   # w=2 >= factor: all kept
    assert gd.thin(1) is None                     # nthin==1 no-op


def test_cli_bootstrap_flag(tmp_path, rng, capsys):
    ndim, n = 3, 700
    mean = np.array([0.0226, 0.112, 1.041])
    sig = np.array([0.0002, 0.002, 0.0005])
    theta = rng.normal(mean, sig, size=(n, ndim))
    neglnl = 0.5 * np.sum(((theta - mean) / sig) ** 2, axis=1)
    np.savetxt(tmp_path / "toy_1.txt",
               np.column_stack([np.ones(n), neglnl, theta]))
    (tmp_path / "toy.ranges").write_text(
        "omegabh2 0.019 0.026\nomegach2 0.09 0.14\ntheta 1.03 1.05\n")
    from mcevidence_tpu.cli import main
    rc = main([str(tmp_path / "toy"), "-k", "2", "-vb", "0",
               "--engine", "xla", "--bootstrap", "16"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "bootstrap ln(B)[k=1]" in out and "+/-" in out


def test_compat_quirk_noop_paths(files):
    # reference parity, pinned so reviews don't re-flag them as bugs:
    # removeBurn with neither chain nor name returns `remove` unchanged
    # (MCEvidence.py:357-359); thin(nthin=1) returns None even in raw-chain
    # mode (MCEvidence.py:296-297, quirk Q9)
    gd = MCSamples(files)
    assert gd.removeBurn(0.3) == 0.3
    assert gd.thin(1, chain=np.ones((5, 4))) is None


def test_cli_error_legs_forward_split_and_precision(tmp_path, rng, capsys,
                                                    monkeypatch):
    # --cross --error/--bootstrap must quantify the SAME estimator and
    # precision as the headline lnz (serve.py already forwards both; the
    # human CLI must not drift from the JSON protocol)
    ndim, n = 2, 600
    for c in (1, 2):
        theta = rng.normal(0.0, 0.05, size=(n, ndim))
        neglnl = 0.5 * np.sum((theta / 0.05) ** 2, axis=1)
        np.savetxt(tmp_path / f"toy_{c}.txt",
                   np.column_stack([np.ones(n), neglnl, theta]))
    (tmp_path / "toy.ranges").write_text("omegabh2 -1 1\nomegach2 -1 1\n")
    import mcevidence_tpu.evidence as ev
    calls = {}

    def fake_error(chains, **kw):
        calls["error"] = kw
        return np.array([0.0]), np.array([0.0]), None

    def fake_boot(chains, **kw):
        calls["boot"] = kw
        return np.array([0.0]), np.array([0.0]), None

    monkeypatch.setattr(ev, "evidence_with_error", fake_error)
    monkeypatch.setattr(ev, "evidence_bootstrap", fake_boot)
    from mcevidence_tpu.cli import main
    rc = main([str(tmp_path / "toy"), "-k", "2", "-vb", "0", "--cross",
               "--error", "--bootstrap", "4", "--engine", "xla"])
    assert rc == 0
    assert calls["error"]["split"] is True
    assert calls["error"]["precision"] == "refine"
    assert calls["boot"]["split"] is True
    assert calls["boot"]["precision"] == "refine"
