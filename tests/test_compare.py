"""Generic model-comparison API (compare.py): the reference's Planck-driver
recipe (planck_mcevidence.py:306-404) over arbitrary roots."""

import json

import numpy as np
import pytest

from mcevidence_tpu.compare import _as_named_roots, compare_models, main


def _make_root(tmp_path, name, mean, sig, n=900, rng=None, nchain=2):
    d = tmp_path / name
    d.mkdir()
    ndim = len(mean)
    for c in range(1, nchain + 1):
        theta = rng.normal(mean, sig, size=(n, ndim))
        neglnl = (0.5 * np.sum(((theta - mean) / sig) ** 2, axis=1)
                  + 0.5 * ndim * np.log(2 * np.pi) + np.log(sig).sum())
        np.savetxt(d / f"{name}_{c}.txt",
                   np.column_stack([np.ones(n), neglnl, theta]))
    lines = "".join(f"omegabh2 omegach2 theta tau".split()[i] +
                    f" {m - 10 * s} {m + 10 * s}\n"
                    for i, (m, s) in enumerate(zip(mean, sig)))
    (d / f"{name}.ranges").write_text(lines)
    return str(d / name)


def test_compare_models_table(tmp_path, rng):
    # model B has one extra parameter -> larger prior volume -> lower lnZ
    # after base-volume normalization (Occam penalty), same likelihood fit
    ra = _make_root(tmp_path, "ma", [0.0, 1.0], [0.05, 0.05], rng=rng)
    rb = _make_root(tmp_path, "mb", [0.0, 1.0, 2.0], [0.05, 0.05, 0.05],
                    rng=rng)
    rows = compare_models({"A": ra, "B": rb}, kmax=2, engine="xla", seed=0)
    assert [r["model"] for r in rows] == ["A", "B"]
    a, b = rows
    # base model's volume normalizes: PriorVol(A)=1, PriorVol(B)=extra range
    assert a["PriorVol"] == pytest.approx(1.0)
    assert b["PriorVol"] == pytest.approx(1.0, abs=0.01)  # 1 extra 1.0-range
    # chains drawn exactly from their likelihood: lnZ ~ -ln(PriorVol_raw),
    # and after normalization both ~ +ln(V_A); the best model's delta is 0
    best = max(rows, key=lambda r: r["lnE"][0])
    assert best["delta_lnE"][0] == 0.0
    worst = min(rows, key=lambda r: r["lnE"][0])
    assert worst["delta_lnE"][0] < 0.0
    assert a["N_read"] == 1800 and a["ndim"] == 2


def test_compare_models_nan_degradation(tmp_path, rng):
    ra = _make_root(tmp_path, "ok", [0.5], [0.1], rng=rng)
    # broken model: metadata present but chains missing
    d = tmp_path / "broken"
    d.mkdir()
    (d / "broken.ranges").write_text("omegabh2 0 1\n")
    rows = compare_models({"ok": ra, "broken": str(d / "broken")},
                          kmax=2, engine="xla")
    ok, broken = rows
    assert np.all(np.isfinite(ok["lnE"]))
    assert np.all(np.isnan(broken["lnE"])) and "error" in broken
    # the max for delta ignores the NaN row
    assert ok["delta_lnE"][0] == 0.0


def test_compare_models_error_bars_and_base(tmp_path, rng):
    ra = _make_root(tmp_path, "x1", [0.0], [0.1], rng=rng, nchain=3)
    rb = _make_root(tmp_path, "x2", [0.0], [0.1], rng=rng, nchain=3)
    rows = compare_models([ra, rb], kmax=2, error=True, base="x2",
                          engine="xla", seed=1)
    assert all("err_lnE" in r for r in rows)
    assert all(r["err_lnE"][0] > 0 for r in rows)
    # base='x2' normalizes volumes by x2's
    assert rows[1]["PriorVol"] == pytest.approx(1.0)


def test_named_roots_parsing():
    named = _as_named_roots(["/a/b/root", "/c/d/root"])
    assert list(named) == ["root", "root#2"]
    assert _as_named_roots({"n": "/a/b"}) == {"n": "/a/b"}


def test_compare_cli_json(tmp_path, rng, capsys):
    ra = _make_root(tmp_path, "cm1", [0.0], [0.1], rng=rng)
    rc = main([f"A={ra}", "-k", "2", "--json", "--engine", "xla"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows[0]["model"] == "A" and np.isfinite(rows[0]["lnE"][0])


def test_format_table_all_k_columns(tmp_path, rng, capsys):
    """kmax>2 runs compute k=1..kmax-1; the human table must show every
    column the JSON mode reports, not just k=1 (VERDICT r4 item 6)."""
    ra = _make_root(tmp_path, "mk", [0.0, 1.0], [0.05, 0.05], rng=rng)
    rc = main([f"A={ra}", "-k", "5", "--engine", "xla"])
    assert rc == 0
    out = capsys.readouterr().out
    header = out.splitlines()[0]
    for k in (1, 2, 3, 4):
        assert f"lnE_k{k}" in header and f"delta_lnE_k{k}" in header
    assert "lnE_k5" not in header          # kmax=5 -> k stops at 4
    # the data row carries a finite number under every lnE_k column
    row = out.splitlines()[2].split()
    assert sum(1 for c in row if c.replace("-", "").replace(".", "")
               .isdigit()) >= 8


def test_compare_cli_idchain(tmp_path, rng, capsys):
    """-ic selects one chain file per root (reference -ic semantics),
    forwarded through the CLI (VERDICT r4 item 6)."""
    ra = _make_root(tmp_path, "ic1", [0.0], [0.1], rng=rng, nchain=2)
    rc = main([f"A={ra}", "-ic", "1", "--json", "--engine", "xla"])
    assert rc == 0
    rows = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rows[0]["N_read"] == 900        # one 900-row chain, not both
