"""Nested-sampling (MultiNest/PolyChord) ingestion tests.

The reference cannot read nested samplers' products at all (its reader
only parses CosmoMC/MontePython chains, reference MCEvidence.py:560-606);
this family is a framework extension.  Correctness contract: the column
conventions (-2lnL vs -lnL, lnL-last equal-weights layout, posterior-mass
weights) must map onto the internal [w, -lnL, theta...] contract so that
evidence on a nested run's own samples reproduces the direct estimate.
"""

import os

import numpy as np
import pytest

from mcevidence_tpu.chains.nested import (load_nested_chains, nested_kind,
                                          sampler_lnz)
from mcevidence_tpu.chains.reader import load_chains


def _posterior_draws(rng, n=1200, ndim=3, sigma=0.05):
    theta = rng.normal(0.0, sigma, size=(n, ndim))
    lnl = (-0.5 * np.sum((theta / sigma) ** 2, axis=1)
           - 0.5 * ndim * np.log(2 * np.pi) - ndim * np.log(sigma))
    return theta, lnl


def _write_polychord(tmp_path, theta, lnl, weights=None, stats=True):
    root = str(tmp_path / "pc_run")
    w = np.ones(len(theta)) if weights is None else weights
    body = np.column_stack([w, -2.0 * lnl, theta])
    np.savetxt(root + ".txt", body, fmt="%.16e")
    np.savetxt(root + "_equal_weights.txt",
               np.column_stack([np.ones(len(theta)), -2.0 * lnl, theta]),
               fmt="%.16e")
    if stats:
        (tmp_path / "pc_run.stats").write_text(
            "Evidence estimates:\n"
            "===================\n"
            "log(Z)       =  -4.17 +/-   0.31\n"
            "log(Z_1)     =  -4.20 +/-   0.35\n")
    return root


def _write_multinest(tmp_path, theta, lnl, weights=None, stats=True):
    root = str(tmp_path / "mn-")
    w = (np.full(len(theta), 1.0 / len(theta))
         if weights is None else weights)
    np.savetxt(root + ".txt", np.column_stack([w, -2.0 * lnl, theta]),
               fmt="%.16e")
    np.savetxt(root + "post_equal_weights.dat",
               np.column_stack([theta, lnl]), fmt="%.16e")
    if stats:
        (tmp_path / "mn-stats.dat").write_text(
            " Nested Sampling Global Log-Evidence           :"
            "  -0.427196427973957E+01 +/-  0.178578641986135E+00\n"
            " Nested Importance Sampling Global Log-Evidence :"
            "  -0.450000000000000E+01 +/-  0.100000000000000E+00\n")
    return root


def test_kind_detection(tmp_path, rng):
    theta, lnl = _posterior_draws(rng, n=50)
    pc = _write_polychord(tmp_path, theta, lnl)
    mn = _write_multinest(tmp_path, theta, lnl)
    assert nested_kind(pc) == "polychord"
    assert nested_kind(mn) == "multinest"
    assert nested_kind(pc + "_equal_weights.txt") == "polychord"
    assert nested_kind(mn + "post_equal_weights.dat") == "multinest"
    # explicit weighted file with a sibling stats product is claimed too
    assert nested_kind(pc + ".txt") == "polychord"
    # a plain CosmoMC-style root is never claimed
    np.savetxt(tmp_path / "cosmomc_1.txt",
               np.column_stack([np.ones(10), lnl[:10], theta[:10]]))
    assert nested_kind(str(tmp_path / "cosmomc")) is None
    assert nested_kind(str(tmp_path / "cosmomc_1.txt")) is None


def test_polychord_columns_and_dispatch(tmp_path, rng):
    # the weighted file carries NON-unit weights so the two products are
    # distinguishable: both the bare root and the explicit equal-weights
    # path must load the equal-weights rows, not the dead-point file
    theta, lnl = _posterior_draws(rng, n=200)
    w = rng.uniform(0.1, 1.0, size=len(theta))
    root = _write_polychord(tmp_path, theta, lnl, weights=w)
    for src in (root, root + "_equal_weights.txt"):
        (chain,) = load_chains(src)
        np.testing.assert_allclose(chain[:, 0], 1.0)
        np.testing.assert_allclose(chain[:, 1], -lnl, rtol=1e-14)  # -lnL
        np.testing.assert_allclose(chain[:, 2:], theta, rtol=1e-14)
    # the explicitly named weighted file is still honored
    (wchain,) = load_chains(root + ".txt")
    np.testing.assert_allclose(wchain[:, 0], w, rtol=1e-14)


def test_multinest_columns_both_products(tmp_path, rng):
    theta, lnl = _posterior_draws(rng, n=200)
    root = _write_multinest(tmp_path, theta, lnl)
    # bare root prefers the equal-weights product (params..., lnL layout)
    (chain,) = load_chains(root)
    np.testing.assert_allclose(chain[:, 0], 1.0)
    np.testing.assert_allclose(chain[:, 1], -lnl, rtol=1e-14)
    np.testing.assert_allclose(chain[:, 2:], theta, rtol=1e-14)
    # the weighted dead-point file keeps its posterior-mass weights
    (wchain,) = load_nested_chains(root, equal_weights=False)
    np.testing.assert_allclose(wchain[:, 0], 1.0 / len(theta))
    np.testing.assert_allclose(wchain[:, 1], -lnl, rtol=1e-14)


def test_explicit_weighted_file_honored(tmp_path, rng):
    theta, lnl = _posterior_draws(rng, n=100)
    root = _write_multinest(tmp_path, theta, lnl)
    (chain,) = load_chains(root + ".txt")
    np.testing.assert_allclose(chain[:, 0], 1.0 / len(theta))


def test_sampler_lnz_parsing(tmp_path, rng):
    theta, lnl = _posterior_draws(rng, n=50)
    pc = _write_polychord(tmp_path, theta, lnl)
    mn = _write_multinest(tmp_path, theta, lnl)
    assert sampler_lnz(pc) == pytest.approx((-4.17, 0.31))
    # first (plain nested-sampling) line wins over the INS one; Fortran
    # E-notation parses
    assert sampler_lnz(mn) == pytest.approx((-4.27196427973957, 0.178578641986135))
    assert sampler_lnz(str(tmp_path / "nothing")) is None
    # a corrupt stats file must not raise — the cross-check is informational
    (tmp_path / "pc_run.stats").write_text("log(Z) = 1.2.3 +/- 0.1.2\n")
    assert sampler_lnz(pc) is None


def test_idchain_rejected_for_nested_roots(tmp_path, rng):
    theta, lnl = _posterior_draws(rng, n=50)
    root = _write_multinest(tmp_path, theta, lnl)
    with pytest.raises(ValueError, match="idchain"):
        load_chains(root, idchain=2)


def test_evidence_matches_direct_estimate(tmp_path, rng):
    # a nested run whose equal-weight rows ARE posterior draws must give
    # the same lnZ as feeding those draws directly (the framework's own
    # array path) — ingestion adds nothing but column mapping
    theta, lnl = _posterior_draws(rng, n=1500, ndim=3)
    root = _write_polychord(tmp_path, theta, lnl)
    from mcevidence_tpu import evidence_fn
    lnz_nested = evidence_fn(load_chains(root)[0][:, 2:],
                             lnl, kmax=2, engine="xla", prior_volume=1.0)
    lnz_direct = evidence_fn(theta, lnl, kmax=2, engine="xla",
                             prior_volume=1.0)
    assert float(lnz_nested[0]) == pytest.approx(float(lnz_direct[0]),
                                                 abs=1e-12)


def test_facade_end_to_end_with_weights(tmp_path, rng):
    # weighted dead-point file flows through the full facade: float
    # posterior-mass weights survive ingestion (scale-invariance of the
    # estimator is exercised by comparing against the same rows with
    # weights scaled by 1000)
    theta, lnl = _posterior_draws(rng, n=900, ndim=2)
    w = rng.uniform(0.5, 2.0, size=len(theta))
    w /= w.sum()
    root = _write_multinest(tmp_path, theta, lnl, weights=w)
    from mcevidence_tpu.evidence import MCEvidence
    chains = load_nested_chains(root, equal_weights=False)
    lnz1 = MCEvidence(chains, kmax=2, verbose=0, engine="xla").evidence()
    scaled = [np.column_stack([c[:, 0] * 1e3, c[:, 1:]]) for c in chains]
    lnz2 = MCEvidence(scaled, kmax=2, verbose=0, engine="xla").evidence()
    assert float(lnz1[0]) == pytest.approx(float(lnz2[0]), abs=1e-10)


def test_real_nested_run_end_to_end(tmp_path, rng):
    # a TRUE nested-sampling process (examples.nested_eg) writes
    # MultiNest-format products; ingesting them and estimating evidence
    # recovers the analytic lnZ within the estimator's statistical scatter,
    # and the run's own lnZ (stats.dat) agrees with what sampler_lnz parses
    from mcevidence_tpu.evidence import MCEvidence
    from mcevidence_tpu.examples import nested_eg
    model = nested_eg(verbose=0, rng=rng)
    root = model.write_products(str(tmp_path))
    truth = model.evidence()

    # equal-weights product (preferred dispatch): rows are posterior draws
    chains = load_chains(root)
    lnz = MCEvidence(chains, kmax=2, verbose=0, engine="xla",
                     priorvolume=model.prior_volume).evidence()
    assert float(lnz[0]) == pytest.approx(truth, abs=0.35)

    # the sampler's own evidence round-trips through the stats parser
    own = sampler_lnz(root)
    ns_lnz, ns_err = model.ns_lnz()
    assert own[0] == pytest.approx(ns_lnz, abs=1e-12)
    assert own[1] == pytest.approx(ns_err, abs=1e-12)
    assert ns_lnz == pytest.approx(truth, abs=4 * ns_err)

    # weighted dead-point product: positions are NOT posterior draws (they
    # follow the flatter dead-point spread); the estimator's 1/w weighting
    # corrects the density — looser tolerance, see chains/nested.py
    wchains = load_nested_chains(root, equal_weights=False)
    wlnz = MCEvidence(wchains, kmax=2, verbose=0, engine="xla",
                      priorvolume=model.prior_volume).evidence()
    assert np.isfinite(float(wlnz[0]))


def test_real_nested_run_d8(tmp_path, rng):
    # the exact-ball constrained draw keeps the generator O(1)/iteration at
    # high d; end-to-end evidence from the products still hits the analytic
    # truth at d=8 (truth -8 ln 2 = -5.545)
    from mcevidence_tpu.evidence import MCEvidence
    from mcevidence_tpu.examples import nested_eg
    model = nested_eg(ndim=8, verbose=0, rng=rng)
    root = model.write_products(str(tmp_path))
    lnz = MCEvidence(load_chains(root), kmax=2, verbose=0, engine="xla",
                     priorvolume=model.prior_volume).evidence()
    assert float(lnz[0]) == pytest.approx(model.evidence(), abs=0.4)


def test_ultranest_run_dir_end_to_end(tmp_path, rng):
    # a true NS run written in UltraNest layout (run dir with chains/ and
    # info/) loads through every root spelling, recovers the analytic lnZ
    # from the equal-weights product, and surfaces results.json's logz
    from mcevidence_tpu.evidence import MCEvidence
    from mcevidence_tpu.examples import nested_eg
    model = nested_eg(verbose=0, rng=rng)
    rundir = model.write_products(str(tmp_path), style="ultranest")
    ns_lnz, ns_err = model.ns_lnz()

    for src in (rundir, os.path.join(rundir, "chains"),
                os.path.join(rundir, "chains", "weighted_post.txt")):
        assert nested_kind(src) == "ultranest"
    (eq,) = load_chains(rundir)         # equal-weights preferred
    np.testing.assert_allclose(eq[:, 0], 1.0)
    lnz = MCEvidence([eq], kmax=2, verbose=0, engine="xla",
                     priorvolume=model.prior_volume).evidence()
    assert float(lnz[0]) == pytest.approx(model.evidence(), abs=0.35)

    # explicit weighted path keeps its posterior-mass weights and maps
    # logl (+lnL, not -2lnL) correctly
    (wchain,) = load_chains(os.path.join(rundir, "chains",
                                         "weighted_post.txt"))
    theta, lnl, w = model.run()
    np.testing.assert_allclose(wchain[:, 0], w / w.sum(), rtol=1e-14)
    np.testing.assert_allclose(wchain[:, 1], -lnl, rtol=1e-14)
    np.testing.assert_allclose(wchain[:, 2:], theta, rtol=1e-14)

    own = sampler_lnz(rundir)
    assert own[0] == pytest.approx(ns_lnz, abs=1e-12)
    assert own[1] == pytest.approx(ns_err, abs=1e-12)


def test_ultranest_missing_logl_rejected(tmp_path):
    chains = tmp_path / "run" / "chains"
    chains.mkdir(parents=True)
    (chains / "weighted_post.txt").write_text(
        "weight p0 p1\n1.0 0.1 0.2\n")
    with pytest.raises(ValueError, match="logl"):
        load_chains(str(tmp_path / "run"))


def test_ultranest_params_only_equal_file_falls_back(tmp_path):
    # real UltraNest may write equal_weighted_post.txt with ONLY parameter
    # columns; the default run-dir dispatch must fall back to the weighted
    # sibling instead of failing
    chains = tmp_path / "run" / "chains"
    chains.mkdir(parents=True)
    (chains / "equal_weighted_post.txt").write_text(
        "p0 p1\n0.1 0.2\n0.3 0.4\n")
    (chains / "weighted_post.txt").write_text(
        "weight logl p0 p1\n0.25 -1.0 0.1 0.2\n0.75 -2.0 0.3 0.4\n")
    (chain,) = load_chains(str(tmp_path / "run"))
    np.testing.assert_allclose(chain[:, 0], [0.25, 0.75])
    np.testing.assert_allclose(chain[:, 1], [1.0, 2.0])   # -logl
    # an explicit request for the params-only equal file still errors
    with pytest.raises(ValueError, match="logl"):
        load_nested_chains(str(chains / "equal_weighted_post.txt"),
                           equal_weights=True)


def test_ultranest_flat_layout_and_equal_only(tmp_path):
    # files directly in the run dir (no chains/ subdir) + results.json
    flat = tmp_path / "flat"
    flat.mkdir()
    (flat / "weighted_post.txt").write_text(
        "weight logl p0\n0.5 -1.0 0.1\n0.5 -2.0 0.3\n")
    (flat / "results.json").write_text('{"logz": -9.9, "logzerr": 0.4}')
    assert nested_kind(str(flat)) == "ultranest"
    assert sampler_lnz(str(flat)) == pytest.approx((-9.9, 0.4))
    # a dir holding ONLY the equal-weights product is still recognized
    eqonly = tmp_path / "eqonly" / "chains"
    eqonly.mkdir(parents=True)
    (eqonly / "equal_weighted_post.txt").write_text(
        "logl p0\n-1.0 0.1\n-2.0 0.3\n")
    (chain,) = load_chains(str(tmp_path / "eqonly"))
    np.testing.assert_allclose(chain[:, 0], 1.0)
    # an aborted run's {"logz": null} must not raise
    (flat / "results.json").write_text('{"logz": null}')
    assert sampler_lnz(str(flat)) is None


def test_ultranest_explicit_equal_path_not_weighted(tmp_path):
    # 'equal_weighted_post.txt' ends with 'weighted_post.txt': the exact-
    # basename match must keep the two products distinct both ways
    chains = tmp_path / "run" / "chains"
    chains.mkdir(parents=True)
    (chains / "weighted_post.txt").write_text(
        "weight logl p0\n0.2 -1.0 0.1\n0.8 -2.0 0.3\n")
    (chains / "equal_weighted_post.txt").write_text(
        "logl p0\n-1.0 0.1\n-2.0 0.3\n")
    (eq,) = load_chains(str(chains / "equal_weighted_post.txt"))
    np.testing.assert_allclose(eq[:, 0], 1.0)
    # forcing the weighted rows from the explicit equal path works too
    (wt,) = load_nested_chains(str(chains / "equal_weighted_post.txt"),
                               equal_weights=False)
    np.testing.assert_allclose(wt[:, 0], [0.2, 0.8])


def test_ultranest_duplicate_header_labels_keep_all_columns(tmp_path):
    chains = tmp_path / "run" / "chains"
    chains.mkdir(parents=True)
    (chains / "weighted_post.txt").write_text(
        "weight logl x x\n1.0 -1.0 0.1 0.2\n1.0 -2.0 0.3 0.4\n")
    (chain,) = load_chains(str(tmp_path / "run"))
    assert chain.shape == (2, 4)          # w, -lnL, and BOTH x columns
    np.testing.assert_allclose(chain[:, 2:], [[0.1, 0.2], [0.3, 0.4]])


def test_dynesty_extreme_logwt_span_stays_finite(rng):
    # logwt spanning thousands of nats: underflowed rows are dropped, the
    # survivors normalize, and the evidence stays finite
    from types import SimpleNamespace
    from mcevidence_tpu import evidence_fn
    theta, lnl = _posterior_draws(rng, n=500)
    logwt = np.linspace(-3000.0, 0.0, len(lnl))
    res = SimpleNamespace(samples=theta, logl=lnl, logwt=logwt)
    (chain,) = load_chains(res)
    assert np.all(chain[:, 0] > 0)
    np.testing.assert_allclose(chain[:, 0].sum(), 1.0, rtol=1e-12)
    assert len(chain) < len(lnl)          # some rows were dropped
    lnz = evidence_fn(chain[:, 2:], -chain[:, 1], chain[:, 0],
                      kmax=2, engine="xla", prior_volume=1.0)
    assert np.isfinite(float(lnz[0]))


def test_cli_prints_sampler_lnz(tmp_path, rng, capsys):
    theta, lnl = _posterior_draws(rng, n=400, ndim=2)
    root = _write_polychord(tmp_path, theta, lnl)
    from mcevidence_tpu.cli import main
    rc = main([root, "-k", "2", "--engine", "xla", "-pv", "1", "-vb", "0"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "sampler's own ln(Z) from its stats file: -4.17 +/- 0.31" in out


def test_dynesty_results_duck_object(rng):
    # in-memory sibling of the file products: a dynesty-shaped Results
    # object (.samples/.logl/.logwt) ingests with normalized posterior
    # masses; wildly negative logwt (hundreds of nats) must not underflow
    from types import SimpleNamespace
    theta, lnl = _posterior_draws(rng, n=300)
    logwt = lnl - 900.0 + rng.uniform(0, 1, size=len(lnl))
    res = SimpleNamespace(samples=theta, logl=lnl, logwt=logwt)
    (chain,) = load_chains(res)
    np.testing.assert_allclose(chain[:, 0].sum(), 1.0, rtol=1e-12)
    assert np.all(chain[:, 0] > 0)
    np.testing.assert_allclose(chain[:, 1], -lnl, rtol=1e-14)
    np.testing.assert_allclose(chain[:, 2:], theta, rtol=1e-14)
    # relative masses follow exp(logwt)
    np.testing.assert_allclose(np.log(chain[:, 0]) - np.log(chain[0, 0]),
                               logwt - logwt[0], atol=1e-9)


def test_facade_info_carries_sampler_lnz(tmp_path, rng):
    # MCEvidence(root).evidence(info=True) surfaces the nested run's own
    # lnZ; the keys are absent for non-nested sources (reference parity)
    from mcevidence_tpu.evidence import MCEvidence
    theta, lnl = _posterior_draws(rng, n=400, ndim=2)
    root = _write_polychord(tmp_path, theta, lnl)
    mce = MCEvidence(root, kmax=2, verbose=0, engine="xla", priorvolume=1.0)
    _, info = mce.evidence(info=True)
    assert info["sampler_lnZ"] == pytest.approx(-4.17)
    assert info["sampler_lnZ_err"] == pytest.approx(0.31)
    mce2 = MCEvidence({"samples": theta, "loglikes": lnl}, kmax=2,
                      verbose=0, engine="xla")
    _, info2 = mce2.evidence(info=True)
    assert "sampler_lnZ" not in info2


def test_serve_reports_sampler_lnz(tmp_path, rng):
    theta, lnl = _posterior_draws(rng, n=400, ndim=2)
    root = _write_polychord(tmp_path, theta, lnl)
    from mcevidence_tpu.serve import handle_request
    resp = handle_request({"root": root, "kmax": 2, "engine": "xla",
                           "priorvolume": 1.0})
    assert resp["ok"], resp
    assert resp["sampler_lnz"] == pytest.approx(-4.17)
    assert resp["sampler_lnz_err"] == pytest.approx(0.31)
