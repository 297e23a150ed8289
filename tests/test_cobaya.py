"""Cobaya product ingestion: chain-column mapping, updated.yaml priors,
prior volume, and end-to-end evidence (extension beyond the reference,
which predates Cobaya and reads only CosmoMC/MontePython products)."""

import math

import numpy as np
import pytest

from mcevidence_tpu.chains import cobaya, reader
from mcevidence_tpu.priors.params_info import get_prior_volume, params_info

YAML = """\
theory:
  some_theory: null
likelihood:
  toy:
    speed: 1
params:
  a:
    prior:
      min: -5.0
      max: 5.0
    ref: 0.0
    latex: a
  b:
    prior:
      dist: uniform
      loc: 0.0
      scale: 10.0
  c:
    latex: c_{derived}
  d: 3.14
sampler:
  mcmc:
    burn_in: 0
"""


def _write_run(tmp_path, rng, n=2000, nchains=2, with_chi2=True,
               unit_weights=False):
    root = str(tmp_path / "toyrun")
    (tmp_path / "toyrun.updated.yaml").write_text(YAML)
    header = ["weight", "minuslogpost", "a", "b", "c"]
    if with_chi2:
        header += ["minuslogprior", "minuslogprior__0", "chi2", "chi2__toy"]
    else:
        header += ["minuslogprior", "minuslogprior__0"]
    chains = []
    for i in range(nchains):
        a = rng.normal(0.0, 0.5, n)
        b = rng.normal(5.0, 0.5, n)
        lnl = (-0.5 * ((a / 0.5) ** 2 + ((b - 5.0) / 0.5) ** 2)
               - math.log(2 * math.pi * 0.5 * 0.5))
        w = (np.ones(n) if unit_weights
             else rng.integers(1, 4, n).astype(float))
        mlp = math.log(100.0) * np.ones(n)          # -ln(1/V), V = 10*10
        cols = [w, -lnl + mlp, a, b, a + b]
        if with_chi2:
            cols += [mlp, mlp, -2.0 * lnl, -2.0 * lnl]
        else:
            cols += [mlp, mlp]
        body = "\n".join(" ".join(f"{v:.16e}" for v in row)
                         for row in np.column_stack(cols))
        with open(f"{root}.{i + 1}.txt", "w") as fp:
            fp.write("# " + " ".join(header) + "\n" + body + "\n")
        chains.append((w, lnl, a, b))
    return root, chains


def test_sampled_params_and_volume(tmp_path, rng):
    root, _ = _write_run(tmp_path, rng, n=10)
    spec = cobaya.sampled_params(root)
    assert list(spec) == ["a", "b"]                 # derived/fixed excluded
    assert spec["a"] == (-5.0, 5.0)
    assert spec["b"] == (0.0, 10.0)                 # loc/scale form
    info = params_info(root)
    assert info.names == ["a", "b"] and info.volume == pytest.approx(100.0)
    # cosmo filter matches no Cobaya name: keeps all sampled params
    vol, ndim = get_prior_volume(root, cosmo=True)
    assert vol == pytest.approx(100.0) and ndim == 2


def test_load_columns_chi2(tmp_path, rng):
    root, chains = _write_run(tmp_path, rng, n=50)
    mats = reader.load_chains(root)
    assert len(mats) == 2
    for mat, (w, lnl, a, b) in zip(mats, chains):
        assert mat.shape == (50, 4)                 # w, -lnL, a, b only
        np.testing.assert_allclose(mat[:, 0], w)
        np.testing.assert_allclose(mat[:, 1], -lnl, rtol=1e-14)
        np.testing.assert_allclose(mat[:, 2], a, rtol=1e-14)
        np.testing.assert_allclose(mat[:, 3], b, rtol=1e-14)
    one = reader.load_chains(root, idchain=2)
    assert len(one) == 1
    np.testing.assert_allclose(one[0], mats[1])


def test_load_columns_minuslogpost_fallback(tmp_path, rng):
    root, chains = _write_run(tmp_path, rng, n=50, with_chi2=False)
    mats = reader.load_chains(root)
    for mat, (w, lnl, a, b) in zip(mats, chains):
        np.testing.assert_allclose(mat[:, 1], -lnl, rtol=1e-12, atol=1e-12)


def test_nonuniform_prior_needs_explicit_volume(tmp_path, rng):
    root, _ = _write_run(tmp_path, rng, n=10)
    (tmp_path / "toyrun.updated.yaml").write_text(
        YAML.replace("      min: -5.0\n      max: 5.0\n",
                     "      dist: norm\n      loc: 0.0\n      scale: 1.0\n"))
    with pytest.raises(ValueError, match="non-uniform prior"):
        params_info(root)
    vol, ndim = get_prior_volume(root, priorvolume=42.0)
    assert vol == 42.0 and ndim is None
    vol, ndim = get_prior_volume(root, allow_unit_fallback=True)
    assert vol == 1.0


def test_end_to_end_evidence(tmp_path, rng):
    # chains drawn exactly from their own normalized likelihood (unit
    # weights — i.i.d. draws with synthetic multiplicities would distort
    # the point density the kNN estimator reads): with the flat prior
    # volume V the truth is ln Z = -ln V
    from mcevidence_tpu import MCEvidence
    root, _ = _write_run(tmp_path, rng, n=4000, unit_weights=True)
    mce = MCEvidence(root, kmax=2, priorvolume=100.0, verbose=0,
                     engine="xla")
    lnz = mce.evidence()
    assert abs(lnz[0] - (-math.log(100.0))) < 0.15


def test_partial_cosmo_match_reorders_columns(tmp_path, rng):
    """When the cosmo-name registry matches a SUBSET of the sampled
    params, the filtered volume/ndim must pair with exactly the leading
    chain columns (MCEvidence integrates the first ndim columns):
    registry-matching params are emitted first by both the loader and
    params_info."""
    root = str(tmp_path / "mix")
    (tmp_path / "mix.updated.yaml").write_text(
        "params:\n"
        "  x1:\n    prior: {min: 0.0, max: 2.0}\n"
        "  tau:\n    prior: {min: 0.0, max: 0.5}\n"
        "  ns:\n    prior: {min: 0.8, max: 1.2}\n")
    n = 20
    x1 = rng.random(n) * 2
    tau = rng.random(n) * 0.5
    ns = 0.8 + rng.random(n) * 0.4
    body = np.column_stack([np.ones(n), np.zeros(n), x1, tau, ns,
                            np.zeros(n), np.zeros(n)])
    with open(root + ".1.txt", "w") as fp:
        fp.write("# weight minuslogpost x1 tau ns minuslogprior chi2\n")
        np.savetxt(fp, body)
    info = params_info(root, cosmo=True)
    assert info.names == ["tau", "ns"]              # registry subset only
    assert info.volume == pytest.approx(0.5 * 0.4)
    mats = reader.load_chains(root)
    # loader column order: cosmo-matching first, so columns [2:2+ndim]
    # are exactly the params the filtered volume describes
    np.testing.assert_allclose(mats[0][:, 2], tau)
    np.testing.assert_allclose(mats[0][:, 3], ns)
    np.testing.assert_allclose(mats[0][:, 4], x1)
    # cosmo=False keeps the same (reordered) full set
    info_all = params_info(root, cosmo=False)
    assert info_all.names == ["tau", "ns", "x1"]


def test_missing_chain_files_raises(tmp_path, rng):
    root, _ = _write_run(tmp_path, rng, n=10)
    with pytest.raises(FileNotFoundError):
        cobaya.resolve_cobaya_files(root, idchain=9)
    import os
    for i in (1, 2):
        os.remove(f"{root}.{i}.txt")
    with pytest.raises(FileNotFoundError):
        reader.load_chains(root)


def test_nonuniform_prior_with_minmax_rejected(tmp_path):
    """REGRESSION (round-4 review): a loguniform/norm prior carrying
    min/max keys used to be silently treated as a bounded uniform,
    normalizing ln Z by a wrong flat volume.  Only dist: uniform (the
    default) may contribute a flat range; anything else must raise the
    documented non-uniform-prior error."""
    import textwrap
    from mcevidence_tpu.chains.cobaya import cobaya_params_info, sampled_params
    (tmp_path / "run.updated.yaml").write_text(textwrap.dedent("""
        params:
          x:
            prior: {dist: loguniform, min: 1.0e-4, max: 0.1}
          y:
            prior: {min: 0.0, max: 2.0}
    """))
    root = str(tmp_path / "run")
    spec = sampled_params(root)
    assert spec["x"] is None            # non-uniform: no flat volume
    assert spec["y"] == (0.0, 2.0)      # dist defaults to uniform
    with pytest.raises(ValueError, match="non-uniform"):
        cobaya_params_info(root)
