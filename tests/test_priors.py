"""Prior-metadata tests: .ranges / log.param parsing, volumes, registry
(reference MCEvidence.py:1173-1339)."""

import numpy as np
import pytest

from mcevidence_tpu import registry
from mcevidence_tpu.priors.params_info import (get_prior_volume, params_info,
                                               parse_log_param_line)


@pytest.fixture(autouse=True)
def _clean_registry():
    registry.reset_cosmo_params()
    yield
    registry.reset_cosmo_params()


def test_ranges_parsing(tmp_path):
    root = tmp_path / "toy"
    (tmp_path / "toy.ranges").write_text(
        "omegabh2 0.02 0.03\n"
        "tau 0.01 0.2\n"
        "fixed 1 1\n"            # min==max: skipped
        "nuis 0 10\n"            # non-cosmo
        "unbound 0 N\n")         # N = +inf
    info = params_info(str(root), cosmo=True)
    assert info.names == ["omegabh2", "tau"]
    assert np.isclose(info.volume, 0.01 * 0.19)
    assert info.ndim == 2
    # allparams mode keeps the nuisance and the unbounded row
    info_all = params_info(str(root), cosmo=False)
    assert "nuis" in info_all.names and "unbound" in info_all.names
    assert np.isinf(info_all.volume)


def test_log_param_parsing(tmp_path):
    d = tmp_path / "mp"
    d.mkdir()
    (d / "log.param").write_text(
        "data.parameters['omega_b'] = [2.2, 1.8, 2.6, 0.01, 0.01, 'cosmo']\n"
        "data.parameters['H0'] = [67, 60, 80, 1, 1, 'cosmo']\n"
        "data.parameters['A_act'] = [1, 0, 2, 0.1, 1, 'nuisance']\n"
        "data.parameters['sigma8'] = [0.8, None, None, 0, 1, 'derived']\n")
    info = params_info(str(d), cosmo=True)
    assert info.names == ["omega_b", "H0"]
    assert np.isclose(info.volume, (2.6 - 1.8) * 20)
    info_all = params_info(str(d), cosmo=False)
    assert info_all.names == ["omega_b", "H0", "A_act"]


def test_log_param_unbounded_rejected(tmp_path):
    d = tmp_path / "mp"
    d.mkdir()
    (d / "log.param").write_text(
        "data.parameters['x'] = [1, None, None, 0.1, 1, 'cosmo']\n")
    with pytest.raises(ValueError, match="Unbounded"):
        params_info(str(d), cosmo=True)


def test_parse_log_param_line():
    name, arr = parse_log_param_line(
        "data.parameters['omega_b'] = [2.2, 1.8, 2.6, 0.01, 0.01, 'cosmo']")
    assert name == "omega_b"
    assert arr == [2.2, 1.8, 2.6, 0.01, 0.01, "cosmo"]


def test_get_prior_volume_fallbacks(tmp_path):
    missing = str(tmp_path / "missing")
    with pytest.raises(FileNotFoundError):
        get_prior_volume(missing)
    v, nd = get_prior_volume(missing, priorvolume=2.5)
    assert v == 2.5 and nd is None
    v, nd = get_prior_volume(missing, allow_unit_fallback=True)
    assert v == 1.0


def test_registry_extension(tmp_path):
    assert registry.iscosmo_param("omegabh2")
    assert not registry.iscosmo_param("mynewpar")
    pf = tmp_path / "extra.txt"
    pf.write_text("mynewpar\n# a comment line\n\nother\n")
    names = registry.load_params_file(str(pf))
    assert names == ["mynewpar", "other"]
    assert registry.iscosmo_param("mynewpar")
    # reference-compat: extra names via the query itself
    assert registry.iscosmo_param("adhoc", cosmo_params=["adhoc"])


def test_ranges_unbounded_min(tmp_path):
    (tmp_path / "t.ranges").write_text("omegabh2 N 0.03\ntau 0.01 0.2\n")
    info = params_info(str(tmp_path / "t"), cosmo=True)
    assert np.isneginf(info.mins[0])
    assert np.isinf(info.volume)


def test_cli_paramsfile_extends_registry(tmp_path, rng):
    # --paramsfile names count as cosmological for the prior volume
    n = 400
    theta = rng.normal([1.0, 2.0], [0.05, 0.05], size=(n, 2))
    neglnl = 0.5 * np.sum(((theta - [1, 2]) / 0.05) ** 2, axis=1)
    np.savetxt(tmp_path / "c_1.txt",
               np.column_stack([np.ones(n), neglnl, theta]))
    np.savetxt(tmp_path / "c_2.txt",
               np.column_stack([np.ones(n), neglnl, theta]))
    (tmp_path / "c.ranges").write_text("tau 0.5 1.5\nmycustom 1.5 2.5\n")
    pf = tmp_path / "extra.txt"
    pf.write_text("mycustom\n")
    from mcevidence_tpu.cli import main
    rc = main([str(tmp_path / "c"), "-k", "2", "-vb", "0", "--engine", "xla",
               "--paramsfile", str(pf)])
    assert rc == 0
    # with the paramsfile, both params count: ndim resolved to 2


def test_log_param_inline_comment_kept(tmp_path):
    # a valid parameter line with a trailing comment must be parsed, while
    # a commented-out line must be skipped (the reference dropped BOTH,
    # MCEvidence.py:1239, silently shrinking the prior volume)
    d = tmp_path / "mp"
    d.mkdir()
    (d / "log.param").write_text(
        "data.parameters['omega_b'] = [2.2, 1.8, 2.6, 0.01, 0.01, 'cosmo']"
        "  # baseline prior\n"
        "# data.parameters['junk'] = [1, 0, 2, 0.1, 1, 'cosmo']\n"
        "data.parameters['H0'] = [67, 60, 80, 1, 1, 'cosmo']\n")
    info = params_info(str(d), cosmo=True)
    assert info.names == ["omega_b", "H0"]
    assert np.isclose(info.volume, (2.6 - 1.8) * 20)


def test_zero_parameter_match_raises(tmp_path):
    # cosmo filter matching nothing must be a clear error, not a silent
    # volume=1 / ndim=0 that runs the estimator on zero-column samples
    (tmp_path / "t.ranges").write_text("notacosmoname 0 1\n")
    with pytest.raises(ValueError, match="no usable.*allparams"):
        params_info(str(tmp_path / "t"), cosmo=True)
    # every parameter fixed: same error even without the filter
    (tmp_path / "u.ranges").write_text("a 1 1\nb 2 2\n")
    with pytest.raises(ValueError, match="no usable"):
        params_info(str(tmp_path / "u"), cosmo=False)
    # get_prior_volume degrades per its normal fallback contract
    v, nd = get_prior_volume(str(tmp_path / "t"), priorvolume=3.0)
    assert v == 3.0 and nd is None


def test_registry_inline_comment_and_query_isolation(tmp_path):
    # --paramsfile names keep their value when a trailing comment follows
    # (the reference dropped the whole line); per-query cosmo_params no
    # longer leak into the process-global registry (serve workers)
    pf = tmp_path / "extra.txt"
    pf.write_text("mnu2  # neutrino mass variant\n# fully commented\nxpar\n")
    names = registry.load_params_file(str(pf))
    assert names == ["mnu2", "xpar"]
    assert registry.iscosmo_param("mnu2")
    registry.reset_cosmo_params()
    assert registry.iscosmo_param("adhoc", cosmo_params=["adhoc"])
    assert not registry.iscosmo_param("adhoc")   # not persisted
