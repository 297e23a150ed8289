"""emcee HDFBackend ingestion (extension beyond the reference, whose emcee
leg only consumed in-memory flatlnprobability — reference examples.py:
500-531; the on-disk HDF5 backend is how long emcee runs are stored)."""

import math

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from mcevidence_tpu.chains import reader


def _write_backend(path, rng, nsteps=1500, nwalkers=4, ndim=2,
                   group="mcmc", extra_steps=0):
    """Synthetic emcee-v3 backend: walkers hold draws from a normalized
    2-D Gaussian likelihood (log_prob = +lnL)."""
    chain = rng.normal(0.0, 0.5, size=(nsteps + extra_steps, nwalkers, ndim))
    logp = (-0.5 * np.sum((chain / 0.5) ** 2, axis=2)
            - 0.5 * ndim * math.log(2 * math.pi * 0.25))
    with h5py.File(path, "w") as fp:
        g = fp.create_group(group)
        g.attrs["iteration"] = nsteps       # live steps; tail is scratch
        g.create_dataset("chain", data=chain)
        g.create_dataset("log_prob", data=logp)
        g.create_dataset("accepted", data=np.zeros(nwalkers))
    return chain[:nsteps], logp[:nsteps]


def test_load_walkers_as_chains(tmp_path, rng):
    p = str(tmp_path / "run.h5")
    chain, logp = _write_backend(p, rng, nsteps=200, extra_steps=37)
    mats = reader.load_chains(p)
    assert len(mats) == 4
    for wk, mat in enumerate(mats):
        assert mat.shape == (200, 4)
        np.testing.assert_array_equal(mat[:, 0], 1.0)
        np.testing.assert_allclose(mat[:, 1], -logp[:, wk])   # -lnL stored
        np.testing.assert_allclose(mat[:, 2:], chain[:, wk])
    one = reader.load_chains(p, idchain=3)
    assert len(one) == 1
    np.testing.assert_allclose(one[0], mats[2])
    with pytest.raises(ValueError, match="walkers"):
        reader.load_chains(p, idchain=9)


def test_nonstandard_group_name_found(tmp_path, rng):
    p = str(tmp_path / "zeus.hdf5")
    _write_backend(p, rng, nsteps=50, group="samples")
    assert len(reader.load_chains(p)) == 4


def test_not_a_backend_rejected(tmp_path):
    p = str(tmp_path / "other.h5")
    with h5py.File(p, "w") as fp:
        fp.create_dataset("stuff", data=np.zeros(3))
    with pytest.raises(ValueError, match="emcee-backend"):
        reader.load_chains(p)


def test_corrupt_h5_clean_error(tmp_path):
    p = tmp_path / "broken.h5"
    p.write_bytes(b"this is not hdf5 at all")
    with pytest.raises(ValueError, match="not a readable HDF5"):
        reader.load_chains(str(p))


def test_end_to_end_evidence(tmp_path, rng):
    # walkers drawn from their own normalized likelihood; flat prior volume
    # V => truth ln Z = -ln V
    from mcevidence_tpu import MCEvidence
    p = str(tmp_path / "run.h5")
    _write_backend(p, rng, nsteps=1500, nwalkers=4)
    lnz = MCEvidence(p, kmax=2, priorvolume=64.0, verbose=0,
                     engine="xla").evidence()
    assert abs(lnz[0] - (-math.log(64.0))) < 0.15
