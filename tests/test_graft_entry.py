"""The driver entry points must stay importable, runnable, and
outage-proof (VERDICT r3 item 1: a dead relay must never hang them)."""

import numpy as np

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    # backend-free contract: example args are host arrays, so entry() can
    # never block on accelerator-backend init
    assert all(isinstance(a, np.ndarray) for a in args)
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (5,)
    assert np.all(np.isfinite(out[1:]))
    assert abs(out[1]) < 0.5       # lnZ ~ 0 for the synthetic chain


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_probe_backend_is_bounded():
    # a probe that cannot finish in time must return None quickly, not hang
    # (this is the round-3 failure mode: in-process jax.devices() blocked
    # behind a dead relay until the driver's timeout killed the run)
    import time

    import __graft_entry__ as ge
    t0 = time.perf_counter()
    assert ge._probe_backend(timeout=0.01) is None
    assert time.perf_counter() - t0 < 10.0


def test_initialized_device_count_short_circuit():
    # the test process is pinned to cpu with 8 virtual devices: the cheap
    # in-process check must answer without any subprocess probe
    import __graft_entry__ as ge
    assert ge._initialized_device_count() == 8
