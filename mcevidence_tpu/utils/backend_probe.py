"""Bounded, out-of-process accelerator-backend probes.

During a relay outage, in-process jax backend init blocks indefinitely and
cannot be cancelled; a subprocess can always be killed.  Every entry point
that must stay outage-proof (bench.py, __graft_entry__.py) probes through
here instead of calling ``jax.devices()`` in-process.  The child inherits
sitecustomize, so it initializes the same default backend the parent would.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from typing import Optional, Tuple


def apply_forced_platform() -> Optional[str]:
    """Re-assert MCE_FORCE_PLATFORM in-process; returns the platform or None.

    The env var alone is read too early: sitecustomize imports jax at
    interpreter start and force-selects the TPU plugin, so every entry
    point (CLI, serve, planck, probe child) must re-apply the override via
    jax.config AFTER import but BEFORE the backend initializes.  Lets runs
    ride out relay outages on the CPU backend.
    """
    plat = os.environ.get("MCE_FORCE_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    return plat or None


# the probe child inlines apply_forced_platform(): it must stay runnable
# from any cwd, without the package on the child's import path
_PROBE_CODE = (
    "import os, jax; p = os.environ.get('MCE_FORCE_PLATFORM'); "
    "p and jax.config.update('jax_platforms', p); "
    "print(jax.default_backend(), len(jax.devices()))")


def probe_backend(timeout: float,
                  log=print) -> Optional[Tuple[str, int]]:
    """(backend_name, device_count) from a bounded subprocess, or None.

    None means the backend is unreachable within ``timeout`` (init blocked
    or errored) or its answer was unparseable — callers must treat all
    three the same way: do not touch the backend in-process."""
    try:
        proc = subprocess.run([sys.executable, "-c", _PROBE_CODE],
                              capture_output=True, text=True,
                              timeout=timeout)
    except subprocess.TimeoutExpired:
        log(f"backend probe: no response within {timeout:.0f}s "
            "(relay outage?)")
        return None
    if proc.returncode != 0:
        tail = (proc.stderr or "").strip().splitlines()[-1:]
        log(f"backend probe: init failed rc={proc.returncode} {tail}")
        return None
    # last stdout line should be "<name> <count>", but guard the parse:
    # a plugin/atexit message on stdout must count as a failed attempt,
    # never raise out of the probe (round-4 review finding)
    try:
        name, n = proc.stdout.strip().splitlines()[-1].split()
        return name, int(n)
    except (ValueError, IndexError):
        log(f"backend probe: unparseable answer {proc.stdout!r:.200}")
        return None


def probe_backend_with_retries(attempts: int = 3, timeout: float = 120.0,
                               backoff: float = 30.0,
                               log=print) -> Optional[Tuple[str, int]]:
    """Retrying probe: rides out transient relay flaps (the documented
    outage pattern: init blocks or raises UNAVAILABLE for minutes at a
    time).  Linear backoff between attempts."""
    for i in range(attempts):
        got = probe_backend(timeout, log=lambda m, _i=i: log(
            f"[{_i + 1}/{attempts}] {m}"))
        if got is not None:
            return got
        if i + 1 < attempts:
            time.sleep(backoff * (i + 1))
    return None
