"""Persistent compilation cache.

TPU compiles in this deployment go through a remote compile service and cost
minutes per shape; the in-service cache is LRU and unreliable across
processes.  JAX's persistent compilation cache makes recompiles a disk read.
Called by every entry point (CLI, planck driver, bench, graft) and the
MCEvidence constructor; idempotent.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

# False -> undecided; "provisional" -> enabled pre-init from plugin
# registration (must be re-checked once the backend is actually up);
# True -> final.
_enabled = False


def enable_compilation_cache(path: str = "") -> None:
    global _enabled
    if _enabled is True:
        return
    import jax

    # only worth it (and only safe) for accelerator backends: TPU compiles
    # cost minutes, while cached CPU AOT executables can carry machine
    # features the current host lacks (SIGILL risk when the cache dir moves
    # between heterogeneous CPU hosts).  Deciding must NOT initialize the
    # backend: init can block indefinitely behind a dead relay (BASELINE.md
    # ops note), and this function runs in entry points that must stay
    # outage-proof — when the backend is not up yet, infer from the pinned
    # platform config and the registered (not instantiated) plugins, and
    # finalize the decision on the next call after init (every MCEvidence
    # construction re-enters here, so a fallback is caught before the
    # estimator's own compiles).
    backends_up = False
    try:
        from jax._src import xla_bridge
        backends_up = bool(getattr(xla_bridge, "_backends", None))
        if backends_up:
            # exact, and the same rule as the pre-init branch: any real
            # accelerator qualifies, cpu/interpreter do not
            accel = jax.default_backend() not in ("cpu", "interpreter")
            if not accel and _enabled == "provisional":
                # pre-init trusted the registered accelerator plugin but
                # init fell back to CPU (dead relay): withdraw the cache
                # dir so CPU AOT executables never land in it
                jax.config.update("jax_compilation_cache_dir", None)
                logger.debug("withdrew persistent cache: backend fell "
                             "back to %s", jax.default_backend())
                _enabled = True
                return
        else:
            platforms = (jax.config.jax_platforms or "").split(",")
            factories = set(getattr(xla_bridge, "_backend_factories", {}))
            accel = ("cpu" not in platforms[:1]
                     and bool(factories - {"cpu", "interpreter"}))
        if not accel:
            _enabled = True
            return
    except Exception:
        return

    path = path or os.environ.get(
        "MCE_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "mcevidence_jax"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True if backends_up else "provisional"
        logger.debug("persistent compilation cache at %s%s", path,
                     "" if backends_up else " (provisional until init)")
    except Exception as e:   # never let cache setup break an estimate
        logger.warning("could not enable compilation cache: %s", e)


# ---------------------------------------------------------------------------
# compile-shape audit: every device dispatch path records its padded shape
# signature here.  Distinct entries correspond ~1:1 to distinct compiled XLA
# programs; with remote TPU compiles costing minutes per shape (and relay
# program loads seconds per shape per process), the distinct-shape count is
# a first-class performance metric for a grid run.
# ---------------------------------------------------------------------------

_SHAPE_LOG: set = set()


def record_shape(tag: str, **dims) -> None:
    _SHAPE_LOG.add((tag, tuple(sorted(dims.items()))))


def shape_report() -> list:
    """Sorted human-readable audit lines, one per distinct program shape."""
    return sorted(
        "%s[%s]" % (tag, ", ".join(f"{k}={v}" for k, v in dims))
        for tag, dims in _SHAPE_LOG)


def reset_shape_log() -> None:
    _SHAPE_LOG.clear()
