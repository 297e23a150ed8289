"""bench.py relay-outage watchdog: the driver must always get ONE
machine-readable JSON line, never an indefinite hang (BASELINE.md records
multi-hour relay outages where even backend init blocks)."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, cwd=REPO, env=env, timeout=60)


def test_watchdog_fires_with_schema_line():
    p = _run("import bench, time; bench._arm_watchdog(0.3); time.sleep(30)")
    assert p.returncode == 2
    d = json.loads(p.stdout.strip().splitlines()[-1])
    assert d["metric"] == "nn_pairs_per_sec_per_chip"
    assert d["value"] == 0.0 and d["vs_baseline"] == 0.0
    assert "error" in d


def test_watchdog_cancel_is_clean():
    p = _run("import bench, time; t = bench._arm_watchdog(0.3); t.cancel(); "
             "time.sleep(0.6); print('clean')")
    assert p.returncode == 0
    assert p.stdout.strip() == "clean"
