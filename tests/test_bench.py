"""bench.py driver-contract behavior.

The throughput numbers themselves need the real chip; what IS testable
anywhere is the harness behavior around them — above all the
backend-init watchdog (a dead TPU tunnel makes device enumeration
block forever in a retry-sleep loop; bench must fail fast with a
diagnostic instead of eating the driver's whole time budget).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_watchdog_returns_devices_on_healthy_backend():
    sys.path.insert(0, REPO)
    try:
        import bench
        devs = bench._init_backend_or_die(timeout_s=120)
    finally:
        sys.path.remove(REPO)
    assert devs, "no devices on a healthy backend"


def test_watchdog_exits_3_when_backend_init_hangs(tmp_path):
    """Simulate the dead-tunnel state with a stub jax whose devices()
    never returns; bench must print a diagnostic and exit 3 within the
    watchdog window (not the stub's sleep)."""
    code = f"""
import sys, time, types
stub = types.ModuleType("jax")
stub.devices = lambda: time.sleep(600)
sys.modules["jax"] = stub
sys.path.insert(0, {REPO!r})
import bench
bench._init_backend_or_die(timeout_s=2)
print("NOT REACHED")
"""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # keep the stub authoritative
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=60,
                          env=env)
    assert proc.returncode == 3, (proc.returncode, proc.stderr)
    assert "did not complete" in proc.stderr
    assert "NOT REACHED" not in proc.stdout


def test_crash_still_emits_one_json_line():
    """Regression (round 4: a nested-compiler-options ValueError left
    the driver with a bare traceback and NO metric line): an unexpected
    crash must still print one parseable JSON line and exit nonzero."""
    import json
    env = dict(os.environ)
    env["PYLC_BENCH_CRASH_FOR_TEST"] = "boom"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--mode",
         "infer"],
        capture_output=True, text=True, timeout=120, env=env)
    assert proc.returncode != 0
    assert "ValueError" in proc.stderr  # traceback still visible
    lines = [l for l in proc.stdout.splitlines() if l.strip()]
    assert len(lines) == 1, lines
    rec = json.loads(lines[0])
    assert rec["metric"] == "error" and "boom" in rec["error"]
