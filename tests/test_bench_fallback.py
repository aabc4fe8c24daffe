"""bench.py must print ONE parseable JSON line even during relay outages.

VERDICT r3 weak #1 / next-round item 1: round 3's bench burned the whole
driver window probing a downed relay and emitted nothing (rc=124,
parsed=null). These tests run bench.py as a subprocess with the probe
command stubbed (BENCH_PROBE_CMD) so no TPU contact ever happens, and
assert a parseable fallback line lands fast.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")


def _run(env_extra, timeout=90):
    env = dict(os.environ)
    env.update(env_extra)
    proc = subprocess.run(
        [sys.executable, BENCH],
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )
    return proc


def _parse_single_json_line(stdout):
    lines = [ln for ln in stdout.splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected exactly one stdout line, got: {lines!r}"
    return json.loads(lines[0])


def test_outage_emits_stale_last_good_quickly():
    # probe always fails, 1 s probe budget -> must fall back to
    # BENCH_LAST_GOOD.json marked stale, well inside the driver window
    proc = _run({"BENCH_PROBE_CMD": "false", "BENCH_WAIT_DEVICE_S": "1"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _parse_single_json_line(proc.stdout)
    assert "metric" in out and "value" in out and "unit" in out
    assert out.get("stale") is True
    assert "unavailable" in out["stale_reason"]
    # seeded from the driver-verified r2 run; a later successful run may
    # overwrite it, but it must stay a real nonzero measurement
    assert out["value"] > 0


def test_outage_without_last_good_emits_error_line(tmp_path, monkeypatch):
    # hide the last-good file by running from a copied bench.py whose
    # repo dir has no BENCH_LAST_GOOD.json
    bench_copy = tmp_path / "bench.py"
    bench_copy.write_text(open(BENCH).read())
    env = dict(os.environ)
    env.update({"BENCH_PROBE_CMD": "false", "BENCH_WAIT_DEVICE_S": "1"})
    proc = subprocess.run(
        [sys.executable, str(bench_copy)],
        capture_output=True, text=True, timeout=90, env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _parse_single_json_line(proc.stdout)
    assert out["value"] == 0.0
    assert "error" in out
    assert "metric" in out and "unit" in out and "vs_baseline" in out


def test_deadline_watchdog_emits_fallback():
    # probe hangs longer than the deadline -> watchdog must emit and exit 0
    proc = _run({
        "BENCH_PROBE_CMD": "sleep 60",
        "BENCH_WAIT_DEVICE_S": "50",
        "BENCH_DEADLINE_S": "3",
    }, timeout=60)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _parse_single_json_line(proc.stdout)
    assert out.get("stale") is True
    assert "deadline" in out["stale_reason"]


@pytest.mark.parametrize("budget", ["1"])
def test_fallback_is_fast(budget):
    import time

    t0 = time.monotonic()
    proc = _run({"BENCH_PROBE_CMD": "false", "BENCH_WAIT_DEVICE_S": budget})
    dt = time.monotonic() - t0
    assert proc.returncode == 0
    # one failed probe + emit; must be far under the ~10-min bar
    assert dt < 60, f"fallback took {dt:.1f}s"
