"""bench.py mid-run hang watchdog.

The 2026-08-19 tunnel failure mode passes the backend-init probe but then
blocks forever INSIDE device execution (C++ call, GIL released) — no
exception ever reaches bench.py's per-field guard. The watchdog must emit
the partial artifact (fields completed so far) and hard-exit so the driver
still records an artifact for the round. ``os._exit`` ends the process, so
the behavior is asserted from a subprocess.
"""
import json
import subprocess
import sys

REPO = __file__.rsplit("/tests/", 1)[0]

SCRIPT = r"""
import json, sys, time
sys.path.insert(0, %r)
import bench

fields = {"value": 42.0, "pending": None}

def emit(error=None):
    art = {"value": fields["value"], "pending": fields["pending"]}
    if error is not None:
        art["error"] = error
    print(json.dumps(art))

dog = bench._Watchdog(emit, timeout_s=0.5)
dog.arm("completed_field")
fields["value"] = 43.0  # field finishes, result recorded
dog.disarm()
dog.arm("hung_field")
time.sleep(60)  # simulates a jax call that never returns
print("UNREACHABLE")
""" % (REPO,)


def test_watchdog_emits_partial_artifact_and_exits():
    r = subprocess.run(
        [sys.executable, "-c", SCRIPT], capture_output=True, text=True,
        timeout=45,
    )
    assert r.returncode == 0, r.stderr
    assert "UNREACHABLE" not in r.stdout
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, r.stdout
    art = json.loads(lines[0])
    # the completed field's value survives; the hang is named
    assert art["value"] == 43.0
    assert art["pending"] is None
    assert "hung_field" in art["error"]


def test_watchdog_disarm_prevents_firing():
    script = SCRIPT.replace("time.sleep(60)", "dog.disarm(); time.sleep(12)") \
                   .replace('print("UNREACHABLE")', 'print("REACHED")')
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=45,
    )
    assert r.returncode == 0, r.stderr
    assert "REACHED" in r.stdout
