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


HANDOFF_SCRIPT = r"""
import json, sys, time
sys.path.insert(0, %r)
import bench

def emit(error=None):
    print(json.dumps({"partial": True, "error": error}))

def handoff(field):
    # stands in for the resume subprocess: forwards the child's artifact
    print(json.dumps({"resumed_after": field}))
    return True

dog = bench._Watchdog(emit, timeout_s=0.5, handoff=handoff)
dog.arm("hung_field")
time.sleep(60)
print("UNREACHABLE")
""" % (REPO,)


def test_watchdog_handoff_replaces_partial_artifact():
    """When the handoff succeeds, the resume child's artifact line is the
    ONLY artifact — the partial emit must not also fire."""
    r = subprocess.run(
        [sys.executable, "-c", HANDOFF_SCRIPT], capture_output=True,
        text=True, timeout=45,
    )
    assert r.returncode == 0, r.stderr
    assert "UNREACHABLE" not in r.stdout
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, r.stdout
    assert json.loads(lines[0]) == {"resumed_after": "hung_field"}


def test_watchdog_failed_handoff_falls_back_to_partial():
    script = HANDOFF_SCRIPT.replace(
        "    print(json.dumps({\"resumed_after\": field}))\n    return True",
        "    return False")
    r = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=45,
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, r.stdout
    art = json.loads(lines[0])
    assert art["partial"] is True and "hung_field" in art["error"]


def test_main_resume_state_seeds_fields_without_rerunning():
    """main(--resume <state>) with every label completed/skipped must emit
    the seeded artifact without touching the backend (no field re-runs):
    the hung field stays null and is named in hung_fields, completed
    values survive verbatim, engine_fallbacks merge without duplicates."""
    import os
    import tempfile

    labels = [
        "bf16_headline", "bf16_rows", "f32_parity_mode", "i24_parity_mode",
        "i24_rows", "f32_x3_mode", "x3_rows", "_pitch_engines_agree",
        "_pyin_engines_agree", "_pyin_engines_agree_16k", "i16_parity_mode",
        "i16_rows", "tracker_sweep", "pyin_sweep", "pyin_sweep_16k",
        "masked_batch_64", "modspec_batch", "longform_1h_s", "corpus_sweep",
        "corpus_2shard",
    ]
    completed = {l: 1.0 for l in labels if l != "tracker_sweep"}
    completed["bf16_headline"] = 99.5
    completed["i16_parity_mode"] = 64.5
    state = {
        "fields": {"value": 99.5, "i16_parity_mode": 64.5,
                   "corpus_stats": {"upload_mb": 1.0}},
        "completed": completed,
        "skip": ["tracker_sweep"],
        "hung": ["tracker_sweep"],
        "engine_fallbacks": ["pyin_sweep"],
    }
    with tempfile.NamedTemporaryFile("w", suffix=".json", delete=False) as f:
        json.dump(state, f)
        path = f.name
    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",  # the backend probe must answer instantly
        "MODMFCC_BENCH_BACKEND_TRIES": "1",
        "MODMFCC_BENCH_PROBE_TIMEOUT": "30",
        "MODMFCC_BENCH_FIELD_TIMEOUT": "60",
        "PYTHONPATH": REPO + ":" + env.get("PYTHONPATH", ""),
    })
    r = subprocess.run(
        [sys.executable, REPO + "/bench.py", "--resume", path],
        capture_output=True, text=True, timeout=240, env=env,
    )
    assert r.returncode == 0, r.stderr
    lines = [l for l in r.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, r.stdout
    art = json.loads(lines[0])
    assert art["value"] == 99.5
    assert art["i16_parity_mode"] == 64.5
    assert art["tracker_sweep"] is None
    assert art["hung_fields"] == ["tracker_sweep"]
    assert art["corpus_stats"] == {"upload_mb": 1.0}
    assert art["engine_fallbacks"] == ["pyin_sweep"]
