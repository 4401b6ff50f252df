"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip paths (shard_map over a Mesh) are testable without a TPU slice via
XLA's host-platform device partitioning (SURVEY.md §4). Env vars must be set
before jax initializes its backends, hence the top-of-conftest placement.
"""
import os

# Force CPU for tests even though the session environment pins JAX_PLATFORMS
# to the TPU backend — unit tests must be runnable anywhere, and the virtual
# 8-device mesh only exists on the host platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# jax may already be imported by a sitecustomize hook with the session's
# JAX_PLATFORMS (TPU) baked into its config — override the config value too.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# Persistent compilation cache: CPU jit compiles dominate test wall-clock on
# this single-core host; cache makes re-runs cheap.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# vm.max_map_count: the full suite mmaps ~250-300 regions per JIT-compiled
# CPU executable-heavy test; at the Linux default (65530) the process runs
# out of map slots around test #255 and SEGFAULTS inside whatever XLA
# C++ path next allocates executable memory (measured 2026-08-21: three
# cold-cache runs died at the SAME test — twice in deserialize_executable,
# once in serialize after a cache-read shim moved the allocation; a
# 104-test subset alone peaked at ≥48.5k maps). Raise it best-effort (root
# on this image; resets at boot, hence here and not a one-off sysctl).
_MAPS_NEEDED = 262144
try:
    with open("/proc/sys/vm/max_map_count") as _fh:
        _cur_maps = int(_fh.read().strip())
    if _cur_maps < _MAPS_NEEDED:
        with open("/proc/sys/vm/max_map_count", "w") as _fh:
            _fh.write(str(_MAPS_NEEDED))
except OSError:
    import warnings

    warnings.warn(
        "could not raise vm.max_map_count; a full-suite run may segfault "
        "near test #255 from mmap exhaustion (see tests/conftest.py)"
    )

import numpy as np  # noqa: E402
import pytest  # noqa: E402


_DESELECTED = 0


def pytest_deselected(items):
    global _DESELECTED
    _DESELECTED += len(items)


def pytest_sessionfinish(session, exitstatus):
    """Stamp the suite outcome so bench.py can record `tests_green` in the
    artifact (round-3 verdict: an artifact round shipped with a red suite
    and nothing caught it — the bench watchdog guards hangs, not test rot).

    The stamp records the git HEAD it ran at; bench.py reports green only
    when the stamp is green, complete (no -k/-x subsetting), and matches
    the HEAD being benched."""
    import json
    import pathlib
    import subprocess
    import time

    repo = pathlib.Path(__file__).resolve().parent.parent
    try:
        head = subprocess.run(
            ["git", "-C", str(repo), "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
        dirty = bool(subprocess.run(
            ["git", "-C", str(repo), "status", "--porcelain"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip())
    except Exception:
        head, dirty = "", True
    # full_run: every positional arg resolves to the whole tests dir (or the
    # repo root) and no -k/-m filter narrowed collection. Without this a
    # `pytest tests/test_one.py` run stamped itself as the suite and bench.py
    # reported "full suite (2 tests) green" — the exact rot the stamp exists
    # to catch (r4 session-1 artifact did exactly that).
    tests_dir = pathlib.Path(__file__).resolve().parent
    opt = session.config.option
    full_run = not (
        opt.keyword
        or opt.markexpr
        # --collect-only exits 0 having RUN nothing; --ignore/--deselect
        # silently drop whole files/tests while args still say "tests/"
        or getattr(opt, "collectonly", False)
        or getattr(opt, "ignore", None)
        or getattr(opt, "ignore_glob", None)
        or getattr(opt, "deselect", None)
        # belt-and-braces: a "full" run of this suite executes hundreds of
        # tests; a run that collected almost nothing is not the suite
        or int(getattr(session, "testscollected", 0)) < 50
    )
    for a in session.config.args:
        try:
            pa = pathlib.Path(a.split("::")[0]).resolve()
        except OSError:
            full_run = False
            break
        if pa not in (tests_dir, repo) or "::" in a:
            full_run = False
            break
    stamp = {
        "exitstatus": int(exitstatus),
        "collected": int(getattr(session, "testscollected", 0)),
        "deselected": _DESELECTED,
        "full_run": full_run,
        "args": list(session.config.invocation_params.args),
        "git_head": head,
        "git_dirty": dirty,
        "time": time.time(),
    }
    try:
        (repo / ".pytest_status.json").write_text(json.dumps(stamp))
    except OSError:
        pass


@pytest.fixture()
def rng():
    # function-scoped: every test sees the same deterministic stream
    # regardless of which other tests ran before it
    return np.random.default_rng(20260816)


@pytest.fixture(scope="session")
def speechlike():
    rng = np.random.default_rng(20260816)
    """A deterministic speech-like test signal: a few seconds at 10 kHz of
    amplitude-modulated harmonics + noise, with silent lead-in/out."""
    sr = 10_000
    t = np.arange(int(2.0 * sr)) / sr
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 2.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = sum((0.6 / k) * np.sin(k * phase) for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 4.0 * t - np.pi / 2))
    sig = sig * env + 0.01 * rng.standard_normal(len(t))
    sig[: sr // 10] = 0.0
    sig[-sr // 10 :] = 0.0
    return sig.astype(np.float64), sr
