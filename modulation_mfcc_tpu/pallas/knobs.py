"""Env-resolved tuning knobs (hardware A/B + production escape hatches).

These are read at trace time; any wrapper that MEMOIZES a trace (the cached
jits in models/modulation.py, parallel/batch.py, parallel/corpus.py, …) must
also pass the relevant `*_knobs()` tuple through its static key, so changing
the env between calls forces a retrace instead of silently hitting a stale
cache compiled under the old knob values (code-review finding, r3 session 6 —
a wrong-knob cache hit would corrupt the DESIGN.md §8 A/B measurements, and a
stale-engine hit would keep a Mosaic-rejected kernel in play after the
operator set the escape hatch).
"""
from __future__ import annotations

import os

__all__ = ["frontend_knobs", "tracker_knobs"]


def frontend_knobs() -> tuple[int, bool, bool]:
    """(blkf, pipeline, flat_t) from MODMFCC_BLKF / MODMFCC_FRONTEND_PIPE /
    MODMFCC_FLAT_T.

    blkf granularity (multiple of the 16-row tail buffer) is validated by
    fused_mel_frontend, not silently clamped here — a skewed knob sweep is
    worse than an error. Positivity IS checked here: 0/negative values
    would otherwise surface as a ZeroDivisionError / shape garbage deep in
    the kernel launch.

    flat_t selects the TRANSPOSED flat-path staging (audio relayouted to
    [B, hop, rows] — no 80→128 lane pad in HBM, in-kernel transpose during
    VMEM staging; docs/DESIGN.md §8 round 5)."""
    blkf = int(os.environ.get("MODMFCC_BLKF", "1024"))
    if blkf <= 0:
        raise ValueError(f"MODMFCC_BLKF must be a positive multiple of 16, got {blkf}")
    pipeline = os.environ.get("MODMFCC_FRONTEND_PIPE", "0") == "1"
    flat_t = os.environ.get("MODMFCC_FLAT_T", "0") == "1"
    return blkf, pipeline, flat_t


def tracker_knobs() -> tuple[str, str, str]:
    """(sinc_engine, viterbi_engine, cmndf_engine) overrides for the
    trackers' 'auto' engine defaults, from MODMFCC_SINC_ENGINE /
    MODMFCC_VITERBI_ENGINE / MODMFCC_CMNDF_ENGINE — production A/B hatches
    ('auto' resolves to the measured-fastest forms on v5e: XLA sinc/Viterbi
    and, on TPU, the MXU CMNDF; these knobs force the Pallas kernels or pin
    an engine without touching call sites — CMNDF gets one too because it
    is the only engine 'auto' turns ON by default on TPU, so a runtime
    where it misbehaves needs a no-code-change off switch). Resolved in the
    public pitch_ac/pyin_f0 wrappers BEFORE the jit cache lookup (the
    resolved engine is the static arg), and threaded through the static key
    of every memoized wrapper that traces a tracker
    (parallel/corpus._extras_impl)."""
    return (
        os.environ.get("MODMFCC_SINC_ENGINE", "auto"),
        os.environ.get("MODMFCC_VITERBI_ENGINE", "auto"),
        os.environ.get("MODMFCC_CMNDF_ENGINE", "auto"),
    )
