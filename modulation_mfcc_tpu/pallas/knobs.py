"""Frontend tuning knobs (hardware A/B), resolved from the environment.

`fused_mfcc` reads these at trace time; any wrapper that MEMOIZES a trace
(the cached jits in models/modulation.py, parallel/batch.py, …) must also
pass `frontend_knobs()` through its static key, so changing the env between
calls forces a retrace instead of silently hitting a stale cache compiled
under the old knob values (code-review finding, r3 session 6 — a wrong-knob
cache hit would corrupt the DESIGN.md §8 A/B measurements).
"""
from __future__ import annotations

import os

__all__ = ["frontend_knobs"]


def frontend_knobs() -> tuple[int, bool]:
    """(blkf, pipeline) from MODMFCC_BLKF / MODMFCC_FRONTEND_PIPE.

    blkf granularity (multiple of the 16-row tail buffer) is validated by
    fused_mel_frontend, not silently clamped here — a skewed knob sweep is
    worse than an error."""
    blkf = int(os.environ.get("MODMFCC_BLKF", "1024"))
    pipeline = os.environ.get("MODMFCC_FRONTEND_PIPE", "0") == "1"
    return blkf, pipeline
