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


def frontend_knobs() -> tuple[int, bool, str]:
    """(blkf, pipeline, flat_t) from MODMFCC_BLKF / MODMFCC_FRONTEND_PIPE /
    MODMFCC_FLAT_T.

    blkf granularity (multiple of the 16-row tail buffer) is validated by
    fused_mel_frontend, not silently clamped here — a skewed knob sweep is
    worse than an error. Positivity IS checked here: 0/negative values
    would otherwise surface as a ZeroDivisionError / shape garbage deep in
    the kernel launch.

    flat_t selects the TRANSPOSED flat-path staging (audio relayouted to
    [B, hop, rows] — no 80→128 lane pad in HBM, in-kernel transpose during
    VMEM staging; docs/DESIGN.md §8 round 5). Values: 'auto' (default —
    per-algorithm, resolved by :func:`resolve_flat_t` where the algorithm
    is known), '1' (force on), '0' (force off)."""
    blkf = int(os.environ.get("MODMFCC_BLKF", "1024"))
    if blkf <= 0:
        raise ValueError(f"MODMFCC_BLKF must be a positive multiple of 16, got {blkf}")
    pipeline = os.environ.get("MODMFCC_FRONTEND_PIPE", "0") == "1"
    flat_t = os.environ.get("MODMFCC_FLAT_T", "auto")
    if flat_t not in ("auto", "0", "1"):
        raise ValueError(
            f"MODMFCC_FLAT_T must be 'auto', '0' or '1', got {flat_t!r}"
        )
    return blkf, pipeline, flat_t


# flat_t v5e A/B at bench scale (128×30 s, lax.map n_super=8, best/median
# h/s, 2026-08-20): f32 41.3/40.8 → 46.8/46.5 (+13%, every trial
# separated), x3 65.2/59.8 → 65.7/65.3 (median-robust win), i24 59.6/57.4
# → 59.3/58.3 (wash; median +1.6%), bf16 112.9/111.7 → 110.1/107.2
# (LOSES — bf16 staging already halves the lane-pad traffic), i16
# 67.4/67.2 → 66.6/66.1 (loses). 'auto' turns flat_t on exactly for the
# f32-staged algorithms.
_FLAT_T_AUTO_ON = ("f32", "x3", "i24")


def resolve_flat_t(flat_t: str, algorithm: str) -> bool:
    """Resolve the MODMFCC_FLAT_T knob for a concrete kernel algorithm."""
    if flat_t == "auto":
        return algorithm in _FLAT_T_AUTO_ON
    return flat_t == "1"


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
