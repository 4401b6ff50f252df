"""Praat-style intensity (dB SPL) — pitch-floor-sized Kaiser-20 window.

Replaces the reference's ``call(sound, "To Intensity", minPitch, timeStep, 1)``
(script/mfcc.py:229-233, script/calc.py:156 via sound.to_intensity()):
windowed mean square of the mean-subtracted signal, expressed in dB re
2·10⁻⁵ Pa (auditory threshold). Praat's conventions: the physical window
spans 6.4 periods of the minimum pitch (twice the documented 3.2-period
*effective* duration), tapered by the "Kaiser-20" window (β = 2π·3.2221888,
sidelobes < -190 dB so F0 ripple stays below the dB floor), applied to the
squared samples and normalized by the window sum.

TPU formulation: one framed weighted-square reduction — frames [NF, nw] ×
window → matvec — entirely fused by XLA.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from modulation_mfcc_tpu.ops.framing import frame_by_slices

__all__ = ["intensity_db", "intensity_times"]

_HEARING_THRESHOLD_SQ = 4.0e-10  # (2e-5 Pa)^2


def _geometry(n: int, sr: float, min_pitch: float, time_step: float):
    win_dur = 6.4 / min_pitch  # physical = 2 × the 3.2-period effective span
    nw = int(round(win_dur * sr))
    nw = min(max(nw, 2), n)
    hop = max(1, int(round(time_step * sr)))
    nf = max(1, 1 + (n - nw) // hop)
    start0 = max(0, (n - nw - (nf - 1) * hop) // 2)  # Praat-centered grid
    return nw, hop, nf, start0


@partial(jax.jit, static_argnames=("sr", "min_pitch", "time_step"))
def intensity_db(
    x: jnp.ndarray, *, sr: float, min_pitch: float = 100.0, time_step: float = 0.01
) -> jnp.ndarray:
    """Intensity contour [NF] in dB for 1-D x (interpreted as Pascal)."""
    n = x.shape[-1]
    nw, hop, nf, start0 = _geometry(n, sr, min_pitch, time_step)
    w2 = np.kaiser(nw, 2.0 * np.pi * 3.2221888402924036)  # Praat kaiser20
    w2 = w2 / w2.sum()
    frames = frame_by_slices(x, start0, nf, nw, hop)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    ms = frames**2 @ jnp.asarray(w2, dtype=x.dtype)
    return 10.0 * jnp.log10(jnp.maximum(ms / _HEARING_THRESHOLD_SQ, 1e-30))


def intensity_times(n: int, sr: float, min_pitch: float, time_step: float) -> np.ndarray:
    """Frame-center times of :func:`intensity_db` (host-side)."""
    nw, hop, nf, start0 = _geometry(n, sr, min_pitch, time_step)
    return (start0 + np.arange(nf) * hop + nw / 2.0) / sr
