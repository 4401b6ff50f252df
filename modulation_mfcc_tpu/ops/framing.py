"""Signal framing for STFT-style analysis (device-side, JAX).

TPU-first design note: framing is a static-shape gather ``x[starts + iota]``
that XLA lowers to a single fused gather; no Python loops, no dynamic shapes.
Frame counts/time anchors are computed host-side from static lengths.

Semantics match librosa's centered STFT framing used by the reference's MFCC
call (reference: script/mfcc.py:387): the signal is padded by ``n_fft // 2``
zeros on both sides (librosa stft ``center=True, pad_mode='constant'``) and
frames of ``n_fft`` samples are taken every ``hop`` samples.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def n_frames_centered(n_samples: int, n_fft: int, hop: int) -> int:
    """Number of STFT frames for a centered transform (librosa convention)."""
    return 1 + (n_samples + 2 * (n_fft // 2) - n_fft) // hop


def frame_signal(
    x: jnp.ndarray,
    frame_length: int,
    hop: int,
    *,
    center: bool = True,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """Slice ``x[..., T]`` into overlapping frames ``[..., n_frames, frame_length]``.

    With ``center=True`` pads ``frame_length // 2`` on each side first
    (librosa convention; ``pad_mode='constant'`` = zeros, the librosa>=0.10
    default used by the reference's ``librosa.feature.mfcc`` call).
    """
    n = x.shape[-1]
    if center:
        pad = frame_length // 2
        cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
        if pad_mode == "constant":
            x = jnp.pad(x, cfg)
        elif pad_mode == "reflect":
            x = jnp.pad(x, cfg, mode="reflect")
        else:
            raise ValueError(f"Unsupported pad_mode {pad_mode!r}")
        total = n + 2 * pad
    else:
        total = n
    nf = 1 + (total - frame_length) // hop
    if nf <= 0:
        raise ValueError(
            f"Signal of length {n} too short for frame_length={frame_length}"
        )
    # Static index matrix: [nf, frame_length]
    idx = np.arange(nf)[:, None] * hop + np.arange(frame_length)[None, :]
    return x[..., idx]


def frame_times_mfcc(n_frames: int, t_step: float, win_len: float) -> np.ndarray:
    """Time anchors of the reference's MFCC-change output.

    Reference: script/mfcc.py:390 —
    ``T = round((arange(1, n_frames+1) * tStep) + winLen/2, 4)``.
    Host-side (static shapes, float64, 4-decimal rounding preserved).
    """
    return np.round(np.arange(1, n_frames + 1) * t_step + win_len / 2.0, 4)


def frame_times_centered(n_frames: int, hop: int, sr: float) -> np.ndarray:
    """librosa ``frames_to_time``-style anchors: frame i at ``i * hop / sr``."""
    return np.arange(n_frames) * (hop / sr)
