"""Length-masked variants of the edge-sensitive ops.

Variable-length batching without parity drift (SURVEY.md §7 hard part #3):
zero-phase filters and derivative stencils reflect/fit around the *true* end
of each utterance, so a padded batch naively filtered along its static time
axis would differ from per-file results near every valid/invalid boundary.

These variants take a traced per-item valid length ``L`` and reproduce the
exact single-file edge behavior inside a static buffer:

  * the odd extension is built with clamped gathers whose reflection point is
    the dynamic ``L-1`` (not the padded end);
  * time reversal reverses only the valid prefix (gather with dynamic
    offset) — the IIR scans are causal, so junk beyond the prefix never
    propagates backward into valid samples;
  * gradient / Savitzky-Golay edge rows are rewritten at the dynamic
    boundary indices with `where` masks.

Everything stays static-shape and vmappable: per-utterance lengths are plain
traced scalars under `jax.vmap`, so one compiled program serves every length
in a bucket.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from modulation_mfcc_tpu.ops.filters import sosfilt, _lfilter_scan
from modulation_mfcc_tpu.ops.savgol import _savgol_design

__all__ = [
    "masked_odd_ext",
    "masked_reverse",
    "masked_sosfiltfilt",
    "masked_filtfilt",
    "masked_gradient",
    "masked_savgol",
]


def _take(x: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather along the last axis with an index vector (broadcast over lead)."""
    return jnp.take(x, idx, axis=-1)


def masked_odd_ext(x: jnp.ndarray, length, padlen: int) -> jnp.ndarray:
    """Odd extension around [0, length) inside a static buffer.

    x: [..., T]; length: traced scalar. Returns [..., T + 2*padlen] whose
    first ``length + 2*padlen`` entries equal scipy's odd_ext of x[:length];
    the rest are zeros.
    """
    t = x.shape[-1]
    j = jnp.arange(t + 2 * padlen) - padlen
    x0 = x[..., :1]
    xe = _take(x, jnp.clip(length - 1, 0, t - 1)[None])  # [..., 1]
    left = 2.0 * x0 - _take(x, jnp.clip(-j, 0, t - 1))
    mid = _take(x, jnp.clip(j, 0, t - 1))
    right = 2.0 * xe - _take(x, jnp.clip(2 * length - 2 - j, 0, t - 1))
    vals = jnp.where(j < 0, left, jnp.where(j < length, mid, right))
    return jnp.where(j < length + padlen, vals, 0.0)


def masked_reverse(y: jnp.ndarray, ext_len) -> jnp.ndarray:
    """Reverse the valid prefix [0, ext_len) of y along the last axis."""
    t = y.shape[-1]
    i = jnp.arange(t)
    rev = _take(y, jnp.clip(ext_len - 1 - i, 0, t - 1))
    return jnp.where(i < ext_len, rev, 0.0)


def masked_sosfiltfilt(
    sos: np.ndarray, zi: np.ndarray, padlen: int, x: jnp.ndarray, length
) -> jnp.ndarray:
    """sosfiltfilt of x[..., :length] inside the static buffer [..., T].

    Output positions >= length are unspecified (masked downstream). The
    forward/backward passes are full-buffer causal scans; correctness of the
    valid region follows from causality + valid-prefix reversal.
    """
    t = x.shape[-1]
    ext = masked_odd_ext(x, length, padlen)
    zi_b = np.asarray(zi)
    zi_c = jnp.asarray(zi_b).reshape((zi_b.shape[0],) + (1,) * (x.ndim - 1) + (2,))
    y = sosfilt(sos, ext, zi=zi_c * ext[..., :1])
    ext_len = length + 2 * padlen
    yr = masked_reverse(y, ext_len)
    y2 = sosfilt(sos, yr, zi=zi_c * yr[..., :1])
    y3 = masked_reverse(y2, ext_len)
    return y3[..., padlen : padlen + t]


def masked_filtfilt(
    b: np.ndarray, a: np.ndarray, zi: np.ndarray, padlen: int, x: jnp.ndarray, length
) -> jnp.ndarray:
    """filtfilt (transversal, e.g. FIR) of x[..., :length] in a static buffer."""
    t = x.shape[-1]
    ext = masked_odd_ext(x, length, padlen)
    zi_j = jnp.asarray(zi, dtype=x.dtype)
    zi_full = jnp.broadcast_to(zi_j, ext.shape[:-1] + zi_j.shape)
    y, _ = _lfilter_scan(b, a, ext, zi_full * ext[..., :1])
    ext_len = length + 2 * padlen
    yr = masked_reverse(y, ext_len)
    y2, _ = _lfilter_scan(b, a, yr, zi_full * yr[..., :1])
    y3 = masked_reverse(y2, ext_len)
    return y3[..., padlen : padlen + t]


def masked_sosfiltfilt_fir(design, x: jnp.ndarray, length) -> jnp.ndarray:
    """FIR-operator sosfiltfilt of x[..., :length] in a static buffer.

    Same operator as filters.sosfiltfilt_fir (probed kernel + edge blocks)
    with the right edge anchored at the dynamic ``length``:

      y[i] = left_edge          for i <  E
      y[i] = conv interior      for E <= i < length - E   (reads x[< length])
      y[i] = right_edge rows    for length - E <= i < length

    Caller contract: ``length >= design.min_len`` for every valid item (the
    bucketed batch layers guarantee this; shorter items must use the scan
    variant).
    """
    from modulation_mfcc_tpu.ops.filters import _conv_valid_lastaxis

    t = x.shape[-1]
    k, e, w = design.K, design.E, design.W
    i = jnp.arange(t)
    interior_full = _conv_valid_lastaxis(x, design.kernel)  # y[K .. t-K)
    pad_cfg = [(0, 0)] * (x.ndim - 1) + [(k, k)]
    interior = jnp.pad(interior_full, pad_cfg)  # aligned: interior[i] ~ y[i]
    hi = jax.lax.Precision.HIGHEST
    left = jnp.matmul(x[..., :w], jnp.asarray(design.left.T, dtype=x.dtype), precision=hi)
    win_idx = length - w + jnp.arange(w)
    lastwin = _take(x, jnp.clip(win_idx, 0, t - 1))
    right = jnp.matmul(lastwin, jnp.asarray(design.right.T, dtype=x.dtype), precision=hi)
    # y[i] for i in [length-E, length) = right[i - (length-E)]
    ridx = jnp.clip(i - (length - e), 0, e - 1)
    right_full = _take(right, ridx)
    lidx = jnp.clip(i, 0, e - 1)
    left_full = _take(left, lidx)
    out = jnp.where(
        i < e,
        left_full,
        jnp.where(i < length - e, interior, right_full),
    )
    return jnp.where(i < length, out, 0.0)


def masked_gradient(x: jnp.ndarray, length, spacing: float = 1.0) -> jnp.ndarray:
    """np.gradient (edge_order=1) of x[..., :length] in a static buffer."""
    t = x.shape[-1]
    i = jnp.arange(t)
    xp = _take(x, jnp.clip(i - 1, 0, t - 1))
    xn = _take(x, jnp.clip(i + 1, 0, t - 1))
    central = (xn - xp) / (2.0 * spacing)
    left = (x[..., 1:2] - x[..., :1]) / spacing
    xl1 = _take(x, jnp.clip(length - 1, 0, t - 1)[None])
    xl2 = _take(x, jnp.clip(length - 2, 0, t - 1)[None])
    right = (xl1 - xl2) / spacing
    out = jnp.where(i == 0, left, jnp.where(i == length - 1, right, central))
    return jnp.where(i < length, out, 0.0)


def masked_savgol(
    x: jnp.ndarray,
    window_length: int,
    polyorder: int,
    length,
    *,
    deriv: int = 0,
    delta: float = 1.0,
) -> jnp.ndarray:
    """savgol_filter(mode='interp') of x[..., :length] in a static buffer."""
    t = x.shape[-1]
    coeffs, edge_op = _savgol_design(window_length, polyorder, deriv, float(delta))
    half = window_length // 2
    i = jnp.arange(t)
    # interior: scipy applies convolve1d(x, coeffs) which flips the kernel —
    # as correlation: out[i] = Σ_j c[w-1-j] · x[i-half+j]
    acc = jnp.zeros_like(x)
    for j, c in enumerate(np.asarray(coeffs)[::-1]):
        acc = acc + float(c) * _take(x, jnp.clip(i - half + j, 0, t - 1))
    # left edge rows: E_left @ x[:w]
    e = np.asarray(edge_op)
    hi = jax.lax.Precision.HIGHEST  # scipy-parity edge blocks, bf16-proof
    left = jnp.matmul(
        x[..., :window_length], jnp.asarray(e[:half].T, dtype=x.dtype),
        precision=hi,
    )
    # right edge rows: E_right @ x[L-w : L]
    win_idx = length - window_length + jnp.arange(window_length)
    lastwin = _take(x, jnp.clip(win_idx, 0, t - 1))
    right = jnp.matmul(
        lastwin, jnp.asarray(e[window_length - half :].T, dtype=x.dtype),
        precision=hi,
    )
    out = acc
    for r in range(half):
        out = jnp.where(i == r, left[..., r : r + 1], out)
        out = jnp.where(i == length - half + r, right[..., r : r + 1], out)
    return jnp.where(i < length, out, 0.0)
