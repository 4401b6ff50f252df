"""Analytic signal / Hilbert envelope (device-side FFT).

Replaces the reference's ``np.abs(hilbert(x))`` amplitude path
(script/mfcc.py:200-206). Same construction as scipy.signal.hilbert: zero
negative frequencies, double positive ones, keep DC (and Nyquist for even N).
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def analytic_signal(x: jnp.ndarray) -> jnp.ndarray:
    """Analytic signal along the last axis (complex)."""
    n = x.shape[-1]
    h = np.zeros(n)
    if n % 2 == 0:
        h[0] = h[n // 2] = 1.0
        h[1 : n // 2] = 2.0
    else:
        h[0] = 1.0
        h[1 : (n + 1) // 2] = 2.0
    xf = jnp.fft.fft(x, axis=-1)
    return jnp.fft.ifft(xf * jnp.asarray(h, dtype=xf.dtype), axis=-1)


def hilbert_envelope(x: jnp.ndarray) -> jnp.ndarray:
    """|analytic signal| — the 'Hilb' amplitude method (script/mfcc.py:202)."""
    return jnp.abs(analytic_signal(x))
