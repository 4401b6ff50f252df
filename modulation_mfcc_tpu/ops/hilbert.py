"""Analytic signal / Hilbert envelope (device-side FFT).

Replaces the reference's ``np.abs(hilbert(x))`` amplitude path
(script/mfcc.py:200-206). Same construction as scipy.signal.hilbert: zero
negative frequencies, double positive ones, keep DC (and Nyquist for even N).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _hilbert_transform(x: jnp.ndarray) -> jnp.ndarray:
    """Imaginary part of the analytic signal, via real FFTs.

    For real input, scipy's ``ifft(fft(x) * h)`` has real part exactly ``x``
    and imaginary part ``irfft(rfft(x) * (-i))`` with the DC (and Nyquist,
    for even N) bins zeroed — so the whole construction needs one
    rfft+irfft pair instead of two full complex transforms (2× less FFT
    work and half the HBM footprint on device).

    The ``* (-i)`` rotation is expressed with REAL-only constants —
    ``(re, im) -> (im, -re)`` times a real bin mask — never as a complex
    constant array: on the remote-TPU (axon) runtime, transferring a
    complex64 array host->device kills the whole session (and reading one
    back hangs), so complex values must only ever exist device-side inside
    a computation. Measured 2026-08-17; see CLAUDE.md.
    """
    n = x.shape[-1]
    nbins = n // 2 + 1
    mask = np.ones(nbins, dtype=np.float64)
    mask[0] = 0.0
    if n % 2 == 0:
        mask[-1] = 0.0
    xf = jnp.fft.rfft(x, axis=-1)
    m = jnp.asarray(mask, dtype=x.dtype)
    rot = jax.lax.complex(jnp.imag(xf) * m, -(jnp.real(xf) * m))
    return jnp.fft.irfft(rot, n=n, axis=-1)


def analytic_signal(x: jnp.ndarray) -> jnp.ndarray:
    """Analytic signal along the last axis (complex, real input).

    The result is a device-side complex array. On the axon remote-TPU
    runtime do NOT transfer it to host (``np.asarray`` hangs the session);
    reduce it to real quantities on device first (e.g.
    :func:`hilbert_envelope`, or ``jnp.real``/``jnp.imag``).
    """
    return jax.lax.complex(x, _hilbert_transform(x))


def hilbert_envelope(x: jnp.ndarray) -> jnp.ndarray:
    """|analytic signal| — the 'Hilb' amplitude method (script/mfcc.py:202)."""
    ht = _hilbert_transform(x)
    return jnp.sqrt(x * x + ht * ht)
