"""LPC formant analysis: Burg recursion + polynomial roots, batched on device.

TPU-native replacement for the reference's Praat calls
(script/calc.py:142-148 ``sound.to_formant_burg``). Praat's algorithm:
resample to 2× the formant ceiling, pre-emphasize, Gaussian-window frames,
Burg LPC of order 2·max_formants, polynomial roots → formant frequencies and
bandwidths.

Design notes:
  * Burg is a short sequential recursion in model order (10 steps) but fully
    vectorized across frames — each step is a handful of [NF, nw] reductions.
  * Root finding: nonsymmetric eigendecomposition is CPU-only in XLA, so the
    companion-matrix route is replaced by Durand–Kerner simultaneous
    iteration in complex64 — embarrassingly parallel over frames, fixed
    iteration count, and exactly the static-shape compiler-friendly kind of
    solver the MXU/VPU wants.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from modulation_mfcc_tpu.ops.framing import frame_by_slices

__all__ = ["burg_lpc", "poly_roots_dk", "formant_frames", "lpc_formants"]


def burg_lpc(frames: jnp.ndarray, order: int) -> jnp.ndarray:
    """Burg-method LPC coefficients for each frame.

    frames: [..., N]; returns a [..., order] array of coefficients a_1..a_p
    with the convention  x[n] ≈ -Σ a_k x[n-k]  (polynomial 1 + Σ a_k z^-k).
    """
    f = frames
    b = frames
    a = jnp.zeros(frames.shape[:-1] + (order,), dtype=frames.dtype)
    for m in range(order):
        fk = f[..., 1:]
        bk = b[..., :-1]
        num = -2.0 * jnp.sum(fk * bk, axis=-1)
        den = jnp.sum(fk * fk, axis=-1) + jnp.sum(bk * bk, axis=-1)
        k = num / jnp.maximum(den, 1e-30)
        f, b = fk + k[..., None] * bk, bk + k[..., None] * fk
        # Levinson update of the coefficient vector
        a_rev = jnp.flip(a[..., :m], axis=-1)
        new_a = a.at[..., :m].add(k[..., None] * a_rev) if m > 0 else a
        a = new_a.at[..., m].set(k)
    return a


def poly_roots_dk(coeffs: jnp.ndarray, iters: int = 40) -> jnp.ndarray:
    """Roots of monic polynomials z^p + c_1 z^(p-1) + ... + c_p, batched.

    coeffs: [..., p] (highest-degree-first after the implicit leading 1).
    Durand–Kerner with standard (0.4+0.9i)^k initialization; complex64.

    iters=40: measured convergence on Burg coefficient sets (speechlike,
    noise, and tonal signals; orders 8/10/16) — downstream formant
    frequencies match an iters=120 run to ≤0.001 Hz at 40 iterations,
    while 30 leaves Hz-level tails on tonal frames (2026-08-18 sweep).
    """
    p = coeffs.shape[-1]
    c = coeffs.astype(jnp.complex64)
    seed = (0.4 + 0.9j) ** jnp.arange(1, p + 1)
    z = jnp.broadcast_to(seed, coeffs.shape[:-1] + (p,)).astype(jnp.complex64)

    def poly_eval(z_):
        out = jnp.ones_like(z_)
        for i in range(p):
            out = out * z_ + c[..., i : i + 1]
        return out

    def step(z_, _):
        pz = poly_eval(z_)
        diff = z_[..., :, None] - z_[..., None, :]
        diff = diff + jnp.eye(p, dtype=z_.dtype)  # avoid self-division
        denom = jnp.prod(diff, axis=-1)
        z_next = z_ - pz / jnp.where(jnp.abs(denom) < 1e-20, 1e-20, denom)
        return z_next, None

    # unroll: each step is ~p² complex FMAs per frame — far below the
    # per-step scan launch overhead at tracker scale
    z, _ = jax.lax.scan(step, z, None, length=iters, unroll=8)
    return z


def formant_frames(n: int, sr: float, window_length: float, time_step: float):
    """Frame geometry: Praat uses a physical window of 2×window_length with a
    Gaussian taper. Returns (starts [NF], nw, frame center times)."""
    nw = int(round(2.0 * window_length * sr))
    nw = min(max(nw, 4), n)
    hop = max(1, int(round(time_step * sr)))
    nf = max(1, 1 + (n - nw) // hop)
    start0 = max(0, (n - nw - (nf - 1) * hop) // 2)  # Praat-centered grid
    starts = start0 + np.arange(nf) * hop
    times = (starts + nw / 2.0) / sr
    return starts, nw, times


@partial(
    jax.jit,
    static_argnames=(
        "sr", "order", "window_length", "time_step", "pre_emphasis_from", "max_formant",
        "burg_engine",
    ),
)
def lpc_formants(
    x: jnp.ndarray,
    *,
    sr: float,
    order: int = 10,
    window_length: float = 0.025,
    time_step: float = 0.005,
    pre_emphasis_from: float = 50.0,
    max_formant: float = 5500.0,
    burg_engine: str = "auto",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(freqs [NF, order//2], bandwidths [NF, order//2]) sorted ascending.

    ``x`` must already be resampled to 2·max_formant (Praat's first step —
    host- or device-side polyphase; see models/formants.py). Frequencies
    outside (50 Hz, max_formant-50) are reported as NaN like Praat's
    out-of-range formants.

    ``burg_engine``: 'auto' (Pallas VMEM kernel on TPU — 5.4× measured on
    v5e — XLA elsewhere), 'pallas', or 'xla' (the reference-parity
    implementation; the two agree to float reduction-order noise, ~6e-8).
    """
    n = x.shape[-1]
    # pre-emphasis: x[i] -= exp(-2π·F·dt)·x[i-1] (Praat's PreEmphasis)
    alpha = float(np.exp(-2.0 * np.pi * pre_emphasis_from / sr))
    xp = jnp.concatenate([x[..., :1], x[..., 1:] - alpha * x[..., :-1]], axis=-1)
    starts, nw, _ = formant_frames(n, sr, window_length, time_step)
    # hop derived from the grid formant_frames returned, not recomputed —
    # keeps the frame matrix and the reported frame times on one formula
    hop = int(starts[1] - starts[0]) if len(starts) > 1 else 1
    frames = frame_by_slices(xp, int(starts[0]), len(starts), nw, hop)
    frames = frames - jnp.mean(frames, axis=-1, keepdims=True)
    # Praat's formant Gaussian window (Sound_to_Formant.cpp) — one shared
    # host-side design with the pitch tracker's AC_GAUSS taper
    from modulation_mfcc_tpu.ops.windows import praat_gauss

    w = jnp.asarray(praat_gauss(nw), dtype=x.dtype)
    frames = frames * w
    if burg_engine not in ("auto", "pallas", "xla"):
        # trace-time guard: a typo'd engine must error, not silently run
        # the default path and corrupt an A/B measurement
        raise ValueError(
            f"burg_engine {burg_engine!r} not in ('auto', 'pallas', 'xla')"
        )
    use_pallas = burg_engine == "pallas" or (
        burg_engine == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from modulation_mfcc_tpu.pallas.burg import burg_lpc_pallas

        a = burg_lpc_pallas(frames, order)  # [NF, p]
    else:
        a = burg_lpc(frames, order)  # [NF, p]
    roots = poly_roots_dk(a)  # roots of z^p + a1 z^(p-1) + ... ? see below
    # burg_lpc returns a_k for A(z) = 1 + Σ a_k z^-k; its zeros solve
    # z^p + a_1 z^(p-1) + ... + a_p = 0 — exactly the DK monic input.
    ang = jnp.angle(roots)
    mag = jnp.abs(roots)
    freq = jnp.abs(ang) * (sr / (2.0 * np.pi))
    bw = -jnp.log(jnp.maximum(mag, 1e-12)) * (sr / np.pi)
    # keep positive-frequency formant roots in the valid band
    valid = (freq > 50.0) & (freq < max_formant - 50.0) & (ang > 0)
    freq = jnp.where(valid, freq, jnp.inf)
    # co-sort (freq, bw) with a multi-operand sort network — argsort +
    # take_along_axis costs two [NF, p]-element gathers, which measure
    # ~9 ms each on v5e at tracker scale (same finding as ops/pitch.py's
    # candidate readoff); lax.sort permutes the carried bw in-network.
    freq_sorted, bw_sorted = jax.lax.sort((freq, bw), dimension=-1, num_keys=1)
    freq_sorted = freq_sorted[..., : order // 2]
    bw_sorted = bw_sorted[..., : order // 2]
    freq_out = jnp.where(jnp.isfinite(freq_sorted), freq_sorted, jnp.nan)
    # silent frames: Burg returns all-zero coefficients (z^p has only the
    # origin as root → no formants), but Durand–Kerner's fixed iteration
    # count leaves spurious partial-converged roots there — mask them out
    # explicitly (Praat reports no formants for silence)
    dead = jnp.sum(frames * frames, axis=-1, keepdims=True) <= 0.0
    freq_out = jnp.where(dead, jnp.nan, freq_out)
    bw_sorted = jnp.where(dead, jnp.nan, bw_sorted)
    return freq_out, bw_sorted
