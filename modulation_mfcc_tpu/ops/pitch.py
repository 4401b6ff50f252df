"""Autocorrelation pitch tracking (Boersma 1993) with on-device Viterbi.

TPU-native replacement for the reference's Praat calls
(script/calc.py:535-560: ``To Pitch (ac)`` / ``To Pitch (cc)`` with the full
cost-parameter surface). parselmouth links Praat's C++; here the same
published algorithm is expressed as batched static-shape JAX:

  frames → mean-subtract → window → rFFT autocorrelation, normalized by the
  window's own autocorrelation (the 'ac' estimator) or frame-to-frame cross
  correlation ('cc') → top-K local maxima with parabolic refinement →
  candidate strengths with octave cost + silence/voicing thresholds →
  Viterbi path over (maxCandNum) candidates per frame via `lax.scan`.

Design notes (vs Praat's implementation):
  * every frame is processed in parallel (one big [NF, nfft] rFFT batch —
    MXU/VPU friendly) instead of Praat's per-frame loop;
  * candidate extraction is `top_k` over masked local-maxima strengths —
    fixed candidate count, no dynamic shapes;
  * the path finder is a dense [K]→[K] Viterbi relaxation scanned over
    frames — K=15 keeps the transition matrix tiny;
  * lag refinement is parabolic interpolation (Praat further applies sinc
    interpolation; the difference is well below the 1 Hz level that matters
    for modulation analysis — exact-Praat output is a tolerance parity
    target per SURVEY.md §7, not bitwise).

Cost conventions follow Praat: transition costs are defined per 0.01 s and
scaled by ``0.01 / timeStep``; strengths use
``R' = r - octaveCost·log2(minPitch·τ)`` and the unvoiced strength
``voicingThreshold + max(0, 2 - (localPeak/globalPeak)/(silenceThresh/(1+voicingThresh)))``.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from modulation_mfcc_tpu.ops.windows import hann
from modulation_mfcc_tpu.utils.helpers import next_pow2

__all__ = ["pitch_ac", "PitchParams"]


def _frame_centered(x: jnp.ndarray, starts: np.ndarray, nw: int) -> jnp.ndarray:
    idx = starts[:, None] + np.arange(nw)[None, :]
    return x[..., jnp.asarray(idx)]


@partial(
    jax.jit,
    static_argnames=(
        "sr",
        "hop",
        "min_pitch",
        "max_pitch",
        "max_cand",
        "method",
        "silence_thresh",
        "voicing_thresh",
        "octave_cost",
        "octave_jump_cost",
        "voiced_unvoiced_cost",
        "periods_per_window",
    ),
)
def pitch_ac(
    x: jnp.ndarray,
    *,
    sr: float,
    hop: float = 0.01,
    min_pitch: float = 75.0,
    max_pitch: float = 600.0,
    max_cand: int = 15,
    method: str = "ac",
    silence_thresh: float = 0.03,
    voicing_thresh: float = 0.45,
    octave_cost: float = 0.01,
    octave_jump_cost: float = 0.35,
    voiced_unvoiced_cost: float = 0.14,
    periods_per_window: float = 3.0,
    valid_len=None,
) -> jnp.ndarray:
    """F0 track [NF] in Hz (0 where unvoiced) for a 1-D signal.

    ``method='ac'`` uses a 3-period window with window-autocorrelation
    normalization (Praat's To Pitch (ac) estimator); ``method='cc'`` uses a
    1-period window and plain normalized cross-correlation.
    """
    if method == "cc":
        periods_per_window = 1.0
    n = x.shape[-1]
    dt = hop
    nw = int(round(periods_per_window / min_pitch * sr))
    nw = min(nw, n)
    hop_s = int(round(dt * sr))
    # lag search range
    lag_min = max(2, int(np.floor(sr / max_pitch)))
    lag_max = min(n - 1, int(np.ceil(sr / min_pitch)))
    if method == "ac":
        lag_max = min(lag_max, nw - 1)
    if lag_max <= lag_min:
        raise ValueError("max_pitch/min_pitch incompatible with window length")
    span = nw + (lag_max if method == "cc" else 0)
    nf = max(1, 1 + (n - span) // hop_s)
    # Praat centers the frame grid on the signal midpoint (its t1 places the
    # leftover samples symmetrically); the published time axis still follows
    # the reference's arange(nf)*hopSize convention (script/calc.py:560).
    start0 = max(0, (n - span - (nf - 1) * hop_s) // 2)
    starts = (start0 + np.arange(nf) * hop_s).astype(np.int32)
    nfft = next_pow2(int(span + lag_max))

    # valid_len (traced, optional): true sample count when x is a padded
    # buffer — keeps the global mean/peak per-utterance in batched use
    if valid_len is None:
        xg = x - jnp.mean(x)
        global_peak = jnp.max(jnp.abs(xg)) + 1e-30
    else:
        in_sig = jnp.arange(n) < valid_len
        mean = jnp.sum(jnp.where(in_sig, x, 0.0)) / jnp.maximum(valid_len, 1)
        xg = jnp.where(in_sig, x - mean, 0.0)
        global_peak = jnp.max(jnp.abs(xg)) + 1e-30

    frames = _frame_centered(xg, starts, span)  # [NF, span]
    local_mean = jnp.mean(frames[..., :nw], axis=-1, keepdims=True)
    fr = frames - local_mean
    local_peak = jnp.max(jnp.abs(fr[..., :nw]), axis=-1) + 1e-30

    if method == "ac":
        # windowed autocorrelation normalized by the window's own
        # autocorrelation (Boersma's 'ac' estimator)
        w = jnp.asarray(hann(nw, periodic=False), dtype=x.dtype)
        fw = fr * w
        spec = jnp.fft.rfft(fw, n=nfft, axis=-1)
        ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[..., : lag_max + 1]
        r = ac / (ac[..., :1] + 1e-30)
        wspec = jnp.fft.rfft(w, n=nfft)
        wac = jnp.fft.irfft(wspec * jnp.conj(wspec), n=nfft)[: lag_max + 1]
        rw = wac / (wac[0] + 1e-30)
        r = r / jnp.maximum(rw, 1e-6)
    else:
        # forward normalized cross-correlation ('cc'): the 1-period window
        # against its lag-shifted copy, energy-normalized per lag
        base = fr[..., :nw]
        spec_full = jnp.fft.rfft(fr, n=nfft, axis=-1)
        spec_base = jnp.fft.rfft(base, n=nfft, axis=-1)
        cross = jnp.fft.irfft(jnp.conj(spec_base) * spec_full, n=nfft, axis=-1)[
            ..., : lag_max + 1
        ]
        csum = jnp.cumsum(fr * fr, axis=-1)
        total = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
        idx = jnp.arange(lag_max + 1)
        e_tau = jnp.take(total, idx + nw, axis=-1) - jnp.take(total, idx, axis=-1)
        e0 = e_tau[..., :1]
        r = cross / jnp.sqrt(jnp.maximum(e0 * e_tau, 1e-30))

    lags = jnp.arange(lag_max + 1)
    in_range = (lags >= lag_min) & (lags <= lag_max)
    # local maxima of r over lag
    rm = jnp.pad(r, ((0, 0), (1, 1)), constant_values=-jnp.inf)
    is_max = (r > rm[..., :-2]) & (r >= rm[..., 2:]) & in_range[None, :]

    # parabolic refinement of lag and value
    rp = jnp.roll(r, 1, axis=-1)
    rn = jnp.roll(r, -1, axis=-1)
    denom = rp - 2 * r + rn
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (rp - rn) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag_ref = lags[None, :] + delta
    val_ref = r - 0.25 * (rp - rn) * delta

    tau = lag_ref / sr
    strength_v = val_ref - octave_cost * jnp.log2(jnp.maximum(min_pitch * tau, 1e-12))
    cand_score = jnp.where(is_max, strength_v, -jnp.inf)

    k = max_cand - 1  # one slot reserved for unvoiced
    top_s, top_i = jax.lax.top_k(cand_score, k)  # [NF, k]
    top_lag = jnp.take_along_axis(lag_ref, top_i, axis=-1)
    freqs = jnp.where(jnp.isfinite(top_s), sr / jnp.maximum(top_lag, 1e-6), 0.0)
    # clamp out-of-range candidates to unvoiced
    valid = jnp.isfinite(top_s) & (freqs > min_pitch * 0.99) & (freqs < max_pitch * 1.01)
    strengths = jnp.where(valid, top_s, -1e30)

    # unvoiced candidate strength (Boersma eq. for R_unvoiced)
    ratio = (local_peak / global_peak) / (silence_thresh / (1.0 + voicing_thresh))
    s_unvoiced = voicing_thresh + jnp.maximum(0.0, 2.0 - ratio)

    all_strength = jnp.concatenate([strengths, s_unvoiced[:, None]], axis=-1)  # [NF, K]
    all_freq = jnp.concatenate([freqs, jnp.zeros_like(s_unvoiced[:, None])], axis=-1)
    all_valid = jnp.concatenate([valid, jnp.ones_like(s_unvoiced[:, None], dtype=bool)], -1)

    # ---- Viterbi path finder (Praat cost conventions) --------------------
    corr = 0.01 / dt
    jump_c = octave_jump_cost * corr
    vuv_c = voiced_unvoiced_cost * corr

    def trans_cost(fp, fc):
        both_v = (fp > 0) & (fc > 0)
        one_uv = (fp > 0) != (fc > 0)
        jump = jnp.abs(
            jnp.log2(jnp.maximum(fp, 1e-6) / jnp.maximum(fc, 1e-6))
        )
        return jnp.where(both_v, jump_c * jump, jnp.where(one_uv, vuv_c, 0.0))

    def step(delta_prev, inp):
        s_t, f_t, fprev = inp["s"], inp["f"], inp["fp"]
        cost = trans_cost(fprev[:, None], f_t[None, :])  # [K, K]
        scores = delta_prev[:, None] - cost  # [K, K]
        best_prev = jnp.argmax(scores, axis=0)
        delta_t = s_t + jnp.max(scores, axis=0)
        return delta_t, best_prev

    k_tot = all_strength.shape[-1]
    delta0 = all_strength[0]
    fprev_seq = all_freq[:-1]
    inps = {"s": all_strength[1:], "f": all_freq[1:], "fp": fprev_seq}
    delta_f, backptrs = jax.lax.scan(step, delta0, inps)

    # backtrace
    last = jnp.argmax(delta_f if nf > 1 else delta0)

    def back_step(nxt, bp):
        cur = bp[nxt]
        return cur, cur

    _, path_rev = jax.lax.scan(back_step, last, backptrs, reverse=True)
    path = jnp.concatenate([path_rev, jnp.asarray([last])]) if nf > 1 else jnp.asarray([last])
    f0 = jnp.take_along_axis(all_freq, path[:, None], axis=-1)[:, 0]
    return f0
