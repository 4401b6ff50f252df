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
  * each selected candidate's lag is refined by maximizing the windowed-sinc
    interpolation of r(τ) (Praat's NUMimproveMaximum + sinc scheme) with a
    fixed-iteration golden-section search — branch-free, vectorized over
    all candidates of all frames at once (Praat uses Brent per candidate);
  * ``very_accurate`` follows Praat's To Pitch veryAccurate flag
    (script/calc.py:545): for 'ac' the window doubles to 6 periods with the
    Gaussian taper (exp(-48·u²) edge-normalized) and the sinc interpolation
    support deepens (Praat: sinc70 → sinc700; here 35 → 70 taps per side,
    past which the smooth autocorrelation's interpolant is converged).

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


def _sinc_interp(r_ext: jnp.ndarray, pos: jnp.ndarray, depth: int) -> jnp.ndarray:
    """Windowed-sinc interpolation of ``r_ext`` [NF, L] at fractional
    positions ``pos`` [NF, K] — sinc × raised-cosine taper over ±depth
    samples (Praat's NUM_interpolate_sinc scheme)."""
    k = jnp.arange(-depth, depth + 1)
    ib = jnp.floor(pos).astype(jnp.int32)
    idx = ib[..., None] + k  # [NF, K, 2d+1]
    idxc = jnp.clip(idx, 0, r_ext.shape[-1] - 1)
    vals = jnp.take_along_axis(r_ext[:, None, :], idxc, axis=-1)
    dist = pos[..., None] - idx
    w = jnp.sinc(dist) * (0.5 + 0.5 * jnp.cos(jnp.pi * dist / (depth + 1)))
    return jnp.sum(vals * w, axis=-1)


def _refine_sinc(r_ext: jnp.ndarray, pos0: jnp.ndarray, depth: int, n_iter: int = 22):
    """(refined position, interpolated maximum) around integer positions
    ``pos0``: golden-section maximization of the sinc interpolant over
    (pos0-1, pos0+1) — the integer sample is a discrete local max, so the
    continuous peak is bracketed. Fixed iteration count keeps it jit-able;
    22 halvings ≈ 2·0.618²² < 1e-4 sample accuracy."""
    gr = 0.6180339887498949
    a = pos0 - 1.0
    b = pos0 + 1.0

    def body(_, st):
        a, b = st
        c = b - gr * (b - a)
        d = a + gr * (b - a)
        fc = _sinc_interp(r_ext, c, depth)
        fd = _sinc_interp(r_ext, d, depth)
        keep_low = fc > fd
        return jnp.where(keep_low, a, c), jnp.where(keep_low, d, b)

    a, b = jax.lax.fori_loop(0, n_iter, body, (a, b))
    pos = 0.5 * (a + b)
    return pos, _sinc_interp(r_ext, pos, depth)


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
        "very_accurate",
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
    very_accurate: bool = False,
    valid_len=None,
) -> jnp.ndarray:
    """F0 track [NF] in Hz (0 where unvoiced) for a 1-D signal.

    ``method='ac'`` uses a 3-period window with window-autocorrelation
    normalization (Praat's To Pitch (ac) estimator); ``method='cc'`` uses a
    1-period window and plain normalized cross-correlation.
    ``very_accurate`` doubles the 'ac' window (Gaussian taper) and deepens
    the sinc lag refinement, following Praat's veryAccurate flag.
    """
    if method == "cc":
        periods_per_window = 1.0
    elif very_accurate:
        periods_per_window *= 2.0  # Praat AC_GAUSS: 3 → 6 periods
    depth = 70 if very_accurate else 35  # sinc support per side
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
    # for 'ac', real (alias-free) r values are needed out to lag_max+depth+2
    # as the sinc interpolation's right-side support
    lag_hi = lag_max + depth + 2 if method == "ac" else lag_max
    nfft = next_pow2(int(span + lag_hi))

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
    # Praat's local mean looks one longest period to both sides of the frame
    # midpoint (2·nsamp_period samples), for both estimators
    nsamp_period = max(1, int(np.floor(sr / min_pitch)))
    mid = span // 2
    mlo, mhi = max(0, mid - nsamp_period), min(span, mid + nsamp_period)
    local_mean = jnp.mean(frames[..., mlo:mhi], axis=-1, keepdims=True)
    fr = frames - local_mean
    local_peak = jnp.max(jnp.abs(fr[..., :nw]), axis=-1) + 1e-30

    if method == "ac":
        # windowed autocorrelation normalized by the window's own
        # autocorrelation (Boersma's 'ac' estimator)
        if very_accurate:
            # Praat AC_GAUSS taper: exp(-48 u²), edge-subtracted/normalized
            i = np.arange(1, nw + 1, dtype=np.float64)
            imid = 0.5 * (nw + 1)
            edge = np.exp(-12.0)
            w_np = (np.exp(-48.0 * ((i - imid) / (nw + 1)) ** 2) - edge) / (1.0 - edge)
            w = jnp.asarray(w_np, dtype=x.dtype)
        else:
            w = jnp.asarray(hann(nw, periodic=False), dtype=x.dtype)
        fw = fr * w
        spec = jnp.fft.rfft(fw, n=nfft, axis=-1)
        ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=-1)[..., : lag_hi + 1]
        r_full = ac / (ac[..., :1] + 1e-30)
        wspec = jnp.fft.rfft(w, n=nfft)
        wac = jnp.fft.irfft(wspec * jnp.conj(wspec), n=nfft)[: lag_hi + 1]
        rw = wac / (wac[0] + 1e-30)
        r_full = r_full / jnp.maximum(rw, 1e-6)
        r = r_full[..., : lag_max + 1]
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
        # sinc support past lag_max: edge-replicated (the cc energies are
        # only defined inside the frame span; candidates live well inside)
        r_full = jnp.pad(r, ((0, 0), (0, depth + 2)), mode="edge")

    lags = jnp.arange(lag_max + 1)
    in_range = (lags >= lag_min) & (lags <= lag_max)
    # local maxima of r over lag
    rm = jnp.pad(r, ((0, 0), (1, 1)), constant_values=-jnp.inf)
    is_max = (r > rm[..., :-2]) & (r >= rm[..., 2:]) & in_range[None, :]

    # parabolic refinement for the candidate SELECTION score (cheap over all
    # lags); the selected candidates get the full sinc refinement below
    rp = jnp.roll(r, 1, axis=-1)
    rn = jnp.roll(r, -1, axis=-1)
    denom = rp - 2 * r + rn
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (rp - rn) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    lag_par = lags[None, :] + delta
    val_par = r - 0.25 * (rp - rn) * delta

    tau_par = lag_par / sr
    sel_score = val_par - octave_cost * jnp.log2(jnp.maximum(min_pitch * tau_par, 1e-12))
    cand_score = jnp.where(is_max, sel_score, -jnp.inf)

    k = max_cand - 1  # one slot reserved for unvoiced
    top_s, top_i = jax.lax.top_k(cand_score, k)  # [NF, k]

    # sinc refinement of the selected lags (Praat NUMimproveMaximum):
    # mirror r at lag 0 for the left support (exact for the symmetric 'ac'
    # autocorrelation; the cc candidates sit ≥ lag_min inside)
    ext_left = depth + 2
    r_ext = jnp.concatenate(
        [jnp.flip(r_full[..., 1 : ext_left + 1], axis=-1), r_full], axis=-1
    )
    pos, val_sinc = _refine_sinc(r_ext, (top_i + ext_left).astype(jnp.float32), depth)
    top_lag = pos - ext_left
    tau_top = top_lag / sr
    top_s = val_sinc - octave_cost * jnp.log2(jnp.maximum(min_pitch * tau_top, 1e-12))
    # candidates whose selection slot was empty (score -inf) stay invalid
    was_cand = jnp.take_along_axis(is_max, top_i, axis=-1)
    freqs = jnp.where(was_cand, sr / jnp.maximum(top_lag, 1e-6), 0.0)
    # clamp out-of-range candidates to unvoiced
    valid = was_cand & (freqs > min_pitch * 0.99) & (freqs < max_pitch * 1.01)
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
