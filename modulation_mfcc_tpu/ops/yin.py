"""pYIN fundamental-frequency estimation (probabilistic YIN), batched JAX.

Replaces the reference's ``librosa.pyin`` path (script/calc.py:562-581) with
the same published algorithm (Mauch & Dixon 2014, librosa's formulation):

  1. YIN difference function per frame via cumulative sums + rFFT
     autocorrelation; cumulative-mean-normalized difference (CMNDF).
  2. Trough candidates = local minima of the CMNDF, refined by parabolic
     interpolation; per-threshold trough selection with a Beta(2,18) prior
     over thresholds and a Boltzmann prior over trough rank;
     ``no_trough_prob`` mass to the global minimum when no trough clears a
     threshold.
  3. Candidate probabilities scattered onto a log-spaced pitch-bin grid
     (``resolution`` semitones/bin) with voiced+unvoiced state duplication.
  4. Viterbi decoding with a triangular local transition (width from
     ``max_transition_rate``) and voiced↔unvoiced ``switch_prob``.

Everything is static-shape: troughs are handled as masks over the full lag
axis (no dynamic candidate lists), the Viterbi is a [S,S] max-plus matmul
scanned over frames.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import scipy.stats

import jax
import jax.numpy as jnp

from modulation_mfcc_tpu.ops.framing import hop_window_sums

__all__ = ["pyin_f0", "yin_cmndf"]


def yin_cmndf(frames: jnp.ndarray, max_lag: int) -> jnp.ndarray:
    """Cumulative-mean-normalized difference function d'(τ), τ∈[0, max_lag].

    frames: [..., N]. d(τ) = Σ_{j<W} (x_j − x_{j+τ})², W = N − max_lag.
    """
    n = frames.shape[-1]
    w = n - max_lag
    # energy terms via cumulative sums: e_tau[τ] = Σ_{j=τ}^{τ+W-1} x_j²
    csum = jnp.cumsum(frames**2, axis=-1)
    total = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum], axis=-1)
    tau = np.arange(max_lag + 1)
    e0 = (total[..., w] - total[..., 0])[..., None]
    # consecutive indices -> contiguous slices, not gathers
    e_tau = jax.lax.slice_in_dim(total, w, w + max_lag + 1, axis=-1) - jax.lax.slice_in_dim(
        total, 0, max_lag + 1, axis=-1
    )
    # cross terms Σ_j x_j·x_{j+τ} via rFFT cross-correlation of the first W
    # samples against the whole frame. No aliasing as long as
    # nfft ≥ W + max_lag: every product index j+τ < W + max_lag stays
    # inside one period, so the circular correlation equals the linear one
    # on the lags read below (the previous 2·n sizing was 2× oversized —
    # the FFTs are the dominant pyin cost on TPU).
    nfft = int(2 ** np.ceil(np.log2(max(n, w + max_lag))))
    spec = jnp.fft.rfft(frames, n=nfft, axis=-1)
    specw = jnp.fft.rfft(frames[..., :w], n=nfft, axis=-1)
    cross = jnp.fft.irfft(jnp.conj(specw) * spec, n=nfft, axis=-1)[..., : max_lag + 1]
    d = e0 + e_tau - 2.0 * cross
    # CMNDF
    dsum = jnp.cumsum(d[..., 1:], axis=-1)
    tau_f = jnp.asarray(tau[1:], dtype=d.dtype)
    cmndf = d[..., 1:] * tau_f / jnp.maximum(dsum, 1e-30)
    return jnp.concatenate([jnp.ones_like(d[..., :1]), cmndf], axis=-1)


def _sliding_cmndf(
    xp: jnp.ndarray, nf: int, hop: int, w: int, max_lag: int, lag_block: int = 1
) -> jnp.ndarray:
    """CMNDF d'(τ), τ∈[0, max_lag], for frames xp[f·hop : f·hop + w + max_lag]
    WITHOUT materializing a frame matrix or running FFT correlations.

    YIN's difference function is unwindowed, so every frame quantity is a
    plain window sum over a global product series:
        cross[f, τ] = Σ_{j<w} xp[s+j]·xp[s+j+τ],   s = f·hop
        e_tau[f, τ] = Σ_{j<w} xp[s+τ+j]²
    Each is a sum over ``w`` consecutive samples of a per-τ series — and
    frame starts are hop-aligned, so the sum decomposes into ``w//hop``
    whole hop-row sums plus one partial row (the rms_envelope trick,
    models/envelope.py). No long-range cumsum is involved (each frame value
    is a fresh ~w/hop-term sum of row sums), so there is none of the
    cancellation a global prefix-sum difference would suffer on long
    signals. τ is processed in static blocks of ``lag_block``; 1 measured
    fastest on v5e (larger blocks materialize a stacked [K, T] series in
    HBM, which costs more than the extra kernel launches save).

    Equal to ``yin_cmndf(frame_by_slices(xp, 0, nf, w+max_lag, hop), max_lag)``
    up to float reduction order. On v5e this replaces the two 2048-pt rFFTs
    + frame build (the dominant pyin cost) with ~1.2 GB of fused
    elementwise/row-reduce traffic.
    """
    q, rem = divmod(w, hop)
    n_rows = nf + q if rem else nf - 1 + q
    need_len = n_rows * hop + max_lag
    if xp.shape[-1] < need_len:
        cfgp = [(0, 0)] * (xp.ndim - 1) + [(0, need_len - xp.shape[-1])]
        xp = jnp.pad(xp, cfgp)
    base = jax.lax.slice_in_dim(xp, 0, n_rows * hop, axis=-1)

    def window_sums(series):  # [..., K, n_rows*hop] → [..., K, nf]
        return hop_window_sums(series, nf, w, hop)

    cross_blocks, e_blocks = [], []
    for t0 in range(0, max_lag + 1, lag_block):
        taus = range(t0, min(t0 + lag_block, max_lag + 1))
        shifted = jnp.stack(
            [jax.lax.slice_in_dim(xp, t, t + n_rows * hop, axis=-1) for t in taus],
            axis=-2,
        )  # [..., K, n_rows*hop]
        cross_blocks.append(window_sums(base[..., None, :] * shifted))
        e_blocks.append(window_sums(shifted * shifted))
    # [..., nf, max_lag+1]
    cross = jnp.moveaxis(jnp.concatenate(cross_blocks, axis=-2), -2, -1)
    e_tau = jnp.moveaxis(jnp.concatenate(e_blocks, axis=-2), -2, -1)
    e0 = e_tau[..., :1]
    d = e0 + e_tau - 2.0 * cross
    dsum = jnp.cumsum(d[..., 1:], axis=-1)
    tau_f = jnp.arange(1, max_lag + 1, dtype=d.dtype)
    cmndf = d[..., 1:] * tau_f / jnp.maximum(dsum, 1e-30)
    return jnp.concatenate([jnp.ones_like(d[..., :1]), cmndf], axis=-1)


@lru_cache(maxsize=32)
def _beta_threshold_probs(n_thresholds: int, a: float, b: float) -> np.ndarray:
    thresholds = np.linspace(0, 1, n_thresholds + 1)
    cdf = scipy.stats.beta.cdf(thresholds, a, b)
    return np.diff(cdf)


def _boltzmann_pmf(k, lam, n):
    """Truncated discrete exponential (Boltzmann) pmf, matching
    scipy.stats.boltzmann.pmf(k, lam, N)."""
    return (1 - jnp.exp(-lam)) * jnp.exp(-lam * k) / (1 - jnp.exp(-lam * n) + 1e-30)


@partial(
    jax.jit,
    static_argnames=(
        "sr",
        "fmin",
        "fmax",
        "frame_length",
        "win_length",
        "hop",
        "n_thresholds",
        "beta_parameters",
        "boltzmann_parameter",
        "resolution",
        "max_transition_rate",
        "switch_prob",
        "no_trough_prob",
        "center",
        "pad_mode",
    ),
)
def pyin_f0(
    x: jnp.ndarray,
    *,
    sr: float,
    fmin: float = 75.0,
    fmax: float = 600.0,
    frame_length: int = 2048,
    win_length: int | None = None,
    hop: float = 0.01,
    n_thresholds: int = 100,
    beta_parameters: tuple = (2, 18),
    boltzmann_parameter: int = 2,
    resolution: float = 0.1,
    max_transition_rate: float = 35.92,
    switch_prob: float = 0.01,
    no_trough_prob: float = 0.01,
    center: bool = True,
    pad_mode: str = "constant",
) -> jnp.ndarray:
    """F0 track [NF] in Hz; 0 where decoded unvoiced (caller maps to NaN).

    ``center``/``pad_mode`` follow librosa.pyin (reference passes
    pyincenter/pyinpad_mode through, script/calc.py:418-419): centered
    framing pads frame_length//2 on each side with the given numpy pad mode.
    """
    if win_length is None:
        win_length = frame_length // 2
    hop_length = max(1, int(round(hop * sr)))
    n = x.shape[-1]
    if center:
        pad = frame_length // 2
        xp = jnp.pad(x, (pad, pad), mode=pad_mode)
        nf = 1 + n // hop_length
    else:
        xp = x
        nf = max(1, 1 + (n - frame_length) // hop_length)
    min_lag = max(2, int(np.floor(sr / fmax)))
    max_lag_f0 = min(win_length - 1, int(np.ceil(sr / fmin)))
    # CMNDF is only read through lag max_lag_f0+1 (the band's right
    # neighbor), and d(τ≤L) touches samples x[j<W+L] only — so build the
    # frames W+L wide on the same grid and compute L+1 lags instead of
    # win_length+1. Exact (yin_cmndf derives W = n − max_lag, preserved by
    # construction); at the 10 kHz defaults this shrinks the difference
    # function ~7.5× and halves the correlation FFT (nfft 4096→2048).
    ml = max_lag_f0 + 1
    if win_length + ml > frame_length:
        # librosa.yin's own constraint: d(τ) reads x[j < win_length + τ],
        # so the frame must hold win_length + max_lag samples. (An earlier
        # fallback silently shrank W to frame_length − ml here, which is a
        # different difference function.)
        raise ValueError(
            f"frame_length={frame_length} too short for win_length="
            f"{win_length} with fmin={fmin} (needs >= {win_length + ml})"
        )
    # frameless path: window sums over global product series (see
    # _sliding_cmndf) — no frame matrix, no FFTs
    cm = _sliding_cmndf(xp, nf, hop_length, win_length, ml)
    # All troughs live in the static lag band [min_lag, max_lag_f0] — the
    # threshold sweep below builds an [n_thresholds, NF, L] tensor, and on
    # the full lag axis (L≈frame_length/2) that is ~GBs per utterance and
    # crashes the TPU compiler; on the band (L≈120 at default fmin/fmax)
    # the same computation is exact and two orders of magnitude smaller.
    # Neighbors for the trough test/parabola come from the band ±1 slice.
    band = jax.lax.slice_in_dim(cm, min_lag - 1, max_lag_f0 + 2, axis=-1)
    cmb = band[..., 1:-1]  # [NF, L] lags min_lag..max_lag_f0
    lag = np.arange(min_lag, max_lag_f0 + 1)
    left = band[..., :-2]
    right = band[..., 2:]
    is_trough = (cmb < left) & (cmb <= right)
    cm = cmb

    # parabolic refinement of trough lag/value
    denom = left - 2 * cm + right
    shift = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (left - right) / denom, 0.0)
    shift = jnp.clip(shift, -0.5, 0.5)
    lag_ref = jnp.asarray(lag, dtype=cm.dtype) + shift
    val_ref = cm - 0.25 * (left - right) * shift

    beta_probs = jnp.asarray(
        _beta_threshold_probs(n_thresholds, float(beta_parameters[0]), float(beta_parameters[1])),
        dtype=cm.dtype,
    )
    thresholds = jnp.asarray(np.linspace(0, 1, n_thresholds + 1)[1:], dtype=cm.dtype)

    big_val = jnp.where(is_trough, val_ref, jnp.inf)
    # below[i, f, τ]: trough τ of frame f under threshold i
    below = (big_val[None, :, :] < thresholds[:, None, None]) & is_trough[None, :, :]
    position = jnp.cumsum(below, axis=-1) - 1  # rank among troughs below, τ-order
    n_below = jnp.sum(below, axis=-1, keepdims=True)
    prior = _boltzmann_pmf(position.astype(cm.dtype), float(boltzmann_parameter), n_below.astype(cm.dtype))
    contrib = jnp.where(below, prior, 0.0) * beta_probs[:, None, None]
    probs = jnp.sum(contrib, axis=0)  # [NF, L]

    # thresholds with no trough → no_trough_prob mass at the global minimum
    # of the RAW band CMNDF (librosa pyin's yin_frames.argmin; the earlier
    # argmin over the inf-masked trough array made troughless frames pick
    # index 0, whose NaN parabola cast to bin 0 = fmin — a silent-frame
    # artifact the r2 golden had pinned)
    any_below = (n_below[..., 0] > 0)  # [n_thr, NF]
    miss_mass = jnp.sum(jnp.where(any_below, 0.0, beta_probs[:, None]), axis=0)  # [NF]
    gmin = jnp.argmin(cm, axis=-1)
    probs = probs + no_trough_prob * miss_mass[:, None] * jax.nn.one_hot(gmin, probs.shape[-1], dtype=cm.dtype)

    freqs = sr / jnp.maximum(lag_ref, 1e-6)

    # pitch-bin grid
    n_bins = int(np.floor(12.0 * np.log2(fmax / fmin) / resolution)) + 1
    bin_idx = jnp.clip(
        jnp.round(12.0 * jnp.log2(jnp.maximum(freqs, 1e-6) / fmin) / resolution).astype(jnp.int32),
        0,
        n_bins - 1,
    )
    # bin projection as a fused one-hot reduction (scatter-add lowers to a
    # slow sort-based scatter on TPU; the compare-multiply-reduce fuses)
    obs_v = jnp.sum(
        probs[..., None] * (bin_idx[..., None] == jnp.arange(n_bins)), axis=-2
    )
    voiced_prob = jnp.clip(jnp.sum(obs_v, axis=-1), 0.0, 1.0)
    obs_u = jnp.broadcast_to(((1.0 - voiced_prob) / n_bins)[:, None], obs_v.shape)
    obs = jnp.concatenate([obs_v, obs_u], axis=-1)  # [NF, 2*n_bins]

    # transition matrix: triangular local moves, voiced/unvoiced switch
    width = max(1, int(round(max_transition_rate * 12.0 * hop_length / sr / resolution)))
    tri = np.zeros((n_bins, n_bins))
    for off in range(-width, width + 1):
        wgt = width + 1 - abs(off)
        di = np.arange(max(0, -off), min(n_bins, n_bins - off))
        tri[di, di + off] = wgt
    tri = tri / tri.sum(axis=1, keepdims=True)
    t_full = np.block(
        [
            [(1 - switch_prob) * tri, switch_prob * tri],
            [switch_prob * tri, (1 - switch_prob) * tri],
        ]
    )
    log_t = jnp.asarray(np.log(np.maximum(t_full, 1e-30)), dtype=cm.dtype)
    log_obs = jnp.log(jnp.maximum(obs, 1e-30))

    def vstep(delta, lo):
        scores = delta[:, None] + log_t
        best = jnp.argmax(scores, axis=0)
        return jnp.max(scores, axis=0) + lo, best

    delta0 = log_obs[0] + jnp.log(1.0 / (2 * n_bins))
    delta_f, bps = jax.lax.scan(vstep, delta0, log_obs[1:])
    last = jnp.argmax(delta_f if nf > 1 else delta0)

    def back(nxt, bp):
        cur = bp[nxt]
        return cur, cur

    _, path_rev = jax.lax.scan(back, last, bps, reverse=True)
    path = jnp.concatenate([path_rev, jnp.asarray([last])])
    voiced = path < n_bins
    bin_of = jnp.where(voiced, path, path - n_bins)
    f0 = fmin * 2.0 ** (bin_of.astype(cm.dtype) * resolution / 12.0)
    return jnp.where(voiced, f0, 0.0)
