"""Spectral transforms: STFT power, mel filterbank, log compression, DCT → MFCC.

This is the TPU-native replacement for the reference's single call into
``librosa.feature.mfcc`` (reference: script/mfcc.py:387). Everything is
expressed as static-shape matmuls + elementwise ops so XLA can fuse the whole
front-end and place the contractions on the MXU:

    frames [N, n_fft] --(x2 matmul vs. windowed DFT bases)--> re, im [N, n_bins]
    power = re^2 + im^2
    mel   = power @ M^T          (mel filterbank, Slaney-normalized)
    db    = power_to_db(mel)     (librosa ref=1.0, amin=1e-10, top_db=80)
    mfcc  = db @ D^T             (DCT-II, ortho)

All matrices are designed host-side in float64 numpy and closed over as
constants; only the matmuls/elementwise run on device. An ``jnp.fft.rfft``
path is kept as the oracle/fallback (bit-closer to numpy on CPU); the matmul
path is what the fused Pallas kernel uses.
"""
from __future__ import annotations

from functools import lru_cache

import numpy as np

import jax
import jax.numpy as jnp

from modulation_mfcc_tpu.ops.windows import get_window
from modulation_mfcc_tpu.utils.helpers import pad_center

# ---------------------------------------------------------------------------
# Host-side designs (float64 numpy, cached)
# ---------------------------------------------------------------------------


def fft_frequencies(sr: float, n_fft: int) -> np.ndarray:
    """Center frequencies of rFFT bins (librosa.fft_frequencies)."""
    return np.linspace(0.0, sr / 2.0, 1 + n_fft // 2, endpoint=True)


def hz_to_mel(f, htk: bool = False):
    """Hz→mel. Slaney (librosa default) unless htk=True."""
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = f >= min_log_hz
    mels = np.where(log_t, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def mel_to_hz(mels, htk: bool = False):
    """mel→Hz inverse of :func:`hz_to_mel`."""
    mels = np.asarray(mels, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * mels
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    log_t = mels >= min_log_mel
    freqs = np.where(log_t, min_log_hz * np.exp(logstep * (mels - min_log_mel)), freqs)
    return freqs


@lru_cache(maxsize=64)
def mel_filterbank(
    sr: float,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape [n_mels, 1+n_fft//2].

    Matches ``librosa.filters.mel`` (the implicit filterbank inside the
    reference's MFCC call, script/mfcc.py:387 with fmin=100, fmax=10000).
    Note the reference passes fmax above Nyquist; like librosa, filters whose
    support exceeds Nyquist simply have empty rows.
    """
    if fmax is None:
        fmax = sr / 2.0
    fftfreqs = fft_frequencies(sr, n_fft)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2), htk)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney normalization: scale each filter to ~constant energy per channel
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights


@lru_cache(maxsize=16)
def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """DCT-II with 'ortho' norm as a matrix [n_out, n_in].

    ``dct_matrix(k, n) @ x == scipy.fft.dct(x, type=2, norm='ortho')[:k]``,
    the liftering step of librosa.feature.mfcc.
    """
    n = np.arange(n_in)
    k = np.arange(n_out)[:, None]
    mat = 2.0 * np.cos(np.pi * k * (2 * n[None, :] + 1) / (2 * n_in))
    scale = np.full((n_out, 1), np.sqrt(1.0 / (2 * n_in)))
    scale[0, 0] = np.sqrt(1.0 / (4 * n_in))
    return mat * scale


@lru_cache(maxsize=64)
def dft_bases(n_fft: int, window: str = "hann", win_length: int | None = None):
    """Windowed real-DFT bases for the matmul (MXU) spectrum path.

    Returns (wr, wi) each [n_fft, 1+n_fft//2] float32 such that for a raw
    (unwindowed) frame row-vector f: ``re = f @ wr``, ``im = f @ wi`` equal the
    rFFT of (f * padded_window). The analysis window is folded into the bases
    so the whole STFT is two matmuls.
    """
    if win_length is None:
        win_length = n_fft
    w = pad_center(get_window(window, win_length, periodic=True), n_fft)
    n = np.arange(n_fft)[:, None]
    k = np.arange(1 + n_fft // 2)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    wr = np.cos(ang) * w[:, None]
    wi = np.sin(ang) * w[:, None]
    return wr.astype(np.float32), wi.astype(np.float32)


@lru_cache(maxsize=64)
def analysis_window(n_fft: int, window: str = "hann", win_length: int | None = None) -> np.ndarray:
    """Zero-padded (centered) analysis window of length n_fft, float64."""
    if win_length is None:
        win_length = n_fft
    return pad_center(get_window(window, win_length, periodic=True), n_fft)


# ---------------------------------------------------------------------------
# Device-side ops (JAX)
# ---------------------------------------------------------------------------

# TPU matmuls default to bf16-accumulated DEFAULT precision — a 2.6e-3 error
# on the MFCC parity gate. The parity path pins HIGHEST (fp32 on MXU); the
# throughput path (Pallas / bf16 corpus mode) opts out explicitly.
_PARITY_PRECISION = jax.lax.Precision.HIGHEST


def _pdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.matmul(a, b, precision=_PARITY_PRECISION)


def power_spectrum_fft(frames: jnp.ndarray, n_fft: int, window_vec: np.ndarray) -> jnp.ndarray:
    """|rFFT(frames * window)|^2 via jnp.fft — oracle/fallback path."""
    w = jnp.asarray(window_vec, dtype=frames.dtype)
    spec = jnp.fft.rfft(frames * w, n=n_fft, axis=-1)
    return jnp.real(spec) ** 2 + jnp.imag(spec) ** 2


def power_spectrum_matmul(frames: jnp.ndarray, wr, wi) -> jnp.ndarray:
    """|DFT|^2 as two MXU matmuls against windowed DFT bases (GEMM-native NDFT)."""
    wr = jnp.asarray(wr, dtype=frames.dtype)
    wi = jnp.asarray(wi, dtype=frames.dtype)
    re = _pdot(frames, wr)
    im = _pdot(frames, wi)
    return re * re + im * im


def power_to_db(
    s: jnp.ndarray,
    *,
    amin: float = 1e-10,
    top_db: float | None = 80.0,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """librosa.power_to_db with ref=1.0: 10*log10(max(s, amin)), clipped to
    ``max - top_db``.

    The max is taken over the whole (per-utterance) spectrogram as librosa
    does for a single call. For padded batches pass ``mask`` (broadcastable,
    1=valid) so padding does not contaminate the per-utterance max; axes other
    than the leading batch axis are always reduced.
    """
    log_spec = 10.0 * jnp.log10(jnp.maximum(s, amin))
    if top_db is None:
        return log_spec
    # Per-utterance max: reduce the (frames, mel) trailing axes, keep leading
    # batch axes — matches librosa's per-call global max for a single
    # utterance while keeping padded batches independent per item.
    axes = tuple(range(s.ndim - 2, s.ndim))
    if mask is not None:
        neg = jnp.finfo(log_spec.dtype).min
        masked = jnp.where(mask > 0, log_spec, neg)
        peak = jnp.max(masked, axis=axes, keepdims=True)
    else:
        peak = jnp.max(log_spec, axis=axes, keepdims=True)
    return jnp.maximum(log_spec, peak - top_db)


def melspectrogram(
    frames: jnp.ndarray,
    *,
    sr: float,
    n_fft: int,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    window: str = "hann",
    win_length: int | None = None,
    use_fft: bool = True,
) -> jnp.ndarray:
    """Mel power spectrogram of pre-cut frames [..., N, n_fft] → [..., N, n_mels]."""
    if use_fft:
        p = power_spectrum_fft(frames, n_fft, analysis_window(n_fft, window, win_length))
    else:
        p = power_spectrum_matmul(frames, *dft_bases(n_fft, window, win_length))
    m = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax), dtype=frames.dtype)
    return _pdot(p, m.T)


def mfcc_from_frames(
    frames: jnp.ndarray,
    *,
    sr: float,
    n_fft: int,
    n_mfcc: int = 13,
    n_mels: int = 128,
    fmin: float = 0.0,
    fmax: float | None = None,
    window: str = "hann",
    win_length: int | None = None,
    use_fft: bool = True,
    top_db: float | None = 80.0,
    mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MFCCs [..., N, n_mfcc] from frames; frame-major layout (time on rows).

    Composition matches librosa.feature.mfcc (reference: script/mfcc.py:387):
    melspectrogram(power=2) → power_to_db(top_db=80) → DCT-II-ortho over the
    mel axis → first n_mfcc coefficients. Note the output here is [time, coef]
    (transposed vs librosa's [coef, time]) — better TPU layout: time is the
    long, tileable dimension.
    """
    mel = melspectrogram(
        frames,
        sr=sr,
        n_fft=n_fft,
        n_mels=n_mels,
        fmin=fmin,
        fmax=fmax,
        window=window,
        win_length=win_length,
        use_fft=use_fft,
    )
    db = power_to_db(mel, top_db=top_db, mask=mask)
    d = jnp.asarray(dct_matrix(n_mfcc, n_mels), dtype=frames.dtype)
    return _pdot(db, d.T)
