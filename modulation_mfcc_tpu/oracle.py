"""CPU parity oracle: faithful numpy/scipy reimplementation of the reference
pipeline's semantics (shipped with the package so `modmfcc verify` works on
any install).

The reference (script/mfcc.py, script/calc.py in aaron-randreth/modulation-mfcc)
delegates to librosa/scipy/Praat. librosa and parselmouth are not installed in
this environment, so this module re-derives the *exact* librosa formulas in
plain numpy (float64) + scipy, and is itself validated by construction against
the librosa source semantics:

  - librosa.feature.mfcc = dct(power_to_db(melspectrogram(...)), type=2,
    norm='ortho')[:n_mfcc]   with melspectrogram power=2.0, n_mels=128,
    stft center=True, pad_mode='constant', periodic hann window.
  - power_to_db: ref=1.0, amin=1e-10, top_db=80.0 (global max clip).
  - mel filterbank: Slaney scale + Slaney normalization.

scipy *is* installed, so the filter stages (butter/sosfiltfilt/savgol/...)
use real scipy — those parts of the oracle are literally the same library the
reference calls.
"""
from __future__ import annotations

import numpy as np
from scipy.signal import butter, filtfilt, firwin, savgol_filter, sosfiltfilt

from modulation_mfcc_tpu.ops.spectral import (
    analysis_window,
    dct_matrix,
    mel_filterbank,
)


def stft_power_np(
    y: np.ndarray, n_fft: int, hop: int, win_length: int, pad_mode: str = "constant"
) -> np.ndarray:
    """|STFT|^2 with librosa conventions (center=True). Returns [n_bins, n_frames]."""
    w = analysis_window(n_fft, "hann", win_length)
    pad = n_fft // 2
    ypad = np.pad(y.astype(np.float64), pad, mode=pad_mode)
    nf = 1 + (len(ypad) - n_fft) // hop
    idx = np.arange(nf)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = ypad[idx] * w[None, :]
    spec = np.fft.rfft(frames, n=n_fft, axis=-1)
    return (np.abs(spec) ** 2).T


def power_to_db_np(s: np.ndarray, amin: float = 1e-10, top_db: float | None = 80.0):
    log_spec = 10.0 * np.log10(np.maximum(amin, s))
    if top_db is not None:
        log_spec = np.maximum(log_spec, log_spec.max() - top_db)
    return log_spec


def mfcc_np(
    y: np.ndarray,
    sr: float,
    *,
    n_mfcc: int = 13,
    win_length: int,
    hop_length: int,
    n_fft: int = 512,
    fmin: float = 100.0,
    fmax: float = 10000.0,
    n_mels: int = 128,
) -> np.ndarray:
    """librosa.feature.mfcc equivalent. Returns [n_mfcc, n_frames]."""
    p = stft_power_np(y, n_fft, hop_length, win_length)
    m = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    mel = m @ p
    db = power_to_db_np(mel)
    d = dct_matrix(n_mfcc, n_mels)
    return d @ db


def get_mfccs_change_np(
    y: np.ndarray,
    sig_sr: float,
    *,
    t_step: float = 0.005,
    win_len: float = 0.025,
    n_mfcc: int = 13,
    n_fft: int = 512,
    min_freq: float = 100.0,
    max_freq: float = 10000.0,
    remove_first: int = 1,
    filt_cutoff: float = 12.0,
    filt_ord: int = 6,
    diff_method: str = "grad",
    out_filter: str | None = "iir",
    out_filt_cutoff=(12.0,),
    out_filt_len: int = 6,
    out_filt_poly_ord: int = 3,
):
    """Oracle for reference get_MFCCS_change (script/mfcc.py:291-427).

    Follows the reference line by line: librosa MFCC → drop C0 → per-coef
    Butterworth sosfiltfilt low-pass → gradient (or SG deriv) → L2-norm/n →
    final low-pass. Uses real scipy for every filter stage.
    """
    win_length = int(win_len * sig_sr)
    hop_length = int(t_step * sig_sr)
    m = mfcc_np(
        y,
        sig_sr,
        n_mfcc=n_mfcc,
        win_length=win_length,
        hop_length=hop_length,
        n_fft=n_fft,
        fmin=min_freq,
        fmax=max_freq,
    )
    n_frames = m.shape[1]
    t = np.round(np.arange(1, n_frames + 1) * t_step + win_len / 2.0, 4)
    if remove_first:
        m = m[1:, :]
    cut_norm = filt_cutoff / ((1.0 / t_step) / 2.0)
    sos = butter(filt_ord, cut_norm, btype="low", output="sos")
    filt = sosfiltfilt(sos, m)
    if diff_method == "grad":
        diff = np.gradient(filt, axis=1)
    else:
        diff = savgol_filter(filt, 3, 2, deriv=1, axis=1, mode="interp")
    tot = np.sqrt(np.sum(diff**2, axis=0)) / m.shape[0]
    if out_filter is None:
        tot = sosfiltfilt(sos, tot)
    elif out_filter == "iir":
        w = np.asarray(out_filt_cutoff) / ((1.0 / t_step) / 2.0)
        sos2 = butter(out_filt_len, w if len(w) > 1 else w[0], btype="low", output="sos")
        tot = sosfiltfilt(sos2, tot)
    elif out_filter == "fir":
        w = np.asarray(out_filt_cutoff) / ((1.0 / t_step) / 2.0)
        b = firwin(out_filt_len, w if len(w) > 1 else w[0], window=("kaiser", 7.4), pass_zero="lowpass")
        tot = filtfilt(b, 1.0, tot)
    elif out_filter == "sg":
        tot = savgol_filter(tot, out_filt_len, out_filt_poly_ord, deriv=0, mode="interp")
    else:
        raise NotImplementedError(out_filter)
    return tot, t
