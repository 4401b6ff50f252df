"""WAV decode + resample to the analysis rate (host-side).

Replaces the reference's ``librosa.load(path, sr=10000, mono=False)``
(script/mfcc.py:262-289 load_channel, :373). soundfile/resampy are not
dependencies here: PCM/float WAV decoding is plain numpy over the RIFF
layout, and resampling is polyphase at resampy-kaiser_best grade (see
design_hq_taps); parity with the reference is at the feature level (≤1e-4 on
MFCCs for same-rate inputs; resampled inputs are bounded against the ideal
band-limited oracle by tests/test_io.py::test_resampler_feature_divergence).
"""
from __future__ import annotations

import struct
import wave
from fractions import Fraction
from functools import lru_cache

import numpy as np
from scipy.signal import resample_poly

__all__ = ["read_wav", "write_wav", "load_channel", "resample", "design_hq_taps"]


def read_wav(path: str) -> tuple[np.ndarray, int]:
    """Read a WAV file → (float32 samples [channels, n] or [n], sample_rate).

    Integer PCM is scaled to [-1, 1) like librosa/soundfile (int16 → /2**15,
    int32 → /2**31, uint8 → offset binary). float32/float64 pass through.
    """
    with open(path, "rb") as f:
        riff, _size, wave_id = struct.unpack("<4sI4s", f.read(12))
        if riff != b"RIFF" or wave_id != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        fmt_payload = b""
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, csize = struct.unpack("<4sI", hdr)
            payload = f.read(csize + (csize & 1))
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", payload[:16])
                fmt_payload = payload
            elif cid == b"data":
                data = payload[:csize]
        if fmt is None or data is None:
            raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, n_ch, sr, _brate, _align, bits = fmt
    if audio_format == 0xFFFE:
        # WAVE_FORMAT_EXTENSIBLE: the real format code is the first two
        # bytes of the SubFormat GUID at fmt offset 24 (1=PCM, 3=float) —
        # same as the native loader (native/modmfcc_io.cpp decode_wav).
        if len(fmt_payload) >= 26:
            audio_format = struct.unpack("<H", fmt_payload[24:26])[0]
        else:
            audio_format = 1
    if audio_format == 1:  # PCM
        if bits == 16:
            x = np.frombuffer(data, "<i2").astype(np.float32) / 2**15
        elif bits == 32:
            x = np.frombuffer(data, "<i4").astype(np.float32) / 2**31
        elif bits == 8:
            x = (np.frombuffer(data, "u1").astype(np.float32) - 128.0) / 128.0
        elif bits == 24:
            raw = np.frombuffer(data, "u1").reshape(-1, 3)
            as32 = (
                raw[:, 0].astype(np.int32)
                | (raw[:, 1].astype(np.int32) << 8)
                | (raw[:, 2].astype(np.int32) << 16)
            )
            as32 = (as32 ^ 0x800000) - 0x800000  # sign-extend
            x = as32.astype(np.float32) / 2**23
        else:
            raise ValueError(f"Unsupported PCM bit depth {bits}")
    elif audio_format == 3:  # IEEE float
        x = np.frombuffer(data, "<f4" if bits == 32 else "<f8").astype(np.float32)
    else:
        raise ValueError(f"Unsupported WAV format code {audio_format}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).T
    return x, sr


def write_wav(path: str, x: np.ndarray, sr: int) -> None:
    """Write float [-1,1] (or int16) samples as 16-bit PCM WAV."""
    x = np.asarray(x)
    if x.ndim > 1:
        x = x.T  # [n, channels]
    if x.dtype != np.int16:
        x = np.clip(x, -1.0, 1.0)
        x = (x * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1 if x.ndim == 1 else x.shape[1])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())


@lru_cache(maxsize=16)
def design_hq_taps(up: int, down: int) -> np.ndarray:
    """kaiser_best-grade polyphase anti-alias filter (without the ``up``
    gain — resample_poly/the native kernel apply it).

    The reference resamples through librosa.load (script/mfcc.py:373);
    librosa's high-quality resamplers (resampy kaiser_best / soxr_hq) use a
    ~64-zero-crossing Kaiser-windowed sinc with rolloff ≈ 0.9476 and
    β ≈ 14.77 (resampy's published kaiser_best spec). This matches that
    grade: stopband < -100 dB, passband ripple ~1e-5 — so the feature-level
    divergence from librosa's convention is bounded by the resamplers'
    shared deviation from ideal band-limited interpolation
    (tests/test_io.py::test_resampler_feature_divergence pins the bound).
    """
    from scipy.signal import firwin

    n_zeros = 64
    rolloff = 0.9475937167399596
    beta = 14.769656459379492
    m = max(up, down)
    half_len = n_zeros * m
    return firwin(2 * half_len + 1, rolloff / m, window=("kaiser", beta)).astype(
        np.float64
    )


def resample(x: np.ndarray, orig_sr: float, target_sr: float) -> np.ndarray:
    """Polyphase resampling along the last axis (kaiser_best-grade filter)."""
    if orig_sr == target_sr:
        return x
    frac = Fraction(int(round(target_sr)), int(round(orig_sr))).limit_denominator(1000)
    up, down = frac.numerator, frac.denominator
    return resample_poly(x, up, down, axis=-1, window=design_hq_taps(up, down))


def load_channel(path: str, signal_sample_rate: float = 10_000, channel_nb: int = 0):
    """Decode, resample to the analysis rate, and select a channel.

    The reference's load_channel (script/mfcc.py:262-289) returns all
    channels (its selection is commented out) and get_MFCCS_change then
    picks ``y = myAudio[channelN, :]`` (script/mfcc.py:377-380); this
    function folds that selection in — mono input returns 1-D unchanged,
    multichannel input returns the chosen channel as 1-D."""
    x, sr = read_wav(path)
    y = resample(x.astype(np.float64), sr, signal_sample_rate)
    if y.ndim > 1:
        y = y[channel_nb]
    return y
