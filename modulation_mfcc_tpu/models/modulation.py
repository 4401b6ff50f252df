"""MFCC rate-of-change ("modulation cepstrum") — the flagship pipeline.

TPU-native rebuild of the reference's hot loop ``get_MFCCS_change``
(script/mfcc.py:291-427, Goldstein-2019 formulation):

    audio → centered frames → (window·DFT → power → mel → dB → DCT) → drop C0
          → per-coefficient zero-phase Butterworth low-pass (12 Hz default)
          → time derivative (np.gradient or SG) → sqrt(Σ_coef d²)/n_coef
          → final low-pass (Goldstein) or custom out-filter

Everything between the frames gather and the output is static-shape XLA:
the spectral stage is matmuls (MXU), the filters are scans vectorized over
the coefficient axis, the reduction is a single fused elementwise+reduce.
Batched inputs ([B, T] with optional per-utterance masks) run the exact same
program under vmap-style broadcasting; the per-utterance top_db clip is
mask-aware so padded batches match per-file outputs.

Also provides ``modulation_spectrum``: a second-stage STFT over the MFCC
coefficient trajectories (the BASELINE.json config-3 extension).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from modulation_mfcc_tpu.models.config import MfccConfig
from modulation_mfcc_tpu.ops import filters as F
from modulation_mfcc_tpu.ops import masked
from modulation_mfcc_tpu.ops.derivatives import np_gradient
from modulation_mfcc_tpu.ops.framing import frame_signal, frame_times_mfcc, n_frames_centered
from modulation_mfcc_tpu.ops.savgol import savgol_filter_jax
from modulation_mfcc_tpu.ops.spectral import mfcc_from_frames

__all__ = ["mfcc_trajectories", "mfcc_change", "extract_mfcc_change", "modulation_spectrum"]


def mfcc_trajectories(
    y: jnp.ndarray,
    cfg: MfccConfig,
    *,
    frame_mask: jnp.ndarray | None = None,
    use_fft: bool = True,
    spectrum: str | None = None,
) -> jnp.ndarray:
    """MFCC matrix [..., n_frames, n_mfcc] with librosa semantics
    (reference: script/mfcc.py:387).

    ``spectrum`` selects the front-end implementation:
      * 'fft'         — framing gather + jnp.fft.rfft (oracle path)
      * 'matmul'      — framing gather + windowed-DFT matmuls (MXU)
      * 'pallas'      — fused Pallas kernel, f32 (parity ≈1e-5, fastest exact)
      * 'pallas_bf16' — fused Pallas kernel, bf16 multiplies (corpus
                        throughput mode; ~0.5 absolute MFCC-dB error)
    Default 'fft'; the legacy ``use_fft=False`` maps to 'matmul'.
    """
    if spectrum is None:
        spectrum = "fft" if use_fft else "matmul"
    if spectrum not in ("fft", "matmul", "pallas", "pallas_bf16"):
        raise ValueError(
            f"Unknown spectrum {spectrum!r}; one of fft, matmul, pallas, pallas_bf16"
        )
    if spectrum.startswith("pallas"):
        from modulation_mfcc_tpu.pallas.fused_frontend import fused_mfcc

        return fused_mfcc(
            y,
            sr=cfg.signal_sample_rate,
            n_fft=cfg.n_fft,
            hop=cfg.hop_length,
            win_length=cfg.win_length,
            n_mfcc=cfg.n_mfcc,
            n_mels=cfg.n_mels,
            fmin=cfg.minFreq,
            fmax=cfg.maxFreq,
            compute_dtype=jnp.bfloat16 if spectrum.endswith("bf16") else jnp.float32,
            frame_mask=frame_mask,
        )
    frames = frame_signal(y, cfg.n_fft, cfg.hop_length)
    mask = None
    if frame_mask is not None:
        mask = frame_mask[..., :, None]
    return mfcc_from_frames(
        frames,
        sr=cfg.signal_sample_rate,
        n_fft=cfg.n_fft,
        n_mfcc=cfg.n_mfcc,
        n_mels=cfg.n_mels,
        fmin=cfg.minFreq,
        fmax=cfg.maxFreq,
        win_length=cfg.win_length,
        use_fft=(spectrum == "fft"),
        mask=mask,
    )


def mfcc_change(
    y: jnp.ndarray,
    cfg: MfccConfig,
    *,
    frame_mask: jnp.ndarray | None = None,
    frame_lengths: jnp.ndarray | None = None,
    use_fft: bool = True,
    spectrum: str | None = None,
) -> jnp.ndarray:
    """Total MFCC change over time, [..., n_frames].

    Line-by-line parity with get_MFCCS_change (script/mfcc.py:387-427); time
    anchors are host-side via :func:`change_times`.

    For padded batches pass ``frame_lengths`` [B] (valid frame count per
    utterance): the filter/derivative stages then use the length-masked edge
    variants (ops/masked.py) so every utterance's output matches its
    single-file result exactly on valid frames.
    """
    if frame_lengths is not None and frame_mask is None:
        nf_pad = n_frames_centered(y.shape[-1], cfg.n_fft, cfg.hop_length)
        frame_mask = (
            jnp.arange(nf_pad)[None, :] < frame_lengths[:, None]
        ).astype(y.dtype)
    m = mfcc_trajectories(
        y, cfg, frame_mask=frame_mask, use_fft=use_fft, spectrum=spectrum
    )
    if cfg.removeFirst:
        m = m[..., 1:]
    n_coef = m.shape[-1]
    # time-major → coef-major so the filter scan runs along the last axis
    traj = jnp.swapaxes(m, -1, -2)  # [..., n_coef, n_frames]
    fs_traj = 1.0 / cfg.tStep
    cut_norm = cfg.filtCutoff / (fs_traj / 2.0)
    sos, zi, padlen = F.design_butter_sos(cfg.filtOrd, (cut_norm,), "lowpass")
    if frame_lengths is None:
        filt = F.sosfiltfilt(sos, zi, padlen, traj)
        if cfg.diffMethod == "grad":
            diff = np_gradient(filt)  # spacing 1: np.gradient(..., axis=1)
        else:
            diff = savgol_filter_jax(filt, 3, 2, deriv=1)
    else:
        mfiltfilt = jax.vmap(
            lambda tr, L: masked.masked_sosfiltfilt(sos, zi, padlen, tr, L)
        )
        filt = mfiltfilt(traj, frame_lengths)
        if cfg.diffMethod == "grad":
            diff = jax.vmap(masked.masked_gradient)(filt, frame_lengths)
        else:
            diff = jax.vmap(
                lambda tr, L: masked.masked_savgol(tr, 3, 2, L, deriv=1)
            )(filt, frame_lengths)
    tot = jnp.sqrt(jnp.sum(diff * diff, axis=-2)) / n_coef
    if cfg.outFilter is None:
        if frame_lengths is None:
            tot = F.sosfiltfilt(sos, zi, padlen, tot)
        else:
            tot = jax.vmap(
                lambda tr, L: masked.masked_sosfiltfilt(sos, zi, padlen, tr, L)
            )(tot, frame_lengths)
    else:
        if frame_lengths is None:
            tot = F.apply_filter(
                tot,
                fs_traj,
                filt=cfg.outFilter,
                cut_off=cfg.outFiltCutOff,
                filt_len=cfg.outFiltLen,
                filt_type=cfg.outFiltType,
                poly_ord=cfg.outFiltPolyOrd,
            )
        else:
            tot = _masked_apply_filter(tot, frame_lengths, fs_traj, cfg)
    return tot


def _masked_apply_filter(tot, frame_lengths, fs_traj, cfg: MfccConfig):
    """Length-masked version of the reference's out-filter stage
    (script/mfcc.py:423-425 → applyFilter)."""
    ftype = F.resolve_filt_type(cfg.outFiltType)
    cut = np.asarray([c for c in cfg.outFiltCutOff if c is not None], dtype=np.float64)
    wn = tuple((cut / (fs_traj / 2.0)).tolist())
    if cfg.outFilter == "iir":
        sos2, zi2, padlen2 = F.design_butter_sos(cfg.outFiltLen, wn, ftype)
        return jax.vmap(
            lambda tr, L: masked.masked_sosfiltfilt(sos2, zi2, padlen2, tr, L)
        )(tot, frame_lengths)
    if cfg.outFilter == "fir":
        b, zi2, padlen2 = F.design_firwin(cfg.outFiltLen, wn, ftype)
        return jax.vmap(
            lambda tr, L: masked.masked_filtfilt(b, np.array([1.0]), zi2, padlen2, tr, L)
        )(tot, frame_lengths)
    if cfg.outFilter == "sg":
        return jax.vmap(
            lambda tr, L: masked.masked_savgol(
                tr, cfg.outFiltLen, cfg.outFiltPolyOrd, L, deriv=0
            )
        )(tot, frame_lengths)
    raise ValueError(f"Unknown outFilter {cfg.outFilter!r}")


def change_times(n_samples: int, cfg: MfccConfig) -> np.ndarray:
    """Host-side time anchors (reference script/mfcc.py:390)."""
    nf = n_frames_centered(n_samples, cfg.n_fft, cfg.hop_length)
    return frame_times_mfcc(nf, cfg.tStep, cfg.winLen)


@partial(jax.jit, static_argnames=("cfg", "use_fft", "spectrum"))
def _mfcc_change_jit(y, cfg, use_fft, spectrum):
    return mfcc_change(y, cfg, use_fft=use_fft, spectrum=spectrum)


def extract_mfcc_change(
    y, cfg: MfccConfig = MfccConfig(), *, use_fft: bool = True, spectrum: str | None = None
):
    """User-facing: (tot_change, times) for one utterance or a batch.

    Drop-in functional replacement for the reference's Mfcc DataSource
    (script/main.py:726-770): same defaults, same outputs, jitted on TPU.
    """
    y = jnp.asarray(y, dtype=jnp.float32)
    tot = _mfcc_change_jit(y, cfg, use_fft, spectrum)
    t = change_times(y.shape[-1], cfg)
    return tot, t


def modulation_spectrum(
    y: jnp.ndarray,
    cfg: MfccConfig,
    *,
    mod_n_fft: int = 128,
    mod_hop: int = 16,
    use_fft: bool = True,
) -> jnp.ndarray:
    """Second-stage STFT over MFCC coefficient trajectories.

    Returns the modulation power spectrum [..., n_coef, n_modframes, n_modbins]
    (BASELINE.json config 3): each MFCC coefficient trajectory (sampled at
    1/tStep Hz) is analyzed with a second Hann-windowed rFFT. Implemented as
    the same static framing+matmul pattern, batched over coefficients.
    """
    from modulation_mfcc_tpu.ops.spectral import analysis_window, power_spectrum_fft

    m = mfcc_trajectories(y, cfg, use_fft=use_fft)
    if cfg.removeFirst:
        m = m[..., 1:]
    traj = jnp.swapaxes(m, -1, -2)  # [..., n_coef, n_frames]
    traj = traj - jnp.mean(traj, axis=-1, keepdims=True)
    frames = frame_signal(traj, mod_n_fft, mod_hop)
    w = analysis_window(mod_n_fft, "hann", mod_n_fft)
    return power_spectrum_fft(frames, mod_n_fft, w)
