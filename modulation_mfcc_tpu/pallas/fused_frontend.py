"""Fused spectral front-end Pallas kernel: audio → mel power, one pass.

The XLA path materializes the overlapping frame matrix in HBM (a ~6x blow-up
of the audio: 512-sample frames every 80 samples) before the DFT matmuls.
This kernel never materializes frames outside VMEM:

  grid (b, j): Pallas pipelines two input blocks per step — the frame
               block's own hop-rows [blkf, lane] plus a small tail block
               (the next ceil(n_fft/hop) rows) — double-buffered HBM→VMEM
               like any BlockSpec input (no manual DMA, full overlap of
               copy and compute)
               → frames [blkf, n_fft] built from ceil(n_fft/hop) shifted
                 sublane slices of the row buffer (no gather)
               → re/im = frames @ windowed-DFT bases    (one MXU contraction)
               → power = re² + im²                      (VPU)
               → mel   = power @ melᵀ                   (MXU)
               → write mel block [blkf, n_mels] + per-block max tile

HBM traffic is (audio·(128/hop) + mel out) instead of (frames 6.4x +
spectra); the per-block maxes feed librosa's top_db clip without re-reading
mel. The log/clip/DCT tail is a second tiny kernel (one mel read, one
[*, n_mfcc] write).

dtype modes:
  * float32 — parity mode (HIGHEST-precision MXU passes; ~2e-5 vs the rfft
    oracle measured on hardware);
  * bfloat16 — corpus throughput mode (BASELINE.json config #5), mel stored
    bf16, ~0.5 dB-domain error documented.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulation_mfcc_tpu.ops.spectral import dct_matrix, dft_bases, mel_filterbank
from modulation_mfcc_tpu.utils.helpers import round_up_to_multiple

__all__ = ["fused_mel_frontend", "fused_mfcc", "mfcc_tail"]

_TAIL_ROWS = 16  # >= ceil(n_fft/hop) for all supported configs; 8-multiple


def _kernel(main_ref, tail_ref, wri_ref, mel_ref, out_ref, bmax_ref, rows_vmem,
            *, blkf: int, hop: int, n_fft: int, lane: int, bins_pad: int,
            nf: int, compute_dtype, out_dtype, frame_mode: str = "concat"):
    n_shift = -(-n_fft // hop)
    # stage the pipelined blocks into one contiguous scratch so the shifted
    # slices below share a base layout (Mosaic cannot concat views of a
    # concat with mismatched sublane offsets)
    rows_vmem[:blkf] = main_ref[0].astype(rows_vmem.dtype)
    rows_vmem[blkf:] = tail_ref[0].astype(rows_vmem.dtype)
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    if frame_mode == "concat":
        # frames[i, k*hop:(k+1)*hop] = rows[i+k, :hop] — shifted sublane slices
        parts = []
        for k in range(n_shift):
            width = min(hop, n_fft - k * hop)
            parts.append(rows_vmem[k : k + blkf, :width])
        frames = jnp.concatenate(parts, axis=-1).astype(compute_dtype)
        reim = jnp.dot(frames, wri_ref[:], preferred_element_type=jnp.float32, precision=prec)
    else:
        # frames @ W == Σ_k rows[k:k+blkf] @ W_k (W_k = rows of W for hop-
        # chunk k, zero-padded to the lane width): no frame materialization
        reim = jnp.zeros((blkf, 2 * bins_pad), dtype=jnp.float32)
        for k in range(n_shift):
            lhs = rows_vmem[k : k + blkf, :].astype(compute_dtype)
            rhs = wri_ref[k * lane : (k + 1) * lane, :]
            reim = reim + jnp.dot(lhs, rhs, preferred_element_type=jnp.float32, precision=prec)
    re = reim[:, :bins_pad]
    im = reim[:, bins_pad:]
    p = re * re + im * im
    mel = jnp.dot(
        p.astype(compute_dtype), mel_ref[:], preferred_element_type=jnp.float32,
        precision=prec,
    )
    out_ref[0] = mel.astype(out_dtype)
    # Block max over VALID frames only (global frame index < nf, nf static).
    # Frames just past nf still window real tail samples (frame i starts at
    # i*hop - pad < t while i < nf + pad/hop), so an unmasked max could let
    # a tail transient raise the whole utterance's top_db clip floor.
    rowid = jax.lax.broadcasted_iota(jnp.int32, (blkf, 1), 0) + pl.program_id(1) * blkf
    mel_valid = jnp.where(rowid < nf, mel, 0.0)
    bmax_ref[0, 0] = jnp.full((8, 128), jnp.max(mel_valid), dtype=jnp.float32)


def fused_mel_frontend(
    audio: jnp.ndarray,
    *,
    sr: float,
    n_fft: int = 512,
    hop: int = 80,
    win_length: int | None = None,
    n_mels: int = 128,
    fmin: float = 100.0,
    fmax: float | None = None,
    blkf: int = 1024,
    compute_dtype=jnp.float32,
    out_dtype=jnp.float32,
    frame_mode: str = "concat",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mel [B, NF_pad, n_mels], block_maxes [B, nj, 8, 128]) for audio [B, T].

    NF_pad rounds the librosa frame count up to a block multiple; callers
    slice [:, :nf]. Centered framing (librosa center=True, zero pad).
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    if hop > 128 and hop % 128:
        raise ValueError(f"hop {hop} > 128 must be a multiple of 128")
    n_shift = -(-n_fft // hop)
    if n_shift > _TAIL_ROWS:
        raise ValueError(f"n_fft/hop ratio {n_shift} exceeds tail buffer {_TAIL_ROWS}")
    bsz, t = audio.shape
    pad = n_fft // 2
    nf = 1 + t // hop
    nj = -(-nf // blkf)
    nf_pad = nj * blkf
    lane = max(hop, 128)
    # hop-rows, one extra block so the tail view of the last step is in range
    rows_total = (nj + 1) * blkf
    total = rows_total * hop
    audio_p = jnp.pad(audio, ((0, 0), (pad, total - t - pad)))
    if compute_dtype == jnp.bfloat16:
        # corpus mode: bf16 samples at rest halve audio HBM traffic and the
        # VMEM staging copy (consistent with the mode's documented accuracy)
        audio_p = audio_p.astype(jnp.bfloat16)
    audio_p = audio_p.reshape(bsz, rows_total, hop)
    if hop < lane:
        audio_p = jnp.pad(audio_p, ((0, 0), (0, 0), (0, lane - hop)))

    wr, wi = dft_bases(n_fft, "hann", win_length or n_fft)
    n_bins = wr.shape[1]
    m_full = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    # drop trailing FFT bins with all-zero mel weight (e.g. the Nyquist bin
    # when fmax <= sr/2): they cannot affect the mel output, and trimming
    # 257→256 bins avoids a whole extra 128-lane tile in the DFT matmuls.
    nz = np.flatnonzero(np.abs(m_full).sum(axis=0) > 0)
    n_bins = int(nz[-1]) + 1 if nz.size else n_bins
    bins_pad = round_up_to_multiple(n_bins, 128)
    if frame_mode == "concat":
        wri_p = np.zeros((n_fft, 2 * bins_pad), np.float32)
        wri_p[:, :n_bins] = wr[:, :n_bins]
        wri_p[:, bins_pad : bins_pad + n_bins] = wi[:, :n_bins]
    else:
        # per-hop-chunk base rows at lane stride (zero rows over the pad)
        wri_p = np.zeros((n_shift * lane, 2 * bins_pad), np.float32)
        for c in range(n_shift):
            width = min(hop, n_fft - c * hop)
            wri_p[c * lane : c * lane + width, :n_bins] = wr[c * hop : c * hop + width, :n_bins]
            wri_p[c * lane : c * lane + width, bins_pad : bins_pad + n_bins] = wi[c * hop : c * hop + width, :n_bins]
    m_p = np.zeros((bins_pad, n_mels), np.float32)
    m_p[:n_bins, :] = m_full.T[:n_bins]

    cd = compute_dtype
    kern = partial(
        _kernel, blkf=blkf, hop=hop, n_fft=n_fft, lane=lane, bins_pad=bins_pad,
        nf=nf, compute_dtype=cd, out_dtype=out_dtype, frame_mode=frame_mode,
    )
    tail_stride = blkf // _TAIL_ROWS
    mel_out, bmax = pl.pallas_call(
        kern,
        grid=(bsz, nj),
        in_specs=[
            pl.BlockSpec((1, blkf, lane), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, _TAIL_ROWS, lane),
                lambda b, j: (b, (j + 1) * tail_stride, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (wri_p.shape[0], 2 * bins_pad), lambda b, j: (0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bins_pad, n_mels), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blkf, n_mels), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nf_pad, n_mels), out_dtype),
            jax.ShapeDtypeStruct((bsz, nj, 8, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((blkf + _TAIL_ROWS, lane), jnp.float32)],
    )(audio_p, audio_p, jnp.asarray(wri_p).astype(cd), jnp.asarray(m_p).astype(cd))
    return mel_out, bmax


def _tail_kernel(mel_ref, peak_ref, dct_ref, out_ref, *, n_mfcc: int):
    """log10 → top_db clip → DCT, one mel read, one write.

    The DCT matrix is zero-padded to a full 128-lane output tile (13 live
    columns would otherwise strand the MXU on a 13-lane write)."""
    b = pl.program_id(0)
    mel = mel_ref[0].astype(jnp.float32)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, peak_ref[b, 0] - 80.0)
    out_ref[0] = jnp.dot(
        db, dct_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def mfcc_tail(mel: jnp.ndarray, peak: jnp.ndarray, n_mfcc: int, blkf: int = 1024) -> jnp.ndarray:
    """Fused dB/clip/DCT over mel [B, NF_pad, n_mels] with per-batch-item
    db peaks [B] (librosa power_to_db top_db=80 + DCT-II ortho)."""
    bsz, nf_pad, n_mels = mel.shape
    nj = nf_pad // blkf
    out_cols = round_up_to_multiple(n_mfcc, 128)
    dct_p = np.zeros((n_mels, out_cols), np.float32)
    dct_p[:, :n_mfcc] = dct_matrix(n_mfcc, n_mels).T
    kern = partial(_tail_kernel, n_mfcc=n_mfcc)
    out = pl.pallas_call(
        kern,
        grid=(bsz, nj),
        in_specs=[
            pl.BlockSpec((1, blkf, n_mels), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, 1), lambda b, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_mels, out_cols), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blkf, out_cols), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nf_pad, out_cols), jnp.float32),
    )(mel, peak.reshape(bsz, 1), jnp.asarray(dct_p))
    return out[..., :n_mfcc]


def fused_mfcc(
    audio: jnp.ndarray,
    *,
    sr: float,
    n_fft: int = 512,
    hop: int = 80,
    win_length: int | None = None,
    n_mfcc: int = 13,
    n_mels: int = 128,
    fmin: float = 100.0,
    fmax: float | None = None,
    compute_dtype=jnp.float32,
    frame_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """MFCC [B, NF, n_mfcc] via the fused kernels.

    librosa semantics (power=2, power_to_db top_db=80, DCT-II ortho), same
    contract as ops/spectral.mfcc_from_frames.
    """
    single = audio.ndim == 1
    if single:
        audio = audio[None, :]
    t = audio.shape[-1]
    nf = 1 + t // hop
    blkf = 1024
    mel, bmax = fused_mel_frontend(
        audio,
        sr=sr,
        n_fft=n_fft,
        hop=hop,
        win_length=win_length,
        n_mels=n_mels,
        fmin=fmin,
        fmax=fmax,
        blkf=blkf,
        compute_dtype=compute_dtype,
        out_dtype=jnp.bfloat16 if compute_dtype == jnp.bfloat16 else jnp.float32,
    )
    # per-utterance top_db peak: log10 is monotone, so peak_db =
    # 10·log10(max(mel_power)) over valid frames — from the kernel's
    # per-block maxes when no mask, one masked mel reduce otherwise.
    if frame_mask is not None:
        fm = jnp.pad(frame_mask, ((0, 0), (0, mel.shape[1] - frame_mask.shape[1])))
        pmax = jnp.max(
            jnp.where(fm[..., None] > 0, mel.astype(jnp.float32), 0.0), axis=(1, 2)
        )
    else:
        # block maxes are masked to frames < nf inside the kernel
        pmax = jnp.max(bmax, axis=(1, 2, 3))
    peak = 10.0 * jnp.log10(jnp.maximum(pmax, 1e-10))
    out = mfcc_tail(mel, peak, n_mfcc, blkf=blkf)[:, :nf, :]
    return out[0] if single else out
