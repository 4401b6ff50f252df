"""Fused spectral front-end Pallas kernel: audio → mel power, one pass.

The XLA path materializes the overlapping frame matrix in HBM (a ~6x blow-up
of the audio: 512-sample frames every 80 samples) before the DFT matmuls.
This kernel never materializes frames outside VMEM:

  grid (b, j): DMA one audio span [span] HBM→VMEM
               → build frames [BLKF, n_fft] with ceil(n_fft/hop) static
                 shifted slices of the span's [*, hop] reshape (no gather —
                 pure sublane moves)
               → re/im = frames @ windowed-DFT bases   (MXU)
               → power = re² + im²                     (VPU)
               → mel   = power @ melᵀ                  (MXU)
               → write mel block [BLKF, n_mels] + per-block max

HBM traffic drops from (frames 6x + spectra) to (audio 1x + mel out), and
the DFT/mel contractions run back-to-back from VMEM. The log/clip/DCT tail
stays in XLA (it is tiny and needs the global max anyway).

dtype modes:
  * float32 — parity mode (matches the jnp matmul path);
  * bfloat16 bases/frames with f32 accumulation — corpus throughput mode
    (BASELINE.json config #5), ~1e-2 MFCC error documented.
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

__all__ = ["fused_mel_frontend", "fused_mfcc"]


def _kernel(audio_ref, wr_ref, wi_ref, mel_ref, out_ref, span_vmem, sem,
            *, blkf: int, hop: int, n_fft: int, span: int, compute_dtype,
            out_dtype=jnp.float32):
    # audio_ref is [B, rows_total, hop] (hop-sample rows); one DMA pulls the
    # row block covering this frame block plus its n_fft tail.
    b = pl.program_id(0)
    j = pl.program_id(1)
    rows = round_up_to_multiple(span // hop, 8)  # sublane-aligned DMA
    copy = pltpu.make_async_copy(
        audio_ref.at[b, pl.ds(j * blkf, rows), :], span_vmem, sem
    )
    copy.start()
    copy.wait()
    # frames[i, k*hop:(k+1)*hop] = rows[i+k] — shifted sublane slices, no gather
    n_shift = -(-n_fft // hop)
    parts = []
    for k in range(n_shift):
        width = min(hop, n_fft - k * hop)
        parts.append(span_vmem[k : k + blkf, :width])
    frames = jnp.concatenate(parts, axis=-1).astype(compute_dtype)
    # HIGHEST: f32-exact MXU passes in parity mode; bf16 compute_dtype runs
    # single-pass bf16 multiplies (Mosaic rejects fp32 contract on bf16 in).
    prec = (
        jax.lax.Precision.HIGHEST
        if compute_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    re = jnp.dot(frames, wr_ref[:], preferred_element_type=jnp.float32, precision=prec)
    im = jnp.dot(frames, wi_ref[:], preferred_element_type=jnp.float32, precision=prec)
    p = re * re + im * im
    mel = jnp.dot(
        p.astype(compute_dtype), mel_ref[:], preferred_element_type=jnp.float32, precision=prec
    )
    out_ref[0] = mel.astype(out_dtype)


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
    blkf: int = 512,
    compute_dtype=jnp.float32,
    out_dtype=jnp.float32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mel [B, NF_pad, n_mels], global_max scalar) for audio [B, T].

    NF_pad rounds the librosa frame count up to a block multiple; callers
    slice [:, :nf]. Centered framing (librosa center=True, zero pad).
    """
    if audio.ndim == 1:
        audio = audio[None, :]
    bsz, t = audio.shape
    pad = n_fft // 2
    nf = 1 + t // hop
    nj = -(-nf // blkf)
    nf_pad = nj * blkf
    span = blkf * hop + round_up_to_multiple(n_fft, hop)
    span = round_up_to_multiple(span // hop, 8) * hop  # sublane-aligned rows
    total = nf_pad * hop + span  # generous tail so every DMA is in range
    audio_p = jnp.pad(audio, ((0, 0), (pad, total - t - pad)))
    # hop-sample rows, padded to the 128-lane tile so row blocks slice cleanly
    audio_p = audio_p.reshape(bsz, total // hop, hop)
    lane = 128
    audio_p = jnp.pad(audio_p, ((0, 0), (0, 0), (0, lane - hop))) if hop < lane else audio_p

    wr, wi = dft_bases(n_fft, "hann", win_length or n_fft)
    n_bins = wr.shape[1]
    m_full = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    # drop trailing FFT bins with all-zero mel weight (e.g. the Nyquist bin
    # when fmax <= sr/2): they cannot affect the mel output, and trimming
    # 257→256 bins avoids a whole extra 128-lane tile in the DFT matmuls.
    nz = np.flatnonzero(np.abs(m_full).sum(axis=0) > 0)
    n_bins = int(nz[-1]) + 1 if nz.size else n_bins
    wr = wr[:, :n_bins]
    wi = wi[:, :n_bins]
    bins_pad = round_up_to_multiple(n_bins, 128)
    wr_p = np.zeros((n_fft, bins_pad), np.float32)
    wr_p[:, :n_bins] = wr
    wi_p = np.zeros((n_fft, bins_pad), np.float32)
    wi_p[:, :n_bins] = wi
    m_p = np.zeros((bins_pad, n_mels), np.float32)
    m_p[:n_bins, :] = m_full.T[:n_bins]

    cd = compute_dtype
    kern = partial(
        _kernel, blkf=blkf, hop=hop, n_fft=n_fft, span=span, compute_dtype=cd,
        out_dtype=out_dtype,
    )
    mel_out = pl.pallas_call(
        kern,
        grid=(bsz, nj),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # audio stays in HBM
            pl.BlockSpec((n_fft, bins_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, bins_pad), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_pad, n_mels), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blkf, n_mels), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nf_pad, n_mels), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((round_up_to_multiple(span // hop, 8), max(hop, 128)), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(audio_p, jnp.asarray(wr_p).astype(cd), jnp.asarray(wi_p).astype(cd),
      jnp.asarray(m_p).astype(cd))
    return mel_out, jnp.max(mel_out)


def _tail_kernel(mel_ref, peak_ref, dct_ref, out_ref, *, n_mfcc: int):
    """log10 → top_db clip → DCT, one mel read, one [*, n_mfcc] write."""
    b = pl.program_id(0)
    mel = mel_ref[0].astype(jnp.float32)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, peak_ref[b, 0] - 80.0)
    out_ref[0] = jnp.dot(
        db, dct_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def mfcc_tail(mel: jnp.ndarray, peak: jnp.ndarray, n_mfcc: int, blkf: int = 512) -> jnp.ndarray:
    """Fused dB/clip/DCT over mel [B, NF_pad, n_mels] with per-batch-item
    db peaks [B] (librosa power_to_db top_db=80 + DCT-II ortho)."""
    bsz, nf_pad, n_mels = mel.shape
    nj = nf_pad // blkf
    kern = partial(_tail_kernel, n_mfcc=n_mfcc)
    return pl.pallas_call(
        kern,
        grid=(bsz, nj),
        in_specs=[
            pl.BlockSpec((1, blkf, n_mels), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, 1), lambda b, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((n_mels, n_mfcc), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, blkf, n_mfcc), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nf_pad, n_mfcc), jnp.float32),
    )(mel, peak.reshape(bsz, 1), jnp.asarray(dct_matrix(n_mfcc, n_mels).T, dtype=jnp.float32))


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
    """MFCC [B, NF, n_mfcc] via the fused kernel + XLA log/clip/DCT tail.

    librosa semantics (power=2, power_to_db top_db=80, DCT-II ortho), same
    contract as ops/spectral.mfcc_from_frames.
    """
    single = audio.ndim == 1
    if single:
        audio = audio[None, :]
    t = audio.shape[-1]
    nf = 1 + t // hop
    blkf = 512
    mel, _ = fused_mel_frontend(
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
    # 10·log10(max(mel_power)) over valid frames — one cheap reduce.
    if frame_mask is not None:
        fm = jnp.pad(frame_mask, ((0, 0), (0, mel.shape[1] - frame_mask.shape[1])))
        pmax = jnp.max(
            jnp.where(fm[..., None] > 0, mel.astype(jnp.float32), 0.0), axis=(1, 2)
        )
    else:
        valid = (jnp.arange(mel.shape[1]) < nf)[None, :, None]
        pmax = jnp.max(jnp.where(valid, mel.astype(jnp.float32), 0.0), axis=(1, 2))
    peak = 10.0 * jnp.log10(jnp.maximum(pmax, 1e-10))
    out = mfcc_tail(mel, peak, n_mfcc, blkf=blkf)[:, :nf, :]
    return out[0] if single else out
