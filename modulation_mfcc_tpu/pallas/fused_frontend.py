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

dtype/algorithm modes (the ``algorithm`` knob):
  * 'f32'  — parity mode: HIGHEST-precision MXU passes (on v5e ≈ 4.8 bf16
    passes, measured round 3; ~2e-5 vs the rfft oracle on hardware).
    This meets the ≤1e-4-at-MFCC bar BASELINE.json's parity target names.
  * 'i24'  — fixed-point parity mode: frames are quantized in-kernel to
    24-bit integers (per-utterance scale) and split into three balanced
    int8 digit planes; the windowed-DFT matrix likewise
    (W ≈ (w2·2¹⁶ + w1·2⁸ + w0)/Sw, |err| ≤ 0.5/Sw ≈ 2⁻²⁴·max|W|). The
    windowed DFT is then THREE int8 MXU dots — x2@w2 (K),
    [x2|x1]@[w1;w2] (2K), [x2|x1|x0]@[w0;w1;w2] (3K) — exact int32
    accumulation, recombined in f32 with power-of-two shifts: every digit
    product ≥ 2⁻¹⁶ of full scale is kept, so the total error is
    f32-HIGHEST-grade (2⁻²⁴-class absolute). The mel projection runs as
    x3 (its operands are non-negative, so the 2⁻¹⁷ split error stays
    relative — ~3e-5 dB). MXU cost is 6K int8 MACs; measured on v5e the
    int8 MXU path runs only ~1.17× the bf16 rate through this lowering
    (not the 2× of the spec sheet), which prices i24 at ≈5.1
    bf16-pass-equivalents ≈ the f32 mode's 4.8 — kept as an
    accuracy-equivalent alternative and for hardware where int8 realizes
    its 2× (where it would run ~1.8× the f32 mode).
  * 'i16'  — 16-bit fixed-point mode: EXACT for int16-PCM-origin audio
    (the corpus sweep's upload format; other inputs are 16-bit-quantized
    first). Audio splits into TWO int8 digits (asymmetric high digit +
    offset-corrected low digit, see :func:`_i16_digits`), so the windowed
    DFT is three int8 dots on 5K rows total vs i24's 6K — the cheapest
    ≤1e-4-at-MFCC fixed-point mode, and the headline candidate if int8
    sustains ~2× bf16 (docs/DESIGN.md §8).
  * 'x3'   — middle mode: operands split into bf16 (hi, lo) pairs, 3 MXU
    passes (hi·Whi + hi·Wlo + lo·Whi). ~1.35x the f32 mode's throughput;
    error ≈ 2^-17 relative (≈7e-3 max in the mel-dB domain on noise) —
    fine for feature extraction (its get_MFCCS_change output is ≤2e-5,
    tests/test_pallas_frontend.py), NOT for the strict ≤1e-4 MFCC bar.
  * 'bf16' — corpus throughput mode (BASELINE.json config #5): one MXU pass,
    audio + mel stored bf16, ~0.5 dB-domain error documented.

MXU-shape notes (measured on v5e):
  * the analysis window's zero flanks are trimmed from the contraction
    (win_length < n_fft support only), which also shrinks the frame
    assembly to ceil(win/hop) shifted slices;
  * when fmax > Nyquist every half-open mel bin is live (n_bins =
    n_fft/2+1); the odd bin would pad the DFT output to an extra 128-lane
    tile-pair. Instead the Nyquist-bin REAL column is packed into the
    always-zero im₀ slot and its mel weight remapped onto the zero-weight
    DC power slot — cutting the DFT matmul's output from
    2·roundup(257,128)=768 to 2·256=512 lanes exactly (-33% MXU flops).
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

__all__ = [
    "fused_mel_frontend", "fused_mfcc", "mfcc_tail",
    "hop_rows_geometry", "pack_hop_rows",
]

_TAIL_ROWS = 16  # >= ceil(n_fft/hop) for all supported configs; 8-multiple
_TAIL_W_T = 128  # flat_t tail-window width along the minor rows axis
#                  (Mosaic requires minor-axis blocks in 128 multiples)


def hop_rows_geometry(
    n_samples: int, *, n_fft: int = 512, hop: int = 80,
    win_length: int | None = None, blkf: int | None = None,
) -> tuple[int, int]:
    """(rows_total, eff_pad) of the rows-input contract for ``n_samples``.

    Mirrors fused_mel_frontend's geometry exactly: rows_total =
    ceil(nf/blkf)·blkf + 16 hop-rows (16 spare rows for the tail view),
    with the audio placed at sample offset ``eff_pad`` (librosa centered
    framing, shifted by the trimmed window support). ``blkf=None`` reads
    the live frontend knob so packer and kernel can never disagree."""
    if blkf is None:
        from modulation_mfcc_tpu.pallas.knobs import frontend_knobs

        blkf = frontend_knobs()[0]
    win_length = win_length or n_fft
    pw = (n_fft - win_length) // 2
    eff_pad = n_fft // 2 - pw
    nf = 1 + n_samples // hop
    nj = -(-nf // blkf)
    return nj * blkf + _TAIL_ROWS, eff_pad


def pack_hop_rows(
    audio, *, n_fft: int = 512, hop: int = 80,
    win_length: int | None = None, blkf: int | None = None,
):
    """[B, T] (or [T]) samples → [B, rows_total, hop] padded hop rows, the
    fused frontend's rows-input format (dtype-preserving: int16 rows stay
    int16 and dequantize in-kernel). numpy in → numpy out (the corpus
    assembler's case: the pad memcpy is work it already does per batch);
    jax in → device pad+reshape (the flat path's own prep, useful to build
    an at-rest rows array once outside a timing/serving loop)."""
    single = audio.ndim == 1
    if single:
        audio = audio[None, :]
    b, t = audio.shape
    rows_total, eff_pad = hop_rows_geometry(
        t, n_fft=n_fft, hop=hop, win_length=win_length, blkf=blkf
    )
    if isinstance(audio, np.ndarray):
        out = np.zeros((b, rows_total * hop), dtype=audio.dtype)
        out[:, eff_pad : eff_pad + t] = audio
        return out.reshape(b, rows_total, hop)
    out = jnp.pad(audio, ((0, 0), (eff_pad, rows_total * hop - t - eff_pad)))
    return out.reshape(b, rows_total, hop)


def _mxu(x, w_ref, algorithm: str):
    """One logical matmul under the selected algorithm. ``w_ref`` is stacked
    [n_passes, K, C]: one f32/bf16 plane, or an (hi, lo) bf16 pair for x3."""
    if algorithm == "x3":
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = jnp.dot(hi, w_ref[0], preferred_element_type=jnp.float32)
        out = out + jnp.dot(hi, w_ref[1], preferred_element_type=jnp.float32)
        return out + jnp.dot(lo, w_ref[0], preferred_element_type=jnp.float32)
    prec = (
        jax.lax.Precision.HIGHEST
        if algorithm == "f32"
        else jax.lax.Precision.DEFAULT
    )
    w = w_ref[0]
    return jnp.dot(
        x.astype(w.dtype), w, preferred_element_type=jnp.float32, precision=prec
    )


def _assemble(main_ref, tail_ref, rows_vmem, blkf: int, widths: tuple,
              scale: float = 1.0, rows_t: bool = False):
    """Stage the pipelined main+tail blocks into one contiguous scratch and
    build frames [blkf, K] from shifted sublane slices over the trimmed
    window support (frames[i, k·hop:(k+1)·hop] = rows[i+k, :hop]). One
    contiguous base is required — Mosaic cannot concat views with
    mismatched sublane offsets across two buffers, and the scratch stays
    f32 (bf16 shifted-sublane concat views do not lower on real Mosaic —
    see the row_dtype comment in fused_mel_frontend)."""
    _stage_rows(main_ref, tail_ref, rows_vmem, blkf, scale, rows_t)
    parts = [rows_vmem[k : k + blkf, : widths[k]] for k in range(len(widths))]
    return jnp.concatenate(parts, axis=-1)


def _stage_rows(main_ref, tail_ref, rows_vmem, blkf: int, scale: float = 1.0,
                rows_t: bool = False):
    """Copy the block's main+tail hop-rows into the staging scratch.

    The input rows may be narrower than the scratch (hop < 128: the lane
    pad is NOT materialized in HBM — the physical layout pads it anyway);
    the scratch's pad lanes are zeroed ONCE at the first grid step (they
    persist across steps) so the frame_mode='matmul' variant's full-width
    reads meet zeros, never uninitialized VMEM (0·garbage could be NaN
    against the zero weight rows).

    ``scale`` ≠ 1 applies the transport dequantization during staging —
    int16 hop-row inputs (the rows-input contract) carry raw PCM values
    and stage as v·2⁻¹⁵, an EXACT f32 product (power-of-two scale, int16
    values exact in f32), so every downstream number matches the flat-path
    f32 values bit for bit.

    ``rows_t``: the blocks arrive TRANSPOSED ([hop, blkf] — the flat_t
    layout, which avoids the 80→128 lane pad in HBM: [B, hop, rows] packs
    the minor dim full) and are transposed back during staging (Mosaic 2D
    transpose measured ~free at this shape class, same mechanism as
    _tail_kernel_t). The staged scratch — and every number after it — is
    identical to the plain layout."""
    mv = main_ref[0].astype(rows_vmem.dtype)
    tv = tail_ref[0].astype(rows_vmem.dtype)
    if rows_t:
        # the tail block arrives _TAIL_W_T wide (Mosaic 128-lane minor-axis
        # rule, see _grid_call); only its first _TAIL_ROWS columns are tail
        mv = mv.T
        tv = tv[:, :_TAIL_ROWS].T
    if scale != 1.0:
        mv = mv * scale
        tv = tv * scale
    hw = mv.shape[-1]
    if hw < rows_vmem.shape[-1]:
        @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
        def _init_pad_lanes():
            rows_vmem[:, hw:] = jnp.zeros_like(rows_vmem[:, hw:])

        rows_vmem[:blkf, :hw] = mv
        rows_vmem[blkf:, :hw] = tv
    else:
        rows_vmem[:blkf] = mv
        rows_vmem[blkf:] = tv


def _emit(reim, mel_ref, out_ref, bmax_ref, *, mel_alg: str, out_dtype,
          blkf: int, bins_pad: int, nf: int, base):
    """Shared power→mel→write epilogue: p = re²+im², mel projection, output
    block write, and the per-block max tile over VALID frames only (global
    frame index base+i < nf, nf static). Frames just past nf still window
    real tail samples, so an unmasked max could let a tail transient raise
    the whole utterance's top_db clip floor."""
    re = reim[:, :bins_pad]
    im = reim[:, bins_pad:]
    p = re * re + im * im
    mel = _mxu(p, mel_ref, mel_alg)
    out_ref[0] = mel.astype(out_dtype)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (blkf, 1), 0) + base
    mel_valid = jnp.where(rowid < nf, mel, 0.0)
    bmax_ref[0, 0] = jnp.full((8, 128), jnp.max(mel_valid), dtype=jnp.float32)


def _fold_kernel(main_ref, tail_ref, rmain_ref, rtail_ref, wc_ref, ws_ref,
                 mel_ref, out_ref, bmax_ref, rows_vmem, rrev_vmem, *,
                 blkf: int, hop: int, m: int, re_cols: int, im_cols: int,
                 fold_widths: tuple, nf: int, algorithm: str, out_dtype):
    """Folded real-DFT frontend step (see fused_mel_frontend): the t↔N−t
    pairs of the windowed DFT are pre-added on the VPU (sum feeds the cosine
    basis, difference the sine basis), halving the MXU contraction to
    sup/2+1. The reversed operand comes from the lane-flipped hop-row array
    (built once in XLA), so the in-kernel assembly is the same shifted-slice
    pattern as the forward path — no in-kernel reversal."""
    rows_vmem[:blkf] = main_ref[0].astype(rows_vmem.dtype)
    rows_vmem[blkf:] = tail_ref[0].astype(rows_vmem.dtype)
    rrev_vmem[:blkf] = rmain_ref[0].astype(rrev_vmem.dtype)
    rrev_vmem[blkf:] = rtail_ref[0].astype(rrev_vmem.dtype)
    s_parts, d_parts = [], []
    for k, w_ in enumerate(fold_widths):
        fwd = rows_vmem[k : k + blkf, :w_]
        rev = rrev_vmem[m - 1 - k : m - 1 - k + blkf, :w_]
        s_parts.append(fwd + rev)
        d_parts.append(fwd - rev)
    s = jnp.concatenate(s_parts, axis=-1)
    d = jnp.concatenate(d_parts, axis=-1)
    re = _mxu(s, wc_ref, algorithm)
    im = _mxu(d, ws_ref, algorithm)
    if im_cols < re_cols:
        im = jnp.concatenate(
            [im, jnp.zeros((blkf, re_cols - im_cols), jnp.float32)], axis=-1
        )
    p = re * re + im * im
    mel = _mxu(p, mel_ref, algorithm)
    out_ref[0] = mel.astype(out_dtype)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (blkf, 1), 0) + pl.program_id(1) * blkf
    mel_valid = jnp.where(rowid < nf, mel, 0.0)
    bmax_ref[0, 0] = jnp.full((8, 128), jnp.max(mel_valid), dtype=jnp.float32)


def _int8_weight_planes(w: np.ndarray):
    """Balanced base-256 digit planes of a weight matrix: returns
    ``(w2, w1, w0, Sw)`` int8 arrays with
    ``w ≈ (w2·65536 + w1·256 + w0) / Sw`` exactly to ±0.5/Sw
    (≈ 2⁻²⁴·max|w|). Balanced digits keep every plane in [−128, 127] with
    no carry chains (host-side, f64)."""
    maxw = float(np.max(np.abs(w))) or 1.0
    sw = (127.0 * 65536.0 - 33000.0) / maxw
    r = np.round(np.asarray(w, np.float64) * sw).astype(np.int64)
    w0 = ((r + 128) % 256) - 128
    r1 = (r - w0) // 256
    w1 = ((r1 + 128) % 256) - 128
    w2 = (r1 - w1) // 256
    assert np.abs(w2).max() <= 127, "int8 plane overflow"
    return (
        w2.astype(np.int8),
        w1.astype(np.int8),
        w0.astype(np.int8),
        sw,
    )


def _i24_reim(frames, s, inv, wa_ref, wb_ref, wc_ref):
    """24-bit fixed-point windowed DFT of assembled frames: quantize
    (X = round(x·s), |X| ≤ 2²³−33000, exact in f32), split into three
    balanced int8 digit planes on the VPU, run three int8 MXU dots with
    exact int32 accumulation —
        d1 = x2@w2                  (K  lanes, scale 2³²)
        d2 = [x2|x1]@[w1;w2]        (2K lanes, scale 2²⁴)
        d3 = [x2|x1|x0]@[w0;w1;w2]  (3K lanes, scale 2¹⁶)
    i.e. every digit product ≥ 2⁻¹⁶ of full scale; the dropped
    x1w0/x0w1/x0w0 tail is ≤ 2⁻²⁴-grade, the same class as the f32 path's
    own rounding — and recombine in f32 with power-of-two shifts."""
    x = jnp.round(frames * s)  # 24-bit integers, exact in f32
    # balanced base-256 digits, all exact f32 arithmetic
    q1 = jnp.floor((x + 128.0) * (1.0 / 256.0))
    x0 = x - 256.0 * q1
    q2 = jnp.floor((q1 + 128.0) * (1.0 / 256.0))
    x1 = q1 - 256.0 * q2
    f2 = q2.astype(jnp.int8)
    f1 = x1.astype(jnp.int8)
    f0 = x0.astype(jnp.int8)
    x21 = jnp.concatenate([f2, f1], axis=-1)  # [blkf, 2K]
    x210 = jnp.concatenate([x21, f0], axis=-1)  # [blkf, 3K]
    d1 = jnp.dot(f2, wa_ref[...], preferred_element_type=jnp.int32)
    d2 = jnp.dot(x21, wb_ref[...], preferred_element_type=jnp.int32)
    d3 = jnp.dot(x210, wc_ref[...], preferred_element_type=jnp.int32)
    return (
        d1.astype(jnp.float32) * 4294967296.0
        + d2.astype(jnp.float32) * 16777216.0
        + d3.astype(jnp.float32) * 65536.0
    ) * inv


def _kernel_i24(main_ref, tail_ref, sc_ref, wa_ref, wb_ref, wc_ref, mel_ref,
                out_ref, bmax_ref, rows_vmem, *, blkf: int, bins_pad: int,
                widths: tuple, nf: int, out_dtype, row_scale: float = 1.0,
                rows_t: bool = False):
    """Fixed-point frontend step (algorithm='i24', see module docstring and
    :func:`_i24_reim`). ``sc_ref[b] = (s_b, 1/(s_b·Sw))`` carries the
    per-utterance quantization scale in and the true scale back out. The
    mel projection runs as x3 (non-negative operands keep the 2⁻¹⁷ split
    error relative)."""
    frames = _assemble(main_ref, tail_ref, rows_vmem, blkf, widths, row_scale,
                       rows_t)
    b = pl.program_id(0)
    reim = _i24_reim(frames, sc_ref[b, 0], sc_ref[b, 1], wa_ref, wb_ref, wc_ref)
    _emit(reim, mel_ref, out_ref, bmax_ref, mel_alg="x3", out_dtype=out_dtype,
          blkf=blkf, bins_pad=bins_pad, nf=nf, base=pl.program_id(1) * blkf)


def _kernel_i24_pipe(main_ref, tail_ref, sc_ref, wa_ref, wb_ref, wc_ref,
                     mel_ref, out_ref, bmax_ref, rows_vmem, reim_vmem, *,
                     blkf: int, nj: int, bins_pad: int, widths: tuple,
                     nf: int, out_dtype, row_scale: float = 1.0,
                     rows_t: bool = False):
    """Two-stage pipelined i24 frontend (same schedule as :func:`_kernel_pipe`):
    stage A quantizes/digit-splits block j and runs the three int8 dots +
    f32 recombination into the parity-(j%2) reim scratch half; stage B does
    power + mel + write for block j−1 from the other half. The i24 step's
    serial VPU load (digit split + recombination) is the heaviest of all
    modes, so decoupling it from the block's own MXU matters most here.
    Bit-identical to :func:`_kernel_i24` per block."""
    j = pl.program_id(1)

    @pl.when(j > 0)
    def _stage_b():
        _emit(reim_vmem[(j - 1) % 2], mel_ref, out_ref, bmax_ref,
              mel_alg="x3", out_dtype=out_dtype, blkf=blkf, bins_pad=bins_pad,
              nf=nf, base=(j - 1) * blkf)

    @pl.when(j < nj)
    def _stage_a():
        frames = _assemble(main_ref, tail_ref, rows_vmem, blkf, widths,
                           row_scale, rows_t)
        b = pl.program_id(0)
        reim_vmem[j % 2] = _i24_reim(
            frames, sc_ref[b, 0], sc_ref[b, 1], wa_ref, wb_ref, wc_ref
        )


def _i16_digits(frames, s):
    """16-bit fixed-point digit split (algorithm='i16'): X = clip(round(x·s))
    ∈ [−32768, 32767], X = x1·256 + (x0s + 128) with x1 = floor(X/256) ∈
    [−128, 127] (asymmetric high digit — covers the full int16 range where
    a balanced split would need x1 = 128) and x0s ∈ [−128, 127]. The +128
    offset of the low digit is a CONSTANT, folded into a precomputed
    per-column correction vector instead of a third digit plane. Exact
    whenever x·s is integral — int16-PCM-origin audio under the
    power-of-two per-utterance scale (see fused_mel_frontend); other
    inputs are 16-bit-quantized (round) rather than truncated."""
    x = jnp.clip(jnp.round(frames * s), -32768.0, 32767.0)
    x1 = jnp.floor(x * (1.0 / 256.0))
    x0s = x - 256.0 * x1 - 128.0
    return x1.astype(jnp.int8), x0s.astype(jnp.int8)


def _i16_reim(frames, s, inv, corr_ref, wa_ref, wb_ref, wc_ref):
    """16-bit fixed-point windowed DFT: X = x1·2⁸ + x0f against
    W·Sw = w2·2¹⁶ + w1·2⁸ + w0, keeping every digit product ≥ 2⁻²⁴ of the
    utterance's scale as THREE int8 dots on FIVE K-rows total (vs i24's
    six):
        d1 = x1@w2              (K,  scale 2²⁴)
        d2 = [x1|x0s]@[w1;w2]   (2K, scale 2¹⁶)
        d3 = [x1|x0s]@[w0;w1]   (2K, scale 2⁸ — same LHS concat as d2)
    plus corr[col] = 128·Σ_k round(W[k,col]·Sw) for the low digit's +128
    offset (host-precomputed). The dropped x0s·w0 term is ≤ 2⁷·2⁷ per
    element = 2⁻²³..2⁻²⁴ of the per-utterance full scale, and it stays
    incoherent across k even in the worst data case: when the power-of-two
    lift makes X an exact multiple of 256 (quiet int16 audio) x0s is the
    CONSTANT −128, but w0 — the low digit of the weight planes — is
    sign-random across rows, so the per-column error is 128·|Σ_k w0[k,c]|,
    a random walk, not 128·Σ_k|w0[k,c]|. Measured on the pinned −60 dBFS
    fixture (that worst case): worst-mel relative error 1.4e-4, of which
    the f32 rounding floor is 6.8e-5 — i.e. the dropped term costs one
    f32-grade unit, ≤ ~8e-5 per MFCC coefficient, inside the ≤1e-4
    budget. A 4th x0s@w0 dot restoring the exact product measured 7.0e-5
    total but costs a 6th K-row (the i24 price) — rejected; the
    quiet-audio test pins the 2e-4 mel bound."""
    f1, f0 = _i16_digits(frames, s)
    x10 = jnp.concatenate([f1, f0], axis=-1)  # [blkf, 2K]
    d1 = jnp.dot(f1, wa_ref[...], preferred_element_type=jnp.int32)
    d2 = jnp.dot(x10, wb_ref[...], preferred_element_type=jnp.int32)
    d3 = jnp.dot(x10, wc_ref[...], preferred_element_type=jnp.int32)
    return (
        d1.astype(jnp.float32) * 16777216.0
        + d2.astype(jnp.float32) * 65536.0
        + d3.astype(jnp.float32) * 256.0
        + corr_ref[0:1, :]
    ) * inv


def _kernel_i16(main_ref, tail_ref, sc_ref, corr_ref, wa_ref, wb_ref, wc_ref,
                mel_ref, out_ref, bmax_ref, rows_vmem, *, blkf: int,
                bins_pad: int, widths: tuple, nf: int, out_dtype,
                row_scale: float = 1.0, rows_t: bool = False):
    """16-bit fixed-point frontend step (algorithm='i16', see
    :func:`_i16_reim`). Exact for int16-origin audio (the corpus sweep's
    upload format) at any level; arbitrary f32 audio is 16-bit-quantized
    relative to the utterance max first (i24 is the full-precision
    fixed-point mode)."""
    frames = _assemble(main_ref, tail_ref, rows_vmem, blkf, widths, row_scale,
                       rows_t)
    b = pl.program_id(0)
    reim = _i16_reim(frames, sc_ref[b, 0], sc_ref[b, 1], corr_ref,
                     wa_ref, wb_ref, wc_ref)
    _emit(reim, mel_ref, out_ref, bmax_ref, mel_alg="x3", out_dtype=out_dtype,
          blkf=blkf, bins_pad=bins_pad, nf=nf, base=pl.program_id(1) * blkf)


def _kernel_i16_pipe(main_ref, tail_ref, sc_ref, corr_ref, wa_ref, wb_ref,
                     wc_ref, mel_ref, out_ref, bmax_ref, rows_vmem,
                     reim_vmem, *, blkf: int, nj: int, bins_pad: int,
                     widths: tuple, nf: int, out_dtype,
                     row_scale: float = 1.0, rows_t: bool = False):
    """Two-stage pipelined :func:`_kernel_i16` (schedule of _kernel_pipe)."""
    j = pl.program_id(1)

    @pl.when(j > 0)
    def _stage_b():
        _emit(reim_vmem[(j - 1) % 2], mel_ref, out_ref, bmax_ref,
              mel_alg="x3", out_dtype=out_dtype, blkf=blkf, bins_pad=bins_pad,
              nf=nf, base=(j - 1) * blkf)

    @pl.when(j < nj)
    def _stage_a():
        frames = _assemble(main_ref, tail_ref, rows_vmem, blkf, widths,
                           row_scale, rows_t)
        b = pl.program_id(0)
        reim_vmem[j % 2] = _i16_reim(
            frames, sc_ref[b, 0], sc_ref[b, 1], corr_ref, wa_ref, wb_ref,
            wc_ref
        )


def _kernel(main_ref, tail_ref, wri_ref, mel_ref, out_ref, bmax_ref, rows_vmem,
            *, blkf: int, hop: int, lane: int, bins_pad: int, widths: tuple,
            nf: int, algorithm: str, out_dtype, frame_mode: str = "concat",
            row_scale: float = 1.0, rows_t: bool = False):
    if frame_mode == "concat":
        frames = _assemble(main_ref, tail_ref, rows_vmem, blkf, widths,
                           row_scale, rows_t)
        reim = _mxu(frames, wri_ref, algorithm)
    else:
        # frames @ W == Σ_k rows[k:k+blkf] @ W_k (W_k = rows of W for hop-
        # chunk k, zero-padded to the lane width): no frame materialization
        # (_stage_rows zeroes the scratch's pad lanes once, so the
        # full-width lhs reads below meet zeros against the zero W rows)
        _stage_rows(main_ref, tail_ref, rows_vmem, blkf, row_scale)
        reim = jnp.zeros((blkf, 2 * bins_pad), dtype=jnp.float32)
        for k in range(len(widths)):
            lhs = rows_vmem[k : k + blkf, :]
            reim = reim + _mxu(
                lhs, wri_ref[:, k * lane : (k + 1) * lane, :], algorithm
            )
    _emit(reim, mel_ref, out_ref, bmax_ref, mel_alg=algorithm,
          out_dtype=out_dtype, blkf=blkf, bins_pad=bins_pad, nf=nf,
          base=pl.program_id(1) * blkf)


def _kernel_pipe(main_ref, tail_ref, wri_ref, mel_ref, out_ref, bmax_ref,
                 rows_vmem, reim_vmem, *, blkf: int, nj: int, bins_pad: int,
                 widths: tuple, nf: int, algorithm: str, out_dtype,
                 row_scale: float = 1.0, rows_t: bool = False):
    """Two-stage software-pipelined frontend step (grid j ∈ [0, nj]):

      stage A (j < nj):  assemble frames for block j → windowed-DFT matmul
                         into the parity-(j%2) half of the reim scratch;
      stage B (j > 0):   power + mel + write for block j−1 from the other
                         scratch half.

    Splitting the serial VPU→MXU→VPU→MXU chain of `_kernel` across two grid
    steps removes the in-step data dependency between the DFT matmul and the
    power/mel stage: block j's DFT (MXU) and block j−1's power (VPU) touch
    disjoint scratch halves, so the scheduler is free to overlap them. The
    emitted numbers are the exact same ops in the exact same order per block
    — bit-identical to `_kernel` (tests pin this in interpret mode). Stage B
    runs first in program order: it reads the parity the previous step
    wrote, while stage A overwrites the other half."""
    j = pl.program_id(1)

    @pl.when(j > 0)
    def _stage_b():
        _emit(reim_vmem[(j - 1) % 2], mel_ref, out_ref, bmax_ref,
              mel_alg=algorithm, out_dtype=out_dtype, blkf=blkf,
              bins_pad=bins_pad, nf=nf, base=(j - 1) * blkf)

    @pl.when(j < nj)
    def _stage_a():
        frames = _assemble(main_ref, tail_ref, rows_vmem, blkf, widths,
                           row_scale, rows_t)
        reim_vmem[j % 2] = _mxu(frames, wri_ref, algorithm)


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
    algorithm: str | None = None,
    fold: bool | None = None,
    pipeline: bool = False,
    flat_t: bool = False,
    n_samples: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(mel [B, NF_pad, n_mels], block_maxes [B, nj, 8, 128]) for audio [B, T].

    NF_pad rounds the librosa frame count up to a block multiple; callers
    slice [:, :nf]. Centered framing (librosa center=True, zero pad).
    ``algorithm`` ∈ {'f32', 'x3', 'bf16'} (see module docstring); defaults
    from ``compute_dtype`` for backward compatibility.

    **Rows input (the zero-prep contract, r4):** a 3-D ``audio`` is taken
    as PRE-LAID-OUT hop rows [B, rows_total, hop] built by
    :func:`pack_hop_rows` (centered-framing pad already applied;
    ``n_samples`` = the true per-utterance sample count is then required).
    The kernel consumes the rows directly — none of the flat path's
    pad/cast/hop-row-relayout XLA passes run (~2.3 ms/batch of pure data
    movement on the 128×30 s flagship, docs/DESIGN.md §8). Transport dtype
    is the array's own: int16 rows carry raw PCM values and are
    dequantized (·2⁻¹⁵, exact) during the VMEM staging copy, so f32-grade
    modes are BIT-IDENTICAL to the flat path on the same values; bf16-mode
    rows skip the flat path's bf16 pre-rounding of the samples (same or
    better accuracy, not bit-identical). This is the corpus-sweep format:
    the host assembles padded int16 rows for free while batching (the pad
    memcpy it already does), and the at-rest device array is what every
    batch reads.

    ``fold`` enables the folded real-DFT: the t↔N−t symmetry of the real
    input turns the windowed DFT into a cosine matmul on y[t]+y[N−t] and a
    sine matmul on y[t]−y[N−t], HALVING the MXU contraction (K = sup/2+1
    instead of sup). The pre-add needs the reversed samples — produced once
    in XLA as a lane-flipped hop-row array (Mosaic has no in-kernel lane
    reversal). Measured on v5e the fold LOSES despite the tile savings (the
    second input stream + staging copy + split matmuls outweigh it:
    16 kHz f32 24.2→24.6 ms, 10 kHz f32 16.7→20.4 ms per 128×30 s batch),
    so it defaults OFF; the path is kept tested for geometries/hardware
    where the MXU:bandwidth ratio differs.

    ``pipeline`` selects the two-stage software-pipelined kernels
    (:func:`_kernel_pipe` / :func:`_kernel_i24_pipe` / :func:`_kernel_i16_pipe`):
    block j's DFT matmul and block j−1's power/mel run in the same grid
    step on disjoint scratch halves, freeing the scheduler to overlap MXU
    and VPU work the plain kernels serialize. Bit-identical outputs for
    every algorithm (concat frame mode, no fold).

    ``flat_t`` (flat-input concat mode only) relayouts the padded audio to
    TRANSPOSED hop rows [B, hop, rows_total] in XLA and transposes back
    during the VMEM staging copy (docs/DESIGN.md §8 round 5): the plain
    [B, rows, hop] layout lane-pads the hop-wide minor dim to 128
    physically (hop=80 → 1.6× audio bytes through HBM on the relayout
    write AND on every kernel block fetch), while rows_total as the minor
    dim packs full. Staged scratch and all outputs are bit-identical to
    the plain path (verified bitwise on v5e, all algorithms). Default via
    MODMFCC_FLAT_T=auto: ON for the f32-staged algorithms (f32/x3/i24 —
    measured +13% f32, median-win x3, wash i24), OFF for bf16/i16 whose
    narrower staging dtypes already halve the lane-pad traffic and
    measured slower transposed (v5e A/B 2026-08-20, DESIGN §8 round 5).
    """
    if algorithm is None:
        algorithm = "bf16" if compute_dtype == jnp.bfloat16 else "f32"
    if fold is None:
        fold = False
    if audio.ndim == 1:
        audio = audio[None, :]
    rows_in = audio.ndim == 3
    if rows_in:
        if n_samples is None:
            raise ValueError("rows input [B, rows, hop] requires n_samples")
        if audio.shape[-1] != hop:
            raise ValueError(
                f"rows input minor dim {audio.shape[-1]} != hop {hop}"
            )
        if fold:
            raise ValueError("fold=True unsupported with rows input")
    if hop > 128 and hop % 128:
        raise ValueError(f"hop {hop} > 128 must be a multiple of 128")
    win_length = win_length or n_fft
    # the analysis window is zero outside its centered win_length support
    # (librosa pad_center) — trim those rows from the contraction and shift
    # the hop-row grid so the support starts at row offset 0
    pw = (n_fft - win_length) // 2
    sup = win_length
    n_shift = -(-sup // hop)
    if n_shift > _TAIL_ROWS:
        raise ValueError(f"win/hop ratio {n_shift} exceeds tail buffer {_TAIL_ROWS}")
    fold_ok = (
        frame_mode == "concat"
        and sup % hop == 0
        and sup % 2 == 0
        and sup // hop <= _TAIL_ROWS
        and (n_fft // 2 - pw) >= 1
    )
    if blkf <= 0 or blkf % _TAIL_ROWS:
        raise ValueError(
            f"blkf {blkf} must be a positive multiple of {_TAIL_ROWS} "
            "(tail-block stride granularity — a non-multiple silently "
            "mis-assembles frames near block boundaries)"
        )
    if pipeline and (fold or frame_mode != "concat"):
        raise ValueError("pipeline=True requires concat frame mode, no fold")
    if flat_t and (rows_in or fold or frame_mode != "concat"):
        raise ValueError(
            "flat_t=True requires flat audio input, concat frame mode, no "
            "fold (rows input already has its layout at rest)"
        )
    if fold:
        if not fold_ok or algorithm in ("i24", "i16"):
            raise ValueError("fold=True unsupported for this geometry/algorithm")
        return _folded_frontend(
            audio, sr=sr, n_fft=n_fft, hop=hop, sup=sup, pw=pw, n_mels=n_mels,
            fmin=fmin, fmax=fmax, blkf=blkf, algorithm=algorithm,
            out_dtype=out_dtype,
        )
    widths = tuple(min(hop, sup - k * hop) for k in range(n_shift))
    if rows_in:
        bsz, t = audio.shape[0], int(n_samples)
    else:
        bsz, t = audio.shape
    pad = n_fft // 2
    eff_pad = pad - pw  # left padding so frame f's SUPPORT starts at f*hop
    nf = 1 + t // hop
    nj = -(-nf // blkf)
    nf_pad = nj * blkf
    lane = max(hop, 128)
    # hop-rows + _TAIL_ROWS spare so the tail view of the last step is in
    # range (Pallas blocks only WINDOW the operand — the rows dim need not
    # divide blkf; a full spare block here cost 17% extra audio pad/traffic
    # on the 30 s flagship and +17% upload bytes on the rows contract, r4)
    rows_total = nj * blkf + _TAIL_ROWS
    if flat_t:
        if blkf % _TAIL_W_T:
            raise ValueError(
                f"flat_t=True requires blkf to be a multiple of {_TAIL_W_T} "
                f"(128-wide tail windows step in blkf/{_TAIL_W_T} block "
                f"units), got {blkf}"
            )
        # the transposed layout fetches _TAIL_W_T-wide tail windows (Mosaic
        # minor-axis rule, _grid_call) — keep the last window in range
        rows_total = nj * blkf + _TAIL_W_T
    total = rows_total * hop
    row_scale = 1.0
    if rows_in:
        if audio.shape[1] != rows_total:
            raise ValueError(
                f"rows input has {audio.shape[1]} rows, geometry needs "
                f"{rows_total} (n_samples={t}, hop={hop}, blkf={blkf}) — "
                "build with pack_hop_rows using the same geometry"
            )
        if audio.dtype == jnp.int16:
            # raw PCM values dequantize during the VMEM staging copy
            # (·2⁻¹⁵ is exact — see _stage_rows)
            row_scale = float(2.0**-15)

    def _kernel_view():
        """Samples exactly as the kernels will see them (post staging
        dequant) for the fixed-point modes' per-utterance scale reductions.
        Under jit the convert/abs/scale fuse into the reduce — one
        read-only pass, no materialized f32 copy. Rows input includes the
        centered-framing pad zeros, which cannot raise an abs max (and the
        signed bounds below only ever tighten the same way on both paths)."""
        if rows_in:
            return audio.astype(jnp.float32) * row_scale
        return audio.astype(jnp.float32)

    _red_axes = (1, 2) if rows_in else (1,)
    i24_scale = None
    if algorithm == "i24":
        # per-utterance 24-bit quantization scale; the actual rounding and
        # digit split happen in-kernel on the assembled frames (see
        # _kernel_i24), so the audio transport stays plain f32 rows
        amax = jnp.max(jnp.abs(_kernel_view()), axis=_red_axes).reshape(bsz, 1)
        i24_scale = (127.0 * 65536.0 - 33000.0) / jnp.maximum(amax, 1e-20)
    if rows_in:
        audio_p = audio
    else:
        # NOTE r4: reformulating this prep chain (concat-instead-of-pad,
        # cast-before/after-pad) measured a wash on v5e (9.75/9.85/9.86/9.93
        # ms/batch end-to-end) — XLA canonicalizes all four to the same
        # program. The residual ~2.3 ms of pad/convert/relayout around the
        # kernel cannot move by jnp rephrasing — it is gone only on the
        # rows-input path above, where the layout exists at rest.
        audio_p = jnp.pad(audio, ((0, 0), (eff_pad, total - t - eff_pad)))
        if algorithm == "bf16":
            # corpus mode: bf16 samples at rest halve audio HBM traffic and
            # the VMEM staging copy (consistent with the mode's documented
            # accuracy)
            audio_p = audio_p.astype(jnp.bfloat16)
        audio_p = audio_p.reshape(bsz, rows_total, hop)
        if flat_t:
            # transposed hop rows [B, hop, rows_total]: the relayout write
            # and every kernel fetch move 1.0× audio bytes instead of the
            # plain layout's physical-lane-pad 128/hop× (see docstring);
            # _stage_rows transposes back during the VMEM staging copy
            audio_p = jnp.swapaxes(audio_p, 1, 2)
    # NO explicit lane pad hop→128: the TPU physical layout of the hop-wide
    # minor dim is lane-padded anyway, the kernels only ever read the first
    # ``hop`` lanes of each staged row (widths ≤ hop), and the scratch's
    # pad lanes are zero-initialized in-kernel once. Dropping the pad
    # removes one full [B, rows, 128] HBM copy pass (~0.6 ms of the
    # flagship's 8.4 ms device time, profiled r3 session 8).

    wr, wi = dft_bases(n_fft, "hann", win_length)
    n_bins_full = wr.shape[1]
    wr = wr[pw : pw + sup]
    wi = wi[pw : pw + sup]
    m_full = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    # drop trailing FFT bins with all-zero mel weight (e.g. the Nyquist bin
    # when fmax <= sr/2): they cannot affect the mel output, and trimming
    # 257→256 bins avoids a whole extra 128-lane tile in the DFT matmuls.
    nz = np.flatnonzero(np.abs(m_full).sum(axis=0) > 0)
    n_bins = int(nz[-1]) + 1 if nz.size else n_bins_full
    half = n_fft // 2
    # rfft packing (module docstring): with every bin live (fmax > Nyquist),
    # park the Nyquist REAL column in the always-zero im₀ slot and remap its
    # mel weight onto the (zero-weight) DC power slot. Needs the DC bin to
    # be mel-silent (fmin above bin 1) so zeroing its re column is free.
    packed = (
        n_bins == half + 1
        and half % 128 == 0
        and nz.size
        and int(nz[0]) >= 1
    )
    if packed:
        bins_pad = half
        wr_eff = wr[:, :half].copy()
        wr_eff[:, 0] = 0.0  # DC power must not pollute the Nyquist slot
        wi_eff = wi[:, :half].copy()
        wi_eff[:, 0] = wr[:, half]  # Nyquist re rides the im₀ column
        m_p = np.zeros((bins_pad, n_mels), np.float32)
        m_p[:half, :] = m_full.T[:half]
        m_p[0, :] = m_full.T[half]  # DC power slot now carries Nyquist power
    else:
        bins_pad = round_up_to_multiple(n_bins, 128)
        wr_eff = wr[:, :n_bins]
        wi_eff = wi[:, :n_bins]
        m_p = np.zeros((bins_pad, n_mels), np.float32)
        m_p[:n_bins, :] = m_full.T[:n_bins]
    ncol = wr_eff.shape[1]
    if frame_mode == "concat":
        K = sum(widths)
        wri_p = np.zeros((K, 2 * bins_pad), np.float32)
        row = 0
        for k in range(n_shift):
            w_ = widths[k]
            wri_p[row : row + w_, :ncol] = wr_eff[k * hop : k * hop + w_]
            wri_p[row : row + w_, bins_pad : bins_pad + ncol] = wi_eff[k * hop : k * hop + w_]
            row += w_
    else:
        # per-hop-chunk base rows at lane stride (zero rows over the pad)
        wri_p = np.zeros((n_shift * lane, 2 * bins_pad), np.float32)
        for c in range(n_shift):
            w_ = widths[c]
            wri_p[c * lane : c * lane + w_, :ncol] = wr_eff[c * hop : c * hop + w_]
            wri_p[c * lane : c * lane + w_, bins_pad : bins_pad + ncol] = wi_eff[c * hop : c * hop + w_]

    if algorithm in ("i24", "i16"):
        if frame_mode != "concat":
            raise ValueError(f"algorithm={algorithm!r} requires frame_mode='concat'")
        w2, w1, w0, sw = _int8_weight_planes(wri_p)
        wa = jnp.asarray(w2)
        wb = jnp.asarray(np.concatenate([w1, w2], axis=0))
        mel_in = _stack_weights(m_p, "x3")
        sc_spec = pl.BlockSpec((bsz, 2), lambda b, j: (0, 0), memory_space=pltpu.SMEM)
        if algorithm == "i24":
            wc = jnp.asarray(np.concatenate([w0, w1, w2], axis=0))
            sc = jnp.concatenate(
                [i24_scale, 1.0 / (i24_scale * sw)], axis=-1
            ).astype(jnp.float32)  # [bsz, 2]: (s, 1/(s·Sw))
            extra_ops = [sc, wa, wb, wc, mel_in]
            kern_fn = _kernel_i24_pipe if pipeline else _kernel_i24
        else:
            wc = jnp.asarray(np.concatenate([w0, w1], axis=0))  # 2K, not 3K
            # per-utterance POWER-OF-TWO scale: the largest s = 2^k with
            # max(x)·s ≤ 32767 and −min(x)·s ≤ 32768 (the digit split's
            # asymmetric int16 range — x1 = −128, x0s = −128 encodes
            # −32768, so the NEGATIVE bound is a full 2¹⁵; sizing by
            # max|x| ≤ 32767 instead drops to s = 16384 whenever a −32768
            # sample is present and puts every odd PCM value on a
            # half-integer — a 2.2e-3 MFCC regression the parity test
            # caught). Power-of-two keeps the quantization EXACT for
            # int16-origin audio at ANY level (x·32768 integral ⇒
            # x·2^k·32768 integral, k ≥ 15 since max|x| ≤ 1), and lifts
            # quiet utterances so the 16-bit quantization of arbitrary f32
            # audio is relative to the UTTERANCE's own scale (a fixed
            # s = 32768 quantized −60 dBFS material at full-scale-absolute
            # step size; tests pin the quiet case). Full-scale int16 audio
            # gets exactly s = 32768 (k = 15 on the /32768 normalization),
            # i.e. the identity digit split.
            af = _kernel_view()
            pmax = jnp.max(af, axis=_red_axes).reshape(bsz, 1)
            nmax = -jnp.min(af, axis=_red_axes).reshape(bsz, 1)
            amax = jnp.maximum(pmax, nmax)
            # frexp/ldexp, NOT exp2(floor(log2(·))): f32 log2/exp2 are
            # transcendental approximations and are NOT exact at integer
            # points on XLA backends (measured: exp2(15.0) → 32767.984 on
            # CPU) — a non-power-of-two s destroys the exactness property
            # this mode exists for. frexp(r) = (m, e), m ∈ [0.5, 1), so
            # the largest power of two ≤ r is 2^(e−1) — all exact bit ops.
            ratio = 32768.0 / jnp.maximum(amax, 1e-30)
            s16 = jnp.ldexp(jnp.float32(1.0), jnp.frexp(ratio)[1] - 1)
            # f32 division slop guard (ratio rounding up across a power of
            # two): halve wherever either signed bound trips
            over = (pmax * s16 > 32767.0) | (nmax * s16 > 32768.0)
            s16 = jnp.where(over, s16 * 0.5, s16)
            s16 = jnp.minimum(s16, 2.0**60)  # silence: bounded scale, zero output
            sc = jnp.concatenate([s16, 1.0 / (s16 * sw)], axis=-1).astype(jnp.float32)
            # low-digit +128 offset: corr[col] = 128·Σ_k round(W[k,col]·Sw)
            # (= 128·Σ_k (w2·2¹⁶ + w1·2⁸ + w0), exact integers in f64)
            r_int = (
                w2.astype(np.float64) * 65536.0
                + w1.astype(np.float64) * 256.0
                + w0.astype(np.float64)
            )
            corr = np.zeros((8, 2 * bins_pad), np.float32)
            corr[0, :] = (128.0 * r_int.sum(axis=0)).astype(np.float32)
            extra_ops = [sc, jnp.asarray(corr), wa, wb, wc, mel_in]
            kern_fn = _kernel_i16_pipe if pipeline else _kernel_i16
        extra_specs = [sc_spec] + [
            pl.BlockSpec(op.shape, (lambda b, j: (0, 0, 0)) if op.ndim == 3 else (lambda b, j: (0, 0)), memory_space=pltpu.VMEM)
            for op in extra_ops[1:]
        ]
        kw = dict(blkf=blkf, bins_pad=bins_pad, widths=widths, nf=nf,
                  out_dtype=out_dtype, row_scale=row_scale, rows_t=flat_t)
        if pipeline:
            kw["nj"] = nj
        return _launch(
            partial(kern_fn, **kw), pipelined=pipeline, audio_p=audio_p,
            extra_ops=extra_ops, extra_specs=extra_specs, bsz=bsz, nj=nj,
            blkf=blkf, lane=lane, n_mels=n_mels, nf_pad=nf_pad,
            out_dtype=out_dtype, row_dtype=jnp.float32, bins_pad=bins_pad,
            rows_t=flat_t,
        )

    wri_in = _stack_weights(wri_p, algorithm)
    mel_in = _stack_weights(m_p, algorithm)
    # staging scratch stays f32 in EVERY mode: real Mosaic (v5e, measured
    # r3 session 8) rejects the frame concat over bf16 shifted-sublane
    # views ("result/input offset mismatch on non-concat dimension" — the
    # 16-bit packing pairs sublanes, so the k-offset views that are legal
    # at f32's 8-row granularity are not addressable at bf16's); the f32
    # round-trip is exact on bf16 values, so numbers are unchanged either
    # way and only interpret mode ever accepted the bf16-staged variant.
    row_dtype = jnp.float32
    extra_ops = [wri_in, mel_in]
    extra_specs = [
        pl.BlockSpec(wri_in.shape, lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(mel_in.shape, lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
    ]
    if pipeline:
        kern = partial(
            _kernel_pipe, blkf=blkf, nj=nj, bins_pad=bins_pad, widths=widths,
            nf=nf, algorithm=algorithm, out_dtype=out_dtype,
            row_scale=row_scale, rows_t=flat_t,
        )
    else:
        kern = partial(
            _kernel, blkf=blkf, hop=hop, lane=lane, bins_pad=bins_pad,
            widths=widths, nf=nf, algorithm=algorithm, out_dtype=out_dtype,
            frame_mode=frame_mode, row_scale=row_scale, rows_t=flat_t,
        )
    return _launch(
        kern, pipelined=pipeline, audio_p=audio_p, extra_ops=extra_ops,
        extra_specs=extra_specs, bsz=bsz, nj=nj, blkf=blkf, lane=lane,
        n_mels=n_mels, nf_pad=nf_pad, out_dtype=out_dtype,
        row_dtype=row_dtype, bins_pad=bins_pad, rows_t=flat_t,
    )


def _launch(kern, *, pipelined, audio_p, extra_ops, extra_specs, bsz, nj,
            blkf, lane, n_mels, nf_pad, out_dtype, row_dtype, bins_pad,
            rows_t: bool = False):
    """Build and run one frontend pallas_call — the single home of the
    grid/BlockSpec geometry shared by every algorithm (code-review r3s6:
    this was triplicated and would silently diverge under maintenance).

    Plain: grid (bsz, nj), block j reads its own main+tail rows and writes
    block j. Pipelined: grid (bsz, nj+1); the main/tail index maps clamp at
    the last real block (the clamped revisit elides the re-fetch) and the
    output index maps TRAIL the grid by one step (block j−1 is emitted at
    step j; Pallas flushes an output buffer when its block index changes,
    so the j=0 write — skipped by the kernel's stage guard — is never
    observed). Scratch: rows staging in the transport dtype, plus the
    pipelined two-parity reim buffer."""
    row_w = audio_p.shape[-1]  # hop-wide rows: the lane pad is implicit
    # rows_t: audio_p is TRANSPOSED hop rows [B, hop, rows_total] — block
    # windows move along the (physically packed) minor rows axis and the
    # kernel transposes back during VMEM staging (_stage_rows rows_t=True).
    # Block-index helpers: (rows-axis window index) → 3-D block index.
    if rows_t:
        hop_w = audio_p.shape[1]
        main_shape = (1, hop_w, blkf)
        # Mosaic rejects a 16-wide minor-axis block ("last two dimensions
        # ... divisible by 8 and 128" — measured on v5e, r5; interpret mode
        # does not enforce it). Fetch a 128-wide tail window whose first
        # _TAIL_ROWS columns are the tail rows; fused_mel_frontend pads the
        # transposed rows axis to nj·blkf+_TAIL_W_T so the last window is
        # in range. tail_stride is then in 128-row block units.
        tail_shape = (1, hop_w, _TAIL_W_T)
        tail_stride = blkf // _TAIL_W_T
        _ix = lambda b, r: (b, 0, r)  # noqa: E731
    else:
        main_shape = (1, blkf, row_w)
        tail_shape = (1, _TAIL_ROWS, row_w)
        tail_stride = blkf // _TAIL_ROWS
        _ix = lambda b, r: (b, r, 0)  # noqa: E731
    if pipelined:
        grid = (bsz, nj + 1)
        main_spec = pl.BlockSpec(
            main_shape, lambda b, j: _ix(b, jnp.minimum(j, nj - 1)),
            memory_space=pltpu.VMEM,
        )
        tail_spec = pl.BlockSpec(
            tail_shape,
            lambda b, j: _ix(b, jnp.minimum(j + 1, nj) * tail_stride),
            memory_space=pltpu.VMEM,
        )
        out_specs = [
            pl.BlockSpec(
                (1, blkf, n_mels), lambda b, j: (b, jnp.maximum(j - 1, 0), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 8, 128), lambda b, j: (b, jnp.maximum(j - 1, 0), 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        scratch = [
            pltpu.VMEM((blkf + _TAIL_ROWS, lane), row_dtype),
            pltpu.VMEM((2, blkf, 2 * bins_pad), jnp.float32),
        ]
    else:
        grid = (bsz, nj)
        main_spec = pl.BlockSpec(
            main_shape, lambda b, j: _ix(b, j), memory_space=pltpu.VMEM
        )
        tail_spec = pl.BlockSpec(
            tail_shape,
            lambda b, j: _ix(b, (j + 1) * tail_stride),
            memory_space=pltpu.VMEM,
        )
        out_specs = [
            pl.BlockSpec((1, blkf, n_mels), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
        ]
        scratch = [pltpu.VMEM((blkf + _TAIL_ROWS, lane), row_dtype)]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[main_spec, tail_spec] + extra_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nf_pad, n_mels), out_dtype),
            jax.ShapeDtypeStruct((bsz, nj, 8, 128), jnp.float32),
        ],
        scratch_shapes=scratch,
    )(audio_p, audio_p, *extra_ops)


def _folded_frontend(
    audio, *, sr, n_fft, hop, sup, pw, n_mels, fmin, fmax, blkf, algorithm,
    out_dtype,
):
    """Folded real-DFT mel frontend (see fused_mel_frontend docstring).

    Index conventions (validated against numpy rfft to 1e-12):
      z            = audio padded by eff_pad = n_fft/2 − pw on the left;
                     frame f's window SUPPORT is z[f·hop : f·hop+sup].
      rows[r][l]   = z[r·hop + l]                     (forward hop-rows)
      rows_rev[r][λ] = z[r·hop + hop − λ]             (lane-flipped, 1-shift)
      fold data    s/d[u] = z[a+u] ± z[a+sup−u], u ∈ [0, sup/2]; the u=0
                   term carries window weight 0 (periodic Hann) and the
                   u=sup/2 self-point gets a 0.5 cosine weight.
      bases        C[u,b] = w[u]·cos(2πb(u+pw)/N) (·0.5 at u=sup/2),
                   S[u,b] = −w[u]·sin(2πb(u+pw)/N).
    When fmax > Nyquist (all bins live) the Nyquist column is packed into
    the zero-weight DC column of the cosine matmul (both are re-only), so
    re_cols stays at n_fft/2.
    """
    bsz, t = audio.shape
    pad = n_fft // 2
    eff_pad = pad - pw
    m = sup // hop
    nf = 1 + t // hop
    nj = -(-nf // blkf)
    nf_pad = nj * blkf
    lane = max(hop, 128)
    half = n_fft // 2
    k_half = sup // 2 + 1
    fold_widths = []
    u0 = 0
    while u0 < k_half:
        fold_widths.append(min(hop, k_half - u0))
        u0 += hop
    fold_widths = tuple(fold_widths)

    rows_total = (nj + 1) * blkf
    total = rows_total * hop
    audio_p = jnp.pad(audio, ((0, 0), (eff_pad, total - t - eff_pad)))
    # rows_rev[r][λ] = z[r·hop + hop − λ]: reshape the 1-sample-left-shifted
    # z into hop-rows and flip the lane axis (one fused XLA copy)
    audio_r = jnp.pad(audio, ((0, 0), (eff_pad - 1, total - t - eff_pad + 1)))
    if algorithm == "bf16":
        audio_p = audio_p.astype(jnp.bfloat16)
        audio_r = audio_r.astype(jnp.bfloat16)
    audio_p = audio_p.reshape(bsz, rows_total, hop)
    audio_r = jnp.flip(audio_r.reshape(bsz, rows_total, hop), axis=-1)
    if hop < lane:
        audio_p = jnp.pad(audio_p, ((0, 0), (0, 0), (0, lane - hop)))
        audio_r = jnp.pad(audio_r, ((0, 0), (0, 0), (0, lane - hop)))

    from modulation_mfcc_tpu.ops.windows import hann

    w = np.zeros(k_half, np.float64)
    w_full = hann(sup, periodic=True)
    w[: sup // 2] = w_full[: sup // 2]
    w[sup // 2] = 0.5 * w_full[sup // 2]
    m_full = mel_filterbank(sr, n_fft, n_mels, fmin, fmax)
    nz = np.flatnonzero(np.abs(m_full).sum(axis=0) > 0)
    n_bins = int(nz[-1]) + 1 if nz.size else half + 1
    u = np.arange(k_half)
    b = np.arange(n_bins)
    th = 2.0 * np.pi * np.outer(u + pw, b) / n_fft
    C = (w[:, None] * np.cos(th)).astype(np.float64)
    S = (-w[:, None] * np.sin(th)).astype(np.float64)
    S[sup // 2, :] = 0.0  # self-point is cosine-only
    packed = n_bins == half + 1 and half % 128 == 0 and nz.size and int(nz[0]) >= 1
    if packed:
        re_cols = half
        C[:, 0] = C[:, half]  # Nyquist cosine column rides the DC slot
        C = C[:, :half]
        m_p = np.zeros((re_cols, n_mels), np.float32)
        m_p[:half, :] = m_full.T[:half]
        m_p[0, :] = m_full.T[half]
    else:
        re_cols = round_up_to_multiple(n_bins, 128)
        C = np.pad(C, ((0, 0), (0, re_cols - n_bins)))
        m_p = np.zeros((re_cols, n_mels), np.float32)
        m_p[:n_bins, :] = m_full.T[:n_bins]
    nb_im = min(n_bins, half)  # Nyquist im is identically zero
    im_cols = round_up_to_multiple(nb_im, 128)
    S = np.pad(S[:, :nb_im], ((0, 0), (0, im_cols - nb_im)))

    wc_in = _stack_weights(C.astype(np.float32), algorithm)
    ws_in = _stack_weights(S.astype(np.float32), algorithm)
    mel_in = _stack_weights(m_p, algorithm)
    kern = partial(
        _fold_kernel, blkf=blkf, hop=hop, m=m, re_cols=re_cols,
        im_cols=im_cols, fold_widths=fold_widths, nf=nf, algorithm=algorithm,
        out_dtype=out_dtype,
    )
    ts_ = blkf // _TAIL_ROWS
    mel_out, bmax = pl.pallas_call(
        kern,
        grid=(bsz, nj),
        in_specs=[
            pl.BlockSpec((1, blkf, lane), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TAIL_ROWS, lane), lambda b, j: (b, (j + 1) * ts_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, blkf, lane), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TAIL_ROWS, lane), lambda b, j: (b, (j + 1) * ts_, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(wc_in.shape, lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(ws_in.shape, lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(mel_in.shape, lambda b, j: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, blkf, n_mels), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), lambda b, j: (b, j, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, nf_pad, n_mels), out_dtype),
            jax.ShapeDtypeStruct((bsz, nj, 8, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blkf + _TAIL_ROWS, lane), jnp.float32),
            pltpu.VMEM((blkf + _TAIL_ROWS, lane), jnp.float32),
        ],
    )(audio_p, audio_p, audio_r, audio_r, wc_in, ws_in, mel_in)
    return mel_out, bmax


def _stack_weights(w: np.ndarray, algorithm: str) -> jnp.ndarray:
    """Stack a weight matrix for :func:`_mxu`: [1, K, C] f32/bf16 plane, or
    the (hi, lo) bf16 split pair for the x3 algorithm."""
    if algorithm == "x3":
        hi = w.astype(np.float32).astype(jnp.bfloat16)
        lo = (w - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        return jnp.stack([jnp.asarray(hi), jnp.asarray(lo)])
    dt = jnp.bfloat16 if algorithm == "bf16" else jnp.float32
    return jnp.asarray(w, dtype=dt)[None]


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


def _tail_kernel_t(mel_ref, peak_ref, dct_ref, out_ref, *, co: int):
    """Coef-major tail: same dB/clip/DCT, output TRANSPOSED in-kernel to
    [co, blkf] (Mosaic 2D transpose measured free vs the copy itself on
    v5e). Writing [B, co, NF] instead of [B, NF, 128-padded] cuts the tail
    write 8x AND hands the downstream filter chain its natural coef-major
    layout — the XLA transpose it replaces measured 0.85 ms/batch on the
    flagship (r4 profile), on top of a 403->50 MB write saving."""
    b = pl.program_id(0)
    mel = mel_ref[0].astype(jnp.float32)
    db = 10.0 * jnp.log10(jnp.maximum(mel, 1e-10))
    db = jnp.maximum(db, peak_ref[b, 0] - 80.0)
    res = jnp.dot(
        db, dct_ref[:], preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    out_ref[0] = res[:, :co].T


def mfcc_tail(
    mel: jnp.ndarray, peak: jnp.ndarray, n_mfcc: int, blkf: int = 1024,
    transposed: bool = False,
) -> jnp.ndarray:
    """Fused dB/clip/DCT over mel [B, NF_pad, n_mels] with per-batch-item
    db peaks [B] (librosa power_to_db top_db=80 + DCT-II ortho).

    ``transposed=True`` returns coef-major [B, n_mfcc, NF_pad] (the layout
    the modulation filter chain consumes) via an in-kernel transpose."""
    bsz, nf_pad, n_mels = mel.shape
    nj = nf_pad // blkf
    out_cols = round_up_to_multiple(n_mfcc, 128)
    dct_p = np.zeros((n_mels, out_cols), np.float32)
    dct_p[:, :n_mfcc] = dct_matrix(n_mfcc, n_mels).T
    in_specs = [
        pl.BlockSpec((1, blkf, n_mels), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bsz, 1), lambda b, j: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((n_mels, out_cols), lambda b, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = (mel, peak.reshape(bsz, 1), jnp.asarray(dct_p))
    if transposed:
        co = round_up_to_multiple(n_mfcc, 8)  # f32 sublane granularity
        out = pl.pallas_call(
            partial(_tail_kernel_t, co=co),
            grid=(bsz, nj),
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (1, co, blkf), lambda b, j: (b, 0, j), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((bsz, co, nf_pad), jnp.float32),
        )(*args)
        return out[:, :n_mfcc, :]
    out = pl.pallas_call(
        partial(_tail_kernel, n_mfcc=n_mfcc),
        grid=(bsz, nj),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, blkf, out_cols), lambda b, j: (b, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((bsz, nf_pad, out_cols), jnp.float32),
    )(*args)
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
    algorithm: str | None = None,
    transposed: bool = False,
    n_samples: int | None = None,
) -> jnp.ndarray:
    """MFCC [B, NF, n_mfcc] via the fused kernels — or coef-major
    [B, n_mfcc, NF] with ``transposed=True`` (same numbers, transposed
    inside the tail kernel where it is free; see :func:`_tail_kernel_t`).

    librosa semantics (power=2, power_to_db top_db=80, DCT-II ortho), same
    contract as ops/spectral.mfcc_from_frames. ``algorithm`` ∈
    {'f32', 'x3', 'bf16'}, defaulting from ``compute_dtype``.

    3-D ``audio`` = pre-laid-out hop rows from :func:`pack_hop_rows`
    (``n_samples`` required) — the zero-prep corpus contract, see
    :func:`fused_mel_frontend`.
    """
    if algorithm is None:
        algorithm = "bf16" if compute_dtype == jnp.bfloat16 else "f32"
    single = audio.ndim == 1
    if single:
        audio = audio[None, :]
    if audio.ndim == 3 and n_samples is None:
        raise ValueError("rows input [B, rows, hop] requires n_samples")
    t = int(n_samples) if audio.ndim == 3 else audio.shape[-1]
    nf = 1 + t // hop
    # hardware A/B knobs (docs/DESIGN.md §8: the bf16 mode's fixed frontend
    # cost F ≈ 6.2 ms is per-grid-step serial VPU work + prep, not MXU —
    # blkf scales the step count, pipeline overlaps VPU with MXU). Cached
    # jit wrappers upstream carry frontend_knobs() in their static keys so
    # this trace-time read cannot go stale (pallas/knobs.py).
    from modulation_mfcc_tpu.pallas.knobs import frontend_knobs, resolve_flat_t

    blkf, pipeline, flat_t_raw = frontend_knobs()
    flat_t = resolve_flat_t(flat_t_raw, algorithm)
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
        algorithm=algorithm,
        out_dtype=jnp.bfloat16 if algorithm == "bf16" else jnp.float32,
        pipeline=pipeline,
        flat_t=flat_t and audio.ndim != 3,
        n_samples=n_samples,
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
    if transposed:
        out = mfcc_tail(mel, peak, n_mfcc, blkf=blkf, transposed=True)[..., :nf]
    else:
        out = mfcc_tail(mel, peak, n_mfcc, blkf=blkf)[:, :nf, :]
    return out[0] if single else out
