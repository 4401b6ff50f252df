"""Fused windowed-sinc peak-refinement kernel (Praat NUMimproveMaximum).

The pitch tracker (reference: Praat's ``Sound_to_Pitch`` via
/root/reference/script/calc.py:545) refines every candidate lag's
autocorrelation peak with a windowed-sinc interpolant. The XLA
formulation (ops/pitch.py:_refine_sinc_dense) evaluates the interpolant
densely as ONE banded GEMM — but its [.., grid, nl] output (~874 MB at
32×30 s tracker scale) must round-trip HBM before the argmax + parabolic
polish consume it; the stage measured 16.6 ms at B=32 on v5e, half the
whole tracker's pitch cost, on ~3 ms of MXU work.

This kernel keeps the interpolant in VMEM: per 256-row block it runs the
same banded GEMM (one MXU dot, HIGHEST precision, against weights whose
per-offset column groups are padded to 128-lane alignment so every
offset plane is one aligned lane slice — no Mosaic relayout), then takes
the interior-offset running max, the first-occurrence argmax, and the
parabolic polish entirely on the VPU, writing only the final
``(pos, val)`` rows. HBM traffic drops from ~2.6 GB to ~90 MB per batch.

The refinement is evaluated on the lag band [lag_lo, lag_max] only —
candidates are guaranteed inside [lag_min, lag_max] by the tracker's
``in_range`` mask — which at the 10 kHz defaults (band 16..134) fits the
per-offset plane in ONE 128-lane tile, making the padded GEMM shape
essentially waste-free.

Numerics match ops/pitch.py:_refine_sinc_dense (same weights, same
first-max argmax tie rule, same parabola expressions) to MXU reduction-
order noise; the equality is pinned by tests/test_pitch.py in interpret
mode on CPU.

MEASURED ON v5e (r3 session 8, lax.map distinct-inputs harness): with
BOTH engines now evaluating only the [lag_lo, lag_max] band, the XLA
banded GEMM wins through the full pitch_ac at B=32×30 s — 28.8 vs
36.5 ms/batch — the band trim already removed the 874 MB round-trip
that motivated this kernel, and the kernel's block orchestration costs
more than the remaining HBM traffic saves. NOT the default; select via
``sinc_engine='pallas'`` for A/B on other hardware/shapes.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulation_mfcc_tpu.utils.helpers import round_up_to_multiple

__all__ = ["refine_sinc_band_pallas"]


def _band_weight_planes(grid: int, depth: int, nl: int, nlp: int, kp: int):
    """The shared banded-GEMM operator (ops/pitch.py:_sinc_band_matrix)
    with 128-aligned offset planes: column stride nlp (a 128 multiple) so
    each offset plane g is one aligned lane slice of the dot output, and
    kp rows (a 128 multiple) for the padded contraction."""
    from modulation_mfcc_tpu.ops.pitch import _sinc_band_matrix

    return _sinc_band_matrix(grid, depth, nl, col_stride=nlp, rows=kp).astype(
        np.float32
    )


def _refine_kernel(
    x_ref, w_ref, pos_ref, val_ref, *, grid_n: int, nlp: int, lag_lo: int, h: float
):
    x = x_ref[...]  # [R, kp]
    big = jnp.dot(
        x,
        w_ref[...],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [R, G·nlp]
    # aligned per-offset planes (static 128-multiple lane slices of a value)
    vs = [
        jax.lax.slice_in_dim(big, g * nlp, (g + 1) * nlp, axis=1)
        for g in range(grid_n)
    ]
    # first-occurrence running max over the INTERIOR offsets 1..G-2 (the
    # same tie rule as jnp.argmax in the XLA path: strict > keeps the
    # earliest maximal offset)
    best = vs[1]
    bg = jnp.ones(best.shape, jnp.int32)
    for g in range(2, grid_n - 1):
        isnew = vs[g] > best
        best = jnp.where(isnew, vs[g], best)
        bg = jnp.where(isnew, g, bg)
    # parabola neighbors f(g−1), f(g+1) at the argmax — selects over the
    # resident planes, no gathers
    fm = vs[0]
    fp = vs[2]
    for g in range(2, grid_n - 1):
        sel = bg == g
        fm = jnp.where(sel, vs[g - 1], fm)
        fp = jnp.where(sel, vs[g + 1], fp)
    denom = fm - 2.0 * best + fp
    delta = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (fm - fp) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    off = -1.0 + bg.astype(jnp.float32) * h
    lag = (
        jax.lax.broadcasted_iota(jnp.int32, best.shape, 1).astype(jnp.float32)
        + lag_lo
    )
    pos_ref[...] = lag + off + delta * h
    val_ref[...] = best - 0.25 * (fm - fp) * delta


def refine_sinc_band_pallas(
    r_ext: jnp.ndarray,
    ext_left: int,
    lag_lo: int,
    lag_max: int,
    depth: int,
    grid: int = 17,
    blkf: int | None = None,
    interpret: bool = False,
):
    """Drop-in equivalent of ops/pitch.py:_refine_sinc_dense(lag_lo=…):
    ``(pos, val)`` [..., lag_max−lag_lo+1] of the windowed-sinc interpolant
    maximum around each integer lag in the band, via the fused VMEM kernel.
    f32 only (the tracker's device dtype); leading dims are flattened to
    rows exactly like pallas/burg.py."""
    nl = lag_max - lag_lo + 1
    s = 2 * depth + 3
    kb = nl + s - 1
    nlp = round_up_to_multiple(nl, 128)
    kp = round_up_to_multiple(kb, 128)
    if blkf is None:
        # fit the resident weights + the per-block dot output and its offset
        # planes (~2× G·nlp lanes live) in ~12 MB of VMEM: 256 rows at the
        # 10 kHz one-tile band, shrinking for veryAccurate / two-tile bands
        w_bytes = kp * grid * nlp * 4
        blkf = 256
        while blkf > 32 and w_bytes + blkf * (kp + 3 * grid * nlp) * 4 > 12e6:
            blkf //= 2
    start = ext_left - (depth + 1) + lag_lo
    x = jax.lax.slice_in_dim(r_ext, start, start + kb, axis=-1)
    *lead, _ = x.shape
    m_tot = int(np.prod(lead)) if lead else 1
    flat = x.reshape(m_tot, kb).astype(jnp.float32)
    mp = round_up_to_multiple(max(m_tot, blkf), blkf)
    flat = jnp.pad(flat, ((0, mp - m_tot), (0, kp - kb)))
    w = jnp.asarray(_band_weight_planes(grid, depth, nl, nlp, kp))
    kern = partial(
        _refine_kernel, grid_n=grid, nlp=nlp, lag_lo=lag_lo, h=2.0 / (grid - 1)
    )
    pos, val = pl.pallas_call(
        kern,
        grid=(mp // blkf,),
        in_specs=[
            pl.BlockSpec((blkf, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(w.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((blkf, nlp), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((blkf, nlp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((mp, nlp), jnp.float32),
            jax.ShapeDtypeStruct((mp, nlp), jnp.float32),
        ],
        interpret=interpret,
    )(flat, w)
    return (
        pos[:m_tot, :nl].reshape(*lead, nl),
        val[:m_tot, :nl].reshape(*lead, nl),
    )
