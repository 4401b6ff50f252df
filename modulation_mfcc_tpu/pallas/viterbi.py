"""Pallas pyin Viterbi forward pass: the whole scan in one kernel launch.

librosa.pyin's decoder (reference: /root/reference/script/calc.py:562-581)
is a 2·n_bins-state max-plus relaxation over frames. The XLA form
(ops/yin.py:vstep under lax.scan) costs ~29 µs per step at n_bins=360 on
v5e against ~1 µs of VPU arithmetic — the [n, n] broadcast-add-max
intermediates and the scan's per-step layout churn dominate, and banding
or unrolling does not remove them (r2/r3 notes).

This kernel runs the complete forward recursion in one launch with the
log-transition matrix resident in VMEM. Per step (all VPU, no HBM):

    m_v = max(δ_V + log(1−s), δ_U + log s)     (elementwise, lanes)
    m_u = max(δ_V + log s,   δ_U + log(1−s))
    mᵀ  = transpose([m_v | m_u])               (one 2·nbl-vector relayout)
    δ'_V = max over sublanes (m_vᵀ + log_tri)  (fused broadcast-add-max)
    δ'_U = max over sublanes (m_uᵀ + log_tri)
    δ'  += log_obs[t+1]

which is the identical arithmetic of the XLA kron-factored step —
elementwise adds are bit-exact and max is order-independent — so the
emitted delta history is BIT-IDENTICAL and the XLA backtrace decodes the
same path (the float64-oracle identical-bin tests remain the bar).

State blocks are padded to 128-lane multiples with −1e30 (never −inf:
pads must stay finite so they cannot produce NaNs through the adds); the
padding is stable under the recursion because every padded source row or
target column of the transition matrix is itself −1e30.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulation_mfcc_tpu.utils.helpers import round_up_to_multiple

__all__ = ["viterbi_forward_pallas", "viterbi_decode_pallas"]

_PAD = -1e30


def _viterbi_kernel(
    obs_ref, d0_ref, tri_ref, hist_ref, dfin_ref, *, nf: int, nbl: int, c_stay: float, c_sw: float
):
    tri = tri_ref[...]  # [nbl, nbl], −1e30 on padded rows/cols

    def body(t, d):
        hist_ref[pl.ds(t, 1), :] = d  # delta at entry of step t+1
        lo = obs_ref[pl.ds(t + 1, 1), :]  # [1, 2·nbl]
        d_v = d[:, :nbl]
        d_u = d[:, nbl:]
        m_v = jnp.maximum(d_v + c_stay, d_u + c_sw)
        m_u = jnp.maximum(d_v + c_sw, d_u + c_stay)
        mt = jnp.transpose(jnp.concatenate([m_v, m_u], axis=1))  # [2·nbl, 1]
        new_v = jnp.max(mt[:nbl] + tri, axis=0, keepdims=True)
        new_u = jnp.max(mt[nbl:] + tri, axis=0, keepdims=True)
        return jnp.concatenate([new_v, new_u], axis=1) + lo

    dfin_ref[...] = jax.lax.fori_loop(0, nf - 1, body, d0_ref[...])


def viterbi_forward_pallas(
    log_obs: jnp.ndarray,
    delta0: jnp.ndarray,
    log_tri: jnp.ndarray,
    c_stay: float,
    c_sw: float,
    interpret: bool = False,
):
    """Forward max-plus recursion for the kron-factored pyin decoder.

    log_obs [NF, 2n], delta0 [2n], log_tri [n, n] (f32). Returns
    (delta_f [2n], delta_hist [NF−1, 2n]) — bit-identical to the XLA
    lax.scan form in ops/yin.py (tested in interpret mode)."""
    nf, two_n = log_obs.shape
    n = two_n // 2
    nbl = round_up_to_multiple(n, 128)
    nfp = round_up_to_multiple(nf, 8)

    def pad_state(v2n, fill):
        return jnp.concatenate(
            [
                jnp.pad(v2n[..., :n], [(0, 0)] * (v2n.ndim - 1) + [(0, nbl - n)], constant_values=fill),
                jnp.pad(v2n[..., n:], [(0, 0)] * (v2n.ndim - 1) + [(0, nbl - n)], constant_values=fill),
            ],
            axis=-1,
        )

    # obs pads 0.0 (keeps the −1e30 state pads from drifting toward −inf);
    # delta0 / tri pads −1e30 (finite: −inf pads could make NaNs via adds)
    obs = pad_state(log_obs.astype(jnp.float32), 0.0)
    obs = jnp.pad(obs, ((0, nfp - nf), (0, 0)))
    d0 = pad_state(delta0.astype(jnp.float32)[None, :], _PAD)
    tri = jnp.pad(
        log_tri.astype(jnp.float32),
        ((0, nbl - n), (0, nbl - n)),
        constant_values=_PAD,
    )
    kern = partial(
        _viterbi_kernel, nf=nf, nbl=nbl, c_stay=float(c_stay), c_sw=float(c_sw)
    )
    hist, dfin = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((nfp, 2 * nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nfp, 2 * nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nfp, 2 * nbl), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * nbl), jnp.float32),
        ],
        interpret=interpret,
    )(obs, d0, tri)
    unpad = lambda a: jnp.concatenate([a[..., :n], a[..., nbl : nbl + n]], axis=-1)
    return unpad(dfin[0]), unpad(hist[: nf - 1])


def _decode_kernel(
    obs_ref,
    d0_ref,
    tri_ref,
    trit_ref,
    path_ref,
    hist_ref,
    *,
    nf: int,
    n_bins: int,
    nbl: int,
    c_stay: float,
    c_sw: float,
):
    tri = tri_ref[...]

    def fwd(t, d):
        hist_ref[pl.ds(t, 1), :] = d
        lo = obs_ref[pl.ds(t + 1, 1), :]
        d_v = d[:, :nbl]
        d_u = d[:, nbl:]
        m_v = jnp.maximum(d_v + c_stay, d_u + c_sw)
        m_u = jnp.maximum(d_v + c_sw, d_u + c_stay)
        mt = jnp.transpose(jnp.concatenate([m_v, m_u], axis=1))
        new_v = jnp.max(mt[:nbl] + tri, axis=0, keepdims=True)
        new_u = jnp.max(mt[nbl:] + tri, axis=0, keepdims=True)
        return jnp.concatenate([new_v, new_u], axis=1) + lo

    dfin = jax.lax.fori_loop(0, nf - 1, fwd, d0_ref[...])  # [1, 2·nbl]

    # argmax over the UNPADDED [2n] order: map lane → global state index
    # (monotone in lane, so first-max-by-lane == jnp.argmax's first max;
    # padded lanes carry −1e30-class scores and never win)
    lanes2 = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * nbl), 1)
    glob2 = jnp.where(lanes2 < nbl, lanes2, lanes2 - (nbl - n_bins))
    mx = jnp.max(dfin)
    last = jnp.min(jnp.where(dfin == mx, glob2, 2 * nbl)).astype(jnp.int32)
    path_ref[pl.ds(nf - 1, 1), :] = jnp.full((1, 128), last, jnp.int32)

    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, nbl), 1)

    def bwd(i, nxt):
        t = nf - 2 - i
        d = hist_ref[pl.ds(t, 1), :]
        d_v = d[:, :nbl]
        d_u = d[:, nbl:]
        voiced_t = nxt < n_bins
        pos = jnp.where(voiced_t, nxt, nxt - n_bins)
        a = jnp.where(voiced_t, c_stay, c_sw)
        b = jnp.where(voiced_t, c_sw, c_stay)
        m = jnp.maximum(d_v + a, d_u + b)
        sel = (d_u + b) > (d_v + a)
        col = trit_ref[pl.ds(pos, 1), :]  # log_tri[:, pos] as a row
        score = m + col
        smx = jnp.max(score)
        base = jnp.min(jnp.where(score == smx, lanes, nbl))  # first max
        sel_at = jnp.sum(jnp.where(lanes == base, sel.astype(jnp.int32), 0))
        cur = (base + n_bins * sel_at).astype(jnp.int32)
        path_ref[pl.ds(t, 1), :] = jnp.full((1, 128), cur, jnp.int32)
        return cur

    jax.lax.fori_loop(0, nf - 1, bwd, last)


def viterbi_decode_pallas(
    log_obs: jnp.ndarray,
    delta0: jnp.ndarray,
    log_tri: jnp.ndarray,
    c_stay: float,
    c_sw: float,
    interpret: bool = False,
):
    """Fused forward + backtrace: the delta history lives in a VMEM
    scratch and never reaches HBM; only the decoded path [NF] (int32
    state indices, same semantics as the XLA back-scan in ops/yin.py)
    is written out. Bit-identical decode (tested in interpret mode)."""
    nf, two_n = log_obs.shape
    n = two_n // 2
    nbl = round_up_to_multiple(n, 128)
    nfp = round_up_to_multiple(nf, 8)

    def pad_state(v2n, fill):
        return jnp.concatenate(
            [
                jnp.pad(v2n[..., :n], [(0, 0)] * (v2n.ndim - 1) + [(0, nbl - n)], constant_values=fill),
                jnp.pad(v2n[..., n:], [(0, 0)] * (v2n.ndim - 1) + [(0, nbl - n)], constant_values=fill),
            ],
            axis=-1,
        )

    obs = pad_state(log_obs.astype(jnp.float32), 0.0)
    obs = jnp.pad(obs, ((0, nfp - nf), (0, 0)))
    d0 = pad_state(delta0.astype(jnp.float32)[None, :], _PAD)
    tri = jnp.pad(
        log_tri.astype(jnp.float32),
        ((0, nbl - n), (0, nbl - n)),
        constant_values=_PAD,
    )
    trit = jnp.pad(
        log_tri.T.astype(jnp.float32),
        ((0, nbl - n), (0, nbl - n)),
        constant_values=_PAD,
    )
    kern = partial(
        _decode_kernel,
        nf=nf,
        n_bins=n,
        nbl=nbl,
        c_stay=float(c_stay),
        c_sw=float(c_sw),
    )
    path = pl.pallas_call(
        kern,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((nfp, 2 * nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nfp, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nfp, 128), jnp.int32),
        scratch_shapes=[pltpu.VMEM((nfp, 2 * nbl), jnp.float32)],
        interpret=interpret,
    )(obs, d0, tri, trit)
    return path[:nf, 0]

