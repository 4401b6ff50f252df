"""Pallas pyin Viterbi: the whole decode in two streaming kernel launches.

librosa.pyin's decoder (reference: /root/reference/script/calc.py:562-581)
is a 2·n_bins-state max-plus relaxation over frames. The XLA form
(ops/yin.py:vstep under lax.scan) pays ~5-6 µs per step at n_bins=360 on
v5e against ~1 µs of VPU arithmetic — the [n, n] broadcast-add-max
intermediates and the scan's per-step layout churn dominate, and banding
or unrolling does not remove them (r2/r3 notes).

Here the complete forward recursion runs in ONE launch. Frames stream
through VMEM in chunks (the trellis at tracker scale — NF≈3000 rows of
768 lanes — does not fit VMEM whole): the observation block and the
delta-history output block advance with the sequential TPU grid while
the carry delta lives in a VMEM scratch that persists across grid steps.
Per step (all VPU, no HBM round-trips):

    m_v = max(δ_V + log(1−s), δ_U + log s)     (elementwise, lanes)
    m_u = max(δ_V + log s,   δ_U + log(1−s))
    mᵀ  = transpose([m_v | m_u])               (one 2·nbl-vector relayout)
    δ'_V = max over sublanes (m_vᵀ + log_tri)  (fused broadcast-add-max)
    δ'_U = max over sublanes (m_uᵀ + log_tri)
    δ'  += log_obs[t+1]

which is the identical arithmetic of the XLA kron-factored step —
elementwise adds are bit-exact and max is order-independent — so the
emitted delta history is BIT-IDENTICAL and the backtrace decodes the
same path (the float64-oracle identical-bin tests remain the bar). The
backtrace itself is a second streaming kernel walking the chunks in
reverse, reproducing jnp.argmax's first-max tie rule with a
min-of-iota-at-max readout.

State blocks are padded to 128-lane multiples with −1e30 (never −inf:
pads must stay finite so they cannot produce NaNs through the adds); the
padding is stable under the recursion because every padded source row or
target column of the transition matrix is itself −1e30.

History rows are stored SHIFTED (hist[s] = delta at entry of step s =
δ_{s−1}) so each row lands in the same chunk as the observation row that
produced it; the wrappers slice the shift away.

MEASURED ON v5e (r3 session 8, lax.map distinct-inputs harness, full
pyin 8×30 s @10 kHz): xla 31.4 ms < pallas forward-only 32.4 <
batched 37.6 < pallas_full per-signal 39.0 — the launch savings do not
beat the dense unrolled XLA scan at n_bins=360 (tried with in-kernel
unroll=1 and full chunk unroll; Mosaic supports no partial unroll).
These kernels are therefore NOT the default: select them via
``viterbi_engine='pallas_full' | 'pallas_batched' | 'pallas'`` for A/B
on other hardware/shapes.
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from modulation_mfcc_tpu.utils.helpers import round_up_to_multiple

__all__ = [
    "viterbi_forward_pallas",
    "viterbi_decode_pallas",
    "viterbi_decode_batched",
    "viterbi_decode_auto",
]

_PAD = -1e30


def _relax(d, tri, nbl, c_stay, c_sw):
    """One kron-factored max-plus step (without the observation add)."""
    d_v = d[:, :nbl]
    d_u = d[:, nbl:]
    m_v = jnp.maximum(d_v + c_stay, d_u + c_sw)
    m_u = jnp.maximum(d_v + c_sw, d_u + c_stay)
    # [1, 2·nbl] → [2·nbl, 1]: element order is unchanged, so this is a
    # reshape, not a transpose — the better-supported Mosaic relayout
    mt = jnp.concatenate([m_v, m_u], axis=1).reshape(2 * nbl, 1)
    new_v = jnp.max(mt[:nbl] + tri, axis=0, keepdims=True)
    new_u = jnp.max(mt[nbl:] + tri, axis=0, keepdims=True)
    return jnp.concatenate([new_v, new_u], axis=1)


def _fwd_kernel(
    obs_ref,
    d0_ref,
    tri_ref,
    hist_ref,
    dfin_ref,
    dstate,
    *,
    nf: int,
    ch: int,
    nbl: int,
    c_stay: float,
    c_sw: float,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dstate[...] = d0_ref[...]

    tri = tri_ref[...]
    base = i * ch

    # static loop bounds (unrollable): every chunk runs ch steps; steps
    # outside [1, nf) keep the carry via a cheap [1, 2·nbl] select (their
    # inputs are finite pad rows, so the discarded relax cannot NaN)
    def body(j, d):
        s = base + j
        hist_ref[pl.ds(j, 1), :] = d  # hist[s] = delta at entry of step s
        lo = obs_ref[pl.ds(j, 1), :]
        new = _relax(d, tri, nbl, c_stay, c_sw) + lo
        return jnp.where((s >= 1) & (s < nf), new, d)

    d_end = jax.lax.fori_loop(0, ch, body, dstate[...], unroll=1)
    dstate[...] = d_end
    dfin_ref[...] = d_end  # revisited block; final chunk's value wins


def _bwd_kernel(
    hist_ref,
    trit_ref,
    last_ref,
    pout_ref,
    cur_s,
    *,
    nf: int,
    ch: int,
    n_bins: int,
    nbl: int,
    nchunks: int,
    c_stay: float,
    c_sw: float,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        cur_s[0, 0] = last_ref[0, 0]

    base = (nchunks - 1 - i) * ch
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, nbl), 1)

    # static loop bounds (unrollable); steps outside [1, nf) keep the
    # carry via a scalar select (their hist rows are finite, so the
    # discarded computation is safe)
    def body(k, nxt):
        j = ch - 1 - k  # walk the chunk's rows s = base+j in reverse
        s = base + j
        d = hist_ref[pl.ds(j, 1), :]  # δ_{s−1} = δ_t for t = s−1
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
        base_i = jnp.min(jnp.where(score == smx, lanes, nbl))  # first max
        sel_at = jnp.sum(jnp.where(lanes == base_i, sel.astype(jnp.int32), 0))
        cur = jnp.where(
            (s >= 1) & (s < nf),
            (base_i + n_bins * sel_at).astype(jnp.int32),
            nxt,
        )
        # pout[s] = decoded state at frame s−1 (same shift as hist)
        pout_ref[pl.ds(j, 1), :] = jnp.full((1, 128), cur, jnp.int32)
        return cur

    cur_s[0, 0] = jax.lax.fori_loop(0, ch, body, cur_s[0, 0], unroll=1)


def _pad_state(v2n, n, nbl, fill):
    """[..., 2n] → [..., 2·nbl]: each of the two state blocks padded to a
    128-lane multiple with ``fill``."""
    pad = [(0, 0)] * (v2n.ndim - 1) + [(0, nbl - n)]
    return jnp.concatenate(
        [
            jnp.pad(v2n[..., :n], pad, constant_values=fill),
            jnp.pad(v2n[..., n:], pad, constant_values=fill),
        ],
        axis=-1,
    )


def _prep(log_obs, delta0, log_tri):
    nf, two_n = log_obs.shape
    n = two_n // 2
    nbl = round_up_to_multiple(n, 128)
    # chunk rows: fit obs + hist blocks comfortably in VMEM double-buffering
    ch = 256 if nbl <= 512 else 128
    nchunks = max(1, -(-nf // ch))
    nfp = nchunks * ch
    obs = _pad_state(log_obs.astype(jnp.float32), n, nbl, 0.0)
    obs = jnp.pad(obs, ((0, nfp - nf), (0, 0)))
    d0 = _pad_state(delta0.astype(jnp.float32)[None, :], n, nbl, _PAD)
    tri = jnp.pad(
        log_tri.astype(jnp.float32),
        ((0, nbl - n), (0, nbl - n)),
        constant_values=_PAD,
    )
    return nf, n, nbl, ch, nchunks, nfp, obs, d0, tri


def _forward(log_obs, delta0, log_tri, c_stay, c_sw, interpret):
    nf, n, nbl, ch, nchunks, nfp, obs, d0, tri = _prep(log_obs, delta0, log_tri)
    kern = partial(
        _fwd_kernel, nf=nf, ch=ch, nbl=nbl, c_stay=float(c_stay), c_sw=float(c_sw)
    )
    hist, dfin = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((ch, 2 * nbl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ch, 2 * nbl), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nfp, 2 * nbl), jnp.float32),
            jax.ShapeDtypeStruct((1, 2 * nbl), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, 2 * nbl), jnp.float32)],
        interpret=interpret,
    )(obs, d0, tri)
    return hist, dfin, n, nbl, ch, nchunks, nfp


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
    nf = log_obs.shape[0]
    hist, dfin, n, nbl, *_ = _forward(
        log_obs, delta0, log_tri, c_stay, c_sw, interpret
    )
    unpad = lambda a: jnp.concatenate([a[..., :n], a[..., nbl : nbl + n]], axis=-1)
    return unpad(dfin[0]), unpad(hist[1:nf])


def viterbi_decode_pallas(
    log_obs: jnp.ndarray,
    delta0: jnp.ndarray,
    log_tri: jnp.ndarray,
    c_stay: float,
    c_sw: float,
    interpret: bool = False,
):
    """Streaming forward + streaming reverse backtrace: returns the decoded
    path [NF] (int32 state indices, same semantics — first-max argmax ties
    included — as the XLA back-scan in ops/yin.py; interpret-mode tested)."""
    nf = log_obs.shape[0]
    hist, dfin, n, nbl, ch, nchunks, nfp = _forward(
        log_obs, delta0, log_tri, c_stay, c_sw, interpret
    )
    # last = argmax over the unpadded [2n] final delta (cheap in XLA)
    dfin_u = jnp.concatenate([dfin[0, :n], dfin[0, nbl : nbl + n]])
    last = jnp.argmax(dfin_u).astype(jnp.int32)
    trit = jnp.pad(
        log_tri.T.astype(jnp.float32),
        ((0, nbl - n), (0, nbl - n)),
        constant_values=_PAD,
    )
    kern = partial(
        _bwd_kernel,
        nf=nf,
        ch=ch,
        n_bins=n,
        nbl=nbl,
        nchunks=nchunks,
        c_stay=float(c_stay),
        c_sw=float(c_sw),
    )
    rev = lambda i: (nchunks - 1 - i, 0)
    pout = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((ch, 2 * nbl), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((ch, 128), rev, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nfp, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(hist, trit, last[None, None])
    # pout[s] = path[s−1] for s = 1..nf−1; path[nf−1] = last
    return jnp.concatenate([pout[1:nf, 0], last[None]])


# ---------------------------------------------------------------------------
# Batched variant: whole batch per step (one grid, fixed costs amortized)
# ---------------------------------------------------------------------------
#
# Under jax.vmap a pallas_call is batched by PREPENDING a grid axis, which
# runs the per-signal kernel B times SEQUENTIALLY — the per-step fixed costs
# (vector relayout, loop bookkeeping, dynamic addressing) replicate B×. The
# batched kernels below instead carry the state as [B, 1, 2·nbl] and relax
# all signals per step through one [B, nbl, nbl] broadcast-add-max, so the
# fixed costs are paid once per frame. viterbi_decode_auto wires this in
# through jax.custom_batching.custom_vmap: unbatched calls use the
# per-signal kernels, vmapped calls the batched ones — numerics identical
# (the same adds and order-independent maxes).


def _fwd_kernel_b(
    obs_ref, d0_ref, tri_ref, hist_ref, dfin_ref, dstate, *, nf, ch, nbl, c_stay, c_sw
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dstate[...] = d0_ref[...]

    tri = tri_ref[...]  # [nbl, nbl]
    base = i * ch

    def body(j, d):  # d [B, 1, 2·nbl]
        s = base + j
        hist_ref[:, pl.ds(j, 1), :] = d
        lo = obs_ref[:, pl.ds(j, 1), :]
        d_v = d[..., :nbl]
        d_u = d[..., nbl:]
        m_v = jnp.maximum(d_v + c_stay, d_u + c_sw)  # [B, 1, nbl]
        m_u = jnp.maximum(d_v + c_sw, d_u + c_stay)
        # [B, 1, nbl] → [B, nbl, 1] keeps element order: reshape, not
        # transpose (the better-supported Mosaic relayout)
        nb = m_v.shape[0]
        new_v = jnp.max(
            m_v.reshape(nb, nbl, 1) + tri[None], axis=1, keepdims=True
        )
        new_u = jnp.max(
            m_u.reshape(nb, nbl, 1) + tri[None], axis=1, keepdims=True
        )
        new = jnp.concatenate([new_v, new_u], axis=-1) + lo
        return jnp.where((s >= 1) & (s < nf), new, d)

    d_end = jax.lax.fori_loop(0, ch, body, dstate[...], unroll=1)
    dstate[...] = d_end
    dfin_ref[...] = d_end


def _bwd_kernel_b(
    hist_ref,
    trit_ref,
    last_ref,
    pout_ref,
    cur_s,
    *,
    nf,
    ch,
    n_bins,
    nbl,
    nb,
    nchunks,
    c_stay,
    c_sw,
):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for b in range(nb):
            cur_s[b, 0] = last_ref[b, 0]

    base = (nchunks - 1 - i) * ch
    lanes = jax.lax.broadcasted_iota(jnp.int32, (1, nbl), 1)

    def body(k, curs):  # curs: tuple of nb int32 scalars (no 1-D vectors)
        j = ch - 1 - k
        s = base + j
        d = hist_ref[:, pl.ds(j, 1), :]  # [B, 1, 2·nbl]
        outs = []
        for b in range(nb):
            nxt = curs[b]
            voiced_t = nxt < n_bins
            pos = jnp.where(voiced_t, nxt, nxt - n_bins)
            a = jnp.where(voiced_t, c_stay, c_sw)
            bb = jnp.where(voiced_t, c_sw, c_stay)
            d_v = d[b, :, :nbl]
            d_u = d[b, :, nbl:]
            m = jnp.maximum(d_v + a, d_u + bb)  # [1, nbl]
            sel = (d_u + bb) > (d_v + a)
            col = trit_ref[pl.ds(pos, 1), :]
            score = m + col
            smx = jnp.max(score)
            base_i = jnp.min(jnp.where(score == smx, lanes, nbl))
            sel_at = jnp.sum(jnp.where(lanes == base_i, sel.astype(jnp.int32), 0))
            cur = jnp.where(
                (s >= 1) & (s < nf),
                (base_i + n_bins * sel_at).astype(jnp.int32),
                nxt,
            )
            pout_ref[b, pl.ds(j, 1), :] = jnp.full((1, 128), cur, jnp.int32)
            outs.append(cur)
        return tuple(outs)

    cur0 = tuple(cur_s[b, 0] for b in range(nb))
    curf = jax.lax.fori_loop(0, ch, body, cur0, unroll=1)
    for b in range(nb):
        cur_s[b, 0] = curf[b]


def viterbi_decode_batched(
    log_obs: jnp.ndarray,
    delta0: jnp.ndarray,
    log_tri: jnp.ndarray,
    c_stay: float,
    c_sw: float,
    interpret: bool = False,
):
    """Batched fused decode: log_obs [B, NF, 2n], delta0 [B, 2n] → path
    [B, NF]. Same decode semantics as viterbi_decode_pallas per row."""
    nb, nf, two_n = log_obs.shape
    n = two_n // 2
    nbl = round_up_to_multiple(n, 128)
    # the (up to two live) [B, nbl, nbl] relax intermediates are the VMEM
    # budget drivers; the chunk length only sizes the streamed blocks
    ch = 128 if 2 * nb * nbl * nbl * 4 <= 3_000_000 else 64
    nchunks = max(1, -(-nf // ch))
    nfp = nchunks * ch
    obs = _pad_state(log_obs.astype(jnp.float32), n, nbl, 0.0)
    obs = jnp.pad(obs, ((0, 0), (0, nfp - nf), (0, 0)))
    d0 = _pad_state(delta0.astype(jnp.float32)[:, None, :], n, nbl, _PAD)
    tri = jnp.pad(
        log_tri.astype(jnp.float32),
        ((0, nbl - n), (0, nbl - n)),
        constant_values=_PAD,
    )
    kern = partial(
        _fwd_kernel_b, nf=nf, ch=ch, nbl=nbl, c_stay=float(c_stay), c_sw=float(c_sw)
    )
    hist, dfin = pl.pallas_call(
        kern,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((nb, ch, 2 * nbl), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, 2 * nbl), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((nb, ch, 2 * nbl), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1, 2 * nbl), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, nfp, 2 * nbl), jnp.float32),
            jax.ShapeDtypeStruct((nb, 1, 2 * nbl), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((nb, 1, 2 * nbl), jnp.float32)],
        interpret=interpret,
    )(obs, d0, tri)
    dfin_u = jnp.concatenate([dfin[:, 0, :n], dfin[:, 0, nbl : nbl + n]], axis=-1)
    last = jnp.argmax(dfin_u, axis=-1).astype(jnp.int32)  # [B]
    trit = jnp.pad(
        log_tri.T.astype(jnp.float32),
        ((0, nbl - n), (0, nbl - n)),
        constant_values=_PAD,
    )
    kern_b = partial(
        _bwd_kernel_b,
        nf=nf,
        ch=ch,
        n_bins=n,
        nbl=nbl,
        nb=nb,
        nchunks=nchunks,
        c_stay=float(c_stay),
        c_sw=float(c_sw),
    )
    rev3 = lambda i: (0, nchunks - 1 - i, 0)
    pout = pl.pallas_call(
        kern_b,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((nb, ch, 2 * nbl), rev3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nbl, nbl), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((nb, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((nb, ch, 128), rev3, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, nfp, 128), jnp.int32),
        scratch_shapes=[pltpu.SMEM((nb, 1), jnp.int32)],
        interpret=interpret,
    )(hist, trit, last[:, None])
    return jnp.concatenate([pout[:, 1:nf, 0], last[:, None]], axis=-1)


@lru_cache(maxsize=32)
def _decode_custom_vmap(c_stay: float, c_sw: float):
    """custom_vmap wrapper: per-signal kernels when called unbatched,
    the batched kernels under jax.vmap (instead of the default rule's
    sequential outer grid)."""
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def decode(log_obs, delta0, log_tri):
        return viterbi_decode_pallas(log_obs, delta0, log_tri, c_stay, c_sw)

    @decode.def_vmap
    def _rule(axis_size, in_batched, log_obs, delta0, log_tri):
        ob, db, tb = in_batched
        if not ob or tb:  # unexpected batching pattern: serial fallback
            bc = lambda x, bt: x if bt else jnp.broadcast_to(x, (axis_size, *x.shape))
            out = jax.lax.map(
                lambda args: viterbi_decode_pallas(*args, c_stay, c_sw),
                (bc(log_obs, ob), bc(delta0, db), bc(log_tri, tb)),
            )
            return out, True
        if not db:
            delta0 = jnp.broadcast_to(delta0, (axis_size, *delta0.shape))
        # VMEM budget: the forward body holds up to TWO [B, nbl, nbl]
        # relax intermediates (m_vᵀ+tri and m_uᵀ+tri) plus double-buffered
        # obs/hist chunks — cap the sub-batch so 2·B·nbl²·f32 ≤ 6 MB
        # (B ≤ 5 at the 360-bin default), splitting larger batches
        n = log_obs.shape[-1] // 2
        nbl = round_up_to_multiple(n, 128)
        sub = max(1, 3_000_000 // max(1, nbl * nbl * 4))
        # …and the HBM history (obs + hist ≈ 2·B·NF·2nbl·f32) ≤ ~2 GB
        hist_bytes = log_obs.shape[-2] * 2 * nbl * 4 * 2
        sub = max(1, min(sub, 2_000_000_000 // max(1, hist_bytes)))
        if axis_size <= sub:
            return viterbi_decode_batched(log_obs, delta0, log_tri, c_stay, c_sw), True
        pads = (-axis_size) % sub
        obs_p = jnp.pad(log_obs, ((0, pads), (0, 0), (0, 0)))
        d0_p = jnp.pad(delta0, ((0, pads), (0, 0)))
        out = jax.lax.map(
            lambda args: viterbi_decode_batched(args[0], args[1], log_tri, c_stay, c_sw),
            (
                obs_p.reshape(-1, sub, *log_obs.shape[1:]),
                d0_p.reshape(-1, sub, delta0.shape[-1]),
            ),
        )
        return out.reshape(-1, log_obs.shape[1])[:axis_size], True

    return decode


def viterbi_decode_auto(log_obs, delta0, log_tri, c_stay: float, c_sw: float):
    """Decode via the per-signal kernels, upgrading to the batched kernels
    under jax.vmap (custom_vmap). Identical decode either way."""
    return _decode_custom_vmap(float(c_stay), float(c_sw))(log_obs, delta0, log_tri)
