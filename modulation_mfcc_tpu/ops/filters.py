"""Zero-phase IIR/FIR filtering, TPU-native.

Design/apply split (the TPU-first shape of the reference's filter stack,
script/mfcc.py:29-135 `applyFilter` and the inline Butterworth low-pass of
script/mfcc.py:398-402):

  * **Design is host-side** — filter parameters are static config, so
    Butterworth/FIR coefficients and steady-state initial conditions are
    computed once with scipy in float64 at trace time and closed over as
    constants in the compiled XLA program.
  * **Application is device-side** — the recurrence runs as a `lax.scan`
    over time, vectorized (vmap-style broadcasting) over every leading batch/
    coefficient axis so the VPU lanes stay full; there is one scan per biquad
    section (cascades are short: order-6 Butterworth = 3 sections).

Zero-phase semantics replicate `scipy.signal.sosfiltfilt` / `filtfilt`
*exactly* (same odd extension, same default `padlen`, same `zi` scaling by the
first/last extended sample), because filtfilt edge behavior is the dominant
error term for the reference's 12 Hz low-pass on short trajectories
(SURVEY.md §7 "hard parts" #1).
"""
from __future__ import annotations

from functools import lru_cache, partial

import numpy as np
import scipy.signal as _sps

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Host-side design
# ---------------------------------------------------------------------------


@lru_cache(maxsize=128)
def design_butter_sos(order: int, wn: tuple, btype: str) -> tuple:
    """Butterworth SOS + steady-state zi, designed by scipy in float64.

    Returns (sos [ns,6], zi [ns,2], padlen) as numpy arrays / int. ``wn`` is
    the normalized cutoff tuple (1 value low/high, 2 values bandpass) exactly
    as the reference computes it (cutOff / (sr/2), script/mfcc.py:101,398).
    """
    wn_arr = np.asarray(wn, dtype=np.float64)
    sos = _sps.butter(order, wn_arr if wn_arr.size > 1 else wn_arr[0], btype=btype, output="sos")
    zi = _sps.sosfilt_zi(sos)
    ntaps = 2 * sos.shape[0] + 1
    ntaps -= min((sos[:, 2] == 0).sum(), (sos[:, 5] == 0).sum())
    padlen = 3 * int(ntaps)
    return sos, zi, padlen


@lru_cache(maxsize=128)
def design_firwin(numtaps: int, wn: tuple, pass_zero, beta: float = 7.4) -> tuple:
    """Kaiser-window FIR design matching the reference's firwin call
    (script/mfcc.py:120: ``firwin(filtLen, w, window=('kaiser', 7.4),
    pass_zero=filtType)``). Returns (b, zi, padlen) for use with filtfilt.
    """
    wn_arr = np.asarray(wn, dtype=np.float64)
    b = _sps.firwin(numtaps, wn_arr if wn_arr.size > 1 else wn_arr[0], window=("kaiser", beta), pass_zero=pass_zero)
    a = np.array([1.0])
    zi = _sps.lfilter_zi(b, a)
    padlen = 3 * max(len(a), len(b))
    return b, zi, padlen


# ---------------------------------------------------------------------------
# Device-side application
# ---------------------------------------------------------------------------


def odd_ext(x: jnp.ndarray, n: int) -> jnp.ndarray:
    """Odd extension around the endpoints, scipy.signal._arraytools.odd_ext."""
    if n < 1:
        return x
    if n > x.shape[-1] - 1:
        raise ValueError(
            f"Extension length {n} must be < signal length {x.shape[-1]}"
        )
    left = 2.0 * x[..., :1] - x[..., n:0:-1]
    right = 2.0 * x[..., -1:] - x[..., -2 : -(n + 2) : -1]
    return jnp.concatenate([left, x, right], axis=-1)


def _biquad_scan(x_t: jnp.ndarray, b: np.ndarray, a: np.ndarray, zi_t: jnp.ndarray):
    """One direct-form-II-transposed biquad over time.

    x_t: [T, ...] time-major; zi_t: [2, ...]. Returns (y_t [T, ...], zf [2, ...]).
    Recurrence identical to scipy's sosfilt inner loop.
    """
    b0, b1, b2 = (float(v) for v in b)
    a1, a2 = float(a[1]), float(a[2])

    def step(carry, xn):
        z0, z1 = carry
        yn = b0 * xn + z0
        z0n = b1 * xn - a1 * yn + z1
        z1n = b2 * xn - a2 * yn
        return (z0n, z1n), yn

    (z0f, z1f), y = jax.lax.scan(step, (zi_t[0], zi_t[1]), x_t)
    return y, jnp.stack([z0f, z1f])


def sosfilt(sos: np.ndarray, x: jnp.ndarray, zi: jnp.ndarray | None = None) -> jnp.ndarray:
    """Cascaded biquad filtering along the last axis (scipy.signal.sosfilt).

    ``zi`` has shape [ns, ..., 2] broadcastable against x's leading dims
    (scipy convention); None means zero initial state.
    """
    x_t = jnp.moveaxis(x, -1, 0)
    for s in range(sos.shape[0]):
        if zi is None:
            z = jnp.zeros((2,) + x_t.shape[1:], dtype=x.dtype)
        else:
            zs = jnp.moveaxis(zi[s], -1, 0)  # [2, ...]
            z = jnp.broadcast_to(zs, (2,) + x_t.shape[1:]).astype(x.dtype)
        x_t, _ = _biquad_scan(x_t, sos[s, :3], sos[s, 3:], z)
    return jnp.moveaxis(x_t, 0, -1)


def sosfiltfilt(sos: np.ndarray, zi: np.ndarray, padlen: int, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase SOS filtering along the last axis == scipy.signal.sosfiltfilt.

    sos/zi/padlen come from :func:`design_butter_sos`. Steps (scipy order):
    odd-extend by padlen → forward pass with zi scaled by first sample →
    reverse pass with zi scaled by (new) first sample → trim.
    """
    ext = odd_ext(x, padlen)
    zi_b = zi[:, None, :] if x.ndim > 1 else zi  # [ns, 1.., 2] broadcast
    while zi_b.ndim - 2 < x.ndim - 1:
        zi_b = zi_b[:, None, ...]
    x0 = ext[..., :1]
    y = sosfilt(sos, ext, zi=jnp.asarray(zi_b) * x0[None, ..., :])
    y = jnp.flip(y, axis=-1)
    y0 = y[..., :1]
    y = sosfilt(sos, y, zi=jnp.asarray(zi_b) * y0[None, ..., :])
    y = jnp.flip(y, axis=-1)
    return y[..., padlen:-padlen] if padlen > 0 else y


def _lfilter_scan(b: np.ndarray, a: np.ndarray, x: jnp.ndarray, zi: jnp.ndarray):
    """Direct-form-II-transposed lfilter along last axis with state zi [..., K]."""
    k = max(len(a), len(b)) - 1
    bb = np.zeros(k + 1)
    bb[: len(b)] = b
    aa = np.zeros(k + 1)
    aa[: len(a)] = a
    bb = bb / aa[0]
    aa = aa / aa[0]
    b_rest = jnp.asarray(bb[1:], dtype=x.dtype)
    a_rest = jnp.asarray(aa[1:], dtype=x.dtype)
    x_t = jnp.moveaxis(x, -1, 0)

    def step(z, xn):
        yn = bb[0] * xn + z[..., 0]
        shifted = jnp.concatenate(
            [z[..., 1:], jnp.zeros_like(z[..., :1])], axis=-1
        )
        zn = shifted + xn[..., None] * b_rest - yn[..., None] * a_rest
        return zn, yn

    zf, y = jax.lax.scan(step, zi, x_t)
    return jnp.moveaxis(y, 0, -1), zf


def filtfilt(b: np.ndarray, a: np.ndarray, zi: np.ndarray, padlen: int, x: jnp.ndarray) -> jnp.ndarray:
    """Zero-phase transversal filtering == scipy.signal.filtfilt (padtype odd).

    Used for the reference's FIR branch (script/mfcc.py:126: filtfilt(bFil,1,x)).
    """
    ext = odd_ext(x, padlen)
    zi_b = jnp.asarray(zi, dtype=x.dtype)
    zi_full = jnp.broadcast_to(zi_b, ext.shape[:-1] + zi_b.shape)
    y, _ = _lfilter_scan(b, a, ext, zi_full * ext[..., :1])
    y = jnp.flip(y, axis=-1)
    y2, _ = _lfilter_scan(b, a, y, zi_full * y[..., :1])
    y2 = jnp.flip(y2, axis=-1)
    return y2[..., padlen:-padlen] if padlen > 0 else y2


# ---------------------------------------------------------------------------
# applyFilter equivalent (reference script/mfcc.py:29-135 / calc.py:23-129)
# ---------------------------------------------------------------------------

_FILT_TYPES = ("bandpass", "lowpass", "highpass")


def resolve_filt_type(filt_type: str) -> str:
    """Partial-match filter type resolution, same rule as the reference
    (script/mfcc.py:88-92): prefix match against bandpass/lowpass/highpass."""
    matches = [t for t in _FILT_TYPES if t.startswith(filt_type)]
    if len(matches) != 1:
        raise ValueError(
            "filtType must be one among: lowpass, highpass, bandpass. "
            "Partial matches allowed."
        )
    return matches[0]


def apply_filter(
    x: jnp.ndarray,
    sr: float,
    *,
    filt: str = "iir",
    cut_off=(None,),
    filt_len: int = 6,
    filt_type: str = "low",
    poly_ord: int = 3,
) -> jnp.ndarray:
    """JAX equivalent of the reference's applyFilter (script/mfcc.py:29-135).

    Validation rules mirror the reference: cutoffs must be < sr/2 and
    monotonically increasing; 'sg' takes exactly one cutoff (unused).
    """
    if filt is None:
        raise ValueError(
            "Cannot apply filter without specifying a filter method among "
            "'iir', 'fir' and 'sg' (filt is None)."
        )
    if cut_off is None or (filt != "sg" and any(c is None for c in cut_off)):
        raise ValueError(
            "Cannot apply filter without specifying a cut Off freq. (CutOff is None)."
        )
    ftype = resolve_filt_type(filt_type)
    cut = np.asarray([c for c in cut_off if c is not None], dtype=np.float64)
    if filt != "sg":
        if np.any(cut >= sr / 2.0):
            raise ValueError(
                "Cut off frequencies must be smaller than the half of the "
                "sampling freq. of the signal submitted to the filter"
            )
        if cut.size > 1 and np.any(np.diff(cut) <= 0):
            raise ValueError("If two cut off freqs are provided: cutOff[0]<cutOff[1]")
        ok = (cut.size == 1 and ftype in ("lowpass", "highpass")) or (
            cut.size == 2 and ftype == "bandpass"
        )
        if not ok:
            raise ValueError(
                "only one or two cut off frequencies allowed. If two freqs are "
                "provided, filtType must be bandpass"
            )
        wn = tuple((cut / (sr / 2.0)).tolist())
    if filt == "iir":
        sos, zi, padlen = design_butter_sos(filt_len, wn, ftype)
        return sosfiltfilt(sos, zi, padlen, x)
    if filt == "fir":
        b, zi, padlen = design_firwin(filt_len, wn, ftype)
        return filtfilt(b, np.array([1.0]), zi, padlen, x)
    if filt == "sg":
        if len(cut_off) != 1:
            raise ValueError(
                "sg (savitsky Golay) filters can only be lowpass (one cutOff freq allowed)"
            )
        from modulation_mfcc_tpu.ops.savgol import savgol_filter_jax

        return savgol_filter_jax(x, filt_len, poly_ord, deriv=0)
    raise ValueError(f"Unknown filter kind {filt!r}")
