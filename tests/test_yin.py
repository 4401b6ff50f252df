"""pYIN validation: CMNDF correctness vs direct numpy + tracking accuracy."""
import numpy as np

import jax.numpy as jnp

from modulation_mfcc_tpu.models.config import F0Config
from modulation_mfcc_tpu.models.pitch import extract_f0
from modulation_mfcc_tpu.ops.yin import pyin_f0, yin_cmndf

SR = 10_000


def test_cmndf_matches_direct(rng):
    n, max_lag = 512, 200
    x = rng.standard_normal(n)
    w = n - max_lag
    d = np.zeros(max_lag + 1)
    for tau in range(max_lag + 1):
        diff = x[:w] - x[tau : tau + w]
        d[tau] = np.sum(diff**2)
    cm = np.ones(max_lag + 1)
    run = 0.0
    for tau in range(1, max_lag + 1):
        run += d[tau]
        cm[tau] = d[tau] * tau / run if run > 0 else 1.0
    got = np.asarray(yin_cmndf(jnp.asarray(x[None, :]), max_lag))[0]
    np.testing.assert_allclose(got, cm, rtol=1e-6, atol=1e-8)


def _harmonic(f0, dur=1.0, sr=SR):
    t = np.arange(int(dur * sr)) / sr
    return sum((0.7 / k) * np.sin(2 * np.pi * k * f0 * t) for k in range(1, 5))


def test_pyin_constant_tone():
    y = _harmonic(220.0)
    f0 = np.asarray(pyin_f0(jnp.asarray(y, dtype=jnp.float32), sr=SR))
    v = f0[f0 > 0]
    assert len(v) > 0.8 * len(f0)
    assert abs(np.median(v) - 220.0) < 220.0 * 0.006  # within the 0.1-semitone grid


def test_pyin_detects_unvoiced(rng):
    y = np.concatenate([0.01 * rng.standard_normal(SR // 2), _harmonic(150.0, 0.5)])
    f0 = np.asarray(pyin_f0(jnp.asarray(y, dtype=jnp.float32), sr=SR))
    n = len(f0)
    assert (f0[: n // 3] == 0).mean() > 0.6
    mid = f0[-n // 3 :]
    assert (mid > 0).mean() > 0.8
    assert abs(np.median(mid[mid > 0]) - 150.0) < 2.0


def test_extract_f0_pyin_method():
    y = _harmonic(180.0)
    cfg = F0Config(method="pyin", outFilter=None, interpUnvoiced="linear")
    f0, t = extract_f0(y, SR, cfg)
    v = f0[np.isfinite(f0)]
    assert abs(np.median(v) - 180.0) < 2.5
    assert t.shape == f0.shape


def test_sliding_cmndf_matches_framed(rng):
    from modulation_mfcc_tpu.ops.framing import frame_by_slices
    from modulation_mfcc_tpu.ops.yin import _sliding_cmndf

    for hop, w, ml, n in ((10, 64, 17, 500), (7, 50, 12, 301), (25, 100, 30, 800)):
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        nf = 1 + (n - (w + ml)) // hop
        frames = frame_by_slices(x, 0, nf, w + ml, hop)
        want = np.asarray(yin_cmndf(frames, ml))
        got = np.asarray(_sliding_cmndf(x, nf, hop, w, ml))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
