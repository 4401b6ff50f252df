"""Batched F0/envelope/formant extraction vs per-file results."""
import numpy as np

import jax.numpy as jnp

from modulation_mfcc_tpu.models.config import AmplitudeConfig, F0Config, FormantConfig
from modulation_mfcc_tpu.models.envelope import rms_envelope
from modulation_mfcc_tpu.ops.lpc import lpc_formants
from modulation_mfcc_tpu.ops.pitch import pitch_ac
from modulation_mfcc_tpu.parallel.batch import pad_batch
from modulation_mfcc_tpu.parallel.features_batch import (
    batched_envelope,
    batched_f0,
    batched_formants,
)

SR = 10_000


def _tones():
    t = np.arange(SR) / SR
    mk = lambda f, dur: sum(
        (0.7 / k) * np.sin(2 * np.pi * k * f * t[: int(dur * SR)]) for k in range(1, 4)
    )
    return [mk(140.0, 1.0), mk(200.0, 0.7), mk(110.0, 0.85)]


def test_batched_f0_matches_per_file():
    sigs = _tones()
    batch = pad_batch(sigs, bucket_multiple=1024)
    f0b, valid = batched_f0(batch, SR, F0Config())
    f0b, valid = np.asarray(f0b), np.asarray(valid)
    targets = [140.0, 200.0, 110.0]
    for i, (s, want) in enumerate(zip(sigs, targets)):
        nf = valid[i].sum()
        single = np.asarray(pitch_ac(jnp.asarray(s, dtype=jnp.float32), sr=float(SR)))
        v = f0b[i, : int(nf)]
        v = v[v > 0]
        assert abs(np.median(v) - want) < 3.0
        sv = single[single > 0]
        assert abs(np.median(v) - np.median(sv)) < 2.0


def test_batched_envelope_exact():
    sigs = _tones()
    batch = pad_batch(sigs, bucket_multiple=1024)
    cfg = AmplitudeConfig(method="RMS")
    amp, valid = batched_envelope(batch, SR, cfg)
    amp, valid = np.asarray(amp), np.asarray(valid)
    for i, s in enumerate(sigs):
        single = np.asarray(
            rms_envelope(jnp.asarray(s), int(cfg.winLen * SR), int(cfg.hopLen * SR))
        )
        nf = int(valid[i].sum())
        assert nf <= len(single)
        np.testing.assert_allclose(amp[i, :nf], single[:nf], atol=1e-6)


def test_batched_pyin_matches_per_file():
    """Corpus sweeps with features=('f0',) work for method='pyin' too
    (VERDICT round-1 item 10); frames are exact vs the per-file path."""
    from modulation_mfcc_tpu.ops.yin import pyin_f0

    sigs = _tones()
    batch = pad_batch(sigs, bucket_multiple=1024)
    cfg = F0Config(method="pyin")
    f0b, valid = batched_f0(batch, SR, cfg)
    f0b, valid = np.asarray(f0b), np.asarray(valid)
    for i, (s, want) in enumerate(zip(sigs, [140.0, 200.0, 110.0])):
        single = np.asarray(
            pyin_f0(jnp.asarray(s, dtype=jnp.float32), sr=float(SR))
        )
        nf = int(valid[i].sum())
        assert nf == len(single)
        v = f0b[i, :nf]
        voiced = (v > 0) & (single > 0)
        # frame-exact away from the decode boundary: compare medians + bulk
        assert abs(np.median(v[voiced]) - want) < 3.0
        agree = np.abs(v[voiced] - single[voiced]) < 1.0
        assert agree.mean() > 0.9


def test_batched_envelope_hilb():
    from modulation_mfcc_tpu.ops.hilbert import hilbert_envelope

    sigs = _tones()
    batch = pad_batch(sigs, bucket_multiple=1024)
    amp, valid = batched_envelope(batch, SR, AmplitudeConfig(method="Hilb"))
    amp, valid = np.asarray(amp), np.asarray(valid)
    for i, s in enumerate(sigs):
        n = int(valid[i].sum())
        assert n == len(s)
        single = np.asarray(hilbert_envelope(jnp.asarray(s, dtype=jnp.float32)))
        # interior parity (the padded-width FFT differs by edge ripple)
        m = n // 10
        np.testing.assert_allclose(amp[i, m : n - m], single[m : n - m], atol=2e-2)


def test_batched_formants_match_single(rng):
    import scipy.signal as sps

    # two noise-excited vowels, equal length (formant batch is same-rate)
    def vowel(fs):
        y = rng.standard_normal(8000)
        for fc, bw in zip(fs, (60.0, 90.0, 150.0)):
            r = np.exp(-np.pi * bw / 11000)
            th = 2 * np.pi * fc / 11000
            y = sps.lfilter([1.0], [1.0, -2 * r * np.cos(th), r * r], y)
        return (y / np.abs(y).max()).astype(np.float32)

    b = jnp.asarray(np.stack([vowel([700, 1200, 2600]), vowel([500, 1500, 2400])]))
    freqs, bws = batched_formants(b, 11_000.0, FormantConfig())
    freqs = np.asarray(freqs)
    for i in range(2):
        single_f, _ = lpc_formants(b[i], sr=11_000.0)
        np.testing.assert_allclose(
            freqs[i], np.asarray(single_f), atol=1e-2, equal_nan=True
        )
