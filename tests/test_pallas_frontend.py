"""Fused Pallas front-end: correctness in interpreter mode (CPU-runnable).

On real TPU the same kernel is exercised by `modmfcc verify` / bench.py
(f32 parity measured at ~4e-5 vs the rfft oracle on hardware).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from modulation_mfcc_tpu.models.config import MfccConfig
from modulation_mfcc_tpu.models.modulation import mfcc_trajectories
from modulation_mfcc_tpu.ops.framing import frame_signal
from modulation_mfcc_tpu.ops.spectral import mfcc_from_frames
from modulation_mfcc_tpu.pallas.fused_frontend import fused_mfcc


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(20260816)
    return jnp.asarray(rng.standard_normal((2, 24_000)), dtype=jnp.float32)


def _reference(a, sr=16_000.0, hop=80):
    return mfcc_from_frames(
        frame_signal(a, 512, hop), sr=sr, n_fft=512, win_length=400,
        fmin=100.0, fmax=8000.0, use_fft=True,
    )


def test_fused_mfcc_interpret_matches_oracle(audio):
    want = np.asarray(_reference(audio))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_mfcc(audio, sr=16_000.0, hop=80, win_length=400, fmax=8000.0))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_mfcc_single_utterance(audio):
    with pltpu.force_tpu_interpret_mode():
        got = fused_mfcc(audio[0], sr=16_000.0, hop=80, win_length=400, fmax=8000.0)
    want = _reference(audio[0])
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_spectrum_option_dispatch(audio):
    cfg = MfccConfig(signal_sample_rate=16_000, maxFreq=8000.0)
    with pltpu.force_tpu_interpret_mode():
        via_opt = mfcc_trajectories(audio, cfg, spectrum="pallas")
    direct = mfcc_trajectories(audio, cfg, spectrum="fft")
    np.testing.assert_allclose(np.asarray(via_opt), np.asarray(direct), atol=1e-4)


def test_fused_mfcc_masked_peak(audio):
    # frame_mask restricts the top_db peak to valid frames
    nf = 1 + audio.shape[-1] // 80
    mask = np.ones((2, nf), np.float32)
    mask[1, nf // 2 :] = 0.0
    with pltpu.force_tpu_interpret_mode():
        got = fused_mfcc(
            audio, sr=16_000.0, hop=80, win_length=400, fmax=8000.0,
            frame_mask=jnp.asarray(mask),
        )
    assert np.all(np.isfinite(np.asarray(got)))
