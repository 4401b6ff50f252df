#!/usr/bin/env python
"""Headline benchmark: MFCC+modulation extraction throughput on TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: audio-hours of 16 kHz speech processed per second per chip through the
full modulation-cepstrum pipeline (framing → mel MFCC → per-coef zero-phase
Butterworth → derivative → norm → final low-pass), batched and jitted.

Baseline (BASELINE.json north star): ≥500 audio-hours/sec on a v5e-8, i.e.
62.5 audio-h/s/chip. vs_baseline = value / 62.5 (≥1.0 beats the target's
per-chip share). The reference itself publishes no numbers (BASELINE.md): its
implicit envelope is a single CPU core running librosa/scipy per file.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.parallel.batch import AudioBatch, batched_mfcc_change

    # 16 kHz analysis config (BASELINE.json configs #1/#5 rate), reference
    # parameter shape: 25 ms window, 5 ms hop, 13 MFCCs, n_fft 512.
    sr = 16_000
    cfg = MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)
    batch, seconds = 64, 30.0
    t_pad = int(seconds * sr)

    rng = np.random.default_rng(0)
    samples = jnp.asarray(rng.standard_normal((batch, t_pad)), dtype=jnp.float32)
    lengths = jnp.full((batch,), t_pad, dtype=jnp.int32)

    @jax.jit
    def step(s, l):
        tot, mask = batched_mfcc_change(AudioBatch(s, l), cfg, use_fft=True)
        return tot

    # warmup/compile
    step(samples, lengths).block_until_ready()
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(samples, lengths)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    audio_hours = batch * seconds * iters / 3600.0
    value = audio_hours / dt
    per_chip_target = 500.0 / 8.0
    print(
        json.dumps(
            {
                "metric": "mfcc_modulation_throughput",
                "value": round(value, 3),
                "unit": "audio-hours/sec/chip @16kHz",
                "vs_baseline": round(value / per_chip_target, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
