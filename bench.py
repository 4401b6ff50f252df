#!/usr/bin/env python
"""Headline benchmark: MFCC+modulation extraction throughput on TPU.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Metric: audio-hours of 16 kHz speech per second per chip through the full
modulation-cepstrum pipeline (fused Pallas frame→DFT→mel front-end in bf16
with f32 accumulation — BASELINE.json config #5's corpus mode — plus the
FIR-operator zero-phase filters, derivative and norm). The f32 parity-grade
mode (max-abs err ≤1e-4 vs the CPU oracle; `modmfcc verify`) is reported in
the extra ``f32_parity_mode`` field.

Methodology notes (hard-won):
  * the runtime can dedupe identical (executable, input) executions and
    `block_until_ready` is unreliable over the remote tunnel, so the timing
    loop runs distinct inputs through a jitted `lax.map` over stacked
    batches with a single host readback as the barrier;
  * the remote tunnel adds ~30-45 ms of FIXED dispatch+readback latency per
    execution (measured: an (8,128) passthrough round-trips in ~46 ms) — a
    latency, not a throughput, cost. n_super=8 map iterations per execution
    amortize it to <2 ms/batch so the metric reflects steady-state
    throughput rather than tunnel latency;
  * baseline: ≥500 audio-h/s on a v5e-8 = 62.5/chip (BASELINE.json north
    star; the reference itself publishes no numbers — its envelope is one
    CPU core of librosa/scipy per file).
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


# per-trial seconds of the most recent _time_many call (r4 verdict #3:
# the i24 north-star margin was 0.4% against a stated ±3% daily variance —
# the artifact must carry repeat stats so "cleared" can be judged as
# median − spread ≥ bar, not a single best sample). _try converts these
# to per-trial h/s via the wrapper-stashed audio-hours factor.
_LAST_TRIALS: list = []


def _time_many(many, xs, n_super: int, trials: int = 5) -> float:
    """Best seconds per lax.map iteration — the hard-won timing rules in
    one place: materialize inputs first; compile+warm on xs[0]; each timed
    trial uses a stack DIFFERENT from the immediately preceding execution
    (identical (executable, input) pairs can be deduped by the runtime);
    the host readback float(jnp.sum(...)) is the barrier
    (block_until_ready is unreliable over the tunnel). All per-trial
    times land in _LAST_TRIALS for the artifact's repeat stats."""
    import jax.numpy as jnp

    for x in xs:
        float(jnp.sum(x))
    float(jnp.sum(many(xs[0])))  # compile + warm
    _LAST_TRIALS.clear()
    for trial in range(trials):
        t0 = time.perf_counter()
        float(jnp.sum(many(xs[(trial + 1) % len(xs)])))
        _LAST_TRIALS.append((time.perf_counter() - t0) / n_super)
    return min(_LAST_TRIALS)


def _hps(hours: float, best_s: float) -> float:
    """Convert best-seconds to audio-h/s and rewrite _LAST_TRIALS to
    per-trial h/s so _try can snapshot repeat stats in metric units."""
    _LAST_TRIALS[:] = [hours / t for t in _LAST_TRIALS]
    return hours / best_s


def _throughput(spectrum: str, batch: int, seconds: float, n_super: int) -> float:
    import jax
    import jax.numpy as jnp  # noqa: F401

    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.models.modulation import mfcc_change

    sr = 16_000
    cfg = MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)
    t_pad = int(seconds * sr)
    # inputs generated ON DEVICE — multi-GB host uploads through the remote
    # tunnel would dominate wall-clock and pollute the timing
    keys = jax.random.split(jax.random.PRNGKey(0), 2)
    gen = jax.jit(lambda k: jax.random.normal(k, (n_super, batch, t_pad), jnp.float32))
    xs = [gen(k) for k in keys]

    @jax.jit
    def many(stack):
        return jax.lax.map(lambda x: jnp.sum(mfcc_change(x, cfg, spectrum=spectrum)), stack)

    best = _time_many(many, xs, n_super)
    return _hps(batch * seconds / 3600.0, best)


def _rows_throughput(spectrum: str, batch: int, seconds: float, n_super: int) -> float:
    """Throughput from audio AT REST in the zero-prep hop-rows contract
    (pallas/fused_frontend.pack_hop_rows): PCM pre-laid-out in the fused
    kernel's hop-row format. bf16/i16 spectra take int16 rows (dequantized
    during VMEM staging); the f32-staged parity spectra (f32/x3/i24) take
    f32 rows of the SAME dequantized audio. This is the corpus-serving
    number — the sweep's batch assembler emits this layout for free, and
    the device then runs zero prep passes (the flat path's ~1-2 ms/batch
    of pad/cast/relayout data movement is gone)."""
    import jax
    import jax.numpy as jnp

    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.models.modulation import mfcc_change
    from modulation_mfcc_tpu.pallas.fused_frontend import pack_hop_rows

    sr = 16_000
    cfg = MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)
    t_pad = int(seconds * sr)
    keys = jax.random.split(jax.random.PRNGKey(0), 2)

    @jax.jit
    def gen(k):
        x = jax.random.normal(k, (n_super, batch, t_pad), jnp.float32)
        pcm = jnp.clip(x * 8000.0, -32768, 32767).astype(jnp.int16)
        if spectrum in ("pallas", "pallas_x3", "pallas_i24"):
            pcm = pcm.astype(jnp.float32) * 2.0**-15
        return jax.vmap(
            lambda b: pack_hop_rows(b, hop=cfg.hop_length, n_fft=cfg.n_fft,
                                    win_length=cfg.win_length)
        )(pcm)

    xs = [gen(k) for k in keys]

    @jax.jit
    def many(stack):
        return jax.lax.map(
            lambda x: jnp.sum(
                mfcc_change(x, cfg, spectrum=spectrum, n_samples=t_pad)
            ),
            stack,
        )

    best = _time_many(many, xs, n_super)
    return _hps(batch * seconds / 3600.0, best)


def _tracker_throughput(batch: int, seconds: float, n_super: int, safe: bool = False) -> float:
    """Praat-class tracker sweep (f0 ac + formants + RMS envelope +
    intensity) in one jitted program — audio-h/s/chip at 10 kHz."""
    import jax
    import jax.numpy as jnp

    from modulation_mfcc_tpu.models.envelope import rms_envelope
    from modulation_mfcc_tpu.ops.intensity import intensity_db
    from modulation_mfcc_tpu.ops.lpc import lpc_formants
    from modulation_mfcc_tpu.ops.pitch import pitch_ac

    sr = 10_000
    t_pad = int(seconds * sr)
    keys = jax.random.split(jax.random.PRNGKey(1), 2)
    gen = jax.jit(lambda k: jax.random.normal(k, (n_super, batch, t_pad), jnp.float32))
    xs = [gen(k) for k in keys]

    # safe = conservative engines (FFT autocorrelation + XLA sinc band);
    # the default auto path is XLA sinc + MXU real-DFT autocorrelation
    kw = {"sinc_engine": "xla", "ac_engine": "fft"} if safe else {}

    def one(y):
        f0 = pitch_ac(y, sr=float(sr), **kw)
        fr, _ = lpc_formants(y, sr=float(sr))
        env = rms_envelope(y, 250, 50)
        idb = intensity_db(y, sr=float(sr))
        return jnp.sum(f0) + jnp.nansum(fr) + jnp.sum(env) + jnp.sum(idb)

    @jax.jit
    def many(stack):
        return jax.lax.map(lambda xb: jnp.sum(jax.vmap(one)(xb)), stack)

    best = _time_many(many, xs, n_super)
    return _hps(batch * seconds / 3600.0, best)


def _pyin_throughput(
    batch: int, seconds: float, n_super: int, sr: int = 10_000, safe: bool = False
) -> float:
    """Probabilistic-YIN sweep (librosa.pyin parity path: sliding CMNDF,
    sorted-segment threshold sweep, dense max-plus Viterbi) — audio-h/s/chip,
    same distinct-inputs lax.map methodology as the others."""
    import jax
    import jax.numpy as jnp

    from modulation_mfcc_tpu.ops.yin import pyin_f0
    t_pad = int(seconds * sr)
    keys = jax.random.split(jax.random.PRNGKey(2), 2)
    gen = jax.jit(lambda k: jax.random.normal(k, (n_super, batch, t_pad), jnp.float32))
    xs = [gen(k) for k in keys]

    # safe = conservative engines (XLA Viterbi + FFT CMNDF, the oracle-
    # pinned librosa-parity forms); auto is XLA Viterbi + MXU CMNDF
    kw = {"viterbi_engine": "xla", "cmndf_engine": "fft"} if safe else {}

    @jax.jit
    def many(stack):
        def one_batch(xb):
            return jnp.sum(jax.vmap(lambda y: pyin_f0(y, sr=float(sr), **kw))(xb))

        return jax.lax.map(one_batch, stack)

    best = _time_many(many, xs, n_super)
    return _hps(batch * seconds / 3600.0, best)


def _modspec_throughput(batch: int = 128, seconds: float = 30.0, n_super: int = 8) -> float:
    """BASELINE config #3: batched second-stage STFT over the MFCC
    coefficient trajectories (modulation power spectrum) — audio-h/s/chip
    at 16 kHz through the bf16 front-end + the trajectory STFT."""
    import jax
    import jax.numpy as jnp

    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.models.modulation import modulation_spectrum

    sr = 16_000
    cfg = MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)
    t_pad = int(seconds * sr)
    keys = jax.random.split(jax.random.PRNGKey(6), 2)
    gen = jax.jit(lambda k: jax.random.normal(k, (n_super, batch, t_pad), jnp.float32))
    xs = [gen(k) for k in keys]

    @jax.jit
    def many(stack):
        return jax.lax.map(
            lambda x: jnp.sum(modulation_spectrum(x, cfg, spectrum="pallas_bf16")),
            stack,
        )

    best = _time_many(many, xs, n_super)
    return _hps(batch * seconds / 3600.0, best)


def _masked_batch_throughput(n_super: int = 8) -> float:
    """BASELINE config #2: 64 VARIABLE-length utterances, padded+masked
    modulation-cepstrum (exact per-file edges via ops/masked.py) —
    REAL audio-h/s/chip at 16 kHz (padding excluded from the numerator)."""
    import jax
    import jax.numpy as jnp

    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.parallel.batch import AudioBatch, batched_mfcc_change

    sr = 16_000
    cfg = MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)
    rng = np.random.default_rng(3)
    lengths = rng.integers(int(8 * sr), int(30 * sr), size=64)
    t_pad = int(30 * sr)
    lj = jnp.asarray(lengths.astype(np.int32))
    keys = jax.random.split(jax.random.PRNGKey(4), 2)
    gen = jax.jit(lambda k: jax.random.normal(k, (n_super, 64, t_pad), jnp.float32))
    xs = [gen(k) for k in keys]

    # masked_fir=True: the FIR-operator masked filtfilt (scan-free, exact ==
    # scipy for utterances with >= min_len trajectory frames; the operator
    # for this cfg has min_len 744 frames = 7.44 s and every length above is
    # >= 8 s). Measured 2.9x the scan form on v5e (28.3 vs 9.9 h/s) — the
    # scan path remains the fallback for sub-min_len utterances.
    @jax.jit
    def many(stack):
        def one_batch(xb):
            tot, mask = batched_mfcc_change(
                AudioBatch(xb, lj), cfg, spectrum="pallas_bf16", masked_fir=True
            )
            return jnp.sum(jnp.where(mask > 0, tot, 0.0))

        return jax.lax.map(one_batch, stack)

    best = _time_many(many, xs, n_super)
    return _hps(float(lengths.sum()) / sr / 3600.0, best)


def _longform_1h_seconds() -> float:
    """BASELINE config #4: one 1-hour 48 kHz recording through the chunked
    streaming path (f32) — wall seconds for the warm program (distinct
    input from the warm-up run; the single readback is the barrier).

    The 48 kHz input is polyphase-resampled ON DEVICE to the 16 kHz
    analysis rate first — the reference's own pipeline analyzes at its
    configured sample rate (its n_fft=512 cannot hold a 25 ms window at
    48 kHz any more than ours can), so the honest config-#4 program is
    resample + chunked extraction, not native-48k analysis."""
    import jax
    import jax.numpy as jnp

    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.ops.resample import resample_device
    from modulation_mfcc_tpu.parallel.streaming import chunked_mfcc_change

    sr = 48_000
    cfg = MfccConfig(signal_sample_rate=16_000, maxFreq=8000.0)
    n = 3600 * sr
    keys = jax.random.split(jax.random.PRNGKey(5), 2)
    gen = jax.jit(lambda k: jax.random.normal(k, (n,), jnp.float32))
    run = jax.jit(
        lambda y: jnp.sum(
            chunked_mfcc_change(resample_device(y, float(sr), 16_000.0), cfg)
        )
    )
    x0, x1 = gen(keys[0]), gen(keys[1])
    float(jnp.sum(x0)), float(jnp.sum(x1))
    float(run(x0))  # compile + warm
    t0 = time.perf_counter()
    float(run(x1))
    return time.perf_counter() - t0


def _corpus_throughput(n_files: int = 96, seconds: float = 30.0) -> float:
    """END-TO-END corpus sweep: WAV files on disk → native decode → host
    bucketing/prefetch → bf16 device extraction → per-file .npz records.

    This is BASELINE config #5's shape (the only number that includes the
    host I/O pipeline — SURVEY.md §7 hard-part 5 says the bottleneck is
    host decode, so the device-only headline can't stand in for it).
    Audio-hours per WALL second, manifest→npz inclusive.
    """
    import shutil
    import tempfile

    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.parallel.corpus import CorpusSweep, sweep_mfcc_change

    sr = 16_000
    root = tempfile.mkdtemp(prefix="modmfcc_bench_corpus_")
    try:
        paths = _gen_corpus(root, n_files, seconds, sr)
        cfg = MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)

        def run(subset, tag):
            sweep = CorpusSweep(
                out_dir=f"{root}/out_{tag}",
                cfg=cfg,
                batch_size=32,
                spectrum="pallas_bf16",
                resume=False,
            )
            t0 = time.perf_counter()
            report = sweep_mfcc_change(subset, sweep)
            return time.perf_counter() - t0, report

        # warm with one FULL batch so the warm run compiles the same
        # batch-32 executable the main run uses (a 2-file warm compiles a
        # separate masked tiny-batch program — minutes on the remote
        # compile service, entirely avoidable)
        run(paths[: min(32, n_files)], "warm")
        wall, report = run(paths, "main")
        # per-stage breakdown into the artifact (r3 verdict #3: the
        # end-to-end number must show WHERE the wall went)
        _LAST_CORPUS_STATS.clear()
        _LAST_CORPUS_STATS.update(report.get("stages", {}))
        _LAST_CORPUS_STATS["wall_s"] = round(wall, 3)
        return n_files * seconds / 3600.0 / wall
    finally:
        shutil.rmtree(root, ignore_errors=True)


# stage breakdown of the last _corpus_throughput main run (artifact field)
_LAST_CORPUS_STATS: dict = {}


def _gen_corpus(root: str, n_files: int, seconds: float, sr: int) -> list:
    from modulation_mfcc_tpu.io.wav import write_wav

    rng = np.random.default_rng(0)
    paths = []
    for i in range(n_files):
        y = (0.3 * rng.standard_normal(int(seconds * sr))).astype(np.float32)
        p = f"{root}/utt_{i:04d}.wav"
        write_wav(p, y, sr)
        paths.append(p)
    return paths


def _corpus_2shard_throughput(n_files: int = 64, seconds: float = 30.0) -> float:
    """The --num-shards multi-process host-feeding path (r3 verdict #3:
    it existed but was never exercised): two `modmfcc sweep` PROCESSES,
    each sweeping its manifest shard into its own output dir, concurrently
    against the one chip. 64 files so each shard is exactly one batch-32
    program (reuses the shape the corpus_sweep field just compiled into
    the persistent cache — a smaller shard would be a NEW masked shape
    and minutes of remote compile; r4 verdict #7 capped this field's wall
    cost). Audio-hours per second of the UNION of the two shards' sweep
    windows (per-process init excluded — see below).

    Measured close-out (2026-08-20, docs/DESIGN.md §10): on the axon
    tunnel this is an ANTI-PATTERN — two clients against one tunneled
    chip serialize with ~0.5 s/switch overhead (per-shard fetch_wait_s
    0.7 → 28-33 s, link split 7.1 MB/s/shard), measuring ~5x WORSE than
    one process. The field stays because it exercises the --num-shards
    host-feeding machinery end-to-end and documents the serialization;
    the deployment shape it stands in for is one shard per CHIP."""
    import shutil
    import subprocess
    import tempfile

    sr = 16_000
    root = tempfile.mkdtemp(prefix="modmfcc_bench_corpus2_")
    try:
        _gen_corpus(root, n_files, seconds, sr)
        # the shards must run the SAME 16 kHz config/program as the
        # corpus_sweep field (the CLI default is the reference's 10 kHz,
        # which would resample and compile a fresh program per process)
        from modulation_mfcc_tpu.models.config import (
            MfccConfig, PipelineConfig, save_config,
        )

        cfg_path = f"{root}/cfg.json"
        save_config(
            PipelineConfig(
                mfcc=MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)
            ),
            cfg_path,
        )
        cmd = [
            sys.executable, "-m", "modulation_mfcc_tpu.cli", "sweep", root,
            "--batch-size", "32", "--spectrum", "pallas_bf16", "--no-resume",
            "--num-shards", "2", "--config", cfg_path,
        ]
        # stderr to FILES, not pipes: a pipe would need concurrent
        # draining (shard 1 blocks on a full 64 KB buffer while we wait on
        # shard 0), and the corpus.start/finish events are read after exit
        # anyway. Kill in finally so a hung tunnel can't leak two sweep
        # processes contending with the rest of the bench run.
        err_paths = [f"{root}/shard_{i}.stderr" for i in range(2)]
        # the shards must KEEP their corpus.start/finish events (the sweep
        # windows are parsed from these files) even though bench silences
        # its own in-process events for the artifact-line contract
        import os as osmod

        shard_env = {
            k: v for k, v in osmod.environ.items() if k != "MODMFCC_LOG_SILENT"
        }
        procs = []
        try:
            for i in range(2):
                with open(err_paths[i], "w") as ef:
                    procs.append(subprocess.Popen(
                        cmd + ["--shard-id", str(i), "--out", f"{root}/out_{i}"],
                        stdout=subprocess.DEVNULL, stderr=ef, env=shard_env,
                    ))
            # registered so a watchdog handoff can kill them before the
            # resume child contends for the one tunneled chip (ADVICE r4)
            _LIVE_SUBPROCS.extend(procs)
            rcs = [p.wait(timeout=900) for p in procs]
        finally:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.wait(timeout=30)
                if p in _LIVE_SUBPROCS:
                    _LIVE_SUBPROCS.remove(p)
        if any(rcs):
            raise RuntimeError(f"shard process failed: rcs={rcs}")
        import glob as globmod

        n_out = sum(
            len(globmod.glob(f"{root}/out_{i}/*.npz")) for i in range(2)
        )
        if n_out != n_files:
            raise RuntimeError(f"expected {n_files} records, got {n_out}")
        # Time the UNION of the two shards' sweep windows (corpus.start →
        # corpus.finish events on each shard's stderr), not process wall:
        # each subprocess pays interpreter + remote-backend init +
        # compile-cache read (~1-3 min on a cold/slow tunnel) before its
        # sweep starts — a one-time cost that amortizes over a real corpus
        # of hours, and which the single-process corpus_sweep field does
        # not pay either (it benches in-process). The union still charges
        # any serialization between the shards.
        windows = []
        stats2: dict = {}
        for si, ep in enumerate(err_paths):
            with open(ep) as ef:
                err = ef.read()
            t_start = t_finish = None
            stages: dict = {}
            for line in err.splitlines():
                try:
                    rec = json.loads(line)
                except ValueError:
                    continue
                if rec.get("event") == "corpus.start":
                    t_start = rec["ts"]
                elif rec.get("event") == "corpus.finish":
                    t_finish = rec["ts"]
                    stages = rec.get("stages", {})
            if t_start is None or t_finish is None:
                raise RuntimeError("shard stderr missing corpus events")
            windows.append((t_start, t_finish))
            # per-shard stage stats into the artifact: the number is only
            # interpretable with them (2026-08-20 diagnostic: two tunnel
            # clients on ONE chip serialize — each shard's fetch_wait_s
            # ballooned 0.7 → 28-33 s and the link split to 7.1 MB/s/shard,
            # so 2-shard measured 5x WORSE than one process; see
            # docs/DESIGN.md §10)
            stats2[f"shard{si}"] = {
                k: stages[k]
                for k in ("upload_busy_s", "fetch_wait_s", "link_mbps")
                if k in stages
            }
        wall = max(w[1] for w in windows) - min(w[0] for w in windows)
        stats2["union_wall_s"] = round(wall, 3)
        # publish only on success: a failed field must not leave
        # partial per-shard stats in the artifact
        _LAST_2SHARD_STATS.clear()
        _LAST_2SHARD_STATS.update(stats2)
        return n_files * seconds / 3600.0 / wall
    finally:
        shutil.rmtree(root, ignore_errors=True)


# per-shard stage breakdown of the last 2-shard run (artifact field)
_LAST_2SHARD_STATS: dict = {}

# live shard subprocesses of an in-flight field: the watchdog handoff kills
# these before spawning the resume child, so a hung 2-shard run can't leave
# two sweep processes contending with the child on the one chip
_LIVE_SUBPROCS: list = []


def _speechlike_batch(sr: int, seconds: float = 3.0, nb: int = 2):
    """Deterministic speech-like rows (AM harmonics + noise + silence
    flanks) for the cross-engine gates — noise-only audio sits on voicing
    decision boundaries, where legitimate reduction-order deltas flip
    frames; real-statistics audio is what the engines must agree on."""
    import numpy as np

    rng = np.random.default_rng(20260818)
    t = np.arange(int(seconds * sr)) / sr
    out = []
    for b in range(nb):
        f0 = 110.0 + 25.0 * b + 30.0 * np.sin(2 * np.pi * (2.0 + b) * t)
        phase = 2 * np.pi * np.cumsum(f0) / sr
        sig = sum((0.6 / k) * np.sin(k * phase) for k in range(1, 6))
        env = 0.5 * (1 + np.sin(2 * np.pi * 4.0 * t - np.pi / 2))
        sig = sig * env + 0.01 * rng.standard_normal(len(t))
        sig[: sr // 10] = 0.0
        sig[-sr // 10 :] = 0.0
        out.append(sig)
    return np.stack(out).astype(np.float32)


def _pitch_engines_agree(sr: int = 10_000) -> float:
    """Raise unless the default fast engines (MXU real-DFT autocorrelation
    + XLA sinc band) match the conservative FFT form on this runtime
    (speechlike rows: voicing ≥98% identical, ≤0.5 Hz on agreeing voiced
    frames). Run ONCE per bench; failure demotes the tracker field to the
    conservative engines."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from modulation_mfcc_tpu.ops.pitch import pitch_ac

    yq = jnp.asarray(_speechlike_batch(sr))
    fa = np.asarray(jax.vmap(lambda s: pitch_ac(s, sr=float(sr)))(yq))
    fx = np.asarray(
        jax.vmap(
            lambda s: pitch_ac(s, sr=float(sr), sinc_engine="xla", ac_engine="fft")
        )(yq)
    )
    va = (fa > 0) == (fx > 0)
    dv = np.abs(np.where(va & (fx > 0), fa - fx, 0.0))
    if va.mean() < 0.98 or np.nanmax(dv) > 0.5:
        raise RuntimeError("fast pitch engines disagree with fft/xla on-device")
    return 1.0


def _pyin_engines_agree(sr: int = 10_000) -> float:
    """Raise unless the default fast path (MXU CMNDF + XLA Viterbi)
    matches the oracle-pinned FFT form on this runtime (voicing ≥99%
    identical, ≤0.5 Hz on agreeing voiced frames — the CMNDF engines
    differ only in float reduction order, measured decode-identical on
    this fixture on v5e)."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from modulation_mfcc_tpu.ops.yin import pyin_f0

    yq = jnp.asarray(_speechlike_batch(sr))
    fa = np.asarray(jax.vmap(lambda s: pyin_f0(s, sr=float(sr)))(yq))
    fx = np.asarray(
        jax.vmap(
            lambda s: pyin_f0(
                s, sr=float(sr), viterbi_engine="xla", cmndf_engine="fft"
            )
        )(yq)
    )
    va = (fa > 0) == (fx > 0)
    dv = np.abs(np.where(va & (fx > 0), fa - fx, 0.0))
    if va.mean() < 0.99 or np.nanmax(dv) > 0.5:
        raise RuntimeError("fast pyin engines disagree with fft/xla on-device")
    return 1.0


def _await_backend(max_tries: int | None = None, wait_s: float = 120.0) -> bool:
    """Don't let a transient tunnel outage cost the round its artifact.

    The remote TPU backend occasionally fails to initialize (UNAVAILABLE)
    or hangs; jax caches a failed init for the process lifetime, so probe
    it in a SUBPROCESS and re-check with backoff before touching jax here.
    Bounded: after max_tries the real error propagates from the first
    measurement instead.
    """
    import os
    import subprocess

    if max_tries is None:
        # 12 tries ≈ 1 h of patience for a dead tunnel at round end (each
        # try: ≤3 min probe + 2 min backoff) — the 2026-08-17 outage lasted
        # many hours and the artifact is worth waiting for
        max_tries = int(os.environ.get("MODMFCC_BENCH_BACKEND_TRIES", "12"))
    for attempt in range(max_tries):
        try:
            # import the package first: it enables the persistent
            # compilation cache, so the probe program compiles remotely
            # at most once EVER — a degraded-slow tunnel (2026-08-20:
            # cold compiles >4 min) would otherwise time out every probe
            # forever even though the device works
            r = subprocess.run(
                [sys.executable, "-c",
                 "import modulation_mfcc_tpu;"
                 "import jax, jax.numpy as jnp;"
                 "print(float(jnp.sum(jnp.ones((8, 128)))))"],
                timeout=float(os.environ.get(
                    "MODMFCC_BENCH_PROBE_TIMEOUT", "180")),
                capture_output=True, env=os.environ,
            )
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if attempt < max_tries - 1:
            print(f"# backend probe {attempt + 1}/{max_tries} failed; "
                  f"retrying in {wait_s:.0f}s", file=sys.stderr)
            time.sleep(wait_s)
        else:
            print(f"# backend probe {attempt + 1}/{max_tries} failed",
                  file=sys.stderr)
    return False


def _tests_green() -> dict:
    """Read the conftest suite stamp (.pytest_status.json) and judge it
    against the HEAD being benched. `tests_green` is True only for a
    passing, un-subset (`-k`-free) full-suite run at this exact commit —
    the round-3 artifact shipped from a red suite and nothing caught it."""
    import pathlib
    import subprocess

    repo = pathlib.Path(__file__).resolve().parent
    out: dict = {"tests_green": None, "tests_green_detail": "no suite stamp"}
    p = repo / ".pytest_status.json"
    if not p.exists():
        return out
    try:
        stamp = json.loads(p.read_text())
        head = subprocess.run(
            ["git", "-C", str(repo), "rev-parse", "HEAD"],
            capture_output=True, text=True, timeout=10,
        ).stdout.strip()
    except Exception as e:  # noqa: BLE001
        out["tests_green_detail"] = f"stamp unreadable: {e!r}"
        return out
    reasons = []
    if stamp.get("exitstatus") != 0:
        reasons.append(f"exitstatus={stamp.get('exitstatus')}")
    if stamp.get("deselected"):
        reasons.append(f"{stamp['deselected']} tests deselected")
    if not stamp.get("full_run"):
        reasons.append("stamp is not a whole-tests-dir run")
    if head and stamp.get("git_head") != head:
        reasons.append(f"stamp at {str(stamp.get('git_head'))[:12]} != HEAD {head[:12]}")
    out["tests_green"] = not reasons
    out["tests_green_detail"] = (
        f"full suite ({stamp.get('collected')} tests) green at HEAD"
        if not reasons else "; ".join(reasons)
    )
    return out


class _Watchdog:
    """Hand off to a resume subprocess — or emit the PARTIAL artifact —
    and hard-exit if a field hangs.

    The 2026-08-19 tunnel mode: backend init succeeds, then device
    execution blocks FOREVER inside C++ (no exception, GIL released, so
    neither ``except`` nor SIGALRM can fire in the main thread). The
    subprocess probe catches this *before* the run; this thread catches it
    *mid*-run. After ``timeout_s`` without the main thread disarming it
    first tries ``handoff(field)`` — main() wires that to spawn
    ``bench.py --resume <state>`` which skips the hung field and runs the
    REST (one hang must not cost every later field; the child's single
    artifact line is forwarded as ours). If the handoff is exhausted
    (depth cap) or fails, it prints whatever fields already completed as
    the artifact of record. Either way it ``os._exit``\\ s so the driver
    is never left hanging."""

    def __init__(self, emit, timeout_s: float, handoff=None, record_hang=None):
        import threading

        self.emit = emit
        self.timeout_s = timeout_s
        self.handoff = handoff
        self.record_hang = record_hang
        # set the instant the deadline expires: from then on the WATCHDOG
        # owns the process outcome. A slow-but-alive main thread checks it
        # and goes passive (no new device work, no competing artifact line
        # while the resume child runs — the 2-shard measurement in DESIGN
        # §10 shows two clients on one chip corrupt both sets of numbers).
        self.fired = threading.Event()
        self.deadline: float | None = None
        self.field = ""
        self._lock = threading.Lock()
        t = threading.Thread(target=self._watch, daemon=True)
        t.start()

    def arm(self, field: str) -> None:
        # monotonic: an NTP wall-clock step must neither fire the watchdog
        # spuriously (step forward) nor delay real hang detection (backward)
        with self._lock:
            self.field = field
            self.deadline = time.monotonic() + self.timeout_s

    def disarm(self) -> None:
        with self._lock:
            self.deadline = None

    def _watch(self) -> None:
        import os

        while True:
            time.sleep(10.0)
            with self._lock:
                d, field = self.deadline, self.field
            if d is not None and time.monotonic() > d:
                self.fired.set()
                print(f"# field {field!r} hung > {self.timeout_s:.0f}s",
                      file=sys.stderr)
                if self.record_hang is not None:
                    try:
                        # the hung field must appear in hung_fields on the
                        # FALLBACK path too, not only via the child's state
                        self.record_hang(field)
                    except Exception:  # noqa: BLE001
                        pass
                handed_off = False
                if self.handoff is not None:
                    try:
                        handed_off = bool(self.handoff(field))
                    except Exception as e:  # noqa: BLE001
                        print(f"# resume handoff failed: {e!r}",
                              file=sys.stderr)
                try:
                    # the watchdog's ONE job is terminating the hung
                    # process — a bug in artifact assembly must not leave
                    # it hanging forever with only this thread dead
                    if not handed_off:
                        print("# emitting partial artifact", file=sys.stderr)
                        self.emit(error=f"{field} hung; partial artifact")
                    sys.stdout.flush()
                    sys.stderr.flush()
                finally:
                    os._exit(0)


def _sync_docs(artifact_path: str | None = None) -> int:
    """Regenerate README.md's BENCH block from the newest BENCH_r*.json
    (or the given artifact path) so the number of record appears exactly
    once (round-3 verdict #7: hand-copied README numbers drifted from the
    artifact two rounds in a row)."""
    import glob
    import pathlib
    import re

    repo = pathlib.Path(__file__).resolve().parent
    if artifact_path is None:
        arts = sorted(glob.glob(str(repo / "BENCH_r*.json")))
        if not arts:
            print("no BENCH_r*.json artifact found", file=sys.stderr)
            return 1
        artifact_path = arts[-1]
    art = json.loads(pathlib.Path(artifact_path).read_text())
    if "parsed" in art:  # driver wrapper: {n, cmd, rc, tail, parsed}
        art = art["parsed"]
    name = pathlib.Path(artifact_path).name

    def fmt(v, unit=""):
        return "—" if v is None else f"{v}{unit}"

    rows = [
        ("bf16 corpus mode (headline)", fmt(art.get("value")),
         f"{art['vs_baseline']}× north star" if art.get("vs_baseline") else "—"),
        ("bf16, hop-rows at rest (zero-prep serving)", fmt(art.get("bf16_rows")), ""),
        ("i16 (exact for int16-PCM audio)", fmt(art.get("i16_parity_mode")), ""),
        ("i16, hop-rows at rest", fmt(art.get("i16_rows")), ""),
        ("x3 (≤1e-4 at the deliverable)", fmt(art.get("f32_x3_mode")), ""),
        ("x3, hop-rows at rest", fmt(art.get("x3_rows")), ""),
        ("i24 (≤1e-4 MFCC, any f32 audio)", fmt(art.get("i24_parity_mode")), ""),
        ("i24, hop-rows at rest", fmt(art.get("i24_rows")), ""),
        ("f32 HIGHEST parity mode", fmt(art.get("f32_parity_mode")), ""),
        ("modspec_batch", fmt(art.get("modspec_batch")), ""),
        ("masked_batch_64", fmt(art.get("masked_batch_64")), ""),
        ("tracker_sweep (ac+formants+env+intensity)", fmt(art.get("tracker_sweep")), ""),
        ("pyin_sweep @10 kHz / @16 kHz",
         f"{fmt(art.get('pyin_sweep'))} / {fmt(art.get('pyin_sweep_16k'))}", ""),
        ("corpus_sweep (end-to-end, host+link)", fmt(art.get("corpus_sweep")), ""),
    ]
    lines = [
        f"<!-- BENCH:BEGIN — generated by `python bench.py --sync-docs`; do not edit by hand -->",
        f"Single v5e chip, 16 kHz, full pipeline — from `{name}`"
        " (audio-hours/sec unless noted):",
        "",
        "| bench field | audio-h/s | note |",
        "|---|---|---|",
        *(f"| {k} | **{v}** | {n} |" for k, v, n in rows),
        f"| longform_1h_s (1 h @48 kHz, wall) | **{fmt(art.get('longform_1h_s'))}** | seconds |",
        "<!-- BENCH:END -->",
    ]
    block = "\n".join(lines)
    readme = repo / "README.md"
    text = readme.read_text()
    new, n = re.subn(
        r"<!-- BENCH:BEGIN[^>]*-->.*?<!-- BENCH:END -->", block, text,
        count=1, flags=re.S,
    )
    if n != 1:
        print("README.md BENCH markers not found", file=sys.stderr)
        return 1
    readme.write_text(new)
    print(f"README.md BENCH block regenerated from {name}")

    # DESIGN §5's tier table is generated from the same artifact (r4
    # verdict #4: hand-copied DESIGN numbers drifted from the artifact —
    # README was generated, DESIGN carried the drift instead). A tier
    # clears the 62.5 bar ROBUSTLY only when median − spread over the
    # artifact's repeat trials stays at/above it (r4 verdict #3).
    bar = 62.5
    stats = art.get("repeat_stats") or {}

    def verdict(value, label):
        if value is None:
            return "—"
        st = stats.get(label)
        if not st:
            return (f"clears (single sample)" if value >= bar
                    else "below bar") + f" @ {value}"
        spread = round(st["max"] - st["min"], 3)
        lo = round(st["median"] - spread, 3)
        if lo >= bar:
            return f"ROBUST (median {st['median']} − spread {spread} ≥ {bar})"
        if value >= bar:
            return f"marginal (median {st['median']} − spread {spread} = {lo} < {bar})"
        return f"below bar (median {st['median']})"

    tiers = [
        ("bf16 (corpus grade)", art.get("value"), "bf16_headline",
         art.get("bf16_rows"), "bf16_rows"),
        ("i16 (f32-grade MFCC; exact for int16 PCM)",
         art.get("i16_parity_mode"), "i16_parity_mode",
         art.get("i16_rows"), "i16_rows"),
        ("x3 (≤1e-4 deliverable)", art.get("f32_x3_mode"), "f32_x3_mode",
         art.get("x3_rows"), "x3_rows"),
        ("i24 (≤1e-4 MFCC, any f32 audio)", art.get("i24_parity_mode"),
         "i24_parity_mode", art.get("i24_rows"), "i24_rows"),
        ("f32 (HIGHEST)", art.get("f32_parity_mode"), "f32_parity_mode",
         None, None),
    ]
    rows5 = [
        f"| {tier} | {fmt(vf)} | {verdict(vf, lf)} | {fmt(vr)} | "
        f"{verdict(vr, lr) if lr else '—'} |"
        for tier, vf, lf, vr, lr in tiers
    ]
    block5 = "\n".join([
        "<!-- BENCH5:BEGIN — generated by `python bench.py --sync-docs`;"
        " do not edit by hand -->",
        f"From `{name}` (audio-h/s/chip; bar = 62.5 = 500 h/s on a v5e-8;"
        " 'ROBUST' = median − (max−min) of the repeat trials ≥ bar):",
        "",
        "| tier | flat | flat vs bar | rows | rows vs bar |",
        "|---|---|---|---|---|",
        *rows5,
        "<!-- BENCH5:END -->",
    ])
    design = repo / "docs" / "DESIGN.md"
    dtext = design.read_text()
    dnew, dn = re.subn(
        r"<!-- BENCH5:BEGIN.*?-->.*?<!-- BENCH5:END -->", block5, dtext,
        count=1, flags=re.S,
    )
    if dn != 1:
        print("docs/DESIGN.md BENCH5 markers not found", file=sys.stderr)
        return 1
    design.write_text(dnew)
    print(f"docs/DESIGN.md BENCH5 block regenerated from {name}")
    return 0


def main(resume_path: str | None = None) -> None:
    import os

    # the artifact-line contract: the LAST JSON line of this process's
    # combined stdout+stderr is the artifact (that is literally what the
    # driver's tail parser records) — so silence in-process log_event
    # records for the whole run (shard subprocesses get the var stripped)
    os.environ["MODMFCC_LOG_SILENT"] = "1"

    # --resume <state.json>: continuation spawned by a parent bench whose
    # current field hung (watchdog handoff). The state seeds every field
    # the parent finished; the hung field is in `skip` and never re-run.
    state: dict = {}
    if resume_path is not None:
        with open(resume_path) as f:
            state = json.load(f)
    batch, seconds, n_super = 128, 30.0, 8

    # total-wall deadline (r4 verdict #1): the r4 driver SIGKILLed bench
    # before its single end-of-run emit and the round lost every measured
    # field. Fields are now emitted incrementally AND the run skips
    # remaining fields once the budget is spent, so the final artifact
    # (tests_green and all) always lands within the driver's clock.
    t_start = time.monotonic()
    total_budget = float(os.environ.get("MODMFCC_BENCH_TOTAL_TIMEOUT", "2400"))

    def _remaining() -> float:
        return total_budget - (time.monotonic() - t_start)

    per_chip_target = 500.0 / 8.0
    fields: dict = {
        "value": None, "bf16_rows": None, "f32_parity_mode": None,
        "i24_parity_mode": None, "i24_rows": None, "i16_parity_mode": None,
        "i16_rows": None, "f32_x3_mode": None, "x3_rows": None,
        "tracker_sweep": None,
        "pyin_sweep": None, "pyin_sweep_16k": None, "masked_batch_64": None,
        "modspec_batch": None, "longform_1h_s": None, "corpus_sweep": None,
        "corpus_stats": None, "corpus_2shard": None,
        "corpus_2shard_stats": None,
    }
    fields.update(state.get("fields", {}))
    # completed: label → outcome of every _try that actually ran (None =
    # ran and failed); skip: labels that HUNG somewhere up the chain
    completed: dict = dict(state.get("completed", {}))
    skip: set = set(state.get("skip", []))
    hung: list = list(state.get("hung", []))
    engine_fallbacks: list = list(state.get("engine_fallbacks", []))
    # per-field repeat stats in metric units (r4 verdict #3: the i24 margin
    # was 0.4% against ±3% daily variance — a tier "clears" the bar only
    # when median − spread ≥ bar, which needs the trials in the artifact)
    repeat_stats: dict = dict(state.get("repeat_stats", {}))
    skipped_wall: list = list(state.get("skipped_wall", []))

    def _emit(error: str | None = None, partial: bool = False) -> None:
        bf16 = fields["value"]
        art = {
            "metric": "mfcc_modulation_throughput",
            "value": bf16,
            "unit": "audio-hours/sec/chip @16kHz (bf16 corpus mode)",
            "vs_baseline": round(bf16 / per_chip_target, 4) if bf16 is not None else None,
            **{k: v for k, v in fields.items() if k != "value"},
            # fields measured with the XLA engines because the Pallas
            # engine failed its gate or compile on this runtime (empty
            # = every field ran the default engines)
            "engine_fallbacks": engine_fallbacks,
            **_tests_green(),
            "bench_wall_s": round(time.monotonic() - t_start, 1),
        }
        if repeat_stats:
            art["repeat_stats"] = repeat_stats
        if skipped_wall:
            art["skipped_wall"] = skipped_wall
        if hung:
            art["hung_fields"] = hung
        if error is not None:
            art["error"] = error
        if partial:
            # honest marker on incremental lines: if the driver kills the
            # run, the last line it parses says the run was cut short
            art["partial"] = True
        print(json.dumps(art), flush=True)

    def _handoff(hung_field: str) -> bool:
        """Spawn `bench.py --resume <state>` to run every field after the
        hung one; forward the child's LAST artifact line as ours (children
        emit incrementally, so even a timed-out child leaves a usable
        partial line). Depth-capped so a fully dead tunnel ends in a
        partial artifact, not an endless chain. Returns True iff an
        artifact line was forwarded."""
        import subprocess
        import tempfile

        depth = int(os.environ.get("MODMFCC_BENCH_RESUME_DEPTH", "3"))
        if depth <= 0:
            return False
        # kill any live shard subprocesses of the hung field FIRST: two
        # sweep processes left contending with the resume child on the one
        # tunneled chip is the 5x serialization DESIGN §10 measures
        for p in list(_LIVE_SUBPROCS):
            try:
                if p.poll() is None:
                    p.kill()
                    p.wait(timeout=10)
            except Exception:  # noqa: BLE001
                pass
        st = {
            "fields": fields, "completed": completed,
            "skip": sorted(skip | {hung_field}),
            # the watchdog's record_hang already appended hung_field
            "hung": hung if hung_field in hung else hung + [hung_field],
            "engine_fallbacks": engine_fallbacks,
            "repeat_stats": repeat_stats, "skipped_wall": skipped_wall,
        }
        with tempfile.NamedTemporaryFile(
            "w", prefix="bench_resume_", suffix=".json", delete=False
        ) as f:
            json.dump(st, f)
            path = f.name
        env = dict(os.environ)
        env["MODMFCC_BENCH_RESUME_DEPTH"] = str(depth - 1)
        # the parent already paid the full backend patience; a resume child
        # on a dead tunnel should give up quickly and emit what it has
        env["MODMFCC_BENCH_BACKEND_TRIES"] = "3"
        # the child inherits what is LEFT of the parent's wall budget (a
        # chain of resume children must not multiply the driver's clock)
        env["MODMFCC_BENCH_TOTAL_TIMEOUT"] = str(max(300.0, _remaining()))
        print(f"# resuming remaining fields in a subprocess "
              f"(skip={st['skip']}, depth={depth - 1})", file=sys.stderr)
        out_path = path + ".out"
        try:
            # the child's stdout goes to a FILE, not a pipe: on a timeout
            # kill we still read every incremental artifact line it wrote
            try:
                with open(out_path, "w") as of:
                    subprocess.run(
                        [sys.executable, os.path.abspath(__file__),
                         "--resume", path],
                        stdout=of, env=env,
                        timeout=float(os.environ.get(
                            "MODMFCC_BENCH_RESUME_TIMEOUT",
                            str(max(600.0, _remaining() + 300.0)))),
                    )
            except subprocess.TimeoutExpired:
                print("# resume child timed out; killed — forwarding its "
                      "last partial artifact line if any", file=sys.stderr)
            with open(out_path) as of:
                lines = [l for l in of.read().strip().splitlines()
                         if l.startswith("{")]
            if not lines:
                return False
            sys.stdout.write(lines[-1] + "\n")
            sys.stdout.flush()
            return True
        finally:
            for pth in (path, out_path):
                try:
                    os.unlink(pth)
                except OSError:
                    pass

    # remote compiles for shapes not in the persistent cache take minutes
    # (a fresh batch-2 masked program measured ~5 min) — the per-field
    # deadline must clear a worst-case cold compile plus the run
    dog = _Watchdog(
        _emit, float(os.environ.get("MODMFCC_BENCH_FIELD_TIMEOUT", "1500")),
        handoff=_handoff, record_hang=hung.append,
    )

    def _yield_if_fired() -> None:
        """Once the watchdog fired, IT owns the process outcome: a slow-
        but-alive main thread must neither start new device work (it
        would contend with the resume child on the one chip) nor print a
        second artifact line. Park forever; the watchdog os._exits when
        the handoff (or the partial emit) is done."""
        if dog.fired.is_set():
            while True:
                time.sleep(60.0)

    if not _await_backend():
        # a dead remote backend HANGS jax calls (init blocks forever, no
        # error) — emit what we have (a fresh run: the null artifact; a
        # resume child: the parent's completed fields) instead of hanging
        _emit(error="TPU backend unreachable after backend-probe patience")
        return

    # every field is guarded: a failure in any one must not sink the
    # artifact. A label in `skip` hung up the chain — never re-run it; a
    # label in `completed` already ran in a parent OR in this process —
    # reuse its outcome (a resume child must not repeat work the parent
    # already settled, including settled-as-failed: `seeded` pins the
    # parent's outcomes against the retry blocks' completed.pop).
    seeded = frozenset(state.get("completed", {}))

    def _try(fn, *a, _label: str | None = None, _field: str | None = None,
             _cost_s: float = 0.0, **k):
        # arm with the artifact-field label, not fn.__name__ — six modes
        # share '_throughput' and a partial artifact must name the hung one
        label = _label or getattr(fn, "__name__", str(fn))
        _yield_if_fired()
        ran = False
        if label in skip:
            out = None
        elif label in completed:
            out = completed[label]
        elif _remaining() < _cost_s:
            # total-wall deadline: never start a field the budget can't
            # hold — the artifact records the skip instead of the driver's
            # SIGKILL erasing the run
            print(f"# {label} skipped: wall budget "
                  f"({_remaining():.0f}s left < {_cost_s:.0f}s est)",
                  file=sys.stderr)
            if label not in skipped_wall:
                skipped_wall.append(label)
            completed[label] = None
            out = None
            ran = True
        else:
            dog.arm(label)
            _LAST_TRIALS.clear()
            try:
                out = round(fn(*a, **k), 3)
            except Exception as e:  # noqa: BLE001 — report, don't die
                print(f"# {label} failed: {e!r}", file=sys.stderr)
                out = None
            finally:
                dog.disarm()
            if out is not None and _LAST_TRIALS:
                ts = sorted(round(t, 3) for t in _LAST_TRIALS)
                repeat_stats[label] = {
                    "n": len(ts), "min": ts[0], "median": ts[len(ts) // 2],
                    "max": ts[-1],
                }
            completed[label] = out
            ran = True
        if _field is not None:
            fields[_field] = out
            if ran:
                # incremental emission (r4 verdict #1): every completed
                # field lands an artifact line; last-line-wins at the
                # driver, so a kill at ANY point keeps all finished fields
                _emit(partial=True)
        return out

    bf16 = _try(_throughput, "pallas_bf16", batch, seconds, n_super,
                _label="bf16_headline", _field="value")
    if (bf16 is None and "bf16_headline" not in skip
            and "bf16_headline" not in seeded
            and "bf16_headline" not in skipped_wall):
        # the headline: re-probe the backend (a mid-run tunnel flap
        # poisons this process's cached backend only for NEW compiles, and
        # a subprocess probe tells us whether waiting can help) and retry
        # — but only if the probe answers, a dead backend hangs jax calls
        if _await_backend(max_tries=6):
            completed.pop("bf16_headline", None)
            bf16 = _try(_throughput, "pallas_bf16", batch, seconds, n_super,
                        _label="bf16_headline", _field="value")
    _try(_rows_throughput, "pallas_bf16", batch, seconds, n_super,
         _label="bf16_rows", _field="bf16_rows")
    _try(_throughput, "pallas", batch, seconds, n_super,
         _label="f32_parity_mode", _field="f32_parity_mode")
    _try(_throughput, "pallas_i24", batch, seconds, n_super,
         _label="i24_parity_mode", _field="i24_parity_mode")
    _try(_rows_throughput, "pallas_i24", batch, seconds, n_super,
         _label="i24_rows", _field="i24_rows")
    _try(_throughput, "pallas_x3", batch, seconds, n_super,
         _label="f32_x3_mode", _field="f32_x3_mode")
    _try(_rows_throughput, "pallas_x3", batch, seconds, n_super,
         _label="x3_rows", _field="x3_rows")

    # cross-engine gates, ONCE each (small compiles): a failed gate or a
    # failed Pallas timing demotes the field to the XLA engines and the
    # demotion is recorded in the artifact
    tracker_safe = _try(_pitch_engines_agree) is None
    pyin_safe = _try(_pyin_engines_agree) is None
    # the 16 kHz field gets its own gate: the MXU CMNDF geometry (nfft,
    # lag band) differs per sr, so a 10 kHz pass doesn't certify 16 kHz
    pyin16_safe = _try(_pyin_engines_agree, sr=16_000,
                       _label="_pyin_engines_agree_16k") is None

    def _mark_fallback(name):
        if name not in engine_fallbacks:  # resume children seed the list
            engine_fallbacks.append(name)

    def _try_engines(name, safe0, fn, *a, **k):
        got = _try(fn, *a, safe=safe0, _label=name, _field=name, **k)
        if (got is None and not safe0 and name not in skip
                and name not in seeded and name not in skipped_wall):
            # drop the failed attempt's record or the retry short-circuits
            completed.pop(name, None)
            got = _try(fn, *a, safe=True, _label=name, _field=name, **k)
            if got is not None:
                _mark_fallback(name)
        elif safe0 and got is not None and name not in skip:
            # got None with safe0 means the label hung upstream or failed
            # outright — it never ran the safe engines, so recording a
            # fallback would claim a null field ran XLA (ADVICE r4)
            _mark_fallback(name)
        return got

    _try(_throughput, "pallas_i16", batch, seconds, n_super,
         _label="i16_parity_mode", _field="i16_parity_mode")
    _try(_rows_throughput, "pallas_i16", batch, seconds, n_super,
         _label="i16_rows", _field="i16_rows")
    _try_engines(
        "tracker_sweep", tracker_safe, _tracker_throughput, 16, seconds, 8)
    _try_engines("pyin_sweep", pyin_safe, _pyin_throughput, 8, seconds, 8)
    _try_engines(
        "pyin_sweep_16k", pyin16_safe, _pyin_throughput, 8, seconds, 8,
        sr=16_000)
    _try(_masked_batch_throughput, _label="masked_batch_64",
         _field="masked_batch_64")
    _try(_modspec_throughput, _label="modspec_batch", _field="modspec_batch")
    _try(_longform_1h_seconds, _label="longform_1h_s", _field="longform_1h_s")
    # the corpus fields pay host decode + per-process init; give them
    # wall-cost estimates so a near-exhausted budget records a skip
    # instead of racing the driver's SIGKILL (r4 verdict #7)
    _try(_corpus_throughput, _label="corpus_sweep", _field="corpus_sweep",
         _cost_s=180.0)
    if _LAST_CORPUS_STATS:
        fields["corpus_stats"] = dict(_LAST_CORPUS_STATS)
    _try(_corpus_2shard_throughput, _label="corpus_2shard",
         _field="corpus_2shard", _cost_s=420.0)
    if _LAST_2SHARD_STATS:
        fields["corpus_2shard_stats"] = dict(_LAST_2SHARD_STATS)
    _yield_if_fired()
    _emit()


if __name__ == "__main__":
    if "--sync-docs" in sys.argv:
        args = [a for a in sys.argv[1:] if a != "--sync-docs"]
        sys.exit(_sync_docs(args[0] if args else None))
    if "--resume" in sys.argv:
        i = sys.argv.index("--resume")
        if i + 1 >= len(sys.argv):
            print("usage: bench.py --resume <state.json>", file=sys.stderr)
            sys.exit(2)
        sys.exit(main(resume_path=sys.argv[i + 1]))
    sys.exit(main())
