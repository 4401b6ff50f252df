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


def test_bf16_mode_accuracy_contract():
    """The corpus (bf16) mode's contract is on the *modulation-change
    output* (what the sweep computes): ~1.6e-2 max measured on hardware
    (README); bound 1e-1 here.

    Deliberately NOT a raw-MFCC bound: single-pass bf16 DFT has an absolute
    error floor ~40 dB below each frame's energy, so quiet mel bins of
    high-dynamic-range material show tens of dB of error in corpus mode —
    the downstream norm-over-coefficients + filtering is what makes the
    pipeline output robust. Parity-critical work must use the f32 mode."""
    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.models.modulation import mfcc_change

    sr = 16_000
    rng = np.random.default_rng(0)
    t = np.arange(int(1.5 * sr)) / sr
    y = sum((0.6 / k) * np.sin(2 * np.pi * k * 140 * t) for k in range(1, 6))
    y = y * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
    y = y + 1e-2 * rng.standard_normal(len(t))  # -40 dB floor, typical recording
    y = jnp.asarray(y, dtype=jnp.float32)[None, :]
    cfg = MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)
    want = np.asarray(mfcc_change(y, cfg, spectrum="fft"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(mfcc_change(y, cfg, spectrum="pallas_bf16"))
    err = np.abs(got - want).max()
    assert err < 1e-1, err
    assert err > 1e-6  # sanity: this IS the reduced-precision mode


def test_fused_mfcc_packed_nyquist(audio):
    """fmax > Nyquist (the reference's 10 kHz default) keeps every bin live
    — the packed-rfft layout (Nyquist re in the im₀ slot, mel weight
    remapped to the DC power slot) must stay exact."""
    sr, hop = 10_000.0, 50
    want = np.asarray(
        mfcc_from_frames(
            frame_signal(audio, 512, hop), sr=sr, n_fft=512, win_length=250,
            fmin=100.0, fmax=10_000.0, use_fft=True,
        )
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_mfcc(audio, sr=sr, hop=hop, win_length=250, fmax=10_000.0)
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_x3_mode_accuracy_contract(audio):
    """spectrum='pallas_x3': ~1e-3-grade MFCC error (2^-17 operand split),
    between the f32 parity mode and the bf16 corpus mode."""
    cfg = MfccConfig(signal_sample_rate=16_000, maxFreq=8000.0)
    want = np.asarray(mfcc_trajectories(audio, cfg, spectrum="fft"))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(mfcc_trajectories(audio, cfg, spectrum="pallas_x3"))
    err = np.abs(got - want).max()
    assert err < 2e-2, err
    assert err > 1e-6  # sanity: reduced-precision mode, not the f32 path


def test_folded_matches_unfolded(audio):
    """The folded real-DFT path (two K=sup/2 matmuls on the t↔N−t sum and
    difference) must agree with the direct path to f32 rounding."""
    from modulation_mfcc_tpu.pallas.fused_frontend import fused_mel_frontend

    kw = dict(sr=16_000.0, n_fft=512, hop=80, win_length=400, n_mels=128,
              fmin=100.0, fmax=8000.0)
    with pltpu.force_tpu_interpret_mode():
        mel_f, _ = fused_mel_frontend(audio, fold=True, **kw)
        mel_u, _ = fused_mel_frontend(audio, fold=False, **kw)
    mf, mu = np.asarray(mel_f), np.asarray(mel_u)
    scale = np.abs(mu).max()
    np.testing.assert_allclose(mf, mu, atol=1e-5 * scale)


def test_fold_geometry_guard():
    """fold=True with an incompatible geometry (window not a whole number
    of hops) must raise rather than silently fall back."""
    from modulation_mfcc_tpu.pallas.fused_frontend import fused_mel_frontend

    x = jnp.zeros((1, 8000), jnp.float32)
    with pytest.raises(ValueError, match="fold"):
        fused_mel_frontend(
            x, sr=16_000.0, n_fft=512, hop=80, win_length=444, fold=True
        )


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


def test_pallas_burg_matches_xla():
    # the VMEM Burg kernel (pallas/burg.py) == the XLA reference recursion
    from modulation_mfcc_tpu.ops.lpc import burg_lpc
    from modulation_mfcc_tpu.pallas.burg import burg_lpc_pallas, burg_reflections

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((3, 41, 213)).astype(np.float32) * 0.3)
    want = np.asarray(burg_lpc(frames, 10))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(burg_lpc_pallas(frames, 10))
        ks = np.asarray(burg_reflections(frames, 10))
    np.testing.assert_allclose(got, want, atol=2e-6)
    assert ks.shape == (3, 41, 10)
    # reflection coefficients are bounded by 1 for any real frame
    assert np.all(np.abs(ks) <= 1.0 + 1e-5)


def test_x3_end_to_end_error_budget():
    """Certify the x3 mode at the DELIVERABLE surface (get_MFCCS_change):
    while its MFCC-stage error is ~1e-3 (docs/DESIGN.md error budget), the
    modulation-output error on real-statistics audio must stay within the
    1e-4 parity bar — the norm-over-coefficients and the 12 Hz low-pass
    average the DFT rounding noise down ~two orders (VERDICT r2 weak #1;
    measured 1.7e-5 here, 6.8e-6 for f32)."""
    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.models.modulation import mfcc_change
    from modulation_mfcc_tpu.oracle import get_mfccs_change_np

    rng = np.random.default_rng(20260816)
    sr = 16_000
    t = np.arange(int(2.0 * sr)) / sr
    f0 = 120.0 + 30.0 * np.sin(2 * np.pi * 2.5 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    sig = sum((0.6 / k) * np.sin(k * phase) for k in range(1, 6))
    env = 0.5 * (1 + np.sin(2 * np.pi * 4.0 * t - np.pi / 2))
    sig = (sig * env + 0.01 * rng.standard_normal(len(t))).astype(np.float32)

    cfg = MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)
    want, _ = get_mfccs_change_np(sig.astype(np.float64), sr, max_freq=8000.0)
    for spec, bound in (("pallas", 5e-5), ("pallas_i24", 5e-5), ("pallas_x3", 1e-4)):
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(mfcc_change(jnp.asarray(sig), cfg, spectrum=spec))
        assert np.abs(got - want).max() < bound, spec


def test_i24_matches_f32_grade(audio):
    """The fixed-point i24 mode (int8 digit-plane DFT) must hold f32-grade
    MFCC parity: within the same 1e-4 band as the f32 mode vs the rfft
    oracle on the noise fixture (interpret mode; measured f32-equivalent
    on hardware and in interpret: mel rel err 4.1e-4 vs f32's 3.9e-4 on
    an adversarial two-tone, ~1e-5-grade here)."""
    want = np.asarray(_reference(audio))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_mfcc(
                audio, sr=16_000.0, hop=80, win_length=400, fmax=8000.0,
                algorithm="i24",
            )
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pipelined_kernel_bit_identical(audio):
    """The two-stage pipelined frontend (_kernel_pipe: block j's DFT and
    block j−1's power/mel in one grid step on disjoint scratch halves) must
    be BIT-identical to the plain kernel — same ops, same order, per block —
    for every algorithm it supports, including frame counts that are not a
    block multiple (blkf larger than nf: nj == 1 exercises the pipeline's
    one-real-block edge)."""
    from modulation_mfcc_tpu.pallas.fused_frontend import fused_mel_frontend

    kw = dict(sr=16_000.0, n_fft=512, hop=80, win_length=400, n_mels=128,
              fmin=100.0, fmax=8000.0)
    for algorithm in ("f32", "x3", "bf16", "i24"):
        for blkf in (128, 1024):
            with pltpu.force_tpu_interpret_mode():
                mel_p, bmax_p = fused_mel_frontend(
                    audio, blkf=blkf, pipeline=True, algorithm=algorithm, **kw
                )
                mel_u, bmax_u = fused_mel_frontend(
                    audio, blkf=blkf, pipeline=False, algorithm=algorithm, **kw
                )
            np.testing.assert_array_equal(
                np.asarray(mel_p), np.asarray(mel_u), err_msg=f"{algorithm}/{blkf}"
            )
            np.testing.assert_array_equal(
                np.asarray(bmax_p), np.asarray(bmax_u), err_msg=f"{algorithm}/{blkf}"
            )


def test_pipelined_env_knob_routes(audio, monkeypatch):
    """MODMFCC_FRONTEND_PIPE=1 routes fused_mfcc through the pipelined
    kernel with unchanged results (bit-identical kernels ⇒ identical MFCC)."""
    monkeypatch.setenv("MODMFCC_FRONTEND_PIPE", "1")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_mfcc(audio, sr=16_000.0, hop=80, win_length=400, fmax=8000.0))
    monkeypatch.delenv("MODMFCC_FRONTEND_PIPE")
    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(fused_mfcc(audio, sr=16_000.0, hop=80, win_length=400, fmax=8000.0))
    np.testing.assert_array_equal(got, want)


def test_blkf_env_knob(audio, monkeypatch):
    """MODMFCC_BLKF reshapes the grid without changing the numbers."""
    want = np.asarray(_reference(audio))
    monkeypatch.setenv("MODMFCC_BLKF", "512")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_mfcc(audio, sr=16_000.0, hop=80, win_length=400, fmax=8000.0))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_i16_matches_f32_grade_on_int16_audio():
    """algorithm='i16' (two int8 audio digits + offset-corrected low digit,
    5K int8 rows) must hold f32-grade MFCC parity on int16-PCM-origin audio
    — the mode's exactness domain (docs/DESIGN.md §8). Weight quantization
    (2^-24·max|W|) is the only approximation, same class as i24."""
    rng = np.random.default_rng(20260818)
    pcm = rng.integers(-32768, 32768, (2, 24_000)).astype(np.int16)
    a = jnp.asarray(pcm.astype(np.float32) / 32768.0)
    want = np.asarray(_reference(a))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            fused_mfcc(a, sr=16_000.0, hop=80, win_length=400, fmax=8000.0,
                       algorithm="i16")
        )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_i16_quiet_audio_per_utterance_scale():
    """i16 must stay f32-grade on QUIET int16 material too: a fixed
    s = 32768 quantized a −60 dBFS utterance at full-scale-absolute step
    size (~3e-2 at the MFCC surface) — fixed by the per-utterance
    power-of-two scale (each batch row gets its OWN scale; the exactness
    property, x·s integral for int16-origin PCM at any level, survives the
    scaling). The scale must be a true power of two — derived via
    frexp/ldexp because f32 exp2/log2 are inexact at integer points on XLA
    backends (exp2(15.0) → 32767.984 on CPU, a measured 2.2e-3
    regression). This fixture also makes x0s ≡ −128 (X is an exact
    multiple of 256), the worst data case for _i16_reim's dropped x0s·w0
    digit term, bounding it here.

    Comparison structure: the strict bar is RELATIVE error at the MEL
    surface vs a float64 oracle — that is i16's actual claim (f32-grade
    DFT+mel at any level). Measured here: 1.40e-4 worst-mel (the f32
    algorithm's own rounding is 6.8e-5; the other ~7e-5 is _i16_reim's
    dropped x0s·w0 digit term at its data worst case — restoring it with a
    4th dot measured 7.0e-5 total but costs a 6th K-row, rejected). Bound
    2e-4; one worst-case mel at 1.4e-4 is ≤ 4.34·1.4e-4·0.125 ≈ 7.6e-5
    per MFCC coefficient — inside the ≤1e-4 budget. At the MFCC surface
    quiet audio drives every mel-dB to ~−60,
    so |c0| ≈ 679 where the f32 ulp is 6e-5 and a 128-term f32 dot
    necessarily wobbles ~√128·ulp/2 ≈ 3e-4 — an absolute 1e-4 there
    demands 1.5e-7 relative, below f32 representability, for ANY f32
    pipeline (measured: the f32 algorithm misses it identically, 3.66e-4).
    The MFCC-surface assert is therefore 5e-4 — still far below the
    2.2e-3/3e-2 regression classes this test exists to catch."""
    from modulation_mfcc_tpu.ops.spectral import dft_bases, mel_filterbank
    from modulation_mfcc_tpu.pallas.fused_frontend import fused_mel_frontend

    rng = np.random.default_rng(7)
    loud = rng.integers(-32768, 32768, 24_000)
    quiet = rng.integers(-33, 34, 24_000)  # ~-60 dBFS
    pcm = np.stack([loud, quiet]).astype(np.int16)
    a64 = pcm.astype(np.float64) / 32768.0
    a = jnp.asarray(a64.astype(np.float32))
    with pltpu.force_tpu_interpret_mode():
        mel, _ = fused_mel_frontend(a, sr=16_000.0, hop=80, win_length=400,
                                    fmax=8000.0, algorithm="i16")
        got = np.asarray(
            fused_mfcc(a, sr=16_000.0, hop=80, win_length=400, fmax=8000.0,
                       algorithm="i16")
        )
    # float64 oracle mel (centered framing, windowed-DFT bases, Slaney mel)
    wr, wi = dft_bases(512, "hann", 400)
    m = mel_filterbank(16_000.0, 512, 128, 100.0, 8000.0)
    pad = np.pad(a64, ((0, 0), (256, 256)))
    nf = 1 + 24_000 // 80
    fr = np.stack([[pad[r, i * 80 : i * 80 + 512] for i in range(nf)]
                   for r in range(2)])
    want_mel = ((fr @ wr) ** 2 + (fr @ wi) ** 2) @ m.T
    rel = (np.asarray(mel, np.float64)[:, :nf] - want_mel) / np.maximum(
        np.abs(want_mel), 1e-300
    )
    assert np.abs(rel).max() <= 2e-4
    want = np.asarray(_reference(a))
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_i16_pipeline_bit_identical():
    """Pipelined i16 == plain i16 bitwise (same schedule proof as the other
    modes; i16 has its own kernel pair because of the corr input)."""
    from modulation_mfcc_tpu.pallas.fused_frontend import fused_mel_frontend

    rng = np.random.default_rng(3)
    pcm = rng.integers(-32768, 32768, (2, 9_000)).astype(np.int16)
    a = jnp.asarray(pcm.astype(np.float32) / 32768.0)
    kw = dict(sr=16_000.0, n_fft=512, hop=80, win_length=400, n_mels=128,
              fmin=100.0, fmax=8000.0, algorithm="i16")
    with pltpu.force_tpu_interpret_mode():
        mel_p, bmax_p = fused_mel_frontend(a, blkf=64, pipeline=True, **kw)
        mel_u, bmax_u = fused_mel_frontend(a, blkf=64, pipeline=False, **kw)
    np.testing.assert_array_equal(np.asarray(mel_p), np.asarray(mel_u))
    np.testing.assert_array_equal(np.asarray(bmax_p), np.asarray(bmax_u))


def test_i16_public_spectrum_dispatch():
    """spectrum='pallas_i16' reaches the kernel through mfcc_change with
    parity-grade output on int16-origin speechlike audio."""
    from tests.reference_impl import get_mfccs_change_np

    sr = 16_000
    t = np.arange(int(1.5 * sr)) / sr
    sig = 0.4 * np.sin(2 * np.pi * 150 * t) + 0.2 * np.sin(2 * np.pi * 900 * t)
    pcm = np.round(sig * 32767).astype(np.int16)
    a = pcm.astype(np.float32) / 32768.0
    from modulation_mfcc_tpu.models.modulation import mfcc_change

    cfg = MfccConfig(signal_sample_rate=sr, maxFreq=8000.0)
    want, _ = get_mfccs_change_np(a.astype(np.float64), sr, max_freq=8000.0)
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(mfcc_change(jnp.asarray(a), cfg, spectrum="pallas_i16"))
    assert np.abs(got - want).max() < 5e-5


def test_blkf_validation(monkeypatch):
    """Bad MODMFCC_BLKF values die with a clear ValueError, not shape
    garbage deep in the launch (code-review finding, r3 session 7)."""
    import pytest

    from modulation_mfcc_tpu.pallas.knobs import frontend_knobs

    for bad in ("0", "-16"):
        monkeypatch.setenv("MODMFCC_BLKF", bad)
        with pytest.raises(ValueError, match="positive multiple"):
            frontend_knobs()
    monkeypatch.setenv("MODMFCC_BLKF", "24")  # positive but not 16-aligned
    blkf, _, _ = frontend_knobs()  # granularity is the kernel's check
    assert blkf == 24


def test_tracker_engine_env_resolved_before_jit_cache(monkeypatch):
    """MODMFCC_{SINC,VITERBI}_ENGINE must take effect between calls in ONE
    process: the public wrappers resolve the env into the jit static key,
    so a post-first-call env change cannot hit a stale memoized trace
    (code-review finding, r3 session 7)."""
    import modulation_mfcc_tpu.ops.pitch as P
    import modulation_mfcc_tpu.ops.yin as Y

    seen = []

    def spy_pitch(x, *, sinc_engine="auto", **kw):
        seen.append(("sinc", sinc_engine))

    def spy_pyin(x, *, viterbi_engine="auto", **kw):
        seen.append(("vit", viterbi_engine))

    monkeypatch.setattr(P, "_pitch_ac_jit", spy_pitch)
    monkeypatch.setattr(Y, "_pyin_f0_jit", spy_pyin)
    P.pitch_ac(None, sr=10_000.0)
    Y.pyin_f0(None, sr=10_000.0)
    monkeypatch.setenv("MODMFCC_SINC_ENGINE", "xla")
    monkeypatch.setenv("MODMFCC_VITERBI_ENGINE", "xla")
    P.pitch_ac(None, sr=10_000.0)
    Y.pyin_f0(None, sr=10_000.0)
    # an explicit engine argument always wins over the env
    P.pitch_ac(None, sr=10_000.0, sinc_engine="pallas")
    Y.pyin_f0(None, sr=10_000.0, viterbi_engine="pallas_full")
    assert seen == [
        ("sinc", "auto"), ("vit", "auto"),
        ("sinc", "xla"), ("vit", "xla"),
        ("sinc", "pallas"), ("vit", "pallas_full"),
    ]


def test_matmul_frame_mode_matches_concat(audio):
    """frame_mode='matmul' (per-hop-chunk weight rows, full-width scratch
    reads) must equal the concat assembly. With the hop→128 lane pad no
    longer materialized in HBM, this mode is the one consumer of the
    scratch's zero-initialized pad lanes (pl.when at the first grid step;
    the scratch persists across steps), so this pins that path."""
    from modulation_mfcc_tpu.pallas.fused_frontend import fused_mel_frontend

    with pltpu.force_tpu_interpret_mode():
        mel_c, bm_c = fused_mel_frontend(
            audio, sr=16_000.0, hop=80, win_length=400, fmax=8000.0,
            frame_mode="concat",
        )
        mel_m, bm_m = fused_mel_frontend(
            audio, sr=16_000.0, hop=80, win_length=400, fmax=8000.0,
            frame_mode="matmul",
        )
    np.testing.assert_allclose(
        np.asarray(mel_m), np.asarray(mel_c), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(bm_m), np.asarray(bm_c), rtol=1e-5, atol=1e-6
    )


# ---------------------------------------------------------------------------
# Rows-input contract (the zero-prep corpus format, r4): pre-laid-out hop
# rows [B, rows_total, hop] consumed directly by the kernels — no XLA-side
# pad/cast/relayout. int16 rows dequantize (·2⁻¹⁵, exact) during staging.


@pytest.fixture(scope="module")
def pcm16():
    rng = np.random.default_rng(20260819)
    return (rng.standard_normal((2, 24_000)) * 8000.0).astype(np.int16)


def _rows_and_flat(pcm, dtype=None):
    from modulation_mfcc_tpu.pallas.fused_frontend import pack_hop_rows

    rows = pack_hop_rows(pcm if dtype is None else pcm.astype(dtype),
                         hop=80, win_length=400)
    flat = jnp.asarray(pcm.astype(np.float32) * np.float32(2.0**-15))
    return jnp.asarray(rows), flat


@pytest.mark.parametrize("algo", ["f32", "x3", "i24", "i16"])
def test_rows_input_bitwise_matches_flat(pcm16, algo):
    """int16 rows == flat f32 BITWISE for every f32-staged algorithm: the
    staging dequant v·2⁻¹⁵ is exact, so the kernels see identical values
    and every downstream op is the same op."""
    rows, flat = _rows_and_flat(pcm16)
    t = pcm16.shape[-1]
    with pltpu.force_tpu_interpret_mode():
        got = fused_mfcc(rows, sr=16_000.0, hop=80, win_length=400,
                         fmax=8000.0, algorithm=algo, n_samples=t)
        want = fused_mfcc(flat, sr=16_000.0, hop=80, win_length=400,
                          fmax=8000.0, algorithm=algo)
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_rows_input_f32_rows_bitwise(pcm16):
    """f32 rows (arbitrary float audio pre-packed) == flat, bitwise."""
    from modulation_mfcc_tpu.pallas.fused_frontend import pack_hop_rows

    flat = pcm16.astype(np.float32) * np.float32(2.0**-15)
    rows = jnp.asarray(pack_hop_rows(flat, hop=80, win_length=400))
    with pltpu.force_tpu_interpret_mode():
        got = fused_mfcc(rows, sr=16_000.0, hop=80, win_length=400,
                         fmax=8000.0, algorithm="i24",
                         n_samples=flat.shape[-1])
        want = fused_mfcc(jnp.asarray(flat), sr=16_000.0, hop=80,
                          win_length=400, fmax=8000.0, algorithm="i24")
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_rows_input_bf16_within_mode_tolerance(pcm16):
    """bf16-mode rows skip the flat path's bf16 pre-rounding of samples
    (documented: same-or-better accuracy, not bit-identical) — both must
    sit within the mode's error envelope of the f32 result."""
    rows, flat = _rows_and_flat(pcm16)
    t = pcm16.shape[-1]
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(fused_mfcc(rows, sr=16_000.0, hop=80,
                                    win_length=400, fmax=8000.0,
                                    algorithm="bf16", n_samples=t))
        via_flat = np.asarray(fused_mfcc(flat, sr=16_000.0, hop=80,
                                         win_length=400, fmax=8000.0,
                                         algorithm="bf16"))
        exact = np.asarray(fused_mfcc(flat, sr=16_000.0, hop=80,
                                      win_length=400, fmax=8000.0,
                                      algorithm="f32"))
    assert np.max(np.abs(got - exact)) <= np.max(np.abs(via_flat - exact)) + 0.1
    np.testing.assert_allclose(got, via_flat, atol=0.5)


def test_rows_input_masked_mfcc_change(pcm16):
    """End-to-end masked corpus path on rows: mfcc_change(rows, …,
    frame_lengths) == mfcc_change(flat, …, frame_lengths) bitwise."""
    from modulation_mfcc_tpu.models.modulation import mfcc_change

    rows, flat = _rows_and_flat(pcm16)
    t = pcm16.shape[-1]
    cfg = MfccConfig(signal_sample_rate=16_000, maxFreq=8000.0)
    lengths = jnp.asarray([1 + (t - 4000) // 80, 1 + t // 80], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = mfcc_change(rows, cfg, frame_lengths=lengths,
                          spectrum="pallas_i16", n_samples=t)
        want = mfcc_change(flat, cfg, frame_lengths=lengths,
                           spectrum="pallas_i16")
    assert np.array_equal(np.asarray(got), np.asarray(want))


def test_pack_hop_rows_np_jnp_agree(pcm16):
    from modulation_mfcc_tpu.pallas.fused_frontend import pack_hop_rows

    flat = pcm16.astype(np.float32)
    rn = pack_hop_rows(flat, hop=80, win_length=400)
    rj = pack_hop_rows(jnp.asarray(flat), hop=80, win_length=400)
    assert isinstance(rn, np.ndarray)
    assert np.array_equal(rn, np.asarray(rj))
    # dtype-preserving for int16
    assert pack_hop_rows(pcm16, hop=80, win_length=400).dtype == np.int16


def test_rows_input_validation(pcm16):
    rows, _ = _rows_and_flat(pcm16)
    with pytest.raises(ValueError, match="n_samples"):
        fused_mfcc(rows, sr=16_000.0, hop=80, win_length=400, fmax=8000.0)
    with pytest.raises(ValueError, match="rows"):
        fused_mfcc(rows[:, :-1024], sr=16_000.0, hop=80, win_length=400,
                   fmax=8000.0, n_samples=pcm16.shape[-1])
    cfg = MfccConfig(signal_sample_rate=16_000, maxFreq=8000.0)
    with pytest.raises(ValueError, match="pallas"):
        mfcc_trajectories(rows, cfg, spectrum="fft",
                          n_samples=pcm16.shape[-1])


@pytest.mark.parametrize("algorithm", ["f32", "bf16", "i24", "i16"])
@pytest.mark.parametrize("pipeline", [False, True])
def test_flat_t_bit_identical(algorithm, pipeline):
    """flat_t (transposed flat staging, MODMFCC_FLAT_T — the §8 round-5
    relayout lever) == plain layout BITWISE in every algorithm, plain and
    pipelined: the staged VMEM scratch is identical by construction, so any
    difference is a BlockSpec/transpose indexing bug."""
    from modulation_mfcc_tpu.pallas.fused_frontend import fused_mel_frontend

    rng = np.random.default_rng(11)
    pcm = rng.integers(-32768, 32768, (2, 21_000)).astype(np.int16)
    a = jnp.asarray(pcm.astype(np.float32) / 32768.0)
    # blkf must be a 128-multiple under flat_t (the 128-wide tail windows
    # step in blkf/128 block units — Mosaic's minor-axis rule); 21 000
    # samples at hop 80 give nf=263 → nj=3 main blocks, so block-boundary
    # tail assembly is exercised
    kw = dict(sr=16_000.0, n_fft=512, hop=80, win_length=400, n_mels=128,
              fmin=100.0, fmax=8000.0, algorithm=algorithm, blkf=128,
              pipeline=pipeline)
    with pltpu.force_tpu_interpret_mode():
        mel_t, bmax_t = fused_mel_frontend(a, flat_t=True, **kw)
        mel_u, bmax_u = fused_mel_frontend(a, flat_t=False, **kw)
    np.testing.assert_array_equal(np.asarray(mel_t), np.asarray(mel_u))
    np.testing.assert_array_equal(np.asarray(bmax_t), np.asarray(bmax_u))


def test_flat_t_validation(pcm16):
    rows, _ = _rows_and_flat(pcm16)
    from modulation_mfcc_tpu.pallas.fused_frontend import fused_mel_frontend

    with pytest.raises(ValueError, match="flat_t"):
        fused_mel_frontend(rows, sr=16_000.0, hop=80, win_length=400,
                           fmax=8000.0, flat_t=True,
                           n_samples=pcm16.shape[-1])


def test_flat_t_knob(monkeypatch):
    from modulation_mfcc_tpu.pallas.knobs import frontend_knobs

    from modulation_mfcc_tpu.pallas.knobs import resolve_flat_t

    monkeypatch.setenv("MODMFCC_FLAT_T", "1")
    assert frontend_knobs()[2] == "1"
    assert resolve_flat_t(frontend_knobs()[2], "bf16") is True
    monkeypatch.delenv("MODMFCC_FLAT_T")
    assert frontend_knobs()[2] == "auto"
    # 'auto' = on exactly for the f32-staged algorithms (v5e A/B, §8 r5)
    for alg, want in [("f32", True), ("x3", True), ("i24", True),
                      ("bf16", False), ("i16", False)]:
        assert resolve_flat_t("auto", alg) is want
    monkeypatch.setenv("MODMFCC_FLAT_T", "bogus")
    with pytest.raises(ValueError, match="MODMFCC_FLAT_T"):
        frontend_knobs()
