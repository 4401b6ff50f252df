"""Multi-device (virtual 8-CPU mesh) + streaming paths: sharded data-parallel
extraction, chunked long-form == whole-file, time-sharded long-form parity."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modulation_mfcc_tpu.models.config import MfccConfig
from modulation_mfcc_tpu.models.modulation import mfcc_change
from modulation_mfcc_tpu.parallel.batch import pad_batch, sharded_mfcc_change
from modulation_mfcc_tpu.parallel.mesh import make_mesh
from modulation_mfcc_tpu.parallel.streaming import (
    chunked_mfcc_change,
    sharded_longform_mfcc_change,
)


def small_cfg():
    return MfccConfig(n_fft=256, n_mels=40)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["time"] == 1
    mesh2 = make_mesh(4, 2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["time"] == 2


def test_sharded_matches_unsharded(rng):
    cfg = small_cfg()
    sigs = [rng.standard_normal(4000 + 512 * (i % 3)).astype(np.float32) for i in range(8)]
    batch = pad_batch(sigs, bucket_multiple=1024)
    mesh = make_mesh(8, 1)
    tot_s, mask, mean_change = sharded_mfcc_change(batch, cfg, mesh)
    nf = 1 + batch.lengths // cfg.hop_length
    tot_u = mfcc_change(batch.samples, cfg, frame_lengths=nf)
    np.testing.assert_allclose(
        np.asarray(tot_s) * np.asarray(mask),
        np.asarray(tot_u) * np.asarray(mask),
        atol=1e-5,  # f32: sharded vs unsharded differ only in reduction order
    )
    assert np.isfinite(float(mean_change))


def test_chunked_longform_equals_wholefile(rng):
    cfg = small_cfg()
    y = jnp.asarray(rng.standard_normal(120_000), dtype=jnp.float64)
    whole = mfcc_change(y, cfg)
    chunked = chunked_mfcc_change(y, cfg, frames_per_chunk=512)
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(whole), atol=1e-8)


def test_time_sharded_longform_matches_wholefile(rng):
    cfg = small_cfg()
    y = jnp.asarray(rng.standard_normal(64_000), dtype=jnp.float32)
    mesh = make_mesh(1, 8)
    got = sharded_longform_mfcc_change(y, cfg, mesh)
    want = mfcc_change(y, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_time_sharded_longform_nondivisible_length(rng):
    """Signal lengths need not divide the time axis: the shard geometry pads
    internally and masks the tail (VERDICT round-1 item 9)."""
    cfg = small_cfg()
    y = jnp.asarray(rng.standard_normal(64_000 + 4321), dtype=jnp.float32)
    mesh = make_mesh(1, 8)
    got = sharded_longform_mfcc_change(y, cfg, mesh)
    want = mfcc_change(y, cfg)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_graft_entry_single_and_multi():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    mod.dryrun_multichip(8)
