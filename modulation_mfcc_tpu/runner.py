"""CLI command implementations (extract / verify)."""
from __future__ import annotations

import csv
import json
import sys

import numpy as np


def _load_pipeline_config(path: str | None):
    from modulation_mfcc_tpu.models.config import PipelineConfig, config_from_reference_json

    if path is None:
        return PipelineConfig()
    with open(path) as f:
        return config_from_reference_json(json.load(f))


def run_extract(args) -> int:
    """Extract the requested feature tracks from each WAV → long-format CSV
    (file, feature, time, value) — the reference's CSV-export capability
    (script/main.py:1409-1544) in batch form."""
    from modulation_mfcc_tpu.io.wav import load_channel
    from modulation_mfcc_tpu.models import pipeline as pl

    cfg = _load_pipeline_config(args.config)
    feats = [f.strip() for f in args.features.split(",") if f.strip()]
    rows: list[tuple] = []
    for path in args.inputs:
        for feat in feats:
            try:
                t, v = pl.extract_feature(path, feat, cfg, derivation=args.derivation)
            except Exception as e:  # per-file isolation: a bad file skips
                print(f"warning: {path}: {feat}: {e}", file=sys.stderr)
                continue
            t = np.asarray(t).ravel()
            v = np.asarray(v)
            if v.ndim == 2:  # matrix features (e.g. mfcc): one row per coef
                for k in range(v.shape[1]):
                    for ti, vi in zip(t, v[:, k]):
                        rows.append((path, f"{feat}{k}", float(ti), float(vi)))
            else:
                for ti, vi in zip(t, v.ravel()):
                    rows.append((path, feat, float(ti), float(vi)))
    out = sys.stdout if args.out == "-" else open(args.out, "w", newline="")
    try:
        w = csv.writer(out)
        w.writerow(["file", "feature", "time", "value"])
        w.writerows(rows)
    finally:
        if out is not sys.stdout:
            out.close()
    return 0


def run_sweep(args) -> int:
    """Corpus sweep over files/directories (reference has no batch mode)."""
    import glob as globmod
    import os

    from modulation_mfcc_tpu.parallel.corpus import CorpusSweep, sweep_mfcc_change

    paths = []
    for inp in args.inputs:
        if os.path.isdir(inp):
            paths.extend(sorted(globmod.glob(os.path.join(inp, "**", "*.wav"), recursive=True)))
        else:
            paths.append(inp)
    if not paths:
        print("no input WAVs found", file=sys.stderr)
        return 1
    if getattr(args, "num_shards", 1) > 1:
        # multi-process/multi-slice scale-out: each process sweeps its own
        # manifest shard into its own output dir (parallel/multislice.py)
        from modulation_mfcc_tpu.parallel.multislice import shard_manifest

        paths = shard_manifest(paths, args.num_shards, args.shard_id)
    cfg = _load_pipeline_config(args.config)
    sweep = CorpusSweep(
        out_dir=args.out,
        cfg=cfg.mfcc,
        batch_size=args.batch_size,
        spectrum=args.spectrum,
        resume=not args.no_resume,
        features=tuple(
            f.strip()
            for f in getattr(args, "features", "mod_cepstr").split(",")
            if f.strip()
        ),
    )
    report = sweep_mfcc_change(paths, sweep)
    print(json.dumps(report))
    return 0


def run_plot(args) -> int:
    """Render the analysis figure (the reference's display, as a PNG)."""
    from modulation_mfcc_tpu.models.workbench import AnalysisSession

    cfg = _load_pipeline_config(args.config)
    s = AnalysisSession(args.wav, cfg)
    feats = [f.strip() for f in args.features.split(",") if f.strip()]
    for i, feat in enumerate(feats):
        try:
            s.add_curve(feat, panel=i // 2)
        except Exception as e:
            print(f"warning: {feat}: {e}", file=sys.stderr)
    if args.textgrid:
        s.load_textgrid(args.textgrid)
    if args.region:
        s.set_region(args.region[0], args.region[1])
        s.analyze_max_peaks()
        s.analyze_min_peaks()
    s.render(out=args.out)
    print(args.out)
    return 0


def run_verify(args) -> int:
    """Parity harness: JAX pipeline vs the float64 numpy/scipy oracle."""
    from modulation_mfcc_tpu.models.config import MfccConfig
    from modulation_mfcc_tpu.models.modulation import extract_mfcc_change
    from modulation_mfcc_tpu.oracle import get_mfccs_change_np

    if args.wav:
        from modulation_mfcc_tpu.io.wav import load_channel

        y = load_channel(args.wav, 10_000)
        if y.ndim > 1:
            y = y[0]
    else:
        rng = np.random.default_rng(0)
        t = np.arange(20_000) / 10_000
        y = np.sin(2 * np.pi * 120 * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))
        y = y + 0.01 * rng.standard_normal(len(t))
    got, _ = extract_mfcc_change(y, MfccConfig())
    want, _ = get_mfccs_change_np(np.asarray(y, dtype=np.float64), 10_000)
    err = float(np.max(np.abs(np.asarray(got, dtype=np.float64) - want)))
    ok = err <= 1e-4
    print(json.dumps({"max_abs_err": err, "tolerance": 1e-4, "pass": ok}))
    return 0 if ok else 1
