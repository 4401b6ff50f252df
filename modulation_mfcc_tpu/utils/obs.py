"""Observability: structured logging, throughput counters, profiler hooks.

The reference's diagnostics are bare prints (SURVEY.md §5); here:
  * ``log_event`` — one-line JSON records on stderr (machine-parsable);
  * ``ThroughputMeter`` — audio-hours/sec counters (the north-star metric);
  * ``profile_trace`` — context manager around ``jax.profiler.trace`` for
    TensorBoard-compatible device traces, no-op when disabled.
"""
from __future__ import annotations

import contextlib
import json
import sys
import time

__all__ = ["log_event", "ThroughputMeter", "profile_trace"]


def log_event(event: str, **fields) -> None:
    # MODMFCC_LOG_SILENT: bench.py's artifact contract is "the last JSON
    # line of combined stdout+stderr is the artifact" (that is what the
    # driver's tail parser takes — round 4's artifact of record was a
    # corpus.finish event because these records landed after the kill).
    # bench silences in-process events; its shard SUBPROCESSES keep theirs
    # (their stderr goes to files bench parses for the sweep windows).
    import os

    if os.environ.get("MODMFCC_LOG_SILENT"):
        return
    rec = {"ts": round(time.time(), 3), "event": event, **fields}
    print(json.dumps(rec), file=sys.stderr, flush=True)


class ThroughputMeter:
    """Accumulates processed audio seconds; reports audio-hours/sec."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.audio_seconds = 0.0
        self.items = 0

    def add(self, audio_seconds: float, items: int = 1):
        self.audio_seconds += audio_seconds
        self.items += items

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def audio_hours_per_sec(self) -> float:
        e = self.elapsed
        return (self.audio_seconds / 3600.0) / e if e > 0 else 0.0

    def report(self) -> dict:
        return {
            "items": self.items,
            "audio_hours": round(self.audio_seconds / 3600.0, 4),
            "elapsed_sec": round(self.elapsed, 3),
            "audio_hours_per_sec": round(self.audio_hours_per_sec, 6),
        }


@contextlib.contextmanager
def profile_trace(log_dir: str | None):
    """jax.profiler trace when log_dir is set; transparent otherwise."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
