"""Host→HBM input pipeline: decode-ahead + device prefetch.

The reference loads each file synchronously on the GUI thread
(script/main.py:943); corpus extraction instead runs a two-stage pipeline:

  host thread(s): WAV decode + resample + pad into pinned numpy batches
  prefetcher:     copies the next batch to device while the current one
                  computes (double buffering: `jax.device_put` is async, so
                  keeping N batches in flight overlaps H2D DMA with compute)

Single-core hosts still win: the device queue never drains while Python
decodes the next bucket.
"""
from __future__ import annotations

import queue
import threading
from collections.abc import Iterable, Iterator

import jax

__all__ = ["prefetch_to_device", "background_iter"]


def background_iter(it: Iterable, maxsize: int = 4) -> Iterator:
    """Run an iterator in a daemon thread, buffering up to ``maxsize`` items
    (the host decode stage)."""
    q: queue.Queue = queue.Queue(maxsize=maxsize)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        except BaseException as e:  # propagate into the consumer
            q.put(e)
        finally:
            q.put(_END)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item


def prefetch_to_device(batches: Iterable, depth: int = 2, device=None) -> Iterator:
    """Keep ``depth`` batches resident on device ahead of the consumer.

    Each item is a pytree of numpy arrays; returns the same pytrees as
    device arrays. Transfers are issued eagerly so the copy of batch k+1
    overlaps the computation on batch k.
    """
    buf: list = []
    it = iter(batches)
    devices = [device] if device is not None else None

    def put(item):
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, devices[0] if devices else None), item
        )

    try:
        for _ in range(depth):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
