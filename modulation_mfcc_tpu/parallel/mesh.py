"""Device mesh construction and axis conventions.

Axes:
  * ``data`` — batch/data parallelism over utterances (corpus sweeps).
  * ``time`` — sequence/context parallelism for long-form recordings
    (chunked streaming with halo exchange; SURVEY.md §2e/§5).

The reference has no parallelism at all (SURVEY.md §2e) — this layer is new.
Collectives are XLA-inserted (psum/all_gather/ppermute) over ICI; nothing is
hand-scheduled.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "P", "NamedSharding", "Mesh", "data_sharding"]


def make_mesh(
    n_data: int | None = None, n_time: int = 1, *, devices=None
) -> Mesh:
    """A (data, time) mesh over the available devices.

    With one real chip this is a 1x1 mesh; under the test/driver virtual CPU
    platform it spans the forced host device count.
    """
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_time
    use = np.array(devices[: n_data * n_time]).reshape(n_data, n_time)
    return Mesh(use, axis_names=("data", "time"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)
