"""Device-mesh construction for multi-chip scaling.

The reference is single-device (SURVEY.md §2d); everything here is new scope.
Axes:
  * ``data``  — link-batch data parallelism (BUDDY/ELPH training)
  * ``graph`` — edge/node partitioning for sketch construction + SpMM
  * ``lane``  — sketch-width sharding (minhash perms / HLL registers), the
    tensor-parallel-like axis
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Optional[Sequence[int]] = None,
              axes: Sequence[str] = ("data",),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = [len(devices)]
    assert int(np.prod(shape)) <= len(devices), (
        f"mesh shape {shape} needs more than the {len(devices)} visible devices")
    dev_array = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(dev_array, tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
