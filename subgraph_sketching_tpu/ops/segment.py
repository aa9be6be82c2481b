"""Segment reductions over padded edge lists.

These are the TPU-native primitives that replace torch_scatter /
PyG ``MessagePassing(aggr='max')`` (reference: src/hashing.py:28-45).
All shapes are static: edge arrays may be padded, with a boolean mask
selecting real edges.  Padded lanes contribute the reduction identity.

The jnp versions compile to XLA scatter ops; the padded-tree reduction plans
in ``ops.segment_scan`` provide the gather-based fast path for the hot loops
(hand-written Pallas kernels were measured and retired — see
``studies/README.md`` for the numbers).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _mask_to_identity(data: jnp.ndarray, mask: Optional[jnp.ndarray], identity):
    if mask is None:
        return data
    m = mask.reshape(mask.shape + (1,) * (data.ndim - mask.ndim))
    return jnp.where(m, data, jnp.asarray(identity, dtype=data.dtype))


def _min_identity(dtype):
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.iinfo(dtype).max
    return jnp.inf


def _max_identity(dtype):
    if jnp.issubdtype(dtype, jnp.integer):
        return jnp.iinfo(dtype).min
    return -jnp.inf


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """sum_{e : seg[e]=v} data[e] with padded lanes contributing 0."""
    data = _mask_to_identity(data, mask, 0)
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_min(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """min_{e : seg[e]=v} data[e]; segments with no edges get the dtype max."""
    data = _mask_to_identity(data, mask, _min_identity(data.dtype))
    return jax.ops.segment_min(data, segment_ids, num_segments=num_segments)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """max_{e : seg[e]=v} data[e]; segments with no edges get the dtype min."""
    data = _mask_to_identity(data, mask, _max_identity(data.dtype))
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
