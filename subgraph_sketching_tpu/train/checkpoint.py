"""Checkpointing of params + optimizer state.

The reference only saves final weights (run.py:108-110) with no resume path;
here full train state (params, batch_stats, opt_state) round-trips through
orbax, giving real mid-run resume.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _to_host(x):
    """Multi-process runs call save_checkpoint on EVERY process (orbax's
    internal barrier requires it; the primary host does the writing).
    Process-spanning jax.Arrays are converted to the local replica first —
    replicated state (the data-parallel layout) is identical on every
    host; genuinely sharded state must be gathered/replicated by the
    caller."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_shards[0].data)
        raise ValueError(
            "save_checkpoint on one process of a multi-process run needs "
            "fully-replicated state; gather or replicate before saving")
    return x


def save_checkpoint(directory: str, state, step: int = 0) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(os.path.abspath(directory), f"step_{step}")
    _ckptr().save(path, jax.tree.map(_to_host, state._asdict()),
                  force=True)
    return path


def latest_step(directory: str) -> Optional[int]:
    base = os.path.abspath(directory)
    if not os.path.isdir(base):
        return None
    steps = sorted(int(d.split("_")[1]) for d in os.listdir(base)
                   if d.startswith("step_"))
    return steps[-1] if steps else None


def restore_checkpoint(directory: str, step: Optional[int] = None):
    """Returns the raw state dict (caller rebuilds its TrainState)."""
    base = os.path.abspath(directory)
    if step is None:
        step = latest_step(base)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {base}")
    return _ckptr().restore(os.path.join(base, f"step_{step}")), step


def restore_into(directory: str, template_state, step: Optional[int] = None):
    """Restore into the exact pytree structure of ``template_state`` (so
    optax NamedTuple opt states survive the round-trip)."""
    base = os.path.abspath(directory)
    if step is None:
        step = latest_step(base)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {base}")
    restored = _ckptr().restore(os.path.join(base, f"step_{step}"),
                                item=jax.tree.map(lambda x: x,
                                                  template_state._asdict()))
    cls = type(template_state)
    return cls(**restored), step
