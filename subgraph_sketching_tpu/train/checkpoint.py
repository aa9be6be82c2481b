"""Checkpointing of params + optimizer state.

The reference only saves final weights (run.py:108-110) with no resume path;
here full train state (params, batch_stats, opt_state) round-trips through
orbax, giving real mid-run resume.
"""

from __future__ import annotations

import json
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
        # genuinely sharded process-spanning array: hand it to orbax
        # unchanged — its ArrayHandler writes each host's shards natively
        # (converting here would need a gather; refusing would break
        # model/optimizer-sharded layouts that used to save fine)
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
    # only fully-numeric suffixes are complete checkpoints: a crash mid-save
    # leaves orbax temp dirs like ``step_4.orbax-checkpoint-tmp-<ts>`` behind,
    # and --resume must skip those (crash recovery is exactly when they exist)
    steps = sorted(int(d[5:]) for d in os.listdir(base)
                   if d.startswith("step_") and d[5:].isdigit())
    return steps[-1] if steps else None


def save_run_meta(directory: str, step: int, meta: dict) -> None:
    """Sidecar JSON next to ``step_<N>`` holding host-side run state that is
    not part of the device pytree (best-val tracking: val/test/train_res,
    best_epoch).  Without it a resumed run restarts best-val selection at
    0.0 and reports a different best metric than an uninterrupted run even
    though the device state is bit-identical.  Written atomically; only the
    writing process needs it to succeed (readers fall back to zeros)."""
    base = os.path.abspath(directory)
    os.makedirs(base, exist_ok=True)
    tmp = os.path.join(base, f"meta_step_{step}.json.tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(base, f"meta_step_{step}.json"))


def load_run_meta(directory: str, step: int) -> Optional[dict]:
    path = os.path.join(os.path.abspath(directory), f"meta_step_{step}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


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
