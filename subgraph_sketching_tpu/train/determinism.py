"""Run-to-run determinism checking (the TPU analogue of race detection).

The reference has no race/sanitizer story (SURVEY.md §5) — and on a GPU it
couldn't have one cheaply: torch scatter kernels are nondeterministic by
default.  Here every epoch is a jitted pure function of
``(state, epoch_key)`` (the shuffle and dropout streams are derived from
the key on device, the host RNG is unused), so nondeterminism — an
unstable cross-replica reduction, a data race in a custom kernel, silent
hardware flakiness — is detectable by construction: run the same epoch
twice from a snapshot and compare every output array bit-for-bit.

Enable with ``--check_determinism`` (runs once, before training starts).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _snapshot(state):
    """Deep-copy all device arrays: the epoch jit donates its input state,
    which would otherwise invalidate the buffers we want to rerun from."""
    return jax.tree.map(
        lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x,
        state)


def _diff_leaves(a, b) -> list:
    la, _ = jax.tree.flatten(a)
    lb, _ = jax.tree.flatten(b)
    bad = []
    for i, (x, y) in enumerate(zip(la, lb)):
        xa, ya = np.asarray(x), np.asarray(y)
        if xa.tobytes() != ya.tobytes():   # bitwise, NaN-safe
            bad.append(i)
    return bad


def check_epoch_determinism(trainer, state, epoch_key: jax.Array,
                            rng: np.random.Generator | None = None
                            ) -> Tuple[int, float]:
    """Run one training epoch twice from identical state and assert the
    resulting states and losses are bit-identical.

    Returns (num_arrays_compared, loss).  Raises AssertionError naming the
    diverging leaves otherwise.  The caller's ``state`` is left untouched
    (both runs start from private copies).
    """
    import copy
    rng = rng if rng is not None else np.random.default_rng(0)
    # identical host-RNG state per run (SEAL's epoch draws its shuffle from
    # it; BUDDY/ELPH ignore it) — deepcopy preserves the generator state
    s1, l1 = trainer.train_epoch(_snapshot(state), copy.deepcopy(rng),
                                 epoch_key)
    s2, l2 = trainer.train_epoch(_snapshot(state), copy.deepcopy(rng),
                                 epoch_key)
    bad = _diff_leaves(s1, s2)
    n = len(jax.tree.flatten(s1)[0])
    assert not bad and l1 == l2, (
        f"nondeterministic epoch: loss {l1!r} vs {l2!r}, "
        f"{len(bad)}/{n} state arrays differ bitwise (leaf indices {bad[:8]}"
        f"{'...' if len(bad) > 8 else ''}). This indicates an unstable "
        f"reduction or a racy kernel — file it before trusting any run.")
    return n, float(l1)
