"""Determinism checker (train/determinism.py — the race-detection slot).

Verifies (a) a healthy jitted epoch passes the bitwise rerun check, (b) the
caller's state survives the check unmutated despite buffer donation inside
the epoch jit, and (c) an actually-nondeterministic trainer is caught.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.train.determinism import check_epoch_determinism


def _buddy():
    from subgraph_sketching_tpu.graph.datasets import get_data
    from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
    from subgraph_sketching_tpu.train.loops import BuddyTrainer

    cfg = Config(dataset_name="synth-ba", hidden_channels=16, batch_size=128,
                 model="BUDDY")
    splits, _, _ = get_data(cfg)
    ds = {k: build_link_dataset(sd, cfg, k) for k, sd in splits.items()}
    tr = BuddyTrainer(cfg, ds["train"], ds["train"].x.shape[-1])
    return tr, tr.init_state(jax.random.PRNGKey(0))


def test_healthy_epoch_is_deterministic():
    tr, state = _buddy()
    n, loss = check_epoch_determinism(tr, state, jax.random.PRNGKey(7))
    assert n > 0 and np.isfinite(loss)
    # the snapshot protected the caller's state from donation: training can
    # continue from it afterwards
    state2, loss2 = tr.train_epoch(state, np.random.default_rng(0),
                                   jax.random.PRNGKey(8))
    assert np.isfinite(loss2)


def test_nondeterminism_is_caught():
    class RacyTrainer:
        """Emulates an unstable reduction: results differ across calls."""

        def __init__(self):
            self.calls = 0

        def train_epoch(self, state, rng, key):
            self.calls += 1
            return jax.tree.map(lambda x: x + self.calls, state), 0.5

    with pytest.raises(AssertionError, match="nondeterministic"):
        check_epoch_determinism(RacyTrainer(),
                                {"w": jnp.zeros((2, 2))},
                                jax.random.PRNGKey(0))
