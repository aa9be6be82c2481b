"""Re-staging cache-consistency regressions: jits and plan records
specialised to a split's staged arrays must be invalidated when the split
is re-staged with a different dataset."""

import numpy as np
import jax
import pytest

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import (
    build_link_dataset,
    sketch_params_from_config,
)
from subgraph_sketching_tpu.train.loops import ElphTrainer


def _cfg(**kw):
    base = dict(dataset_name="synth-er", model="ELPH", hidden_channels=16,
                batch_size=256, eval_batch_size=512, K=20,
                feature_dropout=0.0, label_dropout=0.0)
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def datasets():
    cfg = _cfg()
    splits, _, _ = get_data(cfg)
    ds = {k: build_link_dataset(sd, cfg, k) for k, sd in splits.items()}
    cfg_b = _cfg(dataset_name="synth-ba")
    splits_b, _, _ = get_data(cfg_b)
    ds_b = build_link_dataset(splits_b["test"], cfg_b, "test")
    return cfg, ds, ds_b


def _trainer(cfg, ds):
    return ElphTrainer(cfg, ds["train"], sketch_params_from_config(cfg),
                       ds["train"].x.shape[-1])


def test_plan_reuse_no_stale_records(datasets):
    """Regression: a split that re-stages onto the reuse path must also
    refresh its _plan_edges record, or a later split with the OLD graph
    matches the stale record and silently gets the wrong SpMM plan."""
    cfg, ds, ds_b = datasets
    tr = _trainer(cfg, ds)
    assert "train" in tr._spmm_plans
    tr.stage("valid", ds_b)                  # valid records graph B
    tr.stage("valid", ds["valid"])           # re-stage: shares train graph
    assert tr._spmm_plans["valid"] is tr._spmm_plans["train"], \
        "expected the reuse path (valid shares the train message graph)"
    tr.stage("test", ds_b)                   # graph B again
    assert tr._spmm_plans["test"] is not tr._spmm_plans["train"], \
        "test matched a stale 'valid' record and got the train-graph plan"


def test_predict_after_restage_matches_fresh_trainer(datasets):
    """Regression: predict() caches a per-split jit closing over the
    split's SpMM plan and num_nodes; re-staging the split must invalidate
    it or eval runs the old plan against the new tables."""
    cfg, ds, ds_b = datasets
    fresh = _trainer(cfg, ds)
    fresh.stage("valid", ds_b)
    state = fresh.init_state(jax.random.PRNGKey(0))
    want, want_labels = fresh.predict(state, "valid")

    tr = _trainer(cfg, ds)
    tr.stage("valid", ds["valid"])
    tr.predict(state, "valid")               # primes the per-split jit
    tr.stage("valid", ds_b)                  # re-stage with another graph
    got, got_labels = tr.predict(state, "valid")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(got_labels, want_labels)


def test_restage_train_rebuilds_epoch_jit(datasets):
    """Regression: the train-epoch jit bakes in the link count; re-staging
    'train' with a different-size split must rebuild it."""
    cfg, ds, ds_b = datasets
    tr = _trainer(cfg, ds)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, _ = tr.train_epoch(state, np.random.default_rng(0),
                              jax.random.PRNGKey(0))
    assert hasattr(tr, "_epoch_jit")
    assert ds_b.links.shape[0] != ds["train"].links.shape[0]
    tr.stage("train", ds_b)
    state2 = tr.init_state(jax.random.PRNGKey(0))
    state2, loss = tr.train_epoch(state2, np.random.default_rng(0),
                                  jax.random.PRNGKey(0))
    assert np.isfinite(loss)
