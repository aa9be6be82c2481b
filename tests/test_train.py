"""Training-infrastructure tests: losses, metrics, checkpointing, eval
subsets, scaling harness."""

import math
import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subgraph_sketching_tpu.train.evaluation import hits_at_k, mrr, roc_auc
from subgraph_sketching_tpu.train.losses import auc_loss, bce_loss


def test_bce_masking():
    logits = jnp.asarray([10.0, -10.0, 99.0])
    labels = jnp.asarray([1.0, 0.0, 0.0])
    mask = jnp.asarray([True, True, False])
    # masked-out entry (bad prediction) must not affect the loss
    assert float(bce_loss(logits, labels, mask)) < 0.01


def test_auc_loss_pairs_pos_neg():
    logits = jnp.asarray([2.0, 0.0, 2.0, 0.0])
    labels = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    # pos - neg = 2 -> (1 - 2)^2 = 1 per pair, 2 pairs
    assert float(auc_loss(logits, labels)) == pytest.approx(2.0)


def test_hits_at_k_matches_definition():
    pos = jnp.asarray([3.0, 1.0, 0.5])
    neg = jnp.asarray([2.0, 0.9, 0.8, 0.7])
    # K=2: 2nd best neg = 0.9 -> pos > 0.9: {3.0, 1.0} -> 2/3
    assert hits_at_k(pos, neg, 2) == pytest.approx(2 / 3)
    # fewer negs than K -> 1.0 (ogb convention)
    assert hits_at_k(pos, neg, 10) == 1.0


def test_mrr_matches_definition():
    pos = jnp.asarray([1.0])
    neg = jnp.asarray([[2.0, 0.5, 0.1]])
    # one neg above -> optimistic=1 pessimistic=1 -> rank 2 -> 1/2
    assert mrr(pos, neg) == pytest.approx(0.5)


def test_roc_auc_matches_sklearn():
    from sklearn.metrics import roc_auc_score
    rng = np.random.default_rng(0)
    pred = rng.random(200)
    pred[50:60] = pred[40]  # ties
    labels = (rng.random(200) < 0.4).astype(float)
    assert roc_auc(pred, labels) == pytest.approx(
        roc_auc_score(labels, pred), abs=1e-9)


def test_eval_subset_semantics():
    from subgraph_sketching_tpu.train.loops import eval_subset
    full = eval_subset(100, None)
    np.testing.assert_array_equal(full, np.arange(100))
    sub = eval_subset(100, 30)
    assert len(sub) == 30 and len(set(sub.tolist())) == 30
    assert (np.diff(sub) > 0).all()  # sorted
    # citation2 keeps the ordered prefix (aligned same-source negatives)
    cit = eval_subset(100, 30, "ogbl-citation2")
    np.testing.assert_array_equal(cit, np.arange(30))
    # with num_pos known, the subsample is pos/neg-ALIGNED: k positives +
    # those k positives' negative blocks (regression: a plain prefix of the
    # pos-then-neg layout handed evaluate_mrr other positives' negatives)
    cit = eval_subset(total=120, n_samples=30, dataset_name="ogbl-citation2",
                      num_pos=20)           # 5 negs per positive
    k = 30 // 6
    np.testing.assert_array_equal(
        cit, np.concatenate([np.arange(k), 20 + np.arange(k * 5)]))


def test_checkpoint_roundtrip():
    from subgraph_sketching_tpu.train.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )
    from subgraph_sketching_tpu.train.loops import TrainState
    state = TrainState(
        params={"w": jnp.arange(6.0).reshape(2, 3)},
        batch_stats={"bn": {"mean": jnp.ones(3)}},
        opt_state={"mu": jnp.zeros(3)})
    with tempfile.TemporaryDirectory() as d:
        save_checkpoint(d, state, step=7)
        restored, step = restore_checkpoint(d)
        assert step == 7
        np.testing.assert_array_equal(np.asarray(restored["params"]["w"]),
                                      np.arange(6.0).reshape(2, 3))
        np.testing.assert_array_equal(
            np.asarray(restored["batch_stats"]["bn"]["mean"]), np.ones(3))


def test_scaling_harness_runs():
    from subgraph_sketching_tpu.parallel.scaling import (
        measure_scaling, scaling_efficiency,
    )
    res = measure_scaling(num_nodes=500, avg_deg=4, device_counts=[1, 2],
                          iters=1)
    eff = scaling_efficiency(res)
    assert set(res) == {1, 2}
    assert all(v > 0 for v in res.values())
    assert eff[1] == pytest.approx(1.0)


def test_metrics_logger_jsonl():
    import json
    from subgraph_sketching_tpu.metrics_logging import MetricsLogger
    with tempfile.TemporaryDirectory() as d:
        ml = MetricsLogger(run_dir=d, config={"a": 1})
        ml.log({"loss": 1.0})
        ml.log({"loss": 0.5}, step=10)
        ml.finish()
        lines = [json.loads(l) for l in
                 open(os.path.join(d, "metrics.jsonl"))]
        assert lines[0]["loss"] == 1.0 and lines[1]["step"] == 10


def test_elph_plan_spmm_step_matches_scatter():
    """The staged differentiable PlanSpmm inside the jitted ELPH step is
    the same math as the scatter SpMM: identical loss trajectory and
    predictions (use_plan toggles the path)."""
    import jax
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.datasets import get_data
    from subgraph_sketching_tpu.graph.preprocess import (
        build_link_dataset, sketch_params_from_config,
    )
    from subgraph_sketching_tpu.train.loops import ElphTrainer

    out = {}
    for use_plan in (True, False):
        cfg = Config(dataset_name="synth-er", model="ELPH", epochs=2,
                     hidden_channels=16, batch_size=256,
                     eval_batch_size=512, K=20, feature_dropout=0.0,
                     label_dropout=0.0, use_plan=use_plan)
        splits, _, _ = get_data(cfg)
        ds = {k: build_link_dataset(sd, cfg, k) for k, sd in splits.items()}
        tr = ElphTrainer(cfg, ds["train"], sketch_params_from_config(cfg),
                         ds["train"].x.shape[-1])
        tr.stage("valid", ds["valid"])
        if use_plan:
            assert "train" in tr._spmm_plans, "plan path not engaged"
        state = tr.init_state(jax.random.PRNGKey(0))
        losses = []
        for ep in range(2):
            state, loss = tr.train_epoch(state, np.random.default_rng(ep),
                                         jax.random.PRNGKey(10 + ep))
            losses.append(loss)
        pred, _ = tr.predict(state, "valid")
        out[use_plan] = (np.asarray(losses), pred)

    np.testing.assert_allclose(out[True][0], out[False][0],
                               rtol=1e-4, atol=1e-5)
    # after 2 epochs of training the different (but equivalent) summation
    # orders have compounded through the weights — logits track to ~1e-2
    np.testing.assert_allclose(out[True][1], out[False][1],
                               rtol=1e-2, atol=1e-2)


@pytest.mark.parametrize("model", ["BUDDY", "ELPH"])
def test_embedding_diffusion_plan_matches_scatter(model):
    """ddi-shape (per-step SIGN diffusion of the embedding table): the
    staged PlanSpmm path is the same math as the scatter SpMM, for both
    model families."""
    import jax
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.datasets import get_data
    from subgraph_sketching_tpu.graph.preprocess import (
        build_link_dataset, sketch_params_from_config,
    )
    from subgraph_sketching_tpu.train.loops import BuddyTrainer, ElphTrainer

    losses = {}
    for use_plan in (True, False):
        cfg = Config(dataset_name="synth-er", model=model, epochs=1,
                     hidden_channels=16, batch_size=256,
                     eval_batch_size=512, K=20, use_feature=False,
                     train_node_embedding=True, propagate_embeddings=True,
                     sign_k=1, sign_dropout=0.0, label_dropout=0.0,
                     feature_dropout=0.0, use_plan=use_plan)
        splits, _, _ = get_data(cfg)
        ds = build_link_dataset(splits["train"], cfg, "train")
        if model == "BUDDY":
            tr = BuddyTrainer(cfg, ds, None)
        else:
            tr = ElphTrainer(cfg, ds, sketch_params_from_config(cfg), None)
        if use_plan:
            assert "train" in tr._emb_spmm_plans, "emb plan not engaged"
        state = tr.init_state(jax.random.PRNGKey(0))
        state, loss = tr.train_epoch(state, np.random.default_rng(0),
                                     jax.random.PRNGKey(3))
        losses[use_plan] = loss
    np.testing.assert_allclose(losses[True], losses[False],
                               rtol=1e-4, atol=1e-5)
