"""Model shape/smoke tests + end-to-end train/eval runs on synthetic data
(reference test strategy patterns 5-6, SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import (
    build_link_dataset, sketch_params_from_config,
)
from subgraph_sketching_tpu.models import BUDDY, LinkPredictor, SIGN
from subgraph_sketching_tpu.models.elph import ELPH


def small_cfg(**kw):
    base = dict(dataset_name="synth-ba", hidden_channels=32, batch_size=256,
                eval_batch_size=512, epochs=1, model="BUDDY", K=20)
    base.update(kw)
    return Config(**base)


def test_buddy_forward_shapes():
    cfg = small_cfg()
    model = BUDDY(sf_dim=8, hidden_channels=32)
    rng = jax.random.PRNGKey(0)
    B, d = 16, 64
    sf = jnp.ones((B, 8))
    nf = jnp.ones((B, 2, d))
    var = model.init({"params": rng, "dropout": rng}, sf, nf,
                     jnp.ones(B), jnp.ones(B), training=False)
    out = model.apply(var, sf, nf, jnp.ones(B), jnp.ones(B), training=False)
    assert out.shape == (B, 1)


def test_buddy_normed_features_and_ra():
    model = BUDDY(sf_dim=8, hidden_channels=16, append_normalised=True,
                  use_RA=True)
    rng = jax.random.PRNGKey(0)
    B, d = 8, 32
    sf, nf = jnp.ones((B, 8)), jnp.ones((B, 2, d))
    deg = jnp.concatenate([jnp.zeros(4), jnp.ones(4) * 3])  # zero-degree guard
    var = model.init({"params": rng, "dropout": rng}, sf, nf, deg, deg,
                     RA=jnp.ones(B), training=False)
    out = model.apply(var, sf, nf, deg, deg, RA=jnp.ones(B), training=False)
    assert out.shape == (B, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_sign_shapes():
    # (reference test_sign.py:31-69)
    model = SIGN(hidden_channels=16, out_channels=16, K=2, dropout=0.0)
    rng = jax.random.PRNGKey(0)
    xs = jnp.ones((8, 2, 30))  # 3 blocks of 10
    var = model.init({"params": rng, "dropout": rng}, xs, training=False)
    out = model.apply(var, xs, training=False)
    assert out.shape == (8, 2, 16)


@pytest.mark.parametrize("feature_prop", ["gcn", "residual"])
def test_elph_forward_shapes(ba_graph, feature_prop):
    from subgraph_sketching_tpu.sketch import SketchParams
    from subgraph_sketching_tpu.sketch.elph import initialise_sketches
    params = SketchParams(max_hops=2)
    n = 30
    model = ELPH(params, hidden_channels=16, feature_prop=feature_prop)
    rng = jax.random.PRNGKey(0)
    x = jnp.ones((n, 12))
    mh0, hll0 = initialise_sketches(n, params)
    var = model.init({"params": rng, "dropout": rng}, x,
                     jnp.asarray(ba_graph), n, jnp.asarray(mh0),
                     jnp.asarray(hll0), training=False)
    feats, sk = model.apply(var, x, jnp.asarray(ba_graph), n,
                            jnp.asarray(mh0), jnp.asarray(hll0),
                            training=False)
    assert feats.shape == (n, 16)
    assert sk.minhash.shape == (3, n, 128)
    assert sk.cards.shape == (n, 2)
    # without init sketches: features only
    feats2, sk2 = model.apply(var, x, jnp.asarray(ba_graph), n,
                              training=False)
    assert sk2 is None
    np.testing.assert_allclose(np.asarray(feats), np.asarray(feats2),
                               rtol=1e-5)


def test_link_predictor_shapes():
    model = LinkPredictor(sf_dim=8, hidden_channels=16)
    rng = jax.random.PRNGKey(0)
    sf, nf = jnp.ones((8, 8)), jnp.ones((8, 2, 16))
    var = model.init({"params": rng, "dropout": rng}, sf, nf, training=False)
    out = model.apply(var, sf, nf, training=False)
    assert out.shape == (8, 1)


# ------------------------------------------------------- end-to-end smoke --

def test_buddy_end_to_end_run():
    """Real train/eval loop on a synthetic graph ('no exceptions is a pass'
    plus sanity on the metric; reference test_buddy.py:123-128)."""
    from subgraph_sketching_tpu.runners.run import run
    cfg = small_cfg(epochs=2, train_samples=0.5)
    results = run(cfg)
    test_res, val_res, train_res = results[0]
    assert 0.0 <= val_res <= 1.0


def test_elph_end_to_end_run():
    from subgraph_sketching_tpu.runners.run import run
    cfg = small_cfg(model="ELPH", epochs=2, hidden_channels=16)
    results = run(cfg)
    assert 0.0 <= results[0][1] <= 1.0


@pytest.mark.parametrize("model", ["BUDDY", "ELPH", "SEALGCN"])
def test_ddi_shape_config_end_to_end(model):
    """The ogbl-ddi configuration shape (reference README ddi commands):
    no node features, trainable transductive embeddings ("the E in SEAL"),
    SIGN-diffused before lookup for BUDDY/ELPH (--use_feature 0
    --train_node_embedding --propagate_embeddings).  Regression: ELPH
    init_state crashed when the featureless GCN side had no params; SEAL
    models ignored the embedding entirely."""
    from subgraph_sketching_tpu.runners.run import run
    cfg = small_cfg(dataset_name="synth-er", model=model, epochs=1,
                    hidden_channels=8, batch_size=128, eval_batch_size=256,
                    use_feature=False, train_node_embedding=True,
                    propagate_embeddings=True, sign_k=1)
    results = run(cfg)
    assert 0.0 <= results[0][1] <= 1.0


def test_pretrained_frozen_embedding(tmp_path):
    """--pretrained_node_embedding loads a frozen table (reference
    select_embedding, utils.py:57-60): BUDDY/ELPH/SEAL all consume it, and
    it is data, not a parameter (no gradient, no optimizer state)."""
    from subgraph_sketching_tpu.runners.run import run
    from subgraph_sketching_tpu.train.loops import BuddyTrainer

    w = np.random.default_rng(0).normal(size=(1000, 8)).astype(np.float32)
    path = str(tmp_path / "emb.npy")
    np.save(path, w)
    for model in ("BUDDY", "ELPH", "SEALGCN"):
        cfg = small_cfg(dataset_name="synth-er", model=model, epochs=1,
                        hidden_channels=8, batch_size=128,
                        eval_batch_size=256, train_samples=128,
                        pretrained_node_embedding=path)
        res = run(cfg)
        assert 0.0 <= res[0][1] <= 1.0

    cfg = small_cfg(dataset_name="synth-er", model="BUDDY", epochs=1,
                    hidden_channels=8, batch_size=128, eval_batch_size=256,
                    pretrained_node_embedding=path)
    splits, _, _ = get_data(cfg)
    ds = build_link_dataset(splits["train"], cfg, "train")
    tr = BuddyTrainer(cfg, ds, ds.x.shape[-1])
    state = tr.init_state(jax.random.PRNGKey(0))
    assert "node_embedding" not in state.params

    with pytest.raises(ValueError, match="mutually exclusive"):
        small_cfg(train_node_embedding=True, pretrained_node_embedding=path)


def test_mrr_metric_through_runner():
    """--eval_metric mrr end-to-end (the citation2 protocol shape)."""
    from subgraph_sketching_tpu.runners.run import run
    cfg = small_cfg(dataset_name="synth-er", epochs=1, hidden_channels=8,
                    batch_size=128, eval_batch_size=256, eval_metric="mrr")
    results = run(cfg)
    assert 0.0 <= results[0][1] <= 1.0


def test_buddy_learns_on_easy_graph():
    """BUDDY should beat random AUC quickly on a BA graph where structure
    features are highly informative."""
    from subgraph_sketching_tpu.runners.run import run
    cfg = small_cfg(epochs=5, eval_metric="auc", lr=0.01)
    # auc path returns (train, val, test) triples
    from subgraph_sketching_tpu.graph.datasets import get_data
    from subgraph_sketching_tpu.train.loops import BuddyTrainer
    from subgraph_sketching_tpu.train.inference import test as run_test
    splits, directed, _ = get_data(cfg)
    datasets = {k: build_link_dataset(sd, cfg, k) for k, sd in splits.items()}
    trainer = BuddyTrainer(cfg, datasets["train"], datasets["train"].x.shape[-1])
    for s in ("valid", "test"):
        trainer.stage(s, datasets[s])
    state = trainer.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    best = 0.0
    # BA graphs have weak CN signal once supervision edges are held out and
    # the tiny model overfits fast, so track best-val like the runner does
    for epoch in range(5):
        state, loss = trainer.train_epoch(state, rng, jax.random.PRNGKey(epoch))
        _, val_auc, _ = run_test(trainer, state, cfg, "auc")["AUC"]
        best = max(best, val_auc)
    assert best > 0.7, f"best val AUC {best} too low - model not learning"


def test_buddy_quality_on_small_world():
    """Learning-quality gate: on a high-clustering graph the full pipeline
    must reach strong link-prediction AUC quickly (sketch signal + MLP)."""
    from subgraph_sketching_tpu.graph.datasets import get_data
    from subgraph_sketching_tpu.train.loops import BuddyTrainer
    from subgraph_sketching_tpu.train.inference import test as run_test
    cfg = Config(dataset_name="synth-ws", hidden_channels=64, batch_size=512,
                 eval_batch_size=4096, model="BUDDY", K=50, lr=0.003)
    splits, _, _ = get_data(cfg)
    ds = {k: build_link_dataset(sd, cfg, k) for k, sd in splits.items()}
    tr = BuddyTrainer(cfg, ds["train"], ds["train"].x.shape[-1])
    for s in ("valid", "test"):
        tr.stage(s, ds[s])
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    best = 0.0
    for epoch in range(3):
        state, _ = tr.train_epoch(state, rng, jax.random.PRNGKey(epoch))
        _, val_auc, _ = run_test(tr, state, cfg, "auc")["AUC"]
        best = max(best, val_auc)
    assert best > 0.9, f"val AUC {best} below quality gate"
