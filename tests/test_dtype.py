"""Mixed-precision (bfloat16 compute dtype) tests.

The TPU-native addition ``Config.dtype = "bfloat16"`` runs every Dense /
BatchNorm / conv in bf16 (MXU-friendly, half the HBM traffic) while keeping
params, BN running statistics, and optimizer state in float32 and returning
float32 logits.  No reference equivalent (the reference is f32-only torch);
these tests pin the contract: same param tree, f32 logits, outputs close to
the f32 path, and end-to-end training still learns.
"""

import numpy as np
import jax
import jax.numpy as jnp

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.models import BUDDY, LinkPredictor
from subgraph_sketching_tpu.models.elph import ELPH


def _tree_dtypes(tree):
    return {jnp.asarray(x).dtype for x in jax.tree_util.tree_leaves(tree)}


def test_buddy_bf16_matches_f32():
    rng = jax.random.PRNGKey(0)
    B, d = 64, 32
    sf = jax.random.normal(rng, (B, 8))
    nf = jax.random.normal(jax.random.PRNGKey(1), (B, 2, d))
    deg = jnp.ones(B) * 3

    f32 = BUDDY(sf_dim=8, hidden_channels=32)
    bf16 = BUDDY(sf_dim=8, hidden_channels=32, dtype=jnp.bfloat16)
    var = f32.init({"params": rng, "dropout": rng}, sf, nf, deg, deg,
                   training=False)
    # same param tree: bf16 is a compute dtype, not a storage dtype
    var_b = bf16.init({"params": rng, "dropout": rng}, sf, nf, deg, deg,
                      training=False)
    assert jax.tree_util.tree_structure(var) == \
        jax.tree_util.tree_structure(var_b)
    assert _tree_dtypes(var_b["params"]) == {jnp.dtype(jnp.float32)}

    out32 = f32.apply(var, sf, nf, deg, deg, training=False)
    out16 = bf16.apply(var, sf, nf, deg, deg, training=False)
    assert out16.dtype == jnp.float32  # logits promised f32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.05, atol=0.05)


def test_link_predictor_bf16_matches_f32():
    rng = jax.random.PRNGKey(0)
    B = 64
    sf = jax.random.normal(rng, (B, 8))
    nf = jax.random.normal(jax.random.PRNGKey(1), (B, 2, 16))
    f32 = LinkPredictor(sf_dim=8, hidden_channels=16)
    bf16 = LinkPredictor(sf_dim=8, hidden_channels=16, dtype=jnp.bfloat16)
    var = f32.init({"params": rng, "dropout": rng}, sf, nf, training=False)
    out32 = f32.apply(var, sf, nf, training=False)
    out16 = bf16.apply(var, sf, nf, training=False)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.05, atol=0.05)


def test_elph_gcn_bf16_matches_f32():
    rng = jax.random.PRNGKey(0)
    n, d = 40, 16
    x = jax.random.normal(rng, (n, d))
    ei = jnp.stack([jnp.arange(n), jnp.roll(jnp.arange(n), 1)])
    ei = jnp.concatenate([ei, ei[::-1]], axis=1)
    from subgraph_sketching_tpu.sketch.params import SketchParams
    p = SketchParams(max_hops=2)
    f32 = ELPH(p, hidden_channels=16)
    bf16 = ELPH(p, hidden_channels=16, dtype=jnp.bfloat16)
    var = f32.init({"params": rng, "dropout": rng}, x, ei, n, training=False)
    o32, _ = f32.apply(var, x, ei, n, training=False)
    o16, _ = bf16.apply(var, x, ei, n, training=False)
    np.testing.assert_allclose(np.asarray(o16, dtype=np.float32),
                               np.asarray(o32), rtol=0.1, atol=0.1)


def test_seal_dgcnn_bf16_matches_f32():
    from subgraph_sketching_tpu.graph.container import Graph
    from subgraph_sketching_tpu.graph.seal import SEALDataset
    from subgraph_sketching_tpu.models.seal import SEALDGCNN
    from subgraph_sketching_tpu.graph.synthetic import barabasi_albert_graph

    ei = barabasi_albert_graph(30, 3, seed=1)
    g = Graph(ei, 30, x=np.eye(30, dtype=np.float32))
    pos = np.array([[0, 1], [4, 5]])
    neg = np.array([[1, 5], [2, 6]])
    ds = SEALDataset(g, pos, neg, num_hops=1, max_nodes=30, max_edges=128,
                     max_dist=10)
    raw = ds.batch(np.arange(4))
    batch = {"z": jnp.asarray(raw.z), "node_mask": jnp.asarray(raw.node_mask),
             "edge_index": jnp.asarray(raw.edge_index),
             "edge_weight": jnp.asarray(raw.edge_weight),
             "edge_mask": jnp.asarray(raw.edge_mask),
             "x": jnp.asarray(raw.x)}
    rng = jax.random.PRNGKey(0)
    f32 = SEALDGCNN(hidden_channels=8, num_layers=2, max_z=100, k=10)
    bf16 = SEALDGCNN(hidden_channels=8, num_layers=2, max_z=100, k=10,
                     dtype=jnp.bfloat16)
    var = f32.init({"params": rng, "dropout": rng}, batch, training=False)
    out32 = f32.apply(var, batch, training=False)
    out16 = bf16.apply(var, batch, training=False)
    assert out16.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               rtol=0.05, atol=0.05)


def test_buddy_trainer_bf16_end_to_end():
    """cfg.dtype='bfloat16' trains and evaluates; loss finite and learning."""
    from subgraph_sketching_tpu.graph.datasets import get_data
    from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
    from subgraph_sketching_tpu.train.loops import BuddyTrainer
    from subgraph_sketching_tpu.train.inference import test as run_test

    cfg = Config(dataset_name="synth-ws", hidden_channels=32, batch_size=512,
                 eval_batch_size=2048, model="BUDDY", K=50, lr=0.003,
                 dtype="bfloat16")
    splits, _, _ = get_data(cfg)
    ds = {k: build_link_dataset(sd, cfg, k) for k, sd in splits.items()}
    tr = BuddyTrainer(cfg, ds["train"], ds["train"].x.shape[-1])
    for s in ("valid", "test"):
        tr.stage(s, ds[s])
    state = tr.init_state(jax.random.PRNGKey(0))
    assert _tree_dtypes(state.params) == {jnp.dtype(jnp.float32)}
    rng = np.random.default_rng(0)
    best = 0.0
    for epoch in range(3):
        state, loss = tr.train_epoch(state, rng, jax.random.PRNGKey(epoch))
        assert np.isfinite(loss)
        _, val_auc, _ = run_test(tr, state, cfg, "auc")["AUC"]
        best = max(best, val_auc)
    # BN stats must have stayed f32
    assert _tree_dtypes(state.batch_stats) == {jnp.dtype(jnp.float32)}
    assert best > 0.8, f"bf16 training quality too low: {best}"
