"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from subgraph_sketching_tpu.graph import Graph
from subgraph_sketching_tpu.parallel import (
    edge_sharded_build_hash_tables, lane_sharded_subgraph_features, make_mesh,
)
from subgraph_sketching_tpu.sketch import (
    SketchParams, build_hash_tables, subgraph_features,
)
from subgraph_sketching_tpu.sketch.elph import initialise_sketches


@pytest.fixture(scope="module")
def setup(request):
    from subgraph_sketching_tpu.graph.synthetic import barabasi_albert_graph
    g = Graph(barabasi_albert_graph(64, 4, seed=1), 64)
    params = SketchParams(max_hops=2)
    sk_ref = build_hash_tables(jnp.asarray(g.edge_index), 64, params)
    links = np.stack([np.arange(32), (np.arange(32) * 7 + 3) % 64],
                     axis=1).astype(np.int32)
    return g, params, sk_ref, links


def test_edge_sharded_matches_single_device(setup):
    g, params, sk_ref, links = setup
    assert len(jax.devices()) == 8
    mesh = make_mesh([8], ("graph",))
    ei, w, mask = g.padded_edges(multiple=8)
    mh0, hll0 = initialise_sketches(64, params)
    sk = edge_sharded_build_hash_tables(
        jnp.asarray(ei), 64, params, mesh, jnp.asarray(mh0),
        jnp.asarray(hll0), mask=jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(sk.minhash),
                                  np.asarray(sk_ref.minhash))
    np.testing.assert_array_equal(np.asarray(sk.hll), np.asarray(sk_ref.hll))
    np.testing.assert_allclose(np.asarray(sk.cards), np.asarray(sk_ref.cards),
                               rtol=1e-5)


def test_lane_sharded_matches_single_device(setup):
    g, params, sk_ref, links = setup
    mesh = make_mesh([8], ("lane",))
    sf_ref = np.asarray(subgraph_features(jnp.asarray(links), sk_ref, params))
    sf = np.asarray(lane_sharded_subgraph_features(
        jnp.asarray(links), sk_ref, params, mesh))
    # same estimator core as single-device (hll_count_from_stats) — only f32
    # reduction order can differ
    np.testing.assert_allclose(sf, sf_ref, rtol=1e-6, atol=1e-4)


def test_lane_sharded_accepts_hops_only_stacks(setup):
    """Regression: the lane path hardcoded hops-0..K stacks ([1:] slices /
    hll[k+1]) and broke on K-row hops-only stacks — the citation2-scale
    memory-fit layout (--hops_only_sketches) could not combine with the
    lane mesh axis."""
    g, params, sk_ref, links = setup
    mesh = make_mesh([8], ("lane",))
    sk_ho = build_hash_tables(jnp.asarray(g.edge_index), 64, params,
                              hops_only=True)
    assert sk_ho.minhash.shape[0] == params.max_hops  # K rows, no hop 0
    sf_ref = np.asarray(subgraph_features(jnp.asarray(links), sk_ref, params))
    sf = np.asarray(lane_sharded_subgraph_features(
        jnp.asarray(links), sk_ho, params, mesh))
    np.testing.assert_allclose(sf, sf_ref, rtol=1e-6, atol=1e-4)


def test_lane_sharded_batched_matches_one_shot(setup):
    """The chunked lane-feature driver (memory-bounded) equals the one-shot
    path, including across chunk boundaries and the padded tail."""
    from subgraph_sketching_tpu.parallel import (
        lane_sharded_subgraph_features_batched,
    )
    g, params, sk_ref, links = setup
    mesh = make_mesh([8], ("lane",))
    rng = np.random.default_rng(5)
    many = np.stack([rng.integers(0, 64, 700),
                     rng.integers(0, 64, 700)], axis=1).astype(np.int32)
    one_shot = np.asarray(lane_sharded_subgraph_features(
        jnp.asarray(many), sk_ref, params, mesh))
    chunked = np.asarray(lane_sharded_subgraph_features_batched(
        many, sk_ref, params, mesh, batch_size=256))
    np.testing.assert_allclose(chunked, one_shot, rtol=1e-6, atol=1e-4)
    # empty split stages cleanly (mirrors subgraph_features_batched)
    empty = lane_sharded_subgraph_features_batched(
        np.zeros((0, 2), np.int32), sk_ref, params, mesh)
    assert empty.shape == (0, params.sf_dim)


@pytest.mark.parametrize("method", ["contiguous", "locality"])
def test_node_sharded_build_matches_single_device(setup, method):
    """Memory-sharded (node-partitioned, halo-exchange) construction must be
    bit-exact with the single-device build AND hold only ~1/D of the table
    per device — for both the id-order and locality (RCM) partitioners."""
    from subgraph_sketching_tpu.parallel import (
        make_node_partition, node_sharded_build_hash_tables,
    )
    g, params, sk_ref, links = setup
    n = g.num_nodes
    mesh = make_mesh([8], ("graph",))
    plan = make_node_partition(np.asarray(g.edge_index), n, 8, method=method)
    mh0, hll0 = plan.pad_init(*initialise_sketches(n, params))
    sk = node_sharded_build_hash_tables(plan, params, mesh, mh0, hll0)
    np.testing.assert_array_equal(plan.to_node_order(sk.minhash),
                                  np.asarray(sk_ref.minhash))
    np.testing.assert_array_equal(plan.to_node_order(sk.hll),
                                  np.asarray(sk_ref.hll))
    np.testing.assert_allclose(plan.to_node_order(sk.cards),
                               np.asarray(sk_ref.cards), rtol=1e-5)
    # the memory-sharding claim: every per-device shard holds 1/8 of rows
    for arr in (sk.minhash, sk.hll):
        shard = arr.addressable_shards[0].data
        assert np.prod(shard.shape) == np.prod(arr.shape) // 8, \
            f"state not sharded: shard {shard.shape} of {arr.shape}"


@pytest.mark.parametrize("method", ["contiguous", "locality"])
def test_node_sharded_features_match_single_device(setup, method):
    from subgraph_sketching_tpu.parallel import (
        make_node_partition, node_sharded_build_hash_tables,
        node_sharded_subgraph_features,
    )
    g, params, sk_ref, links = setup
    n = g.num_nodes
    mesh = make_mesh([8], ("graph",))
    plan = make_node_partition(np.asarray(g.edge_index), n, 8, method=method)
    mh0, hll0 = plan.pad_init(*initialise_sketches(n, params))
    sk = node_sharded_build_hash_tables(plan, params, mesh, mh0, hll0)
    sf_ref = np.asarray(subgraph_features(jnp.asarray(links), sk_ref, params))
    sf = np.asarray(node_sharded_subgraph_features(links, sk, params, mesh,
                                                   perm=plan.perm))
    np.testing.assert_allclose(sf, sf_ref, rtol=1e-6, atol=1e-4)
    # the hops-only stack format (hop 0 dropped, the citation2-scale HBM
    # saver accepted by sketch/elph._pairwise_intersections) must work here
    # too — regression: the slice start was hardcoded for full stacks
    from subgraph_sketching_tpu.sketch.params import Sketches
    sk_drop = Sketches(minhash=sk.minhash[1:], hll=sk.hll[1:],
                       cards=sk.cards)
    sf_drop = np.asarray(
        node_sharded_subgraph_features(links, sk_drop, params, mesh,
                                       perm=plan.perm))
    np.testing.assert_allclose(sf_drop, sf_ref, rtol=1e-6, atol=1e-4)


def test_locality_partition_shrinks_halo():
    """On a locality-structured graph (WS ring + a few rewires) the RCM
    partitioner must cut the padded halo volume vs id-order blocks by >= 2x
    (VERDICT r2 done-bar) — here node ids are SHUFFLED first so id-order
    blocks carry no accidental locality."""
    from subgraph_sketching_tpu.graph.synthetic import watts_strogatz_graph
    from subgraph_sketching_tpu.parallel import make_node_partition
    n = 512
    ei = watts_strogatz_graph(n, 8, 0.05, seed=3)
    # shuffle node ids: id order must carry no locality information
    rng = np.random.default_rng(0)
    relabel = rng.permutation(n).astype(np.int32)
    ei = relabel[ei]
    cont = make_node_partition(ei, n, 8, method="contiguous")
    loc = make_node_partition(ei, n, 8, method="locality")
    assert loc.halo_rows_per_dev * 2 <= cont.halo_rows_per_dev, (
        f"locality halo {loc.halo_rows_per_dev} not >=2x below "
        f"contiguous {cont.halo_rows_per_dev}")
    # both plans reconstruct identical sketch tables (exercised above);
    # here assert the plans cover every edge exactly once
    for plan in (cont, loc):
        assert int(plan.local_mask.sum() + plan.halo_mask.sum()) == \
            ei.shape[1]


def test_distributed_train_step_matches_single_device(setup):
    """Full ELPH model (GCN + predictor) trained on the 3-axis mesh: the
    composed dp x graph x lane program must produce the SAME losses and
    parameters as the single-device step — not merely finite ones."""
    from subgraph_sketching_tpu.parallel.train import (
        make_distributed_train_step, single_device_reference_step,
    )
    g, params, sk_ref, links = setup
    mesh = make_mesh([2, 2, 2], ("data", "graph", "lane"))
    kw = dict(hidden_channels=16, num_nodes=64, label_dropout=0.0,
              feature_dropout=0.0)
    init_fn, step_fn, _, build_sk = make_distributed_train_step(mesh, params,
                                                                **kw)
    ref_init, ref_step, _, ref_build = single_device_reference_step(params,
                                                                    **kw)
    ei, w, mask = g.padded_edges(multiple=8)
    mh0, hll0 = initialise_sketches(64, params)
    x = jnp.asarray(np.random.default_rng(0).random((64, 16), dtype=np.float32))
    labels = jnp.asarray((np.arange(32) % 2).astype(np.float32))
    # sketches are built ONCE per graph (step-constant, gradient-free)
    sk = build_sk(jnp.asarray(ei), jnp.asarray(mask), jnp.asarray(mh0),
                  jnp.asarray(hll0))
    sk_1dev = ref_build(jnp.asarray(ei), jnp.asarray(mask),
                        jnp.asarray(mh0), jnp.asarray(hll0))
    np.testing.assert_array_equal(np.asarray(sk.minhash),
                                  np.asarray(sk_1dev.minhash))
    args = (x, jnp.asarray(ei), jnp.asarray(mask), sk,
            jnp.asarray(links), labels)
    ref_args = (x, jnp.asarray(ei), jnp.asarray(mask), sk_1dev,
                jnp.asarray(links), labels)
    state = init_fn(jax.random.PRNGKey(0), x, jnp.asarray(ei),
                    jnp.asarray(mask), jnp.asarray(links))
    ref_state = ref_init(jax.random.PRNGKey(0), x, jnp.asarray(ei),
                         jnp.asarray(mask), jnp.asarray(links))
    for i in range(2):
        rng = jax.random.PRNGKey(100 + i)
        state, loss = step_fn(state, *args, rng)
        ref_state, ref_loss = ref_step(ref_state, *ref_args, rng)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    # biases feeding directly into BatchNorm have mathematically ZERO
    # gradient (BN subtracts the batch mean), so Adam amplifies f32
    # reduction-order noise there to ~lr scale; every other leaf must match
    import jax.tree_util as jtu
    degenerate = ("label_lin_layer']['bias", "lin_out']['bias")
    for (kp, a), (_, b) in zip(
            jtu.tree_flatten_with_path(state.params)[0],
            jtu.tree_flatten_with_path(ref_state.params)[0]):
        if any(d in jtu.keystr(kp) for d in degenerate):
            continue
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5, err_msg=jtu.keystr(kp))


def test_memory_sharded_elph_training(setup):
    """node_partition mode: ELPH trains with the sketch tables SHARDED 1/D
    per device (node-partitioned build + psum-assembled per-batch features)
    and still produces the single-device losses."""
    from subgraph_sketching_tpu.parallel import make_node_partition
    from subgraph_sketching_tpu.parallel.train import (
        make_distributed_train_step, single_device_reference_step,
    )
    g, params, sk_ref, links = setup
    mesh = make_mesh([2, 4], ("data", "graph"))
    part = make_node_partition(np.asarray(g.edge_index), 64, 4)
    kw = dict(hidden_channels=16, num_nodes=64, label_dropout=0.0,
              feature_dropout=0.0)
    init_fn, step_fn, _, build_sk = make_distributed_train_step(
        mesh, params, node_partition=part, **kw)
    ref_init, ref_step, _, ref_build = single_device_reference_step(params,
                                                                    **kw)
    ei, w, mask = g.padded_edges(multiple=8)
    mh0, hll0 = initialise_sketches(64, params)
    x = jnp.asarray(np.random.default_rng(0).random((64, 16),
                                                    dtype=np.float32))
    labels = jnp.asarray((np.arange(32) % 2).astype(np.float32))
    sk = build_sk(jnp.asarray(ei), jnp.asarray(mask), mh0, hll0)
    # the memory-sharding claim: per-device shard is 1/4 of each table
    for arr in (sk.minhash, sk.hll):
        shard = arr.addressable_shards[0].data
        assert np.prod(shard.shape) == np.prod(arr.shape) // 4, \
            f"sketch state not sharded: {shard.shape} of {arr.shape}"
    sk_1dev = ref_build(jnp.asarray(ei), jnp.asarray(mask),
                        jnp.asarray(mh0), jnp.asarray(hll0))
    state = init_fn(jax.random.PRNGKey(0), x, jnp.asarray(ei),
                    jnp.asarray(mask), jnp.asarray(links))
    ref_state = ref_init(jax.random.PRNGKey(0), x, jnp.asarray(ei),
                         jnp.asarray(mask), jnp.asarray(links))
    args = (x, jnp.asarray(ei), jnp.asarray(mask), sk,
            jnp.asarray(links), labels)
    ref_args = (x, jnp.asarray(ei), jnp.asarray(mask), sk_1dev,
                jnp.asarray(links), labels)
    for i in range(2):
        rng = jax.random.PRNGKey(100 + i)
        state, loss = step_fn(state, *args, rng)
        ref_state, ref_loss = ref_step(ref_state, *ref_args, rng)
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


def test_dp_batch_sharded_buddy_epoch(setup):
    """Data-parallel BUDDY: epoch scan with the permutation sharded on the
    batch axis must match the metric envelope of single-device training."""
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.splits import random_link_split
    from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
    from subgraph_sketching_tpu.train.loops import BuddyTrainer
    g, params, sk_ref, links = setup
    g2 = Graph(g.edge_index, g.num_nodes,
               x=np.random.default_rng(1).random((64, 8), dtype=np.float32))
    cfg = Config(dataset_name="synth-ba", model="BUDDY", hidden_channels=8,
                 batch_size=64, eval_batch_size=64, K=10)
    splits = random_link_split(g2, 0.1, 0.2, seed=0)
    ds = build_link_dataset(splits["train"], cfg, "train")
    trainer = BuddyTrainer(cfg, ds, 8)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, loss = trainer.train_epoch(state, np.random.default_rng(0),
                                      jax.random.PRNGKey(0))
    assert np.isfinite(loss)


def test_elph_trainer_three_axis_mesh(setup):
    """ElphTrainer with mesh_shape=[2,2,2] (data x graph x lane): the
    edge-sharded sketch build, lane-sharded features, and GSPMD-partitioned
    GCN must reproduce the single-device loss trajectory."""
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.splits import random_link_split
    from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
    from subgraph_sketching_tpu.train.loops import ElphTrainer
    g, params, sk_ref, links = setup
    g2 = Graph(g.edge_index, g.num_nodes,
               x=np.random.default_rng(1).random((64, 8), dtype=np.float32))
    losses = {}
    # [8] data-only: DP epoch with the staged PlanSpmm engaged and its
    # tables replicated on the mesh; [2,2,2]: graph axis disables the plan
    # (edge-sharded build), so the comparison also cross-validates the
    # plan vs scatter SpMM paths under GSPMD
    for mesh_shape, axes in ((None, ["data"]),
                             ([8], ["data"]),
                             ([2, 2, 2], ["data", "graph", "lane"])):
        cfg = Config(dataset_name="synth-ba", model="ELPH", hidden_channels=8,
                     batch_size=64, eval_batch_size=64, K=10,
                     label_dropout=0.0, feature_dropout=0.0,
                     mesh_shape=mesh_shape, mesh_axes=axes)
        splits = random_link_split(g2, 0.1, 0.2, seed=0)
        ds = build_link_dataset(splits["train"], cfg, "train")
        trainer = ElphTrainer(cfg, ds, params, 8)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, loss = trainer.train_epoch(state, np.random.default_rng(0),
                                          jax.random.PRNGKey(0))
        state, loss2 = trainer.train_epoch(state, np.random.default_rng(1),
                                           jax.random.PRNGKey(1))
        losses[str(mesh_shape)] = (loss, loss2)
    for key in ("[8]", "[2, 2, 2]"):
        for a, b in zip(losses["None"], losses[key]):
            assert np.isfinite(b)
            assert abs(a - b) < 1e-4, losses


def test_elph_trainer_memory_sharded_cli_path(setup):
    """--memory_sharded through the PRODUCTION ElphTrainer: the sketch
    tables stay node-partitioned (1/D rows per device) through training,
    per-batch features are psum-assembled inside the epoch scan, and the
    loss trajectory + eval predictions equal the single-device run's."""
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.splits import random_link_split
    from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
    from subgraph_sketching_tpu.train.loops import ElphTrainer
    g, params, sk_ref, links = setup
    g2 = Graph(g.edge_index, g.num_nodes,
               x=np.random.default_rng(1).random((64, 8), dtype=np.float32))
    runs = {}
    for mesh_shape, axes, ms in ((None, ["data"], False),
                                 ([2, 4], ["data", "graph"], True)):
        cfg = Config(dataset_name="synth-ba", model="ELPH", hidden_channels=8,
                     batch_size=64, eval_batch_size=64, K=10,
                     label_dropout=0.0, feature_dropout=0.0,
                     mesh_shape=mesh_shape, mesh_axes=axes,
                     memory_sharded=ms)
        splits = random_link_split(g2, 0.1, 0.2, seed=0)
        ds = build_link_dataset(splits["train"], cfg, "train")
        trainer = ElphTrainer(cfg, ds, params, 8)
        if ms:
            # the memory-sharding claim: 1/D of the table rows per device
            arr = trainer._data["train"]["sk_minhash"]
            shard = arr.addressable_shards[0].data
            assert np.prod(shard.shape) == np.prod(arr.shape) // 4, \
                f"sketch state not sharded: {shard.shape} of {arr.shape}"
            # eval splits sharing the train graph reuse its tables
            trainer.stage("valid", build_link_dataset(
                splits["valid"], cfg, "valid", reuse_from=ds))
            assert (trainer._data["valid"]["sk_minhash"]
                    is trainer._data["train"]["sk_minhash"])
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, l1 = trainer.train_epoch(state, np.random.default_rng(0),
                                        jax.random.PRNGKey(0))
        state, l2 = trainer.train_epoch(state, np.random.default_rng(1),
                                        jax.random.PRNGKey(1))
        pred, labels = trainer.predict(state, "train")
        runs[ms] = (l1, l2, np.asarray(pred))
    assert np.isfinite(runs[True][0]) and np.isfinite(runs[True][1])
    assert abs(runs[True][0] - runs[False][0]) < 1e-4
    assert abs(runs[True][1] - runs[False][1]) < 1e-4
    # logits after TWO epochs of Adam: f32 reduction-order noise (psum
    # feature assembly + GSPMD SpMM) is amplified ~lr-scale into the
    # parameters, so per-logit tolerance is looser than the loss check
    np.testing.assert_allclose(runs[True][2], runs[False][2],
                               rtol=1e-3, atol=2e-3)


def test_memory_sharded_runner_end_to_end(setup, tmp_path):
    """The full production CLI with --memory_sharded --mesh_shape 2,4:
    main() parses the flags, trains, and evaluates."""
    from subgraph_sketching_tpu.runners.run import main
    results = main(["--dataset_name", "synth-ba", "--model", "ELPH",
                    "--hidden_channels", "8", "--batch_size", "64",
                    "--eval_batch_size", "64", "--K", "10",
                    "--epochs", "2", "--mesh_shape", "2,4",
                    "--mesh_axes", "data,graph", "--memory_sharded", "1"])
    assert len(results) == 1
    assert all(np.isfinite(v) for v in results[0])


def test_memory_sharded_config_validation():
    from subgraph_sketching_tpu.config import Config
    with pytest.raises(ValueError):
        Config(memory_sharded=True)  # no graph mesh axis
    with pytest.raises(ValueError):
        Config(memory_sharded=True, mesh_axes=["data", "graph"])  # no shape


def test_buddy_preprocessing_memory_sharded(setup):
    """BUDDY preprocessing with a graph mesh axis: node-sharded sketch build
    + psum-assembled features must reproduce the single-device subgraph
    features (the citation2-scale memory plan)."""
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.splits import random_link_split
    from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
    g, params, sk_ref, links = setup
    g2 = Graph(g.edge_index, g.num_nodes,
               x=np.random.default_rng(1).random((64, 8), dtype=np.float32))
    splits = random_link_split(g2, 0.1, 0.2, seed=0)
    sfs = {}
    for mesh_shape, axes in ((None, ["data"]), ([8], ["graph"])):
        cfg = Config(dataset_name="synth-ba", model="BUDDY",
                     mesh_shape=mesh_shape, mesh_axes=axes)
        ds = build_link_dataset(splits["train"], cfg, "train")
        sfs[str(mesh_shape)] = ds.subgraph_features
    np.testing.assert_allclose(sfs["[8]"], sfs["None"], rtol=1e-6, atol=1e-4)


def test_buddy_trainer_data_parallel_mesh(setup):
    """BuddyTrainer with mesh_shape=[8]: DP epoch must match the
    single-device epoch's loss trajectory (same data, same rng)."""
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.splits import random_link_split
    from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
    from subgraph_sketching_tpu.train.loops import BuddyTrainer
    g, params, sk_ref, links = setup
    g2 = Graph(g.edge_index, g.num_nodes,
               x=np.random.default_rng(1).random((64, 8), dtype=np.float32))
    losses = {}
    for mesh_shape in (None, [8]):
        cfg = Config(dataset_name="synth-ba", model="BUDDY",
                     hidden_channels=8, batch_size=64, eval_batch_size=64,
                     K=10, mesh_shape=mesh_shape)
        splits = random_link_split(g2, 0.1, 0.2, seed=0)
        ds = build_link_dataset(splits["train"], cfg, "train")
        trainer = BuddyTrainer(cfg, ds, 8)
        state = trainer.init_state(jax.random.PRNGKey(0))
        state, loss = trainer.train_epoch(state, np.random.default_rng(0),
                                          jax.random.PRNGKey(0))
        losses[str(mesh_shape)] = loss
    assert np.isfinite(losses["[8]"])
    assert abs(losses["None"] - losses["[8]"]) < 1e-3


def test_meshed_trainer_is_bitwise_deterministic(setup):
    """The determinism checker over a DATA-PARALLEL meshed BuddyTrainer:
    cross-replica reductions (grad psum, BN stats) must be bit-stable
    across reruns — the distributed analogue of race detection."""
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.splits import random_link_split
    from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
    from subgraph_sketching_tpu.train.determinism import (
        check_epoch_determinism,
    )
    from subgraph_sketching_tpu.train.loops import BuddyTrainer
    g, params, sk_ref, links = setup
    g2 = Graph(g.edge_index, g.num_nodes,
               x=np.random.default_rng(1).random((64, 8), dtype=np.float32))
    cfg = Config(dataset_name="synth-ba", model="BUDDY", hidden_channels=8,
                 batch_size=64, eval_batch_size=64, K=10,
                 mesh_shape=[8], mesh_axes=["data"])
    splits = random_link_split(g2, 0.1, 0.2, seed=0)
    ds = build_link_dataset(splits["train"], cfg, "train")
    trainer = BuddyTrainer(cfg, ds, 8)
    state = trainer.init_state(jax.random.PRNGKey(0))
    n, loss = check_epoch_determinism(trainer, state, jax.random.PRNGKey(5))
    assert n > 0 and np.isfinite(loss)


def test_bench_artifact_rate_self_loads():
    """The scaling model's calibration constant must come from the newest
    committed BENCH artifact (round-4 advisor: a hand-synced constant
    survived an artifact refresh), with the documented fallback when no
    artifact parses."""
    import glob
    import json
    import os

    from subgraph_sketching_tpu.parallel.scaling import bench_artifact_rate

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    assert paths, "committed BENCH artifacts expected at the repo root"
    with open(paths[-1]) as f:
        d = json.load(f)
    parsed = d.get("parsed") or json.loads(d["tail"].strip())
    assert bench_artifact_rate() == float(parsed["value"])
    # the model resolves its default through the loader
    from subgraph_sketching_tpu.parallel.scaling import ici_scaling_model
    m = ici_scaling_model(num_nodes=2_000, avg_deg=4,
                          device_counts=[1, 2])
    assert m["assumptions"]["per_chip_edges_per_s"] == bench_artifact_rate()


def test_ici_scaling_model_structure():
    """The analytic ICI scaling model (BASELINE criterion 4 on 1-chip
    hardware): efficiency is 1 at the base point, bounded by (0, 1], and
    a zero-locality random graph is never easier than a locality-ordered
    ring graph of the same size (its halo volume dominates)."""
    from subgraph_sketching_tpu.parallel.scaling import ici_scaling_model
    rnd = ici_scaling_model(num_nodes=20_000, device_counts=[1, 2, 4, 8])
    ring = ici_scaling_model(num_nodes=20_000, device_counts=[1, 2, 4, 8],
                             graph="ring")
    for out in (rnd, ring):
        effs = {int(d): r["efficiency"]
                for d, r in out["per_device_count"].items()}
        assert effs[1] == 1.0
        assert all(0.0 < e <= 1.0 for e in effs.values())
    for d in ("2", "4", "8"):
        assert (ring["per_device_count"][d]["efficiency"]
                >= rnd["per_device_count"][d]["efficiency"])
        assert (ring["per_device_count"][d]["halo_rows_per_dev"]
                <= rnd["per_device_count"][d]["halo_rows_per_dev"])
    # weak scaling: per-device work constant, efficiency still in (0, 1]
    weak = ici_scaling_model(num_nodes=10_000, weak=True,
                             device_counts=[1, 2, 4])
    assert weak["mode"] == "weak"
    assert all(0.0 < r["efficiency"] <= 1.0
               for r in weak["per_device_count"].values())


def test_ici_scaling_model_narrow_config_baseline_not_penalised():
    """Regression: lane_speed must normalise by the PADDED L=1 row bytes.
    For sketch widths below one 128-lane tile (num_perm=64), the un-padded
    numerator modelled the MEASURED L=1 baseline itself at 0.67x speed,
    skewing every row of the model."""
    from subgraph_sketching_tpu.parallel.scaling import (
        ici_scaling_model, lane_row_bytes,
    )
    from subgraph_sketching_tpu.sketch.params import SketchParams

    narrow = SketchParams(max_hops=2, num_perm=64, hll_p=8)
    assert lane_row_bytes(narrow, 1) == 768          # padded above 512
    m_narrow = ici_scaling_model(num_nodes=20_000, device_counts=[1, 8],
                                 params=narrow)
    m_default = ici_scaling_model(num_nodes=20_000, device_counts=[1, 8])
    # same graph, same partition, same L=1 layout cost model -> identical
    # efficiencies; before the fix the narrow config differed
    assert (m_narrow["per_device_count"]["8"]["efficiency"]
            == m_default["per_device_count"]["8"]["efficiency"])
    # and lane sharding a narrow config can never be modelled FASTER than
    # its own L=1 baseline per-byte (padding floors the cut at 1 tile)
    assert lane_row_bytes(narrow, 2) >= 768 - 128


def test_node_sharded_three_hop(setup):
    """K=3 (the Pubmed reproduction config) through the memory-sharded
    build + psum feature assembly: bit-exact tables, feature equality."""
    from subgraph_sketching_tpu.parallel import (
        make_node_partition, node_sharded_build_hash_tables,
        node_sharded_subgraph_features,
    )
    g, _, _, links = setup
    n = g.num_nodes
    params3 = SketchParams(max_hops=3)
    sk_ref = build_hash_tables(jnp.asarray(g.edge_index), n, params3)
    mesh = make_mesh([8], ("graph",))
    plan = make_node_partition(np.asarray(g.edge_index), n, 8)
    mh0, hll0 = plan.pad_init(*initialise_sketches(n, params3))
    sk = node_sharded_build_hash_tables(plan, params3, mesh, mh0, hll0)
    np.testing.assert_array_equal(plan.to_node_order(sk.minhash),
                                  np.asarray(sk_ref.minhash))
    sf_ref = np.asarray(subgraph_features(jnp.asarray(links), sk_ref,
                                          params3))
    sf = np.asarray(node_sharded_subgraph_features(links, sk, params3, mesh,
                                                   perm=plan.perm))
    np.testing.assert_allclose(sf, sf_ref, rtol=1e-6, atol=1e-4)


def test_node_sharded_chunked_gathers_bit_exact(setup):
    """max_gather_rows chunk-streams the per-device edge gathers inside
    the sharded hop (lax.scan accumulation) — must be BIT-exact with the
    one-shot build (min/max are associative)."""
    from subgraph_sketching_tpu.parallel import (
        make_node_partition, node_sharded_build_hash_tables,
    )
    g, params, sk_ref, links = setup
    n = g.num_nodes
    mesh = make_mesh([8], ("graph",))
    plan = make_node_partition(np.asarray(g.edge_index), n, 8)
    mh0, hll0 = plan.pad_init(*initialise_sketches(n, params))
    one = node_sharded_build_hash_tables(plan, params, mesh, mh0, hll0)
    # tiny budget forces several scan chunks (E_loc is ~64 per device)
    chunked = node_sharded_build_hash_tables(plan, params, mesh, mh0, hll0,
                                             max_gather_rows=16)
    np.testing.assert_array_equal(np.asarray(chunked.minhash),
                                  np.asarray(one.minhash))
    np.testing.assert_array_equal(np.asarray(chunked.hll),
                                  np.asarray(one.hll))
    np.testing.assert_allclose(np.asarray(chunked.cards),
                               np.asarray(one.cards), rtol=1e-6)


def test_node_lane_2d_sharded_matches_single_device(setup):
    """2D graph x lane memory sharding: node-partitioned halo build with
    the sketch WIDTH additionally sharded on a second mesh axis.  Tables
    must stay bit-exact (lanes are elementwise in the min/max hop), cards
    and features match to f32 reduction order (lane-partial register
    stats psum into the shared hll_count_from_stats core), and each
    device holds exactly 1/(G*L) of every table."""
    from subgraph_sketching_tpu.parallel import (
        make_node_partition, node_sharded_build_hash_tables,
        node_sharded_subgraph_features,
    )
    g, params, sk_ref, links = setup
    n = g.num_nodes
    mesh = make_mesh([4, 2], ("graph", "lane"))
    plan = make_node_partition(np.asarray(g.edge_index), n, 4)
    mh0, hll0 = plan.pad_init(*initialise_sketches(n, params))
    sk = node_sharded_build_hash_tables(plan, params, mesh, mh0, hll0,
                                        lane_axis="lane")
    np.testing.assert_array_equal(plan.to_node_order(sk.minhash),
                                  np.asarray(sk_ref.minhash))
    np.testing.assert_array_equal(plan.to_node_order(sk.hll),
                                  np.asarray(sk_ref.hll))
    np.testing.assert_allclose(plan.to_node_order(sk.cards),
                               np.asarray(sk_ref.cards), rtol=1e-5)
    for arr in (sk.minhash, sk.hll):
        shard = arr.addressable_shards[0].data
        assert np.prod(shard.shape) == np.prod(arr.shape) // 8, \
            f"state not 2D-sharded: shard {shard.shape} of {arr.shape}"
    sf_ref = np.asarray(subgraph_features(jnp.asarray(links), sk_ref,
                                          params))
    sf = np.asarray(node_sharded_subgraph_features(
        links, sk, params, mesh, perm=plan.perm, lane_axis="lane"))
    np.testing.assert_allclose(sf, sf_ref, rtol=1e-6, atol=1e-4)
    # hops-only stacks (hop 0 dropped) must work through the lane path too
    from subgraph_sketching_tpu.sketch.params import Sketches
    sk_drop = Sketches(minhash=sk.minhash[1:], hll=sk.hll[1:],
                       cards=sk.cards)
    sf_drop = np.asarray(node_sharded_subgraph_features(
        links, sk_drop, params, mesh, perm=plan.perm, lane_axis="lane"))
    np.testing.assert_allclose(sf_drop, sf_ref, rtol=1e-6, atol=1e-4)


def test_memory_sharded_production_scale_equality(capsys):
    """PRODUCTION-scale multichip equality (round-4 item 4): ELPH
    --memory_sharded at synth-ws-100000 (100k nodes / 1M directed edges)
    through the production runner, vs the single-device run — per-epoch
    losses equal to 1e-4 and returned metrics close.  The committed 500k
    artifact (tools/scale_equality.py -> SCALING_r04) extends this to
    citation2-class scale; this test keeps the >=100k path green every
    round.  Slow (~minutes on the CPU mesh)."""
    from subgraph_sketching_tpu.runners.run import main
    import re

    losses = {}
    results = {}
    for name, extra in (("sharded", ["--mesh_shape", "1,8", "--mesh_axes",
                                     "data,graph", "--memory_sharded", "1"]),
                        ("single", [])):
        res = main(["--dataset_name", "synth-ws-100000", "--model", "ELPH",
                    "--hidden_channels", "16", "--batch_size", "4096",
                    "--eval_batch_size", "65536", "--K", "50",
                    "--epochs", "1", "--train_samples", "16384",
                    "--label_dropout", "0", "--feature_dropout", "0"]
                   + extra)
        out = capsys.readouterr().out
        losses[name] = [float(m) for m in re.findall(r"Loss: ([0-9.]+)", out)]
        results[name] = np.asarray(res[0])
    assert losses["sharded"] and len(losses["sharded"]) == len(losses["single"])
    for a, b in zip(losses["sharded"], losses["single"]):
        assert abs(a - b) < 1e-4, (losses["sharded"], losses["single"])
    # metrics: rank-based Hits can flip near the threshold under f32
    # reduction-order noise; 1% absolute is the established envelope
    np.testing.assert_allclose(results["sharded"], results["single"],
                               atol=0.01)
