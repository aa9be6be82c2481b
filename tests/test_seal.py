"""SEAL tier tests: labelling tricks, subgraph extraction, models.

Follows the reference test patterns (test_labelling_tricks.py,
test_seal_datasets.py): tiny hand-built graphs with known answers + shape
smoke tests.
"""

import numpy as np
import scipy.sparse as ssp
import jax
import jax.numpy as jnp
import pytest

from subgraph_sketching_tpu.graph import Graph
from subgraph_sketching_tpu.graph.seal import SEALDataset, k_hop_subgraph
from subgraph_sketching_tpu.labelling import (
    drnl_hash_function, drnl_node_labeling, de_node_labeling, get_drnl_lookup,
)


def two_squares_bridge():
    """Two squares joined by a bridge (reference
    test_labelling_tricks.py:14-40): 0-1-2-3-0 square, 4-5-6-7-4 square,
    bridge 0-4."""
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
             (0, 4)]
    ei = np.array(edges + [(b, a) for a, b in edges]).T.astype(np.int32)
    A = ssp.csr_matrix((np.ones(ei.shape[1]), (ei[0], ei[1])), shape=(8, 8))
    return ei, A


def test_drnl_hash_exact_values():
    # (reference test_labelling_tricks.py:75-90 pattern: known label values)
    d2src = np.array([0, 1, 1, 2])
    d2dst = np.array([1, 0, 1, 1])
    z = drnl_hash_function(d2src, d2dst)
    # src/dst themselves -> 1; (1,1) -> 2; (2,1) -> 1+1+(1)(1+1-1)=3
    np.testing.assert_array_equal(z, [1, 1, 2, 3])


def test_drnl_node_labeling_on_squares():
    ei, A = two_squares_bridge()
    z = drnl_node_labeling(A, 0, 1)
    assert z[0] == 1 and z[1] == 1
    assert z.shape == (8,)
    assert (np.asarray(z) >= 1).all()


def test_de_labeling_shape():
    ei, A = two_squares_bridge()
    z = de_node_labeling(A, 0, 1, max_dist=3)
    assert z.shape == (8, 2)
    assert z[0, 0] == 0 and z[1, 1] == 0


def test_drnl_lookup_dense():
    z_to_idx, idx_to_dst = get_drnl_lookup(max_dist=4, num_hops=2)
    assert idx_to_dst[0] == (1, 0)
    assert len(z_to_idx) == len(idx_to_dst)


def test_k_hop_subgraph_removes_target_edge():
    ei, A = two_squares_bridge()
    nodes, sub, dists, x, y = k_hop_subgraph(0, 1, 1, A)
    assert nodes[0] == 0 and nodes[1] == 1
    assert sub[0, 1] == 0 and sub[1, 0] == 0  # target edge removed
    # 1-hop around (0,1): 0,1 + neighbours {1,3,4,2}
    assert set(nodes) == {0, 1, 2, 3, 4}
    assert dists[:2] == [0, 0]


def test_seal_dataset_batches():
    ei, A = two_squares_bridge()
    g = Graph(ei, 8, x=np.eye(8, dtype=np.float32))
    pos = np.array([[0, 1], [4, 5]])
    neg = np.array([[1, 5], [2, 6]])
    ds = SEALDataset(g, pos, neg, num_hops=1, max_nodes=8, max_edges=32)
    assert len(ds) == 4
    batch = ds.batch(np.arange(4))
    assert batch.z.shape == (4, 8)
    assert batch.y.tolist() == [1, 1, 0, 0]
    assert batch.node_mask.sum() > 0
    # static extraction matches dynamic
    ds_static = SEALDataset(g, pos, neg, num_hops=1, max_nodes=8,
                            max_edges=32, dynamic=False)
    b2 = ds_static.batch(np.arange(4))
    np.testing.assert_array_equal(batch.z, b2.z)


def test_python_labels_computed_on_truncated_subgraph():
    """Regression: the python path labelled the FULL subgraph then sliced
    to max_nodes, so z for kept nodes reflected paths through dropped
    nodes — inconsistent with the edge set the model sees, and divergent
    from the native extractor (which stops discovery at the cap).  Labels
    must be computed on the truncated subgraph."""
    from subgraph_sketching_tpu.graph.seal import label_nodes

    # target edge (0,1); a short src-dst path through node 2; a longer
    # path through high-id nodes 8, 9 (sorted fringe order puts them last,
    # so max_nodes=4 keeps [0, 1, 2, 8] and drops 9)
    edges = np.array([[0, 1], [0, 2], [2, 1], [0, 9], [9, 8], [8, 1]])
    ei = np.concatenate([edges, edges[:, ::-1]]).T
    g = Graph(np.ascontiguousarray(ei), 10)
    ds = SEALDataset(g, np.array([[0, 1]]), np.zeros((0, 2), np.int64),
                     num_hops=2, max_nodes=4, max_edges=32,
                     use_feature=False)
    nodes, z, (u, v, w), x, y, sd, dd = ds.extract_one(0)
    assert list(nodes) == [0, 1, 2, 8]
    # independent recompute on the truncated adjacency (target edge out)
    A = g.csr()
    adj = A[nodes, :][:, nodes].tolil()
    adj[0, 1] = adj[1, 0] = 0
    want = label_nodes(adj.tocsr(), [0, 0, 1, 1], "drnl", 1000)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(want))
    # the BATCH path (the production call site) must agree — this pins the
    # max_nodes plumbing in _extract_batch_python, not just extract_one
    batch = ds._extract_batch_python(np.array([0]))
    np.testing.assert_array_equal(batch.z[0], np.asarray(want, np.int32))
    # and the old behaviour (full-label-then-slice) is genuinely different
    # here: dropping node 9 leaves node 8 with the masked dst as its only
    # kept neighbour, so under DRNL's dst-masking its distance to src
    # becomes UNREACHABLE (capped at max_dist), not the 2 it had via 9
    full_nodes, full_adj, full_dists, _, _ = k_hop_subgraph(0, 1, 2, A)
    old = label_nodes(full_adj, full_dists, "drnl", 1000)[:4]
    assert not np.array_equal(np.asarray(z), np.asarray(old))


def test_native_rejects_out_of_range_links():
    """The C++ extractor indexes per-node arrays with no bounds check; the
    wrapper must refuse out-of-range link ids loudly instead of letting
    them corrupt the heap."""
    from subgraph_sketching_tpu.graph.native import (
        have_native, seal_extract_batch_native,
    )
    if not have_native():
        pytest.skip("native library unavailable")
    ei, A = two_squares_bridge()
    bad_links = np.array([[0, 8]], dtype=np.int32)  # 8 >= num_nodes
    with pytest.raises(ValueError, match="out of range"):
        seal_extract_batch_native(A.indptr, A.indices, None, 8, bad_links,
                                  1, 8, 32, 1000, "drnl")
    with pytest.raises(ValueError, match="out of range"):
        seal_extract_batch_native(A.indptr, A.indices, None, 8,
                                  np.array([[-1, 1]], dtype=np.int32),
                                  1, 8, 32, 1000, "drnl")


@pytest.mark.parametrize("model_name", ["gcn", "sage", "gin", "dgcnn", "mlp"])
def test_seal_models_forward(model_name):
    from subgraph_sketching_tpu.models.seal import (
        SEALDGCNN, SEALGCN, SEALGIN, SEALMLP, SEALSAGE,
    )
    ei, A = two_squares_bridge()
    g = Graph(ei, 8, x=np.eye(8, dtype=np.float32))
    pos = np.array([[0, 1], [4, 5]])
    neg = np.array([[1, 5], [2, 6]])
    ds = SEALDataset(g, pos, neg, num_hops=1, max_nodes=8, max_edges=32,
                     max_dist=10)
    raw = ds.batch(np.arange(4))
    batch = {"z": jnp.asarray(raw.z), "node_mask": jnp.asarray(raw.node_mask),
             "edge_index": jnp.asarray(raw.edge_index),
             "edge_weight": jnp.asarray(raw.edge_weight),
             "edge_mask": jnp.asarray(raw.edge_mask),
             "x": jnp.asarray(raw.x)}
    if model_name == "mlp":
        model = SEALMLP(emb_dim=16)
    elif model_name == "gcn":
        model = SEALGCN(hidden_channels=16, num_layers=2, max_z=100,
                        use_feature=True)
    elif model_name == "sage":
        model = SEALSAGE(hidden_channels=16, num_layers=2, max_z=100)
    elif model_name == "gin":
        model = SEALGIN(hidden_channels=16, num_layers=2, max_z=100)
    else:
        # the reference enforces k >= 10 for DGCNN (seal.py:196)
        model = SEALDGCNN(hidden_channels=8, num_layers=2, max_z=100, k=10)
    rng = jax.random.PRNGKey(0)
    var = model.init({"params": rng, "dropout": rng}, batch, training=False)
    out = model.apply(var, batch, training=False,
                      mutable=["batch_stats"])[0] \
        if model_name == "gin" else model.apply(var, batch, training=False)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_kge_models_score_and_train():
    import optax
    from subgraph_sketching_tpu.models.transx import KGEModel
    for name, de, dr in [("transE", False, False), ("distmult", False, False),
                         ("complEx", True, True), ("rotatE", True, False)]:
        m = KGEModel(name, nentity=20, nrelation=2, hidden_dim=8, gamma=10.0,
                     double_entity_embedding=de, double_relation_embedding=dr)
        params = m.init_params(jax.random.PRNGKey(0))
        links = jnp.asarray(np.array([[0, 1], [2, 3]], dtype=np.int32))
        s = m.score_links(params, links)
        assert s.shape == (2,)
        opt = optax.adam(1e-2)
        step = m.make_train_step(opt, negative_adversarial_sampling=True)
        pos = jnp.asarray(np.array([[0, 0, 1], [2, 0, 3]], dtype=np.int32))
        negs = jnp.asarray(np.array([[4, 5], [6, 7]], dtype=np.int32))
        p2, _, loss = step(params, opt.init(params), pos, negs, False)
        assert np.isfinite(float(loss))


def test_native_extraction_matches_python():
    """C++ extractor must match the python path semantically (node sets, z
    label multisets, edge counts, labels/degrees) — ordering may differ."""
    from subgraph_sketching_tpu.graph.native import have_native
    if not have_native():
        pytest.skip("native toolchain unavailable")
    from subgraph_sketching_tpu.graph.synthetic import barabasi_albert_graph
    n = 300
    g = Graph(barabasi_albert_graph(n, 4, seed=3), n,
              x=np.random.default_rng(0).random((n, 4), dtype=np.float32))
    rng = np.random.default_rng(5)
    pos = rng.integers(0, n, (30, 2)).astype(np.int32)
    neg = rng.integers(0, n, (30, 2)).astype(np.int32)
    for num_hops, label in [(1, "drnl"), (2, "drnl"), (1, "hop"), (1, "zo"),
                            (1, "de"), (2, "de"), (1, "de+"), (2, "de+")]:
        # max_nodes/max_edges big enough that nothing truncates: under
        # truncation the two paths legitimately keep different subsets
        ds = SEALDataset(g, pos, neg, num_hops=num_hops, node_label=label,
                         max_nodes=300, max_edges=4096, max_dist=10)
        idx = np.arange(20)
        bn = ds._extract_batch_native(idx)
        bp = ds._extract_batch_python(idx)
        for i in range(20):
            assert (set(bn.node_ids[i][bn.node_mask[i]].tolist())
                    == set(bp.node_ids[i][bp.node_mask[i]].tolist()))
            # ordering may differ: compare labels keyed by global node id
            # (works for 1-label and 2-label [de/de+] schemes alike)
            zn = {int(nid): np.atleast_1d(z).tolist() for nid, z in
                  zip(bn.node_ids[i][bn.node_mask[i]],
                      bn.z[i][bn.node_mask[i]])}
            zp = {int(nid): np.atleast_1d(z).tolist() for nid, z in
                  zip(bp.node_ids[i][bp.node_mask[i]],
                      bp.z[i][bp.node_mask[i]])}
            assert zn == zp, f"hops={num_hops} label={label} link {i}"
            assert bn.edge_mask[i].sum() == bp.edge_mask[i].sum()
        np.testing.assert_allclose(bn.y, bp.y)
        np.testing.assert_allclose(bn.src_degree, bp.src_degree)


def test_seal_edge_weight_gated_by_flag():
    """The reference passes edge weights to SEAL models only under
    --use_edge_weight (train.py:127, inference.py:73); default must be
    unweighted message passing even on weighted graphs (collab)."""
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.train.seal_loop import SealTrainer

    n = 30
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n])
    ei = np.concatenate([ring, ring[::-1]], axis=1).astype(np.int32)
    g = Graph(ei, n, edge_weight=np.full(ei.shape[1], 2.0, np.float32),
              x=np.ones((n, 4), np.float32))
    pos = np.stack([np.arange(8), (np.arange(8) + 2) % n], axis=1)
    neg = np.stack([np.arange(8), (np.arange(8) + 5) % n], axis=1)
    ds = SEALDataset(g, pos, neg, num_hops=1, dynamic=True)
    for use_w, expect in ((False, 1.0), (True, 2.0)):
        cfg = Config(dataset_name="synth-ba", model="SEALGCN",
                     hidden_channels=8, batch_size=4,
                     use_edge_weight=use_w)
        tr = SealTrainer(cfg, {"train": ds}, 4)
        batch, _ = tr._to_device(ds.batch(np.arange(4)))
        w = np.asarray(batch["edge_weight"])
        m = np.asarray(batch["edge_mask"])
        assert float(w[m.astype(bool)].max()) == expect
        assert float(w[~m.astype(bool)].sum()) == 0.0


def test_native_labels_ignore_edge_output_cap():
    """Regression: labels (BFS distances / degrees) were computed on an
    adjacency truncated at max_edges; the python path labels the FULL
    subgraph before truncating the edge output, so dense subgraphs got
    different z labels per path."""
    from subgraph_sketching_tpu.graph.native import have_native
    if not have_native():
        pytest.skip("native toolchain unavailable")
    n = 24
    # complete graph: every 1-hop subgraph is dense, far beyond max_edges
    a, b = np.meshgrid(np.arange(n), np.arange(n))
    ei = np.stack([a.ravel(), b.ravel()])
    ei = ei[:, ei[0] != ei[1]].astype(np.int32)
    g = Graph(ei, n)
    pos = np.stack([np.arange(6), (np.arange(6) + 3) % n], axis=1)
    for label in ("drnl", "degree", "de"):
        ds = SEALDataset(g, pos, pos[::-1].copy(), num_hops=1,
                         node_label=label, max_nodes=n, max_edges=16,
                         use_feature=False)
        idx = np.arange(6)
        bn = ds._extract_batch_native(idx)
        bp = ds._extract_batch_python(idx)
        for i in range(6):
            zn = {int(nid): np.atleast_1d(z).tolist() for nid, z in
                  zip(bn.node_ids[i][bn.node_mask[i]],
                      bn.z[i][bn.node_mask[i]])}
            zp = {int(nid): np.atleast_1d(z).tolist() for nid, z in
                  zip(bp.node_ids[i][bp.node_mask[i]],
                      bp.z[i][bp.node_mask[i]])}
            assert zn == zp, f"label={label} link {i}"


def test_native_self_link_does_not_fake_dst():
    """Regression: for (v, v) self-links the native path treated local node
    1 (an arbitrary neighbour) as the dst endpoint — deleting a real edge
    and mislabelling that neighbour as a center."""
    from subgraph_sketching_tpu.graph.native import have_native
    if not have_native():
        pytest.skip("native toolchain unavailable")
    n = 20
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n])
    ei = np.concatenate([ring, ring[::-1]], axis=1).astype(np.int32)
    g = Graph(ei, n)
    links = np.array([[4, 4]], np.int32)  # degenerate negative sample
    ds = SEALDataset(g, links, links.copy(), num_hops=1, node_label="drnl",
                     max_nodes=16, max_edges=64, use_feature=False)
    bn = ds._extract_batch_native(np.array([0]))
    # the center keeps BOTH its ring edges (nothing spuriously removed):
    # node 4 appears as an endpoint of 4 directed edges (2 undirected)
    src = bn.edge_index[0, bn.edge_mask[0], 0]
    nodes = bn.node_ids[0]
    center_local = int(np.nonzero(nodes == 4)[0][0])
    assert center_local == 0
    assert int((src == 0).sum()) == 2
    # exactly one node is labelled as a center (z == 1)
    assert int((bn.z[0][bn.node_mask[0]] == 1).sum()) == 1
