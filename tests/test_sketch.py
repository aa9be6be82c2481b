"""Sketch-engine tests.

Follows the reference test strategy (SURVEY.md §4): sketch-vs-exact-set
oracles on small random graphs, propagation/merge consistency, batched ==
unbatched invariance, and exact-value unit tests for deterministic pieces.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from subgraph_sketching_tpu.graph.synthetic import barabasi_albert_graph
from subgraph_sketching_tpu.sketch import (
    SketchParams, build_hash_tables, subgraph_features, splitmix64,
)
from subgraph_sketching_tpu.sketch.elph import (
    propagate_hll, propagate_minhash, subgraph_features_batched,
)
from subgraph_sketching_tpu.sketch.hll import hll_count, hll_init
from subgraph_sketching_tpu.sketch.minhash import jaccard, minhash_init


# ---------------------------------------------------------------- helpers --

def exact_k_hop_sets(edge_index: np.ndarray, num_nodes: int, k: int):
    """True closed k-hop neighbourhoods by repeated set expansion."""
    adj = [set() for _ in range(num_nodes)]
    for s, d in edge_index.T:
        adj[int(s)].add(int(d))
    hoods = [{v} for v in range(num_nodes)]
    out = []
    for _ in range(k):
        nxt = []
        for v in range(num_nodes):
            s = set(hoods[v])
            for u in range(num_nodes):
                if v in adj[u]:
                    s |= hoods[u]
            nxt.append(s)
        hoods = nxt
        out.append([set(h) for h in hoods])
    return out  # out[h-1][v] = closed h-hop neighbourhood of v


# ------------------------------------------------------------------ hashing --

def test_packed_features_match_unpacked(ba_graph):
    """Hop-packed single-gather feature path == the per-hop gather path
    bit-for-bit (packing is a layout change only)."""
    from subgraph_sketching_tpu.sketch.elph import (
        pack_sketches, subgraph_features_packed,
    )
    n = 30
    params = SketchParams(max_hops=2)
    sk = build_hash_tables(jnp.asarray(ba_graph), n, params)
    links = jnp.asarray(np.stack([np.arange(16), (np.arange(16) * 5 + 2) % n],
                                 axis=1).astype(np.int32))
    ref = np.asarray(subgraph_features(links, sk, params))
    packed = pack_sketches(sk, params)
    got = np.asarray(subgraph_features_packed(links, packed, sk.cards, params))
    np.testing.assert_array_equal(got, ref)


def test_hops_only_stack_matches_full(ba_graph):
    """A K-row sketch stack (hop 0 dropped — the citation2-scale memory
    path) produces identical features to the full 0..K stack."""
    from subgraph_sketching_tpu.sketch.params import Sketches
    n = 30
    params = SketchParams(max_hops=2)
    sk = build_hash_tables(jnp.asarray(ba_graph), n, params)
    links = jnp.asarray(np.stack([np.arange(16), (np.arange(16) * 5 + 2) % n],
                                 axis=1).astype(np.int32))
    ref = np.asarray(subgraph_features(links, sk, params))
    sk_hops = Sketches(minhash=sk.minhash[1:], hll=sk.hll[1:],
                       cards=sk.cards)
    got = np.asarray(subgraph_features(links, sk_hops, params))
    np.testing.assert_array_equal(got, ref)


def test_splitmix64_matches_pandas():
    from pandas.util import hash_array
    a = np.arange(1, 1001, dtype=np.int64)
    np.testing.assert_array_equal(splitmix64(a.astype(np.uint64)),
                                  hash_array(a))


def test_minhash_init_range_and_shape():
    mh = minhash_init(50, 128)
    assert mh.shape == (50, 128)
    assert mh.dtype == np.uint32
    # rows must differ (distinct node hashes)
    assert len({tuple(r) for r in mh}) == 50


def test_hll_init_one_register_set():
    regs = hll_init(50, 8)
    assert regs.shape == (50, 256)
    assert (np.count_nonzero(regs, axis=1) == 1).all()
    assert regs.max() <= 56 and regs.min() >= 0


def test_hll_count_accuracy():
    # estimator oracle: random sets of known size, expect ~2%/sqrt relative err
    rng = np.random.default_rng(1)
    p, m = 8, 256
    for true_card in [10, 100, 300, 1000, 5000, 50000]:
        regs = np.zeros((20, m), dtype=np.int8)
        for t in range(20):
            h = rng.integers(0, 2 ** 64, size=true_card, dtype=np.uint64)
            idx = (h & np.uint64(m - 1)).astype(np.int64)
            bl = np.ceil(np.log2((h >> np.uint64(p)).astype(np.float64) + 1))
            rank = (64 - p - bl + 1).astype(np.int8)
            np.maximum.at(regs[t], idx, rank)
        est = np.asarray(hll_count(jnp.asarray(regs), p))
        rel = abs(est.mean() - true_card) / true_card
        assert rel < 0.1, f"card {true_card}: est {est.mean():.1f} rel {rel:.3f}"


def test_hll_raw_estimate_unbiased_above_threshold():
    """Above e > 5m the raw estimate passes through with NO bias
    subtraction (reference _refine_hll_count_estimate,
    test_hashing.py test_refine_hll_count_estimate) — here the estimator
    is branchless, so assert hll_count == alpha*m^2/sum(2^-reg) exactly
    for register sets whose raw estimate clears the threshold."""
    from subgraph_sketching_tpu.sketch.hll import hll_alpha

    rng = np.random.default_rng(3)
    p, m = 8, 256
    # ~50k distinct items: far above 5m = 1280, and no zero registers
    regs = np.zeros((4, m), dtype=np.int8)
    for t in range(4):
        h = rng.integers(0, 2 ** 64, size=50_000, dtype=np.uint64)
        idx = (h & np.uint64(m - 1)).astype(np.int64)
        bl = np.ceil(np.log2((h >> np.uint64(p)).astype(np.float64) + 1))
        rank = (64 - p - bl + 1).astype(np.int8)
        np.maximum.at(regs[t], idx, rank)
    assert (regs > 0).all()  # raw-estimate regime (no linear counting)
    raw = hll_alpha(m) * m * m / (2.0 ** -regs.astype(np.float64)).sum(1)
    assert (raw > 5 * m).all()
    est = np.asarray(hll_count(jnp.asarray(regs), p))
    np.testing.assert_allclose(est, raw, rtol=1e-5)


def test_jaccard_exact_overlap():
    a = jnp.arange(128, dtype=jnp.uint32)[None, :]
    b = a.at[:, :64].set(999999)
    assert float(jaccard(a, a)[0]) == 1.0
    assert float(jaccard(a, b)[0]) == 0.5


# ------------------------------------------------------------- propagation --

def test_min_max_propagation_two_node_graph():
    # exact-value check on a 2-node directed edge 0 -> 1 (cf. reference
    # test_hashing.py:355-385)
    src = jnp.array([0]); dst = jnp.array([1])
    mh = jnp.array([[5, 7], [6, 3]], dtype=jnp.uint32)
    out = propagate_minhash(mh, src, dst, 2)
    np.testing.assert_array_equal(np.asarray(out), [[5, 7], [5, 3]])
    hll = jnp.array([[5, 7], [6, 3]], dtype=jnp.int8)
    out = propagate_hll(hll, src, dst, 2)
    np.testing.assert_array_equal(np.asarray(out), [[5, 7], [6, 7]])


def test_neighbour_merge_consistency(ba_graph):
    # 2-hop sketch == merge of 1-hop sketches over closed neighbourhood
    # (reference test_hashing.py:313-329)
    n = 30
    params = SketchParams(max_hops=2)
    sk = build_hash_tables(jnp.asarray(ba_graph), n, params)
    mh1 = np.asarray(sk.minhash[1])
    hll1 = np.asarray(sk.hll[1])
    adj_in = [[] for _ in range(n)]
    for s, d in ba_graph.T:
        adj_in[int(d)].append(int(s))
    for v in range(n):
        nbrs = adj_in[v] + [v]
        np.testing.assert_array_equal(np.asarray(sk.minhash[2][v]),
                                      mh1[nbrs].min(axis=0))
        np.testing.assert_array_equal(np.asarray(sk.hll[2][v]),
                                      hll1[nbrs].max(axis=0))


# ---------------------------------------------------- sketch-vs-exact oracle --

@pytest.mark.parametrize("max_hops", [1, 2, 3])
def test_cards_match_exact_neighbourhoods(ba_graph, max_hops):
    n = 30
    params = SketchParams(max_hops=max_hops)
    sk = build_hash_tables(jnp.asarray(ba_graph), n, params)
    exact = exact_k_hop_sets(ba_graph, n, max_hops)
    cards = np.asarray(sk.cards)
    for k in range(max_hops):
        true = np.array([len(s) for s in exact[k]], dtype=np.float32)
        # hll tolerance: small graph -> linear counting regime, tight
        np.testing.assert_allclose(cards[:, k], true, atol=4.0)


@pytest.mark.parametrize("max_hops", [1, 2])
def test_subgraph_features_match_exact_counts(ba_graph, max_hops):
    """Every inclusion-exclusion feature approximates the exact disjoint
    (d_u, d_v) region count (reference test_hashing.py:101-177)."""
    from subgraph_sketching_tpu.sketch.params import LABEL_LOOKUP
    n = 30
    params = SketchParams(max_hops=max_hops, use_zero_one=True)
    sk = build_hash_tables(jnp.asarray(ba_graph), n, params)
    exact = exact_k_hop_sets(ba_graph, n, max_hops)

    links = np.array([[0, 1], [3, 7], [10, 20], [5, 29]], dtype=np.int32)
    feats = np.asarray(subgraph_features(jnp.asarray(links), sk, params))

    def exact_region(u, v, du, dv):
        # nodes at exactly hop du from u and exactly dv from v (0 = the node
        # itself excluded: region (0, k) means "within k of v but unreachable
        # in max_hops from u")
        all_nodes = set(range(n))
        hood_u = [ {u} ] + [exact[h][u] for h in range(max_hops)]
        hood_v = [ {v} ] + [exact[h][v] for h in range(max_hops)]
        def at_exact(hoods, d):
            if d == 0:
                return all_nodes - hoods[max_hops]
            return hoods[d] - hoods[d - 1]
        return len(at_exact(hood_u, du) & at_exact(hood_v, dv))

    for li, (u, v) in enumerate(links):
        for col, (du, dv) in LABEL_LOOKUP[max_hops].items():
            true = exact_region(int(u), int(v), du, dv)
            assert abs(feats[li, col] - true) <= 4.0, (
                f"link ({u},{v}) feature ({du},{dv}): "
                f"got {feats[li, col]:.2f}, exact {true}")


def test_batched_equals_unbatched(ba_graph):
    params = SketchParams(max_hops=2)
    sk = build_hash_tables(jnp.asarray(ba_graph), 30, params)
    links = np.stack([np.arange(20), (np.arange(20) + 7) % 30], axis=1).astype(np.int32)
    full = np.asarray(subgraph_features(jnp.asarray(links), sk, params))
    batched = np.asarray(subgraph_features_batched(links, sk, params, batch_size=6))
    np.testing.assert_allclose(full, batched, rtol=1e-6)


def test_feature_dim_identity():
    # len(LABEL_LOOKUP[k]) == k(k+2) (reference test_hashing.py:196-198)
    from subgraph_sketching_tpu.sketch.params import LABEL_LOOKUP
    for k in (1, 2, 3):
        assert len(LABEL_LOOKUP[k]) == k * (k + 2)
        assert SketchParams(max_hops=k).sf_dim == k * (k + 2)


def test_zero_one_knockout():
    params = SketchParams(max_hops=2, use_zero_one=False)
    g = barabasi_albert_graph(30, 5, seed=2)
    sk = build_hash_tables(jnp.asarray(g), 30, params)
    links = np.array([[0, 1], [2, 3]], dtype=np.int32)
    feats = np.asarray(subgraph_features(jnp.asarray(links), sk, params))
    assert (feats[:, [4, 5]] == 0).all()


def test_padded_edges_equal_unpadded(ba_graph):
    from subgraph_sketching_tpu.graph import Graph
    params = SketchParams(max_hops=2)
    g = Graph(ba_graph, 30)
    ei, w, mask = g.padded_edges(multiple=512)
    sk_pad = build_hash_tables(jnp.asarray(ei), 30, params,
                               mask=jnp.asarray(mask))
    sk = build_hash_tables(jnp.asarray(ba_graph), 30, params)
    np.testing.assert_array_equal(np.asarray(sk_pad.minhash), np.asarray(sk.minhash))
    np.testing.assert_array_equal(np.asarray(sk_pad.hll), np.asarray(sk.hll))


def test_hll_regenerated_table_error_bound():
    """Bound the HLL++ bias-table Monte-Carlo approximation (VERDICT r2 #5).

    The reference reads datasketch's vendored Google tables
    (hashing.py:69-81); ours are regenerated by simulation
    (tools/gen_hll_tables.py).  Two INDEPENDENT 10x-trial regenerations
    (40k trials, seeds 111/222; committed goldens) bound the induced
    subgraph-feature delta — that spread is the ceiling on our deviation
    from the infinite-trials limit datasketch's tables also estimate.
    Measured: max |delta| ~2.3 counts on cardinalities spanning [4, 1964]
    (0.15% relative), mean ~0.05; asserted here with ~2x headroom.  The
    production table (1x trials) sits within the same envelope vs the 10x
    table.  Per-entry standard errors ride in the npz (bias_se_p8).
    """
    import os
    import jax
    from subgraph_sketching_tpu.sketch import hll as hllmod

    gold = os.path.join(os.path.dirname(__file__), "goldens")
    paths = {
        "A": os.path.join(gold, "hll_p8_10x_seedA.npz"),
        "B": os.path.join(gold, "hll_p8_10x_seedB.npz"),
        "prod": hllmod._TABLES_PATH,
    }
    n = 2000
    ei = barabasi_albert_graph(n, 8, seed=2)
    params = SketchParams(max_hops=2)
    rng = np.random.default_rng(0)
    links = np.stack([rng.integers(0, n, 256),
                      rng.integers(0, n, 256)], 1).astype(np.int32)
    orig = hllmod._TABLES_PATH

    def clear():
        hllmod._load_tables.cache_clear()
        hllmod._bias_step_tables.cache_clear()
        hllmod._bias_grid_tables.cache_clear()
        jax.clear_caches()  # jitted traces bake the tables in as constants

    try:
        out = {}
        for name, path in paths.items():
            hllmod._TABLES_PATH = path
            clear()
            sk = build_hash_tables(jnp.asarray(ei), n, params)
            out[name] = np.asarray(
                subgraph_features(jnp.asarray(links), sk, params))
        # per-entry MC standard error is recorded alongside the tables
        with np.load(paths["A"]) as z:
            assert "bias_se_p8" in z and z["bias_se_p8"].max() < 1.0
    finally:
        hllmod._TABLES_PATH = orig
        clear()
    for a, b in (("A", "B"), ("prod", "A")):
        d = np.abs(out[a] - out[b])
        assert d.max() < 5.0, (a, b, d.max())
        assert d.mean() < 0.2, (a, b, d.mean())


def test_subgraph_features_batched_multi_chunk_map():
    """The multi-chunk path (one lax.map dispatch) must equal the direct
    single-program features, including the padded tail chunk."""
    from subgraph_sketching_tpu.sketch.elph import subgraph_features_batched
    n = 500
    ei = barabasi_albert_graph(n, 6, seed=4)
    params = SketchParams(max_hops=2)
    sk = build_hash_tables(jnp.asarray(ei), n, params)
    rng = np.random.default_rng(1)
    links = np.stack([rng.integers(0, n, 700),
                      rng.integers(0, n, 700)], 1).astype(np.int32)
    direct = np.asarray(subgraph_features(jnp.asarray(links), sk, params))
    # batch_size=256 -> 3 chunks with a padded tail
    chunked = np.asarray(subgraph_features_batched(links, sk, params,
                                                   batch_size=256))
    np.testing.assert_allclose(chunked, direct, rtol=1e-6, atol=1e-5)


def test_hops_only_build_same_features():
    """build_hash_tables(hops_only=True) drops hop 0 from the stacks (the
    citation2-scale HBM saver, now a production --hops_only_sketches flag);
    features must be identical to the full-stack build."""
    n = 300
    ei = barabasi_albert_graph(n, 6, seed=5)
    params = SketchParams(max_hops=2)
    full = build_hash_tables(jnp.asarray(ei), n, params)
    hops = build_hash_tables(jnp.asarray(ei), n, params, hops_only=True)
    assert hops.minhash.shape[0] == params.max_hops
    np.testing.assert_array_equal(np.asarray(hops.minhash),
                                  np.asarray(full.minhash)[1:])
    links = np.stack([np.arange(64), (np.arange(64) * 11 + 5) % n],
                     1).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(subgraph_features(jnp.asarray(links), hops, params)),
        np.asarray(subgraph_features(jnp.asarray(links), full, params)),
        rtol=1e-6, atol=1e-5)
