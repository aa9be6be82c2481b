"""Ops-layer tests: segment reductions, scan-tree plans, gcn_norm, SpMM,
heuristics."""

import numpy as np
import jax.numpy as jnp

from subgraph_sketching_tpu.graph.synthetic import barabasi_albert_graph
from subgraph_sketching_tpu.ops.graph_ops import gcn_norm, spmm, degrees_from_edges
from subgraph_sketching_tpu.ops.segment import segment_max, segment_min, segment_sum
from subgraph_sketching_tpu.ops.segment_scan import make_plan


def test_scan_plan_matches_scatter_min_max():
    rng = np.random.default_rng(0)
    for n, deg, sub_len in [(100, 5, 8), (500, 3, 32), (64, 40, 16)]:
        e = n * deg
        ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
        x = rng.integers(0, 2 ** 32 - 1, (n, 64), dtype=np.uint32)
        h = rng.integers(0, 50, (n, 32)).astype(np.int8)
        plan = make_plan(ei, n, sub_len=sub_len)
        got = np.asarray(plan.reduce(jnp.asarray(x), "min"))
        ref = np.asarray(jnp.minimum(
            jnp.asarray(x),
            segment_min(jnp.asarray(x)[ei[0]], jnp.asarray(ei[1]), n)))
        np.testing.assert_array_equal(got, ref)
        got = np.asarray(plan.reduce(jnp.asarray(h), "max"))
        ref = np.asarray(jnp.maximum(
            jnp.asarray(h),
            segment_max(jnp.asarray(h)[ei[0]], jnp.asarray(ei[1]), n)))
        np.testing.assert_array_equal(got, ref)


def test_plan_first_touched_inside_jit_not_poisoned():
    """The lazy device-table properties must not cache tracers: a plan whose
    first reduce happens inside a jit trace used to latch the traced
    constant and raise UnexpectedTracerError from every later jit."""
    import jax

    rng = np.random.default_rng(11)
    n, e = 50, 300
    ei = np.stack([rng.integers(0, n, e),
                   rng.integers(0, n, e)]).astype(np.int32)
    x = jnp.asarray(rng.integers(0, 2 ** 32 - 1, (n, 8), dtype=np.uint32))

    plan = make_plan(ei, n, sub_len=8)   # never touched outside jit
    r1 = jax.jit(lambda v: plan.reduce(v, "min"))(x)
    r2 = jax.jit(lambda v: plan.reduce(v, "min") + 0)(x)  # distinct jit
    r3 = plan.reduce(x, "min")                            # eager
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r3))
    np.testing.assert_array_equal(np.asarray(r2), np.asarray(r3))

    ck = make_plan(ei, n, sub_len=8).chunk(64)            # chunked variant
    c1 = jax.jit(lambda v: ck.reduce(v, "min"))(x)
    c2 = jax.jit(lambda v: ck.reduce(v, "min") + 0)(x)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(r3))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(r3))


def test_chunked_plan_matches_full():
    """Bounded-memory chunked execution == one-shot plan, all ops,
    including destinations whose sub-runs straddle chunk boundaries."""
    rng = np.random.default_rng(7)
    for n, deg, max_slots in [(100, 5, 64), (64, 40, 128), (200, 3, 48),
                              (50, 8, 1 << 20)]:  # last: single chunk
        e = n * deg
        ei = np.stack([rng.integers(0, n, e),
                       rng.integers(0, n, e)]).astype(np.int32)
        x = rng.integers(0, 2 ** 32 - 1, (n, 16), dtype=np.uint32)
        h = rng.integers(0, 50, (n, 8)).astype(np.int8)
        f = rng.random((n, 8)).astype(np.float32)
        w = rng.random(e).astype(np.float32)
        plan = make_plan(ei, n, sub_len=8)
        ck = plan.chunk(max_slots)
        np.testing.assert_array_equal(
            np.asarray(ck.reduce(jnp.asarray(x), "min")),
            np.asarray(plan.reduce(jnp.asarray(x), "min")))
        np.testing.assert_array_equal(
            np.asarray(ck.reduce(jnp.asarray(h), "max")),
            np.asarray(plan.reduce(jnp.asarray(h), "max")))
        got = np.asarray(ck.reduce(jnp.asarray(f), "add",
                                   edge_data_slots=ck.stage_edge_data(w)))
        ref = np.asarray(plan.reduce(jnp.asarray(f), "add",
                                     edge_data_slots=plan.stage_edge_data(w)))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_native_plan_matches_numpy():
    """The C++ counting-sort plan builder (native/plan_build.cpp) must
    produce bit-identical tables to the numpy argsort construction —
    gather_idx, sub_dst, slot_edge (SpMM staging), and the stable edge
    order — including duplicate edges, isolated nodes, and non-power-of-two
    sub_len."""
    import subgraph_sketching_tpu.ops.segment_scan as ss
    if ss._plan_lib() is None:
        import pytest
        pytest.skip("native plan builder unavailable")
    rng = np.random.default_rng(3)
    for n, e, sub_len in [(100, 700, 8), (64, 2000, 16), (333, 900, 12),
                          (50, 1, 8)]:
        ei = np.stack([rng.integers(0, n, e),
                       rng.integers(0, n // 2, e)]).astype(np.int32)
        nat = ss.SortedSegmentPlan(ei, n, sub_len=sub_len)
        saved = (ss._PLAN_LIB, ss._PLAN_TRIED)
        ss._PLAN_LIB, ss._PLAN_TRIED = None, True
        try:
            ref = ss.SortedSegmentPlan(ei, n, sub_len=sub_len)
        finally:
            ss._PLAN_LIB, ss._PLAN_TRIED = saved
        assert nat.num_subruns == ref.num_subruns
        np.testing.assert_array_equal(nat.order, ref.order)
        np.testing.assert_array_equal(nat._gather_idx_np, ref._gather_idx_np)
        np.testing.assert_array_equal(nat._sub_dst_np, ref._sub_dst_np)
        np.testing.assert_array_equal(nat._slot_edge, ref._slot_edge)


def test_auto_plan_threshold():
    from subgraph_sketching_tpu.ops.segment_scan import (
        ChunkedSegmentPlan, SortedSegmentPlan, make_auto_plan)
    rng = np.random.default_rng(0)
    n, e = 100, 500
    ei = np.stack([rng.integers(0, n, e),
                   rng.integers(0, n, e)]).astype(np.int32)
    assert isinstance(make_auto_plan(ei, n, max_slots=None),
                      SortedSegmentPlan)
    assert isinstance(make_auto_plan(ei, n, max_slots=1 << 30),
                      SortedSegmentPlan)
    assert isinstance(make_auto_plan(ei, n, max_slots=64),
                      ChunkedSegmentPlan)


def test_scan_plan_spmm_matches_dense():
    rng = np.random.default_rng(1)
    n, e = 80, 400
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.random((n, 16)).astype(np.float32)
    plan = make_plan(ei, n, sub_len=8)
    wslots = plan.stage_edge_data(w)
    got = np.asarray(plan.reduce(jnp.asarray(x), "add",
                                 edge_data_slots=wslots))
    dense = np.zeros((n, n), np.float32)
    for (s, d), wt in zip(ei.T, w):
        dense[d, s] += wt
    np.testing.assert_allclose(got, dense @ x, rtol=1e-4, atol=1e-5)


def test_plan_spmm_forward_and_gradient():
    """PlanSpmm == scatter spmm in forward AND in grad (custom VJP routes
    the backward through the transpose plan), eagerly and inside jit with
    the tables passed as arguments."""
    import jax
    from subgraph_sketching_tpu.ops.graph_ops import spmm
    from subgraph_sketching_tpu.ops.segment_scan import PlanSpmm

    rng = np.random.default_rng(0)
    n, e, d = 300, 2500, 12
    ei = np.stack([rng.integers(0, n, e),
                   rng.integers(0, n, e)]).astype(np.int32)
    nei, w, _ = gcn_norm(jnp.asarray(ei), None, n)
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    t = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    ps = PlanSpmm(np.asarray(nei), np.asarray(w), n)

    ref = spmm(nei, w, x, n)
    np.testing.assert_allclose(np.asarray(ps(x)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
    g_ref = jax.grad(lambda x: (spmm(nei, w, x, n) * t).sum())(x)
    g_new = jax.grad(lambda x: (ps(x) * t).sum())(x)
    np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)

    @jax.jit
    def gj(x, tables):
        return jax.grad(lambda x: (ps(x, tables) * t).sum())(x)

    np.testing.assert_allclose(np.asarray(gj(x, ps.tables)),
                               np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_gcn_norm_matches_manual():
    ei = jnp.asarray(np.array([[0, 1, 2], [1, 2, 0]], dtype=np.int32))
    nei, w, _ = gcn_norm(ei, None, 3)
    # with self loops: deg of every node = 2 -> every weight = 1/2
    np.testing.assert_allclose(np.asarray(w), 0.5 * np.ones(6), rtol=1e-6)


def test_spmm_matches_dense():
    rng = np.random.default_rng(0)
    n, e = 50, 300
    ei = np.stack([rng.integers(0, n, e), rng.integers(0, n, e)]).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.random((n, 8)).astype(np.float32)
    out = np.asarray(spmm(jnp.asarray(ei), jnp.asarray(w), jnp.asarray(x), n))
    dense = np.zeros((n, n), np.float32)
    for (s, d), wt in zip(ei.T, w):
        dense[d, s] += wt
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-5)


def test_heuristics_hand_computed():
    # 4-node path graph 0-1-2-3 plus edge 0-2 (undirected)
    import scipy.sparse as ssp
    from subgraph_sketching_tpu.heuristics import (
        adamic_adar, common_neighbours, resource_allocation,
    )
    edges = [(0, 1), (1, 2), (2, 3), (0, 2)]
    ei = np.array(edges + [(b, a) for a, b in edges]).T
    A = ssp.csr_matrix((np.ones(ei.shape[1]), (ei[0], ei[1])), shape=(4, 4))
    links = np.array([[0, 3], [1, 3], [0, 1]])
    cn = common_neighbours(A, links)
    # 0-3: common neighbour 2; 1-3: common 2; 0-1: common 2
    np.testing.assert_allclose(cn, [1, 1, 1])
    ra = resource_allocation(A, links)
    # deg(2) = 3 -> every RA score = 1/3
    np.testing.assert_allclose(ra, [1 / 3, 1 / 3, 1 / 3], rtol=1e-6)
    aa = adamic_adar(A, links)
    np.testing.assert_allclose(aa, [1 / np.log(3)] * 3, rtol=1e-6)


def test_device_heuristics_match_host():
    """Bucketed compare-all device path == scipy host path for CN/AA/RA on a
    weighted hub-heavy graph (covers multiple degree buckets)."""
    import scipy.sparse as ssp
    from subgraph_sketching_tpu.heuristics import (
        DeviceHeuristics, adamic_adar, common_neighbours,
        resource_allocation,
    )
    n = 400
    ei = barabasi_albert_graph(n, 6, seed=2)
    rng = np.random.default_rng(0)
    w = rng.integers(1, 4, ei.shape[1]).astype(np.float32)
    # symmetric weights: weight of (u,v) == (v,u)
    key = np.minimum(ei[0], ei[1]) * n + np.maximum(ei[0], ei[1])
    _, first = np.unique(key, return_index=True)
    wmap = dict(zip(key[first], w[first]))
    w = np.array([wmap[k] for k in key], np.float32)
    A = ssp.csr_matrix((w, (ei[0], ei[1])), shape=(n, n))
    links = np.stack([rng.integers(0, n, 200),
                      rng.integers(0, n, 200)], axis=1)
    links[:8, 0] = 0  # include hub endpoints (BA node 0 has high degree)
    dev = DeviceHeuristics(A)
    assert len(dev.buckets) > 1, "hub graph should span multiple buckets"
    for kind, host_fn in (("CN", common_neighbours),
                          ("AA", adamic_adar),
                          ("RA", resource_allocation)):
        np.testing.assert_allclose(dev.scores(links, kind),
                                   host_fn(A, links), rtol=1e-4, atol=1e-5,
                                   err_msg=kind)


def test_ppr_sums_to_one():
    import scipy.sparse as ssp
    from subgraph_sketching_tpu.heuristics import personalized_pagerank
    ei = barabasi_albert_graph(30, 3, seed=0)
    A = ssp.csr_matrix((np.ones(ei.shape[1]), (ei[0], ei[1])), shape=(30, 30))
    links = np.array([[0, 1], [0, 5], [3, 7]])
    scores, links_sorted = personalized_pagerank(A, links)
    assert (scores >= 0).all() and (scores <= 1).all()
    assert links_sorted.shape == links.shape


def test_empty_edge_list_plan_fully_usable():
    """Regression: the zero-edge early return left the plan half-built —
    stage_edge_data / gather_idx / PlanSpmm.tables raised AttributeError."""
    from subgraph_sketching_tpu.ops.segment_scan import PlanSpmm

    ei = np.zeros((2, 0), np.int32)
    plan = make_plan(ei, 5)
    x = jnp.arange(10, dtype=jnp.uint32).reshape(5, 2)
    np.testing.assert_array_equal(plan.reduce(x, "min"), x)
    assert plan.stage_edge_data(np.zeros(0, np.float32)).shape == (0,)
    assert plan.gather_idx.shape == (0,)
    chunked = plan.chunk(16)
    np.testing.assert_array_equal(chunked.reduce(x, "min"), x)
    chunked.stage_edge_data(np.zeros(0, np.float32))
    ps = PlanSpmm(ei, np.zeros(0, np.float32), 5)
    assert len(ps.tables) == 10
    np.testing.assert_array_equal(np.asarray(ps(jnp.ones((5, 3)))), 0.0)


def test_reduce_sketches_non_pow2_sub_len():
    """Regression: the fused halving tree silently dropped slots when
    sub_len was not a power of two (constructor accepts any sub_len)."""
    rng = np.random.default_rng(3)
    ei = np.asarray(barabasi_albert_graph(60, 7, seed=1))
    mh = jnp.asarray(rng.integers(0, 2 ** 32 - 1, (60, 8), dtype=np.uint32))
    hll = jnp.asarray(rng.integers(0, 56, (60, 8)).astype(np.int8))
    for sub_len in (3, 5, 12):
        plan = make_plan(ei, 60, sub_len=sub_len)
        got_mh, got_hll = plan.reduce_sketches(mh, hll)
        np.testing.assert_array_equal(got_mh, plan.reduce(mh, "min"))
        np.testing.assert_array_equal(got_hll, plan.reduce(hll, "max"))


def test_device_heuristics_bucket_pad_uses_own_bucket():
    """Regression: partial chunks padded with GLOBAL link 0 — if that link's
    endpoint has higher degree than the bucket width, the padded neighbour
    write overflows and the whole scoring run crashes."""
    import scipy.sparse as ssp
    from subgraph_sketching_tpu.heuristics import (
        DeviceHeuristics, common_neighbours,
    )

    n = 140
    # hub node 0 with degree ~100 (wide bucket); a ring of degree-2 nodes
    hub_dst = np.arange(1, 101)
    ring = np.stack([np.arange(101, n), np.roll(np.arange(101, n), -1)])
    src = np.concatenate([np.zeros(100, np.int64), ring[0]])
    dst = np.concatenate([hub_dst, ring[1]])
    src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    A = ssp.csr_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    # link 0 touches the hub (wide bucket); the rest are narrow-bucket links
    links = np.concatenate([
        np.array([[0, 5]]),
        np.stack([np.arange(101, 131), np.arange(102, 132)], axis=1),
    ]).astype(np.int32)
    dh = DeviceHeuristics(A, chunk_elems=8 * 32 * 32)  # forces partial chunks
    got = dh.scores(links, "CN")
    want = common_neighbours(A, links)
    np.testing.assert_allclose(got, np.asarray(want).ravel(), rtol=1e-5,
                               atol=1e-5)


def test_device_heuristics_rejects_undersized_buckets():
    """Regression: caller-supplied buckets that don't cover max degree made
    hub links silently score 0.0 (no bucket matched them); now a loud
    ValueError at construction."""
    import pytest
    import scipy.sparse as ssp
    from subgraph_sketching_tpu.heuristics import DeviceHeuristics

    n = 120
    hub_dst = np.arange(1, 101)
    src = np.concatenate([np.zeros(100, np.int64), hub_dst])
    dst = np.concatenate([hub_dst, np.zeros(100, np.int64)])
    A = ssp.csr_matrix((np.ones(len(src)), (src, dst)), shape=(n, n))
    with pytest.raises(ValueError, match="max.*degree"):
        DeviceHeuristics(A, buckets=(32, 64))
    DeviceHeuristics(A, buckets=(32, 128))  # covering buckets are fine


def test_heuristics_automorphic_nodes_score_equal():
    """Links related by a graph automorphism must score identically under
    every heuristic (reference test_heuristics.py test_iso_graph)."""
    import scipy.sparse as ssp
    from subgraph_sketching_tpu.heuristics import (
        adamic_adar, common_neighbours, personalized_pagerank,
        resource_allocation,
    )

    # two disjoint squares joined by a bridge 3-4: the map v -> 7-v is an
    # automorphism, so (0, 2) and (7, 5) are equivalent links
    und = np.array([[0, 1], [1, 2], [2, 3], [3, 0],
                    [4, 5], [5, 6], [6, 7], [7, 4], [3, 4]])
    src = np.concatenate([und[:, 0], und[:, 1]])
    dst = np.concatenate([und[:, 1], und[:, 0]])
    A = ssp.csr_matrix((np.ones(len(src)), (src, dst)), shape=(8, 8))
    links = np.array([[0, 2], [7, 5]], dtype=np.int64)
    for fn in (common_neighbours, adamic_adar, resource_allocation):
        s = np.asarray(fn(A, links)).ravel()
        assert s[0] == s[1], (fn.__name__, s)
    s, _ = personalized_pagerank(A, links)
    np.testing.assert_allclose(s[0], s[1], rtol=1e-8)


def test_ppr_scores_in_input_order():
    """Regression: PPR scores were returned src-sorted while callers kept
    input order (breaking citation2 per-positive negative alignment)."""
    from subgraph_sketching_tpu.heuristics import personalized_pagerank

    ei = np.asarray(barabasi_albert_graph(40, 3, seed=2))
    import scipy.sparse as ssp
    A = ssp.csr_matrix((np.ones(ei.shape[1]), (ei[0], ei[1])), shape=(40, 40))
    links = np.array([[7, 3], [2, 9], [7, 5], [1, 4]], np.int32)  # unsorted
    s, out_links = personalized_pagerank(A, links)
    np.testing.assert_array_equal(out_links, links)
    for i, (u, v) in enumerate(links):
        s1, _ = personalized_pagerank(A, np.array([[u, v]], np.int32))
        np.testing.assert_allclose(s[i], s1[0], rtol=1e-6)


def test_pallas_segment_merge_matches_xla_paths():
    """The TPU Pallas merge (forward segmented scan + boundary gather,
    ops/pallas_segscan.py) must be bit-equal to the XLA sorted-scatter
    merge on the plan's real sub-run results — run here in interpret mode
    on the CPU mesh; bit-exactness on the real chip is asserted by
    tools/probe_pallas_segscan.py.  Covers: runs straddling kernel-block
    boundaries (S > PC via a low-node/high-degree shape), empty segments,
    uint32 min (sign-bias trick) and int8 max (in-VMEM widening)."""
    from subgraph_sketching_tpu.ops import pallas_segscan as pss

    rng = np.random.default_rng(3)
    for n, deg, sub_len in [(300, 4, 8), (150, 200, 4)]:
        e = n * deg
        ei = np.stack([rng.integers(0, n, e),
                       rng.integers(0, n, e)]).astype(np.int32)
        # leave some nodes with no in-edges (empty segments)
        ei[1] = np.where(ei[1] < 10, 10, ei[1]).astype(np.int32)
        plan = make_plan(ei, n, sub_len=sub_len)
        rid2d, last_idx, empty = plan._pallas_tables()
        assert bool(np.asarray(empty)[:10].all())
        mh = rng.integers(0, 2 ** 32 - 1, (n, 128), dtype=np.uint32)
        hl = rng.integers(0, 56, (n, 256)).astype(np.int8)
        for x, op, ident in ((mh, "min", np.uint32(0xFFFFFFFF)),
                             (hl, "max", np.int8(0))):
            rows = np.concatenate([x, np.full((1,) + x.shape[1:], ident,
                                              x.dtype)])
            v = rows[plan._gather_idx_np].reshape(
                plan.num_subruns, plan.sub_len, x.shape[1])
            v = v.min(axis=1) if op == "min" else v.max(axis=1)
            got = pss.sorted_segment_combine(
                jnp.asarray(v), jnp.asarray(x), op, rid2d, last_idx, empty,
                plan._seg_depth, interpret=True)
            want = plan.reduce(jnp.asarray(x), op)  # CPU: XLA scatter path
            np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pallas_segment_merge_add_matches_xla():
    """The float32 "add" Pallas merge (the SpMM path) must match the XLA
    sorted-scatter merge to float associativity — the ladder sums each run
    as a balanced tree, the scatter sequentially."""
    from subgraph_sketching_tpu.ops import pallas_segscan as pss

    rng = np.random.default_rng(5)
    for n, deg, sub_len in [(300, 4, 8), (150, 200, 4)]:
        e = n * deg
        ei = np.stack([rng.integers(0, n, e),
                       rng.integers(0, n, e)]).astype(np.int32)
        ei[1] = np.where(ei[1] < 10, 10, ei[1]).astype(np.int32)  # empties
        plan = make_plan(ei, n, sub_len=sub_len)
        rid2d, last_idx, empty = plan._pallas_tables()
        x = rng.standard_normal((n, 16)).astype(np.float32)
        w = rng.random(e).astype(np.float32)
        wslots = plan.stage_edge_data(w)
        rows = np.concatenate([x, np.zeros((1, 16), np.float32)])
        v = (rows[plan._gather_idx_np]
             * np.asarray(wslots)[:, None]).reshape(
                 plan.num_subruns, plan.sub_len, 16).sum(axis=1)
        got = pss.sorted_segment_combine(
            jnp.asarray(v), jnp.asarray(x), "add", rid2d, last_idx, empty,
            plan._seg_depth, interpret=True)
        want = plan.reduce(jnp.asarray(x), "add", edge_data_slots=wslots)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        assert np.all(np.asarray(got)[:10] == 0.0)  # empty segments -> 0


def test_chunked_plan_pallas_merge_matches_xla(monkeypatch):
    """The chunked (citation2-scale) plan's per-chunk Pallas merge — run
    here in interpret mode via SST_FORCE_PALLAS_INTERPRET — must equal the
    XLA per-chunk sorted scatter on all three ops, including destinations
    whose sub-runs straddle chunk boundaries."""
    rng = np.random.default_rng(7)
    n, deg, sub_len = 200, 12, 4
    e = n * deg
    ei = np.stack([rng.integers(0, n, e),
                   rng.integers(0, n, e)]).astype(np.int32)
    ei[1] = np.where(ei[1] < 5, 5, ei[1]).astype(np.int32)   # empties
    ei[1, : e // 4] = 17                                     # a hub: its
    # sub-runs straddle several chunks at max_slots=64
    base = make_plan(ei, n, sub_len=sub_len)
    chunked = base.chunk(64)
    assert chunked.num_chunks > 3
    mh = jnp.asarray(rng.integers(0, 2 ** 32 - 1, (n, 128), dtype=np.uint32))
    hl = jnp.asarray(rng.integers(0, 56, (n, 128)).astype(np.int8))
    xf = jnp.asarray(rng.standard_normal((n, 16)).astype(np.float32))
    w = rng.random(e).astype(np.float32)
    wslots = chunked.stage_edge_data(w)

    monkeypatch.delenv("SST_FORCE_PALLAS_INTERPRET", raising=False)
    want = [chunked.reduce(mh, "min"), chunked.reduce(hl, "max"),
            chunked.reduce(xf, "add", edge_data_slots=wslots)]
    monkeypatch.setenv("SST_FORCE_PALLAS_INTERPRET", "1")
    got = [chunked.reduce(mh, "min"), chunked.reduce(hl, "max"),
           chunked.reduce(xf, "add", edge_data_slots=wslots)]
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
    np.testing.assert_array_equal(np.asarray(got[1]), np.asarray(want[1]))
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(want[2]),
                               rtol=1e-5, atol=1e-5)


def test_auto_plan_picks_sub_len_per_form():
    """make_auto_plan(sub_len=None) chooses SUB_LEN for one-shot plans and
    CHUNK_SUB_LEN when the slot table will exceed max_slots (the chunked
    hop measured faster at longer sub-runs — see the constants)."""
    from subgraph_sketching_tpu.ops.segment_scan import (
        CHUNK_SUB_LEN, SUB_LEN, ChunkedSegmentPlan, make_auto_plan,
    )

    rng = np.random.default_rng(1)
    n, e = 100, 2000
    ei = np.stack([rng.integers(0, n, e),
                   rng.integers(0, n, e)]).astype(np.int32)
    one = make_auto_plan(ei, n)                       # no budget: one-shot
    assert one.sub_len == SUB_LEN
    small = make_auto_plan(ei, n, max_slots=256)      # must chunk
    assert isinstance(small, ChunkedSegmentPlan)
    assert small.sub_len == CHUNK_SUB_LEN
    big = make_auto_plan(ei, n, max_slots=1 << 20)    # fits: one-shot
    assert big.sub_len == SUB_LEN
    forced = make_auto_plan(ei, n, max_slots=256, sub_len=4)
    assert forced.sub_len == 4                        # explicit wins
    # equality across the three forms
    x = jnp.asarray(rng.integers(0, 2 ** 32 - 1, (n, 8), dtype=np.uint32))
    want = np.asarray(one.reduce(x, "min"))
    np.testing.assert_array_equal(np.asarray(small.reduce(x, "min")), want)
    np.testing.assert_array_equal(np.asarray(forced.reduce(x, "min")), want)


def test_reduce_tables_reach_pallas_merge_through_jit(monkeypatch):
    """reduce(tables=plan.reduce_tables) inside jit must keep the Pallas
    merge (the boundary tables ride as jit ARGUMENTS — the at-scale
    contract; advisor round-4 finding) and stay bit-exact."""
    import jax

    rng = np.random.default_rng(9)
    n, deg = 250, 6
    e = n * deg
    ei = np.stack([rng.integers(0, n, e),
                   rng.integers(0, n, e)]).astype(np.int32)
    plan = make_plan(ei, n, sub_len=8)
    mh = jnp.asarray(rng.integers(0, 2 ** 32 - 1, (n, 128), dtype=np.uint32))

    want = np.asarray(plan.reduce(mh, "min"))  # XLA scatter path (CPU)

    monkeypatch.setenv("SST_FORCE_PALLAS_INTERPRET", "1")

    @jax.jit
    def f(x, tables):
        return plan.reduce(x, "min", tables=tables)

    got = np.asarray(f(mh, plan.reduce_tables))
    np.testing.assert_array_equal(got, want)
    # legacy 2-tuple still works (falls back to the XLA merge)
    @jax.jit
    def g(x, tables):
        return plan.reduce(x, "min", tables=tables)

    got2 = np.asarray(g(mh, plan.reduce_tables[:2]))
    np.testing.assert_array_equal(got2, want)


def test_pallas_segscan_long_runs_cap_depth():
    """A destination with more sub-runs than the kernel block (run longer
    than PC slots) must chain correctly through the cross-block carry at
    the capped depth."""
    from subgraph_sketching_tpu.ops import pallas_segscan as pss

    rng = np.random.default_rng(4)
    n = 4
    e = 40_000                       # node 0 gets ~10k in-edges
    ei = np.stack([rng.integers(0, n, e),
                   np.zeros(e, dtype=np.int64)]).astype(np.int32)
    ei[1, : e // 2] = rng.integers(0, n, e // 2)
    plan = make_plan(ei, n, sub_len=2)   # thousands of sub-runs per node
    assert plan.num_subruns > pss.PC
    rid2d, last_idx, empty = plan._pallas_tables()
    x = rng.integers(0, 2 ** 32 - 1, (n, 128), dtype=np.uint32)
    rows = np.concatenate([x, np.full((1, 128), 0xFFFFFFFF, np.uint32)])
    v = rows[plan._gather_idx_np].reshape(
        plan.num_subruns, plan.sub_len, 128).min(axis=1)
    got = pss.sorted_segment_combine(
        jnp.asarray(v), jnp.asarray(x), "min", rid2d, last_idx, empty,
        plan._seg_depth, interpret=True)
    want = plan.reduce(jnp.asarray(x), "min")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
