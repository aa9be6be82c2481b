"""Node-partitioned (memory-sharded) sketch construction with halo exchange.

The citation2-scale north star needs sketch tables (~GBs at millions of
nodes) that never sit whole on one chip.  This module partitions NODES into
contiguous shards across the mesh's ``graph`` axis; each device holds only
its [n/D, width] slice of the minhash / HLL / cardinality state.

Per hop (reference semantics: src/hashing.py:139-165 — elementwise min/max
over the closed in-neighbourhood):

  1. every device gathers the boundary ("halo") rows its neighbours need
     from its local slice and launches a tiled ``all_to_all`` over the mesh
     axis (rides ICI),
  2. while the collective is in flight it reduces its *local-source* edges
     (src and dst in the same shard) — communication/compute overlap,
  3. it then reduces its *halo-source* edges against the received buffer,
  4. own-row fold-in replaces the reference's explicit self-loops (min/max
     are idempotent).

Min/max are idempotent and commutative, so the partitioned reduction is
bit-exact with the single-device one.  All shapes are static: per-device
edge lists and per-pair halo lists are padded to the maximum across
devices/pairs (host-side plan).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from subgraph_sketching_tpu.ops.segment import segment_max, segment_min
from subgraph_sketching_tpu.sketch.hll import (
    hll_count, hll_count_from_stats, pow2_neg,
)
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches


@dataclass(frozen=True)
class NodePartitionPlan:
    """Host-built static partition of nodes + edges for D devices.

    ``perm[v]`` is node v's row position in the padded sharded tables; the
    node lives on device ``perm[v] // shard_size``.  Edge (u, v) is
    processed by v's owner; if u is remote it reads u's row from the halo
    buffer.  With ``method='locality'`` the positions follow a reverse
    Cuthill–McKee ordering of the graph, so a contiguous cut of positions
    is a low-boundary partition (SURVEY.md §2d: partition quality —
    minimising boundary nodes — is the scaling-efficiency lever).
    """

    num_nodes: int
    n_dev: int
    shard_size: int          # S: nodes per device (n padded to D*S)
    halo_width: int          # H: max rows any device sends to any other
    # [D, D, H] local row indices device s sends to device d (0-padded)
    send_idx: np.ndarray
    send_mask: np.ndarray    # [D, D, H] bool
    # per-device edge lists, padded to uniform length with mask=False
    local_src: np.ndarray    # [D, E_loc] local row index of src
    local_dst: np.ndarray    # [D, E_loc] local row index of dst
    local_mask: np.ndarray   # [D, E_loc]
    halo_src: np.ndarray     # [D, E_halo] index into the [D*H] halo buffer
    halo_dst: np.ndarray     # [D, E_halo] local row index of dst
    halo_mask: np.ndarray    # [D, E_halo]
    # [num_nodes] int32: node id -> padded row position (identity ordering
    # for method='contiguous'); queries translate through it
    perm: np.ndarray = None

    @property
    def padded_nodes(self) -> int:
        return self.n_dev * self.shard_size

    @property
    def is_identity_perm(self) -> bool:
        return self.perm is None or len(self.perm) == 0 or (
            self.perm[0] == 0 and self.perm[-1] == self.num_nodes - 1
            and np.array_equal(
                self.perm, np.arange(self.num_nodes, dtype=self.perm.dtype)))

    @property
    def halo_rows_per_dev(self) -> int:
        """Padded halo rows each device receives per hop — (D-1)*H rows
        actually ride the all_to_all wire (the collective pads every
        sender-receiver pair to the max pair width H)."""
        return (self.n_dev - 1) * self.halo_width

    def pad_init(self, init_mh: np.ndarray, init_hll: np.ndarray):
        """Lay hop-0 sketch rows out in partition order, padded to
        ``padded_nodes`` rows with the reduction identities (minhash min
        identity 0xFFFFFFFF, HLL max identity 0) — the single place these
        identities are encoded for padding."""
        if self.is_identity_perm:
            pad = self.padded_nodes - init_mh.shape[0]
            if pad == 0:
                return init_mh, init_hll
            mh = np.concatenate(
                [init_mh, np.full((pad, init_mh.shape[1]),
                                  np.iinfo(init_mh.dtype).max,
                                  init_mh.dtype)])
            hll = np.concatenate(
                [init_hll, np.zeros((pad, init_hll.shape[1]),
                                    init_hll.dtype)])
            return mh, hll
        mh = np.full((self.padded_nodes, init_mh.shape[1]),
                     np.iinfo(init_mh.dtype).max, init_mh.dtype)
        hll = np.zeros((self.padded_nodes, init_hll.shape[1]),
                       init_hll.dtype)
        mh[self.perm] = init_mh
        hll[self.perm] = init_hll
        return mh, hll

    def to_node_order(self, table: np.ndarray) -> np.ndarray:
        """Rows of a padded sharded table in original node-id order
        (axis -2 is the node axis, matching Sketches layouts)."""
        perm = (np.arange(self.num_nodes) if self.perm is None else self.perm)
        return np.take(np.asarray(table), perm, axis=-2)


def _padded_halo_width(src: np.ndarray, dst: np.ndarray, part: np.ndarray,
                       n_dev: int) -> int:
    """H = max over (sender, receiver) pairs of unique boundary source
    nodes — the all_to_all pads EVERY pair to this width, so (D-1)*H rows
    ride the wire per receiver per hop.  This is the quantity the
    partitioner minimises."""
    ps, pd = part[src], part[dst]
    remote = ps != pd
    if not remote.any():
        return 0
    n = len(part)
    key = (pd[remote].astype(np.int64) * n_dev + ps[remote]) * (n + 1) \
        + src[remote]
    sd = np.unique(key) // (n + 1)
    return int(np.bincount(sd, minlength=n_dev * n_dev).max())


def _rank_within_groups(groups: np.ndarray) -> np.ndarray:
    """rank[i] = #j<i with groups[j] == groups[i] (order-preserving)."""
    order = np.argsort(groups, kind="stable")
    g = groups[order]
    starts = np.flatnonzero(np.concatenate([[True], g[1:] != g[:-1]]))
    within = np.arange(len(g)) - np.repeat(
        starts, np.diff(np.concatenate([starts, [len(g)]])))
    rank = np.empty(len(g), np.int64)
    rank[order] = within
    return rank


def _refine_partition(src: np.ndarray, dst: np.ndarray, part: np.ndarray,
                      n_dev: int, slack: float = 0.0625,
                      passes: int = 32) -> np.ndarray:
    """Balanced label-propagation refinement: repeatedly move boundary
    nodes to the shard holding most of their neighbours, under per-shard
    size caps (``slack`` headroom over n/D — the plan pads shards to the
    max size anyway, so a few % of imbalance costs little memory and buys
    large halo cuts).  Keeps the best-seen assignment by padded halo
    width, so refinement can never return something worse than its input.
    """
    n = len(part)
    S0 = -(-n // n_dev)
    s_cap = int(S0 * (1 + slack)) + 1
    idx = np.arange(n)
    best = part.copy()
    best_h = _padded_halo_width(src, dst, part, n_dev)
    stale = 0
    # int32 count keys when n*D fits (the per-pass bincount over 2E keys
    # is the refinement's hot loop); int64 beyond ~2^31 key space
    key_dtype = np.int32 if n * n_dev < 2**31 else np.int64
    key_dst = (dst * n_dev).astype(key_dtype)
    key_src = (src * n_dev).astype(key_dtype)
    for _ in range(passes):
        counts = np.bincount(
            np.concatenate([key_dst + part[src], key_src + part[dst]]),
            minlength=n * n_dev).reshape(n, n_dev)
        want = counts.argmax(1).astype(np.int32)
        gain = counts[idx, want] - counts[idx, part]
        movers = np.flatnonzero((gain > 0) & (want != part))
        if not len(movers):
            break
        movers = movers[np.argsort(-gain[movers], kind="stable")]
        sizes = np.bincount(part, minlength=n_dev)
        # vectorised two-stage acceptance: best-gain movers first, capped
        # per destination (cap) and per source (don't drain below S0/2)
        cap = np.maximum(s_cap - sizes, 0)
        keep = _rank_within_groups(want[movers]) < cap[want[movers]]
        movers = movers[keep]
        avail = np.maximum(sizes - S0 // 2, 0)
        keep = _rank_within_groups(part[movers]) < avail[part[movers]]
        movers = movers[keep]
        if not len(movers):
            break
        part[movers] = want[movers]
        # exact halo evaluation every pass: it is cheaper than a
        # refinement pass, and driving the stale-exit promptly saves more
        # than sampling it would (measured: sampled evals ran MORE passes
        # and came out slower overall)
        h = _padded_halo_width(src, dst, part, n_dev)
        if h < best_h:
            best_h, best, stale = h, part.copy(), 0
        else:
            stale += 1
            if stale >= 5:
                break
    return best


def balanced_partition(edge_index: np.ndarray, num_nodes: int,
                       n_dev: int) -> np.ndarray:
    """part[v] in [0, D): a balanced, low-halo node assignment.

    Strategy: evaluate cheap candidate initialisations by padded halo
    width — id-order blocks (wins when node ids already carry locality,
    e.g. generator-ordered rings), strided round-robin (spreads BA-style
    early-id hubs so no single shard's rows are needed by everyone), and
    RCM-order blocks (wins on mesh/banded graphs; scipy, skipped if
    absent) — then run balanced label-propagation refinement from the
    best.  Refinement keeps the best-seen assignment, so the result is
    never worse than plain contiguous blocks.  On uniformly random graphs
    nothing helps (every node neighbours every shard w.h.p.) and this
    degrades gracefully to the contiguous baseline.
    """
    src = np.asarray(edge_index[0], dtype=np.int64)
    dst = np.asarray(edge_index[1], dtype=np.int64)
    S0 = -(-num_nodes // n_dev)
    ids = np.arange(num_nodes)
    candidates = [(ids // S0).astype(np.int32),
                  (ids % n_dev).astype(np.int32)]
    try:
        from scipy.sparse import csr_matrix
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        A = csr_matrix((np.ones(len(src), np.float32), (src, dst)),
                       shape=(num_nodes, num_nodes))
        order = np.asarray(reverse_cuthill_mckee(A, symmetric_mode=False),
                           dtype=np.int64)
        pos = np.empty(num_nodes, np.int64)
        pos[order] = ids
        candidates.append((pos // S0).astype(np.int32))
    except ImportError:
        pass
    part = min(candidates,
               key=lambda p: _padded_halo_width(src, dst, p, n_dev))
    return _refine_partition(src, dst, part.copy(), n_dev)


def make_node_partition(edge_index: np.ndarray, num_nodes: int,
                        n_dev: int,
                        method: str = "locality") -> NodePartitionPlan:
    """Build the static halo-exchange plan on host.

    ``method='locality'`` (default): balanced low-halo partition
    (``balanced_partition``: best of id-blocks/strided/RCM candidates +
    label-propagation refinement) — on locality-structured graphs this
    shrinks the per-hop all_to_all volume severalfold vs id-order blocks.
    ``method='contiguous'``: the id-order blocks (round-2 behaviour).

    Fully vectorised numpy, O(E log E) total — no per-(sender, receiver)
    passes over the edge list and no per-edge Python (the previous
    implementation's O(D^2 E) masks + dict lookups were minutes of
    single-thread work at citation2 scale)."""
    if method not in ("locality", "contiguous"):
        raise ValueError(f"unknown partition method {method!r}")
    src = np.asarray(edge_index[0], dtype=np.int64)
    dst = np.asarray(edge_index[1], dtype=np.int64)
    if method == "locality" and n_dev > 1 and num_nodes > 0:
        part = balanced_partition(edge_index, num_nodes, n_dev)
        sizes = np.bincount(part, minlength=n_dev)
        S = max(1, int(sizes.max()))
        # positions: nodes sorted by (part, id); node v sits at
        # part(v)*S + rank-of-v-within-its-part
        order = np.argsort(part, kind="stable")
        cum = np.concatenate([[0], np.cumsum(sizes[:-1])])
        pos = part[order] * S + (np.arange(num_nodes) - cum[part[order]])
        perm = np.empty(num_nodes, np.int32)
        perm[order] = pos.astype(np.int32)
        src = perm[src].astype(np.int64)
        dst = perm[dst].astype(np.int64)
    else:
        perm = np.arange(num_nodes, dtype=np.int32)
        S = -(-num_nodes // n_dev)
    owner_src = src // S
    owner_dst = dst // S

    # ---- halo sets: unique (receiver d, sender s, node u) triples --------
    # encode each remote edge's (d, s, u) as one int64 key; np.unique then
    # yields every (d, s) group's sorted-by-u member list at once, matching
    # the reference semantics (sorted unique per pair)
    remote = owner_src != owner_dst
    r_src, r_dst = src[remote], dst[remote]
    r_os, r_od = owner_src[remote], owner_dst[remote]
    M = np.int64(n_dev) * S                      # > any node id
    key = (r_od * n_dev + r_os) * M + r_src
    uniq, inv = np.unique(key, return_inverse=True)
    u_sd = uniq // M                             # d * n_dev + s
    u_src = uniq % M
    # rank of each unique entry within its (d, s) group
    if len(uniq):
        grp_change = np.empty(len(uniq), dtype=bool)
        grp_change[0] = True
        np.not_equal(u_sd[1:], u_sd[:-1], out=grp_change[1:])
        grp_starts = np.flatnonzero(grp_change)
        rank = np.arange(len(uniq), dtype=np.int64) - \
            grp_starts[np.cumsum(grp_change) - 1]
        counts_sd = np.bincount(u_sd, minlength=n_dev * n_dev)
        H = max(1, int(counts_sd.max()))
    else:
        rank = np.zeros(0, np.int64)
        H = 1
    send_idx = np.zeros((n_dev, n_dev, H), np.int32)
    send_mask = np.zeros((n_dev, n_dev, H), bool)
    d_of = u_sd // n_dev
    s_of = u_sd % n_dev
    send_idx[s_of, d_of, rank] = u_src - s_of * S
    send_mask[s_of, d_of, rank] = True
    # halo-buffer position of each remote edge's src for its receiver
    halo_pos = s_of[inv] * H + rank[inv]

    # ---- per-device edge lists (group by owner_dst via stable sort) ------
    def _grouped(cols, owners):
        order = np.argsort(owners, kind="stable")
        counts = np.bincount(owners, minlength=n_dev)
        E = max(1, int(counts.max()) if len(owners) else 1)
        bounds = np.concatenate([[0], np.cumsum(counts)])
        s_arr = np.zeros((n_dev, E), np.int32)
        d_arr = np.zeros((n_dev, E), np.int32)
        m_arr = np.zeros((n_dev, E), bool)
        a, b = (c[order] for c in cols)
        for d in range(n_dev):
            lo, hi = bounds[d], bounds[d + 1]
            s_arr[d, :hi - lo] = a[lo:hi]
            d_arr[d, :hi - lo] = b[lo:hi]
            m_arr[d, :hi - lo] = True
        return s_arr, d_arr, m_arr

    local = ~remote
    ls, ld, lm = _grouped((src[local] - owner_dst[local] * S,
                           dst[local] - owner_dst[local] * S),
                          owner_dst[local])
    hs, hd, hm = _grouped((halo_pos, r_dst - r_od * S), r_od)
    return NodePartitionPlan(num_nodes=num_nodes, n_dev=n_dev, shard_size=S,
                             halo_width=H, send_idx=send_idx,
                             send_mask=send_mask, local_src=ls, local_dst=ld,
                             local_mask=lm, halo_src=hs, halo_dst=hd,
                             halo_mask=hm, perm=perm)


def _chunked_seg(table, src_idx, dst_idx, mask, S: int, op: str,
                 max_rows: Optional[int]):
    """segment_min/max(table[src_idx], dst_idx, S), streaming the gather in
    ``max_rows`` chunks via lax.scan when the one-shot [E, width]
    intermediate would exceed the budget — min/max are associative, so the
    chunked accumulation is bit-exact with the one-shot reduce (the sharded
    analogue of ops.segment_scan.ChunkedSegmentPlan)."""
    seg = segment_min if op == "min" else segment_max
    E = src_idx.shape[0]
    if max_rows is None or E <= max_rows:
        return seg(table[src_idx], dst_idx, S, mask=mask)
    C = -(-E // max_rows)
    pad = C * max_rows - E
    src_idx = jnp.pad(src_idx, (0, pad))
    dst_idx = jnp.pad(dst_idx, (0, pad))
    mask = jnp.pad(mask, (0, pad))  # padded lanes masked out
    ident = (jnp.iinfo(table.dtype).max if op == "min"
             else jnp.iinfo(table.dtype).min)
    comb = jnp.minimum if op == "min" else jnp.maximum

    def body(acc, xs):
        s, d, m = xs
        return comb(acc, seg(table[s], d, S, mask=m)), None

    acc0 = jnp.full((S, table.shape[1]), ident, table.dtype)
    acc, _ = jax.lax.scan(
        body, acc0, (src_idx.reshape(C, max_rows),
                     dst_idx.reshape(C, max_rows),
                     mask.reshape(C, max_rows)))
    return acc


def _sharded_hop(plan: NodePartitionPlan, mesh: Mesh, axis: str,
                 max_gather_rows: Optional[int] = None,
                 lane_axis: Optional[str] = None):
    """One halo-exchanged propagation hop over node-sharded state.

    ``max_gather_rows`` bounds the per-device [E_loc, width] gather
    intermediates (chunk-streamed reduction) so extreme-scale graphs fit
    each chip's HBM alongside the 1/D sketch state.

    ``lane_axis``: tables additionally sharded on sketch width.  min/max
    reduce elementwise over lanes, so the body is UNCHANGED — each lane
    shard exchanges and reduces only its 1/L-width slice (the all_to_all
    below runs per lane shard over the ``axis`` subgroups of the mesh)."""
    S = plan.shard_size
    spec_nodes = P(axis, lane_axis)  # [n_pad, width] node x lane sharded
    spec_dev = P(axis)              # leading device axis of plan arrays

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(spec_nodes, spec_nodes, P(axis, None, None),
                  P(axis, None, None), spec_dev, spec_dev, spec_dev,
                  spec_dev, spec_dev, spec_dev),
        out_specs=(spec_nodes, spec_nodes),
        check_vma=False)
    def hop(mh, hll, send_idx, send_mask, lsrc, ldst, lmask, hsrc, hdst,
            hmask):
        # drop the singleton device axis shard_map leaves on plan arrays
        send_idx, send_mask = send_idx[0], send_mask[0]
        lsrc, ldst, lmask = lsrc[0], ldst[0], lmask[0]
        hsrc, hdst, hmask = hsrc[0], hdst[0], hmask[0]

        # 1. halo exchange: [D, H, w] boundary rows -> tiled all_to_all.
        # Issued first so XLA can overlap the collective with step 2.
        mh_send = jnp.where(send_mask[:, :, None], mh[send_idx],
                            jnp.asarray(jnp.iinfo(mh.dtype).max, mh.dtype))
        hll_send = jnp.where(send_mask[:, :, None], hll[send_idx],
                             jnp.asarray(jnp.iinfo(hll.dtype).min, hll.dtype))
        mh_halo = jax.lax.all_to_all(mh_send, axis, 0, 0, tiled=True)
        hll_halo = jax.lax.all_to_all(hll_send, axis, 0, 0, tiled=True)

        # 2. local-source edges (no communication needed)
        mh_acc = _chunked_seg(mh, lsrc, ldst, lmask, S, "min",
                              max_gather_rows)
        hll_acc = _chunked_seg(hll, lsrc, ldst, lmask, S, "max",
                               max_gather_rows)

        # 3. halo-source edges against the received buffer
        mh_halo = mh_halo.reshape(-1, mh.shape[1])
        hll_halo = hll_halo.reshape(-1, hll.shape[1])
        mh_acc = jnp.minimum(mh_acc, _chunked_seg(
            mh_halo, hsrc, hdst, hmask, S, "min", max_gather_rows))
        hll_acc = jnp.maximum(hll_acc, _chunked_seg(
            hll_halo, hsrc, hdst, hmask, S, "max", max_gather_rows))

        # 4. own-row fold-in == the reference's self-loops
        return jnp.minimum(mh, mh_acc), jnp.maximum(hll, hll_acc)

    return hop


def node_sharded_build_hash_tables(
        plan: NodePartitionPlan, params: SketchParams, mesh: Mesh,
        init_minhash, init_hll, axis: str = "graph",
        max_gather_rows: Optional[int] = None,
        lane_axis: Optional[str] = None) -> Sketches:
    """All per-hop sketches with state sharded across ``axis`` by node.

    init_minhash/init_hll: [n_pad, width] arrays (host or device); n_pad =
    plan.padded_nodes.  Returns a Sketches pytree whose arrays are sharded
    along the node dimension — per-device memory is ~1/D of the table.
    ``max_gather_rows`` chunk-streams the per-device edge gathers
    (bit-exact; bounds the [E_loc, width] intermediates at extreme scale).

    ``lane_axis``: optionally ALSO shard the sketch width (minhash perms /
    HLL registers) across a second mesh axis — a 2D graph x lane layout.
    The hop's min/max reduction is elementwise over lanes, so the lane
    dimension needs NO communication in the build: each lane shard runs
    the same halo all_to_all on its 1/L-width slice.  This is the honest
    lever for comm-bound (random / power-law) graphs, where no partition
    can shrink the boundary (studies/README.md round-3 notes:
    communication-layout tricks provably cannot).  CEILING: the minor dim
    tiles to 128 lanes on TPU, so a slice narrower than 128 lanes pads
    back to a full tile and its HBM/wire bytes stop shrinking — with the
    DEFAULT widths (num_perm=128 u32, m=256 int8) the usable ceiling is
    L=2 (the HLL half halves, the minhash half cannot: 768B -> 640B per
    row, 1.2x); wider configs (num_perm=256+, hll_p>=9) scale further
    (parallel/scaling.lane_row_bytes, docs/PARALLELISM.md).  Only the
    cards estimator crosses lanes (register stats psum, the
    hll_count_from_stats contract shared with lane_sharded features).
    Tables stay bit-exact; cards match the single-device estimator to f32
    reduction order.  Requires num_perm % L == 0 and 2^hll_p % L == 0.
    """
    n_pad = plan.padded_nodes
    assert init_minhash.shape[0] == n_pad and init_hll.shape[0] == n_pad, \
        f"pad hop-0 sketches to {n_pad} rows (plan.padded_nodes)"
    if lane_axis is not None:
        L = mesh.shape[lane_axis]
        assert params.num_perm % L == 0 and params.m % L == 0, (
            f"lane axis size {L} must divide num_perm={params.num_perm} "
            f"and m={params.m}")
    shard_rows = NamedSharding(mesh, P(axis, lane_axis))
    mh = jax.device_put(init_minhash, shard_rows)
    hll = jax.device_put(init_hll, shard_rows)
    plan_args = tuple(
        jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))
        for a in (plan.send_idx, plan.send_mask, plan.local_src,
                  plan.local_dst, plan.local_mask, plan.halo_src,
                  plan.halo_dst, plan.halo_mask))
    hop = jax.jit(_sharded_hop(plan, mesh, axis,
                               max_gather_rows=max_gather_rows,
                               lane_axis=lane_axis))

    if lane_axis is None:
        @functools.partial(jax.jit,
                           out_shardings=NamedSharding(mesh, P(axis)))
        def cards_of(h):
            return hll_count(h, params.hll_p)
    else:
        @jax.jit
        @functools.partial(shard_map, mesh=mesh,
                           in_specs=(P(axis, lane_axis),),
                           out_specs=P(axis), check_vma=False)
        def cards_of(h):
            # lane-partial register stats -> psum -> shared estimator core
            nz = jax.lax.psum(
                jnp.sum((h == 0).astype(jnp.float32), axis=-1), lane_axis)
            ps = jax.lax.psum(jnp.sum(pow2_neg(h), axis=-1), lane_axis)
            return hll_count_from_stats(nz, ps, params.hll_p)

    mhs, hlls, cards = [mh], [hll], []
    for _ in range(params.max_hops):
        mh, hll = hop(mhs[-1], hlls[-1], *plan_args)
        mhs.append(mh)
        hlls.append(hll)
        cards.append(cards_of(hll))
    return Sketches(minhash=jnp.stack(mhs), hll=jnp.stack(hlls),
                    cards=jnp.stack(cards, axis=1))


def node_sharded_subgraph_features(
        links, sk: Sketches, params: SketchParams, mesh: Mesh,
        axis: str = "graph", perm=None,
        lane_axis: Optional[str] = None) -> jnp.ndarray:
    """Subgraph features for a link batch from NODE-sharded sketch state.

    Arbitrary (u, v) pairs need rows from arbitrary shards, so each device
    contributes the rows it owns (others zeroed) and a psum assembles the
    gathered [B, width] blocks — 2·(K·B·width) bytes over ICI per batch,
    independent of graph size.  The feature math then runs replicated
    (identical to the single-device path, sketch/elph.py).

    ``perm``: the NodePartitionPlan's node-id -> row-position map.  Pass it
    whenever the sketches came from a locality-ordered partition (the
    production default); node ids in ``links`` are translated to row
    positions before the shard lookup.

    ``lane_axis``: for tables built 2D graph x lane (see
    ``node_sharded_build_hash_tables``): the row-assembly psum moves only
    the local 1/L-width lane blocks, then jaccard match counts and HLL
    register stats psum across lanes into the same estimator core as the
    lane-sharded path (hll_count_from_stats) — matches the single-device
    features to f32 reduction order.
    """
    from subgraph_sketching_tpu.sketch.elph import inclusion_exclusion_ladder
    n_dev = mesh.shape[axis]
    n_pad = sk.minhash.shape[1]
    S = n_pad // n_dev

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis, lane_axis), P(None, axis, lane_axis),
                  P(axis, None)),
        out_specs=P(),
        check_vma=False)
    def features(lnk, minhash, hll, cards):
        base = jax.lax.axis_index(axis) * S

        def rows_of(nodes):
            """Assemble full sketch rows for arbitrary node ids: each device
            contributes the rows it owns, psum merges (each row is owned by
            exactly one device, so int sums never overflow)."""
            local = jnp.clip(nodes - base, 0, S - 1)
            owned = ((nodes >= base) & (nodes < base + S))[None, :, None]
            mh = jax.lax.psum(
                jnp.where(owned, minhash[:, local, :], jnp.uint32(0)), axis)
            hl = jax.lax.psum(
                jnp.where(owned, hll[:, local, :], jnp.int8(0)), axis)
            cd = jax.lax.psum(
                jnp.where(owned[0], cards[local, :], 0.0), axis)
            return mh, hl, cd

        def lane_sum(x):
            return x if lane_axis is None else jax.lax.psum(x, lane_axis)

        mh_u, hll_u, cu = rows_of(lnk[:, 0])
        mh_v, hll_v, cv = rows_of(lnk[:, 1])
        # identical feature math to the single-device path (sketch/elph.py);
        # the slice start adapts so K-row hops-only stacks (hop 0 dropped to
        # save HBM at citation2 scale) work like the (K+1)-row full stacks
        s0 = mh_u.shape[0] - params.max_hops
        match = jnp.sum((mh_u[s0:][:, None] == mh_v[s0:][None, :])
                        .astype(jnp.float32), axis=-1)
        jac = lane_sum(match) / params.num_perm                  # [K, K, B]
        unions = jnp.maximum(hll_u[s0:][:, None], hll_v[s0:][None, :])
        nz = lane_sum(jnp.sum((unions == 0).astype(jnp.float32), axis=-1))
        ps = lane_sum(jnp.sum(pow2_neg(unions), axis=-1))
        inter = jac * hll_count_from_stats(nz, ps, params.hll_p)
        inter = jnp.transpose(inter, (2, 0, 1))                  # [B, K, K]
        return inclusion_exclusion_ladder(inter, cu, cv, params)

    links = jnp.asarray(links)
    if perm is not None:
        links = jnp.asarray(perm)[links]
    return features(links, sk.minhash, sk.hll, sk.cards)
