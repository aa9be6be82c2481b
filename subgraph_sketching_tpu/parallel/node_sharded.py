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

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from subgraph_sketching_tpu.ops.segment import segment_max, segment_min
from subgraph_sketching_tpu.sketch.hll import hll_count
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches


@dataclass(frozen=True)
class NodePartitionPlan:
    """Host-built static partition of nodes + edges for D devices.

    Node v lives on device v // shard_size.  Edge (u, v) is processed by
    v's owner; if u is remote it reads u's row from the halo buffer.
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

    @property
    def padded_nodes(self) -> int:
        return self.n_dev * self.shard_size

    def pad_init(self, init_mh: np.ndarray, init_hll: np.ndarray):
        """Pad hop-0 sketches to ``padded_nodes`` rows with the reduction
        identities (minhash min identity 0xFFFFFFFF, HLL max identity 0) —
        the single place these identities are encoded for padding."""
        pad = self.padded_nodes - init_mh.shape[0]
        if pad == 0:
            return init_mh, init_hll
        mh = np.concatenate(
            [init_mh, np.full((pad, init_mh.shape[1]),
                              np.iinfo(init_mh.dtype).max, init_mh.dtype)])
        hll = np.concatenate(
            [init_hll, np.zeros((pad, init_hll.shape[1]), init_hll.dtype)])
        return mh, hll


def make_node_partition(edge_index: np.ndarray, num_nodes: int,
                        n_dev: int) -> NodePartitionPlan:
    """Build the static halo-exchange plan on host.

    Fully vectorised numpy, O(E log E) total — no per-(sender, receiver)
    passes over the edge list and no per-edge Python (the previous
    implementation's O(D^2 E) masks + dict lookups were minutes of
    single-thread work at citation2 scale)."""
    src = np.asarray(edge_index[0], dtype=np.int64)
    dst = np.asarray(edge_index[1], dtype=np.int64)
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
                             halo_mask=hm)


def _sharded_hop(plan: NodePartitionPlan, mesh: Mesh, axis: str):
    """One halo-exchanged propagation hop over node-sharded state."""
    S = plan.shard_size
    spec_nodes = P(axis, None)      # [n_pad, width] sharded on nodes
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
        mh_acc = segment_min(mh[lsrc], ldst, S, mask=lmask)
        hll_acc = segment_max(hll[lsrc], ldst, S, mask=lmask)

        # 3. halo-source edges against the received buffer
        mh_halo = mh_halo.reshape(-1, mh.shape[1])
        hll_halo = hll_halo.reshape(-1, hll.shape[1])
        mh_acc = jnp.minimum(mh_acc, segment_min(mh_halo[hsrc], hdst, S,
                                                 mask=hmask))
        hll_acc = jnp.maximum(hll_acc, segment_max(hll_halo[hsrc], hdst, S,
                                                   mask=hmask))

        # 4. own-row fold-in == the reference's self-loops
        return jnp.minimum(mh, mh_acc), jnp.maximum(hll, hll_acc)

    return hop


def node_sharded_build_hash_tables(
        plan: NodePartitionPlan, params: SketchParams, mesh: Mesh,
        init_minhash, init_hll, axis: str = "graph") -> Sketches:
    """All per-hop sketches with state sharded across ``axis`` by node.

    init_minhash/init_hll: [n_pad, width] arrays (host or device); n_pad =
    plan.padded_nodes.  Returns a Sketches pytree whose arrays are sharded
    along the node dimension — per-device memory is ~1/D of the table.
    """
    n_pad = plan.padded_nodes
    assert init_minhash.shape[0] == n_pad and init_hll.shape[0] == n_pad, \
        f"pad hop-0 sketches to {n_pad} rows (plan.padded_nodes)"
    shard_rows = NamedSharding(mesh, P(axis, None))
    mh = jax.device_put(init_minhash, shard_rows)
    hll = jax.device_put(init_hll, shard_rows)
    plan_args = tuple(
        jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1)))))
        for a in (plan.send_idx, plan.send_mask, plan.local_src,
                  plan.local_dst, plan.local_mask, plan.halo_src,
                  plan.halo_dst, plan.halo_mask))
    hop = jax.jit(_sharded_hop(plan, mesh, axis))

    @functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P(axis)))
    def cards_of(h):
        return hll_count(h, params.hll_p)

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
        axis: str = "graph") -> jnp.ndarray:
    """Subgraph features for a link batch from NODE-sharded sketch state.

    Arbitrary (u, v) pairs need rows from arbitrary shards, so each device
    contributes the rows it owns (others zeroed) and a psum assembles the
    gathered [B, width] blocks — 2·(K·B·width) bytes over ICI per batch,
    independent of graph size.  The feature math then runs replicated
    (identical to the single-device path, sketch/elph.py).
    """
    from subgraph_sketching_tpu.sketch.elph import inclusion_exclusion_ladder
    from subgraph_sketching_tpu.sketch.minhash import jaccard
    n_dev = mesh.shape[axis]
    n_pad = sk.minhash.shape[1]
    S = n_pad // n_dev

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, axis, None), P(None, axis, None),
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

        mh_u, hll_u, cu = rows_of(lnk[:, 0])
        mh_v, hll_v, cv = rows_of(lnk[:, 1])
        # identical feature math to the single-device path (sketch/elph.py);
        # the slice start adapts so K-row hops-only stacks (hop 0 dropped to
        # save HBM at citation2 scale) work like the (K+1)-row full stacks
        s0 = mh_u.shape[0] - params.max_hops
        jac = jaccard(mh_u[s0:][:, None], mh_v[s0:][None, :])    # [K, K, B]
        unions = jnp.maximum(hll_u[s0:][:, None], hll_v[s0:][None, :])
        inter = jac * hll_count(unions, params.hll_p)
        inter = jnp.transpose(inter, (2, 0, 1))                  # [B, K, K]
        return inclusion_exclusion_ladder(inter, cu, cv, params)

    return features(jnp.asarray(links), sk.minhash, sk.hll, sk.cards)
