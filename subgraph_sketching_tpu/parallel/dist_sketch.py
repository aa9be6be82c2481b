"""Distributed sketch construction and feature extraction.

New scope vs. the single-device reference (SURVEY.md §2d).  Min/max sketch
propagation is idempotent and commutative, so graph partitioning composes
cleanly with collectives:

  * edge-sharded propagation ("graph" axis): each device reduces its edge
    shard locally into a full-width accumulator, then a single pmin/pmax
    collective merges the partials — the TPU-native analogue of
    boundary-node sketch exchange, riding ICI
  * lane-sharded features ("lane" axis): minhash lanes / HLL registers are
    split across devices; jaccard match counts psum across lanes, HLL
    register counts psum across register shards — the tensor-parallel-like
    axis for very wide sketches
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from subgraph_sketching_tpu.ops.segment import segment_max, segment_min
from subgraph_sketching_tpu.sketch.hll import (
    hll_count, hll_count_from_stats, pow2_neg,
)
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches


def edge_sharded_build_hash_tables(
        edge_index: jnp.ndarray, num_nodes: int, params: SketchParams,
        mesh: Mesh, init_minhash: jnp.ndarray, init_hll: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None, axis: str = "graph") -> Sketches:
    """Per-hop sketches with edges sharded across ``axis``.

    Sketch state is replicated; each device reduces its local edge shard then
    merges partials with pmin/pmax.  Edge count must be padded to a multiple
    of the mesh axis size (use Graph.padded_edges).
    """
    n_dev = mesh.shape[axis]
    E = edge_index.shape[1]
    assert E % n_dev == 0, f"pad edges ({E}) to a multiple of mesh axis {n_dev}"
    if mask is None:
        mask = jnp.ones((E,), dtype=bool)

    edge_spec = P(None, axis)
    mask_spec = P(axis)
    rep = P()

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(rep, rep, edge_spec, mask_spec),
        out_specs=(rep, rep),
        check_vma=False)
    def one_hop(mh, hll, ei, m):
        src, dst = ei[0], ei[1]
        local_min = segment_min(mh[src], dst, num_nodes, mask=m)
        local_max = segment_max(hll[src], dst, num_nodes, mask=m)
        merged_min = jax.lax.pmin(local_min, axis)
        merged_max = jax.lax.pmax(local_max, axis)
        return jnp.minimum(mh, merged_min), jnp.maximum(hll, merged_max)

    mhs, hlls, cards = [init_minhash], [init_hll], []
    for _ in range(params.max_hops):
        mh_k, hll_k = one_hop(mhs[-1], hlls[-1], edge_index, mask)
        mhs.append(mh_k)
        hlls.append(hll_k)
        cards.append(hll_count(hll_k, params.hll_p))
    return Sketches(minhash=jnp.stack(mhs), hll=jnp.stack(hlls),
                    cards=jnp.stack(cards, axis=1))


def lane_sharded_subgraph_features(
        links: jnp.ndarray, sk: Sketches, params: SketchParams, mesh: Mesh,
        axis: str = "lane") -> jnp.ndarray:
    """Subgraph features with sketch width sharded across ``axis``.

    minhash [K+1, n, P] is sharded on P; hll [K+1, n, m] on m.  Jaccard match
    counts and HLL register statistics are partial-summed with psum; the HLL
    count estimator and the inclusion-exclusion ladder then run replicated.
    Requires num_perm % n_dev == 0 and 2^p % n_dev == 0.
    """
    n_dev = mesh.shape[axis]
    K = params.max_hops
    m = params.m
    assert params.num_perm % n_dev == 0 and m % n_dev == 0
    p = params.hll_p
    # hops 0..K stacks slice off hop 0; K-row hops-only stacks
    # (--hops_only_sketches, the citation2-scale memory-fit layout) are
    # used as-is — same adaptation as sketch/elph.py:118
    s = sk.minhash.shape[0] - K

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(None, None, axis), P(None, None, axis)),
        out_specs=P(),
        check_vma=False)
    def features(lnk, minhash, hll):
        u, v = lnk[:, 0], lnk[:, 1]
        mh_u, mh_v = minhash[s:, u, :], minhash[s:, v, :]
        hll_u, hll_v = hll[s:, u, :], hll[s:, v, :]
        # partial jaccard matches over the local lane shard -> psum
        match = jnp.sum((mh_u[:, None] == mh_v[None, :]).astype(jnp.float32),
                        axis=-1)
        match = jax.lax.psum(match, axis)
        jac = match / params.num_perm                              # [K, K, B]
        # HLL union count: partial zero-counts and 2^-reg sums -> psum, then
        # the SAME estimator core as the single-device path (hll.py) — any
        # residual difference is f32 reduction order only.
        unions = jnp.maximum(hll_u[:, None], hll_v[None, :])       # [K,K,B,m/D]
        num_zero = jax.lax.psum(
            jnp.sum((unions == 0).astype(jnp.float32), axis=-1), axis)
        pow_sum = jax.lax.psum(
            jnp.sum(pow2_neg(unions), axis=-1), axis)
        union_size = hll_count_from_stats(num_zero, pow_sum, p)
        inter = jnp.transpose(jac * union_size, (2, 0, 1))         # [B, K, K]

        # per-hop HLL cardinalities from the sharded registers
        def count_rows(regs):  # [B, m/D]
            nz = jax.lax.psum(
                jnp.sum((regs == 0).astype(jnp.float32), axis=-1), axis)
            ps = jax.lax.psum(
                jnp.sum(pow2_neg(regs), axis=-1), axis)
            return hll_count_from_stats(nz, ps, p)

        cu = jnp.stack([count_rows(hll[s + k, u, :]) for k in range(K)], axis=1)
        cv = jnp.stack([count_rows(hll[s + k, v, :]) for k in range(K)], axis=1)
        return _ladder(inter, cu, cv, params)

    return features(links, sk.minhash, sk.hll)


def _ladder(inter, cu, cv, params: SketchParams) -> jnp.ndarray:
    from subgraph_sketching_tpu.sketch.elph import inclusion_exclusion_ladder
    return inclusion_exclusion_ladder(inter, cu, cv, params)


def lane_sharded_subgraph_features_batched(
        links, sk: Sketches, params: SketchParams, mesh: Mesh,
        axis: str = "lane", batch_size: int = 1 << 18) -> jnp.ndarray:
    """Chunked driver for :func:`lane_sharded_subgraph_features`.

    The one-shot path materialises the [K, K, B, m/L] union tensor for the
    whole batch; for multi-million-link splits that is tens of GB per
    device — exactly on the very-wide-sketch configs the lane axis exists
    for.  Chunk at ``batch_size`` (power-of-two padded so repeat chunks
    share compiled programs), mirroring ``subgraph_features_batched``."""
    import numpy as np

    links = np.asarray(links)
    n = links.shape[0]
    if n == 0:
        # mirror subgraph_features_batched: an empty split stages cleanly
        return jnp.zeros((0, params.sf_dim), jnp.float32)
    bucket = 1 << max(8, (max(1, min(n, batch_size)) - 1).bit_length())
    bucket = min(bucket, batch_size)
    out = []
    for i in range(0, n, bucket):
        chunk = links[i:i + bucket]
        pad = bucket - len(chunk)
        if pad:
            chunk = np.concatenate(
                [chunk, np.zeros((pad, 2), dtype=chunk.dtype)])
        sf = lane_sharded_subgraph_features(
            jnp.asarray(chunk), sk, params, mesh, axis=axis)
        out.append(np.asarray(sf)[:bucket - pad])
    return jnp.asarray(np.concatenate(out))
