"""ELPH sketch engine: hash-table construction and subgraph features.

TPU-native equivalent of the reference's ``ElphHashes``
(src/hashing.py:48-323).  Hop-0 sketches are initialised on host (bit-exact
64-bit hashing, see node_hash.py); everything else runs on device with static
shapes:

  * k-hop propagation = segment-min (minhash) / segment-max (HLL) over the
    edge list including self (the reference adds explicit self-loops,
    src/hashing.py:148; we fold self in via a final elementwise min/max,
    which is equivalent because min/max are idempotent).
  * subgraph features for a batch of links = gathers of per-hop sketch rows +
    the hop-pair inclusion-exclusion ladder (src/hashing.py:258-323).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from subgraph_sketching_tpu.ops.segment import segment_max, segment_min
from subgraph_sketching_tpu.sketch.hll import hll_count, hll_init
from subgraph_sketching_tpu.sketch.minhash import jaccard, minhash_init
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches


def propagate_minhash(mh: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
                      num_nodes: int, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One hop of minhash propagation: out[v] = min(mh[v], min_{(u,v)} mh[u]).

    Equivalent to the reference's max-aggregation over negated values with
    self-loops (src/hashing.py:28-36, 148).
    """
    agg = segment_min(mh[src], dst, num_nodes, mask=mask)
    return jnp.minimum(mh, agg)


def propagate_hll(hll: jnp.ndarray, src: jnp.ndarray, dst: jnp.ndarray,
                  num_nodes: int, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """One hop of HLL propagation: out[v] = max(hll[v], max_{(u,v)} hll[u]).

    (src/hashing.py:38-45, 148.)
    """
    agg = segment_max(hll[src], dst, num_nodes, mask=mask)
    return jnp.maximum(hll, agg)


def initialise_sketches(num_nodes: int, params: SketchParams
                        ) -> Tuple[np.ndarray, np.ndarray]:
    """Host-side hop-0 state: (minhash uint32 [n,P], hll int8 [n,m])."""
    mh0 = minhash_init(num_nodes, params.num_perm, params.minhash_seed)
    hll0 = hll_init(num_nodes, params.hll_p)
    return mh0, hll0


def build_hash_tables(edge_index: jnp.ndarray, num_nodes: int,
                      params: SketchParams,
                      mask: Optional[jnp.ndarray] = None,
                      init: Optional[Tuple[jnp.ndarray, jnp.ndarray]] = None,
                      plan=None, hops_only: bool = False) -> Sketches:
    """All per-hop sketches + cardinalities (reference src/hashing.py:139-165).

    edge_index: [2, E] int32 (may be padded; pass ``mask``).
    init: optional precomputed hop-0 (minhash, hll) device arrays — pass these
    when calling inside jit (host init is not traceable).
    plan: optional ops.segment_scan.SortedSegmentPlan for the same edges —
    the fast path (static padded-tree reduction, ~2.5x the scatter path).
    hops_only: return K-row stacks (hops 1..K; hop 0 dropped) — the feature
    extractor accepts both layouts, and at citation2 scale the hop-0 third
    of the table plus the stack-time transient is the difference between
    fitting one chip and OOM.  Serving's streaming updates recompute hop-0
    rows per touched id (pure per-id function), so both layouts stream.
    """
    assert params.max_hops in (1, 2, 3), \
        f"hashing is not implemented for {params.max_hops} hops"
    if init is None:
        mh0, hll0 = initialise_sketches(num_nodes, params)
        mh0, hll0 = jnp.asarray(mh0), jnp.asarray(hll0)
    else:
        mh0, hll0 = init
    src, dst = edge_index[0], edge_index[1]

    mhs, hlls, cards = [mh0], [hll0], []
    for _ in range(params.max_hops):
        if plan is not None:
            mhs.append(plan.reduce(mhs[-1], "min"))
            hlls.append(plan.reduce(hlls[-1], "max"))
        else:
            mhs.append(propagate_minhash(mhs[-1], src, dst, num_nodes, mask))
            hlls.append(propagate_hll(hlls[-1], src, dst, num_nodes, mask))
        cards.append(hll_count(hlls[-1], params.hll_p))
    if hops_only:
        # free hop 0 BEFORE stacking: the stack transiently doubles resident
        # bytes, and (K+1)/K of that doubling is avoidable at scale
        mhs, hlls = mhs[1:], hlls[1:]
        mh0 = hll0 = None
    return Sketches(minhash=jnp.stack(mhs), hll=jnp.stack(hlls),
                    cards=jnp.stack(cards, axis=1))


def _pairwise_intersections(links: jnp.ndarray, sk: Sketches,
                            params: SketchParams) -> jnp.ndarray:
    """intersections[b, k1-1, k2-1] = |N_k1(u) ∩ N_k2(v)| estimates.

    jaccard(minhash_u^k1, minhash_v^k2) * hll_count(union) for every hop pair
    (reference src/hashing.py:167-189).  One gather per (side, hop), then all
    K^2 pairs are formed from the gathered rows.
    """
    K = params.max_hops
    u, v = links[:, 0], links[:, 1]
    # [K, B, P] / [K, B, m] gathers of hop 1..K rows.  The stack normally
    # holds hops 0..K; a K-row stack (hops 1..K only, hop 0 dropped to save
    # HBM at citation2 scale) is accepted too — slice start adapts.
    s = sk.minhash.shape[0] - K
    mh_u = sk.minhash[s:, u, :]
    mh_v = sk.minhash[s:, v, :]
    hll_u = sk.hll[s:, u, :]
    hll_v = sk.hll[s:, v, :]

    jac = jaccard(mh_u[:, None], mh_v[None, :])            # [K, K, B]
    unions = jnp.maximum(hll_u[:, None], hll_v[None, :])   # [K, K, B, m]
    union_size = hll_count(unions, params.hll_p)           # [K, K, B]
    inter = jac * union_size
    return jnp.transpose(inter, (2, 0, 1))                 # [B, K, K]


def subgraph_features(links: jnp.ndarray, sk: Sketches,
                      params: SketchParams) -> jnp.ndarray:
    """Structure features for a batch of links: [B, k(k+2)] float32.

    (Reference src/hashing.py:258-323.)
    """
    inter = _pairwise_intersections(links, sk, params)      # [B, K, K]
    cu = sk.cards[links[:, 0]]                              # [B, K] |N_k(u)|
    cv = sk.cards[links[:, 1]]                              # [B, K] |N_k(v)|
    return inclusion_exclusion_ladder(inter, cu, cv, params)


def inclusion_exclusion_ladder(inter: jnp.ndarray, cu: jnp.ndarray,
                               cv: jnp.ndarray,
                               params: SketchParams) -> jnp.ndarray:
    """Convert hop-pair intersection estimates + per-hop cardinalities into
    disjoint (d_u, d_v) region counts, in the exact column order of
    LABEL_LOOKUP (reference src/hashing.py:276-320, including its quirk of
    double-subtracting f(1,1) in the (2,0) column).

    inter: [B, K, K]; cu, cv: [B, K].
    """
    K = params.max_hops

    def I(k1, k2):  # noqa: E743 — intersection estimate, 1-indexed hops
        return inter[:, k1 - 1, k2 - 1]

    f = []  # built in LABEL_LOOKUP column order
    f01 = I(1, 1)                                          # (1,1)
    f.append(f01)
    if K == 1:
        f.append(cv[:, 0] - f01)                           # (0,1)
        f.append(cu[:, 0] - f01)                           # (1,0)
    elif K == 2:
        f21 = I(2, 1) - f01
        f12 = I(1, 2) - f01
        f22 = I(2, 2) - f01 - f21 - f12
        f_0_1 = cv[:, 0] - f01 - f21
        f_1_0 = cu[:, 0] - f01 - f12
        f_0_2 = cv[:, 1] - (f01 + f21 + f12 + f22 + f_0_1)
        f_2_0 = cu[:, 1] - f01 - (f01 + f21 + f12 + f22) - f_1_0
        f += [f21, f12, f22, f_0_1, f_1_0, f_0_2, f_2_0]
    else:  # K == 3
        f21 = I(2, 1) - f01
        f12 = I(1, 2) - f01
        f22 = I(2, 2) - f01 - f21 - f12
        f31 = I(3, 1) - f01 - f21
        f13 = I(1, 3) - f01 - f12
        s4 = f01 + f21 + f12 + f22                          # sum of first 4
        f32 = I(3, 2) - s4 - f31
        f23 = I(2, 3) - s4 - f13
        s8 = s4 + f31 + f13 + f32 + f23                     # sum of first 8
        f33 = I(3, 3) - s8
        f_0_1 = cv[:, 0] - f01 - f21 - f31
        f_1_0 = cu[:, 0] - f01 - f12 - f13
        s5 = s4 + f31                                       # sum of first 5
        f_0_2 = cv[:, 1] - s5 - f32 - f_0_1
        f_2_0 = cu[:, 1] - s5 - f23 - f_1_0
        s9 = s8 + f33                                       # sum of first 9
        f_0_3 = cv[:, 2] - s9 - f_0_1 - f_0_2
        f_3_0 = cu[:, 2] - s9 - f_1_0 - f_2_0
        f += [f21, f12, f22, f31, f13, f32, f23, f33,
              f_0_1, f_1_0, f_0_2, f_2_0, f_0_3, f_3_0]

    feats = jnp.stack(f, axis=1).astype(jnp.float32)

    if not params.use_zero_one:
        # positive edges at distance 1 from u must be at distance <= 2 from v,
        # so (0,1)/(1,0) (and (0,2)/(2,0) at 3 hops) carry no signal
        # (src/hashing.py:310-317); knocked out for K >= 2 only.
        knockout = []
        if K == 2:
            knockout = [4, 5]
        elif K == 3:
            knockout = [4, 5, 11, 12]
        if knockout:
            feats = feats.at[:, jnp.asarray(knockout)].set(0.0)
    if params.floor_sf:
        feats = jnp.maximum(feats, 0.0)  # counts can't be negative (:319-320)
    return feats


def pack_sketches(sk: Sketches, params: SketchParams) -> jnp.ndarray:
    """[n, K*(P + m/4)] uint32: per node, hops 1..K of (minhash lanes ‖
    byte-packed HLL registers), concatenated.

    Trades 2*K narrow gathers per endpoint for ONE wide one.  Measured on
    v5e at default widths (K=2 -> 384-lane rows) this LOSES ~10%: gathers
    are descriptor-rate-bound (~105M rows/s) only up to ~128 lanes, wide
    rows drop to ~58M rows/s, and the unpack bitcasts add relayout copies.
    Kept for narrow-sketch configs (K=1 or small num_perm/hll_p) where the
    combined row stays within 128 lanes.
    """
    K = params.max_hops
    n = sk.minhash.shape[1]
    m = sk.hll.shape[2]
    s = sk.minhash.shape[0] - K  # 1 for hops 0..K stacks, 0 for hops-only
    parts = []
    for k in range(K):
        parts.append(sk.minhash[s + k])
        parts.append(jax.lax.bitcast_convert_type(
            sk.hll[s + k].reshape(n, m // 4, 4), jnp.uint32))
    return jnp.concatenate(parts, axis=1)


def _unpack_rows(rows: jnp.ndarray, params: SketchParams):
    """Split gathered combined rows back into ([K, B, P] mh, [K, B, m] hll)."""
    K = params.max_hops
    B = rows.shape[0]
    P = params.num_perm
    m = params.m
    stride = P + m // 4
    mh, hll = [], []
    for k in range(K):
        seg = rows[:, k * stride:(k + 1) * stride]
        mh.append(seg[:, :P])
        hll.append(jax.lax.bitcast_convert_type(
            seg[:, P:], jnp.int8).reshape(B, m))
    return jnp.stack(mh), jnp.stack(hll)


def subgraph_features_packed(links: jnp.ndarray, packed: jnp.ndarray,
                             cards: jnp.ndarray,
                             params: SketchParams) -> jnp.ndarray:
    """Structure features from a hop-packed table: 2 gathers per batch
    (one combined row per endpoint) + the shared inclusion-exclusion ladder.
    Numerically identical to subgraph_features (same estimator core)."""
    from subgraph_sketching_tpu.sketch.minhash import jaccard
    u, v = links[:, 0], links[:, 1]
    mh_u, hll_u = _unpack_rows(packed[u], params)
    mh_v, hll_v = _unpack_rows(packed[v], params)
    jac = jaccard(mh_u[:, None], mh_v[None, :])            # [K, K, B]
    unions = jnp.maximum(hll_u[:, None], hll_v[None, :])   # [K, K, B, m]
    inter = jac * hll_count(unions, params.hll_p)
    inter = jnp.transpose(inter, (2, 0, 1))                # [B, K, K]
    return inclusion_exclusion_ladder(inter, cards[u], cards[v], params)


@functools.partial(jax.jit, static_argnames=("params",))
def _subgraph_features_packed_jit(links, packed, cards, params):
    return subgraph_features_packed(links, packed, cards, params)


def subgraph_features_batched(links, sk: Sketches, params: SketchParams,
                              batch_size: int = 1 << 18) -> jnp.ndarray:
    """Compute subgraph features over link batches to bound device memory.

    Mirrors the reference's 11M-link batching (src/hashing.py:258-270) but
    with power-of-two buckets tuned for TPU HBM: every batch (including the
    only one, for small splits) is padded to a power of two, so different
    splits/datasets share compiled programs instead of recompiling per link
    count.

    Uses the per-hop gather path: the hop-packed single-gather variant
    (subgraph_features_packed) measured SLOWER on v5e for the default
    width (the [n, 384]-lane packed row gathers at ~58M rows/s vs ~105M
    for <=128-lane rows, and the unpack bitcasts add relayout copies); it
    remains available for narrower sketch configs.
    """
    n = links.shape[0]
    bucket = 1 << max(8, (max(1, min(n, batch_size)) - 1).bit_length())
    bucket = min(bucket, batch_size)
    if n <= bucket:
        chunk = jnp.asarray(links)
        pad = bucket - n
        if pad:
            chunk = jnp.concatenate([chunk,
                                     jnp.zeros((pad, 2), dtype=chunk.dtype)])
        return _subgraph_features_jit(chunk, sk, params)[:n]
    # multi-chunk: ONE jitted lax.map over [C, bucket, 2] instead of a
    # python loop of per-chunk dispatches — measured 10.5M vs 6.2M links/s
    # at citation2 scale (2.93M nodes, tools/probe_feat_dispatch.py): the
    # async loop pipelines dispatch fine, but XLA schedules and allocates
    # the whole pass better inside one program
    C = -(-n // bucket)
    lnk = np.zeros((C * bucket, 2), dtype=np.asarray(links).dtype)
    lnk[:n] = np.asarray(links)
    out = _subgraph_features_map_jit(jnp.asarray(lnk.reshape(C, bucket, 2)),
                                     sk, params)
    return out.reshape(C * bucket, -1)[:n]


@functools.partial(jax.jit, static_argnames=("params",))
def _subgraph_features_jit(links: jnp.ndarray, sk: Sketches,
                           params: SketchParams) -> jnp.ndarray:
    return subgraph_features(links, sk, params)


@functools.partial(jax.jit, static_argnames=("params",))
def _subgraph_features_map_jit(links3: jnp.ndarray, sk: Sketches,
                               params: SketchParams) -> jnp.ndarray:
    return jax.lax.map(lambda l: subgraph_features(l, sk, params), links3)
