"""Perf probes for the sketch-propagation hot kernel (run on the real TPU).

Decomposes the padded-tree reduction into stages and tests layout variants,
to find where the 37M e/s fused rate sits relative to the true gather
ceiling (round-2 BENCH target: >= 70M e/s or a proven roofline).

Usage: timeout 900 python tools/perf_probe.py [probe ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

NUM_NODES = 200_000
AVG_DEG = 16
NUM_PERM = 128
HLL_P = 8
WARMUP = 2
ITERS = 5


def timeit(fn, *args):
    import jax
    for _ in range(WARMUP):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main(probes):
    import jax
    import jax.numpy as jnp
    from subgraph_sketching_tpu.ops.segment_scan import make_plan

    rng = np.random.default_rng(0)
    E = NUM_NODES * AVG_DEG
    src = rng.integers(0, NUM_NODES, E, dtype=np.int32)
    dst = rng.integers(0, NUM_NODES, E, dtype=np.int32)
    mh = rng.integers(0, 2**32 - 1, (NUM_NODES, NUM_PERM), dtype=np.uint32)
    hll = rng.integers(0, 56, (NUM_NODES, 1 << HLL_P)).astype(np.int8)
    plan = make_plan(np.stack([src, dst]), NUM_NODES)
    mhj, hllj = jnp.asarray(mh), jnp.asarray(hll)
    S, L = plan.num_subruns, plan.sub_len
    print(f"E={E} S={S} slots={S*L}", flush=True)

    def report(name, secs, denom=E):
        print(f"{name:28s} {secs*1e3:8.2f} ms  {denom/secs/1e6:8.1f} M/s",
              flush=True)

    if "fused" in probes:
        @jax.jit
        def fused(a, b):
            return plan.reduce(a, "min"), plan.reduce(b, "max")
        report("fused mh+hll (current)", timeit(fused, mhj, hllj))

    if "parts" in probes:
        @jax.jit
        def mh_only(a):
            return plan.reduce(a, "min")
        @jax.jit
        def hll_only(b):
            return plan.reduce(b, "max")
        report("mh only (u32x128)", timeit(mh_only, mhj))
        report("hll only (i8x256)", timeit(hll_only, hllj))

    if "gather" in probes:
        # pure gather of slot rows, tiny reduce so nothing is elided
        idx = plan.gather_idx
        mh1 = jnp.concatenate([mhj, jnp.zeros((1, NUM_PERM), jnp.uint32)])
        hll1 = jnp.concatenate([hllj, jnp.zeros((1, 256), jnp.int8)])
        @jax.jit
        def g_mh(a):
            return a[idx].sum(dtype=jnp.uint32)
        @jax.jit
        def g_hll(a):
            return a[idx].astype(jnp.int32).sum()
        report("gather-only mh", timeit(g_mh, mh1))
        report("gather-only hll i8", timeit(g_hll, hll1))
        hp = jax.lax.bitcast_convert_type(
            hll1.reshape(NUM_NODES + 1, 64, 4), jnp.uint32)
        @jax.jit
        def g_hllp(a):
            return a[idx].sum(dtype=jnp.uint32)
        report("gather-only hll packed u32", timeit(g_hllp, hp))

    if "packed" in probes:
        # hll propagated via packed-u32 gather + SWAR byte-max tree
        HB = jnp.uint32(0x80808080)
        LB = jnp.uint32(0x01010101)

        def byte_max(a, b):
            t = (a | HB) - b
            mext = ((t >> 7) & LB) * jnp.uint32(0xFF)
            return (a & mext) | (b & ~mext)

        hp = jax.lax.bitcast_convert_type(
            hllj.reshape(NUM_NODES, 64, 4), jnp.uint32)

        @jax.jit
        def hll_packed(hpk, own):
            rows = jnp.concatenate([hpk, jnp.zeros((1, 64), jnp.uint32)])
            v = rows[plan.gather_idx].reshape(S, L, 64)
            half = L
            while half > 1:
                half //= 2
                v = byte_max(v[:, :half], v[:, half:2 * half])
            sub = jax.lax.bitcast_convert_type(v[:, 0], jnp.int8).reshape(S, 256)
            agg = jax.ops.segment_max(sub, plan.sub_dst,
                                      num_segments=NUM_NODES)
            return jnp.maximum(own, agg)
        report("hll packed-gather SWAR", timeit(hll_packed, hp, hllj))

        @jax.jit
        def fused_packed(a, hpk, own):
            return plan.reduce(a, "min"), hll_packed.__wrapped__(hpk, own)
        report("fused mh + packed hll", timeit(fused_packed, mhj, hp, hllj))

    if "combined" in probes:
        @jax.jit
        def comb(a, b):
            return plan.reduce_sketches(a, b)
        report("reduce_sketches (192-lane)", timeit(comb, mhj, hllj))

    if "features" in probes:
        from subgraph_sketching_tpu.sketch import (
            SketchParams, build_hash_tables, subgraph_features,
        )
        from subgraph_sketching_tpu.sketch.elph import (
            pack_sketches, subgraph_features_packed,
        )
        params = SketchParams(max_hops=2)
        sk = build_hash_tables(jnp.asarray(np.stack([src, dst])), NUM_NODES,
                               params)
        B = 1 << 18
        links = jnp.asarray(np.stack(
            [rng.integers(0, NUM_NODES, B, dtype=np.int32),
             rng.integers(0, NUM_NODES, B, dtype=np.int32)], axis=1))

        @jax.jit
        def f_old(lnk, s):
            return subgraph_features(lnk, s, params)
        t = timeit(f_old, links, sk)
        report("features per-hop gathers", t, denom=B)

        packed = jax.jit(lambda s: pack_sketches(s, params))(sk)
        jax.block_until_ready(packed)

        @jax.jit
        def f_packed(lnk, p, c):
            return subgraph_features_packed(lnk, p, c, params)
        t = timeit(f_packed, links, packed, sk.cards)
        report("features hop-packed gather", t, denom=B)

    if "mh_half" in probes:
        # descriptor-rate hypothesis: same lanes, half rows -> 2 rows/slot
        mh2 = mh.reshape(NUM_NODES // 2, 2 * NUM_PERM)
        mh2j = jnp.asarray(mh2)
        idx_half = plan.gather_idx // 2  # WRONG semantics, layout probe only
        @jax.jit
        def g_mh2(a):
            return a[idx_half].sum(dtype=jnp.uint32)
        report("gather-only mh 2x-wide rows", timeit(g_mh2, mh2j))


if __name__ == "__main__":
    main(sys.argv[1:] or ["fused", "parts", "gather", "packed", "combined",
                          "mh_half"])
