"""probe_wide follow-up.  Finding so far: gather rate peaks for rows that
are exactly ONE 128-lane tile column of their dtype — u32[128] 438M rows/s
(226GB/s); u16[256] 274M (140GB/s); u32[256] 122M (125GB/s); i8[256] ~260M.

Variant D: HLL table stored u32[N,128], each lane = 2 registers as u16
halves.  The gather then rides the best-observed rate; the halves are
bitcast to native u16 AFTER the gather (no SWAR) for the slot tree +
segment_max.  Also times the bitcast/relayout and the u16 reduce stages
separately so we know where any loss sits.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_wide2 {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 200_000
E = N * 16
P = 128
M = 256

rng = np.random.default_rng(0)
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
plan = make_plan(np.stack([src, dst]), N)
S, L = plan.num_subruns, plan.sub_len
gidx, sdst = plan.gather_idx, plan.sub_dst

mh = jnp.asarray(rng.integers(0, 2**32 - 1, (N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 56, (N, M)).astype(np.int8))
jax.block_until_ready((mh, hll, gidx, sdst))


def pack_hll(h):
    # [N, 256] i8 -> [N, 128] u32 (2 regs per lane as u16 halves)
    h16 = h.astype(jnp.uint16).reshape(h.shape[0], M // 2, 2)
    return jax.lax.bitcast_convert_type(h16, jnp.uint32)


def unpack_u16(v):
    # [..., 128] u32 -> [..., 256] u16
    u = jax.lax.bitcast_convert_type(v, jnp.uint16)
    return u.reshape(v.shape[:-1] + (M,))


def hop_d(mh, hpack, hll):
    a = plan.reduce(mh, "min")
    rows = jnp.concatenate([hpack, jnp.zeros((1, P), jnp.uint32)], axis=0)
    v = rows[gidx].reshape(S, L, P)
    vh = jnp.max(unpack_u16(v), axis=1)                    # [S, 256] u16
    agg = jax.ops.segment_max(vh, sdst, num_segments=N)
    b = jnp.maximum(hll, agg.astype(jnp.int8))
    return a, b


def hll_d_only(hpack, hll):
    rows = jnp.concatenate([hpack, jnp.zeros((1, P), jnp.uint32)], axis=0)
    v = rows[gidx].reshape(S, L, P)
    vh = jnp.max(unpack_u16(v), axis=1)
    agg = jax.ops.segment_max(vh, sdst, num_segments=N)
    return jnp.maximum(hll, agg.astype(jnp.int8))


# variant D2: tree in packed u32 via ONE unpacked level — first tree level
# on u16 after bitcast, like D but reduce before unpack is impossible
# without SWAR; instead time the stages of D.
def stage_gather(hpack):
    rows = jnp.concatenate([hpack, jnp.zeros((1, P), jnp.uint32)], axis=0)
    return rows[gidx]


def stage_gather_tree(hpack):
    rows = jnp.concatenate([hpack, jnp.zeros((1, P), jnp.uint32)], axis=0)
    v = rows[gidx].reshape(S, L, P)
    return jnp.max(unpack_u16(v), axis=1)


# ---------------------------------------------------------- correctness
N2, E2 = 2000, 16000
plan2 = make_plan(np.stack([rng.integers(0, N2, E2, dtype=np.int32),
                            rng.integers(0, N2, E2, dtype=np.int32)]), N2)
hll2 = jnp.asarray(rng.integers(0, 56, (N2, M)).astype(np.int8))
hp2 = pack_hll(hll2)
rows2 = jnp.concatenate([hp2, jnp.zeros((1, P), jnp.uint32)], axis=0)
S2, L2 = plan2.num_subruns, plan2.sub_len
v2 = rows2[plan2.gather_idx].reshape(S2, L2, P)
u2 = jax.lax.bitcast_convert_type(v2, jnp.uint16).reshape(S2, L2, M)
vh2 = jnp.max(u2, axis=1)
agg2 = jax.ops.segment_max(vh2, plan2.sub_dst, num_segments=N2)
got = jnp.maximum(hll2, agg2.astype(jnp.int8))
log(f"correct D: {bool(jnp.array_equal(got, plan2.reduce(hll2, 'max')))}")


# ---------------------------------------------------------------- timing
@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


def timed(fn, *args, iters=5):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


hpack = pack_hll(hll)
jax.block_until_ready(hpack)
t0 = timed(trivial, mh)
log(f"trivial roundtrip: {t0*1e3:.1f}ms")


def report(name, fn, *args):
    t = timed(fn, *args) - t0
    log(f"{name:<24}: {t*1e3:8.2f}ms  {E/t/1e6:7.1f}M e/s")


report("gather packed u32[128]", jax.jit(
    lambda h: stage_gather(h).sum(dtype=jnp.uint32).astype(jnp.float32)),
    hpack)
report("gather+u16tree", jax.jit(
    lambda h: stage_gather_tree(h).sum(dtype=jnp.uint32).astype(jnp.float32)),
    hpack)
report("hll D full", jax.jit(
    lambda h, o: hll_d_only(h, o).sum(dtype=jnp.int32).astype(jnp.float32)),
    hpack, hll)
report("hll baseline full", jax.jit(
    lambda o: plan.reduce(o, "max").sum(dtype=jnp.int32).astype(jnp.float32)),
    hll)
report("hop D (mh + hll-packed)", jax.jit(
    lambda m, h, o: (lambda a, b: a.sum(dtype=jnp.uint32).astype(jnp.float32)
                     + b.sum(dtype=jnp.int32).astype(jnp.float32))
    (*hop_d(m, h, o))), mh, hpack, hll)
log("done probe_wide2")
