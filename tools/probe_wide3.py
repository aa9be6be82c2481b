"""Same-process A/B of the baseline hop vs hop D (HLL table packed as
u32[N,128], 2 regs per lane as u16 halves; bitcast to native u16 after the
gather).  probe_wide2 measured D at 110M e/s but against a different
trivial-roundtrip sample — this probe interleaves the two hops and re-times
the trivial program between them to bound relay drift.

Also times hop D2: like D but the hll STATE stays packed across hops (the
pack/unpack conversions move out of the hop), which is how build_hash_tables
would actually run it (unpack only for hll_count).
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


log(f"=== probe_wide3 {time.strftime('%H:%M:%S')} "
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


def pack_hll(h):
    h16 = h.astype(jnp.uint16).reshape(h.shape[0], M // 2, 2)
    return jax.lax.bitcast_convert_type(h16, jnp.uint32)


hpack = pack_hll(hll)
jax.block_until_ready((mh, hll, hpack, gidx, sdst))


@jax.jit
def hop_base(mh, hll):
    a = plan.reduce(mh, "min")
    b = plan.reduce(hll, "max")
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        b.sum(dtype=jnp.int32).astype(jnp.float32)


def _hll_packed_reduce(hpack):
    """out (packed) = elementwise-u16-max over closed neighbourhood."""
    rows = jnp.concatenate([hpack, jnp.zeros((1, P), jnp.uint32)], axis=0)
    v = rows[gidx].reshape(S, L, P)
    u = jax.lax.bitcast_convert_type(v, jnp.uint16).reshape(S, L, M)
    vh = jnp.max(u, axis=1)                                    # [S, M] u16
    agg = jax.ops.segment_max(vh, sdst, num_segments=N)        # [N, M] u16
    own = jax.lax.bitcast_convert_type(hpack, jnp.uint16).reshape(N, M)
    out = jnp.maximum(own, agg)
    return jax.lax.bitcast_convert_type(
        out.reshape(N, M // 2, 2), jnp.uint32)


@jax.jit
def hop_d(mh, hll):
    a = plan.reduce(mh, "min")
    out = _hll_packed_reduce(pack_hll(hll))
    b = jax.lax.bitcast_convert_type(out, jnp.uint16).reshape(N, M) \
        .astype(jnp.int8)
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        b.sum(dtype=jnp.int32).astype(jnp.float32)


@jax.jit
def hop_d2(mh, hpack):
    a = plan.reduce(mh, "min")
    out = _hll_packed_reduce(hpack)
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        out.sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


# correctness at full scale (one shot, vs baseline reduce)
got = jax.lax.bitcast_convert_type(
    _hll_packed_reduce(hpack), jnp.uint16).reshape(N, M).astype(jnp.int8)
log(f"correct D (bench scale): "
    f"{bool(jnp.array_equal(got, plan.reduce(hll, 'max')))}")


def timed(fn, *args, iters=7):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


for rep in range(2):
    t0 = timed(trivial, mh)
    tb = timed(hop_base, mh, hll) - t0
    td = timed(hop_d, mh, hll) - t0
    td2 = timed(hop_d2, mh, hpack) - t0
    log(f"rep{rep}: trivial {t0*1e3:.1f}ms | base {tb*1e3:.2f}ms "
        f"{E/tb/1e6:.1f}M | D {td*1e3:.2f}ms {E/td/1e6:.1f}M | "
        f"D2 {td2*1e3:.2f}ms {E/td2/1e6:.1f}M e/s")
log("done probe_wide3")
