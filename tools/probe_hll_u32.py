"""Does gathering HLL registers as bitcast [N,64]u32 rows beat the native
[N,256]i8 row gather inside the hop kernel?  (net timing)"""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_hll_u32 {time.strftime('%H:%M:%S')} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 200_000
E = N * 16
rng = np.random.default_rng(0)
plan = make_plan(np.stack([rng.integers(0, N, E, dtype=np.int32),
                           rng.integers(0, N, E, dtype=np.int32)]), N)
S, L = plan.num_subruns, plan.sub_len
gi = plan.gather_idx
sd = plan.sub_dst


@jax.jit
def gen(key):
    k1, k2 = jax.random.split(key)
    mh = jax.random.bits(k1, (N, 128), jnp.uint32)
    hll = jax.random.randint(k2, (N, 256), 0, 40, jnp.int8)
    return mh, hll


mhA, hllA = gen(jax.random.PRNGKey(0))
mhB, hllB = gen(jax.random.PRNGKey(1))
jax.block_until_ready((mhA, hllA, mhB, hllB))


def timed(name, fn, args_list, iters=6):
    v = float(fn(*args_list[0]))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args_list[i % len(args_list)]))
        ts.append(time.perf_counter() - t0)
    log(f"{name:30s} best {min(ts)*1e3:9.2f} ms (v={v:.6g})")
    return min(ts)


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


def scalar2(a, b):
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        b.sum(dtype=jnp.int32).astype(jnp.float32)


@jax.jit
def hop_prod(mh, hll):  # production: both arrays native dtype
    return scalar2(plan.reduce(mh, "min"), plan.reduce(hll, "max"))


@jax.jit
def hop_u32hll(mh, hll):
    # mh path identical to production
    rows = jnp.concatenate(
        [mh, jnp.full((1, 128), 0xFFFFFFFF, jnp.uint32)], axis=0)
    vm = jnp.min(rows[gi].reshape(S, L, 128), axis=1)
    am = jax.ops.segment_min(vm, sd, num_segments=N)
    out_m = jnp.minimum(mh, am)
    # hll gathered as bitcast u32 rows, reduced as i8 after bitcast back
    hp = jax.lax.bitcast_convert_type(hll.reshape(N, 64, 4), jnp.uint32)
    hrows = jnp.concatenate([hp, jnp.zeros((1, 64), jnp.uint32)], axis=0)
    g = hrows[gi]                                     # [S*L, 64] u32
    g8 = jax.lax.bitcast_convert_type(g, jnp.int8).reshape(S, L, 256)
    vh = jnp.max(g8, axis=1)
    ah = jax.ops.segment_max(vh, sd, num_segments=N)
    out_h = jnp.maximum(hll, ah)
    return scalar2(out_m, out_h)


variants = [(mhA, hllA), (mhB, hllB)]
t0 = timed("trivial", trivial, [(mhA,), (mhB,)])
t_p = timed("hop production", hop_prod, variants) - t0
t_u = timed("hop u32-gathered hll", hop_u32hll, variants) - t0
log(f">> net: prod {t_p*1e3:.1f}ms ({E/t_p/1e6:.0f}M e/s), "
    f"u32hll {t_u*1e3:.1f}ms ({E/t_u/1e6:.0f}M e/s)")
# correctness
a = np.asarray(plan.reduce(hllA, "max"))


@jax.jit
def u32_path(hll):
    hp = jax.lax.bitcast_convert_type(hll.reshape(N, 64, 4), jnp.uint32)
    hrows = jnp.concatenate([hp, jnp.zeros((1, 64), jnp.uint32)], axis=0)
    g8 = jax.lax.bitcast_convert_type(hrows[gi], jnp.int8).reshape(S, L, 256)
    ah = jax.ops.segment_max(jnp.max(g8, axis=1), sd, num_segments=N)
    return jnp.maximum(hll, ah)


b = np.asarray(u32_path(hllA))
log(f"u32 path equal: {np.array_equal(a, b)}")
log("done probe_hll_u32")
