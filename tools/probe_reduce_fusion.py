"""Does a single jnp.min(axis=1) reduce fuse with the slot gather better
than the explicit binary slice-tree?  (net-of-roundtrip timing)"""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_reduce_fusion {time.strftime('%H:%M:%S')} ===")

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
    mh = jax.random.bits(k1, (N + 1, 128), jnp.uint32)
    hll = jax.random.randint(k2, (N + 1, 256), 0, 40, jnp.int8)
    # row N is the sentinel/identity row for the custom gather paths
    mh = mh.at[N].set(jnp.uint32(0xFFFFFFFF))
    hll = hll.at[N].set(jnp.int8(0))
    return mh, hll


mhA, hllA = gen(jax.random.PRNGKey(0))
mhB, hllB = gen(jax.random.PRNGKey(1))
jax.block_until_ready((mhA, hllA, mhB, hllB))


def timed(name, fn, args_list, iters=6):
    float(fn(*args_list[0]))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args_list[i % len(args_list)]))
        ts.append(time.perf_counter() - t0)
    log(f"{name:34s} best {min(ts)*1e3:9.2f} ms")
    return min(ts)


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


def scalar2(a, b):
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        b.sum(dtype=jnp.int32).astype(jnp.float32)


@jax.jit
def hop_tree(mh, hll):  # current production path (plan appends identity row)
    return scalar2(plan.reduce(mh[:N], "min"), plan.reduce(hll[:N], "max"))


def _post(vm, vh, mh, hll):
    am = jax.ops.segment_min(vm, sd, num_segments=N)
    ah = jax.ops.segment_max(vh, sd, num_segments=N)
    return scalar2(jnp.minimum(mh[:N], am), jnp.maximum(hll[:N], ah))


@jax.jit
def hop_axis_reduce(mh, hll):  # single reduce op over the slot axis
    vm = jnp.min(mh[gi].reshape(S, L, 128), axis=1)
    vh = jnp.max(hll[gi].reshape(S, L, 256), axis=1)
    return _post(vm, vh, mh, hll)


@jax.jit
def hop_axis_reduce_seq(mh, hll):  # reduce mh fully before touching hll
    vm = jnp.min(mh[gi].reshape(S, L, 128), axis=1)
    am = jax.ops.segment_min(vm, sd, num_segments=N)
    vh = jnp.max(hll[gi].reshape(S, L, 256), axis=1)
    ah = jax.ops.segment_max(vh, sd, num_segments=N)
    return scalar2(jnp.minimum(mh[:N], am), jnp.maximum(hll[:N], ah))


variants = [(mhA, hllA), (mhB, hllB)]
t0 = timed("trivial", trivial, [(mhA,), (hllA,)])
t_tree = timed("hop tree (production)", hop_tree, variants) - t0
t_axis = timed("hop jnp.min(axis=1)", hop_axis_reduce, variants) - t0
t_seq = timed("hop axis-reduce sequential", hop_axis_reduce_seq,
              variants) - t0
log(f">> net: tree {t_tree*1e3:.1f}ms ({E/t_tree/1e6:.0f}M e/s), "
    f"axis {t_axis*1e3:.1f}ms ({E/t_axis/1e6:.0f}M e/s), "
    f"seq {t_seq*1e3:.1f}ms ({E/t_seq/1e6:.0f}M e/s)")
log("done probe_reduce_fusion")
