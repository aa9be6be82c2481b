"""sub_len sweep for the axis-reduce padded-tree plan (net timing)."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_sublen {time.strftime('%H:%M:%S')} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 200_000
E = N * 16
rng = np.random.default_rng(0)
ei = np.stack([rng.integers(0, N, E, dtype=np.int32),
               rng.integers(0, N, E, dtype=np.int32)])


@jax.jit
def gen(key):
    k1, k2 = jax.random.split(key)
    mh = jax.random.bits(k1, (N, 128), jnp.uint32)
    hll = jax.random.randint(k2, (N, 256), 0, 40, jnp.int8)
    return mh, hll


mhA, hllA = gen(jax.random.PRNGKey(0))
mhB, hllB = gen(jax.random.PRNGKey(1))
jax.block_until_ready((mhA, hllA, mhB, hllB))


def timed(fn, args_list, iters=6):
    float(fn(*args_list[0]))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args_list[i % len(args_list)]))
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


t0 = timed(trivial, [(mhA,), (hllA,)])
log(f"trivial {t0*1e3:.1f} ms")

for L in (4, 8, 16, 32):
    plan = make_plan(ei, N, sub_len=L)
    S = plan.num_subruns

    @jax.jit
    def hop(mh, hll, plan=plan):
        a = plan.reduce(mh, "min")
        b = plan.reduce(hll, "max")
        return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
            b.sum(dtype=jnp.int32).astype(jnp.float32)

    t = timed(hop, [(mhA, hllA), (mhB, hllB)]) - t0
    log(f"L={L:2d} slots={S*L/1e6:.2f}M subruns={S/1e6:.2f}M "
        f"-> {t*1e3:6.1f} ms  {E/t/1e6:5.1f} M e/s")
log("done probe_sublen")
