"""Net-of-roundtrip gather component probe (corrects perf_probe's numbers,
which included the ~30ms tunnel dispatch roundtrip in every sample)."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_net {time.strftime('%H:%M:%S')} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 200_000
E = N * 16
rng = np.random.default_rng(0)
plan = make_plan(np.stack([rng.integers(0, N, E, dtype=np.int32),
                           rng.integers(0, N, E, dtype=np.int32)]), N)
S = plan.num_subruns * plan.sub_len
log(f"slots={S}")


@jax.jit
def gen(key):
    k1, k2 = jax.random.split(key)
    mh = jax.random.bits(k1, (N + 1, 128), jnp.uint32)
    hll = jax.random.randint(k2, (N + 1, 256), 0, 40, jnp.int8)
    return mh, hll


mh, hll = gen(jax.random.PRNGKey(0))
jax.block_until_ready((mh, hll))
gi = plan.gather_idx


def timed(name, fn, args_list, iters=6):
    float(fn(*args_list[0]))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args_list[i % len(args_list)]))
        ts.append(time.perf_counter() - t0)
    log(f"{name:28s} best {min(ts)*1e3:9.2f} ms")
    return min(ts)


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


t0 = timed("trivial", trivial, [(mh,), (hll,)])


@jax.jit
def gather_mh(mh):
    return mh[gi].sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def gather_hll(hll):
    return hll[gi].sum(dtype=jnp.int32).astype(jnp.float32)


@jax.jit
def gather_both(mh, hll):
    return mh[gi].sum(dtype=jnp.uint32).astype(jnp.float32) + \
        hll[gi].sum(dtype=jnp.int32).astype(jnp.float32)


variants_m = [(mh,), (mh[1:],)]
variants_h = [(hll,), (hll[1:],)]
t_m = timed("gather mh [S,128]u32", gather_mh, variants_m) - t0
t_h = timed("gather hll [S,256]i8", gather_hll, variants_h) - t0
t_b = timed("gather both", gather_both,
            [(mh, hll), (mh[1:], hll[1:])]) - t0
log(f">> net: mh {t_m*1e3:.1f}ms ({S/t_m/1e6:.0f}M rows/s), "
    f"hll {t_h*1e3:.1f}ms ({S/t_h/1e6:.0f}M rows/s), "
    f"both {t_b*1e3:.1f}ms")
log("done probe_net")
