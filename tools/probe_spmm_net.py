"""Net-of-roundtrip SpMM measurement (plan path vs XLA scatter path)."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_spmm_net {time.strftime('%H:%M:%S')} ===")

from subgraph_sketching_tpu.ops.graph_ops import spmm
from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 200_000
E = N * 16
D = 128
rng = np.random.default_rng(0)
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
w = rng.random(E).astype(np.float32)
plan = make_plan(np.stack([src, dst]), N)
wslots = plan.stage_edge_data(w)
ei = jnp.asarray(np.stack([src, dst]))
wj = jnp.asarray(w)


@jax.jit
def gen(key):
    return jax.random.normal(key, (N, D), jnp.float32)


xA = gen(jax.random.PRNGKey(0))
xB = gen(jax.random.PRNGKey(1))
jax.block_until_ready((xA, xB, wslots))


def timed(name, fn, args_list, iters=6):
    float(fn(*args_list[0]))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args_list[i % len(args_list)]))
        ts.append(time.perf_counter() - t0)
    log(f"{name:26s} best {min(ts)*1e3:9.2f} ms")
    return min(ts)


@jax.jit
def trivial(x):
    return x[0, 0]


@jax.jit
def spmm_plan(x):
    return plan.reduce(x, "add", edge_data_slots=wslots).sum()


@jax.jit
def spmm_scatter(x):
    return spmm(ei, wj, x, N).sum()


t0 = timed("trivial", trivial, [(xA,), (xB,)])
t_p = timed("spmm plan d=128", spmm_plan, [(xA,), (xB,)]) - t0
t_s = timed("spmm scatter d=128", spmm_scatter, [(xA,), (xB,)]) - t0
log(f">> net: plan {t_p*1e3:.1f}ms ({E/t_p/1e6:.0f}M e/s), "
    f"scatter {t_s*1e3:.1f}ms ({E/t_s/1e6:.0f}M e/s)")
log("done probe_spmm_net")
