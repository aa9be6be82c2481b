"""Re-sweep SUB_LEN with the sorted-scatter hint (round 4).

The round-2 sweep picked L=16 when the segment reduce was expensive
(scatter-lowered).  With indices_are_sorted=True the reduce is much
cheaper, so smaller L — less slot padding, i.e. a smaller gather, the
dominant cost — may now win.  Also probes whether TWO 128-lane int8
gathers beat ONE 256-lane int8 gather (wide int8 rows span two (32,128)
tiles and measured 3.4x worse per byte in round 2).
"""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_sublen2 {time.strftime('%H:%M:%S')} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 200_000
E = N * 16
P, m = 128, 256
rng = np.random.default_rng(0)
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
ei = np.stack([src, dst])
mh = jnp.asarray(rng.integers(0, 2**32 - 1, (N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 56, (N, m)).astype(np.int8))


def timed(name, fn, *args, iters=5):
    float(fn(*args))
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    log(f"{name:28s} best {min(ts)*1e3:9.2f} ms")
    return min(ts)


trivial = jax.jit(lambda a: a[0, 0].astype(jnp.float32))
t0 = timed("trivial", trivial, mh)

for L in (4, 8, 16, 32):
    plan = make_plan(ei, N, sub_len=L)
    S = plan.num_subruns
    hop = jax.jit(lambda a, b, p=plan: (
        p.reduce(a, "min").sum(dtype=jnp.uint32).astype(jnp.float32)
        + p.reduce(b, "max").sum(dtype=jnp.int32).astype(jnp.float32)))
    t = timed(f"hop L={L} (slots {S*L/1e6:.2f}M)", hop, mh, hll) - t0
    log(f">> L={L}: {E/t/1e6:.1f} M e/s")

# split-hll gather: 2 x 128-lane int8 vs 1 x 256-lane int8 (pure gather)
plan = make_plan(ei, N, sub_len=16)
gidx = plan.gather_idx
hll_a = hll[:, :128]
hll_b = hll[:, 128:]


@jax.jit
def g_wide(h):
    rows = jnp.concatenate([h, jnp.zeros((1, m), jnp.int8)], axis=0)
    return rows[gidx].astype(jnp.int32).sum().astype(jnp.float32)


@jax.jit
def g_split(a, b):
    ra = jnp.concatenate([a, jnp.zeros((1, 128), jnp.int8)], axis=0)
    rb = jnp.concatenate([b, jnp.zeros((1, 128), jnp.int8)], axis=0)
    return (ra[gidx].astype(jnp.int32).sum()
            + rb[gidx].astype(jnp.int32).sum()).astype(jnp.float32)


tw = timed("hll gather 1x256 lanes", g_wide, hll) - t0
ts = timed("hll gather 2x128 lanes", g_split, hll_a, hll_b) - t0
log(f">> wide {tw*1e3:.1f}ms vs split {ts*1e3:.1f}ms "
    f"({'SPLIT WINS' if ts < tw else 'wide wins'})")
log("done probe_sublen2")
