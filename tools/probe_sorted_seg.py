"""Does indices_are_sorted=True help the hop's segment reduces on v5e?

The plan's sub_dst is non-decreasing by construction (dst-sorted slot
table), but reduce() never tells XLA.  Measures the full hop with and
without sorted-scatter hints, net-of-roundtrip.
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


log(f"=== probe_sorted_seg {time.strftime('%H:%M:%S')} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 200_000
E = N * 16
P, m = 128, 256
rng = np.random.default_rng(0)
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
plan = make_plan(np.stack([src, dst]), N)
mh = jnp.asarray(rng.integers(0, 2**32 - 1, (N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 56, (N, m)).astype(np.int8))
gidx = plan.gather_idx
sdst = plan.sub_dst
S, L = plan.num_subruns, plan.sub_len
log(f"S={S} L={L} slots={S*L} pad={S*L/E:.2f}x")


def hop(mhx, hllx, sorted_hint):
    rows = jnp.concatenate(
        [mhx, jnp.full((1, P), 0xFFFFFFFF, jnp.uint32)], axis=0)
    hrows = jnp.concatenate([hllx, jnp.full((1, m), -128, jnp.int8)], axis=0)
    vm = rows[gidx].reshape(S, L, P).min(axis=1)
    vh = hrows[gidx].reshape(S, L, m).max(axis=1)
    am = jax.ops.segment_min(vm, sdst, num_segments=N,
                             indices_are_sorted=sorted_hint)
    ah = jax.ops.segment_max(vh, sdst, num_segments=N,
                             indices_are_sorted=sorted_hint)
    am = jnp.minimum(mhx, am)
    ah = jnp.maximum(hllx, ah)
    return am.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        ah.sum(dtype=jnp.int32).astype(jnp.float32)


hop_f = jax.jit(lambda a, b: hop(a, b, False))
hop_t = jax.jit(lambda a, b: hop(a, b, True))
trivial = jax.jit(lambda a: a[0, 0].astype(jnp.float32))

# standalone segment reduce (the hop's residual part)
vm0 = jnp.asarray(rng.integers(0, 2**32 - 1, (S, P), dtype=np.uint32))
vh0 = jnp.asarray(rng.integers(0, 56, (S, m)).astype(np.int8))
seg_f = jax.jit(lambda a, b: (
    jax.ops.segment_min(a, sdst, num_segments=N).sum(dtype=jnp.uint32)
    .astype(jnp.float32)
    + jax.ops.segment_max(b, sdst, num_segments=N).sum(dtype=jnp.int32)
    .astype(jnp.float32)))
seg_t = jax.jit(lambda a, b: (
    jax.ops.segment_min(a, sdst, num_segments=N,
                        indices_are_sorted=True).sum(dtype=jnp.uint32)
    .astype(jnp.float32)
    + jax.ops.segment_max(b, sdst, num_segments=N,
                          indices_are_sorted=True).sum(dtype=jnp.int32)
    .astype(jnp.float32)))


def timed(name, fn, *args, iters=6):
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    log(f"{name:28s} best {min(ts)*1e3:9.2f} ms")
    return min(ts)


t0 = timed("trivial", trivial, mh)
th_f = timed("hop sorted=False", hop_f, mh, hll) - t0
th_t = timed("hop sorted=True", hop_t, mh, hll) - t0
ts_f = timed("segreduce sorted=False", seg_f, vm0, vh0) - t0
ts_t = timed("segreduce sorted=True", seg_t, vm0, vh0) - t0
log(f">> hop {th_f*1e3:.1f} vs {th_t*1e3:.1f} ms "
    f"({E/th_f/1e6:.1f} vs {E/th_t/1e6:.1f} M e/s); "
    f"segreduce {ts_f*1e3:.2f} vs {ts_t*1e3:.2f} ms")
log("done probe_sorted_seg")
