"""Does a bf16-row SpMM gather beat f32 on the plan path?

The plan SpMM at d=128 is gather-rate-bound (BENCH hbm_fraction ~0.4
against stream BW; the binding constraint is the gather engine).  bf16
rows halve the dominant [S*L, d] gather traffic; accumulation precision
can be preserved by upcasting AFTER the gather (fuses into the consumer).
Caveat from round-2: 16-bit layouts gathered SLOWER per byte than 8/32-bit
(u16 [N,256] table: 140GB/s vs 226GB/s) — so this needs measuring, not
assuming.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
import jax.numpy as jnp
import numpy as np

OUT = open(os.path.join(REPO, "tools", "perf_out.txt"), "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_spmm_bf16 {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N, DEG, D = 200_000, 16, 128
E = N * DEG
rng = np.random.default_rng(0)
ei = np.stack([rng.integers(0, N, E, dtype=np.int32),
               rng.integers(0, N, E, dtype=np.int32)])
plan = make_plan(ei, N)
w = rng.random(E).astype(np.float32)
wslots = plan.stage_edge_data(w)
x32 = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
x16 = x32.astype(jnp.bfloat16)
jax.block_until_ready((wslots, x16))


def timed(name, fn, *args, iters=5):
    float(fn(*args))
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    log(f"{name:28s} best {min(ts)*1e3:8.2f} ms")
    return min(ts)


trivial = jax.jit(lambda a: a[0, 0].astype(jnp.float32))
t0 = timed("trivial", trivial, x32)


@jax.jit
def spmm_f32(x, ws):
    return plan.reduce(x, "add", edge_data_slots=ws).sum()


@jax.jit
def spmm_bf16_gather(x, ws):
    # gather bf16 rows; upcast to f32 inside the slot pipeline so the
    # weight multiply + tree add + segment add accumulate in f32
    S, L = plan.num_subruns, plan.sub_len
    rows = jnp.concatenate([x, jnp.zeros((1, D), jnp.bfloat16)], axis=0)
    v = rows[plan.gather_idx].astype(jnp.float32)
    v = v * ws.reshape(S * L, 1)
    v = v.reshape(S, L, D).sum(axis=1)
    out = jax.ops.segment_sum(v, plan.sub_dst, num_segments=N,
                              indices_are_sorted=True)
    return out.sum()


@jax.jit
def spmm_bf16_all(x, ws):
    # fully bf16 path (accumulate bf16 too) — accuracy-lossy, upper bound
    S, L = plan.num_subruns, plan.sub_len
    rows = jnp.concatenate([x, jnp.zeros((1, D), jnp.bfloat16)], axis=0)
    v = rows[plan.gather_idx] * ws.reshape(S * L, 1).astype(jnp.bfloat16)
    v = v.reshape(S, L, D).sum(axis=1)
    out = jax.ops.segment_sum(v, plan.sub_dst, num_segments=N,
                              indices_are_sorted=True)
    return out.astype(jnp.float32).sum()


t_f32 = timed("plan spmm f32", spmm_f32, x32, wslots) - t0
t_g16 = timed("bf16 gather + f32 accum", spmm_bf16_gather, x16, wslots) - t0
t_a16 = timed("bf16 end-to-end", spmm_bf16_all, x16, wslots) - t0
log(f">> f32 {E/t_f32/1e6:.0f}M e/s | bf16-gather {E/t_g16/1e6:.0f}M e/s "
    f"({t_f32/t_g16:.2f}x) | bf16-all {E/t_a16/1e6:.0f}M e/s "
    f"({t_f32/t_a16:.2f}x)")
log("done probe_spmm_bf16")
