"""Decompose the one-shot (bench.py-scale) hop: where do the cycles beyond
the two gathers go?  Variants: gather-only, +slot-reduce, +segment, full
reduce, and both-sketch combinations — to size the remaining headroom
against the gathers-alone bound (~145M e/s claimed in STATUS.md).
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


log(f"=== probe_oneshot {time.strftime('%H:%M:%S')} "
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
log(f"plan: S={S} L={L} slots={S*L/1e6:.2f}M (E={E/1e6:.1f}M)")

mh = jax.random.bits(jax.random.PRNGKey(0), (N, P), jnp.uint32)
hll = (jax.random.bits(jax.random.PRNGKey(1), (N, M), jnp.uint32)
       % 60).astype(jnp.int8)
gidx = plan.gather_idx
sdst = plan.sub_dst
jax.block_until_ready((mh, hll, gidx, sdst))
IDENT = jnp.uint32(0xFFFFFFFF)


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


@jax.jit
def g_mh(x):
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)
    return rows[gidx].sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def g_both(x, h):
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)
    hrows = jnp.concatenate([h, jnp.zeros((1, M), jnp.int8)], axis=0)
    return (rows[gidx].sum(dtype=jnp.uint32).astype(jnp.float32)
            + hrows[gidx].astype(jnp.int32).sum().astype(jnp.float32))


@jax.jit
def gs_mh(x):
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)
    v = rows[gidx].reshape(S, L, P).min(axis=1)
    return v.sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def gss_mh(x):
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)
    v = rows[gidx].reshape(S, L, P).min(axis=1)
    agg = jax.ops.segment_min(v, sdst, num_segments=N)
    return agg.sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def full_mh(x):
    return plan.reduce(x, "min").sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def full_hll(h):
    return plan.reduce(h, "max").sum(dtype=jnp.int32).astype(jnp.float32)


@jax.jit
def full_both(x, h):
    a = plan.reduce(x, "min")
    b = plan.reduce(h, "max")
    return (a.sum(dtype=jnp.uint32).astype(jnp.float32)
            + b.sum(dtype=jnp.int32).astype(jnp.float32))


def timed(fn, *args, reps=5):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


t_triv = timed(trivial, mh)
log(f"trivial roundtrip: {t_triv*1e3:.1f}ms")
for name, fn, args in [
        ("gather mh only", g_mh, (mh,)),
        ("gather mh+hll", g_both, (mh, hll)),
        ("mh gather+slotreduce", gs_mh, (mh,)),
        ("mh gather+slot+segment", gss_mh, (mh,)),
        ("mh full reduce", full_mh, (mh,)),
        ("hll full reduce", full_hll, (hll,)),
        ("BOTH full (bench hop)", full_both, (mh, hll))]:
    t = timed(fn, *args) - t_triv
    log(f"{name:24s}: {t*1e3:7.2f}ms  {E/t/1e6:6.1f}M e/s")
log("done probe_oneshot")
