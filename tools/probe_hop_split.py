"""Does splitting the fused hop into two programs (minhash reduce | HLL
reduce) beat the one-jit fused hop?

Round-2 measured the two slot gathers at 8.8ms (mh) + 13.2ms (hll) as
separate programs but 35.4ms combined in one program (README roofline
table) — suggesting XLA serialises them AND adds overhead, so two
back-to-back dispatches might beat the fused 38-40ms hop.

RESULT (2026-08-19, interleaved A/B, one host read per sample): **no
win** — fused 36.3ms vs split 36.5ms, and the one-at-a-time program
times (14.6 + 23.2 = 37.8ms) sum to the fused time exactly.  The round-2
"separate gathers are cheaper" readings were a pipelining artifact of
timing small programs one at a time (execution hides under the previous
sample's readback).  Fusion costs nothing; the hop stays one program.
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


N, AVG, P, M = 200_000, 16, 128, 256
E = N * AVG
rng = np.random.default_rng(0)
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)

from subgraph_sketching_tpu.ops.segment_scan import make_plan

plan = make_plan(np.stack([src, dst]), N)
mh = jnp.asarray(rng.integers(0, 2**32 - 1, (N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 56, (N, M)).astype(np.int8))
log(f"=== probe_hop_split {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} E={E/1e6:.1f}M")


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


@jax.jit
def fused(mh, hll):
    a = plan.reduce(mh, "min")
    b = plan.reduce(hll, "max")
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        b.sum(dtype=jnp.int32).astype(jnp.float32)


@jax.jit
def mh_only(mh):
    return plan.reduce(mh, "min").sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def hll_only(hll):
    return plan.reduce(hll, "max").sum(dtype=jnp.int32).astype(jnp.float32)


def timed(sample, iters=6, warmup=2):
    for _ in range(warmup):
        sample()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sample()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def split_sample():
    # two async dispatches, ONE host read: programs execute back-to-back
    # in stream order, so reading b waits for a too — one roundtrip total,
    # exactly like the fused sample
    mh_only(mh)
    return float(hll_only(hll))


# interleaved A/B in one process so relay drift cancels
t_triv = timed(lambda: float(trivial(mh)))
rows = []
for _ in range(3):
    rows.append((timed(lambda: float(fused(mh, hll))) - t_triv,
                 timed(split_sample) - t_triv))
t_fused = min(r[0] for r in rows)
t_split = min(r[1] for r in rows)
log(f"trivial roundtrip {t_triv*1e3:.1f}ms")
log(f"fused hop     : {t_fused*1e3:.1f}ms -> {E/t_fused/1e6:.1f}M e/s")
log(f"split 2-prog  : {t_split*1e3:.1f}ms -> {E/max(t_split,1e-9)/1e6:.1f}M e/s")
for name, fn, arg in (("mh_only", mh_only, mh), ("hll_only", hll_only, hll)):
    t = timed(lambda: float(fn(arg))) - t_triv
    log(f"{name:14s}: {t*1e3:.1f}ms -> {E/t/1e6:.1f}M e/s")
