"""Airtight timing of subgraph_features on the real chip.

Chains each iteration's links on the previous iteration's output (a data
dependency XLA cannot elide) and ends with a host read, so asynchronous
dispatch cannot fake completion.  Reports per-iteration time from the total.
"""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from subgraph_sketching_tpu.ops.segment_scan import make_plan
from subgraph_sketching_tpu.sketch.elph import (
    build_hash_tables, initialise_sketches, _subgraph_features_jit)
from subgraph_sketching_tpu.sketch.params import SketchParams

N = 200_000
E = N * 16
B = 1 << 18
K_ITERS = 20

rng = np.random.default_rng(0)
params = SketchParams(max_hops=2, num_perm=128, hll_p=8)
edges = np.stack([rng.integers(0, N, E, dtype=np.int32),
                  rng.integers(0, N, E, dtype=np.int32)])
print("building plan + sketches...", flush=True)
plan = make_plan(edges, N)
mh0, hll0 = initialise_sketches(N, params)
sk = build_hash_tables(jnp.asarray(edges), N, params,
                       init=(jnp.asarray(mh0), jnp.asarray(hll0)), plan=plan)
sk = jax.tree.map(jax.block_until_ready, sk)
links0 = jnp.asarray(rng.integers(0, N, (B, 2), dtype=np.int32))


import functools


@functools.partial(jax.jit, static_argnames=("params",))
def step(links, acc, sk, params):
    feats = _subgraph_features_jit(links, sk, params)
    # derive next links from the output: forces a serial dependency chain
    shift = (feats[:, 0].astype(jnp.int32) & 0x3) [:, None]
    nxt = (links + 1 + shift) % N
    return nxt, acc + feats.sum()


print("warmup...", flush=True)
links, acc = step(links0, jnp.float32(0.0), sk, params)
jax.block_until_ready(acc)
links, acc = step(links, acc, sk, params)
jax.block_until_ready(acc)

t0 = time.perf_counter()
links, acc = links0, jnp.float32(0.0)
for _ in range(K_ITERS):
    links, acc = step(links, acc, sk, params)
acc_host = float(acc)  # host read: everything above must have completed
dt = (time.perf_counter() - t0) / K_ITERS
print(f"acc={acc_host:.6g}", flush=True)
print(f"per-iter: {dt*1e3:.2f} ms -> {B/dt/1e6:.2f} M links/s", flush=True)

# control: single call with block_until_ready (the possibly-lying method)
t0 = time.perf_counter()
out = _subgraph_features_jit(links0, sk, params)
jax.block_until_ready(out)
print(f"single block_until_ready: {(time.perf_counter()-t0)*1e3:.2f} ms",
      flush=True)
