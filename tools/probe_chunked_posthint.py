"""Refresh the chunk-streamed hop figure on the current tree (round 4).

README's 49.4M e/s chunked rate predates the sorted-scatter hint (the
chunked plan's per-chunk ``sub_local`` is sorted and got the same hint).
Measure one-shot vs chunked on the bench shape, net of roundtrip.
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


log(f"=== probe_chunked_posthint {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_auto_plan, make_plan

N, DEG, P, m = 200_000, 16, 128, 256
E = N * DEG
rng = np.random.default_rng(0)
ei = np.stack([rng.integers(0, N, E, dtype=np.int32),
               rng.integers(0, N, E, dtype=np.int32)])
mh = jnp.asarray(rng.integers(0, 2 ** 32 - 1, (N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 56, (N, m)).astype(np.int8))

one = make_plan(ei, N)
# force the chunked plan by capping slots below the one-shot size
chunked = make_auto_plan(ei, N, max_slots=one.num_subruns * one.sub_len // 4)
log(f"one-shot slots {one.num_subruns * one.sub_len/1e6:.2f}M; chunked type "
    f"{type(chunked).__name__} ({getattr(chunked, 'num_chunks', 1)} chunks)")


def timed(name, fn, *args, iters=5):
    float(fn(*args))
    float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    log(f"{name:22s} best {min(ts)*1e3:8.2f} ms")
    return min(ts)


trivial = jax.jit(lambda a: a[0, 0].astype(jnp.float32))
t0 = timed("trivial", trivial, mh)


def hop_fn(plan):
    @jax.jit
    def hop(a, b):
        return (plan.reduce(a, "min").sum(dtype=jnp.uint32)
                .astype(jnp.float32)
                + plan.reduce(b, "max").sum(dtype=jnp.int32)
                .astype(jnp.float32))
    return hop


t_one = timed("one-shot hop", hop_fn(one), mh, hll) - t0
t_chk = timed("chunked hop", hop_fn(chunked), mh, hll) - t0
log(f">> one-shot {E/t_one/1e6:.1f}M e/s | chunked {E/t_chk/1e6:.1f}M e/s "
    f"({t_chk/t_one:.2f}x one-shot time)")
log("done probe_chunked_posthint")
