"""Candidate fix for the chunked-hop gap: emit per-chunk [R, W] partials
from the scan (no big carry, no dynamic slice/update), then combine all C
windows into [n, W] with ONE segment reduce over host-precomputed global
destination ids.  Compare against the current carry-and-update reduce.

Timing = forced host read of a derived scalar, net of the trivial-program
roundtrip (see bench.py docstring).
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


log(f"=== probe_chunked2 {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 2_927_963
E = 30_561_187
MAX_SLOTS = 4 << 20
P = 128

rng = np.random.default_rng(0)
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
t0 = time.perf_counter()
base = make_plan(np.stack([src, dst]), N)
ck = base.chunk(MAX_SLOTS)
log(f"plan: {time.perf_counter()-t0:.1f}s S={base.num_subruns} "
    f"chunks={ck.num_chunks} slots={base.num_subruns*base.sub_len/1e6:.1f}M")
del src, dst

L = ck.sub_len
C = ck.num_chunks
R = ck.window
pc = ck.per_chunk
n = N

mh = jax.random.bits(jax.random.PRNGKey(0), (N, P), jnp.uint32)
gather_chunks = ck.gather_chunks          # [C, pc*L]
sub_local = ck.sub_local                  # [C, pc]
lo_np = ck._lo_np                         # [C] host
# global destination id of window row (c, r): lo[c] + r; rows beyond the
# chunk's real window range still scatter identity values -> harmless for
# min/max, and for add the padded sub-runs already landed in dummy seg R.
glob = (lo_np[:, None].astype(np.int64)
        + np.arange(R, dtype=np.int64)[None, :])
glob = np.minimum(glob, n).astype(np.int32).reshape(-1)   # clamp pad -> n
glob_idx = jnp.asarray(glob)
jax.block_until_ready((mh, gather_chunks, sub_local, glob_idx))
IDENT = jnp.uint32(0xFFFFFFFF)


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


@jax.jit
def full_chunked_current(x):
    return ck.reduce(x, "min").sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def ys_scatter(x):
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)

    def body(_, chunk):
        gidx, slocal = chunk
        v = rows[gidx].reshape(pc, L, P)
        part = jax.ops.segment_min(jnp.min(v, axis=1), slocal,
                                   num_segments=R + 1)[:R]
        return None, part

    _, ys = jax.lax.scan(body, None, (gather_chunks, sub_local))  # [C, R, P]
    out = jax.ops.segment_min(ys.reshape(C * R, P), glob_idx,
                              num_segments=n + 1)[:n]
    out = jnp.minimum(x, out)
    return out.sum(dtype=jnp.uint32).astype(jnp.float32)


def timed(fn, *args, reps=3):
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

def _ys_scatter_full(x):
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)

    def body(_, chunk):
        gidx, slocal = chunk
        v = rows[gidx].reshape(pc, L, P)
        part = jax.ops.segment_min(jnp.min(v, axis=1), slocal,
                                   num_segments=R + 1)[:R]
        return None, part

    _, ys = jax.lax.scan(body, None, (gather_chunks, sub_local))
    out = jax.ops.segment_min(ys.reshape(C * R, P), glob_idx,
                              num_segments=n + 1)[:n]
    return jnp.minimum(x, out)


# correctness first
a = np.asarray(ck.reduce(mh, "min"))
b = np.asarray(jax.jit(_ys_scatter_full)(mh))
log(f"correctness ys_scatter == current: {np.array_equal(a, b)}")
del a, b

slots = base.num_subruns * L
for name, fn in [("full chunked (current)", full_chunked_current),
                 ("ys + one global scatter", ys_scatter)]:
    try:
        t = timed(fn, mh) - t_triv
        log(f"{name:36s}: {t*1e3:7.1f}ms  {slots/t/1e6:7.1f}M slots/s  "
            f"{E/t/1e6:6.1f}M e/s")
    except Exception as ex:
        log(f"{name:36s}: FAILED {type(ex).__name__}: {str(ex)[:120]}")
log("done probe_chunked2")
