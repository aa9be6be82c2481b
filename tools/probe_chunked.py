"""Decompose the chunked-hop cost at citation2 scale (minhash only).

The one-shot plan runs at ~130M slots/s; the chunked plan at ~33M slots/s.
Variants isolate where the 4x goes: gather, slot reduce, segment reduce,
accumulator dynamic-slice/update, and lax.scan itself vs an unrolled body.

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


log(f"=== probe_chunked {time.strftime('%H:%M:%S')} "
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

mh = jax.random.bits(jax.random.PRNGKey(0), (N, P), jnp.uint32)
gather_chunks = ck.gather_chunks          # [C, pc*L]
sub_local = ck.sub_local                  # [C, pc]
lo = ck.lo                                # [C]
jax.block_until_ready((mh, gather_chunks, sub_local, lo))
IDENT = jnp.uint32(0xFFFFFFFF)


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


@jax.jit
def full_chunked(x):
    return ck.reduce(x, "min").sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def scan_no_acc(x):
    """gather + slot reduce + segment reduce, scalar carry (no big
    accumulator, no dynamic slices)."""
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)

    def body(acc, chunk):
        gidx, slocal = chunk
        v = rows[gidx].reshape(pc, L, P)
        part = jax.ops.segment_min(jnp.min(v, axis=1), slocal,
                                   num_segments=R + 1)[:R]
        return acc + part.sum(dtype=jnp.uint32), None

    acc, _ = jax.lax.scan(body, jnp.uint32(0), (gather_chunks, sub_local))
    return acc.astype(jnp.float32)


@jax.jit
def scan_slotreduce(x):
    """gather + slot reduce only."""
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)

    def body(acc, gidx):
        v = rows[gidx].reshape(pc, L, P)
        return acc + jnp.min(v, axis=1).sum(dtype=jnp.uint32), None

    acc, _ = jax.lax.scan(body, jnp.uint32(0), gather_chunks)
    return acc.astype(jnp.float32)


@jax.jit
def scan_gather_only(x):
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)

    def body(acc, gidx):
        v = rows[gidx]
        return acc + v.sum(dtype=jnp.uint32), None

    acc, _ = jax.lax.scan(body, jnp.uint32(0), gather_chunks)
    return acc.astype(jnp.float32)


@jax.jit
def unrolled_no_acc(x):
    """same as scan_no_acc but a python loop -> XLA sees C independent
    fused bodies (no scan)."""
    rows = jnp.concatenate([x, jnp.full((1, P), IDENT, jnp.uint32)], axis=0)
    acc = jnp.uint32(0)
    for c in range(C):
        v = rows[gather_chunks[c]].reshape(pc, L, P)
        part = jax.ops.segment_min(jnp.min(v, axis=1), sub_local[c],
                                   num_segments=R + 1)[:R]
        acc = acc + part.sum(dtype=jnp.uint32)
    return acc.astype(jnp.float32)


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
slots = base.num_subruns * L
for name, fn in [("gather_only", scan_gather_only),
                 ("gather+slotreduce", scan_slotreduce),
                 ("gather+slot+segment (scalar acc)", scan_no_acc),
                 ("full chunked (current)", full_chunked),
                 ("unrolled gather+slot+segment", unrolled_no_acc)]:
    try:
        t = timed(fn, mh) - t_triv
        log(f"{name:36s}: {t*1e3:7.1f}ms  {slots/t/1e6:7.1f}M slots/s  "
            f"{E/t/1e6:6.1f}M e/s")
    except Exception as ex:
        log(f"{name:36s}: FAILED {type(ex).__name__}: {str(ex)[:120]}")
log("done probe_chunked")
