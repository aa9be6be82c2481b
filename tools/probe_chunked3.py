"""Where does the chunked citation2 hop (mh reduce + hll reduce) spend its
1.48s?  probe_chunked showed the mh half alone is 687ms at its gather floor.
Measure the HLL half in three layouts and a fused mh+hll single-gather
variant (chunked reduce_sketches candidate):

  a) hll int8 [N, 256] chunked reduce (the current hop's second half)
  b) hll packed as uint32 [N, 64] chunked reduce + SWAR byte-max
  c) combined mh(128 u32) + hll-packed(64 u32) = 192-lane single gather

If (c) ~= the mh-only floor (687ms), the hop drops from 1.48s to ~0.75s.
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


log(f"=== probe_chunked3 {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 2_927_963
E = 30_561_187
MAX_SLOTS = 4 << 20
P = 128          # minhash lanes
M = 256          # hll registers (int8)

rng = np.random.default_rng(0)
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
t0 = time.perf_counter()
base = make_plan(np.stack([src, dst]), N)
ck = base.chunk(MAX_SLOTS)
log(f"plan: {time.perf_counter()-t0:.1f}s chunks={ck.num_chunks}")
del src, dst

L = ck.sub_len
C = ck.num_chunks
R = ck.window
pc = ck.per_chunk

key = jax.random.PRNGKey(0)
mh = jax.random.bits(key, (N, P), jnp.uint32)
hll = (jax.random.bits(jax.random.PRNGKey(1), (N, M), jnp.uint32)
       % 60).astype(jnp.int8)
gather_chunks = ck.gather_chunks
sub_local = ck.sub_local
lo = ck.lo
jax.block_until_ready((mh, hll, gather_chunks, sub_local, lo))

HB = jnp.uint32(0x80808080)
LB = jnp.uint32(0x01010101)


def byte_max(a, b):
    t = (a | HB) - b
    mext = ((t >> 7) & LB) * jnp.uint32(0xFF)
    return (a & mext) | (b & ~mext)


@jax.jit
def trivial(x):
    return x[0, 0].astype(jnp.float32)


@jax.jit
def hll_int8(h):
    return ck.reduce(h, "max").sum(dtype=jnp.int32).astype(jnp.float32)


@jax.jit
def hll_packed(h):
    hp = jax.lax.bitcast_convert_type(h.reshape(N, M // 4, 4), jnp.uint32)
    rows = jnp.concatenate([hp, jnp.zeros((1, M // 4), jnp.uint32)], axis=0)
    out0 = jnp.zeros((N + R, M // 4), jnp.uint32)

    def body(out, chunk):
        gidx, slocal, l = chunk
        v = rows[gidx].reshape(pc, L, M // 4)
        half = L
        while half > 1:
            half //= 2
            v = byte_max(v[:, :half], v[:, half:2 * half])
        part = jax.ops.segment_max(v[:, 0], slocal, num_segments=R + 1)[:R]
        cur = jax.lax.dynamic_slice_in_dim(out, l, R, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            out, byte_max(cur, part), l, axis=0), None

    out, _ = jax.lax.scan(body, out0, (gather_chunks, sub_local, lo))
    out = byte_max(hp, out[:N])
    res = jax.lax.bitcast_convert_type(out, jnp.int8)
    return res.astype(jnp.int32).sum().astype(jnp.float32)


@jax.jit
def fused(m, h):
    hp = jax.lax.bitcast_convert_type(h.reshape(N, M // 4, 4), jnp.uint32)
    comb = jnp.concatenate([m, hp], axis=1)            # [N, 192] u32
    W = P + M // 4
    ident = jnp.concatenate([jnp.full((1, P), 0xFFFFFFFF, jnp.uint32),
                             jnp.zeros((1, M // 4), jnp.uint32)], axis=1)
    rows = jnp.concatenate([comb, ident], axis=0)
    out0 = jnp.concatenate([
        jnp.full((N + R, P), 0xFFFFFFFF, jnp.uint32),
        jnp.zeros((N + R, M // 4), jnp.uint32)], axis=1)

    def comb_op(a, b):
        return jnp.concatenate([jnp.minimum(a[..., :P], b[..., :P]),
                                byte_max(a[..., P:], b[..., P:])], axis=-1)

    def body(out, chunk):
        gidx, slocal, l = chunk
        v = rows[gidx].reshape(pc, L, W)
        half = L
        while half > 1:
            half //= 2
            v = comb_op(v[:, :half], v[:, half:2 * half])
        vm = jax.ops.segment_min(v[:, 0, :P], slocal,
                                 num_segments=R + 1)[:R]
        vh = jax.ops.segment_max(v[:, 0, P:], slocal,
                                 num_segments=R + 1)[:R]
        part = jnp.concatenate([vm, vh], axis=1)
        cur = jax.lax.dynamic_slice_in_dim(out, l, R, axis=0)
        return jax.lax.dynamic_update_slice_in_dim(
            out, comb_op(cur, part), l, axis=0), None

    out, _ = jax.lax.scan(body, out0, (gather_chunks, sub_local, lo))
    out = comb_op(comb, out[:N])
    om = out[:, :P]
    oh = jax.lax.bitcast_convert_type(out[:, P:], jnp.int8)
    return (om.sum(dtype=jnp.uint32).astype(jnp.float32)
            + oh.astype(jnp.int32).sum().astype(jnp.float32))


@jax.jit
def mh_only(m):
    return ck.reduce(m, "min").sum(dtype=jnp.uint32).astype(jnp.float32)


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
for name, fn, args in [
        ("mh-only chunked (floor)", mh_only, (mh,)),
        ("hll int8 [N,256] chunked", hll_int8, (hll,)),
        ("hll packed-u32 [N,64] SWAR", hll_packed, (hll,)),
        ("fused mh+hll 192-lane", fused, (mh, hll))]:
    try:
        t = timed(fn, *args) - t_triv
        log(f"{name:30s}: {t*1e3:7.1f}ms  {E/t/1e6:6.1f}M e/s")
    except Exception as ex:
        log(f"{name:30s}: FAILED {type(ex).__name__}: {str(ex)[:140]}")
log("done probe_chunked3")
