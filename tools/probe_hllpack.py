"""Attack the one-shot hop's real bottleneck (probe_oneshot): the int8
[N, 256] HLL gather costs 17.6ms — 3.4x worse per byte than the u32
minhash gather (int8 tiles are (32,128): every 256-lane row spans 2 tiles,
8KB read for 256B used).  Variants gather the registers packed 4-per-u32
lane ([N, 64], one (8,128) tile touch) and unpack at different stages:

  packed+SWAR  : SWAR byte-max tree over the slot axis, bitcast at
                 sub-run granularity, int8 segment_max (reduce_sketches'
                 hll half, standalone)
  packed+bitcast: bitcast the whole gathered block to int8 and reuse the
                 plain slot-reduce (XLA chooses the relayout)

Both must be bit-equal to plan.reduce(hll, 'max').
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


log(f"=== probe_hllpack {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N = 200_000
E = N * 16
M = 256

rng = np.random.default_rng(0)
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
plan = make_plan(np.stack([src, dst]), N)
S, L = plan.num_subruns, plan.sub_len

hll = (jax.random.bits(jax.random.PRNGKey(1), (N, M), jnp.uint32)
       % 60).astype(jnp.int8)
gidx = plan.gather_idx
sdst = plan.sub_dst
jax.block_until_ready((hll, gidx, sdst))

# small-scale copies for the correctness checks (full-[N,M] outputs at
# bench scale trip a pathological XLA layout choice; timing below uses
# scalarized outputs)
N2, E2 = 2000, 16000
plan2 = make_plan(np.stack([rng.integers(0, N2, E2, dtype=np.int32),
                            rng.integers(0, N2, E2, dtype=np.int32)]), N2)
hll2 = (jax.random.bits(jax.random.PRNGKey(2), (N2, M), jnp.uint32)
        % 60).astype(jnp.int8)

HB = jnp.uint32(0x80808080)
LB = jnp.uint32(0x01010101)


def byte_max(a, b):
    t = (a | HB) - b
    mext = ((t >> 7) & LB) * jnp.uint32(0xFF)
    return (a & mext) | (b & ~mext)


def _pack(h):
    return jax.lax.bitcast_convert_type(h.reshape(-1, M // 4, 4), jnp.uint32)


@jax.jit
def trivial(h):
    return h[0, 0].astype(jnp.float32)


def make_baseline(p):
    def f(h):
        return p.reduce(h, "max")
    return f


def make_packed_swar(p):
    nseg = p.num_segments

    def f(h):
        hp = _pack(h)                                    # [n, 64] u32
        rows = jnp.concatenate([hp, jnp.zeros((1, M // 4), jnp.uint32)],
                               axis=0)
        v = rows[p.gather_idx].reshape(p.num_subruns, p.sub_len, M // 4)
        half = p.sub_len
        while half > 1:
            half //= 2
            v = byte_max(v[:, :half], v[:, half:2 * half])
        sub = jax.lax.bitcast_convert_type(v[:, 0], jnp.int8).reshape(
            p.num_subruns, M)
        agg = jax.ops.segment_max(sub, p.sub_dst, num_segments=nseg)
        return jnp.maximum(h, agg)
    return f


def make_packed_gather_only(p):
    def f(h):
        hp = _pack(h)
        rows = jnp.concatenate([hp, jnp.zeros((1, M // 4), jnp.uint32)],
                               axis=0)
        return rows[p.gather_idx].sum(dtype=jnp.uint32).astype(jnp.float32)
    return f


def scalarize(fn):
    """Timing wrapper: forced host read of a derived scalar (the axon
    relay's block_until_ready is unreliable — see bench.py docstring)."""
    @jax.jit
    def f(h):
        return fn(h).astype(jnp.int32).sum().astype(jnp.float32)
    return f


def timed(fn, *args, reps=5):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


# correctness at small scale
ref2 = np.asarray(jax.jit(make_baseline(plan2))(hll2))
got2 = np.asarray(jax.jit(make_packed_swar(plan2))(hll2))
log(f"correct packed+SWAR (small): {np.array_equal(got2, ref2)}")

t_triv = timed(trivial, hll)
log(f"trivial roundtrip: {t_triv*1e3:.1f}ms")
for name, fn in [("hll baseline reduce", scalarize(make_baseline(plan))),
                 ("hll packed+SWAR", scalarize(make_packed_swar(plan))),
                 ("hll packed gather only",
                  jax.jit(make_packed_gather_only(plan)))]:
    t = timed(fn, hll) - t_triv
    log(f"{name:24s}: {t*1e3:7.2f}ms  {E/t/1e6:6.1f}M e/s")
log("done probe_hllpack")
