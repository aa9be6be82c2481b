"""Attack the hop's remaining gather inefficiency (probe_oneshot data):
the int8 [N,256] HLL gather costs 17.6ms vs 10.5ms for the u32 [N,128]
minhash gather (438M rows/s, 226GB/s).  Two untested layouts:

  B  hll-as-u16   : HLL registers ride a uint16 [N,256] table (512B rows,
                    (16,128) tiles — same physical row bytes as the minhash
                    row).  Plain u16 max tree + segment_max, astype back.
  C  combined-256 : ONE u32 [N,256] gather per hop — lanes 0..127 minhash,
                    lanes 128..255 the HLL registers packed 2-per-lane as
                    u16 pairs.  Halves the gather descriptor count; the
                    256-lane row is exactly 2 (8,128) vregs, no pad waste.
                    HLL half is bitcast to u16 after the gather (native max,
                    no SWAR — the SWAR byte-max tree is what sank the old
                    packed-u32 variant, probe_hllpack).

All variants are exact-equality-checked against plan.reduce at small scale.
Timing: host-read-net methodology (see bench.py) at bench scale.
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


log(f"=== probe_wide {time.strftime('%H:%M:%S')} "
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

mh = jnp.asarray(rng.integers(0, 2**32 - 1, (N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 56, (N, M)).astype(np.int8))
gidx = plan.gather_idx
sdst = plan.sub_dst
jax.block_until_ready((mh, hll, gidx, sdst))


# ---------------------------------------------------------------- variants
def hop_baseline(mh, hll):
    a = plan.reduce(mh, "min")
    b = plan.reduce(hll, "max")
    return a, b


def hop_hll_u16(mh, hll):
    a = plan.reduce(mh, "min")
    h16 = hll.astype(jnp.uint16)
    b16 = plan.reduce(h16, "max")
    return a, b16.astype(jnp.int8)


def _combined_table(mh, hll):
    h16 = hll.astype(jnp.uint16).reshape(N, M // 2, 2)
    hpack = jax.lax.bitcast_convert_type(h16, jnp.uint32)     # [N, 128]
    return jnp.concatenate([mh, hpack], axis=1)               # [N, 256]


def hop_combined(mh, hll):
    comb = _combined_table(mh, hll)
    # identity row: min-identity for mh lanes, 0 (max identity, regs >= 0)
    ident = jnp.concatenate([
        jnp.full((1, P), 0xFFFFFFFF, jnp.uint32),
        jnp.zeros((1, M // 2), jnp.uint32)], axis=1)
    rows = jnp.concatenate([comb, ident], axis=0)
    v = rows[gidx].reshape(S, L, P + M // 2)
    vm = jnp.min(v[:, :, :P], axis=1)                         # [S, P]
    vh = jax.lax.bitcast_convert_type(v[:, :, P:], jnp.uint16)
    vh = jnp.max(vh.reshape(S, L, M), axis=1)                 # [S, M] u16
    agg_m = jax.ops.segment_min(vm, sdst, num_segments=N)
    agg_h = jax.ops.segment_max(vh, sdst, num_segments=N)
    out_m = jnp.minimum(mh, agg_m)
    out_h = jnp.maximum(hll, agg_h.astype(jnp.int8))
    return out_m, out_h


# ------------------------------------------------------- correctness (small)
N2, E2 = 2000, 16000
src2 = rng.integers(0, N2, E2, dtype=np.int32)
dst2 = rng.integers(0, N2, E2, dtype=np.int32)
plan2 = make_plan(np.stack([src2, dst2]), N2)
mh2 = jnp.asarray(rng.integers(0, 2**32 - 1, (N2, P), dtype=np.uint32))
hll2 = jnp.asarray(rng.integers(0, 56, (N2, M)).astype(np.int8))
ref_m = plan2.reduce(mh2, "min")
ref_h = plan2.reduce(hll2, "max")

b16 = plan2.reduce(hll2.astype(jnp.uint16), "max").astype(jnp.int8)
log(f"correct hll-u16: {bool(jnp.array_equal(b16, ref_h))}")

S2, L2 = plan2.num_subruns, plan2.sub_len
comb2 = jnp.concatenate([
    mh2, jax.lax.bitcast_convert_type(
        hll2.astype(jnp.uint16).reshape(N2, M // 2, 2), jnp.uint32)], axis=1)
ident2 = jnp.concatenate([jnp.full((1, P), 0xFFFFFFFF, jnp.uint32),
                          jnp.zeros((1, M // 2), jnp.uint32)], axis=1)
rows2 = jnp.concatenate([comb2, ident2], axis=0)
v2 = rows2[plan2.gather_idx].reshape(S2, L2, P + M // 2)
vm2 = jnp.min(v2[:, :, :P], axis=1)
vh2 = jnp.max(jax.lax.bitcast_convert_type(
    v2[:, :, P:], jnp.uint16).reshape(S2, L2, M), axis=1)
cm = jnp.minimum(mh2, jax.ops.segment_min(vm2, plan2.sub_dst, num_segments=N2))
ch = jnp.maximum(hll2, jax.ops.segment_max(
    vh2, plan2.sub_dst, num_segments=N2).astype(jnp.int8))
log(f"correct combined: {bool(jnp.array_equal(cm, ref_m))} "
    f"{bool(jnp.array_equal(ch, ref_h))}")


# ------------------------------------------------------------------ timing
@jax.jit
def trivial(mh):
    return mh[0, 0].astype(jnp.float32)


def scalarize(fn):
    @jax.jit
    def g(mh, hll):
        a, b = fn(mh, hll)
        return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
            b.sum(dtype=jnp.int32).astype(jnp.float32)
    return g


def timed(fn, *args, iters=5):
    for _ in range(2):
        float(fn(*args))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


t0 = timed(trivial, mh)
log(f"trivial roundtrip: {t0*1e3:.1f}ms")


def report(name, fn):
    t = timed(scalarize(fn), mh, hll) - t0
    log(f"{name:<24}: {t*1e3:8.2f}ms  {E/t/1e6:7.1f}M e/s")


# raw gather rates for the new layouts
h16_tab = hll.astype(jnp.uint16)
comb_tab = _combined_table(mh, hll)
jax.block_until_ready((h16_tab, comb_tab))


@jax.jit
def g_u16(t):
    return t[gidx].sum(dtype=jnp.uint32).astype(jnp.float32)


@jax.jit
def g_comb(t):
    return t[gidx].sum(dtype=jnp.uint32).astype(jnp.float32)


tg16 = timed(g_u16, h16_tab) - t0
log(f"gather u16 [S,256]       : {tg16*1e3:8.2f}ms  "
    f"({S*L/tg16/1e6:.0f}M rows/s, {S*L*512/tg16/1e9:.0f}GB/s)")
tgc = timed(g_comb, comb_tab) - t0
log(f"gather u32 [S,256]       : {tgc*1e3:8.2f}ms  "
    f"({S*L/tgc/1e6:.0f}M rows/s, {S*L*1024/tgc/1e9:.0f}GB/s)")

report("hop baseline", hop_baseline)
report("hop hll-u16", hop_hll_u16)
report("hop combined-256", hop_combined)
log("done probe_wide")
