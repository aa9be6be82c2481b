"""Consolidated round-2 perf measurements on the real chip.

Timing methodology: every call ends in float(<scalar derived from full
output>) — a host read that cannot complete before the computation does
(the tunnel's block_until_ready returns early for some programs, so
device-side timing is untrustworthy here).  The trivial-program roundtrip
is measured and subtracted.  Results are appended to tools/perf_out.txt.
"""
import sys
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== perf_round2 {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan
from subgraph_sketching_tpu.sketch.elph import subgraph_features
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches

N = 200_000
E = N * 16
B = 1 << 18
K, P, m = 2, 128, 256
rng = np.random.default_rng(0)

t0 = time.perf_counter()
mh3 = jnp.asarray(rng.integers(0, 2**32 - 1, (K + 1, N, P), dtype=np.uint32))
hll3 = jnp.asarray(rng.integers(0, 40, (K + 1, N, m)).astype(np.int8))
cards = jnp.asarray(rng.random((N, K), np.float32)) * 100
jax.block_until_ready((mh3, hll3))
log(f"upload sketches ({(mh3.nbytes + hll3.nbytes)/1e6:.0f}MB): "
    f"{time.perf_counter()-t0:.1f}s")

sk = Sketches(minhash=mh3, hll=hll3, cards=cards)
params = SketchParams(max_hops=K, num_perm=P, hll_p=8)
links = [jnp.asarray(rng.integers(0, N, (B, 2), dtype=np.int32))
         for _ in range(8)]
jax.block_until_ready(links)


def timed(name, fn, args_list, iters=8):
    t0 = time.perf_counter()
    float(fn(*args_list[0]))  # warm/compile
    log(f"  [{name} compile+first: {time.perf_counter()-t0:.1f}s]")
    ts = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    best, med = min(ts), sorted(ts)[len(ts) // 2]
    log(f"{name:24s} best {best*1e3:9.2f} ms  med {med*1e3:9.2f} ms")
    return best


@jax.jit
def trivial(l):
    return (l.sum(dtype=jnp.int32) & 0xFF).astype(jnp.float32)


t_triv = timed("trivial-roundtrip", trivial, [(l,) for l in links])


@jax.jit
def feats_scalar(l, sk):
    return subgraph_features(l, sk, params).sum()


t_feat = timed("features B=262k", feats_scalar, [(l, sk) for l in links])
net = t_feat - t_triv
log(f">> features net: {net*1e3:.2f} ms -> {B/net/1e6:.2f} M links/s")

# --- sketch propagation (the bench.py kernel), host-read timed ---
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
t0 = time.perf_counter()
plan = make_plan(np.stack([src, dst]), N)
log(f"plan build (host): {time.perf_counter()-t0:.1f}s")
mh0 = mh3[0]
hll0 = hll3[0]


@jax.jit
def one_hop_scalar(mh, hll):
    a = plan.reduce(mh, "min")
    b = plan.reduce(hll, "max")
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        b.sum(dtype=jnp.int32).astype(jnp.float32)


mh_variants = [(mh3[i % 3 % 2], hll3[i % 3 % 2]) for i in range(4)]
t_prop = timed("sketch-prop 3.2M e", one_hop_scalar, mh_variants)
net_p = t_prop - t_triv
log(f">> sketch-prop net: {net_p*1e3:.2f} ms -> {E/net_p/1e6:.2f} M edges/s")

# --- chunked (bounded-memory) propagation overhead ---
ck = plan.chunk(1 << 20)


@jax.jit
def one_hop_chunked(mh, hll):
    a = ck.reduce(mh, "min")
    b = ck.reduce(hll, "max")
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        b.sum(dtype=jnp.int32).astype(jnp.float32)


t_ck = timed("sketch-prop chunked", one_hop_chunked, mh_variants)
net_c = t_ck - t_triv
log(f">> chunked net: {net_c*1e3:.2f} ms -> {E/net_c/1e6:.2f} M edges/s "
    f"({net_c/max(net_p,1e-9):.2f}x one-shot)")
log("done")
