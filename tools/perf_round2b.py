"""Round-2 perf measurements, minimal host->device transfer variant.

All large arrays are generated ON DEVICE (jax.random); only the plan's index
tables ship over the tunnel.  Timing = host read of a scalar derived from the
full output (device-side block_until_ready is untrustworthy under the axon
relay), minus the trivial-program roundtrip.
"""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== perf_round2b {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan
from subgraph_sketching_tpu.sketch.elph import subgraph_features
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches

N = 200_000
E = N * 16
B = 1 << 18
K, P, m = 2, 128, 256
rng = np.random.default_rng(0)
params = SketchParams(max_hops=K, num_perm=P, hll_p=8)


@jax.jit
def gen_data(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    mh3 = jax.random.bits(k1, (K + 1, N, P), jnp.uint32)
    hll3 = jax.random.randint(k2, (K + 1, N, m), 0, 40, jnp.int8)
    cards = jax.random.uniform(k3, (N, K)) * 100
    links = jax.random.randint(k4, (8, B, 2), 0, N, jnp.int32)
    return mh3, hll3, cards, links


t0 = time.perf_counter()
mh3, hll3, cards, links8 = gen_data(jax.random.PRNGKey(0))
jax.block_until_ready(mh3)
log(f"on-device datagen: {time.perf_counter()-t0:.1f}s")
sk = Sketches(minhash=mh3, hll=hll3, cards=cards)
links = [links8[i] for i in range(8)]


def timed(name, fn, args_list, iters=8):
    t0 = time.perf_counter()
    float(fn(*args_list[0]))
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

src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
t0 = time.perf_counter()
plan = make_plan(np.stack([src, dst]), N)
log(f"plan build (host): {time.perf_counter()-t0:.1f}s; "
    f"slots={plan.num_subruns * plan.sub_len}")


@jax.jit
def one_hop_scalar(mh, hll):
    a = plan.reduce(mh, "min")
    b = plan.reduce(hll, "max")
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        b.sum(dtype=jnp.int32).astype(jnp.float32)


variants = [(mh3[i % 2], hll3[i % 2]) for i in range(4)]
t_prop = timed("sketch-prop 3.2M e", one_hop_scalar, variants)
net_p = t_prop - t_triv
log(f">> sketch-prop net: {net_p*1e3:.2f} ms -> {E/net_p/1e6:.2f} M edges/s")

ck = plan.chunk(1 << 20)


@jax.jit
def one_hop_chunked(mh, hll):
    a = ck.reduce(mh, "min")
    b = ck.reduce(hll, "max")
    return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
        b.sum(dtype=jnp.int32).astype(jnp.float32)


t_ck = timed("sketch-prop chunked 1M", one_hop_chunked, variants)
net_c = t_ck - t_triv
log(f">> chunked net: {net_c*1e3:.2f} ms -> {E/net_c/1e6:.2f} M edges/s "
    f"({net_c/max(net_p, 1e-9):.2f}x one-shot)")
log("done perf_round2b")
