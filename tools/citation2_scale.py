"""citation2-scale single-chip demo: sketch build + streaming features.

ogbl-citation2 is the scale north star: ~2.93M nodes, ~30.6M directed edges.
The full sketch state (hops 0..2, minhash 128 u32 lanes + HLL 256 int8
registers) is ~6.8GB — it fits one v5e's 16GB HBM only because propagation
streams through the chunked plan (the one-shot slot gather alone would need
~18GB transient).  This script builds the tables and computes subgraph
features for 2M links, timing both, with all large state generated on
device (the tunnel uploads only the plan's index tables).

Timing = host read of a derived scalar (see perf_round2b.py).
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


log(f"=== citation2_scale {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_auto_plan
from subgraph_sketching_tpu.sketch.elph import subgraph_features
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches

N = 2_927_963
E = 30_561_187
B = 1 << 18
K, P, m = 2, 128, 256
MAX_SLOTS = 4 << 20
params = SketchParams(max_hops=K, num_perm=P, hll_p=8)

rng = np.random.default_rng(0)
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
t0 = time.perf_counter()
plan = make_auto_plan(np.stack([src, dst]), N, max_slots=MAX_SLOTS)
log(f"host plan build: {time.perf_counter()-t0:.1f}s "
    f"chunks={plan.num_chunks} window={plan.window}")
del src, dst

t0 = time.perf_counter()
jax.block_until_ready((plan.gather_chunks, plan.sub_local, plan.lo))
log(f"plan upload ({plan.gather_chunks.nbytes/1e6:.0f}MB): "
    f"{time.perf_counter()-t0:.1f}s")


@jax.jit
def gen0(key):
    k1, k2 = jax.random.split(key)
    mh0 = jax.random.bits(k1, (N, P), jnp.uint32)
    # hop-0 HLL has exactly one nonzero register per node; approximate the
    # density on-device (rank at a random register index)
    idx = jax.random.randint(k2, (N,), 0, m)
    rank = jax.random.randint(k2, (N,), 1, 40, jnp.int8)
    hll0 = jnp.zeros((N, m), jnp.int8).at[jnp.arange(N), idx].set(rank)
    return mh0, hll0


t0 = time.perf_counter()
mh0, hll0 = gen0(jax.random.PRNGKey(0))
jax.block_until_ready((mh0, hll0))
log(f"on-device hop-0 gen: {time.perf_counter()-t0:.1f}s")

from subgraph_sketching_tpu.sketch.hll import hll_count


@jax.jit
def one_hop(mh, hll):
    return plan.reduce(mh, "min"), plan.reduce(hll, "max")


# warm-up: compile one_hop + hll_count once (shapes are identical for every
# hop) so hop timings below measure execution, not the 1-2 min remote compile
t0 = time.perf_counter()
_mh_w, _hll_w = one_hop(mh0, hll0)
float(hll_count(_hll_w, params.hll_p).sum())
log(f"warm-up (compile): {time.perf_counter()-t0:.1f}s")
_mh_w = _hll_w = None

mhs, hlls, cards = [mh0], [hll0], []
for k in range(1, K + 1):
    t0 = time.perf_counter()
    mh_k, hll_k = one_hop(mhs[-1], hlls[-1])
    c_k = hll_count(hll_k, params.hll_p)
    s = float(c_k.sum())  # host read forces completion of the whole hop
    dt = time.perf_counter() - t0
    log(f"hop {k}: {dt:.2f}s -> {E/dt/1e6:.1f} M edges/s "
        f"(mean card {s/N:.1f})")
    mhs.append(mh_k)
    hlls.append(hll_k)
    cards.append(c_k)

# features only read hops 1..K — drop hop 0 BEFORE stacking (a stack is a
# copy; keeping hop 0 through it would peak ~11GB and OOM a 16GB chip)
mhs, hlls = mhs[1:], hlls[1:]
mh0 = hll0 = None
sk = Sketches(minhash=jnp.stack(mhs), hll=jnp.stack(hlls),
              cards=jnp.stack(cards, axis=1))
del mhs, hlls, cards
log(f"sketch state resident: "
    f"{(sk.minhash.nbytes + sk.hll.nbytes + sk.cards.nbytes)/1e9:.2f} GB")


@jax.jit
def feats_scalar(l, sk):
    return subgraph_features(l, sk, params).sum()


links = jax.random.randint(jax.random.PRNGKey(1), (8, B, 2), 0, N, jnp.int32)
float(feats_scalar(links[0], sk))  # compile
t0 = time.perf_counter()
tot = 0
for i in range(8):
    float(feats_scalar(links[i], sk))
    tot += B
dt = time.perf_counter() - t0
log(f"features: {tot} links in {dt:.2f}s -> {tot/dt/1e6:.2f} M links/s")
log(f"projected full citation2 feature pass (30M links): "
    f"{30e6/(tot/dt):.0f}s")
log("done citation2_scale")
