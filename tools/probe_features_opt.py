"""Measure the 1-row-gather bias estimator + flattened sketch gathers."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_features_opt {time.strftime('%H:%M:%S')} ===")

from subgraph_sketching_tpu.sketch.hll import hll_count
from subgraph_sketching_tpu.sketch.minhash import jaccard
from subgraph_sketching_tpu.sketch.elph import (subgraph_features,
                                                inclusion_exclusion_ladder)
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches

N = 200_000
B = 1 << 18
K, P, m = 2, 128, 256
params = SketchParams(max_hops=K, num_perm=P, hll_p=8)


@jax.jit
def gen(key):
    ks = jax.random.split(key, 4)
    mh = jax.random.bits(ks[0], (K + 1, N, P), jnp.uint32)
    hll = jax.random.randint(ks[1], (K + 1, N, m), 0, 40, jnp.int8)
    cards = jax.random.uniform(ks[2], (N, K)) * 100
    links = jax.random.randint(ks[3], (B, 2), 0, N, jnp.int32)
    return mh, hll, cards, links


mhA, hllA, cardsA, linksA = gen(jax.random.PRNGKey(0))
mhB, hllB, cardsB, linksB = gen(jax.random.PRNGKey(1))
jax.block_until_ready((mhA, hllA, mhB, hllB))
skA = Sketches(minhash=mhA, hll=hllA, cards=cardsA)
skB = Sketches(minhash=mhB, hll=hllB, cards=cardsB)


def timed(name, fn, args_list, iters=6):
    out0 = float(fn(*args_list[0]))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args_list[i % len(args_list)]))
        ts.append(time.perf_counter() - t0)
    log(f"{name:30s} best {min(ts)*1e3:9.2f} ms  (v={out0:.6g})")
    return min(ts)


@jax.jit
def trivial(l):
    return l[0, 0].astype(jnp.float32)


@jax.jit
def p_full(l, sk):
    return subgraph_features(l, sk, params).sum()


def flat_features(links, sk, params):
    """Variant: gather from a [(K)(N), W] flattened stack with fused
    k*N+u indices (2D gather instead of middle-axis batched gather)."""
    K = params.max_hops
    u, v = links[:, 0], links[:, 1]
    mh_f = sk.minhash[1:].reshape(K * N, P)
    hll_f = sk.hll[1:].reshape(K * N, m)
    offs = (jnp.arange(K, dtype=jnp.int32) * N)[:, None]
    mu = mh_f[offs + u[None, :]]
    mv = mh_f[offs + v[None, :]]
    hu = hll_f[offs + u[None, :]]
    hv = hll_f[offs + v[None, :]]
    jac = jaccard(mu[:, None], mv[None, :])
    un = jnp.maximum(hu[:, None], hv[None, :])
    inter = jac * hll_count(un, params.hll_p)
    inter = jnp.transpose(inter, (2, 0, 1))
    return inclusion_exclusion_ladder(inter, sk.cards[u], sk.cards[v], params)


@jax.jit
def p_flat(l, sk):
    return flat_features(l, sk, params).sum()


args = [(linksA, skA), (linksB, skB)]
t0 = timed("trivial", trivial, [(linksA,), (linksB,)])
t_f = timed("full (rowgather bias)", p_full, args) - t0
t_fl = timed("full flat-gather", p_flat, args) - t0
log(f">> net: full {t_f*1e3:.1f}ms ({B/t_f/1e6:.2f} M links/s), "
    f"flat {t_fl*1e3:.1f}ms ({B/t_fl/1e6:.2f} M links/s)")
# correctness: flat == production
d = float(jnp.abs(flat_features(linksA, skA, params)
                  - subgraph_features(linksA, skA, params)).max())
log(f"flat vs prod max abs diff: {d}")
log("done probe_features_opt")
