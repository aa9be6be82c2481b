"""Where do subgraph_features' 40ms go?  Net-of-roundtrip breakdown."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_features_parts {time.strftime('%H:%M:%S')} ===")

from subgraph_sketching_tpu.sketch.hll import (bias_correct, hll_count,
                                               pow2_neg)
from subgraph_sketching_tpu.sketch.minhash import jaccard
from subgraph_sketching_tpu.sketch.elph import subgraph_features
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
    float(fn(*args_list[0]))
    ts = []
    for i in range(iters):
        t0 = time.perf_counter()
        float(fn(*args_list[i % len(args_list)]))
        ts.append(time.perf_counter() - t0)
    log(f"{name:30s} best {min(ts)*1e3:9.2f} ms")
    return min(ts)


@jax.jit
def trivial(l):
    return l[0, 0].astype(jnp.float32)


def fsum(x):
    return x.astype(jnp.float32).sum()


@jax.jit
def p_gathers(mh, hll, links):
    u, v = links[:, 0], links[:, 1]
    return fsum(mh[1:, u, :]) + fsum(mh[1:, v, :]) + \
        fsum(hll[1:, u, :].astype(jnp.int32)) + \
        fsum(hll[1:, v, :].astype(jnp.int32))


@jax.jit
def p_jaccard(mh, links):
    u, v = links[:, 0], links[:, 1]
    mu, mv = mh[1:, u, :], mh[1:, v, :]
    return fsum(jaccard(mu[:, None], mv[None, :]))


@jax.jit
def p_union_stats(hll, links):
    u, v = links[:, 0], links[:, 1]
    hu, hv = hll[1:, u, :], hll[1:, v, :]
    un = jnp.maximum(hu[:, None], hv[None, :])
    nz = jnp.sum((un == 0).astype(jnp.float32), axis=-1)
    ps = jnp.sum(pow2_neg(un), axis=-1)
    return nz.sum() + ps.sum()


@jax.jit
def p_union_count(hll, links):
    u, v = links[:, 0], links[:, 1]
    hu, hv = hll[1:, u, :], hll[1:, v, :]
    un = jnp.maximum(hu[:, None], hv[None, :])
    return hll_count(un, 8).sum()


@jax.jit
def p_full(l, sk):
    return subgraph_features(l, sk, params).sum()


args2 = [(mhA, hllA, linksA), (mhB, hllB, linksB)]
t0 = timed("trivial", trivial, [(linksA,), (linksB,)])
t_g = timed("4 gathers", p_gathers, args2) - t0
t_j = timed("gather+jaccard", p_jaccard,
            [(mhA, linksA), (mhB, linksB)]) - t0
t_u = timed("gather+union stats", p_union_stats,
            [(hllA, linksA), (hllB, linksB)]) - t0
t_c = timed("gather+union hll_count", p_union_count,
            [(hllA, linksA), (hllB, linksB)]) - t0
t_f = timed("full features", p_full, [(linksA, skA), (linksB, skB)]) - t0
log(f">> net: gathers {t_g*1e3:.1f} jacc {t_j*1e3:.1f} "
    f"unionstats {t_u*1e3:.1f} unioncount {t_c*1e3:.1f} "
    f"full {t_f*1e3:.1f}ms ({B/t_f/1e6:.2f} M links/s)")
log("done probe_features_parts")
