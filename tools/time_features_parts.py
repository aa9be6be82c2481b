"""Component breakdown of subgraph_features time on the real chip."""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from subgraph_sketching_tpu.sketch.hll import (hll_count, bias_correct,
                                               pow2_neg)
from subgraph_sketching_tpu.sketch.minhash import jaccard

N = 200_000
B = 1 << 18
K = 2
P = 128
m = 256

rng = np.random.default_rng(0)
mh = jnp.asarray(rng.integers(0, 2**32 - 1, (K, N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 40, (K, N, m)).astype(np.int8))
u = jnp.asarray(rng.integers(0, N, B, dtype=np.int32))
v = jnp.asarray(rng.integers(0, N, B, dtype=np.int32))
jax.block_until_ready((mh, hll))
print("inputs on device", flush=True)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {min(ts)*1e3:9.2f} ms", flush=True)
    return out


@jax.jit
def gathers(mh, hll, u, v):
    return mh[:, u, :], mh[:, v, :], hll[:, u, :], hll[:, v, :]


@jax.jit
def full_minus_bias(mh, hll, u, v):
    mu, mv, hu, hv = mh[:, u, :], mh[:, v, :], hll[:, u, :], hll[:, v, :]
    jac = jaccard(mu[:, None], mv[None, :])
    unions = jnp.maximum(hu[:, None], hv[None, :])
    num_zero = jnp.sum((unions == 0).astype(jnp.float32), axis=-1)
    pow_sum = jnp.sum(pow2_neg(unions), axis=-1)
    return jac * num_zero * pow_sum  # estimator minus the where/bias chain


@jax.jit
def bias_only(e):
    return bias_correct(e, 8)


@jax.jit
def count_only(regs):
    return hll_count(regs, 8)


timeit("4 gathers", gathers, mh, hll, u, v)
timeit("gathers+jacc+union+sums", full_minus_bias, mh, hll, u, v)
e = jnp.abs(jnp.asarray(rng.random((K, K, B), np.float32))) * 2000.0
timeit("bias_correct [K,K,B]", bias_only, e)
unions = jnp.asarray(rng.integers(0, 40, (K, K, B, m)).astype(np.int8))
timeit("hll_count [K,K,B,m]", count_only, unions)

from subgraph_sketching_tpu.sketch.elph import _subgraph_features_jit
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches

params = SketchParams(max_hops=2, num_perm=P, hll_p=8)
mh3 = jnp.concatenate([mh[:1], mh], axis=0)
hll3 = jnp.concatenate([hll[:1], hll], axis=0)
cards = jnp.asarray(rng.random((N, K), np.float32)) * 100
sk = Sketches(minhash=mh3, hll=hll3, cards=cards)
links = jnp.stack([u, v], axis=1)
timeit("subgraph_features full",
       lambda l: _subgraph_features_jit(l, sk, params), links)
