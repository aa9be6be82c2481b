"""Features timing with a forced per-call host read (device_get of a scalar
reduction).  The axon tunnel's block_until_ready returns early for some
programs; a host read of a value derived from the full output cannot lie.
Subtract the trivial-program roundtrip to get compute time.
"""
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from subgraph_sketching_tpu.sketch.elph import subgraph_features
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches

N = 200_000
B = 1 << 18
K, P, m = 2, 128, 256

rng = np.random.default_rng(0)
mh3 = jnp.asarray(rng.integers(0, 2**32 - 1, (K + 1, N, P), dtype=np.uint32))
hll3 = jnp.asarray(rng.integers(0, 40, (K + 1, N, m)).astype(np.int8))
cards = jnp.asarray(rng.random((N, K), np.float32)) * 100
sk = Sketches(minhash=mh3, hll=hll3, cards=cards)
params = SketchParams(max_hops=K, num_perm=P, hll_p=8)
links_np = rng.integers(0, N, (8, B, 2), dtype=np.int32)
links = [jnp.asarray(l) for l in links_np]
jax.block_until_ready((mh3, hll3, links))
print("inputs resident", flush=True)


@jax.jit
def trivial(l):
    return (l.sum(dtype=jnp.int32) & 0xFF).astype(jnp.float32)


@jax.jit
def feats_scalar(l, sk):
    return subgraph_features(l, sk, params).sum()


def timed(name, fn, args_list, iters=8):
    float(fn(*args_list[0]))  # warm/compile
    ts = []
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        r = float(fn(*a))  # host read forces completion
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    med = sorted(ts)[len(ts) // 2]
    print(f"{name:16s} best {best*1e3:8.2f} ms  med {med*1e3:8.2f} ms  "
          f"(r={r:.3g})", flush=True)
    return best


t_triv = timed("trivial", trivial, [(l,) for l in links])
t_full = timed("features", feats_scalar, [(l, sk) for l in links])
dt = t_full - t_triv
print(f"net compute: {dt*1e3:.2f} ms -> {B/dt/1e6:.2f} M links/s", flush=True)
