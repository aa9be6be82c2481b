"""Decompose the citation2-scale subgraph-feature rate gap (VERDICT r2 #3).

tools/citation2_train.py measured 4.1-6.6M links/s for the feature pass vs
11.5M at bench shape.  Hypothesis: the pass runs ~120 separate per-chunk
jit dispatches through the axon relay (~30ms each when the queue drains),
while the bench-shape figure is net of dispatch.  Variants measured here
at citation2 scale (N=2.93M nodes, hops-only K=2 stacks, 4.5GB resident):

  loop   — python loop of per-chunk jits (the shipped path), wall clock
  map    — ONE jit: lax.map over [C, BF, 2] chunks, wall clock
  single — one BF chunk, net of the measured trivial-program roundtrip
           (the per-chunk compute floor)

Usage: python tools/probe_feat_dispatch.py [--n-links 8388608] [--bf 262144]
"""

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-nodes", type=int, default=2_930_000)
    ap.add_argument("--n-links", type=int, default=8 << 20)
    ap.add_argument("--bf", type=int, default=262_144)
    args = ap.parse_args()

    from subgraph_sketching_tpu.sketch.elph import subgraph_features
    from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches

    N, BF = args.num_nodes, args.bf
    NL = args.n_links - (args.n_links % args.bf)
    C = NL // BF
    params = SketchParams(max_hops=2)
    P, m = params.num_perm, 1 << params.hll_p
    log(f"=== probe_feat_dispatch {time.strftime('%H:%M:%S')} "
        f"dev={jax.devices()[0].platform} N={N} links={NL} BF={BF} C={C}")

    @jax.jit
    def gen(key):
        ks = jax.random.split(key, 5)
        mh = jax.random.bits(ks[0], (2, N, P), jnp.uint32)
        hll = (jax.random.bits(ks[1], (2, N, m), jnp.uint32) % 40
               ).astype(jnp.int8)
        cards = jax.random.uniform(ks[2], (N, 2), jnp.float32, 1.0, 500.0)
        links = jax.random.randint(ks[3], (NL, 2), 0, N, jnp.int32)
        return mh, hll, cards, links

    mh, hll, cards, links = gen(jax.random.PRNGKey(0))
    sk = Sketches(minhash=mh, hll=hll, cards=cards)
    jax.block_until_ready((mh, hll, cards, links))
    log(f"state resident: {(mh.nbytes + hll.nbytes)/1e9:.1f}GB")

    feats = jax.jit(lambda l, s: subgraph_features(l, s, params))

    @jax.jit
    def trivial(l):
        return l[0, 0].astype(jnp.float32)

    @jax.jit
    def feats_map(lnk2d, s):
        return jax.lax.map(lambda l: subgraph_features(l, s, params), lnk2d)

    # --- single-chunk floor, net of roundtrip ---
    def timed_host_read(fn, *a, iters=4):
        def sample():
            float(np.asarray(jax.block_until_ready(fn(*a))).ravel()[0])
        for _ in range(2):
            sample()
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            sample()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    feats_scalar = jax.jit(lambda l, s: subgraph_features(l, s, params).sum())
    t_triv = timed_host_read(trivial, links)
    t_single = timed_host_read(feats_scalar, links[:BF], sk)
    net = max(t_single - t_triv, 1e-9)
    log(f"single chunk: {net*1e3:.1f}ms net -> {BF/net/1e6:.2f}M links/s "
        f"(roundtrip {t_triv*1e3:.1f}ms)")

    # --- shipped loop path (wall clock, all dispatches then one block) ---
    def loop_all():
        out = [feats(links[s:s + BF], sk) for s in range(0, NL, BF)]
        return jnp.concatenate(out)

    r = loop_all()
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop_all()
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    log(f"loop({C} chunks): {min(ts):.2f}s wall -> "
        f"{NL/min(ts)/1e6:.2f}M links/s")

    # --- one-dispatch lax.map path ---
    lnk2d = links.reshape(C, BF, 2)
    r = feats_map(lnk2d, sk)
    jax.block_until_ready(r)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = feats_map(lnk2d, sk)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    log(f"map({C} chunks, 1 dispatch): {min(ts):.2f}s wall -> "
        f"{NL/min(ts)/1e6:.2f}M links/s")


if __name__ == "__main__":
    main()
