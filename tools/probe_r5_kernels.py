"""Round-5 kernel probe: chunked-hop Pallas merge + SpMM "add" Pallas merge.

Verifies on the real chip, against the XLA sorted-scatter paths
(SST_DISABLE_PALLAS_SEGSCAN toggled around each trace):
  1. chunked hop (min u32 / max i8): bit-exact, and the rate vs the
     round-4 71.1M e/s XLA figure (VERDICT item 1: the citation2-scale
     production path skipped the round-4 kernel win)
  2. one-shot SpMM d=128 (f32 add): allclose, rate vs the XLA merge
     (VERDICT item 2: hbm_fraction 0.36 with the scatter merge)
All timings net of the adjacent trivial-program roundtrip (bench.py
methodology).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
import jax.numpy as jnp
import numpy as np

OUT = open(os.path.join(REPO, "tools", "perf_out.txt"), "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_r5_kernels {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_auto_plan, make_plan

N, DEG, P, m, D = 200_000, 16, 128, 256, 128
E = N * DEG
rng = np.random.default_rng(0)
ei = np.stack([rng.integers(0, N, E, dtype=np.int32),
               rng.integers(0, N, E, dtype=np.int32)])
mh = jnp.asarray(rng.integers(0, 2 ** 32 - 1, (N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 56, (N, m)).astype(np.int8))
xf = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))

one = make_plan(ei, N)
chunked = make_auto_plan(ei, N, max_slots=one.num_subruns * one.sub_len // 4)
w = rng.random(E).astype(np.float32)
wslots_one = one.stage_edge_data(w)
log(f"one-shot slots {one.num_subruns * one.sub_len/1e6:.2f}M; chunked "
    f"{chunked.num_chunks} chunks, window {chunked.window}, "
    f"chunk_depth {chunked._chunk_depth}, one-shot depth {one._seg_depth}")

trivial = jax.jit(lambda a: a.reshape(-1)[0].astype(jnp.float32))


def timed(name, fn, *args, iters=5):
    for _ in range(2):
        float(fn(*args))
    ts, t0s = [], []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(trivial(args[0]))
        t0s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    net = max(min(ts) - min(t0s), 1e-9)
    log(f"{name:28s} net {net*1e3:8.2f} ms")
    return net


def hop_fn(plan):
    @jax.jit
    def hop(a, b):
        return (plan.reduce(a, "min").sum(dtype=jnp.uint32)
                .astype(jnp.float32)
                + plan.reduce(b, "max").sum(dtype=jnp.int32)
                .astype(jnp.float32))
    return hop


def hop_out_fn(plan):
    @jax.jit
    def hop(a, b):
        return plan.reduce(a, "min"), plan.reduce(b, "max")
    return hop


def spmm_fn(plan, wsl):
    @jax.jit
    def f(x):
        return plan.reduce(x, "add", edge_data_slots=wsl).sum()
    return f


def spmm_out_fn(plan, wsl):
    @jax.jit
    def f(x):
        return plan.reduce(x, "add", edge_data_slots=wsl)
    return f


# ---- correctness first: pallas vs xla outputs --------------------------
os.environ["SST_DISABLE_PALLAS_SEGSCAN"] = "1"
want_min, want_max = hop_out_fn(chunked)(mh, hll)
want_min, want_max = np.asarray(want_min), np.asarray(want_max)
want_spmm = np.asarray(spmm_out_fn(one, wslots_one)(xf))
del os.environ["SST_DISABLE_PALLAS_SEGSCAN"]
got_min, got_max = hop_out_fn(chunked)(mh, hll)
np.testing.assert_array_equal(np.asarray(got_min), want_min)
np.testing.assert_array_equal(np.asarray(got_max), want_max)
log("chunked hop pallas == xla: BIT-EXACT (min u32, max i8)")
got_spmm = np.asarray(spmm_out_fn(one, wslots_one)(xf))
err = np.max(np.abs(got_spmm - want_spmm)
             / np.maximum(1e-3, np.abs(want_spmm)))
np.testing.assert_allclose(got_spmm, want_spmm, rtol=1e-5, atol=1e-5)
log(f"one-shot spmm pallas ~= xla: allclose (max relerr {err:.2e})")

# ---- rates -------------------------------------------------------------
t_one = timed("one-shot hop (pallas)", hop_fn(one), mh, hll)
t_chk_p = timed("chunked hop (pallas)", hop_fn(chunked), mh, hll)
os.environ["SST_DISABLE_PALLAS_SEGSCAN"] = "1"
t_chk_x = timed("chunked hop (xla)", hop_fn(chunked), mh, hll)
t_spmm_x = timed("spmm one-shot (xla)", spmm_fn(one, wslots_one), xf)
del os.environ["SST_DISABLE_PALLAS_SEGSCAN"]
t_spmm_p = timed("spmm one-shot (pallas)", spmm_fn(one, wslots_one), xf)

log(f">> hop: one-shot {E/t_one/1e6:.1f}M e/s | chunked pallas "
    f"{E/t_chk_p/1e6:.1f}M e/s | chunked xla {E/t_chk_x/1e6:.1f}M e/s "
    f"(chunked pallas = {t_chk_p/t_one:.2f}x one-shot time)")
log(f">> spmm d={D}: pallas {E/t_spmm_p/1e6:.1f}M e/s | xla "
    f"{E/t_spmm_x/1e6:.1f}M e/s ({t_spmm_x/t_spmm_p:.2f}x speedup)")
log("done probe_r5_kernels")
