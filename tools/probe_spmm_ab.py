"""Interleaved A/B: plan-SpMM with the XLA sorted-scatter merge vs the
Pallas segmented-scan merge (round 5).

Two separate probe runs disagreed on which merge wins (relay dispatch
drifts several ms between runs); this probe alternates the two programs
sample-by-sample in ONE process so the drift cancels — the same
methodology that settled the hop merge in round 4
(tools/probe_pallas_segscan.py).  Also times the two merges STANDALONE
(same interleaving) to localise any gap.
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


log(f"=== probe_spmm_ab {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N, DEG, D = 200_000, 16, 128
E = N * DEG
rng = np.random.default_rng(0)
ei = np.stack([rng.integers(0, N, E, dtype=np.int32),
               rng.integers(0, N, E, dtype=np.int32)])
plan = make_plan(ei, N)
S = plan.num_subruns
w = rng.random(E).astype(np.float32)
wslots = plan.stage_edge_data(w)
x = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
v0 = jnp.asarray(rng.standard_normal((S, D)).astype(np.float32))
jax.block_until_ready((wslots, x, v0))


def spmm_fn():
    @jax.jit
    def f(x, wslots):
        return plan.reduce(x, "add", edge_data_slots=wslots).sum()
    return f


def merge_fn():
    @jax.jit
    def f(v0, x):
        return plan.merge_subruns(v0, x, "add").sum()
    return f


# trace each variant under its env setting
os.environ["SST_DISABLE_PALLAS_SEGSCAN"] = "1"
spmm_x, merge_x = spmm_fn(), merge_fn()
float(spmm_x(x, wslots)); float(merge_x(v0, x))
del os.environ["SST_DISABLE_PALLAS_SEGSCAN"]
spmm_p, merge_p = spmm_fn(), merge_fn()
float(spmm_p(x, wslots)); float(merge_p(v0, x))

ITERS = 11
for name, fx, fp, args in (("spmm", spmm_x, spmm_p, (x, wslots)),
                           ("merge", merge_x, merge_p, (v0, x))):
    tx, tp = [], []
    for _ in range(2):
        float(fx(*args)); float(fp(*args))
    for _ in range(ITERS):
        t0 = time.perf_counter(); float(fx(*args))
        tx.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(fp(*args))
        tp.append(time.perf_counter() - t0)
    mx, mp = min(tx), min(tp)
    medx = sorted(tx)[ITERS // 2]
    medp = sorted(tp)[ITERS // 2]
    log(f"{name:6s} xla min {mx*1e3:7.2f} med {medx*1e3:7.2f} | pallas "
        f"min {mp*1e3:7.2f} med {medp*1e3:7.2f} ms | xla/pallas "
        f"min {mx/mp:.2f} med {medx/medp:.2f}")
    if name == "spmm":
        log(f"       rates: xla {E/mx/1e6:.0f}M e/s | pallas "
            f"{E/mp/1e6:.0f}M e/s (min-based, same-relay interleave)")
log("done probe_spmm_ab")
