"""Re-sweep SUB_LEN under the Pallas scan merge (round 5).

The round-4 sweep (probe_sublen2) picked L=16 while the merge was the XLA
sorted scatter, whose cost grows with the sub-run count S — L=8 doubles S
and paid ~4ms of scatter for its 15% smaller slot table.  The round-4
Pallas merge made S nearly free (0.8ms at S=286k, linear streaming), so
the trade should now tip toward smaller L: on a Poisson-16 in-degree graph
the slot inflation is 1.43x at L=16 vs 1.19x at L=8 — and the gather IS
the hop's cost.  Interleaved A/B across L in one process, net of adjacent
trivials; also times the SpMM (add) at each L.
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


log(f"=== probe_sublen3 {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan

N, DEG, P, m, D = 200_000, 16, 128, 256, 128
E = N * DEG
rng = np.random.default_rng(0)
ei = np.stack([rng.integers(0, N, E, dtype=np.int32),
               rng.integers(0, N, E, dtype=np.int32)])
mh = jnp.asarray(rng.integers(0, 2 ** 32 - 1, (N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 56, (N, m)).astype(np.int8))
xf = jnp.asarray(rng.standard_normal((N, D)).astype(np.float32))
w = rng.random(E).astype(np.float32)

trivial = jax.jit(lambda a: a.reshape(-1)[0].astype(jnp.float32))

LS = (8, 12, 16)
plans = {L: make_plan(ei, N, sub_len=L) for L in LS}
wslots = {L: plans[L].stage_edge_data(w) for L in LS}


def hop_fn(plan):
    @jax.jit
    def hop(a, b):
        return (plan.reduce(a, "min").sum(dtype=jnp.uint32)
                .astype(jnp.float32)
                + plan.reduce(b, "max").sum(dtype=jnp.int32)
                .astype(jnp.float32))
    return hop


def spmm_fn(plan, wsl):
    @jax.jit
    def f(x):
        return plan.reduce(x, "add", edge_data_slots=wsl).sum()
    return f


hops = {L: hop_fn(plans[L]) for L in LS}
spmms = {L: spmm_fn(plans[L], wslots[L]) for L in LS}
for L in LS:
    float(hops[L](mh, hll))
    float(spmms[L](xf))

ITERS = 9
res_hop = {L: [] for L in LS}
res_spmm = {L: [] for L in LS}
triv = []
for _ in range(ITERS):
    t0 = time.perf_counter(); float(trivial(mh))
    triv.append(time.perf_counter() - t0)
    for L in LS:
        t0 = time.perf_counter(); float(hops[L](mh, hll))
        res_hop[L].append(time.perf_counter() - t0)
        t0 = time.perf_counter(); float(spmms[L](xf))
        res_spmm[L].append(time.perf_counter() - t0)
t_triv = min(triv)
for L in LS:
    th = min(res_hop[L]) - t_triv
    ts = min(res_spmm[L]) - t_triv
    S = plans[L].num_subruns
    log(f"L={L:2d} slots {S*L/1e6:.2f}M depth {plans[L]._seg_depth}: hop "
        f"{th*1e3:6.2f}ms = {E/th/1e6:5.1f}M e/s | spmm {ts*1e3:6.2f}ms = "
        f"{E/ts/1e6:5.0f}M e/s")
log("done probe_sublen3")
