"""Steady-state streaming update latency (round 4 follow-up).

STATUS's 6.0s insert / 8.7s delete figure for 1024 pairs at 100k nodes is
dominated by first-call compiles and per-hop relay dispatch; this probe
measures the WARM-path latency the number a long-running server actually
sees: after one warm-up round trip, time repeated insert->delete round
trips at two batch sizes.  Host-side affected-set work (np.isin scans,
partition translation) is deliberately included — it is part of the
latency.  Run on the real chip.

Usage: python tools/probe_streaming_steady.py [round] — with a round
number, merges a "streaming_steady" section into SERVING_r{NN}.json so
the figure is comparable across rounds.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))

OUT = open(os.path.join(REPO, "tools", "perf_out.txt"), "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_streaming_steady {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph import Graph
from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
from subgraph_sketching_tpu.graph.splits import SplitData
from subgraph_sketching_tpu.graph.synthetic import watts_strogatz_graph
from subgraph_sketching_tpu.serving import LinkScorer
from subgraph_sketching_tpu.train.loops import BuddyTrainer

N = 20_000
ei = watts_strogatz_graph(N, 8, 0.1, seed=9)
rng = np.random.default_rng(0)
links = np.stack([rng.integers(0, N, 2000),
                  rng.integers(0, N, 2000)], 1).astype(np.int32)

t0 = time.time()
cfg = Config(dataset_name="synth-ws", hidden_channels=16, batch_size=256,
             eval_batch_size=1024, model="BUDDY", K=20, use_feature=False)
g = Graph(ei, N)
sd = SplitData(graph=g, pos_edges=links[:1000], neg_edges=links[1000:])
ds = build_link_dataset(sd, cfg, "train")
tr = BuddyTrainer(cfg, ds, None)
state = tr.init_state(jax.random.PRNGKey(0))
sc = LinkScorer(tr, ds, state, min_bucket=64)
log(f"setup ({N} nodes): {time.time() - t0:.1f}s")

have = set((ei[0].astype(np.int64) * N + ei[1]).tolist())


def fresh_pairs(m):
    out = []
    while len(out) < m:
        u, v = int(rng.integers(0, N)), int(rng.integers(0, N))
        if u != v and u * N + v not in have and v * N + u not in have:
            out.append((u, v))
            have.add(u * N + v)
            have.add(v * N + u)
    return np.array(out)


def force(scorer):
    # completion fence: a scalar host read derived from the updated state
    # (block_until_ready can return early under the relay — bench.py
    # docstring); its cost is measured separately and netted out
    return float(np.asarray(scorer.sk.cards[0, 0]))


# roundtrip cost of the fence alone (same methodology as bench.py)
force(sc)
reads = []
for _ in range(5):
    t0 = time.time()
    force(sc)
    reads.append(time.time() - t0)
t_read = np.median(reads)
log(f"fence-alone roundtrip p50: {t_read*1e3:.1f}ms")

rows = {}
for batch in (64, 1024):
    # warm-up round trip compiles all four (reset, hop0) program variants
    # for this padding bucket
    p = fresh_pairs(batch)
    t0 = time.time()
    sc.insert_edges(p)
    sc.delete_edges(p)
    warm = time.time() - t0
    ins, dels = [], []
    for _ in range(5):
        p = fresh_pairs(batch)
        t0 = time.time()
        sc.insert_edges(p)
        force(sc)
        ins.append(time.time() - t0 - t_read)
        t0 = time.time()
        sc.delete_edges(p)
        force(sc)
        dels.append(time.time() - t0 - t_read)
    def net_or_none(samples):
        # same guard as probe_serving: below the measurement floor (one
        # jittery fence sample can exceed the op's own latency) record
        # null, not a negative/near-zero "impossible improvement"
        med = float(np.median(samples))
        return round(med * 1e3, 1) if med > 0 else None

    rows[str(batch)] = {
        "cold_roundtrip_ms": round(warm * 1e3),
        "insert_p50_ms_net": net_or_none(ins),
        "delete_p50_ms_net": net_or_none(dels)}
    log(f"batch {batch:5d}: cold round-trip {warm*1e3:7.0f}ms | warm "
        f"completion-forced net p50: insert {np.median(ins)*1e3:6.1f}ms  "
        f"delete {np.median(dels)*1e3:6.1f}ms  (min {min(ins)*1e3:.1f}/"
        f"{min(dels)*1e3:.1f}ms over 5 reps)")

if len(sys.argv) > 1:
    rnd = int(sys.argv[1])
    path = os.path.join(REPO, f"SERVING_r{rnd:02d}.json")
    try:
        with open(path) as f:
            artifact = json.load(f)
    except FileNotFoundError:
        artifact = {}
    artifact["streaming_steady"] = {
        "setup": f"BUDDY, synth-ws-{N}, warm programs, completion-forced "
                 f"net of the measured fence roundtrip; host affected-set "
                 f"work included",
        "fence_roundtrip_ms": round(t_read * 1e3, 1),
        "batches": rows,
    }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
    log(f"merged streaming_steady into {path}")
log("done probe_streaming_steady")
