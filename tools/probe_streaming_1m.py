"""Streaming mutation at 1M nodes with a host/device split (round-5
verdict item 5).

Round 4 measured steady-state insert/delete only at 20k nodes and
ESTIMATED the delete host walk at "~100ms-class" for citation2 scale;
round 5 reworked the walk (key-sorted CSR + delete tombstones + the
symmetric in==swapped-out fast path) so nothing in a delete batch is
O(E) any more.  This probe measures it: synth-ws at 1e6 nodes / 8M
directed edges, B=64 and B=1024 insert->delete round trips, reporting
per-op net p50 AND the host-walk / device-dispatch split recorded by
LinkScorer.last_update_stats (device execution rides the completion
fence, as before).

Usage: python tools/probe_streaming_1m.py [round] — merges a
"streaming_steady_1m" section into SERVING_r{NN}.json.
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


log(f"=== probe_streaming_1m {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph import Graph
from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
from subgraph_sketching_tpu.graph.splits import SplitData
from subgraph_sketching_tpu.graph.synthetic import watts_strogatz_graph
from subgraph_sketching_tpu.serving import LinkScorer
from subgraph_sketching_tpu.train.loops import BuddyTrainer

N = 1_000_000
t0 = time.time()
ei = watts_strogatz_graph(N, 8, 0.1, seed=9)
log(f"graph: {N} nodes, {ei.shape[1]} directed edges "
    f"({time.time()-t0:.1f}s)")
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
    return float(np.asarray(scorer.sk.cards[0, 0]))


force(sc)
reads = []
for _ in range(5):
    t0 = time.time()
    force(sc)
    reads.append(time.time() - t0)
t_read = float(np.median(reads))
log(f"fence-alone roundtrip p50: {t_read*1e3:.1f}ms")

# original-CSR pairs to delete: deleting ONLY freshly-inserted pairs would
# never leave _extra_edges, so the tombstone union + the _keys_in_del walk
# filter + amortised compaction (the parts round 5 actually changed) would
# go unmeasured.  Each delete batch is half fresh extras, half original
# ws edges — the steady-state mix a long-running server sees.
orig_und = np.unique(
    np.sort(ei.T[ei[0] < ei[1]], axis=1), axis=0)
orig_cursor = 0


def orig_pairs(m):
    global orig_cursor
    out = orig_und[orig_cursor:orig_cursor + m]
    orig_cursor += m
    for u, v in out:
        have.discard(int(u) * N + int(v))
        have.discard(int(v) * N + int(u))
    return out


rows = {}
for batch in (64, 1024):
    p = fresh_pairs(batch)
    t0 = time.time()
    sc.insert_edges(p)
    sc.delete_edges(np.concatenate(
        [p[: batch // 2], orig_pairs(batch - batch // 2)]))
    warm = time.time() - t0
    ins, dels, ins_host, del_host = [], [], [], []
    for _ in range(5):
        p = fresh_pairs(batch)
        t0 = time.time()
        sc.insert_edges(p)
        force(sc)
        ins.append(time.time() - t0 - t_read)
        ins_host.append(sc.last_update_stats["host_ms"])
        dp = np.concatenate(
            [p[: batch // 2], orig_pairs(batch - batch // 2)])
        t0 = time.time()
        sc.delete_edges(dp)
        force(sc)
        dels.append(time.time() - t0 - t_read)
        del_host.append(sc.last_update_stats["host_ms"])
    log(f"  live tombstones after batch {batch}: {len(sc._del_keys)}")
    med = lambda a: float(np.median(a))

    def net_or_none(samples):
        # below the measurement floor (a jittery fence sample can exceed
        # the op's own latency): record null, not a negative figure or an
        # absurd ratio — probe_streaming_steady's guard
        m = med(samples)
        return round(m * 1e3, 1) if m > 0 else None

    ratio = (round(med(dels) / med(ins), 2)
             if med(ins) > 0 and med(dels) > 0 else None)
    rows[str(batch)] = {
        "cold_roundtrip_ms": round(warm * 1e3),
        "live_tombstones": int(len(sc._del_keys)),
        "delete_mix": "half fresh extras, half original CSR edges",
        "insert_p50_ms_net": net_or_none(ins),
        "insert_host_walk_ms": round(med(ins_host), 1),
        "delete_p50_ms_net": net_or_none(dels),
        "delete_host_walk_ms": round(med(del_host), 1),
        "delete_over_insert": ratio,
    }
    log(f"batch {batch:5d}: cold {warm*1e3:7.0f}ms | net p50 insert "
        f"{med(ins)*1e3:6.1f}ms (host {med(ins_host):.1f}) delete "
        f"{med(dels)*1e3:6.1f}ms (host {med(del_host):.1f}) | "
        f"del/ins {med(dels)/max(med(ins),1e-9):.2f}")

if len(sys.argv) > 1:
    rnd = int(sys.argv[1])
    path = os.path.join(REPO, f"SERVING_r{rnd:02d}.json")
    try:
        with open(path) as f:
            artifact = json.load(f)
    except FileNotFoundError:
        artifact = {}
    artifact["streaming_steady_1m"] = {
        "setup": f"BUDDY, synth-ws-{N} (8M directed edges), warm programs, "
                 f"completion-forced net of the measured fence roundtrip; "
                 f"host_walk from LinkScorer.last_update_stats "
                 f"(tombstone+symmetric-swap adjacency, round 5)",
        "fence_roundtrip_ms": round(t_read * 1e3, 1),
        "batches": rows,
    }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
    log(f"merged streaming_steady_1m into {path}")
log("done probe_streaming_1m")
