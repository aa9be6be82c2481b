"""Streaming insert/delete driven on the REAL chip (round-4 item 2).

Builds a LinkScorer over a trained BUDDY at synth-ws-100000, snapshots the
sketch state, inserts a batch of fresh edges, deletes the same batch, and
verifies the insert→delete round trip restored the state BIT-EXACTLY — on
the actual TPU, not the CPU mesh the unit tests use.  Also reports update
latencies (host-side affected-set walk + jitted scatter-merge per hop).

Usage: python tools/probe_streaming.py [num_edges]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_streaming {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
from subgraph_sketching_tpu.serving import LinkScorer
from subgraph_sketching_tpu.train.loops import BuddyTrainer

M = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
cfg = Config(dataset_name="synth-ws-100000", hidden_channels=64,
             batch_size=65536, eval_batch_size=262144, model="BUDDY",
             K=50, lr=0.003)
t0 = time.perf_counter()
splits, _, _ = get_data(cfg)
ds_tr = build_link_dataset(splits["train"], cfg, "train")
tr = BuddyTrainer(cfg, ds_tr, ds_tr.x.shape[-1])
state = tr.init_state(jax.random.PRNGKey(0))
scorer = LinkScorer(tr, ds_tr, state, min_bucket=1024)
log(f"setup: {time.perf_counter()-t0:.1f}s")

n = ds_tr.num_nodes
rng = np.random.default_rng(11)
# fresh undirected pairs not currently in the graph
ei = np.asarray(ds_tr.edge_index)
key = ei[0].astype(np.int64) * n + ei[1]
have = set(key.tolist())
pairs = []
while len(pairs) < M:
    u, v = int(rng.integers(0, n)), int(rng.integers(0, n))
    if u != v and u * n + v not in have and v * n + u not in have:
        pairs.append((u, v))
        have.add(u * n + v)
pairs = np.asarray(pairs, dtype=np.int64)

golden_mh = np.asarray(scorer.sk.minhash).copy()
golden_hll = np.asarray(scorer.sk.hll).copy()
golden_deg = np.asarray(scorer.deg).copy()
q = np.stack([rng.integers(0, n, 4096), rng.integers(0, n, 4096)],
             1).astype(np.int32)
before = scorer.score(q)

t0 = time.perf_counter()
scorer.insert_edges(pairs)
jax.block_until_ready(scorer.sk.minhash)
t_ins = time.perf_counter() - t0
mid = scorer.score(q)
t0 = time.perf_counter()
scorer.delete_edges(pairs)
jax.block_until_ready(scorer.sk.minhash)
t_del = time.perf_counter() - t0
after = scorer.score(q)

mh_eq = np.array_equal(np.asarray(scorer.sk.minhash), golden_mh)
hll_eq = np.array_equal(np.asarray(scorer.sk.hll), golden_hll)
deg_eq = np.allclose(np.asarray(scorer.deg), golden_deg)
scores_eq = np.allclose(after, before, rtol=1e-5, atol=1e-5)
changed = not np.allclose(mid, before)
log(f"insert {M} pairs: {t_ins*1e3:.0f}ms   delete: {t_del*1e3:.0f}ms")
log(f"round-trip bit-equal: minhash={mh_eq} hll={hll_eq} deg={deg_eq} "
    f"scores={scores_eq} (insert visibly changed scores: {changed})")
assert mh_eq and hll_eq and deg_eq and scores_eq and changed
log("done probe_streaming: insert->delete round trip EXACT on "
    f"{jax.devices()[0].platform}")
