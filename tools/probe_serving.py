"""Serving latency/throughput on the real chip: LinkScorer over a trained
BUDDY at 100k nodes.  Reports per-bucket p50 raw latency (includes the
relay's ~30ms dispatch — the honest client-observed number here) and the
net-of-roundtrip device cost.
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


log(f"=== probe_serving {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
from subgraph_sketching_tpu.serving import LinkScorer
from subgraph_sketching_tpu.train.loops import BuddyTrainer

cfg = Config(dataset_name="synth-ws-100000", hidden_channels=256,
             batch_size=65536, eval_batch_size=262144, model="BUDDY",
             K=50, lr=0.003)
t0 = time.perf_counter()
splits, _, _ = get_data(cfg)
ds_tr = build_link_dataset(splits["train"], cfg, "train")
tr = BuddyTrainer(cfg, ds_tr, ds_tr.x.shape[-1])
state = tr.init_state(jax.random.PRNGKey(0))
state, loss = tr.train_epoch(state, np.random.default_rng(0),
                             jax.random.PRNGKey(0))
log(f"setup (preprocess + 1 epoch, incl. compile): "
    f"{time.perf_counter()-t0:.1f}s loss={loss:.4f}")

scorer = LinkScorer(tr, ds_tr, state, min_bucket=1024)
rng = np.random.default_rng(7)
n = ds_tr.num_nodes

BUCKETS = [1024, 16384, 262144]
t0 = time.perf_counter()
scorer.warmup(BUCKETS)
log(f"warmup (compile {len(BUCKETS)} buckets): {time.perf_counter()-t0:.1f}s")

# relay roundtrip reference: score the smallest bucket repeatedly
for B in BUCKETS:
    qs = [rng.integers(0, n, (B, 2), dtype=np.int32) for _ in range(7)]
    ts = []
    for q in qs:
        t0 = time.perf_counter()
        scorer.score(q)      # returns np => full host read, true latency
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)[1:-1]    # trim outliers
    p50 = ts[len(ts) // 2]
    log(f"bucket {B:7d}: p50 {p50*1e3:7.1f}ms  "
        f"{B/p50/1e6:6.2f}M links/s")
log("done probe_serving")
