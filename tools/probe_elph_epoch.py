"""ELPH steady-state training-epoch throughput on one chip (round-4 gap:
BUDDY's step rate is recorded in README, ELPH's never was).

ELPH's loss differentiates through the full-graph GCN, so every batch
step pays a full-graph forward+backward (the reference does the same,
train.py:188-204 — "full-graph model forward PER BATCH") plus the
predictor on the batch; the jitted lax.scan epoch amortises dispatch.
Cost model: steps x (O(E*hidden) conv fwd+bwd + O(B*hidden) head), so
links/s depends on the edge-to-link ratio, unlike BUDDY's pure per-link
step.  Measured net of the relay roundtrip (bench.py methodology).
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
import numpy as np

OUT = open(os.path.join(REPO, "tools", "perf_out.txt"), "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_elph_epoch {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import (
    build_link_dataset, sketch_params_from_config,
)
from subgraph_sketching_tpu.train.loops import ElphTrainer

N = 100_000
cfg = Config(dataset_name=f"synth-ws-{N}", model="ELPH",
             hidden_channels=64, batch_size=8192, eval_batch_size=65536,
             K=50)
t0 = time.time()
splits, directed, _ = get_data(cfg)
ds = build_link_dataset(splits["train"], cfg, "train")
tr = ElphTrainer(cfg, ds, sketch_params_from_config(cfg), ds.x.shape[-1])
state = tr.init_state(jax.random.PRNGKey(0))
n_links = tr.num_links("train")
E = ds.edge_index.shape[1]
log(f"setup: {time.time()-t0:.1f}s  links={n_links}  edges={E}  "
    f"hidden={cfg.hidden_channels}  B={cfg.batch_size}")

# first epoch = compile
t0 = time.time()
state, loss = tr.train_epoch(state, None, jax.random.PRNGKey(1))
log(f"epoch 0 (compile): {time.time()-t0:.1f}s loss={loss:.4f}")

ts = []
for e in range(1, 6):
    t0 = time.time()
    state, loss = tr.train_epoch(state, None, jax.random.fold_in(
        jax.random.PRNGKey(1), e))
    ts.append(time.time() - t0)
best = min(ts)
steps = -(-n_links // cfg.batch_size)
log(f"steady epoch best {best*1e3:.0f}ms ({np.median(ts)*1e3:.0f}ms p50) "
    f"-> {n_links/best/1e6:.2f}M links/s | {steps} steps x full-graph "
    f"GCN fwd+bwd ({E} edges) = {steps*E/best/1e6:.0f}M edge-traversals/s")
log("done probe_elph_epoch")
