"""A/B the ELPH epoch: staged PlanSpmm vs scatter SpMM, on the real chip.

Timing = wall over whole epochs with a forced host read at the end (the
epoch jit already syncs once per epoch via the loss sum; relay roundtrip
amortises over the epoch so plain wall works here).

Usage: python tools/probe_elph_plan.py [n_nodes] (default 100000)
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import (
    build_link_dataset, sketch_params_from_config,
)
from subgraph_sketching_tpu.train.loops import ElphTrainer

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(m):
    print(m, flush=True)
    OUT.write(m + "\n")


n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
log(f"=== probe_elph_plan n={n} dev={jax.devices()[0].platform} "
    f"{time.strftime('%H:%M:%S')} ===")

for use_plan in (True, False):
    cfg = Config(dataset_name=f"synth-ws-{n}", model="ELPH",
                 hidden_channels=256, batch_size=65536,
                 eval_batch_size=131072, K=50, use_plan=use_plan)
    splits, _, _ = get_data(cfg)
    t0 = time.time()
    ds = build_link_dataset(splits["train"], cfg, "train")
    tr = ElphTrainer(cfg, ds, sketch_params_from_config(cfg),
                     ds.x.shape[-1])
    log(f"use_plan={use_plan}: staging {time.time() - t0:.1f}s "
        f"(plan engaged: {'train' in tr._spmm_plans})")
    state = tr.init_state(jax.random.PRNGKey(0))
    state, loss = tr.train_epoch(state, np.random.default_rng(0),
                                 jax.random.PRNGKey(0))  # compile
    t0 = time.time()
    E = 2
    for ep in range(E):
        state, loss = tr.train_epoch(state, np.random.default_rng(ep),
                                     jax.random.PRNGKey(1 + ep))
    jax.block_until_ready(state.params)
    dt = (time.time() - t0) / E
    links = tr.num_links("train")
    log(f"use_plan={use_plan}: {dt:.2f}s/epoch ({links / dt / 1e6:.2f}M "
        f"links/s) loss={loss:.4f}")
