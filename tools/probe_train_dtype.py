"""Time BUDDY steady-state training f32 vs bf16 on the real chip.

Methodology: each epoch ends in float(loss) — a host read of a scalar that
depends on the whole epoch scan, so it cannot complete early (the relay's
block_until_ready is unreliable; see bench.py).  First epoch per dtype is
compile + warmup and is discarded.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_train_dtype {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
from subgraph_sketching_tpu.train.loops import BuddyTrainer


def run(dtype, hidden=256):
    cfg = Config(dataset_name="synth-ba-large", model="BUDDY",
                 hidden_channels=hidden, batch_size=131072, lr=0.001,
                 dtype=dtype)
    splits, _, _ = get_data(cfg)
    ds = build_link_dataset(splits["train"], cfg, "train")
    n_links = len(ds.links)
    tr = BuddyTrainer(cfg, ds, ds.x.shape[-1])
    state = tr.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    state, loss = tr.train_epoch(state, rng, jax.random.PRNGKey(0))
    float(loss)  # compile+warmup epoch, discarded
    times = []
    for e in range(1, 4):
        t0 = time.perf_counter()
        state, loss = tr.train_epoch(state, rng, jax.random.PRNGKey(e))
        loss = float(loss)
        times.append(time.perf_counter() - t0)
    best = min(times)
    log(f"{dtype:>9} h={hidden:<5}: {n_links} links, best epoch "
        f"{best*1e3:8.2f} ms -> {n_links/best/1e6:6.2f} M links/s "
        f"(loss {loss:.4f})")
    return n_links / best


import sys as _sys
hiddens = [int(h) for h in _sys.argv[1:]] or [256]
for h in hiddens:
    f32 = run("float32", h)
    bf16 = run("bfloat16", h)
    log(f">> h={h}: bf16 speedup {bf16/f32:.2f}x")
log("done probe_train_dtype")
