"""Decompose the BUDDY train step: where do the milliseconds go?

Times jitted sub-programs (batch gather / eval fwd / train fwd / grad /
full adam step) with forced host reads, net of the measured trivial-program
roundtrip.  Usage: python tools/probe_step_parts.py [hidden] [dtype]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


hidden = int(sys.argv[1]) if len(sys.argv) > 1 else 256
dtype = sys.argv[2] if len(sys.argv) > 2 else "float32"
log(f"=== probe_step_parts {time.strftime('%H:%M:%S')} h={hidden} "
    f"dtype={dtype} dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
from subgraph_sketching_tpu.train.loops import BuddyTrainer

B = 131072
cfg = Config(dataset_name="synth-ba-large", model="BUDDY",
             hidden_channels=hidden, batch_size=B, lr=0.001, dtype=dtype)
splits, _, _ = get_data(cfg)
ds = build_link_dataset(splits["train"], cfg, "train")
tr = BuddyTrainer(cfg, ds, ds.x.shape[-1])
state = tr.init_state(jax.random.PRNGKey(0))
data = tr._data["train"]
n = int(data["links"].shape[0])
idxs = [jnp.asarray((np.arange(B) * 7 + i * 13) % n, jnp.int32)
        for i in range(4)]
key = jax.random.PRNGKey(42)


@jax.jit
def trivial(i):
    return i[0].astype(jnp.float32)


@jax.jit
def gather_only(i):
    b = tr._batch(data, i)
    return (b["sf"].sum() + b["node_features"].sum()
            + b["src_degree"].sum())


@jax.jit
def fwd_eval(st, i):
    b = tr._batch(data, i)
    logits, _ = tr._apply(st.params, st.batch_stats, b, False)
    return logits.sum()


@jax.jit
def fwd_train(st, i, k):
    b = tr._batch(data, i)
    logits, nbs = tr._apply(st.params, st.batch_stats, b, True, k)
    return logits.sum() + jax.tree_util.tree_reduce(
        lambda a, x: a + x.sum(), nbs, 0.0)


@jax.jit
def grad_only(st, i, k):
    b = tr._batch(data, i)

    def loss_fn(p):
        logits, nbs = tr._apply(p, st.batch_stats, b, True, k)
        return tr.loss_fn(logits, b["labels"], b["mask"]), nbs

    (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
    return loss + jax.tree_util.tree_reduce(
        lambda a, x: a + x.sum(), grads, 0.0)


@jax.jit
def full_step(st, i, k):
    import optax
    b = tr._batch(data, i)

    def loss_fn(p):
        logits, nbs = tr._apply(p, st.batch_stats, b, True, k)
        return tr.loss_fn(logits, b["labels"], b["mask"]), nbs

    (loss, nbs), grads = jax.value_and_grad(loss_fn, has_aux=True)(st.params)
    updates, _ = tr.optimizer.update(grads, st.opt_state, st.params)
    newp = optax.apply_updates(st.params, updates)
    return loss + jax.tree_util.tree_reduce(
        lambda a, x: a + x.sum(), newp, 0.0)


def timed(name, fn, *extra):
    float(fn(idxs[0], *extra) if not extra or True else None)  # warm/compile
    ts = []
    for i in range(6):
        t0 = time.perf_counter()
        float(fn(idxs[i % 4], *extra))
        ts.append(time.perf_counter() - t0)
    log(f"{name:24s} best {min(ts) * 1e3:9.2f} ms")
    return min(ts)


t0 = timed("trivial", trivial)
tg = timed("batch gather", gather_only)
fe = timed("fwd eval", lambda i: fwd_eval(state, i))
ft = timed("fwd train (BN+dropout)", lambda i: fwd_train(state, i, key))
gr = timed("fwd+bwd", lambda i: grad_only(state, i, key))
fs = timed("full step (adam)", lambda i: full_step(state, i, key))
log(f">> net of roundtrip: gather {1e3 * (tg - t0):.2f} "
    f"fwd {1e3 * (fe - t0):.2f} fwd-train {1e3 * (ft - t0):.2f} "
    f"fwd+bwd {1e3 * (gr - t0):.2f} step {1e3 * (fs - t0):.2f} ms")
log("done probe_step_parts")
