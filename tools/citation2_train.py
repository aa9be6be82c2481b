"""citation2-scale END-TO-END BUDDY pipeline on one chip.

Extends citation2_scale.py (sketch build + feature timing) to the full
training story at the north-star scale — 2.93M nodes, ~29M directed edges,
28M-link training set — all resident on a single v5e:

  1. host: Watts-Strogatz-style ring graph (k=10, 10% rewired) — unlike a
     uniform random graph it has real triadic structure, so the sketch
     features carry signal and the model measurably learns,
  2. chunked sketch build (2 hops) + subgraph features for all 30M
     train/val links AND a same-source-negative MRR eval set (the
     ogbl-citation2 protocol, reference data.py:98-100/utils.py:88-99),
  3. SIGN(k=0) feature propagation via the chunked weighted-add plan,
  4. the real BUDDY flax module trained with a scanned epoch (B=262144,
     per-batch gathers from the resident [30M, 8] feature table — packing
     per-link node-feature rows would need ~32GB, so at this scale the
     step gathers instead),
  5. val AUC / Hits@50 + MRR over 100 same-source negatives per positive.

Everything big is generated on device; the tunnel uploads only the plan
index tables, the staged SpMM weights, and the link list.  Big device
arrays are passed as jit ARGUMENTS, never closed over (closure constants
round-trip through the remote compiler).  Timing = forced host reads (see
bench.py docstring).  Synthetic data: the quality numbers demonstrate
learning at scale, not reference parity (no real citation2 in this env).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
if __import__("os").environ.get("C2_SMOKE") == "1":
    jax.config.update("jax_platforms", "cpu")   # before any backend use
import jax.numpy as jnp

OUT = open("/root/repo/tools/perf_out.txt", "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== citation2_train {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

import optax

from subgraph_sketching_tpu.models.buddy import BUDDY
from subgraph_sketching_tpu.ops.segment_scan import make_plan
from subgraph_sketching_tpu.sketch.elph import subgraph_features
from subgraph_sketching_tpu.sketch.hll import hll_count
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches
from subgraph_sketching_tpu.train.evaluation import hits_at_k, mrr, roc_auc
from subgraph_sketching_tpu.train.losses import bce_loss

import os

SMOKE = os.environ.get("C2_SMOKE") == "1"   # tiny CPU logic check
N = 20_011 if SMOKE else 2_927_963
RING_K = 5                      # 2*RING_K directed edges per node
REWIRE = 0.10
K, P, m = 2, 128, 256
D = 128                         # node feature dim
HID = 256
# B: reference citation2 batch size; BF: feature/eval batch — both one
# compiled shape each so every chunk hits the jit cache
B = 4_096 if SMOKE else 262_144
BF = 4_096 if SMOKE else 262_144
N_POS = 40_000 if SMOKE else 14_000_000
N_VAL = 10_000 if SMOKE else 1_000_000   # val positives (+ as many negs)
MRR_POS = 100 if SMOKE else 10_000
MRR_NEGS = 100
EPOCHS = 3
MAX_SLOTS = (1 << 16) if SMOKE else (4 << 20)
params = SketchParams(max_hops=K, num_perm=P, hll_p=8)
t_start = time.perf_counter()

# ---- 1. host graph + plan ------------------------------------------------
rng = np.random.default_rng(0)
t0 = time.perf_counter()
base_i = np.arange(N, dtype=np.int64)
srcs, dsts = [], []
for off in range(1, RING_K + 1):
    srcs += [base_i, base_i]
    dsts += [(base_i + off) % N, (base_i - off) % N]
src = np.concatenate(srcs).astype(np.int32)
dst = np.concatenate(dsts).astype(np.int32)
E = len(src)
rw = rng.random(E) < REWIRE
dst[rw] = rng.integers(0, N, int(rw.sum()), dtype=np.int32)
deg = (np.bincount(src, minlength=N)
       + np.bincount(dst, minlength=N)).astype(np.float32)
log(f"graph: N={N} E={E/1e6:.1f}M (WS ring k={2*RING_K}, "
    f"{REWIRE:.0%} rewired): {time.perf_counter()-t0:.1f}s")

t0 = time.perf_counter()
plan = make_plan(np.stack([src, dst]), N).chunk(MAX_SLOTS)
log(f"plan build: {time.perf_counter()-t0:.1f}s chunks={plan.num_chunks}")

# SpMM weights for SIGN(k=0): gcn-norm 1/sqrt((du+1)(dv+1)), self 1/(d+1)
t0 = time.perf_counter()
w_e = (1.0 / np.sqrt((deg[src] + 1.0) * (deg[dst] + 1.0))).astype(np.float32)
w_slots = plan.stage_edge_data(w_e)
jax.block_until_ready((plan.gather_chunks, plan.sub_local, plan.lo, w_slots))
log(f"plan+weights upload "
    f"({(plan.gather_chunks.nbytes + w_slots.nbytes)/1e6:.0f}MB): "
    f"{time.perf_counter()-t0:.1f}s")

# ---- 2. links (host index math; device feature extraction) ---------------
t0 = time.perf_counter()
perm_e = rng.permutation(E)
pos_idx = perm_e[:N_POS + N_VAL]
pos_links = np.stack([src[pos_idx], dst[pos_idx]], axis=1)
neg_links = rng.integers(0, N, (N_POS + N_VAL, 2), dtype=np.int32)
links_np = np.concatenate([pos_links[:N_POS], neg_links[:N_POS],
                           pos_links[N_POS:], neg_links[N_POS:]])
labels_np = np.concatenate([np.ones(N_POS), np.zeros(N_POS),
                            np.ones(N_VAL), np.zeros(N_VAL)]
                           ).astype(np.float32)
N_TRAIN = 2 * N_POS
N_ALL = len(links_np)
# MRR protocol: same-source negatives (u fixed, v random)
mrr_pos = pos_links[N_POS:N_POS + MRR_POS]
mrr_neg = np.stack([np.repeat(mrr_pos[:, 0], MRR_NEGS),
                    rng.integers(0, N, MRR_POS * MRR_NEGS, dtype=np.int32)],
                   axis=1)
N_MRR = MRR_POS + MRR_POS * MRR_NEGS
log(f"links: {N_ALL/1e6:.0f}M train+val, "
    f"{len(mrr_neg)/1e6:.1f}M same-source MRR negs: "
    f"{time.perf_counter()-t0:.1f}s")
del perm_e, pos_idx, neg_links


def _pad_rows(a, mult):
    pad = (-len(a)) % mult
    return np.concatenate([a, np.zeros((pad,) + a.shape[1:], a.dtype)]) \
        if pad else a


t0 = time.perf_counter()
links_dev = jnp.asarray(_pad_rows(links_np, BF))
mrr_links = jnp.asarray(_pad_rows(np.concatenate([mrr_pos, mrr_neg]), BF))
jax.block_until_ready((links_dev, mrr_links))
log(f"link upload ({(links_dev.nbytes + mrr_links.nbytes)/1e6:.0f}MB): "
    f"{time.perf_counter()-t0:.1f}s")

# ---- 3. sketches (chunked) ----------------------------------------------
@jax.jit
def gen0(key):
    k1, k2 = jax.random.split(key)
    mh0 = jax.random.bits(k1, (N, P), jnp.uint32)
    idx = jax.random.randint(k2, (N,), 0, m)
    rank = jax.random.randint(k2, (N,), 1, 40, jnp.int8)
    hll0 = jnp.zeros((N, m), jnp.int8).at[jnp.arange(N), idx].set(rank)
    return mh0, hll0


@jax.jit
def one_hop(mh, hll):
    return plan.reduce(mh, "min"), plan.reduce(hll, "max")


t0 = time.perf_counter()
mh0, hll0 = gen0(jax.random.PRNGKey(0))
jax.block_until_ready((mh0, hll0))
mhs, hlls, cards = [mh0], [hll0], []
for k in range(1, K + 1):
    mh_k, hll_k = one_hop(mhs[-1], hlls[-1])
    c_k = hll_count(hll_k, params.hll_p)
    s = float(c_k.sum())
    log(f"  hop {k} done (mean card {s/N:.1f})")
    mhs.append(mh_k), hlls.append(hll_k), cards.append(c_k)
mhs, hlls = mhs[1:], hlls[1:]            # hops-only stack (memory)
mh0 = hll0 = mh_k = hll_k = None
sk = Sketches(minhash=jnp.stack(mhs), hll=jnp.stack(hlls),
              cards=jnp.stack(cards, axis=1))
del mhs, hlls, cards
log(f"sketch build (incl. compile): {time.perf_counter()-t0:.1f}s, "
    f"resident {(sk.minhash.nbytes + sk.hll.nbytes)/1e9:.1f}GB")

# ---- 4. subgraph features for every link --------------------------------
feats = jax.jit(lambda l, s: subgraph_features(l, s, params))
# ONE lax.map dispatch for the whole pass: 10.5M vs 6.2M links/s with the
# per-chunk python loop at this scale (tools/probe_feat_dispatch.py) — XLA
# schedules/allocates the pass better inside a single program
feats_map = jax.jit(lambda l3, s: jax.lax.map(
    lambda l: subgraph_features(l, s, params), l3))


def feats_all(lnk):
    """Features for a BF-padded link array — one jitted lax.map."""
    return feats_map(lnk.reshape(-1, BF, 2), sk).reshape(lnk.shape[0], -1)


t0 = time.perf_counter()
sf_all = feats_all(links_dev)          # padded length, sliced at use sites
sf_mrr = feats_all(mrr_links)
jax.block_until_ready((sf_all, sf_mrr))
dt = time.perf_counter() - t0
n_feat = N_ALL + N_MRR
log(f"features: {n_feat/1e6:.0f}M links in {dt:.1f}s "
    f"-> {n_feat/dt/1e6:.2f}M links/s incl. first-compile (sf resident "
    f"{(sf_all.nbytes + sf_mrr.nbytes)/1e9:.2f}GB)")
# steady state (compile cached): the production regime — repeat runs and
# --compilation_cache_dir hits skip the one-off lax.map compiles
t0 = time.perf_counter()
jax.block_until_ready(feats_all(links_dev))
dt2 = time.perf_counter() - t0
log(f"features steady-state: {N_ALL/1e6:.0f}M links in {dt2:.1f}s "
    f"-> {N_ALL/dt2/1e6:.2f}M links/s")
sk = None                                 # free ~4.5GB of sketch state

# ---- 5. SIGN(k=0) node features -----------------------------------------
t0 = time.perf_counter()
deg_dev = jnp.asarray(deg)


@jax.jit
def sign0(key, d, w):
    x = jax.random.normal(key, (N, D), jnp.float32)
    return plan.reduce(x, "add", edge_data_slots=w) + x / (d[:, None] + 1.0)


x_sign = sign0(jax.random.PRNGKey(2), deg_dev, w_slots)
jax.block_until_ready(x_sign)
log(f"SIGN(k=0) propagation (incl. compile): "
    f"{time.perf_counter()-t0:.1f}s ({x_sign.nbytes/1e9:.1f}GB resident)")

# ---- 6. train the real BUDDY module -------------------------------------
model = BUDDY(sf_dim=params.sf_dim, hidden_channels=HID, use_feature=True,
              sign_k=0)
labels_dev = jnp.asarray(labels_np)
opt = optax.adam(1e-4)

var0 = model.init({"params": jax.random.PRNGKey(3),
                   "dropout": jax.random.PRNGKey(4)},
                  jnp.zeros((8, params.sf_dim)), jnp.zeros((8, 2, D)),
                  jnp.zeros(8), jnp.zeros(8), training=False)
state0 = (var0["params"], var0.get("batch_stats", {}),
          opt.init(var0["params"]))
STEPS = N_TRAIN // B


@jax.jit
def train_epoch(state, key, sf, lnk, x, d, y):
    pk, dk = jax.random.split(key)
    epoch_perm = jax.random.permutation(pk, N_TRAIN)

    def step(carry, i):
        p, bs, o = carry
        idx = jax.lax.dynamic_slice(epoch_perm, (i * B,), (B,))
        lk = lnk[idx]

        def loss_fn(pp):
            logits, upd = model.apply(
                {"params": pp, "batch_stats": bs}, sf[idx], x[lk],
                d[lk[:, 0]], d[lk[:, 1]], training=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(dk, i)})
            return bce_loss(logits, y[idx]), upd.get("batch_stats", {})

        (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(p)
        up, no = opt.update(g, o)
        return (optax.apply_updates(p, up), nbs, no), loss

    (p, bs, o), losses = jax.lax.scan(step, state, jnp.arange(STEPS))
    return (p, bs, o), losses.mean()


state = state0
t0 = time.perf_counter()
for ep in range(EPOCHS):
    te = time.perf_counter()
    state, loss = train_epoch(state, jax.random.PRNGKey(10 + ep), sf_all,
                              links_dev, x_sign, deg_dev, labels_dev)
    loss = float(loss)
    dte = time.perf_counter() - te
    log(f"  epoch {ep}: loss {loss:.4f}, {dte:.1f}s "
        f"-> {N_TRAIN/dte/1e6:.1f}M links/s"
        + (" (incl. compile)" if ep == 0 else ""))
log(f"training {EPOCHS} epochs x {STEPS} steps: "
    f"{time.perf_counter()-t0:.1f}s")

# ---- 7. eval: val AUC / Hits@50 + same-source MRR -----------------------
p_final, bs_final, _ = state


@jax.jit
def predict(p, bs, sf_b, xf, d_s, d_d):
    return model.apply({"params": p, "batch_stats": bs}, sf_b, xf, d_s, d_d,
                       training=False)


def predict_range(sf, lnk, lo, n):
    """Predictions for rows [lo, lo+n) in fixed-size BF chunks (n >= BF;
    the last chunk is shifted left to reuse the compiled shape and only
    its unseen suffix kept)."""
    outs = []
    s0 = lo
    while s0 < lo + n:
        s0c = min(s0, lo + n - BF)
        lk = lnk[s0c:s0c + BF]
        o = predict(p_final, bs_final, sf[s0c:s0c + BF], x_sign[lk],
                    deg_dev[lk[:, 0]], deg_dev[lk[:, 1]])
        outs.append(o[s0 - s0c:])
        s0 = s0c + BF
    return jnp.concatenate(outs)[:n]


t0 = time.perf_counter()
val_pred = np.asarray(predict_range(sf_all, links_dev, N_TRAIN,
                                    N_ALL - N_TRAIN))
val_y = labels_np[N_TRAIN:]
auc = roc_auc(val_pred, val_y)
h50 = hits_at_k(jnp.asarray(val_pred[val_y > 0.5]),
                jnp.asarray(val_pred[val_y < 0.5]), 50)
mrr_pred = predict_range(sf_mrr, mrr_links, 0, N_MRR)
val_mrr = mrr(mrr_pred[:MRR_POS],
              mrr_pred[MRR_POS:].reshape(MRR_POS, MRR_NEGS))
log(f"eval ({(N_ALL - N_TRAIN)/1e6:.0f}M links + MRR set): "
    f"{time.perf_counter()-t0:.1f}s")
log(f"val AUC {auc:.4f}  Hits@50 {h50:.4f}  "
    f"MRR({MRR_NEGS} same-source negs) {val_mrr:.4f}")
log(f"TOTAL end-to-end: {time.perf_counter()-t_start:.1f}s")
log("done citation2_train")
