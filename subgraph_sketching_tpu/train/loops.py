"""Jitted training and inference loops for BUDDY and ELPH.

TPU-first redesign of the reference's per-batch python loops
(src/runners/train.py, src/runners/inference.py):

  * one jitted epoch: all link tensors live on device, the epoch is a
    ``lax.scan`` over a host-generated permutation — no per-batch host sync
  * the last batch is padded and masked rather than ragged (static shapes)
  * ELPH improvement over the reference: the (deterministic,
    parameter-independent) sketches and subgraph features are computed once
    per split at preprocessing instead of once per batch
    (reference recomputes the full-graph hash propagation every batch,
    train.py:188-204); gradients are identical because the hash side is
    gradient-free
  * Adam with torch-style weight decay (decay added to the gradient before
    the moment updates, matching torch.optim.Adam / reference run.py:138)
"""

from __future__ import annotations

import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.preprocess import LinkDataset
from subgraph_sketching_tpu.models.buddy import BUDDY
from subgraph_sketching_tpu.models.elph import ELPH
from subgraph_sketching_tpu.models.predictor import LinkPredictor
from subgraph_sketching_tpu.train.losses import get_loss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def _dtype_from_cfg(cfg: Config):
    """cfg.dtype -> flax compute dtype (None = default float32 path).

    bfloat16 puts the Dense/conv matmuls on the MXU at half the HBM traffic;
    params, BN running stats, and optimizer state stay float32 (flax
    param_dtype default), and every model casts its logits back to f32.
    """
    if cfg.dtype in (None, "float32", "f32"):
        return None
    return jnp.dtype(cfg.dtype)


def _load_frozen_embedding(cfg: Config, num_nodes: int):
    """Pretrained (frozen) node-embedding table, or None (reference
    select_embedding, utils.py:57-60).  Frozen tables ride as data, not
    params, so they take no gradient and no optimizer state."""
    if cfg.pretrained_node_embedding is None:
        return None
    from subgraph_sketching_tpu.utils import load_pretrained_embedding
    return jnp.asarray(load_pretrained_embedding(
        cfg.pretrained_node_embedding, num_nodes))


def _mesh_from_cfg(cfg: Config):
    if not cfg.mesh_shape:
        return None
    from subgraph_sketching_tpu.parallel.mesh import make_mesh
    return make_mesh(cfg.mesh_shape, cfg.mesh_axes)


def _replicate_on(mesh, a):
    if mesh is None:
        return a
    from jax.sharding import NamedSharding, PartitionSpec as P
    return jax.device_put(a, NamedSharding(mesh, P()))


def _shard_axis_on(mesh, a, axis):
    if mesh is None:
        return a
    from jax.sharding import NamedSharding, PartitionSpec as P
    if "data" not in mesh.axis_names:  # e.g. a graph-only preprocessing mesh
        return jax.device_put(a, NamedSharding(mesh, P()))
    spec = [None] * a.ndim
    spec[axis] = "data"
    return jax.device_put(a, NamedSharding(mesh, P(*spec)))


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    if cfg.weight_decay > 0:
        return optax.chain(optax.add_decayed_weights(cfg.weight_decay),
                           optax.adam(cfg.lr))
    return optax.adam(cfg.lr)


def eval_subset(total: int, n_samples, dataset_name: str = "",
                num_pos: Optional[int] = None) -> np.ndarray:
    """Indices to evaluate when subsampling a split.

    The reference shuffles its val/test loaders so taking the first n gives a
    random pos/neg mix (data.py:47-54); a plain prefix would be all
    positives.  citation2 keeps aligned same-source negatives and must stay
    ordered (data.py:48-49): links are [all positives] ++ [per-positive
    negative blocks], so the subsample takes the first k positives PLUS
    their k*negs_per_pos aligned negatives (a plain prefix would hand
    evaluate_mrr other positives' negatives).  Pass ``num_pos`` (the split's
    positive count) to enable that; trainers record it at staging.

    Deliberate behavioural difference vs the reference: the subsample uses a
    FIXED seed (12345), so every repetition and epoch evaluates the same
    subset — metrics are comparable across reps/epochs, at the cost of not
    re-randomising per eval the way the reference's shuffled loaders do.
    Full-split evaluation (the default) is unaffected.
    """
    if n_samples is None or n_samples >= total:
        return np.arange(total, dtype=np.int32)
    if dataset_name.startswith("ogbl-citation"):
        if not num_pos or num_pos >= total:
            return np.arange(n_samples, dtype=np.int32)
        npp = (total - num_pos) // num_pos      # negatives per positive
        k = int(max(1, min(num_pos, n_samples // (npp + 1))))
        return np.concatenate([
            np.arange(k, dtype=np.int32),
            (num_pos + np.arange(k * npp)).astype(np.int32)])
    rng = np.random.default_rng(12345)
    return np.sort(rng.permutation(total)[:n_samples]).astype(np.int32)


def batched_predict(score_fn, sel: np.ndarray, batch_size: int,
                    pad_value: int = 0) -> np.ndarray:
    """Shared eval loop for every trainer's predict: pad the tail batch to
    the uniform size (ONE compiled shape), dispatch every batch before
    materialising any result (batches overlap in the device queue instead
    of paying a host sync each), then slice the pads off.

    ``score_fn(idx)`` receives an int32 [bs] index array (tail padded with
    ``pad_value``) and returns a [bs] device array of scores."""
    n = len(sel)
    bs = min(batch_size, max(1, n))
    preds = []
    for s in range(0, n, bs):
        idx = sel[s:min(s + bs, n)]
        pad = bs - len(idx)
        if pad:
            idx = np.concatenate(
                [idx, np.full(pad, pad_value, dtype=np.int32)])
        out = score_fn(np.asarray(idx, dtype=np.int32))
        preds.append(out[:bs - pad] if pad else out)
    return np.concatenate([np.asarray(p) for p in preds])


def _epoch_plan(num_links: int, batch_size: int,
                train_samples: float = math.inf) -> Tuple[int, int]:
    """(links used per epoch, steps).  Subsampling semantics follow reference
    get_num_samples (utils.py:32-43): a fraction if < 1, else a count."""
    n = num_links
    if train_samples < 1:
        n = int(train_samples * num_links)
    elif train_samples != math.inf:
        n = min(int(train_samples), num_links)
    return n, max(1, math.ceil(n / batch_size))


def _device_permutation(key: jax.Array, num_links: int, batch_size: int,
                        n_used: int, steps: int, mesh) -> jnp.ndarray:
    """[steps, batch_size] int32 on device; -1 marks padding (masked out of
    the loss).

    Generated inside the epoch jit: a host-built permutation would be a
    megabytes-scale host->device upload every epoch (~23ms over the TPU
    relay for a 131k batch, measured — comparable to the compute itself).
    """
    flat = jax.random.permutation(key, num_links)[:n_used].astype(jnp.int32)
    pad = steps * batch_size - n_used
    if pad:
        flat = jnp.concatenate([flat, jnp.full((pad,), -1, jnp.int32)])
    perm = flat.reshape(steps, batch_size)
    if mesh is not None and "data" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P
        perm = jax.lax.with_sharding_constraint(
            perm, NamedSharding(mesh, P(None, "data")))
    return perm


# ------------------------------------------------------------------ BUDDY --

def _node_embedding_table(mod: nn.Module, num_nodes: int, hidden: int,
                          propagate: bool, sign_k: int, sign_dropout: float,
                          dtype, edge_index, mask, frozen_table, spmm_ctx,
                          training: bool):
    """Shared embedding-table logic for BuddyWithEmbedding/ElphEmbedding,
    executed inside the caller's compact scope so the param paths stay
    ('node_embedding', 'sign_embedding/...').  A pretrained table rides as
    data (frozen, reference select_embedding utils.py:57-60); otherwise it
    is a parameter; with ``propagate`` it is SIGN-diffused over the
    normalised adjacency (reference propagate_embeddings_func,
    models/elph.py:148-151), optionally through a staged PlanSpmm ctx."""
    from subgraph_sketching_tpu.models.gnn import SIGNEmbedding

    table = (frozen_table if frozen_table is not None else
             mod.param("node_embedding", nn.initializers.xavier_uniform(),
                       (num_nodes, hidden)))
    if propagate and edge_index is not None:
        table = SIGNEmbedding(hidden, hidden, sign_k, sign_dropout,
                              dtype=dtype, name="sign_embedding")(
            table, edge_index, num_nodes, mask=mask, training=training,
            spmm_ctx=spmm_ctx)
    return table


class BuddyWithEmbedding(nn.Module):
    """BUDDY plus an optional trainable node-embedding table.

    The reference keeps the embedding outside the model and splices its
    parameters into the optimizer (run.py:134-138, select_embedding
    utils.py:46-63); here it is one module so the params tree stays unified.
    propagate_embeddings applies SIGN-style diffusion to the table before
    the per-link lookup (reference propagate_embeddings_func,
    models/elph.py:271-274 — used for ogbl-ddi).
    """

    buddy: Any
    num_nodes: int = 0
    hidden_channels: int = 0
    use_embedding: bool = False
    propagate: bool = False
    sign_k: int = 0
    sign_dropout: float = 0.5
    dtype: Any = None  # compute dtype for the SIGN embedding propagation

    @nn.compact
    def __call__(self, links=None, edge_index=None, num_nodes=None,
                 frozen_table=None, return_table: bool = False,
                 emb_spmm_ctx=None, *, training: bool = False, **kwargs):
        emb = None
        table = None
        if self.use_embedding:
            table = _node_embedding_table(
                self, self.num_nodes, self.hidden_channels, self.propagate,
                self.sign_k, self.sign_dropout, self.dtype, edge_index,
                None, frozen_table, emb_spmm_ctx, training)
            if not return_table:
                emb = table[links]
        if return_table:
            # serving resolves the (possibly diffused) table once, then
            # passes it back as frozen_table with edge_index=None so query
            # batches only gather rows
            return table
        return self.buddy(emb=emb, training=training, **kwargs)


class BuddyTrainer:
    """Owns the model, device-resident split data, and jitted step fns."""

    def __init__(self, cfg: Config, dataset: LinkDataset,
                 num_features: Optional[int]):
        self.cfg = cfg
        use_feature = cfg.use_feature and dataset.x is not None
        self.use_embedding = (cfg.train_node_embedding
                              or cfg.pretrained_node_embedding is not None)
        self.frozen_emb = _load_frozen_embedding(cfg, dataset.num_nodes)
        buddy = BUDDY(
            sf_dim=cfg.sf_dim,
            hidden_channels=cfg.hidden_channels,
            use_feature=use_feature,
            sign_k=cfg.sign_k,
            append_normalised=cfg.add_normed_features,
            use_RA=cfg.use_RA,
            use_embedding=self.use_embedding,
            label_dropout=cfg.label_dropout,
            feature_dropout=cfg.feature_dropout,
            sign_dropout=cfg.sign_dropout,
            dtype=_dtype_from_cfg(cfg),
        )
        self.model = BuddyWithEmbedding(
            buddy=buddy, num_nodes=dataset.num_nodes,
            hidden_channels=cfg.hidden_channels,
            use_embedding=self.use_embedding,
            propagate=cfg.propagate_embeddings, sign_k=max(cfg.sign_k, 1),
            sign_dropout=cfg.sign_dropout, dtype=_dtype_from_cfg(cfg))
        self.optimizer = make_optimizer(cfg)
        self.loss_fn = get_loss(cfg.loss)
        self.use_feature = use_feature
        # data parallelism over the link batch: tables replicated, the batch
        # dimension sharded on the mesh's "data" axis; XLA inserts the grad
        # psum (new scope vs the single-device reference, SURVEY.md §2d)
        self.mesh = _mesh_from_cfg(cfg)
        self._data: Dict[str, Dict[str, jnp.ndarray]] = {}
        self.stage("train", dataset)

    def _replicate(self, a: jnp.ndarray) -> jnp.ndarray:
        return _replicate_on(self.mesh, a)

    def _shard_batch_dim(self, a: jnp.ndarray, axis: int = 1) -> jnp.ndarray:
        return _shard_axis_on(self.mesh, a, axis)

    # -- data staging -------------------------------------------------------
    def stage(self, split: str, ds: LinkDataset):
        # re-staging must invalidate jits specialised to the old staging
        # (the train epoch jit bakes in the link count)
        if split == "train" and hasattr(self, "_epoch_jit"):
            del self._epoch_jit
        # Every per-link scalar/row (sf, label, endpoint degrees, RA) is
        # static for the split, so pack them into ONE [L, F] f32 row array.
        # The per-batch gather is then a single wide row gather instead of
        # five — on TPU scalar-element gathers cost ~27ns each while row
        # gathers run at HBM bandwidth (measured, tools/probe_step_parts.py:
        # 8.2ms -> ~1ms of the 11.5ms step at B=131k).
        sf = np.asarray(ds.subgraph_features, dtype=np.float32)
        labels = np.asarray(ds.labels, dtype=np.float32)[:, None]
        deg = np.asarray(ds.degrees, dtype=np.float32)
        links_np = np.asarray(ds.links)
        cols = [sf, labels, deg[links_np[:, 0]][:, None],
                deg[links_np[:, 1]][:, None]]
        if self.cfg.use_RA:
            cols.append(np.asarray(ds.RA, dtype=np.float32)[:, None])
        d = {
            "links": jnp.asarray(ds.links),
            "rows": jnp.asarray(np.concatenate(cols, axis=1)),
        }
        self._sf_dim = sf.shape[1]
        if self.use_embedding and self.cfg.propagate_embeddings:
            d["edge_index"] = jnp.asarray(ds.edge_index)
            # staged differentiable SpMM plan for the per-step SIGN
            # diffusion of the embedding table (the ddi configuration runs
            # a full-graph SpMM chain inside every training step).
            # train-only: eval/predict never reads the plan
            self._emb_spmm_plans = getattr(self, "_emb_spmm_plans", {})
            if self.cfg.use_plan and split == "train":
                from subgraph_sketching_tpu.ops.graph_ops import gcn_norm
                from subgraph_sketching_tpu.ops.segment_scan import PlanSpmm
                ein, wn, _ = gcn_norm(jnp.asarray(ds.edge_index), None,
                                      ds.num_nodes, None)
                plan = PlanSpmm.try_build(
                    np.asarray(ein), np.asarray(wn), ds.num_nodes,
                    max_slots=self.cfg.max_gather_slots)
                if plan is not None:
                    self._emb_spmm_plans[split] = plan
                    d["emb_spmm_tables"] = plan.tables
        if self.frozen_emb is not None:
            d["frozen_emb"] = self.frozen_emb
        if self.use_feature:
            d["x"] = jnp.asarray(ds.x)
        d = {k: self._replicate(v) for k, v in d.items()}
        self._data[split] = d
        # positive count, for pos/neg-aligned eval subsampling (citation2)
        self._num_pos = getattr(self, "_num_pos", {})
        self._num_pos[split] = int(np.asarray(ds.labels).sum())

    def _batch(self, data, idx):
        """Gather one batch by link indices (idx may contain -1 padding)."""
        safe = jnp.maximum(idx, 0)
        links = data["links"][safe]
        rows = data["rows"][safe]
        c = self._sf_dim
        batch = {
            "sf": rows[:, :c],
            "labels": rows[:, c],
            "mask": (idx >= 0),
            "links": links,
            "src_degree": rows[:, c + 1],
            "dst_degree": rows[:, c + 2],
        }
        if self.use_embedding and self.cfg.propagate_embeddings:
            batch["edge_index"] = data["edge_index"]
            if "emb_spmm_tables" in data:
                batch["emb_spmm_tables"] = data["emb_spmm_tables"]
        if "frozen_emb" in data:
            batch["frozen_emb"] = data["frozen_emb"]
        if self.cfg.use_struct_feature is False:
            batch["sf"] = jnp.zeros_like(batch["sf"])
        if self.use_feature:
            batch["node_features"] = data["x"][links]
        if self.cfg.use_RA:
            batch["RA"] = rows[:, c + 3]
        return batch

    def _apply(self, params, batch_stats, batch, training, dropout_rng=None,
               emb_spmm_plan=None):
        variables = {"params": params, "batch_stats": batch_stats}
        emb_spmm_ctx = ((emb_spmm_plan, batch["emb_spmm_tables"])
                        if emb_spmm_plan is not None
                        and "emb_spmm_tables" in batch else None)
        kwargs = dict(
            links=batch["links"],
            edge_index=batch.get("edge_index"),
            frozen_table=batch.get("frozen_emb"),
            emb_spmm_ctx=emb_spmm_ctx,
            sf=batch["sf"],
            node_features=batch.get("node_features"),
            src_degree=batch["src_degree"],
            dst_degree=batch["dst_degree"],
            RA=batch.get("RA"),
            training=training,
        )
        if training:
            out, updates = self.model.apply(
                variables, **kwargs, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng})
            return out, updates["batch_stats"]
        return self.model.apply(variables, **kwargs), batch_stats

    # -- state --------------------------------------------------------------
    def init_state(self, rng: jax.Array) -> TrainState:
        data = self._data["train"]
        idx = jnp.zeros(min(2, data["links"].shape[0]), jnp.int32)
        batch = self._batch(data, idx)
        variables = self.model.init(
            {"params": rng, "dropout": rng},
            links=batch["links"], edge_index=batch.get("edge_index"),
            frozen_table=batch.get("frozen_emb"),
            sf=batch["sf"], node_features=batch.get("node_features"),
            src_degree=batch["src_degree"], dst_degree=batch["dst_degree"],
            RA=batch.get("RA"), training=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        return TrainState(params, batch_stats, self.optimizer.init(params))

    # -- jitted fns ---------------------------------------------------------
    def _train_epoch_fn(self, n_used: int, steps: int):
        # the staged split arrays ride as a jit ARGUMENT: closed-over device
        # arrays become executable constants, which bloats the program and
        # overflows the remote-compile request at scale (HTTP 413 observed
        # at 500k nodes / 7M links)
        emb_plan = getattr(self, "_emb_spmm_plans", {}).get("train")

        def epoch(state: TrainState, rng: jax.Array, data):
            perm_key, rng = jax.random.split(rng)
            perm = _device_permutation(perm_key,
                                       int(data["links"].shape[0]),
                                       self.cfg.batch_size, n_used, steps,
                                       self.mesh)

            def step(carry, inp):
                st, key = carry
                idx = inp
                key, dkey = jax.random.split(key)
                batch = self._batch(data, idx)

                def loss_fn(params):
                    logits, new_bs = self._apply(params, st.batch_stats, batch,
                                                 True, dkey,
                                                 emb_spmm_plan=emb_plan)
                    loss = self.loss_fn(logits, batch["labels"], batch["mask"])
                    return loss, new_bs

                (loss, new_bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params)
                updates, new_opt = self.optimizer.update(grads, st.opt_state,
                                                         st.params)
                new_params = optax.apply_updates(st.params, updates)
                return (TrainState(new_params, new_bs, new_opt), key), loss

            (state, _), losses = jax.lax.scan(step, (state, rng), perm)
            return state, losses

        # donate the input TrainState: params/opt_state buffers are consumed
        # by the update, so XLA reuses them in place (halves peak state HBM)
        return jax.jit(epoch, donate_argnums=(0,))

    def _predict_fn(self):
        def predict(state: TrainState, data, idx):
            batch = self._batch(data, idx)
            logits, _ = self._apply(state.params, state.batch_stats, batch,
                                    False)
            return logits.ravel()

        return jax.jit(predict)

    # -- public API ---------------------------------------------------------
    def num_links(self, split: str) -> int:
        return int(self._data[split]["links"].shape[0])

    def train_epoch(self, state: TrainState, rng: np.random.Generator,
                    epoch_rng: jax.Array) -> Tuple[TrainState, float]:
        """One epoch.  ``epoch_rng`` seeds both the on-device shuffle and the
        dropout stream; the host ``rng`` is unused (kept for API stability)."""
        data = self._data["train"]
        if not hasattr(self, "_epoch_jit"):
            n_used, steps = _epoch_plan(int(data["links"].shape[0]),
                                        self.cfg.batch_size,
                                        self.cfg.train_samples)
            self._epoch_jit = self._train_epoch_fn(n_used, steps)
        state, losses = self._epoch_jit(state, epoch_rng, data)
        # reference reports sum(loss * batch_size) / num_links (train.py:77,89)
        total = float(jnp.sum(losses) * self.cfg.batch_size)
        return state, total / data["links"].shape[0]

    def predict(self, state: TrainState, split: str,
                n_samples: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """(pred, labels) over the split's links in order, batched at
        eval_batch_size (reference get_buddy_preds, inference.py:99-140)."""
        if not hasattr(self, "_pred_jit"):
            self._pred_jit = self._predict_fn()
        data = self._data[split]
        total = int(data["links"].shape[0])
        sel = eval_subset(total, n_samples, self.cfg.dataset_name,
                          getattr(self, "_num_pos", {}).get(split))
        # pad with -1: _batch masks negative indices out
        pred = batched_predict(
            lambda idx: self._pred_jit(state, data, jnp.asarray(idx)),
            sel, self.cfg.eval_batch_size, pad_value=-1)
        labels = np.asarray(data["rows"][:, self._sf_dim])[sel]
        return pred, labels


# ------------------------------------------------------------------- ELPH --

class ElphEmbedding(nn.Module):
    """Trainable transductive node-embedding table for the ELPH path
    (reference select_embedding, utils.py:46-63).  With ``propagate=True``
    the table is SIGN-diffused over the normalised adjacency before lookup
    (reference propagate_embeddings_func, models/elph.py:148-151, invoked
    per batch in train_elph, runners/train.py:191-192 — the ogbl-ddi
    configuration where nodes have no features)."""

    num_nodes: int
    hidden_channels: int
    propagate: bool = False
    sign_k: int = 1
    sign_dropout: float = 0.5
    dtype: Any = None

    @nn.compact
    def __call__(self, links=None, edge_index=None, mask=None,
                 frozen_table=None, spmm_ctx=None, *,
                 training: bool = False):
        table = _node_embedding_table(
            self, self.num_nodes, self.hidden_channels, self.propagate,
            self.sign_k, self.sign_dropout, self.dtype, edge_index, mask,
            frozen_table, spmm_ctx, training)
        return table if links is None else table[links]


class ElphTrainer:
    """ELPH: full-graph GCN encoder inside the loss + precomputed sketches.

    The reference runs the full-graph forward (hashes + features) once per
    batch (train.py:188-204).  Here the sketch side is hoisted to
    preprocessing (identical values, gradient-free) and only the feature GCN
    runs inside the jitted step.
    """

    def __init__(self, cfg: Config, dataset: LinkDataset,
                 sketch_params, num_features: Optional[int]):
        self.cfg = cfg
        self.sketch_params = sketch_params
        use_feature = cfg.use_feature and dataset.x is not None
        self.use_feature = use_feature
        self.use_embedding = (cfg.train_node_embedding
                              or cfg.pretrained_node_embedding is not None)
        self.frozen_emb = _load_frozen_embedding(cfg, dataset.num_nodes)
        self.num_nodes = dataset.num_nodes
        self.gnn = ELPH(sketch_params, cfg.hidden_channels, use_feature,
                        cfg.feature_prop, cfg.feature_dropout,
                        _dtype_from_cfg(cfg))
        self.predictor = LinkPredictor(
            sketch_params.sf_dim, cfg.hidden_channels, use_feature,
            self.use_embedding, cfg.label_dropout, cfg.feature_dropout,
            _dtype_from_cfg(cfg))
        self.embedding = (ElphEmbedding(
            dataset.num_nodes, cfg.hidden_channels,
            propagate=cfg.propagate_embeddings, sign_k=max(cfg.sign_k, 1),
            sign_dropout=cfg.sign_dropout, dtype=_dtype_from_cfg(cfg))
            if self.use_embedding else None)
        self.optimizer = make_optimizer(cfg)
        self.loss_fn = get_loss(cfg.loss)
        # DP over the link batch; with "graph"/"lane" mesh axes the sketch
        # build is edge-sharded, features lane-sharded, and the staged edge
        # arrays are sharded so GSPMD partitions the GCN SpMM in the epoch
        self.mesh = _mesh_from_cfg(cfg)
        self._has_graph = (self.mesh is not None
                           and "graph" in self.mesh.axis_names)
        self._has_lane = (self.mesh is not None
                          and "lane" in self.mesh.axis_names)
        # memory-sharded mode: sketch state stays node-partitioned (1/D per
        # device) through training; per-batch features are psum-assembled
        # inside the step (parallel/node_sharded.py) — the citation2-scale
        # configuration.  Only meaningful with struct features on.
        self._memory_sharded = (cfg.memory_sharded and self._has_graph
                                and cfg.use_struct_feature)
        self._data: Dict[str, Dict[str, jnp.ndarray]] = {}
        self.stage("train", dataset)

    def stage(self, split: str, ds: LinkDataset):
        from subgraph_sketching_tpu.sketch.elph import (
            build_hash_tables, initialise_sketches, subgraph_features_batched,
        )
        # re-staging must invalidate jits specialised to the old staging:
        # the eval forward closes over this split's plan + num_nodes, the
        # train epoch jit bakes in the link count
        getattr(self, "_feats_jits", {}).pop(split, None)
        if split == "train" and hasattr(self, "_epoch_jit"):
            del self._epoch_jit
        ei, w, mask = ds.edge_index, ds.edge_weight, None
        if self._has_graph:
            D = self.mesh.shape["graph"]
            E = ei.shape[1]
            pad = (-E) % D
            if pad:
                ei = np.concatenate([ei, np.zeros((2, pad), ei.dtype)], axis=1)
                w = np.concatenate([w, np.zeros((pad,), w.dtype)])
            mask = np.concatenate([np.ones(E, bool), np.zeros(pad, bool)])
        if self.cfg.use_struct_feature is False:
            # reference zeroes the structure features under
            # --use_struct_feature 0 (train.py:203-206, inference.py:189-192);
            # skip the sketch build entirely — zeros ARE the staged features
            sf = np.zeros((ds.links.shape[0], self.sketch_params.sf_dim),
                          np.float32)
        elif self._memory_sharded:
            sf = None  # extracted per batch inside the step, from shards
        elif ds.sketches is not None and ds.sketch_perm is not None:
            # the dataset carries POSITION-ordered node-sharded tables
            # (built under a graph mesh): features must translate node ids
            # through the perm — raw-id gathers would read the wrong rows
            if not self._has_graph:
                raise ValueError(
                    "dataset carries node-sharded sketches but this trainer "
                    "has no 'graph' mesh axis; rebuild the dataset without "
                    "a mesh or configure --mesh_axes with 'graph'")
            from subgraph_sketching_tpu.graph.preprocess import (
                _chunked_node_sharded_features,
            )
            sf = _chunked_node_sharded_features(
                ds.links, ds.sketches, self.sketch_params, self.mesh,
                self.cfg, perm=ds.sketch_perm)
        else:
            sketches = ds.sketches
            if sketches is None:
                # sketches depend only on the message graph; eval splits
                # normally share the train graph — reuse its tables (same
                # dedupe as build_all_splits / the memory-sharded path).
                # SINGLE slot, keyed by graph equality: holding one table
                # set bounds retention (stacks are GBs at citation2 scale)
                # while covering the staging order train -> valid -> test
                cached = getattr(self, "_sk_graph", None)
                if (cached is not None
                        and cached[1] == ds.num_nodes
                        and cached[0].shape == ds.edge_index.shape
                        and np.array_equal(cached[0], ds.edge_index)):
                    sketches = cached[2]
                elif self._has_graph:
                    from subgraph_sketching_tpu.parallel.dist_sketch import (
                        edge_sharded_build_hash_tables,
                    )
                    mh0, hll0 = initialise_sketches(ds.num_nodes,
                                                    self.sketch_params)
                    sketches = edge_sharded_build_hash_tables(
                        jnp.asarray(ei), ds.num_nodes, self.sketch_params,
                        self.mesh, jnp.asarray(mh0), jnp.asarray(hll0),
                        mask=jnp.asarray(mask))
                else:
                    from subgraph_sketching_tpu.ops.segment_scan import \
                        make_auto_plan
                    plan = (make_auto_plan(ds.edge_index, ds.num_nodes,
                                           max_slots=self.cfg.max_gather_slots)
                            if self.cfg.use_plan else None)
                    sketches = build_hash_tables(
                        jnp.asarray(ei), ds.num_nodes, self.sketch_params,
                        plan=plan, hops_only=self.cfg.hops_only_sketches)
                self._sk_graph = (ds.edge_index, ds.num_nodes, sketches)
            if self._has_lane:
                from subgraph_sketching_tpu.parallel.dist_sketch import (
                    lane_sharded_subgraph_features_batched,
                )
                sf = lane_sharded_subgraph_features_batched(
                    ds.links, sketches, self.sketch_params, self.mesh)
            else:
                sf = subgraph_features_batched(ds.links, sketches,
                                               self.sketch_params)
        d = {
            "links": _replicate_on(self.mesh, jnp.asarray(ds.links)),
            "labels": _replicate_on(self.mesh, jnp.asarray(ds.labels)),
            "num_nodes": ds.num_nodes,
        }
        if sf is not None:
            d["sf"] = _replicate_on(self.mesh, jnp.asarray(sf))
        else:
            # memory-sharded: stage the 1/D node-partitioned sketch tables
            # (built once per distinct message graph) + the locality perm;
            # they ride as jit args into the epoch scan and eval scorer
            d.update(self._stage_memory_sharded(split, ds))
        if self._has_graph:
            from jax.sharding import NamedSharding, PartitionSpec as P
            d["edge_index"] = jax.device_put(
                jnp.asarray(ei), NamedSharding(self.mesh, P(None, "graph")))
            d["edge_weight"] = jax.device_put(
                jnp.asarray(w), NamedSharding(self.mesh, P("graph")))
            d["mask"] = jax.device_put(
                jnp.asarray(mask), NamedSharding(self.mesh, P("graph")))
        else:
            d["edge_index"] = _replicate_on(self.mesh, jnp.asarray(ei))
            d["edge_weight"] = _replicate_on(self.mesh, jnp.asarray(w))
        if self.frozen_emb is not None:
            d["frozen_emb"] = _replicate_on(self.mesh, self.frozen_emb)
        if self.use_feature:
            d["x"] = _replicate_on(self.mesh, jnp.asarray(ds.x))
        # staged differentiable SpMM plans: the scatter SpMM is the step
        # bottleneck at scale (plan reduce ~3.7x); tables ride as jit args
        # so they never become compile constants
        self._spmm_plans = getattr(self, "_spmm_plans", {})
        self._emb_spmm_plans = getattr(self, "_emb_spmm_plans", {})
        if (not self._has_graph) and self.cfg.use_plan:
            from subgraph_sketching_tpu.ops.graph_ops import gcn_norm
            from subgraph_sketching_tpu.ops.segment_scan import PlanSpmm
            if self.use_feature:
                # eval splits usually share the train message graph —
                # reuse its plan instead of re-sorting per split
                self._plan_edges = getattr(self, "_plan_edges", {})
                reuse = next(
                    (s for s, (e, w, nn_) in self._plan_edges.items()
                     if nn_ == ds.num_nodes
                     and e.shape == ds.edge_index.shape
                     and np.array_equal(e, ds.edge_index)
                     and np.array_equal(w, ds.edge_weight)), None)
                if reuse is not None:
                    self._spmm_plans[split] = self._spmm_plans[reuse]
                    # keep this split's edge record current too, or a later
                    # split could match a stale record left from a previous
                    # staging of this split against a different graph
                    self._plan_edges[split] = self._plan_edges[reuse]
                    d["spmm_tables"] = self._data[reuse]["spmm_tables"]
                else:
                    # a re-staged split must not leave stale reuse records
                    self._plan_edges.pop(split, None)
                    self._spmm_plans.pop(split, None)
                    ein, wn, _ = gcn_norm(jnp.asarray(ds.edge_index),
                                          jnp.asarray(ds.edge_weight),
                                          ds.num_nodes, None)
                    plan = PlanSpmm.try_build(
                        np.asarray(ein), np.asarray(wn), ds.num_nodes,
                        max_slots=self.cfg.max_gather_slots)
                    if plan is not None:
                        self._spmm_plans[split] = plan
                        self._plan_edges[split] = (ds.edge_index,
                                                   ds.edge_weight,
                                                   ds.num_nodes)
                        d["spmm_tables"] = tuple(
                            _replicate_on(self.mesh, t)
                            for t in plan.tables)
            if (split == "train" and self.use_embedding
                    and self.cfg.propagate_embeddings):
                # per-step SIGN diffusion of the embedding table (ddi
                # shape) uses the UNWEIGHTED gcn_norm (reference
                # propagate_embeddings_func); train-only — eval diffuses
                # once per predict, where scatter is fine
                ein, wn, _ = gcn_norm(jnp.asarray(ds.edge_index), None,
                                      ds.num_nodes, None)
                plan = PlanSpmm.try_build(
                    np.asarray(ein), np.asarray(wn), ds.num_nodes,
                    max_slots=self.cfg.max_gather_slots)
                if plan is not None:
                    self._emb_spmm_plans[split] = plan
                    d["emb_spmm_tables"] = tuple(
                        _replicate_on(self.mesh, t) for t in plan.tables)
        self._data[split] = d
        # positive count, for pos/neg-aligned eval subsampling (citation2)
        self._num_pos = getattr(self, "_num_pos", {})
        self._num_pos[split] = int(np.asarray(ds.labels).sum())

    def _stage_memory_sharded(self, split: str, ds: LinkDataset):
        """Build (or reuse) the node-partitioned sketch tables for this
        split's message graph: 1/D rows per device, locality partition,
        halo-exchange construction.  Returns the staged entries — the
        sharded tables + the id->row perm — that ride as jit args into the
        epoch scan and the eval scorer."""
        from subgraph_sketching_tpu.parallel.node_sharded import (
            make_node_partition, node_sharded_build_hash_tables,
        )
        from subgraph_sketching_tpu.sketch.elph import initialise_sketches
        keys = ("sk_minhash", "sk_hll", "sk_cards", "sk_perm")
        self._ms_graphs = getattr(self, "_ms_graphs", {})
        self._ms_graphs.pop(split, None)  # re-staging must not self-match
        # sketches depend only on the message graph; eval splits normally
        # share the train graph — reuse its tables (same dedupe the
        # preprocessing path does via LinkDataset.sketches)
        reuse = next(
            (s for s, (e, n) in self._ms_graphs.items()
             if n == ds.num_nodes and e.shape == ds.edge_index.shape
             and np.array_equal(e, ds.edge_index)), None)
        if reuse is not None:
            self._ms_graphs[split] = self._ms_graphs[reuse]
            return {k: self._data[reuse][k] for k in keys}
        D = self.mesh.shape["graph"]
        part = make_node_partition(ds.edge_index, ds.num_nodes, D)
        mh0, hll0 = part.pad_init(
            *initialise_sketches(ds.num_nodes, self.sketch_params))
        sk = node_sharded_build_hash_tables(
            part, self.sketch_params, self.mesh, mh0, hll0,
            max_gather_rows=self.cfg.max_gather_slots)
        self._ms_graphs[split] = (ds.edge_index, ds.num_nodes)
        return {"sk_minhash": sk.minhash, "sk_hll": sk.hll,
                "sk_cards": sk.cards,
                "sk_perm": _replicate_on(self.mesh, jnp.asarray(part.perm))}

    def _ms_features(self, data, links):
        """Per-batch subgraph features psum-assembled from the 1/D-sharded
        tables (parallel/node_sharded.py); identical values to the
        single-device subgraph_features path."""
        from subgraph_sketching_tpu.parallel.node_sharded import (
            node_sharded_subgraph_features,
        )
        from subgraph_sketching_tpu.sketch.params import Sketches
        sk = Sketches(minhash=data["sk_minhash"], hll=data["sk_hll"],
                      cards=data["sk_cards"])
        return node_sharded_subgraph_features(
            links, sk, self.sketch_params, self.mesh, perm=data["sk_perm"])

    def _node_feats(self, params, batch_stats, data, training,
                    dropout_rng=None, plan=None):
        variables = {"params": params, "batch_stats": batch_stats}
        spmm_ctx = ((plan, data["spmm_tables"])
                    if plan is not None and "spmm_tables" in data else None)
        kwargs = dict(edge_weight=data["edge_weight"],
                      mask=data.get("mask"), spmm_ctx=spmm_ctx,
                      training=training)
        x = data["x"] if self.use_feature else None
        if training:
            (feats, _), updates = self.gnn.apply(
                variables, x, data["edge_index"], data["num_nodes"],
                mutable=["batch_stats"], rngs={"dropout": dropout_rng},
                **kwargs)
            return feats, updates["batch_stats"]
        feats, _ = self.gnn.apply(variables, x, data["edge_index"],
                                  data["num_nodes"], **kwargs)
        return feats, batch_stats

    def init_state(self, rng: jax.Array) -> TrainState:
        data = self._data["train"]
        x = data["x"] if self.use_feature else None
        gnn_vars = self.gnn.init({"params": rng, "dropout": rng}, x,
                                 data["edge_index"], data["num_nodes"],
                                 edge_weight=data["edge_weight"],
                                 mask=data.get("mask"), training=False)
        feats, _ = self.gnn.apply(gnn_vars, x, data["edge_index"],
                                  data["num_nodes"],
                                  edge_weight=data["edge_weight"],
                                  mask=data.get("mask"), training=False)
        links0 = data["links"][:2]
        sf0 = (data["sf"][:2] if "sf" in data
               else jnp.zeros((2, self.sketch_params.sf_dim), jnp.float32))
        nf0 = feats[links0] if feats is not None else None
        emb0 = None
        emb_vars = {}
        if self.use_embedding:
            emb_vars = self.embedding.init(
                {"params": rng, "dropout": rng}, links0,
                edge_index=data["edge_index"], mask=data.get("mask"),
                frozen_table=data.get("frozen_emb"), training=False)
            emb0 = self._emb_rows(emb_vars.get("params", {}),
                                  emb_vars.get("batch_stats", {}),
                                  links0, data, False)[0]
        pred_vars = self.predictor.init({"params": rng, "dropout": rng}, sf0,
                                        nf0, emb0, training=False)
        # the GCN side has no parameters when use_feature=False (the
        # ogbl-ddi configuration: sketches + embeddings only)
        params = {"gnn": gnn_vars.get("params", {}),
                  "predictor": pred_vars["params"]}
        if self.use_embedding:
            # frozen table + no diffusion => the embedding side may have no
            # params at all
            params["embedding"] = emb_vars.get("params", {})
        batch_stats = {"gnn": gnn_vars.get("batch_stats", {}),
                       "predictor": pred_vars.get("batch_stats", {}),
                       "embedding": emb_vars.get("batch_stats", {})}
        return TrainState(params, batch_stats, self.optimizer.init(params))

    def _emb_rows(self, params, batch_stats, links, data, training,
                  dropout_rng=None, plan=None):
        """Per-link embedding rows, SIGN-diffusing the table first when
        ``--propagate_embeddings`` (reference runners/train.py:191-192)."""
        variables = {"params": params, "batch_stats": batch_stats}
        spmm_ctx = ((plan, data["emb_spmm_tables"])
                    if plan is not None and "emb_spmm_tables" in data
                    else None)
        kwargs = dict(edge_index=data.get("edge_index"),
                      mask=data.get("mask"),
                      frozen_table=data.get("frozen_emb"),
                      spmm_ctx=spmm_ctx, training=training)
        if training:
            rows, updates = self.embedding.apply(
                variables, links, mutable=["batch_stats"],
                rngs={"dropout": dropout_rng}, **kwargs)
            return rows, updates["batch_stats"]
        return self.embedding.apply(variables, links, **kwargs), batch_stats

    def _train_epoch_fn(self, n_used: int, steps: int):
        # staged arrays ride as a jit argument (see BuddyTrainer: closure
        # constants overflow the remote compile at scale); num_nodes is a
        # static shape parameter and stays a closure constant
        num_nodes = self._data["train"]["num_nodes"]
        spmm_plan = self._spmm_plans.get("train")
        emb_plan = self._emb_spmm_plans.get("train")

        def epoch(state: TrainState, rng: jax.Array, arrays):
            data = dict(arrays, num_nodes=num_nodes)
            perm_key, rng = jax.random.split(rng)
            perm = _device_permutation(perm_key,
                                       int(data["links"].shape[0]),
                                       self.cfg.batch_size, n_used, steps,
                                       self.mesh)

            def step(carry, idx):
                st, key = carry
                key, k1, k2, k3 = jax.random.split(key, 4)
                safe = jnp.maximum(idx, 0)
                links_b = data["links"][safe]
                # memory-sharded: features come from the 1/D sketch shards
                # per batch (gradient-free, like the staged sf)
                sf_b = (jax.lax.stop_gradient(
                            self._ms_features(data, links_b))
                        if self._memory_sharded else data["sf"][safe])
                labels_b = data["labels"][safe]
                mask = idx >= 0

                def loss_fn(params):
                    feats, new_gnn_bs = self._node_feats(
                        params["gnn"], st.batch_stats["gnn"], data, True, k1,
                        plan=spmm_plan)
                    nf = feats[links_b] if feats is not None else None
                    emb_b, new_emb_bs = None, st.batch_stats["embedding"]
                    if self.use_embedding:
                        emb_b, new_emb_bs = self._emb_rows(
                            params["embedding"],
                            st.batch_stats["embedding"], links_b, data,
                            True, k3, plan=emb_plan)
                    pv = {"params": params["predictor"],
                          "batch_stats": st.batch_stats["predictor"]}
                    logits, updates = self.predictor.apply(
                        pv, sf_b, nf, emb_b, training=True,
                        mutable=["batch_stats"], rngs={"dropout": k2})
                    loss = self.loss_fn(logits, labels_b, mask)
                    return loss, {"gnn": new_gnn_bs,
                                  "predictor": updates["batch_stats"],
                                  "embedding": new_emb_bs}

                (loss, new_bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(st.params)
                updates, new_opt = self.optimizer.update(grads, st.opt_state,
                                                         st.params)
                new_params = optax.apply_updates(st.params, updates)
                return (TrainState(new_params, new_bs, new_opt), key), loss

            (state, _), losses = jax.lax.scan(step, (state, rng), perm)
            return state, losses

        # donate the input TrainState: params/opt_state buffers are consumed
        # by the update, so XLA reuses them in place (halves peak state HBM)
        return jax.jit(epoch, donate_argnums=(0,))

    def num_links(self, split: str) -> int:
        return int(self._data[split]["links"].shape[0])

    def train_epoch(self, state: TrainState, rng: np.random.Generator,
                    epoch_rng: jax.Array) -> Tuple[TrainState, float]:
        """One epoch.  ``epoch_rng`` seeds both the on-device shuffle and the
        dropout stream; the host ``rng`` is unused (kept for API stability)."""
        data = self._data["train"]
        if not hasattr(self, "_epoch_jit"):
            n_used, steps = _epoch_plan(int(data["links"].shape[0]),
                                        self.cfg.batch_size,
                                        self.cfg.train_samples)
            self._epoch_jit = self._train_epoch_fn(n_used, steps)
        arrays = {k: v for k, v in data.items() if k != "num_nodes"}
        state, losses = self._epoch_jit(state, epoch_rng, arrays)
        total = float(jnp.sum(losses) * self.cfg.batch_size)
        return state, total / data["links"].shape[0]

    def predict(self, state: TrainState, split: str,
                n_samples: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Full-graph forward once, then batched feature lookup + scoring
        (reference get_elph_preds, inference.py:167-205)."""
        data = self._data[split]
        # jit the eval-time full-graph forward: eagerly it is dozens of op
        # dispatches, each paying the remote-relay roundtrip at scale
        self._feats_jits = getattr(self, "_feats_jits", {})
        fj = self._feats_jits.get(split)
        if fj is None:
            plan = self._spmm_plans.get(split)
            num_nodes = data["num_nodes"]

            def _feats(params, batch_stats, arrays):
                d2 = dict(arrays, num_nodes=num_nodes)
                return self._node_feats(params, batch_stats, d2, False,
                                        plan=plan)[0]

            fj = jax.jit(_feats)
            self._feats_jits[split] = fj
        arrays = {k: v for k, v in data.items() if k != "num_nodes"}
        feats = fj(state.params["gnn"], state.batch_stats["gnn"], arrays)
        total = int(data["links"].shape[0])
        sel = eval_subset(total, n_samples, self.cfg.dataset_name,
                          getattr(self, "_num_pos", {}).get(split))

        emb_table = None
        if self.use_embedding:
            # diffuse the table once per predict, then gather per batch
            # (reference get_elph_preds, inference.py:179-180)
            emb_table = self._emb_rows(state.params["embedding"],
                                       state.batch_stats["embedding"],
                                       None, data, False)[0]

        if not hasattr(self, "_score_jit"):
            # state/feats are traced args so eval compiles once, not per
            # split per epoch.  Memory-sharded: the per-batch features are
            # assembled from the 1/D sketch shards inside the jit (sk_args
            # is the staged shard pytree; an empty dict otherwise).
            def _score(params, batch_stats, feats_, emb_table_, links_b,
                       sf_b, sk_args):
                if self._memory_sharded:
                    sf_b = self._ms_features(sk_args, links_b)
                nf = feats_[links_b] if feats_ is not None else None
                emb_b = (emb_table_[links_b]
                         if emb_table_ is not None else None)
                pv = {"params": params["predictor"],
                      "batch_stats": batch_stats["predictor"]}
                return self.predictor.apply(pv, sf_b, nf, emb_b,
                                            training=False).ravel()
            self._score_jit = jax.jit(_score)

        sk_args = ({k: data[k]
                    for k in ("sk_minhash", "sk_hll", "sk_cards", "sk_perm")}
                   if self._memory_sharded and "sk_minhash" in data else {})

        def score(idx):
            j = jnp.asarray(idx)
            sf_b = (data["sf"][j] if "sf" in data
                    else jnp.zeros((len(idx), self.sketch_params.sf_dim),
                                   jnp.float32))
            return self._score_jit(state.params, state.batch_stats, feats,
                                   emb_table, data["links"][j], sf_b,
                                   sk_args)

        pred = batched_predict(score, sel, self.cfg.eval_batch_size)
        labels = np.asarray(data["labels"])[sel]
        return pred, labels
