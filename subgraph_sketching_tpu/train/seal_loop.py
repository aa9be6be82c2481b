"""SEAL training/inference loop.

Reference: the generic ``train``/``get_preds`` path (src/runners/train.py:
92-157, src/runners/inference.py:55-95) over PyG DataLoader batches.  Here
subgraph extraction stays on host (graph/seal.py) but every batch is a dense
padded stack with static shapes, so the train step compiles once.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.seal import SEALDataset
from subgraph_sketching_tpu.models.seal import (
    SEALDGCNN, SEALGCN, SEALGIN, SEALSAGE,
)
from subgraph_sketching_tpu.train.loops import TrainState, make_optimizer
from subgraph_sketching_tpu.train.losses import get_loss


def _dgcnn_k(dataset: SEALDataset, sortpool_k: float) -> int:
    """k from the sortpool percentile of subgraph sizes, min 10
    (reference src/models/seal.py:186-197)."""
    if sortpool_k > 1:
        return max(10, int(sortpool_k))
    sample = min(1000, len(dataset))
    sizes = []
    for i in range(sample):
        nodes, *_ = dataset.extract_one(i)
        sizes.append(min(len(nodes), dataset.max_nodes))
    sizes.sort()
    k = sizes[max(0, int(math.ceil(sortpool_k * len(sizes))) - 1)]
    return max(10, int(k))


def build_seal_model(cfg: Config, train_dataset: SEALDataset,
                     num_features: Optional[int]):
    from subgraph_sketching_tpu.train.loops import _dtype_from_cfg
    use_feature = cfg.use_feature and train_dataset.x is not None
    common = dict(hidden_channels=cfg.hidden_channels,
                  num_layers=cfg.num_seal_layers, max_z=cfg.max_z,
                  use_feature=use_feature, dropout=cfg.dropout,
                  use_node_embedding=cfg.train_node_embedding,
                  num_nodes=train_dataset.A.shape[0],
                  dtype=_dtype_from_cfg(cfg))
    if cfg.model == "SEALDGCNN":
        return SEALDGCNN(**common, k=_dgcnn_k(train_dataset, cfg.sortpool_k))
    if cfg.model == "SEALGCN":
        return SEALGCN(**common, pooling=cfg.seal_pooling)
    if cfg.model == "SEALSAGE":
        return SEALSAGE(**common)
    if cfg.model == "SEALGIN":
        return SEALGIN(**common)
    if cfg.model == "SEALMLP":
        # structure-free baseline; --label_pooling picks add/mean pooling
        # (reference seal.py:22-40 defines it but never dispatches it)
        from subgraph_sketching_tpu.models.seal import SEALMLP
        return SEALMLP(emb_dim=cfg.max_z, dropout=cfg.dropout,
                       pooling=cfg.label_pooling,
                       dtype=_dtype_from_cfg(cfg))
    raise NotImplementedError(cfg.model)


class SealTrainer:
    """Host extraction + jitted dense-batch steps."""

    def __init__(self, cfg: Config, datasets: Dict[str, SEALDataset],
                 num_features: Optional[int]):
        self.cfg = cfg
        self.datasets = datasets
        self.model = build_seal_model(cfg, datasets["train"], num_features)
        from subgraph_sketching_tpu.train.loops import _load_frozen_embedding
        self.frozen_emb = _load_frozen_embedding(
            cfg, datasets["train"].A.shape[0])
        self.optimizer = make_optimizer(cfg)
        self.loss_fn = get_loss(cfg.loss)

    def _to_device(self, raw):
        # the reference passes edge weights to SEAL models only under
        # --use_edge_weight (train.py:127, inference.py:73); default is
        # unweighted message passing even on weighted graphs (collab)
        w = (raw.edge_weight if self.cfg.use_edge_weight
             else raw.edge_mask.astype(np.float32))
        batch = {"z": jnp.asarray(raw.z),
                 "node_mask": jnp.asarray(raw.node_mask),
                 "edge_index": jnp.asarray(raw.edge_index),
                 "edge_weight": jnp.asarray(w),
                 "edge_mask": jnp.asarray(raw.edge_mask)}
        if raw.x is not None:
            batch["x"] = jnp.asarray(raw.x)
        if self.model.use_node_embedding:
            batch["node_ids"] = jnp.asarray(raw.node_ids)
        elif self.frozen_emb is not None:
            # frozen pretrained rows gathered by global node id (reference
            # seal.py:80-81; -1 padding -> row 0, masked out downstream)
            ids = jnp.asarray(np.maximum(raw.node_ids, 0))
            batch["node_emb"] = self.frozen_emb[ids]
        return batch, jnp.asarray(raw.y)

    def init_state(self, rng: jax.Array) -> TrainState:
        raw = self.datasets["train"].batch(
            np.arange(min(2, len(self.datasets["train"]))))
        batch, _ = self._to_device(raw)
        variables = self.model.init({"params": rng, "dropout": rng}, batch,
                                    training=False)
        params = variables["params"]
        return TrainState(params, variables.get("batch_stats", {}),
                          self.optimizer.init(params))

    def _step_fn(self):
        @jax.jit
        def step(state: TrainState, batch, y, mask, rng):
            def loss_fn(params):
                variables = {"params": params,
                             "batch_stats": state.batch_stats}
                out = self.model.apply(variables, batch, training=True,
                                       mutable=["batch_stats"],
                                       rngs={"dropout": rng})
                logits, updates = out
                loss = self.loss_fn(logits, y, mask)
                return loss, updates.get("batch_stats", {})

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            updates, new_opt = self.optimizer.update(grads, state.opt_state,
                                                     state.params)
            return TrainState(optax.apply_updates(state.params, updates),
                              new_bs, new_opt), loss

        return step

    def num_links(self, split: str) -> int:
        return len(self.datasets[split])

    def train_epoch(self, state: TrainState, rng: np.random.Generator,
                    epoch_rng: jax.Array) -> Tuple[TrainState, float]:
        if not hasattr(self, "_step"):
            self._step = self._step_fn()
        ds = self.datasets["train"]
        n = len(ds)
        if self.cfg.dynamic_train and self.cfg.train_samples != math.inf:
            n = (int(self.cfg.train_samples * n)
                 if self.cfg.train_samples < 1 else
                 min(int(self.cfg.train_samples), n))
        perm = rng.permutation(len(ds))[:n]
        bs = self.cfg.batch_size
        losses = []  # device scalars; summed once at the end so host-side
        for s in range(0, n, bs):  # subgraph extraction overlaps device steps
            idx = perm[s:s + bs]
            pad = bs - len(idx)
            mask = np.concatenate([np.ones(len(idx), bool),
                                   np.zeros(pad, bool)])
            if pad:
                idx = np.concatenate([idx, np.zeros(pad, np.int64)])
            raw = ds.batch(idx)
            batch, y = self._to_device(raw)
            epoch_rng, key = jax.random.split(epoch_rng)
            state, loss = self._step(state, batch, y, jnp.asarray(mask), key)
            losses.append(loss)
        total = float(jnp.sum(jnp.stack(losses))) * bs if losses else 0.0
        return state, total / max(n, 1)

    def predict(self, state: TrainState, split: str,
                n_samples: Optional[int] = None) -> Tuple[np.ndarray, np.ndarray]:
        from subgraph_sketching_tpu.train.loops import (
            batched_predict, eval_subset,
        )
        ds = self.datasets[split]
        sel = eval_subset(len(ds), n_samples, self.cfg.dataset_name,
                          num_pos=int(np.asarray(ds.labels).sum()))

        if not hasattr(self, "_fwd_jit"):
            def _fwd(params, batch_stats, batch):
                variables = {"params": params, "batch_stats": batch_stats}
                return self.model.apply(variables, batch,
                                        training=False).ravel()
            self._fwd_jit = jax.jit(_fwd)

        def score(idx):
            # ds.batch() extraction stays host-side, overlapping device work
            batch, _ = self._to_device(ds.batch(idx))
            return self._fwd_jit(state.params, state.batch_stats, batch)

        pred = batched_predict(score, sel, self.cfg.batch_size)
        labels = ds.labels[sel]
        return pred, labels
