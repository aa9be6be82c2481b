"""KGE trainer: wires the transE/distmult/complEx/rotatE baselines into the
runner (the reference leaves src/models/transx.py un-wired — run.py never
dispatches to it — so this EXCEEDS reference capability).

Link prediction as 1-relation KGE: entities are nodes, every link uses
relation id 0 (the reference's own 'single' hack, transx.py:88-100).
Each epoch alternates head- and tail-corruption batches with K random
negatives and the self-adversarial loss (transx.py:241-298), as two jitted
``lax.scan`` passes (corruption mode is a static argument of the scoring
program, so even/odd batches run in separate scans rather than branching
inside one).  Eval scores the split's links with the standard
Hits@K/MRR/AUC pipeline, so ``--model transE`` drops into the same rep
loop, metrics, and checkpointing as BUDDY/ELPH.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.models.transx import KGEModel
from subgraph_sketching_tpu.train.loops import (
    TrainState,
    eval_subset,
    make_optimizer,
)

KGE_MODELS = ("transE", "distmult", "complEx", "rotatE")


class KgeTrainer:
    """Trainer-protocol adapter (init_state / train_epoch / predict /
    num_links) over KGEModel's functional train step."""

    NUM_NEGS = 64          # corrupted entities per positive
    GAMMA = 12.0

    def __init__(self, cfg: Config, splits: Dict[str, "SplitData"]):
        self.cfg = cfg
        num_nodes = splits["train"].graph.num_nodes
        name = cfg.model
        self.model = KGEModel(
            name, nentity=num_nodes, nrelation=1,
            hidden_dim=cfg.hidden_channels, gamma=self.GAMMA,
            double_entity_embedding=name in ("rotatE", "complEx"),
            double_relation_embedding=name == "complEx")
        self.optimizer = make_optimizer(cfg)
        self.num_nodes = num_nodes
        self._splits = splits
        pos = np.asarray(splits["train"].pos_edges, dtype=np.int32)
        B = min(cfg.batch_size, max(1, len(pos)))
        steps = max(1, len(pos) // B)
        self._pos = jnp.asarray(pos)
        self._B, self._steps = B, steps
        self._epoch_jit = None

    def num_links(self, split: str) -> int:
        return len(self._splits[split].links)

    def init_state(self, rng: jax.Array) -> TrainState:
        params = self.model.init_params(rng)
        return TrainState(params, {}, self.optimizer.init(params))

    # -- epoch --------------------------------------------------------------
    def _make_epoch(self):
        model, opt = self.model, self.optimizer
        B, steps, n = self._B, self._steps, self.num_nodes
        half = max(1, steps // 2)

        def loss_fn(params, pos, negs, mode):
            neg_score = model.score_triples(
                params, negs if mode == "head-batch" else pos[:, 0],
                jnp.zeros(B, jnp.int32),
                pos[:, 1] if mode == "head-batch" else negs, mode)
            w = jax.lax.stop_gradient(jax.nn.softmax(neg_score, axis=1))
            neg_term = (w * jax.nn.log_sigmoid(-neg_score)).sum(axis=1)
            pos_score = model.score_triples(
                params, pos[:, 0], jnp.zeros(B, jnp.int32),
                pos[:, 1]).squeeze(-1)
            return -(jax.nn.log_sigmoid(pos_score).mean()
                     + neg_term.mean()) / 2

        import optax

        def epoch(state: TrainState, rng: jax.Array, pos_all):
            pk, nk1, nk2 = jax.random.split(rng, 3)
            perm = jax.random.permutation(pk, pos_all.shape[0])

            def make_step(mode):
                def step(carry, inp):
                    params, opt_state = carry
                    pos_b, negs = inp
                    loss, grads = jax.value_and_grad(
                        lambda p: loss_fn(p, pos_b, negs, mode))(params)
                    updates, opt_state = opt.update(grads, opt_state, params)
                    return (optax.apply_updates(params, updates),
                            opt_state), loss
                return step

            # first half of the shuffled batches corrupts heads, the second
            # half tails (corruption mode is static per compiled scan)
            losses = []
            carry = (state.params, state.opt_state)
            for mode, key, lo, k in (("head-batch", nk1, 0, half),
                                     ("tail-batch", nk2, half, steps - half)):
                if k == 0:
                    continue
                idx = jax.lax.dynamic_slice(perm, (lo * B,), (k * B,))
                pos_b = pos_all[idx].reshape(k, B, 2)
                negs = jax.random.randint(key, (k, B, self.NUM_NEGS), 0, n)
                carry, ls = jax.lax.scan(make_step(mode), carry,
                                         (pos_b, negs))
                losses.append(ls)
            params, opt_state = carry
            return (TrainState(params, {}, opt_state),
                    jnp.concatenate(losses).mean())

        return jax.jit(epoch, donate_argnums=(0,))

    def train_epoch(self, state: TrainState, rng: np.random.Generator,
                    epoch_rng: jax.Array) -> Tuple[TrainState, float]:
        if self._epoch_jit is None:
            self._epoch_jit = self._make_epoch()
        state, loss = self._epoch_jit(state, epoch_rng, self._pos)
        return state, float(loss)

    # -- eval ---------------------------------------------------------------
    def predict(self, state: TrainState, split: str,
                n_samples: Optional[int] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
        sd = self._splits[split]
        links = np.asarray(sd.links, dtype=np.int32)
        labels = np.asarray(sd.labels, dtype=np.float32)
        sel = eval_subset(len(links), n_samples, self.cfg.dataset_name,
                          num_pos=int(labels.sum()))
        if not hasattr(self, "_score_jit"):
            self._score_jit = jax.jit(self.model.score_links)
        from subgraph_sketching_tpu.train.loops import batched_predict
        pred = batched_predict(
            lambda idx: self._score_jit(state.params,
                                        jnp.asarray(links[idx])),
            sel, self.cfg.eval_batch_size)
        return pred, labels[sel]


def build_kge_trainer(cfg: Config, splits) -> KgeTrainer:
    return KgeTrainer(cfg, splits)
