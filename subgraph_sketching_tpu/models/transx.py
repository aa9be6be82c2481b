"""Knowledge-graph-embedding baselines: transE, distMult, complEx, rotatE.

Reference: src/models/transx.py (KGEModel, adapted there from the OGB biokg
examples; not wired into the reference's run.py either — baseline tier).
Functional JAX redesign: parameters are a plain pytree, scoring functions are
pure, and the self-adversarial negative-sampling train step is one jitted
function.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class KGEParams(NamedTuple):
    entity_embedding: jnp.ndarray    # [n_entities, entity_dim]
    relation_embedding: jnp.ndarray  # [n_relations, relation_dim]


class KGEModel:
    """Scores triples; ``mode`` semantics follow the reference
    (transx.py:84-155): 'single' scores [B] triples, 'head-batch' /
    'tail-batch' score B x K corrupted triples."""

    def __init__(self, model_name: str, nentity: int, nrelation: int,
                 hidden_dim: int, gamma: float, criterion: str = "nll",
                 double_entity_embedding: bool = False,
                 double_relation_embedding: bool = False):
        if model_name == "rotatE" and (not double_entity_embedding
                                       or double_relation_embedding):
            raise ValueError("rotatE should use double_entity_embedding")
        if model_name == "complEx" and not (double_entity_embedding
                                            and double_relation_embedding):
            raise ValueError("complEx should use double entity and relation "
                             "embeddings")
        if model_name not in ("transE", "distmult", "complEx", "rotatE"):
            raise ValueError(f"unknown KGE model {model_name}")
        self.model_name = model_name
        self.nentity = nentity
        self.nrelation = nrelation
        self.hidden_dim = hidden_dim
        self.gamma = float(gamma)
        self.epsilon = 2.0
        self.criterion = criterion
        self.embedding_range = (self.gamma + self.epsilon) / hidden_dim
        self.entity_dim = hidden_dim * 2 if double_entity_embedding else hidden_dim
        self.relation_dim = (hidden_dim * 2 if double_relation_embedding
                             else hidden_dim)

    def init_params(self, rng: jax.Array) -> KGEParams:
        k1, k2 = jax.random.split(rng)
        r = self.embedding_range
        return KGEParams(
            entity_embedding=jax.random.uniform(
                k1, (self.nentity, self.entity_dim), minval=-r, maxval=r),
            relation_embedding=jax.random.uniform(
                k2, (self.nrelation, self.relation_dim), minval=-r, maxval=r))

    # -- scoring functions (reference transx.py:176-239) --------------------
    def _score(self, head, relation, tail, mode):
        if self.model_name == "transE":
            s = (head + (relation - tail) if mode == "head-batch"
                 else (head + relation) - tail)
            return jnp.linalg.norm(s, ord=1, axis=2)
        if self.model_name == "distmult":
            s = (head * (relation * tail) if mode == "head-batch"
                 else (head * relation) * tail)
            return s.sum(axis=2)
        if self.model_name == "complEx":
            re_h, im_h = jnp.split(head, 2, axis=2)
            re_r, im_r = jnp.split(relation, 2, axis=2)
            re_t, im_t = jnp.split(tail, 2, axis=2)
            if mode == "head-batch":
                re_s = re_r * re_t + im_r * im_t
                im_s = re_r * im_t - im_r * re_t
                s = re_h * re_s + im_h * im_s
            else:
                re_s = re_h * re_r - im_h * im_r
                im_s = re_h * im_r + im_h * re_r
                s = re_s * re_t + im_s * im_t
            return s.sum(axis=2)
        # rotatE
        re_h, im_h = jnp.split(head, 2, axis=2)
        re_t, im_t = jnp.split(tail, 2, axis=2)
        phase = relation / (self.embedding_range / math.pi)
        re_r, im_r = jnp.cos(phase), jnp.sin(phase)
        if mode == "head-batch":
            re_s = re_r * re_t + im_r * im_t - re_h
            im_s = re_r * im_t - im_r * re_t - im_h
        else:
            re_s = re_h * re_r - im_h * im_r - re_t
            im_s = re_h * im_r + im_h * re_r - im_t
        s = jnp.sqrt(re_s ** 2 + im_s ** 2)
        return self.gamma - s.sum(axis=2)

    def score_triples(self, params: KGEParams, heads, relations, tails,
                      mode: str = "single") -> jnp.ndarray:
        """heads/tails: [B] or [B, K] entity ids; relations: [B] ids."""
        h = params.entity_embedding[heads]
        t = params.entity_embedding[tails]
        r = params.relation_embedding[relations]
        if h.ndim == 2:
            h = h[:, None, :]
        if t.ndim == 2:
            t = t[:, None, :]
        r = r[:, None, :] if r.ndim == 2 else r
        return self._score(h, r, t, mode)

    def score_links(self, params: KGEParams, links: jnp.ndarray) -> jnp.ndarray:
        """Relation-free link scoring like the reference's 'single' hack
        (transx.py:88-100: relation id 0 for all links)."""
        rel = jnp.zeros(links.shape[0], dtype=jnp.int32)
        return self.score_triples(params, links[:, 0], rel,
                                  links[:, 1]).squeeze(-1)

    # -- training -----------------------------------------------------------
    def make_train_step(self, optimizer: optax.GradientTransformation,
                        negative_adversarial_sampling: bool = False,
                        adversarial_temperature: float = 1.0,
                        regularization: float = 0.0):
        """Self-adversarial negative sampling step (transx.py:241-298).
        ``criterion`` (ctor arg) selects the loss like the reference's
        set_criterion (transx.py:77-82): 'nll' = the (optionally
        self-adversarial) log-sigmoid NLL; 'mrl' = margin ranking with
        margin gamma over the mean negative score."""

        def loss_fn(params, pos, negs, mode):
            # pos: [B, 3] (h, r, t); negs: [B, K] corrupted entities
            neg_score = self.score_triples(
                params, negs if mode == "head-batch" else pos[:, 0],
                pos[:, 1],
                pos[:, 2] if mode == "head-batch" else negs, mode)
            pos_score = self.score_triples(
                params, pos[:, 0], pos[:, 1], pos[:, 2]).squeeze(-1)
            if self.criterion == "mrl":
                # MarginRankingLoss(margin=gamma, y=1 for "pos above neg"):
                # max(0, gamma - (pos - neg)) on the higher-is-better scores
                loss = jnp.maximum(
                    0.0, self.gamma - (pos_score[:, None] - neg_score)
                ).mean()
            else:
                if negative_adversarial_sampling:
                    w = jax.lax.stop_gradient(
                        jax.nn.softmax(neg_score * adversarial_temperature,
                                       axis=1))
                    neg_term = (w * jax.nn.log_sigmoid(-neg_score)).sum(axis=1)
                else:
                    neg_term = jax.nn.log_sigmoid(-neg_score).mean(axis=1)
                loss = -(jax.nn.log_sigmoid(pos_score).mean()
                         + neg_term.mean()) / 2
            if regularization:
                # L3 regularisation for complEx/distMult (transx.py:276-282)
                loss = loss + regularization * (
                    (jnp.linalg.norm(params.entity_embedding.ravel(), 3) ** 3)
                    + (jnp.linalg.norm(params.relation_embedding.ravel(), 3) ** 3))
            return loss

        import functools

        @functools.partial(jax.jit, static_argnames=("mode_is_head",))
        def step(params, opt_state, pos, negs, mode_is_head: bool):
            mode = "head-batch" if mode_is_head else "tail-batch"
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, pos, negs, mode))(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step
