"""BUDDY: pure edgewise MLP over precomputed subgraph + SIGN features.

Scalable version of ELPH — all graph-dependent work happens in offline
preprocessing, so each training step touches only per-edge tensors
(reference src/models/elph.py:221-352).  This is the model that scales to
ogbl-citation2; its forward is a pure function of dense [B, ...] tensors,
which makes data-parallel sharding across a TPU mesh trivial (shard B).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from subgraph_sketching_tpu.models.gnn import SIGN, batch_norm


class BUDDY(nn.Module):
    """Edgewise link scorer.

    Inputs per batch (reference forward, src/models/elph.py:324-352):
      sf            [B, k(k+2)]   subgraph (structure) features
      node_features [B, 2, d] raw features, or [B, 2, d*(sign_k+1)] if sign_k>0
      src_degree / dst_degree [B] — for the degree-normalised feature copy
      RA            [B] resource-allocation scores (optional)
      emb           [B, 2, hidden] node embeddings (optional)
    """

    sf_dim: int                    # k(k+2) before normalised duplication
    hidden_channels: int
    use_feature: bool = True
    sign_k: int = 0
    append_normalised: bool = False  # add_normed_features
    use_RA: bool = False
    use_embedding: bool = False
    label_dropout: float = 0.5
    feature_dropout: float = 0.5
    sign_dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None  # compute dtype; logits return f32

    def _append_degree_normalised(self, x, src_degree, dst_degree):
        """x ⊕ x/sqrt(d_src * d_dst) with 0/0 -> 0
        (reference src/models/elph.py:276-293)."""
        normaliser = jnp.sqrt(src_degree * dst_degree)
        normed = x / normaliser[:, None]
        normed = jnp.where(jnp.isfinite(normed), normed, 0.0)
        return jnp.concatenate([x, normed], axis=1)

    @nn.compact
    def __call__(self, sf, node_features=None, src_degree=None, dst_degree=None,
                 RA: Optional[jnp.ndarray] = None,
                 emb: Optional[jnp.ndarray] = None, *, training: bool = False):
        if self.append_normalised:
            sf = self._append_degree_normalised(sf, src_degree, dst_degree)
        dim = self.sf_dim * 2 if self.append_normalised else self.sf_dim

        x = nn.Dense(dim, name="label_lin_layer", dtype=self.dtype)(sf)
        x = batch_norm(training, name="bn_labels", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.label_dropout, deterministic=not training)(x)

        if self.use_feature and node_features is not None:
            # (reference feature_forward, src/models/elph.py:295-311)
            if self.sign_k != 0:
                h = SIGN(self.hidden_channels, self.hidden_channels,
                         self.sign_k, self.sign_dropout, name="sign",
                         dtype=self.dtype)(node_features, training=training)
            else:
                h = nn.Dense(self.hidden_channels, name="lin_feat",
                             dtype=self.dtype)(node_features)
            h = h[:, 0, :] * h[:, 1, :]
            h = nn.Dense(self.hidden_channels, name="lin_out",
                         dtype=self.dtype)(h)
            h = batch_norm(training, name="bn_feats", dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Dropout(self.feature_dropout, deterministic=not training)(h)
            x = jnp.concatenate([x, h.astype(x.dtype)], axis=1)

        if self.use_embedding and emb is not None:
            # (reference embedding_forward, src/models/elph.py:313-322)
            e = nn.Dense(self.hidden_channels, name="lin_emb",
                         dtype=self.dtype)(emb)
            e = e[:, 0, :] * e[:, 1, :]
            e = nn.Dense(self.hidden_channels, name="lin_emb_out",
                         dtype=self.dtype)(e)
            e = batch_norm(training, name="bn_embs", dtype=self.dtype)(e)
            e = nn.relu(e)
            e = nn.Dropout(self.feature_dropout, deterministic=not training)(e)
            x = jnp.concatenate([x, e.astype(x.dtype)], axis=1)

        if self.use_RA and RA is not None:
            ra = batch_norm(training, name="bn_RA", dtype=self.dtype)(
                RA[:, None].astype(x.dtype))
            x = jnp.concatenate([x, ra], axis=1)

        return nn.Dense(1, name="lin", dtype=self.dtype)(x).astype(jnp.float32)
