"""ELPH's edgewise scoring head.

Structure-feature MLP ⊕ Hadamard-product feature MLP ⊕ optional embedding MLP
-> logit (reference src/models/elph.py:22-95).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from subgraph_sketching_tpu.models.gnn import batch_norm


class LinkPredictor(nn.Module):
    """Scores one batch of links from structure features + node features.

    sf: [B, k(k+2)]; node_features: [B, 2, hidden]; emb: [B, 2, hidden].
    Matches reference LinkPredictor.forward (src/models/elph.py:73-86).
    """

    sf_dim: int
    hidden_channels: int
    use_feature: bool = True
    use_embedding: bool = False
    label_dropout: float = 0.5
    feature_dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None  # compute dtype; logits return f32

    @nn.compact
    def __call__(self, sf, node_features=None, emb: Optional[jnp.ndarray] = None,
                 *, training: bool = False):
        x = nn.Dense(self.sf_dim, name="label_lin_layer", dtype=self.dtype)(sf)
        x = batch_norm(training, name="bn_labels", dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Dropout(self.label_dropout, deterministic=not training)(x)

        if self.use_feature and node_features is not None:
            # hadamard product of the two endpoints then a small MLP
            # (reference feature_forward, src/models/elph.py:48-60; note the
            # reference defines lin_feat but only applies lin_out)
            h = node_features[:, 0, :] * node_features[:, 1, :]
            h = nn.Dense(self.hidden_channels, name="lin_out",
                         dtype=self.dtype)(h)
            h = batch_norm(training, name="bn_feats", dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Dropout(self.feature_dropout, deterministic=not training)(h)
            x = jnp.concatenate([x, h.astype(x.dtype)], axis=1)

        if self.use_embedding and emb is not None:
            # (reference embedding_forward, src/models/elph.py:62-71)
            e = nn.Dense(self.hidden_channels, name="lin_emb",
                         dtype=self.dtype)(emb)
            e = e[:, 0, :] * e[:, 1, :]
            e = nn.Dense(self.hidden_channels, name="lin_emb_out",
                         dtype=self.dtype)(e)
            e = batch_norm(training, name="bn_embs", dtype=self.dtype)(e)
            e = nn.relu(e)
            e = nn.Dropout(self.feature_dropout, deterministic=not training)(e)
            x = jnp.concatenate([x, e.astype(x.dtype)], axis=1)

        return nn.Dense(1, name="lin", dtype=self.dtype)(x).astype(jnp.float32)
