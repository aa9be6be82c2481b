"""ELPH: full-graph GNN propagating hashes and features in lockstep.

Per hop k: sketches advance by segment-min/max (no gradients — integer data)
while node features advance through a GCNConv; the model returns the final
features plus all per-hop sketches for the predictor stage
(reference src/models/elph.py:98-218).

TPU-first notes: the whole forward jits to one XLA program; the sketch side
is integer min/max message passing (VPU + scatter), the feature side is
SpMM + dense matmul (MXU).  Hop-0 sketches are precomputed on host once and
passed in (the reference caches them on first forward,
src/models/elph.py:189-192).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from subgraph_sketching_tpu.models.gnn import GCNConv
from subgraph_sketching_tpu.models.predictor import LinkPredictor
from subgraph_sketching_tpu.ops.graph_ops import gcn_norm
from subgraph_sketching_tpu.sketch.elph import propagate_hll, propagate_minhash
from subgraph_sketching_tpu.sketch.hll import hll_count
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches


class ELPH(nn.Module):
    """Returns (node_features, Sketches) for the full graph.

    feature_prop: 'gcn' | 'residual' | 'cat' (reference src/models/elph.py:113;
    'residual'/'cat' first encode raw features to hidden_channels,
    src/models/elph.py:131-139, and 'residual' adds skip connections).
    """

    sketch_params: SketchParams
    hidden_channels: int
    use_feature: bool = True
    feature_prop: str = "gcn"
    feature_dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None  # compute dtype for the feature convs

    @nn.compact
    def __call__(self, x, edge_index, num_nodes: int,
                 init_minhash: Optional[jnp.ndarray] = None,
                 init_hll: Optional[jnp.ndarray] = None,
                 edge_weight: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 spmm_ctx: Optional[tuple] = None,
                 *, training: bool = False
                 ) -> Tuple[Optional[jnp.ndarray], Optional[Sketches]]:
        p = self.sketch_params
        with_sketches = init_minhash is not None
        src, dst = edge_index[0], edge_index[1]
        # the hash graph is unnormalised; self-loops are folded into the
        # propagation ops (reference adds them explicitly, elph.py:186)
        # with a staged SpMM plan (spmm_ctx) the norm weights are already
        # baked into the plan's slot tables
        norm = (None if spmm_ctx is not None
                else gcn_norm(edge_index, edge_weight, num_nodes, mask))

        if self.use_feature and self.feature_prop in ("residual", "cat"):
            x = nn.Dense(self.hidden_channels, name="feature_encoder",
                         dtype=self.dtype)(x)
            x = nn.Dropout(self.feature_dropout, deterministic=not training)(x)

        mhs, hlls, cards = [init_minhash], [init_hll], []
        for k in range(1, p.max_hops + 1):
            if with_sketches:
                # integer min/max message passing — inherently gradient-free
                # (reference wraps in no_grad, hashing.py:32,42)
                mhs.append(propagate_minhash(mhs[-1], src, dst, num_nodes, mask))
                hlls.append(propagate_hll(hlls[-1], src, dst, num_nodes, mask))
                cards.append(hll_count(hlls[-1], p.hll_p))
            if self.use_feature:
                out = GCNConv(self.hidden_channels, name=f"conv_{k - 1}",
                              dtype=self.dtype)(
                    x, edge_index, num_nodes, norm=norm, spmm_ctx=spmm_ctx)
                out = nn.Dropout(self.feature_dropout,
                                 deterministic=not training)(out)
                x = x + out if self.feature_prop == "residual" else out

        sketches = None
        if with_sketches:
            sketches = Sketches(minhash=jnp.stack(mhs), hll=jnp.stack(hlls),
                                cards=jnp.stack(cards, axis=1))
        return (x if self.use_feature else None), sketches


class ELPHPredictor(nn.Module):
    """Convenience wrapper bundling ELPH with its LinkPredictor head, so a
    single params tree covers the full model (reference keeps
    ``self.predictor`` inside ELPH, src/models/elph.py:125)."""

    sketch_params: SketchParams
    hidden_channels: int
    use_feature: bool = True
    use_embedding: bool = False
    feature_prop: str = "gcn"
    label_dropout: float = 0.5
    feature_dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        self.gnn = ELPH(self.sketch_params, self.hidden_channels,
                        self.use_feature, self.feature_prop,
                        self.feature_dropout, self.dtype)
        self.predictor = LinkPredictor(
            self.sketch_params.sf_dim, self.hidden_channels, self.use_feature,
            self.use_embedding, self.label_dropout, self.feature_dropout,
            self.dtype)

    def __call__(self, x, edge_index, num_nodes, init_minhash, init_hll,
                 links, edge_weight=None, mask=None, emb=None,
                 *, training: bool = False):
        """Full forward: graph pass + feature lookup + scoring for ``links``.

        Used for jit-compiling an end-to-end step; the training loop instead
        calls gnn/predictor separately to amortise the graph pass over many
        link batches (reference inference does the same, inference.py:185-194).
        """
        from subgraph_sketching_tpu.sketch.elph import subgraph_features
        node_feats, sketches = self.gnn(
            x, edge_index, num_nodes, init_minhash, init_hll, edge_weight,
            mask, training=training)
        sf = subgraph_features(links, sketches, self.sketch_params)
        nf = node_feats[links] if node_feats is not None else None
        batch_emb = emb[links] if emb is not None else None
        return self.predictor(sf, nf, batch_emb, training=training)
