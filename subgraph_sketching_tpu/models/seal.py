"""SEAL baseline models over dense padded subgraph batches.

Reference: src/models/seal.py (SEALDGCNN/SEALGCN/SEALSAGE/SEALGIN/SEALMLP).
TPU-first redesign: batches are dense [B, N, ...] stacks (graph.seal), so
per-graph convolutions vmap over the batch, center pooling is a static
slice (nodes 0/1 are always src/dst), and DGCNN's global_sort_pool is a
vectorised per-graph top-k — no torch_scatter segment machinery.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from subgraph_sketching_tpu.models.gnn import batch_norm
from subgraph_sketching_tpu.ops.graph_ops import gcn_norm, spmm
from subgraph_sketching_tpu.ops.segment import segment_sum


def batched_gcn_prop(x, edge_index, edge_weight, edge_mask, node_mask):
    """Per-graph normalised propagation: x [B,N,d], edge_index [B,E,2]."""
    def one(xg, eig, ewg, emg):
        ei = eig.T
        nei, w, m = gcn_norm(ei, ewg, xg.shape[0], emg)
        return spmm(nei, w, xg, xg.shape[0], mask=m)

    out = jax.vmap(one)(x, edge_index, edge_weight, edge_mask)
    return out * node_mask[..., None]


def batched_mean_agg(x, edge_index, edge_mask, node_mask):
    """Per-graph mean-over-neighbours aggregation (SAGE)."""
    def one(xg, eig, emg):
        src, dst = eig[:, 0], eig[:, 1]
        ones = jnp.where(emg, 1.0, 0.0)
        deg = segment_sum(ones, dst, xg.shape[0])
        msgs = jnp.where(emg[:, None], xg[src], 0.0)
        agg = segment_sum(msgs, dst, xg.shape[0])
        return agg / jnp.maximum(deg, 1.0)[:, None]

    return jax.vmap(one)(x, edge_index, edge_mask) * node_mask[..., None]


def batched_sum_agg(x, edge_index, edge_mask, node_mask):
    """Per-graph sum aggregation (GIN)."""
    def one(xg, eig, emg):
        src, dst = eig[:, 0], eig[:, 1]
        msgs = jnp.where(emg[:, None], xg[src], 0.0)
        return segment_sum(msgs, dst, xg.shape[0])

    return jax.vmap(one)(x, edge_index, edge_mask) * node_mask[..., None]


def global_sort_pool(x, node_mask, k: int):
    """Sort nodes by the last feature channel (desc), keep top k, flatten
    (PyG global_sort_pool semantics; used at reference seal.py:245).
    Graphs with fewer than k nodes are zero-padded, like PyG."""
    if x.shape[1] < k:
        pad = k - x.shape[1]
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        node_mask = jnp.pad(node_mask, ((0, 0), (0, pad)))
    key = jnp.where(node_mask, x[..., -1], -jnp.inf)
    idx = jnp.argsort(-key, axis=1)[:, :k]                  # [B, k]
    took = jnp.take_along_axis(x, idx[..., None], axis=1)   # [B, k, D]
    valid = jnp.take_along_axis(node_mask, idx, axis=1)
    took = jnp.where(valid[..., None], took, 0.0)
    return took.reshape(x.shape[0], -1), took


def global_add_pool(x, node_mask):
    return jnp.sum(x * node_mask[..., None], axis=1)


def global_mean_pool(x, node_mask):
    s = global_add_pool(x, node_mask)
    return s / jnp.maximum(node_mask.sum(axis=1), 1.0)[:, None]


def _center_pool(x):
    """nodes 0/1 in every subgraph are src/dst (reference seal.py:88-95)."""
    return x[:, 0, :] * x[:, 1, :]


class SEALMLP(nn.Module):
    """One-hot z + pooling + 2-layer MLP (reference seal.py:22-40)."""

    emb_dim: int
    dropout: float = 0.5
    pooling: str = "add"
    dtype: Optional[jnp.dtype] = None  # compute dtype; logits return f32
    use_node_embedding: bool = False   # structure-free baseline: labels only

    @nn.compact
    def __call__(self, batch, *, training: bool = False):
        # clamp like _SealBase.embed_inputs: out-of-range DRNL labels would
        # one-hot to all-zero rows (silent signal loss) instead of clamping
        z = jnp.minimum(batch["z"], self.emb_dim - 1)
        x = jax.nn.one_hot(z, self.emb_dim)
        x = x * batch["node_mask"][..., None]
        x = (global_add_pool(x, batch["node_mask"]) if self.pooling == "add"
             else global_mean_pool(x, batch["node_mask"]))
        x = nn.relu(nn.Dense(self.emb_dim, dtype=self.dtype)(x))
        x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return nn.Dense(1, dtype=self.dtype)(x).astype(jnp.float32)


class _SealBase(nn.Module):
    hidden_channels: int
    num_layers: int
    max_z: int
    use_feature: bool = False
    dropout: float = 0.5
    dtype: Optional[jnp.dtype] = None  # compute dtype; logits return f32
    # trainable transductive node embeddings — "the E in SEAL" (reference
    # select_embedding utils.py:46-63, consumed at seal.py:80-81); a frozen
    # pretrained table instead rides in ``batch["node_emb"]``
    use_node_embedding: bool = False
    num_nodes: int = 0

    def embed_inputs(self, batch):
        # clamp labels into the embedding table: disconnected node pairs can
        # produce DRNL labels >> max_z when max_dist is large (the reference
        # would index out of bounds here; the CLI default --max_dist 4 hides
        # it, reference run.py:192)
        z = jnp.minimum(batch["z"], self.max_z - 1)
        z_emb = nn.Embed(self.max_z, self.hidden_channels,
                         name="z_embedding", dtype=self.dtype)(z)
        if z_emb.ndim == 4:  # multi-label z (DE): sum the label embeddings
            z_emb = z_emb.sum(axis=2)
        x = z_emb
        if self.use_feature and batch.get("x") is not None:
            x = jnp.concatenate([z_emb, batch["x"]], axis=-1)
        if self.use_node_embedding:
            ids = jnp.maximum(batch["node_ids"], 0)  # -1 pads -> row 0
            n_emb = nn.Embed(self.num_nodes, self.hidden_channels,
                             name="node_embedding", dtype=self.dtype)(ids)
            x = jnp.concatenate([x, n_emb], axis=-1)
        elif batch.get("node_emb") is not None:  # frozen pretrained rows
            x = jnp.concatenate([x, batch["node_emb"]], axis=-1)
        return x * batch["node_mask"][..., None]


class SEALGCN(_SealBase):
    """GCN stack + center/sum/mean pooling (reference seal.py:43-113)."""

    pooling: str = "edge"

    @nn.compact
    def __call__(self, batch, *, training: bool = False):
        x = self.embed_inputs(batch)
        for li in range(self.num_layers):
            x = nn.Dense(self.hidden_channels, use_bias=True,
                         name=f"conv_dense_{li}", dtype=self.dtype)(x)
            x = batched_gcn_prop(x, batch["edge_index"], batch["edge_weight"],
                                 batch["edge_mask"], batch["node_mask"])
            if li < self.num_layers - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        if self.pooling == "edge":
            h = _center_pool(x)
        else:
            h = global_add_pool(x, batch["node_mask"])
        h = nn.relu(nn.Dense(self.hidden_channels, name="lin1",
                             dtype=self.dtype)(h))
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return nn.Dense(1, name="lin2",
                        dtype=self.dtype)(h).astype(jnp.float32)


class SEALSAGE(_SealBase):
    """SAGE stack + center pooling (reference seal.py:116-173)."""

    @nn.compact
    def __call__(self, batch, *, training: bool = False):
        x = self.embed_inputs(batch)
        for li in range(self.num_layers):
            agg = batched_mean_agg(x, batch["edge_index"], batch["edge_mask"],
                                   batch["node_mask"])
            x = (nn.Dense(self.hidden_channels, name=f"sage_n_{li}",
                          dtype=self.dtype)(agg)
                 + nn.Dense(self.hidden_channels, use_bias=False,
                            name=f"sage_r_{li}", dtype=self.dtype)(x))
            if li < self.num_layers - 1:
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not training)(x)
        h = _center_pool(x)
        h = nn.relu(nn.Dense(self.hidden_channels, name="lin1",
                             dtype=self.dtype)(h))
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return nn.Dense(1, name="lin2",
                        dtype=self.dtype)(h).astype(jnp.float32)


class SEALGIN(_SealBase):
    """GIN stack + jumping-knowledge mean pooling (reference seal.py:259-328)."""

    jk: bool = True
    train_eps: bool = False

    @nn.compact
    def __call__(self, batch, *, training: bool = False):
        x = self.embed_inputs(batch)
        xs = []
        for li in range(self.num_layers):
            agg = batched_sum_agg(x, batch["edge_index"], batch["edge_mask"],
                                  batch["node_mask"])
            eps = (self.param(f"eps_{li}", nn.initializers.zeros, ())
                   if self.train_eps else 0.0)
            h = (1.0 + eps) * x + agg
            h = nn.relu(nn.Dense(self.hidden_channels, name=f"gin_a_{li}",
                                 dtype=self.dtype)(h))
            h = nn.relu(nn.Dense(self.hidden_channels, name=f"gin_b_{li}",
                                 dtype=self.dtype)(h))
            # BN statistics over REAL nodes only: dense padding would fill
            # the flattened [B*N] batch with identical bias-constant rows
            # and skew mean/var (PyG batching has no padded nodes)
            m = (batch["node_mask"].reshape(-1) > 0)[:, None]
            h = batch_norm(training, name=f"gin_bn_{li}", dtype=self.dtype)(
                h.reshape(-1, h.shape[-1]), mask=m).reshape(h.shape)
            x = h * batch["node_mask"][..., None]
            xs.append(x)
        h = jnp.concatenate(xs, axis=-1) if self.jk else xs[-1]
        h = global_mean_pool(h, batch["node_mask"])
        h = nn.relu(nn.Dense(self.hidden_channels, name="lin1",
                             dtype=self.dtype)(h))
        h = nn.Dropout(self.dropout, deterministic=not training)(h)
        return nn.Dense(1, name="lin2",
                        dtype=self.dtype)(h).astype(jnp.float32)


class SEALDGCNN(_SealBase):
    """DGCNN: tanh GCN stack -> sort-pool(k) -> 1D convs -> MLP
    (reference seal.py:177-256)."""

    k: int = 30

    @nn.compact
    def __call__(self, batch, *, training: bool = False):
        x = self.embed_inputs(batch)
        xs = []
        dims = [self.hidden_channels] * (self.num_layers - 0) + [1]
        for li, dim in enumerate(dims):
            x = nn.Dense(dim, name=f"conv_dense_{li}", dtype=self.dtype)(x)
            x = batched_gcn_prop(x, batch["edge_index"], batch["edge_weight"],
                                 batch["edge_mask"], batch["node_mask"])
            x = jnp.tanh(x)
            xs.append(x)
        x = jnp.concatenate(xs, axis=-1)   # [B, N, num_layers*h + 1]

        _, pooled = global_sort_pool(x, batch["node_mask"], self.k)  # [B,k,D]
        # conv1d(1, 16, kernel=D, stride=D) over the flattened row == a
        # per-node Dense(16); maxpool(2,2) over nodes; conv1d(16, 32, 5)
        h = nn.Dense(16, name="conv1", dtype=self.dtype)(pooled)  # [B, k, 16]
        h = nn.relu(h)
        B, k, c = h.shape
        h = h[:, : (k // 2) * 2, :].reshape(B, k // 2, 2, c).max(axis=2)
        h = nn.Conv(32, kernel_size=(5,), padding="VALID", name="conv2",
                    dtype=self.dtype)(h)
        h = nn.relu(h)
        h = h.reshape(B, -1)
        h = nn.relu(nn.Dense(128, name="lin1", dtype=self.dtype)(h))
        h = nn.Dropout(0.5, deterministic=not training)(h)
        return nn.Dense(1, name="lin2",
                        dtype=self.dtype)(h).astype(jnp.float32)
