"""GNN building blocks in flax.linen: GCN conv/stacks, SAGE, SIGN.

TPU-native equivalents of the reference's PyG-based blocks
(src/models/gnn.py).  Graph convs consume static-shape COO edge lists with an
optional padding mask; SpMM/normalisation come from the ops layer.
BatchNorm: flax momentum = 1 - torch momentum (torch 0.1 -> flax 0.9),
eps 1e-5 to match torch.nn.BatchNorm1d defaults.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from subgraph_sketching_tpu.ops.graph_ops import gcn_norm, spmm

BN_MOMENTUM = 0.9
BN_EPS = 1e-5


def batch_norm(training: bool, name: Optional[str] = None,
               dtype=None) -> nn.BatchNorm:
    # params/stats stay float32 (flax param_dtype default); ``dtype`` only
    # sets the compute dtype, so bf16 training keeps f32 running stats
    return nn.BatchNorm(use_running_average=not training,
                        momentum=BN_MOMENTUM, epsilon=BN_EPS, name=name,
                        dtype=dtype)


class GCNConv(nn.Module):
    """out = D^-1/2 (A+I) D^-1/2 X W + b — PyG GCNConv default semantics
    (used by the reference at src/models/elph.py:136-146)."""

    out_channels: int
    add_self_loops: bool = True
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None  # compute dtype (bf16 puts XW on MXU)

    @nn.compact
    def __call__(self, x, edge_index, num_nodes: int,
                 edge_weight: Optional[jnp.ndarray] = None,
                 mask: Optional[jnp.ndarray] = None,
                 norm: Optional[tuple] = None,
                 spmm_ctx: Optional[tuple] = None):
        # XW first (dense matmul on the MXU), then sparse propagation
        x = nn.Dense(self.out_channels, use_bias=False, dtype=self.dtype,
                     kernel_init=nn.initializers.glorot_uniform())(x)
        if spmm_ctx is not None:
            # statically-scheduled differentiable SpMM over the gcn_norm'd
            # edge list (ops/segment_scan.PlanSpmm): the plan is built once
            # at staging and its tables ride as jit arguments; ~3.7x the
            # scatter path inside the jitted train step
            assert mask is None, \
                "spmm_ctx bakes the edge set at staging; it cannot honour " \
                "a runtime edge mask — pass one or the other"
            plan, tables = spmm_ctx
            out = plan(x, tables)
        else:
            if norm is None:
                ei, w, m = gcn_norm(edge_index, edge_weight, num_nodes, mask,
                                    with_self_loops=self.add_self_loops)
            else:
                ei, w, m = norm
            out = spmm(ei, w, x, num_nodes, mask=m)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = out + bias
        return out


class SAGEConv(nn.Module):
    """GraphSAGE mean aggregation: W1 x + W2 mean_{u in N(v)} x_u
    (reference src/models/gnn.py:90-113 uses PyG SAGEConv)."""

    out_channels: int
    root_weight: bool = True

    @nn.compact
    def __call__(self, x, edge_index, num_nodes: int,
                 mask: Optional[jnp.ndarray] = None):
        from subgraph_sketching_tpu.ops.segment import segment_sum
        src, dst = edge_index[0], edge_index[1]
        ones = jnp.ones(src.shape[0], dtype=x.dtype)
        deg = segment_sum(ones, dst, num_nodes, mask=mask)
        msgs = x[src]
        if mask is not None:
            msgs = jnp.where(mask[:, None], msgs, 0)
        agg = segment_sum(msgs, dst, num_nodes) / jnp.maximum(deg, 1.0)[:, None]
        out = nn.Dense(self.out_channels)(agg)
        if self.root_weight:
            out = out + nn.Dense(self.out_channels, use_bias=False)(x)
        return out


class GCN(nn.Module):
    """Plain GCN stack (reference src/models/gnn.py:18-42)."""

    hidden_channels: int
    out_channels: int
    num_layers: int
    dropout: float

    @nn.compact
    def __call__(self, x, edge_index, num_nodes: int, *, training: bool = False,
                 mask: Optional[jnp.ndarray] = None):
        norm = gcn_norm(edge_index, None, num_nodes, mask)
        for _ in range(self.num_layers - 1):
            x = GCNConv(self.hidden_channels)(x, edge_index, num_nodes, norm=norm)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return GCNConv(self.out_channels)(x, edge_index, num_nodes, norm=norm)


class SAGE(nn.Module):
    """GraphSAGE stack (reference src/models/gnn.py:90-113)."""

    hidden_channels: int
    out_channels: int
    num_layers: int
    dropout: float
    residual: bool = True

    @nn.compact
    def __call__(self, x, edge_index, num_nodes: int, *, training: bool = False,
                 mask: Optional[jnp.ndarray] = None):
        for _ in range(self.num_layers - 1):
            x = SAGEConv(self.hidden_channels, root_weight=self.residual)(
                x, edge_index, num_nodes, mask)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        return SAGEConv(self.out_channels, root_weight=self.residual)(
            x, edge_index, num_nodes, mask)


class SIGN(nn.Module):
    """SIGN over precomputed per-hop feature blocks.

    Input [B, 2, d*(K+1)] is split into K+1 hop blocks; each gets its own
    Dense+BN+ReLU+Dropout, then blocks are concatenated and mixed
    (reference src/models/gnn.py:169-191).  BatchNorm is applied per link
    endpoint with shared parameters, like the reference's bn(h[:,0])/bn(h[:,1]).
    """

    hidden_channels: int
    out_channels: int
    K: int
    dropout: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, xs, *, training: bool = False):
        blocks = jnp.split(xs, self.K + 1, axis=-1)
        hs = []
        for k, x in enumerate(blocks):
            h = nn.Dense(self.hidden_channels, name=f"lin_{k}",
                         dtype=self.dtype)(x)
            bn = batch_norm(training, name=f"bn_{k}", dtype=self.dtype)
            h = jnp.stack([bn(h[:, 0, :]), bn(h[:, 1, :])], axis=1)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
            hs.append(h)
        h = jnp.concatenate(hs, axis=-1)
        return nn.Dense(self.out_channels, name="lin_out",
                        dtype=self.dtype)(h)


class SIGNEmbedding(nn.Module):
    """SIGN with on-line propagation of an embedding table over the
    normalised adjacency (reference src/models/gnn.py:149-166; used for
    ogbl-ddi transductive embeddings)."""

    hidden_channels: int
    out_channels: int
    K: int
    dropout: float
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, edge_index, num_nodes: int, *, training: bool = False,
                 mask: Optional[jnp.ndarray] = None,
                 spmm_ctx: Optional[tuple] = None):
        if spmm_ctx is not None:
            # staged differentiable plan SpMM (ops/segment_scan.PlanSpmm)
            # with the unweighted gcn_norm baked into the slot weights
            assert mask is None, \
                "spmm_ctx bakes the edge set at staging; it cannot honour " \
                "a runtime edge mask — pass one or the other"
            plan, tables = spmm_ctx
            prop = lambda h: plan(h, tables)
        else:
            ei, w, m = gcn_norm(edge_index, None, num_nodes, mask)
            prop = lambda h: spmm(ei, w, h, num_nodes, mask=m)
        hs = []
        for k in range(self.K + 1):
            h = nn.Dense(self.hidden_channels, name=f"lin_{k}",
                         dtype=self.dtype)(x)
            h = batch_norm(training, name=f"bn_{k}", dtype=self.dtype)(h)
            h = nn.relu(h)
            h = nn.Dropout(self.dropout, deterministic=not training)(h)
            hs.append(h)
            x = prop(x)
        h = jnp.concatenate(hs, axis=-1)
        return nn.Dense(self.out_channels, name="lin_out",
                        dtype=self.dtype)(h)


class MLPLinkPredictor(nn.Module):
    """Hadamard-product MLP scorer (reference src/models/gnn.py:194-218)."""

    hidden_channels: int
    out_channels: int
    num_layers: int
    dropout: float

    @nn.compact
    def __call__(self, x_i, x_j, *, training: bool = False):
        x = x_i * x_j
        for _ in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_channels)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not training)(x)
        x = nn.Dense(self.out_channels)(x)
        return nn.sigmoid(x)
