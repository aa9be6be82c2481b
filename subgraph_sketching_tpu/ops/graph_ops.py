"""Normalised-adjacency ops: gcn_norm, SpMM, degrees.

TPU-native equivalents of PyG ``gcn_norm`` + ``torch_sparse.spmm``
(reference uses: src/datasets/elph.py:99-107, src/models/gnn.py:75-78,
src/models/elph.py:150).  Edge lists are COO with static shapes; padding is
expressed as ``mask`` (padded edges get weight 0, so they contribute nothing
to sums).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from subgraph_sketching_tpu.ops.segment import segment_sum


def degrees_from_edges(edge_index: jnp.ndarray, edge_weight: Optional[jnp.ndarray],
                       num_nodes: int, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Weighted in-degree: deg[v] = sum of w over edges (u, v).

    Matches the reference's ``A.sum(axis=0)`` with A[src, dst] = w
    (src/datasets/elph.py:74).
    """
    if edge_weight is None:
        edge_weight = jnp.ones(edge_index.shape[1], dtype=jnp.float32)
    return segment_sum(edge_weight.astype(jnp.float32), edge_index[1], num_nodes, mask=mask)


def add_self_loops(edge_index: jnp.ndarray, edge_weight: Optional[jnp.ndarray],
                   num_nodes: int, mask: Optional[jnp.ndarray] = None,
                   fill_value: float = 1.0
                   ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray]]:
    """Append (v, v) for every node.  Static-shape: output has E + n edges."""
    loop = jnp.arange(num_nodes, dtype=edge_index.dtype)
    ei = jnp.concatenate([edge_index, jnp.stack([loop, loop])], axis=1)
    ew = None
    if edge_weight is not None:
        ew = jnp.concatenate(
            [edge_weight, jnp.full((num_nodes,), fill_value, dtype=edge_weight.dtype)])
    m = None
    if mask is not None:
        m = jnp.concatenate([mask, jnp.ones((num_nodes,), dtype=mask.dtype)])
    return ei, ew, m


def gcn_norm(edge_index: jnp.ndarray, edge_weight: Optional[jnp.ndarray],
             num_nodes: int, mask: Optional[jnp.ndarray] = None,
             with_self_loops: bool = True
             ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]:
    """Symmetric GCN normalisation D^-1/2 (A + I) D^-1/2.

    Semantics follow PyG's ``gcn_norm`` with default arguments (used at
    reference src/datasets/elph.py:99, src/models/elph.py:150): self-loops are
    added with weight 1, degree is the weighted sum over incoming edges, and
    isolated nodes get deg_inv_sqrt = 0.
    """
    if edge_weight is None:
        edge_weight = jnp.ones(edge_index.shape[1], dtype=jnp.float32)
    edge_weight = edge_weight.astype(jnp.float32)
    if with_self_loops:
        edge_index, edge_weight, mask = add_self_loops(
            edge_index, edge_weight, num_nodes, mask)
    if mask is not None:
        edge_weight = jnp.where(mask, edge_weight, 0.0)
    deg = segment_sum(edge_weight, edge_index[1], num_nodes)
    deg_inv_sqrt = jnp.where(deg > 0, jnp.where(deg > 0, deg, 1.0) ** -0.5, 0.0)
    row, col = edge_index[0], edge_index[1]
    norm_weight = deg_inv_sqrt[row] * edge_weight * deg_inv_sqrt[col]
    return edge_index, norm_weight, mask


def spmm(edge_index: jnp.ndarray, edge_weight: jnp.ndarray, x: jnp.ndarray,
         num_nodes: int, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """out[v] = sum_{(u,v) in E} w_uv * x[u]  — CSR-free COO SpMM.

    Equivalent of ``torch_sparse.spmm`` as called by the reference
    (src/datasets/elph.py:103-107: rows indexed by edge_index[0], i.e. the
    message flows src -> dst with aggregation at dst; for the symmetric
    normalised adjacency this matches A @ x).
    """
    src, dst = edge_index[0], edge_index[1]
    if mask is not None:
        edge_weight = jnp.where(mask, edge_weight, 0.0)
    msgs = x[src] * edge_weight[:, None].astype(x.dtype)
    return segment_sum(msgs, dst, num_nodes)
