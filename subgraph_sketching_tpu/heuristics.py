"""Link-prediction heuristics: CN, AA, RA, PPR.

Two paths, same math as the reference (src/heuristics.py):
  * host (scipy CSR) — used in preprocessing, mirrors the reference's batched
    sparse row products A[src] · f(A)[dst]
  * device (jnp) — SDDMM-style batched scoring over the padded edge list, for
    on-TPU evaluation at scale
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as ssp

import jax.numpy as jnp

from subgraph_sketching_tpu.ops.segment import segment_sum


# ------------------------------------------------------------------- host --

def _batched_row_product(A: ssp.csr_matrix, B: ssp.csr_matrix,
                         links: np.ndarray, batch_size: int) -> np.ndarray:
    scores = []
    for s in range(0, len(links), batch_size):
        src = links[s:s + batch_size, 0]
        dst = links[s:s + batch_size, 1]
        cur = np.asarray(A[src].multiply(B[dst]).sum(axis=1)).ravel()
        scores.append(cur)
    return np.concatenate(scores) if scores else np.zeros(0)


def common_neighbours(A: ssp.csr_matrix, links: np.ndarray,
                      batch_size: int = 100000) -> np.ndarray:
    """CN(u,v) = |N(u) ∩ N(v)| (reference src/heuristics.py:11-27)."""
    return _batched_row_product(A, A, links, batch_size).astype(np.float32)


def adamic_adar(A: ssp.csr_matrix, links: np.ndarray,
                batch_size: int = 100000) -> np.ndarray:
    """AA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/log(deg(w)) (src/heuristics.py:30-49)."""
    with np.errstate(divide="ignore"):
        mult = 1.0 / np.log(np.asarray(A.sum(axis=0)).ravel())
    mult[np.isinf(mult)] = 0
    A_ = A.multiply(mult).tocsr()
    return _batched_row_product(A, A_, links, batch_size).astype(np.float32)


def resource_allocation(A: ssp.csr_matrix, links: np.ndarray,
                        batch_size: int = 100000) -> np.ndarray:
    """RA(u,v) = Σ_{w ∈ N(u)∩N(v)} 1/deg(w) (src/heuristics.py:52-71)."""
    with np.errstate(divide="ignore"):
        mult = 1.0 / np.asarray(A.sum(axis=0)).ravel()
    mult[np.isinf(mult)] = 0
    A_ = A.multiply(mult).tocsr()
    return _batched_row_product(A, A_, links, batch_size).astype(np.float32)


def personalized_pagerank(A: ssp.csr_matrix, links: np.ndarray,
                          alpha: float = 0.85, tol: float = 1e-7,
                          max_iter: int = 200) -> Tuple[np.ndarray, np.ndarray]:
    """PPR scores via power iteration, one solve per unique source
    (reference src/heuristics.py:74-113 used the fast_pagerank package).

    Returns (scores, links_sorted_by_src) like the reference.
    """
    n = A.shape[0]
    deg = np.asarray(A.sum(axis=1)).ravel()
    inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1e-12), 0.0)
    # row-stochastic transition matrix
    W = ssp.diags(inv_deg) @ A
    order = np.argsort(links[:, 0], kind="stable")
    links_sorted = links[order]
    scores = np.zeros(len(links_sorted), dtype=np.float32)
    i = 0
    while i < len(links_sorted):
        src = links_sorted[i, 0]
        j = i
        while j < len(links_sorted) and links_sorted[j, 0] == src:
            j += 1
        p = np.zeros(n)
        p[src] = 1.0
        v = p.copy()
        for _ in range(max_iter):
            v_new = (1 - alpha) * p + alpha * (W.T @ v)
            if np.abs(v_new - v).sum() < tol:
                v = v_new
                break
            v = v_new
        scores[i:j] = v[links_sorted[i:j, 1]]
        i = j
    return scores, links_sorted


# ----------------------------------------------------------------- device --

def heuristic_scores_device(edge_index: jnp.ndarray,
                            edge_weight: Optional[jnp.ndarray],
                            num_nodes: int, links: jnp.ndarray,
                            kind: str = "CN",
                            mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched CN/AA/RA on device without materialising A.

    score(u,v) = Σ_w A[u,w] * f(deg(w)) * A[v,w].  Computed as an SDDMM over
    one-hot row gathers is memory-prohibitive; instead we build the weighted
    dense rows for the batch via segment ops: for each link endpoint, scatter
    its incident edges into a [B, n] row.  Intended for moderate n (Planetoid
    scale) or as a building block behind batching.
    """
    src, dst = edge_index[0], edge_index[1]
    w = (jnp.ones(src.shape[0], jnp.float32) if edge_weight is None
         else edge_weight.astype(jnp.float32))
    if mask is not None:
        w = jnp.where(mask, w, 0.0)
    deg = segment_sum(w, dst, num_nodes)
    if kind == "CN":
        f = jnp.ones_like(deg)
    elif kind == "AA":
        f = jnp.where(deg > 1, 1.0 / jnp.log(jnp.maximum(deg, 1.001)), 0.0)
    elif kind == "RA":
        f = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-12), 0.0)
    else:
        raise ValueError(kind)

    # dense adjacency rows for the batch endpoints: [B, n]
    def rows(nodes):
        # A[node, w_col]: edges with src == node contribute weight at dst col
        onehot = (src[None, :] == nodes[:, None]).astype(jnp.float32) * w[None, :]
        return jax_scatter_cols(onehot, dst, num_nodes)

    def jax_scatter_cols(vals, cols, n):
        import jax
        return jax.vmap(lambda v: segment_sum(v, cols, n))(vals)

    ru = rows(links[:, 0])
    rv = rows(links[:, 1])
    return jnp.sum(ru * f[None, :] * rv, axis=1)
