"""Link-prediction heuristics: CN, AA, RA, PPR.

Two paths, same math as the reference (src/heuristics.py):
  * host (scipy CSR) — used in preprocessing, mirrors the reference's batched
    sparse row products A[src] · f(A)[dst]
  * device (jnp) — SDDMM-style batched scoring over the padded edge list, for
    on-TPU evaluation at scale
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.sparse as ssp

import jax.numpy as jnp


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

    Returns (scores, links): ``scores[i]`` belongs to input ``links[i]``.
    Unlike the reference (which returns src-sorted links and scores), the
    scores are scattered back to INPUT order — per-positive negative
    alignment (citation2 MRR) survives, and permutation-invariant metrics
    (hits/AUC) are unaffected.
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
    out = np.empty_like(scores)
    out[order] = scores
    return out, links


# ----------------------------------------------------------------- device --

class DeviceHeuristics:
    """Batched CN/AA/RA on TPU via degree-bucketed neighbour intersection.

    score(u,v) = Σ_w A[u,w] · f(deg(w)) · A[v,w]  (reference
    src/heuristics.py:11-71).  TPU-first design: pad each endpoint's
    neighbour list to a per-bucket width D, then intersect with one fused
    compare-all reduction eq[b,i,j] = (nbr_u[b,i] == nbr_v[b,j]) — static
    shapes, zero gathers on the hot path, O(B·D²) VPU work and O(B·D)
    memory (the previous design materialised an O(B·E) one-hot).  Links are
    binned by max endpoint degree so hub pairs compile into their own
    (rare, wide) bucket instead of padding everything to the hub width.
    """

    def __init__(self, A: ssp.csr_matrix, buckets: Tuple[int, ...] = (),
                 chunk_elems: int = 1 << 25):
        import jax

        self._jax = jax
        A = A.tocsr()
        self.n = A.shape[0]
        deg_w = np.asarray(A.sum(axis=0)).ravel()  # weighted, like the ref
        with np.errstate(divide="ignore"):
            inv_log = 1.0 / np.log(deg_w)
            inv = 1.0 / deg_w
        self.f_by_kind = {
            "CN": np.ones(self.n, np.float32),
            "AA": np.where(np.isfinite(inv_log), inv_log, 0).astype(np.float32),
            "RA": np.where(np.isfinite(inv), inv, 0).astype(np.float32),
        }
        self.indptr = A.indptr
        self.indices = A.indices
        self.data = A.data.astype(np.float32)
        self.deg = np.diff(A.indptr)
        max_deg = max(int(self.deg.max()), 1) if self.n else 1
        if not buckets:
            buckets, b = [], 32
            while b < max_deg:
                buckets.append(b)
                b *= 8
            buckets.append(1 << (max_deg - 1).bit_length())
        self.buckets = tuple(buckets)
        if self.buckets[-1] < max_deg:
            # a link whose max endpoint degree exceeds every bucket would
            # match no bucket in scores() and silently keep score 0.0 —
            # for exactly the highest-signal hub pairs
            raise ValueError(
                f"buckets {self.buckets} do not cover the graph's max "
                f"degree {max_deg}; add a bucket >= {max_deg} (default "
                f"buckets are derived from the graph and always cover it)")
        self.chunk_elems = chunk_elems
        self._score_jit = jax.jit(self._score_chunk,
                                  static_argnames=("D", "B"))

    def _padded(self, nodes: np.ndarray, D: int):
        """[B, D] neighbour ids (pad = n, matches nothing) + weights."""
        B = len(nodes)
        nbr = np.full((B, D), self.n, np.int32)
        w = np.zeros((B, D), np.float32)
        for i, u in enumerate(nodes):
            s, e = self.indptr[u], self.indptr[u + 1]
            nbr[i, :e - s] = self.indices[s:e]
            w[i, :e - s] = self.data[s:e]
        return nbr, w

    @staticmethod
    def _score_chunk(nu, wu, nv, wv, fu, D: int, B: int):
        eq = (nu[:, :, None] == nv[:, None, :]).astype(jnp.float32)
        return jnp.einsum("bij,bi,bj->b", eq, wu * fu, wv)

    def scores(self, links: np.ndarray, kind: str = "CN") -> np.ndarray:
        f = self.f_by_kind[kind]
        out = np.zeros(len(links), np.float32)
        need = np.maximum(self.deg[links[:, 0]], self.deg[links[:, 1]])
        bucket_of = np.searchsorted(np.asarray(self.buckets), need)
        for bi, D in enumerate(self.buckets):
            sel = np.nonzero(bucket_of == bi)[0]
            if not len(sel):
                continue
            B = max(1, min(len(sel), self.chunk_elems // (D * D)))
            for s in range(0, len(sel), B):
                idx = sel[s:s + B]
                pad = B - len(idx)
                # pad with a link from THIS bucket: a global index-0 pad may
                # have higher degree than D and overflow _padded's rows
                safe = np.concatenate([idx, np.full(pad, sel[0], np.int64)]) \
                    if pad else idx
                nu, wu = self._padded(links[safe, 0], D)
                nv, wv = self._padded(links[safe, 1], D)
                fu = f[np.minimum(nu, self.n - 1)] * (nu < self.n)
                res = np.asarray(self._score_jit(
                    jnp.asarray(nu), jnp.asarray(wu), jnp.asarray(nv),
                    jnp.asarray(wv), jnp.asarray(fu), D=D, B=B))
                out[idx] = res[:len(idx)]
        return out
