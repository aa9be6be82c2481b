"""Online link scoring (serving) — no reference equivalent.

The reference stops at offline eval; this module serves arbitrary link
queries against a trained BUDDY model with everything resident on device:
the per-hop sketch stacks, the SIGN-propagated node features, degrees, and
the trained parameters.  A query batch runs ONE jitted program — subgraph
features straight from the sketches (identical math to preprocessing,
including the zero-one knockout / floor, graph/preprocess.py:229-238),
node-feature gathers, and the BUDDY MLP.

Batch sizes are bucketed to powers of two so the compile set is bounded
and per-bucket latency is stable — the standard padded-shape serving
pattern for XLA.  Padded rows score (0, 0) links and are sliced off.
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from subgraph_sketching_tpu.graph.preprocess import (
    LinkDataset,
    sketch_params_from_config,
)
from subgraph_sketching_tpu.sketch.elph import subgraph_features


def _pad_pow2(a: np.ndarray, min_size: int = 256, fill=0) -> np.ndarray:
    """Pad a 1-D index array to the next power of two (>= min_size).

    ``fill`` picks the pad value: 0 for the insert path (merging row 0's
    previous hop into row 0 is a no-op there), a known-reset row for the
    delete path (where padding with row 0 would wrongly reset it)."""
    size = 1 << max(min_size.bit_length() - 1, (max(len(a), 1) - 1)
                    .bit_length())
    size = max(size, min_size)
    if len(a) == size:
        return a
    out = np.full(size, fill, a.dtype)
    out[:len(a)] = a
    return out


def _bucketed_score(invoke, links: np.ndarray, min_bucket: int,
                    max_bucket: int) -> np.ndarray:
    """Shared bucket/pad/chunk loop: pad each ≤max_bucket chunk up to the
    next power of two ≥ min_bucket, score with ``invoke``, slice off pads."""
    links = np.asarray(links, dtype=np.int32)
    n = len(links)
    if n == 0:
        return np.zeros((0,), np.float32)
    outs = []
    for s0 in range(0, n, max_bucket):
        chunk = links[s0:s0 + max_bucket]
        bucket = min_bucket
        while bucket < len(chunk):
            bucket *= 2
        pad = bucket - len(chunk)
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, 2), np.int32)])
        out = invoke(jnp.asarray(chunk))
        outs.append(np.asarray(out[:bucket - pad] if pad else out))
    return np.concatenate(outs)


class LinkScorer:
    """Serve scores for arbitrary (src, dst) pairs from a trained trainer.

    Parameters
    ----------
    trainer: a BuddyTrainer (owns the flax model + config).
    dataset: the train-split LinkDataset — must retain ``sketches`` (built
        by ``build_link_dataset``) and carry x/degrees.
    state: the trained TrainState.
    min_bucket / max_bucket: query batches are padded up to the next power
        of two within [min_bucket, max_bucket]; larger queries are chunked.
    """

    def __init__(self, trainer, dataset: LinkDataset, state,
                 min_bucket: int = 1024, max_bucket: int = 1 << 18):
        cfg = trainer.cfg
        if dataset.sketches is None and cfg.use_struct_feature:
            raise ValueError(
                "serving needs the sketch stacks: build the dataset with "
                "build_link_dataset (BUDDY path) so LinkDataset.sketches "
                "is retained")
        # RA (resource allocation) feature: keep the message-graph CSR
        # resident on host and score each query batch with the SAME
        # host-path math preprocessing used (heuristics.resource_allocation
        # over the identical coalesced/undirected graph), so online RA
        # matches the staged training feature exactly
        self.ra_csr = None
        if cfg.use_RA:
            from subgraph_sketching_tpu.graph.container import Graph
            self.ra_csr = Graph(dataset.edge_index, dataset.num_nodes,
                                dataset.edge_weight).csr()
        self.cfg = cfg
        self.model = trainer.model
        self.sketch_params = sketch_params_from_config(cfg)
        self.state = state
        # under --use_struct_feature 0 the model was trained on zeroed
        # structure features (reference train.py:58) — serve the same zeros,
        # never live sketch features (train/serve skew)
        self.sk = dataset.sketches if cfg.use_struct_feature else None
        # node-sharded (locality-partitioned) tables are POSITION-ordered:
        # sketch lookups must translate node id -> row position or every
        # online score reads the wrong nodes' rows (train/serve skew)
        self.sk_perm = (jnp.asarray(dataset.sketch_perm)
                        if self.sk is not None
                        and dataset.sketch_perm is not None else None)
        self.num_nodes = dataset.num_nodes
        self._edge_index = dataset.edge_index  # for insert_edges
        self.x = (jnp.asarray(dataset.x)
                  if trainer.use_feature and dataset.x is not None else None)
        self.deg = jnp.asarray(dataset.degrees, dtype=jnp.float32)
        # resolve the node-embedding table ONCE (trainable or pretrained,
        # SIGN-diffused if --propagate_embeddings); query batches then pass
        # it back as frozen_table and only gather rows
        self.emb_table = None
        if trainer.use_embedding:
            self.emb_table = trainer.model.apply(
                {"params": state.params, "batch_stats": state.batch_stats},
                edge_index=trainer._data["train"].get("edge_index"),
                frozen_table=trainer.frozen_emb, return_table=True,
                training=False)
        self.min_bucket = min_bucket
        self.max_bucket = max_bucket
        self._jit = jax.jit(self._score_batch)

    # -- the one program ----------------------------------------------------
    def _score_batch(self, params, batch_stats, links, sk, x, deg,
                     emb_table, ra, sk_perm):
        # zero-one knockout / floor are applied inside subgraph_features
        # (sketch/elph.py:187-199) from the same SketchParams the
        # preprocessing used, so online features match the staged ones.
        # Only the SKETCH lookup rides sk_perm (x/deg/emb stay id-ordered).
        sk_links = links if sk_perm is None else sk_perm[links]
        sf = (subgraph_features(sk_links, sk, self.sketch_params)
              if sk is not None else
              jnp.zeros((links.shape[0], self.sketch_params.sf_dim)))
        variables = {"params": params, "batch_stats": batch_stats}
        out = self.model.apply(
            variables, links=links, edge_index=None, frozen_table=emb_table,
            sf=sf,
            node_features=None if x is None else x[links],
            src_degree=deg[links[:, 0]], dst_degree=deg[links[:, 1]],
            RA=ra, training=False)
        return out.ravel()

    def _ra_of(self, chunk) -> Optional[jnp.ndarray]:
        if self.ra_csr is None:
            return None
        from subgraph_sketching_tpu.heuristics import resource_allocation
        return jnp.asarray(np.asarray(
            resource_allocation(self.ra_csr, np.asarray(chunk)),
            dtype=np.float32))

    # -- public API ---------------------------------------------------------
    def score(self, links: np.ndarray) -> np.ndarray:
        """Scores (logits) for [B, 2] int link pairs, any B ≥ 1."""
        return _bucketed_score(
            lambda chunk: self._jit(self.state.params,
                                    self.state.batch_stats, chunk, self.sk,
                                    self.x, self.deg, self.emb_table,
                                    self._ra_of(chunk), self.sk_perm),
            links, self.min_bucket, self.max_bucket)

    def warmup(self, buckets: Optional[list] = None) -> None:
        """Pre-compile the given bucket sizes (default: min_bucket only) so
        first-query latency is serving latency, not compile latency."""
        for b in (buckets or [self.min_bucket]):
            self.score(np.zeros((b, 2), np.int32))

    # -- streaming updates ----------------------------------------------------
    def _pos(self, ids: np.ndarray) -> np.ndarray:
        """node id -> sketch-table row position.  Identity without a
        partition perm; otherwise the locality-partition layout
        (NodePartitionPlan.perm) — streaming updates scatter into row
        POSITIONS while the adjacency/affected-set walk stays in node ids."""
        ids = np.asarray(ids, dtype=np.int64)
        if self.sk_perm is None:
            return ids
        if not hasattr(self, "_perm_np"):
            self._perm_np = np.asarray(self.sk_perm, dtype=np.int64)
        return self._perm_np[ids]

    def _stack_is_full(self) -> bool:
        """True for hop-0..K stacks; False for K-row hops-only stacks
        (hop 0 dropped to save HBM at citation2 scale)."""
        return int(self.sk.minhash.shape[0]) == self.sketch_params.max_hops + 1

    def _hop0_rows_padded(self, ids: np.ndarray, size: int):
        """Hop-0 sketch rows for the given node ids, padded to ``size``
        rows with the merge identities (minhash 0xFFFFFFFF / HLL 0 — a
        strict no-op wherever the pad scatters).  Hop-0 is a pure per-id
        function (sketch/node_hash.py), so hops-only stacks can stream
        updates without ever holding the O(n) hop-0 table."""
        from subgraph_sketching_tpu.sketch.hll import hll_init_rows
        from subgraph_sketching_tpu.sketch.minhash import minhash_init_rows
        P = self.sketch_params.num_perm
        m = self.sketch_params.m
        mh = np.full((size, P), 0xFFFFFFFF, np.uint32)
        hl = np.zeros((size, m), np.int8)
        mh[:len(ids)] = minhash_init_rows(ids, P,
                                          self.sketch_params.minhash_seed)
        hl[:len(ids)] = hll_init_rows(ids, self.sketch_params.hll_p)
        return jnp.asarray(mh), jnp.asarray(hl)

    def _edge_key(self, s, d):
        return np.asarray(s, np.int64) * np.int64(self.num_nodes) \
            + np.asarray(d, np.int64)

    def _ensure_adj(self) -> None:
        """Lazily build the serving adjacency: the original message graph
        (src, dst)-key-sorted (src-contiguous AND binary-searchable by
        directed key), plus the mutation state — appended extra edges and
        the delete tombstone set (sorted directed keys of CSR rows deleted
        but not yet compacted; deletes at scale must not pay an O(E)
        rebuild per batch — round-4 verdict item 5)."""
        if hasattr(self, "_out_sorted"):
            return
        ei = np.asarray(self._edge_index, dtype=np.int64)
        order = np.argsort(self._edge_key(ei[0], ei[1]), kind="stable")
        self._out_sorted = ei[:, order]
        self._out_starts = np.searchsorted(
            self._out_sorted[0], np.arange(self.num_nodes + 1))
        self._out_keys = self._edge_key(self._out_sorted[0],
                                        self._out_sorted[1])
        self._extra_edges = np.zeros((2, 0), np.int64)
        self._del_keys = np.zeros(0, np.int64)
        self._symmetric: Optional[bool] = None  # unknown until first needed

    def _keys_in_del(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask: which directed keys are tombstoned (binary search
        over the small sorted tombstone set — O(len(keys) log |del|))."""
        if not len(self._del_keys):
            return np.zeros(len(keys), bool)
        idx = np.searchsorted(self._del_keys, keys)
        idx = np.minimum(idx, len(self._del_keys) - 1)
        return self._del_keys[idx] == keys

    def _compact(self) -> None:
        """Fold tombstones (and optionally extras — callers do that
        separately) into the CSR: one O(E) pass, amortised over many
        delete batches."""
        if not len(self._del_keys):
            return
        keep = ~self._keys_in_del(self._out_keys)
        self._out_sorted = self._out_sorted[:, keep]
        self._out_keys = self._out_keys[keep]
        self._out_starts = np.searchsorted(
            self._out_sorted[0], np.arange(self.num_nodes + 1))
        self._del_keys = np.zeros(0, np.int64)
        self._drop_in_csr()

    def _out_pairs(self, srcs: np.ndarray) -> np.ndarray:
        """All current (src, dst) edges whose src is in ``srcs`` — original
        message graph (minus tombstoned rows) + every edge inserted since."""
        self._ensure_adj()
        lo = self._out_starts[srcs]
        hi = self._out_starts[srcs + 1]
        counts = hi - lo
        total = int(counts.sum())
        idx = (np.repeat(lo, counts)
               + np.arange(total)
               - np.repeat(np.cumsum(counts) - counts, counts))
        pairs = self._out_sorted[:, idx].T
        if len(self._del_keys):
            pairs = pairs[~self._keys_in_del(self._out_keys[idx])]
        if self._extra_edges.shape[1]:
            m = np.isin(self._extra_edges[0], srcs)
            pairs = np.concatenate([pairs, self._extra_edges[:, m].T])
        return pairs

    def insert_edges(self, edges: np.ndarray, weights=None,
                     undirected: bool = True) -> None:
        """EXACT streaming edge insertion — no reference equivalent.

        Min/max sketches are monotone and idempotent under edge
        insertions, so the updated hop tables equal a from-scratch rebuild
        on the augmented graph BIT-EXACTLY, at O(Σ deg(touched)) update
        cost instead of O(E·K): hop-k rows of the new edges' endpoints
        (and their out-neighbours, transitively per hop, plus the self
        fold-in) merge the UPDATED hop-(k-1) rows of their sources;
        cardinalities recompute for the touched rows only.  Degrees (and
        the RA CSR when --use_RA) update too.  SIGN node features stay as
        precomputed offline — the same staleness the reference's cached
        features have.

        Works on every serving configuration: full hop-0..K stacks,
        hops-only stacks (hop-0 source rows are recomputed per touched id —
        hop 0 is a pure per-id function, sketch/node_hash.py — so the O(n)
        hop-0 table never needs to exist), and node-sharded
        (position-ordered) state (the affected-set walk stays in node ids;
        scatters translate through the partition perm).

        edges: [M, 2] int node pairs; ``undirected=True`` (the message
        graphs here are undirected) inserts both directions.
        """
        # ALL validation before ANY state mutation: a raise must never
        # leave degrees/RA updated against un-updated sketches
        K = self.sketch_params.max_hops
        edges = np.asarray(edges, dtype=np.int64)
        if edges.ndim != 2 or edges.shape[1] != 2:
            raise ValueError(f"edges must be [M, 2], got {edges.shape}")
        if len(edges) == 0:
            return
        if edges.min() < 0 or edges.max() >= self.num_nodes:
            raise ValueError("edge endpoint out of range "
                             f"[0, {self.num_nodes})")
        w = (np.ones(len(edges), np.float32) if weights is None
             else np.asarray(weights, np.float32))
        if undirected:
            edges = np.concatenate([edges, edges[:, ::-1]])
            w = np.concatenate([w, w])
        # degrees: weighted in-degree by dst (container.Graph.degrees is
        # A.sum(axis=0); symmetric graphs make it the undirected degree)
        self.deg = self.deg.at[jnp.asarray(edges[:, 1])].add(jnp.asarray(w))
        if self.ra_csr is not None:
            import scipy.sparse as ssp
            self.ra_csr = (self.ra_csr + ssp.csr_matrix(
                (w, (edges[:, 0], edges[:, 1])),
                shape=(self.num_nodes, self.num_nodes))).tocsr()
        if self.sk is None:
            return
        from subgraph_sketching_tpu.sketch.params import Sketches
        self._ensure_adj()
        if not undirected:
            self._symmetric = False  # a one-direction insert breaks it
        full = self._stack_is_full()
        mh, hll, cards = self.sk.minhash, self.sk.hll, self.sk.cards
        pairs = edges
        changed = None
        t_host0, t_disp = time.perf_counter(), 0.0
        for k in range(1, K + 1):
            if changed is not None:
                pairs = np.concatenate([
                    edges, self._out_pairs(changed),
                    np.stack([changed, changed], axis=1)])  # self fold-in
            changed = np.unique(pairs[:, 1])
            # pad to power-of-two buckets so repeat inserts hit the jit
            # cache; padding with (0, 0) pairs / position 0 is a no-op
            # (hop-k rows already contain their own hop-(k-1) row — self
            # fold-in — and re-deriving a cardinality is idempotent)
            kst = k if full else k - 1          # stack index of hop k
            d_idx = _pad_pow2(self._pos(pairs[:, 1]))
            rows = _pad_pow2(self._pos(changed))
            td = time.perf_counter()
            if full or k >= 2:
                mh, hll, cards = self._update_jit(reset=False, hop0=False)(
                    mh, hll, cards,
                    (jnp.asarray(_pad_pow2(self._pos(pairs[:, 0]))),),
                    jnp.asarray(d_idx), jnp.asarray(rows), kst, k - 1)
            else:
                # hops-only stack, k == 1: hop-0 source rows recomputed by
                # node id (padded with merge identities — strict no-ops)
                s_mh, s_hll = self._hop0_rows_padded(pairs[:, 0], len(d_idx))
                mh, hll, cards = self._update_jit(reset=False, hop0=True)(
                    mh, hll, cards, (s_mh, s_hll),
                    jnp.asarray(d_idx), jnp.asarray(rows), kst, k - 1)
            t_disp += time.perf_counter() - td
        self.sk = Sketches(minhash=mh, hll=hll, cards=cards)
        # host-walk vs device-dispatch split for the scale probes (device
        # EXECUTION is async — measure it with a completion fence outside)
        self.last_update_stats = {
            "op": "insert", "host_ms": round(
                (time.perf_counter() - t_host0 - t_disp) * 1e3, 2),
            "dispatch_ms": round(t_disp * 1e3, 2)}
        self._extra_edges = np.concatenate([self._extra_edges, edges.T],
                                           axis=1)
        # fold accumulated extras into the sorted adjacency once they get
        # big: keeps _out_pairs' isin scan bounded on long-running servers.
        # Tombstones are compacted FIRST: they only refer to CSR rows, and
        # folding extras under live tombstones would wrongly filter
        # re-inserted copies of a deleted key
        if self._extra_edges.shape[1] > max(
                100_000, self._out_sorted.shape[1] // 4):
            self._compact()
            ei = np.concatenate([self._out_sorted, self._extra_edges],
                                axis=1)
            order = np.argsort(self._edge_key(ei[0], ei[1]), kind="stable")
            self._out_sorted = ei[:, order]
            self._out_starts = np.searchsorted(
                self._out_sorted[0], np.arange(self.num_nodes + 1))
            self._out_keys = self._edge_key(self._out_sorted[0],
                                            self._out_sorted[1])
            self._extra_edges = np.zeros((2, 0), np.int64)
            self._drop_in_csr()  # _in_sorted no longer mirrors _out_sorted

    def _drop_in_csr(self) -> None:
        for attr in ("_in_sorted", "_in_starts"):
            if hasattr(self, attr):
                delattr(self, attr)

    def _is_symmetric(self) -> bool:
        """Whether every stored directed edge has its reverse stored too.
        Resolved ONCE by checking the initial CSR (O(E log E)); any
        subsequent ``undirected=False`` update flips it to False at update
        time.  Undirected updates (the production path — these message
        graphs are undirected) preserve it, so the check never re-runs."""
        self._ensure_adj()
        if self._symmetric is None:
            rev = np.sort(self._edge_key(self._out_sorted[1],
                                         self._out_sorted[0]))
            self._symmetric = bool(np.array_equal(rev, self._out_keys))
        return self._symmetric

    def _in_pairs(self, dsts: np.ndarray) -> np.ndarray:
        """All current (src, dst) edges whose dst is in ``dsts``.

        Symmetric graphs (the production case): in(v) is just out(v) with
        the columns swapped — no dst-sorted CSR to build, and crucially no
        O(E log E) re-argsort after every delete batch (the round-4
        delete-cost driver at scale).  Asymmetric graphs keep the legacy
        dst-sorted CSR over the compacted edge set."""
        if self._is_symmetric():
            return self._out_pairs(dsts)[:, ::-1]
        if not hasattr(self, "_in_sorted"):
            self._compact()  # tombstones would be invisible to a dst sort
            order = np.argsort(self._out_sorted[1], kind="stable")
            self._in_sorted = self._out_sorted[:, order]
            self._in_starts = np.searchsorted(
                self._in_sorted[1], np.arange(self.num_nodes + 1))
        lo = self._in_starts[dsts]
        hi = self._in_starts[dsts + 1]
        counts = hi - lo
        total = int(counts.sum())
        idx = (np.repeat(lo, counts)
               + np.arange(total)
               - np.repeat(np.cumsum(counts) - counts, counts))
        pairs = self._in_sorted[:, idx].T
        if len(self._del_keys):
            pairs = pairs[~self._keys_in_del(
                self._edge_key(pairs[:, 0], pairs[:, 1]))]
        if self._extra_edges.shape[1]:
            m = np.isin(self._extra_edges[1], dsts)
            pairs = np.concatenate([pairs, self._extra_edges[:, m].T])
        return pairs

    def delete_edges(self, edges: np.ndarray, weights=None,
                     undirected: bool = True) -> None:
        """EXACT streaming edge deletion — no reference equivalent.

        Min/max sketches are NOT invertible (a deleted neighbour's hash may
        be the row minimum), so deletion cannot be an incremental merge like
        :meth:`insert_edges`.  It is still exact and LOCAL: hop-k rows only
        depend on hop-(k-1) rows of {v} ∪ in(v) (``propagate_minhash``,
        sketch/elph.py:31-49), so the affected set grows one hop per level —
        A_1 = dst(removed), A_k = A_1 ∪ A_{k-1} ∪ out(A_{k-1}) — and each
        affected row is rebuilt from scratch per hop: reset to the merge
        identity (0xFFFFFFFF / 0 — HLL ranks are ≥ 0), then re-merge the
        surviving in-edges plus the self fold-in.  The result is BIT-equal
        to a from-scratch rebuild on the reduced graph (tested) at
        O(Σ_k vol(A_k)) cost instead of O(E·K).  Degrees and the RA CSR
        update too; SIGN node features stay as precomputed offline (same
        staleness contract as :meth:`insert_edges`).

        Works on every serving configuration — full stacks, hops-only
        stacks (hop-1 rebuilds re-derive the needed hop-0 source rows per
        id), and node-sharded (position-ordered) state — matching
        :meth:`insert_edges`.

        edges: [M, 2] int node pairs; every given directed pair (both
        directions under ``undirected=True``) must currently be present —
        validated BEFORE any state mutation.  All stored copies of a given
        pair are removed; ``weights`` (default 1.0 each) must match the
        total stored weight per pair or degrees/RA drift.
        """
        K = self.sketch_params.max_hops
        edges = np.asarray(edges, dtype=np.int64)
        if edges.ndim != 2 or edges.shape[1] != 2:
            raise ValueError(f"edges must be [M, 2], got {edges.shape}")
        if len(edges) == 0:
            return
        if edges.min() < 0 or edges.max() >= self.num_nodes:
            raise ValueError("edge endpoint out of range "
                             f"[0, {self.num_nodes})")
        w = (np.ones(len(edges), np.float32) if weights is None
             else np.asarray(weights, np.float32))
        if undirected:
            edges = np.concatenate([edges, edges[:, ::-1]])
            w = np.concatenate([w, w])
        # existence check BEFORE any mutation: a raise must never leave
        # degrees/RA updated against un-updated sketches/adjacency.
        # Presence and application are O(B log E + B log |del| + |extra|):
        # the CSR is key-sorted (binary-searchable per directed key) and
        # deletion tombstones instead of compacting — the round-4 path paid
        # an O(E) isin + copy + starts rebuild (plus an O(E log E)
        # dst-CSR re-argsort at the next delete) PER BATCH, the
        # "~100ms-class at citation2 scale" host term of docs/SERVING.md
        self._ensure_adj()
        delkeys = np.unique(self._edge_key(edges[:, 0], edges[:, 1]))
        if len(self._out_keys):
            pos = np.searchsorted(self._out_keys, delkeys)
            posc = np.minimum(pos, len(self._out_keys) - 1)
            in_csr = (self._out_keys[posc] == delkeys) \
                & ~self._keys_in_del(delkeys)
        else:
            # numpy & does not short-circuit: indexing an empty key table
            # must be guarded, not masked (zero-edge base graph serving)
            in_csr = np.zeros(len(delkeys), bool)
        extra_keys = self._edge_key(self._extra_edges[0],
                                    self._extra_edges[1])
        mask_extra = np.isin(extra_keys, delkeys)
        in_extra = np.isin(delkeys, extra_keys[mask_extra])
        missing = delkeys[~(in_csr | in_extra)]
        if len(missing):
            s, d = missing // self.num_nodes, missing % self.num_nodes
            raise ValueError(
                "delete_edges: not present in the graph: "
                f"{list(zip(s[:5].tolist(), d[:5].tolist()))}"
                f"{' …' if len(missing) > 5 else ''}")
        # adjacency: tombstone the CSR keys, physically drop extra copies
        if not undirected:
            self._symmetric = False  # a one-direction delete breaks it
        self._del_keys = np.union1d(self._del_keys, delkeys[in_csr])
        self._extra_edges = self._extra_edges[:, ~mask_extra]
        # amortised compaction keeps the tombstone set (and every walk's
        # filter) bounded on long-running servers
        if len(self._del_keys) > max(100_000,
                                     self._out_sorted.shape[1] // 4):
            self._compact()
        # degrees / RA CSR (same orientation as insert_edges)
        self.deg = self.deg.at[jnp.asarray(edges[:, 1])].add(
            -jnp.asarray(w))
        if self.ra_csr is not None:
            import scipy.sparse as ssp
            self.ra_csr = (self.ra_csr - ssp.csr_matrix(
                (w, (edges[:, 0], edges[:, 1])),
                shape=(self.num_nodes, self.num_nodes))).tocsr()
            self.ra_csr.eliminate_zeros()
        if self.sk is None:
            return
        from subgraph_sketching_tpu.sketch.params import Sketches
        full = self._stack_is_full()
        mh, hll, cards = self.sk.minhash, self.sk.hll, self.sk.cards
        dst_removed = np.unique(edges[:, 1])
        rows = dst_removed
        t_host0, t_disp = time.perf_counter(), 0.0
        for k in range(1, K + 1):
            if k > 1:
                out = self._out_pairs(rows)
                grown = [dst_removed, rows]
                if len(out):
                    grown.append(out[:, 1])
                rows = np.unique(np.concatenate(grown))
            pairs = self._in_pairs(rows)
            pairs = np.concatenate([pairs, np.stack([rows, rows], axis=1)])
            # pad with a row that is being reset anyway (rows[0]): its
            # self-pair re-merge and repeated reset/card are idempotent.
            # Padding with row 0 (the insert convention) would RESET row 0
            # without rebuilding its full in-neighbourhood.
            fill = rows[0]
            kst = k if full else k - 1          # stack index of hop k
            pos_fill = int(self._pos(np.array([fill]))[0])
            d_idx = _pad_pow2(self._pos(pairs[:, 1]), fill=pos_fill)
            rows_pos = _pad_pow2(self._pos(rows), fill=pos_fill)
            td = time.perf_counter()
            if full or k >= 2:
                mh, hll, cards = self._update_jit(reset=True, hop0=False)(
                    mh, hll, cards,
                    (jnp.asarray(_pad_pow2(self._pos(pairs[:, 0]),
                                           fill=pos_fill)),),
                    jnp.asarray(d_idx), jnp.asarray(rows_pos), kst, k - 1)
            else:
                # hops-only stack, k == 1: every source row of the rebuild
                # (in-neighbours + the self fold-in) is a hop-0 row —
                # recomputed by node id, padded with merge identities
                s_mh, s_hll = self._hop0_rows_padded(pairs[:, 0], len(d_idx))
                mh, hll, cards = self._update_jit(reset=True, hop0=True)(
                    mh, hll, cards, (s_mh, s_hll),
                    jnp.asarray(d_idx), jnp.asarray(rows_pos), kst, k - 1)
            t_disp += time.perf_counter() - td
        self.sk = Sketches(minhash=mh, hll=hll, cards=cards)
        self.last_update_stats = {
            "op": "delete", "host_ms": round(
                (time.perf_counter() - t_host0 - t_disp) * 1e3, 2),
            "dispatch_ms": round(t_disp * 1e3, 2)}

    def _update_jit(self, reset: bool, hop0: bool):
        """The single jitted, buffer-donating per-hop scatter-merge behind
        all four streaming-update variants (in-place on device: eager
        ``.at[]`` ops would copy the multi-GB stacks per op; donation lets
        XLA reuse the buffers).

        ``reset=False`` (insert_edges): hop-k rows absorb the new edges'
        hop-(k-1) source rows — min/max merges are monotone, so merging
        into the existing rows is exact.
        ``reset=True`` (delete_edges): the affected hop-k rows are first
        reset to the merge identity (0xFFFFFFFF / 0), then rebuilt from
        their full surviving in-neighbourhood (self fold-in arrives as
        explicit (v, v) pairs) — min/max is not invertible, so deletion
        must rebuild.
        ``hop0=False``: source rows come from stack level ``kst - 1``
        (gathered inside the program — one dispatch per hop).
        ``hop0=True`` (hops-only stacks, k == 1): hop-0 is not stored;
        explicit source rows recomputed by node id on host are passed in
        (``src = (s_mh, s_hll)`` instead of ``(s_idx,)``).

        ``kst`` is hop k's stack index (k for full stacks, k-1 for
        hops-only); ``kcol`` the cards column (always k-1).  Each
        (reset, hop0) pair compiles once and is cached.
        """
        cache = self.__dict__.setdefault("_upd_jits", {})
        if (reset, hop0) not in cache:
            from subgraph_sketching_tpu.sketch.hll import hll_count
            p = self.sketch_params.hll_p

            def upd(mh, hll, cards, src, d_idx, rows, kst, kcol):
                if hop0:
                    s_mh, s_hll = src
                else:
                    (s_idx,) = src
                    s_mh, s_hll = mh[kst - 1, s_idx], hll[kst - 1, s_idx]
                if reset:
                    mh = mh.at[kst, rows].set(jnp.uint32(0xFFFFFFFF))
                    hll = hll.at[kst, rows].set(jnp.int8(0))
                mh = mh.at[kst, d_idx].min(s_mh)
                hll = hll.at[kst, d_idx].max(s_hll)
                cards = cards.at[rows, kcol].set(hll_count(hll[kst, rows], p))
                return mh, hll, cards

            cache[(reset, hop0)] = jax.jit(upd, static_argnums=(6, 7),
                                           donate_argnums=(0, 1, 2))
        return cache[(reset, hop0)]


class ElphLinkScorer:
    """Serve scores from a trained ELPH: the full-graph GCN runs ONCE at
    construction (eval mode, reference get_elph_preds inference.py:167-205)
    and its node representations stay resident; each query batch then
    computes subgraph features from the (deterministically rebuilt) sketch
    stacks and runs the LinkPredictor head.  Same bucketing contract as
    LinkScorer."""

    def __init__(self, trainer, state, split: str = "train",
                 min_bucket: int = 1024, max_bucket: int = 1 << 18):
        from subgraph_sketching_tpu.ops.segment_scan import make_auto_plan
        from subgraph_sketching_tpu.sketch.elph import build_hash_tables

        cfg = trainer.cfg
        self.cfg = cfg
        self.sketch_params = trainer.sketch_params
        data = trainer._data[split]
        num_nodes = data["num_nodes"]
        self.num_nodes = num_nodes
        ei = np.asarray(data["edge_index"])
        if data.get("mask") is not None:
            # graph-axis staging pads the edge list with (0, 0) columns
            # (loops.py stage); drop them or node 0 gains phantom edges
            ei = ei[:, np.asarray(data["mask"])]
        if cfg.use_struct_feature:
            plan = (make_auto_plan(ei, num_nodes,
                                   max_slots=cfg.max_gather_slots)
                    if cfg.use_plan else None)
            self.sk = build_hash_tables(jnp.asarray(ei), num_nodes,
                                        self.sketch_params, plan=plan)
        else:
            # trained on zeroed structure features (--use_struct_feature 0,
            # reference train.py:203-206) — serve the same zeros
            self.sk = None
        feats, _ = trainer._node_feats(
            state.params["gnn"], state.batch_stats["gnn"], data, False,
            plan=trainer._spmm_plans.get(split))
        self.feats = feats
        # resolve the (possibly SIGN-diffused) embedding table once; queries
        # then only gather rows (reference inference.py:179-180)
        self.emb_table = (trainer._emb_rows(state.params["embedding"],
                                            state.batch_stats["embedding"],
                                            None, data, False)[0]
                          if trainer.use_embedding else None)
        self.predictor = trainer.predictor
        self.pred_params = state.params["predictor"]
        self.pred_bs = state.batch_stats["predictor"]
        self.min_bucket = min_bucket
        self.max_bucket = max_bucket
        self._jit = jax.jit(self._score_batch)

    def _score_batch(self, params, batch_stats, links, sk, feats, emb_table):
        sf = (subgraph_features(links, sk, self.sketch_params)
              if sk is not None else
              jnp.zeros((links.shape[0], self.sketch_params.sf_dim)))
        nf = feats[links] if feats is not None else None
        emb = emb_table[links] if emb_table is not None else None
        return self.predictor.apply(
            {"params": params, "batch_stats": batch_stats}, sf, nf, emb,
            training=False).ravel()

    def score(self, links: np.ndarray) -> np.ndarray:
        return _bucketed_score(
            lambda chunk: self._jit(self.pred_params, self.pred_bs, chunk,
                                    self.sk, self.feats, self.emb_table),
            links, self.min_bucket, self.max_bucket)

    def warmup(self, buckets: Optional[list] = None) -> None:
        """Pre-compile the given bucket sizes (default: min_bucket only)."""
        for b in (buckets or [self.min_bucket]):
            self.score(np.zeros((b, 2), np.int32))


def scorer_from_checkpoint(checkpoint_dir: str, cfg=None,
                           split: str = "train", min_bucket: int = 1024,
                           max_bucket: int = 1 << 18):
    """Rebuild the full serving stack from a training run directory.

    A run started with ``--save_model --checkpoint_dir D`` writes
    ``config.json`` (metrics_logging.MetricsLogger) and an orbax checkpoint
    under D.  This reloads both in a fresh process: re-runs the
    deterministic preprocessing (or reads its npz caches when the run used
    ``--cache_subgraph_features``/``--load_hashes``), restores the trained
    state into the rebuilt trainer, and returns a ready
    LinkScorer/ElphLinkScorer with ``.restored_step`` set.  ``split`` picks
    the message graph served against (e.g. "test" for ogbl-collab, where
    val edges join the test message graph).
    """
    import os

    import jax.random

    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.datasets import get_data
    from subgraph_sketching_tpu.graph.preprocess import build_all_splits
    from subgraph_sketching_tpu.runners.run import build_trainer
    from subgraph_sketching_tpu.train.checkpoint import restore_into

    if cfg is None:
        path = os.path.join(checkpoint_dir, "config.json")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"{path} not found — pass cfg= explicitly, or train with "
                f"--checkpoint_dir so config.json is written")
        with open(path) as f:
            cfg = Config.from_json(f.read())
    splits, directed, _ = get_data(cfg)
    # build_all_splits (the runner's own path): splits sharing the train
    # message graph reuse its SIGN features and sketch tables instead of
    # re-running the minutes-scale preprocessing per split
    datasets = build_all_splits(splits, cfg, directed=directed)
    num_features = (None if datasets["train"].x is None
                    else datasets["train"].x.shape[-1])
    trainer = build_trainer(cfg, datasets, num_features)
    state = trainer.init_state(jax.random.PRNGKey(0))
    state, step = restore_into(checkpoint_dir, state)
    if cfg.model == "ELPH":
        scorer = ElphLinkScorer(trainer, state, split=split,
                                min_bucket=min_bucket, max_bucket=max_bucket)
    else:
        scorer = LinkScorer(trainer, datasets[split], state,
                            min_bucket=min_bucket, max_bucket=max_bucket)
    scorer.restored_step = step
    return scorer
