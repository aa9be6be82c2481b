"""Per-split preprocessing: the HashDataset equivalent.

Produces everything BUDDY training needs as dense arrays — links+labels,
SIGN-propagated node features, degrees, optional RA scores, sketches, and
per-link subgraph features — with npz disk caching keyed like the reference
(split, hops, sign_k, year, num_negs; src/datasets/elph.py:154-173).

ELPH keeps raw x and computes sketches in-model; BUDDY hoists all
graph-dependent work here (reference src/datasets/elph.py:21-242).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from time import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.splits import SplitData
from subgraph_sketching_tpu.heuristics import resource_allocation
from subgraph_sketching_tpu.ops.graph_ops import gcn_norm, spmm
from subgraph_sketching_tpu.sketch.elph import (
    build_hash_tables, subgraph_features_batched,
)
from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches


def sketch_params_from_config(cfg: Config) -> SketchParams:
    return SketchParams(max_hops=cfg.max_hash_hops,
                        num_perm=cfg.minhash_num_perm,
                        hll_p=cfg.hll_p,
                        use_zero_one=cfg.use_zero_one,
                        floor_sf=cfg.floor_sf)


@dataclass
class LinkDataset:
    """Fully hydrated split, ready to stream to the device."""

    links: np.ndarray                 # [N, 2] int32 (pos ‖ neg)
    labels: np.ndarray                # [N] float32
    edge_index: np.ndarray            # [2, E] message-passing graph (undirected)
    edge_weight: np.ndarray           # [E]
    num_nodes: int
    x: Optional[np.ndarray]           # node features (SIGN-propagated for BUDDY)
    degrees: np.ndarray               # [n] weighted degrees
    subgraph_features: Optional[np.ndarray] = None  # [N, sf_dim] (BUDDY)
    RA: Optional[np.ndarray] = None   # [N]
    sketches: Optional[Sketches] = None  # retained for ELPH-style eval
    # node-id -> row-position map when ``sketches`` is node-sharded
    # (locality-partitioned) state; None for plain single-device sketches
    sketch_perm: Optional[np.ndarray] = None

    @property
    def num_links(self) -> int:
        return len(self.links)


def sign_features(x: np.ndarray, edge_index: np.ndarray,
                  edge_weight: Optional[np.ndarray], num_nodes: int,
                  sign_k: int, use_plan: bool = True,
                  max_gather_slots: Optional[int] = None) -> np.ndarray:
    """SIGN precompute (reference _generate_sign_features,
    src/datasets/elph.py:87-110): gcn_norm then sign_k=0 -> one propagation
    replacing x; sign_k>0 -> concat [x, Ax, ..., A^k x].

    The SpMM runs through the static padded-tree plan (fast path) when
    ``use_plan``; the scatter path otherwise.
    """
    ei = jnp.asarray(edge_index)
    ew = None if edge_weight is None else jnp.asarray(edge_weight)
    nei, nw, _ = gcn_norm(ei, ew, num_nodes)
    xj = jnp.asarray(x)

    # staged weights / edge arrays ride as jit ARGUMENTS: large closure
    # constants can overflow or drop the remote-compile request at
    # million-node scale (same class of failure as the trainer fix)
    if use_plan:
        from subgraph_sketching_tpu.ops.segment_scan import make_auto_plan
        plan = make_auto_plan(np.asarray(nei), num_nodes,
                              max_slots=max_gather_slots)
        wslots = plan.stage_edge_data(np.asarray(nw))
        prop_w = jax.jit(lambda v, w: plan.reduce(v, "add",
                                                  edge_data_slots=w))
        prop = lambda v: prop_w(v, wslots)
    else:
        prop_s = jax.jit(lambda v, a, b: spmm(a, b, v, num_nodes))
        prop = lambda v: prop_s(v, nei, nw)

    if sign_k == 0:
        return np.asarray(prop(xj))
    xs = [xj]
    cur = xj
    for _ in range(sign_k):
        cur = prop(cur)
        xs.append(cur)
    return np.asarray(jnp.concatenate(xs, axis=-1))


def _cache_name(cfg: Config, split: str, kind: str) -> Optional[str]:
    if not cfg.cache_dir:
        return None
    hop_str = "" if cfg.max_hash_hops == 2 else f"{cfg.max_hash_hops}hop_"
    year_str = f"year_{cfg.year}" if (cfg.dataset_name == "ogbl-collab"
                                      and cfg.year > 0) else ""
    neg_str = ("" if cfg.num_negs == 1 or split != "train"
               else f"negs{cfg.num_negs}_")
    os.makedirs(cfg.cache_dir, exist_ok=True)
    return os.path.join(
        cfg.cache_dir,
        f"{cfg.dataset_name}_{split}_{neg_str}{year_str}{hop_str}{kind}.npz")


def _chunked_node_sharded_features(links, sketches, params, mesh,
                                   cfg: Config, perm=None) -> np.ndarray:
    """Per-link features from NODE-sharded sketch state, in fixed-size
    chunks (one compiled shape; the tail pads with (0, 0) links)."""
    from subgraph_sketching_tpu.parallel.node_sharded import (
        node_sharded_subgraph_features,
    )
    bs = min(cfg.subgraph_feature_batch_size, 1 << 18)
    chunks = []
    for s in range(0, len(links), bs):
        chunk = np.asarray(links[s:s + bs], dtype=np.int32)
        pad = 0
        if len(chunk) < bs and s > 0:
            pad = bs - len(chunk)
            chunk = np.concatenate([chunk, np.zeros((pad, 2), np.int32)])
        res = np.asarray(node_sharded_subgraph_features(
            jnp.asarray(chunk), sketches, params, mesh, perm=perm))
        chunks.append(res[:len(res) - pad] if pad else res)
    return np.concatenate(chunks, axis=0)[:len(links)]


def build_link_dataset(split_data: SplitData, cfg: Config, split: str,
                       model: Optional[str] = None,
                       directed: bool = False,
                       reuse_from: Optional[LinkDataset] = None
                       ) -> LinkDataset:
    """Hydrate one split (reference HashDataset.__init__,
    src/datasets/elph.py:27-85).

    ``reuse_from``: a previously built split (usually train).  When this
    split's message graph is byte-identical (the common case: valid shares
    the train edges), the graph-only precomputes — SIGN features and the
    sketch tables, the dominant preprocessing cost — are reused instead of
    recomputed; per-link work (subgraph features, RA) still runs."""
    model = model or cfg.model
    g = split_data.graph
    if cfg.dataset_name == "ogbl-collab":
        g = g.coalesce()  # compress multi-edges (src/datasets/elph.py:54-57)
    if directed:
        # directed graphs (citation2) become undirected for propagation and
        # subgraph features (src/datasets/elph.py:63-66); undirected splits
        # are already symmetric
        g = g.to_undirected()
    same_graph = (
        reuse_from is not None
        and reuse_from.num_nodes == g.num_nodes
        and reuse_from.edge_index.shape == g.edge_index.shape
        and np.array_equal(reuse_from.edge_index, g.edge_index)
        and ((reuse_from.edge_weight is None) == (g.weights is None))
        and (g.weights is None
             or np.array_equal(np.asarray(reuse_from.edge_weight),
                               np.asarray(g.weights))))
    links = split_data.links.astype(np.int32)
    labels = split_data.labels
    degrees = reuse_from.degrees if same_graph else g.degrees()

    RA = None
    if cfg.use_RA:
        RA = resource_allocation(g.csr(), links, batch_size=2000000)

    if model == "ELPH":
        x = g.x  # ELPH propagates features in-model
        return LinkDataset(links, labels, g.edge_index, g.weights, g.num_nodes,
                           x, degrees, RA=RA)

    # ---- BUDDY: precompute everything ----
    feat_cache = _cache_name(cfg, split, f"k{cfg.sign_k}_features")
    if same_graph:
        x = reuse_from.x  # SIGN features depend only on the message graph
    elif feat_cache and cfg.load_features and os.path.exists(feat_cache):
        x = np.load(feat_cache)["x"]
    else:
        x = None
        if g.x is not None:
            t0 = time()
            x = sign_features(g.x, g.edge_index, g.edge_weight, g.num_nodes,
                              cfg.sign_k, use_plan=cfg.use_plan,
                              max_gather_slots=cfg.max_gather_slots)
            if cfg.load_features and feat_cache:
                np.savez(feat_cache, x=x)

    sf_cache = _cache_name(cfg, split, "subgraph_features")
    params = sketch_params_from_config(cfg)
    sketches = reuse_from.sketches if same_graph else None
    sketch_perm = reuse_from.sketch_perm if same_graph else None
    if sketches is not None:
        mesh = None
        if cfg.mesh_shape and "graph" in (cfg.mesh_axes or []):
            from subgraph_sketching_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
        if mesh is not None and sketch_perm is not None:
            sf = _chunked_node_sharded_features(links, sketches, params,
                                                mesh, cfg, perm=sketch_perm)
        else:
            sf = np.asarray(subgraph_features_batched(
                links, sketches, params,
                batch_size=min(cfg.subgraph_feature_batch_size, 1 << 18)))
    elif sf_cache and cfg.cache_subgraph_features and os.path.exists(sf_cache):
        sf = np.load(sf_cache)["sf"]
        assert sf.shape[0] == len(links), (
            "cached subgraph features are inconsistent with the link object; "
            "delete the cache file and regenerate")
    else:
        mesh = None
        if cfg.mesh_shape and "graph" in (cfg.mesh_axes or []):
            from subgraph_sketching_tpu.parallel.mesh import make_mesh
            mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
        hash_cache = _cache_name(cfg, split, "hashes")
        if hash_cache and cfg.load_hashes and os.path.exists(hash_cache):
            z = np.load(hash_cache)
            sketches = Sketches(minhash=jnp.asarray(z["minhash"]),
                                hll=jnp.asarray(z["hll"]),
                                cards=jnp.asarray(z["cards"]))
        elif mesh is not None:
            # memory-sharded preprocessing (the citation2-scale path): the
            # sketch tables never sit whole on one chip — locality-ordered
            # node-partitioned build with halo exchange, per-batch
            # psum-assembled features
            from subgraph_sketching_tpu.parallel.node_sharded import (
                make_node_partition, node_sharded_build_hash_tables,
            )
            from subgraph_sketching_tpu.sketch.elph import initialise_sketches
            D = mesh.shape["graph"]
            part = make_node_partition(g.edge_index, g.num_nodes, D)
            mh0, hll0 = part.pad_init(*initialise_sketches(g.num_nodes,
                                                           params))
            sketches = node_sharded_build_hash_tables(
                part, params, mesh, mh0, hll0,
                max_gather_rows=cfg.max_gather_slots)
            sketch_perm = part.perm
        else:
            from subgraph_sketching_tpu.ops.segment_scan import make_auto_plan
            plan = (make_auto_plan(g.edge_index, g.num_nodes,
                                   max_slots=cfg.max_gather_slots)
                    if cfg.use_plan else None)
            sketches = build_hash_tables(jnp.asarray(g.edge_index),
                                         g.num_nodes, params, plan=plan,
                                         hops_only=cfg.hops_only_sketches)
            if hash_cache and cfg.load_hashes:
                np.savez(hash_cache, minhash=np.asarray(sketches.minhash),
                         hll=np.asarray(sketches.hll),
                         cards=np.asarray(sketches.cards))
        if mesh is not None and sketch_perm is not None:
            sf = _chunked_node_sharded_features(links, sketches, params,
                                                mesh, cfg, perm=sketch_perm)
        else:
            sf = np.asarray(subgraph_features_batched(
                links, sketches, params,
                batch_size=min(cfg.subgraph_feature_batch_size, 1 << 18)))
        if sf_cache and cfg.cache_subgraph_features:
            np.savez(sf_cache, sf=sf)

    # floor / zero-one knockout also applied post-cache like the reference
    # (src/datasets/elph.py:214-222)
    sf = np.array(sf)  # own writable copy (np.asarray of a jax array is r/o)
    if cfg.floor_sf:
        sf = np.maximum(sf, 0)
    if not cfg.use_zero_one:
        if cfg.max_hash_hops == 2:
            sf[:, [4, 5]] = 0
        elif cfg.max_hash_hops == 3:
            sf[:, [4, 5, 11, 12]] = 0

    return LinkDataset(links, labels, g.edge_index, g.weights, g.num_nodes,
                       x, degrees, subgraph_features=sf, RA=RA,
                       sketches=sketches, sketch_perm=sketch_perm)


def build_all_splits(splits, cfg: Config, directed: bool = False):
    """train/valid/test LinkDatasets (reference
    get_hashed_train_val_test_datasets, src/datasets/elph.py:245-265).
    Splits whose message graph equals the train split's reuse its SIGN
    features and sketch tables instead of recomputing them."""
    out: Dict[str, LinkDataset] = {}
    for name, sd in splits.items():
        out[name] = build_link_dataset(sd, cfg, name, directed=directed,
                                       reuse_from=out.get("train"))
    return out


def make_train_eval_dataset(train_ds: LinkDataset,
                            n_pos_samples: int = 5000) -> LinkDataset:
    """Small train subset for unbiased train-metric estimates on large
    datasets (citation2) — reference make_train_eval_data,
    src/datasets/elph.py:292-325.

    The negatives-per-positive count is DERIVED from the dataset (the train
    split was built with cfg.num_negs same-source negatives per positive,
    laid out in per-positive blocks after all positives); deriving it keeps
    the k selected positives aligned with exactly their own negative blocks
    for any --num_negs, and alignment is asserted like the reference."""
    n_pos_total = int(train_ds.labels.sum())
    n_neg_total = len(train_ds.links) - n_pos_total
    if n_pos_total == 0 or n_neg_total % n_pos_total:
        raise ValueError(
            f"train split is not per-positive-block aligned "
            f"({n_pos_total} positives, {n_neg_total} negatives); "
            f"regenerate the cached negatives")
    negs_per_pos = n_neg_total // n_pos_total
    n_pos = min(n_pos_samples, n_pos_total)
    pos = train_ds.links[:n_pos]
    pos_sf = train_ds.subgraph_features[:n_pos]
    n_neg = n_pos * negs_per_pos
    neg = train_ds.links[n_pos_total:n_pos_total + n_neg]
    neg_sf = train_ds.subgraph_features[n_pos_total:n_pos_total + n_neg]
    assert (pos[:, 0].repeat(negs_per_pos) == neg[:, 0]).all(), (
        "negatives have different source nodes to positives; delete "
        "cached negatives and regenerate")
    RA = None
    if train_ds.RA is not None:
        RA = np.concatenate([train_ds.RA[:n_pos],
                             train_ds.RA[n_pos_total:n_pos_total + n_neg]])
    return LinkDataset(
        links=np.concatenate([pos, neg]),
        labels=np.concatenate([np.ones(n_pos, np.float32),
                               np.zeros(n_neg, np.float32)]),
        edge_index=train_ds.edge_index, edge_weight=train_ds.edge_weight,
        num_nodes=train_ds.num_nodes, x=train_ds.x,
        degrees=train_ds.degrees,
        subgraph_features=np.concatenate([pos_sf, neg_sf]), RA=RA,
        sketches=train_ds.sketches, sketch_perm=train_ds.sketch_perm)
