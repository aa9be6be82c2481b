"""Multi-chip training of the real models: dp over the link batch,
graph-sharded sketch construction, lane-sharded feature extraction, and the
full ELPH module (GCN feature side + LinkPredictor head) as SPMD programs.

The mesh axes map onto the classic parallelism menu as it applies to this
model family (there is no sequence/pipeline dimension in ELPH/BUDDY):
  data  -> DP over links (grad psum inserted by XLA)
  graph -> edge partitioning for propagation (the SP/EP analogue)
  lane  -> sketch-width sharding (the TP analogue)

The step is written as a plain jax function and distributed with
``jax.jit(in_shardings=...)``: XLA GSPMD partitions the GCN SpMM over the
sharded edge list and inserts the collectives, so the distributed program is
numerically the SAME program as the single-device one — the multi-chip tests
assert loss/param equality, not just finiteness.

Sketch tables are gradient-free and step-constant (they depend only on the
graph), so they are built ONCE by the returned ``build_sketches`` function
and passed into every step — the same hoisting the single-device ElphTrainer
does.  Only the per-link feature extraction runs inside the step.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from subgraph_sketching_tpu.models.elph import ELPH
from subgraph_sketching_tpu.models.predictor import LinkPredictor
from subgraph_sketching_tpu.parallel.dist_sketch import (
    edge_sharded_build_hash_tables, lane_sharded_subgraph_features,
)
from subgraph_sketching_tpu.sketch.params import SketchParams
from subgraph_sketching_tpu.train.losses import bce_loss


class DistTrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any


def _model_parts(params: SketchParams, hidden_channels: int, lr: float,
                 label_dropout: float, feature_dropout: float):
    gnn = ELPH(params, hidden_channels, use_feature=True, feature_prop="gcn",
               feature_dropout=feature_dropout)
    predictor = LinkPredictor(params.sf_dim, hidden_channels,
                              use_feature=True, label_dropout=label_dropout,
                              feature_dropout=feature_dropout)
    return gnn, predictor, optax.adam(lr)


def _make_init_fn(gnn, predictor, optimizer, num_nodes: int,
                  params: SketchParams):
    def init_fn(rng, x, edge_index, mask, links):
        gnn_vars = gnn.init({"params": rng, "dropout": rng}, x, edge_index,
                            num_nodes, mask=mask, training=False)
        feats, _ = gnn.apply(gnn_vars, x, edge_index, num_nodes, mask=mask,
                             training=False)
        sf0 = jnp.zeros((links.shape[0], params.sf_dim))
        pred_vars = predictor.init({"params": rng, "dropout": rng}, sf0,
                                   feats[links], training=False)
        p = {"gnn": gnn_vars["params"], "predictor": pred_vars["params"]}
        bs = {"gnn": gnn_vars.get("batch_stats", {}),
              "predictor": pred_vars.get("batch_stats", {})}
        return DistTrainState(p, bs, optimizer.init(p))

    return init_fn


def _make_step(gnn, predictor, optimizer, num_nodes: int, feature_fn):
    """The ONE step body both the distributed and single-device paths run —
    they differ only in ``feature_fn`` (how subgraph features are extracted
    from the precomputed sketches) and in how the caller jits/shards it, so
    the equality oracle can never drift from the distributed math."""

    def step(state: DistTrainState, x, edge_index, mask, sk, links, labels,
             rng) -> Tuple[DistTrainState, jnp.ndarray]:
        sf = jax.lax.stop_gradient(feature_fn(sk, links))
        k1, k2 = jax.random.split(rng)

        def loss_fn(p):
            gv = {"params": p["gnn"], "batch_stats": state.batch_stats["gnn"]}
            (feats, _), gupd = gnn.apply(
                gv, x, edge_index, num_nodes, mask=mask, training=True,
                mutable=["batch_stats"], rngs={"dropout": k1})
            pv = {"params": p["predictor"],
                  "batch_stats": state.batch_stats["predictor"]}
            logits, pupd = predictor.apply(
                pv, sf, feats[links], training=True, mutable=["batch_stats"],
                rngs={"dropout": k2})
            new_bs = {"gnn": gupd.get("batch_stats", {}),
                      "predictor": pupd.get("batch_stats", {})}
            return bce_loss(logits, labels), new_bs

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state)
        new_params = optax.apply_updates(state.params, updates)
        return DistTrainState(new_params, new_bs, new_opt), loss

    return step


def make_distributed_train_step(mesh: Mesh, params: SketchParams,
                                hidden_channels: int, num_nodes: int,
                                lr: float = 1e-3,
                                label_dropout: float = 0.5,
                                feature_dropout: float = 0.5,
                                node_partition=None):
    """Full ELPH training over a mesh.

    Returns ``(init_fn, step_fn, optimizer, build_sketches)``:
      * ``build_sketches(edge_index, mask, init_mh, init_hll) -> Sketches``
        — jitted, edge-sharded over the ``graph`` axis when present.  Run it
        ONCE per graph (sketches are gradient-free and step-constant;
        rebuilding them per step would pay O(max_hops * E * width) of
        propagation for bit-identical tables, reference hot loop
        src/hashing.py:139-165).
      * ``step_fn(state, x, edge_index, mask, sk, links, labels, rng)`` —
        lane-sharded feature extraction, full-graph GCN pass, LinkPredictor
        scoring + BCE + Adam, with the link batch sharded on ``data``.
        Dropout takes a fresh per-step key, matching the single-device
        trainer.

    ``node_partition`` (a NodePartitionPlan over the ``graph`` axis):
    MEMORY-sharded mode — the sketch tables are built node-partitioned with
    halo exchange and stay sharded 1/D per device through training; the
    per-step feature extraction assembles only the queried rows via psum
    (parallel/node_sharded.py).  This is the citation2-scale configuration:
    sketch state never sits whole on one chip even while ELPH trains.
    """
    gnn, predictor, optimizer = _model_parts(
        params, hidden_channels, lr, label_dropout, feature_dropout)
    has_lane = "lane" in mesh.axis_names
    has_graph = "graph" in mesh.axis_names
    if node_partition is not None and not has_graph:
        raise ValueError("node_partition needs a 'graph' mesh axis")

    def build_sketches(edge_index, mask, init_mh, init_hll):
        if node_partition is not None:
            from subgraph_sketching_tpu.parallel.node_sharded import (
                node_sharded_build_hash_tables,
            )
            import numpy as np
            mh0, hll0 = node_partition.pad_init(np.asarray(init_mh),
                                                np.asarray(init_hll))
            return node_sharded_build_hash_tables(node_partition, params,
                                                  mesh, mh0, hll0)
        if has_graph:
            return edge_sharded_build_hash_tables(
                edge_index, num_nodes, params, mesh, init_mh, init_hll,
                mask=mask, axis="graph")
        from subgraph_sketching_tpu.sketch.elph import build_hash_tables
        return build_hash_tables(edge_index, num_nodes, params, mask=mask,
                                 init=(init_mh, init_hll))

    def feature_fn(sk, links):
        if node_partition is not None:
            from subgraph_sketching_tpu.parallel.node_sharded import (
                node_sharded_subgraph_features,
            )
            return node_sharded_subgraph_features(
                links, sk, params, mesh, perm=node_partition.perm)
        if has_lane:
            return lane_sharded_subgraph_features(links, sk, params, mesh,
                                                  axis="lane")
        from subgraph_sketching_tpu.sketch.elph import subgraph_features
        return subgraph_features(links, sk, params)

    init_fn = _make_init_fn(gnn, predictor, optimizer, num_nodes, params)
    step = _make_step(gnn, predictor, optimizer, num_nodes, feature_fn)

    rep = NamedSharding(mesh, P())
    data_shard = (NamedSharding(mesh, P("data"))
                  if "data" in mesh.axis_names else rep)
    edge_shard = (NamedSharding(mesh, P(None, "graph")) if has_graph else rep)
    edge_mask_shard = (NamedSharding(mesh, P("graph")) if has_graph else rep)
    lane_shard = (NamedSharding(mesh, P(None, "lane")) if has_lane else rep)

    build_jit = jax.jit(
        build_sketches,
        in_shardings=(edge_shard, edge_mask_shard, lane_shard, lane_shard)
    ) if node_partition is None else build_sketches
    # (the node-sharded builder jits per hop internally and device_puts the
    # halo plan — it must not be re-wrapped in an outer jit)
    step_jit = jax.jit(
        step,
        # sk sharding = None: respect whatever layout build_sketches
        # committed (the shard_map stages reshard per their in_specs)
        in_shardings=(rep, rep, edge_shard, edge_mask_shard, None,
                      data_shard, data_shard, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    return init_fn, step_jit, optimizer, build_jit


def single_device_reference_step(params: SketchParams, hidden_channels: int,
                                 num_nodes: int, lr: float = 1e-3,
                                 label_dropout: float = 0.5,
                                 feature_dropout: float = 0.5):
    """The SAME step body without a mesh — the equality oracle for the
    distributed step (used by tests and dryrun_multichip).  Shares
    ``_make_step``/``_make_init_fn`` with the distributed path, so the
    oracle cannot drift from the distributed math."""
    from subgraph_sketching_tpu.sketch.elph import (
        build_hash_tables, subgraph_features,
    )

    gnn, predictor, optimizer = _model_parts(
        params, hidden_channels, lr, label_dropout, feature_dropout)

    @jax.jit
    def build_sketches(edge_index, mask, init_mh, init_hll):
        return build_hash_tables(edge_index, num_nodes, params, mask=mask,
                                 init=(init_mh, init_hll))

    init_fn = _make_init_fn(gnn, predictor, optimizer, num_nodes, params)
    step = jax.jit(_make_step(
        gnn, predictor, optimizer, num_nodes,
        lambda sk, links: subgraph_features(links, sk, params)))
    return init_fn, step, optimizer, build_sketches
