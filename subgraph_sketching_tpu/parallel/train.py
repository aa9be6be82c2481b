"""Multi-chip training steps: dp over the link batch, graph-sharded sketch
construction, lane-sharded feature extraction — one jitted SPMD program.

The mesh axes map onto the classic parallelism menu as it applies to this
model family (there is no sequence/pipeline dimension in ELPH/BUDDY):
  data  -> DP over links (grad psum inserted by XLA)
  graph -> edge partitioning for propagation (the SP/EP analogue)
  lane  -> sketch-width sharding (the TP analogue)
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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


def make_distributed_train_step(mesh: Mesh, params: SketchParams,
                                hidden_channels: int, num_nodes: int,
                                lr: float = 1e-3):
    """Full ELPH-style training step over a mesh.

    One jitted program: edge-sharded sketch propagation (graph axis) ->
    lane-sharded subgraph features (lane axis) -> link scoring + BCE + Adam
    with the batch sharded on the data axis.  Returns
    (init_fn, step_fn, optimizer).
    """
    predictor = LinkPredictor(params.sf_dim, hidden_channels,
                              use_feature=True, label_dropout=0.0,
                              feature_dropout=0.0)
    optimizer = optax.adam(lr)
    has_lane = "lane" in mesh.axis_names
    has_graph = "graph" in mesh.axis_names

    def forward_features(edge_index, mask, init_mh, init_hll, links):
        if has_graph:
            sk = edge_sharded_build_hash_tables(
                edge_index, num_nodes, params, mesh, init_mh, init_hll,
                mask=mask, axis="graph")
        else:
            from subgraph_sketching_tpu.sketch.elph import build_hash_tables
            sk = build_hash_tables(edge_index, num_nodes, params, mask=mask,
                                   init=(init_mh, init_hll))
        if has_lane:
            sf = lane_sharded_subgraph_features(links, sk, params, mesh,
                                                axis="lane")
        else:
            from subgraph_sketching_tpu.sketch.elph import subgraph_features
            sf = subgraph_features(links, sk, params)
        return sf

    def init_fn(rng, x, links):
        nf = x[links]
        sf0 = jnp.zeros((links.shape[0], params.sf_dim))
        variables = predictor.init({"params": rng, "dropout": rng}, sf0, nf,
                                   training=False)
        p = variables["params"]
        return DistTrainState(p, variables.get("batch_stats", {}),
                              optimizer.init(p))

    def step(state: DistTrainState, x, edge_index, mask, init_mh, init_hll,
             links, labels) -> Tuple[DistTrainState, jnp.ndarray]:
        sf = forward_features(edge_index, mask, init_mh, init_hll, links)
        sf = jax.lax.stop_gradient(sf)

        def loss_fn(p):
            nf = x[links]
            variables = {"params": p, "batch_stats": state.batch_stats}
            logits, updates = predictor.apply(
                variables, sf, nf, training=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return bce_loss(logits, labels), updates["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state)
        new_params = optax.apply_updates(state.params, updates)
        return DistTrainState(new_params, new_bs, new_opt), loss

    rep = NamedSharding(mesh, P())
    data_shard = NamedSharding(mesh, P("data"))
    edge_shard = (NamedSharding(mesh, P(None, "graph")) if has_graph else rep)
    edge_mask_shard = (NamedSharding(mesh, P("graph")) if has_graph else rep)
    lane_shard = (NamedSharding(mesh, P(None, "lane")) if has_lane else rep)

    step_jit = jax.jit(
        step,
        in_shardings=(rep, rep, edge_shard, edge_mask_shard, lane_shard,
                      lane_shard, data_shard, data_shard),
        out_shardings=(rep, rep),
        donate_argnums=(0,),
    )
    return init_fn, step_jit, optimizer
