"""Scaling-efficiency harness: edges/s at 1 -> N devices.

North-star metric #4 (BASELINE.md): >= 80% edges/s scaling efficiency across
devices.  Measures the edge-sharded sketch-propagation step on meshes of
increasing size.  On the virtual CPU mesh the numbers validate the harness
and collective structure, not real ICI bandwidth; on a pod slice the same
function reports true scaling.
"""

from __future__ import annotations

import time
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from subgraph_sketching_tpu.graph.container import Graph
from subgraph_sketching_tpu.parallel.dist_sketch import (
    edge_sharded_build_hash_tables,
)
from subgraph_sketching_tpu.parallel.mesh import make_mesh
from subgraph_sketching_tpu.sketch.elph import initialise_sketches
from subgraph_sketching_tpu.sketch.params import SketchParams


def measure_scaling(num_nodes: int = 20000, avg_deg: int = 16,
                    device_counts: List[int] = None,
                    iters: int = 3) -> Dict[int, float]:
    """edges/s of one full build_hash_tables pass per device count."""
    if device_counts is None:
        n_dev = len(jax.devices())
        device_counts = [d for d in (1, 2, 4, 8, 16) if d <= n_dev]
    rng = np.random.default_rng(0)
    e = num_nodes * avg_deg
    ei = np.stack([rng.integers(0, num_nodes, e, dtype=np.int32),
                   rng.integers(0, num_nodes, e, dtype=np.int32)])
    g = Graph(ei, num_nodes)
    params = SketchParams(max_hops=2)
    mh0, hll0 = initialise_sketches(num_nodes, params)
    mh0, hll0 = jnp.asarray(mh0), jnp.asarray(hll0)

    results = {}
    for d in device_counts:
        mesh = make_mesh([d], ("graph",))
        eip, _, mask = g.padded_edges(multiple=max(1024, d))
        eij, maskj = jnp.asarray(eip), jnp.asarray(mask)

        def run():
            sk = edge_sharded_build_hash_tables(
                eij, num_nodes, params, mesh, mh0, hll0, mask=maskj)
            jax.block_until_ready(sk.cards)

        run()  # compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        # 2 hops, 2 sketch types -> 2*E edge-reductions per hop table build
        results[d] = params.max_hops * e / min(times)
    return results


def measure_node_sharded_scaling(num_nodes: int = 20000, avg_deg: int = 16,
                                 device_counts: List[int] = None,
                                 iters: int = 3) -> Dict[int, float]:
    """edges/s of the memory-sharded (node-partitioned, halo-exchange)
    build per device count — per-device state is ~1/D of the table."""
    from subgraph_sketching_tpu.parallel.node_sharded import (
        make_node_partition, node_sharded_build_hash_tables,
    )
    if device_counts is None:
        n_dev = len(jax.devices())
        device_counts = [d for d in (2, 4, 8, 16) if d <= n_dev]
    rng = np.random.default_rng(0)
    e = num_nodes * avg_deg
    ei = np.stack([rng.integers(0, num_nodes, e, dtype=np.int32),
                   rng.integers(0, num_nodes, e, dtype=np.int32)])
    params = SketchParams(max_hops=2)
    mh0, hll0 = initialise_sketches(num_nodes, params)

    results = {}
    for d in device_counts:
        mesh = make_mesh([d], ("graph",))
        plan = make_node_partition(ei, num_nodes, d)
        mh0p, hll0p = plan.pad_init(mh0, hll0)

        def run():
            sk = node_sharded_build_hash_tables(plan, params, mesh, mh0p,
                                                hll0p)
            jax.block_until_ready(sk.cards)

        run()  # compile
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        results[d] = params.max_hops * e / min(times)
    return results


def scaling_efficiency(results: Dict[int, float]) -> Dict[int, float]:
    base = results[min(results)]
    return {d: eps / (base * d / min(results)) for d, eps in results.items()}


if __name__ == "__main__":
    res = measure_scaling()
    eff = scaling_efficiency(res)
    for d in sorted(res):
        print(f"{d} devices: {res[d] / 1e6:.2f}M edges/s "
              f"(efficiency {100 * eff[d]:.0f}%)")
