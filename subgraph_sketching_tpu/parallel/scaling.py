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


def lane_row_bytes(params: SketchParams, lane_shards: int) -> int:
    """Per-(node, lane-shard) sketch row bytes in the TPU tiled layout.

    The minor (width) dimension tiles to 128 lanes on TPU — u32 (8, 128)
    tiles, int8 (32, 128) tiles — so a lane slice narrower than 128 lanes
    pads BACK to a full tile: its HBM bytes (and, conservatively, its wire
    bytes) stop shrinking.  With the default widths (num_perm=128 u32,
    m=256 int8) that sets the honest lane-shard ceiling: the minhash row is
    already exactly one tile (no L shrinks it), the HLL row halves once at
    L=2 (256 -> 128 int8 lanes), and beyond L=2 nothing improves —
    768B -> 640B per row pair, a 1.2x cut, NOT 1/L.  Wider configs scale
    further: max useful L = max(num_perm/128, m/128) with gains
    proportional to the un-padded fraction (see docs/PARALLELISM.md)."""
    mh_lanes = max(params.num_perm // lane_shards, 128)
    hll_lanes = max((1 << params.hll_p) // lane_shards, 128)
    return mh_lanes * 4 + hll_lanes


def bench_artifact_rate(default: float = 108.27e6) -> float:
    """Per-chip hop rate from the NEWEST committed BENCH_r*.json artifact —
    the model's calibration constant self-loads so it cannot drift from the
    shipped artifact (round-4 advisor finding: a hand-synced 102e6 survived
    an artifact refresh to 108.3e6).  Falls back to the round-4 figure when
    no artifact is present (fresh clone before any driver run)."""
    import glob
    import json
    import os
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    paths = sorted(glob.glob(os.path.join(root, "BENCH_r*.json")))
    for p in reversed(paths):
        try:
            with open(p) as f:
                d = json.load(f)
            parsed = d.get("parsed") or json.loads(d["tail"].strip())
            if parsed.get("unit") == "edges/s" and parsed.get("value"):
                return float(parsed["value"])
        except Exception:
            continue
    return default


def ici_scaling_model(num_nodes: int = 200_000, avg_deg: int = 16,
                      device_counts: List[int] = None,
                      # None -> the newest committed BENCH artifact's
                      # headline (bench_artifact_rate): the fused
                      # minhash+HLL hop on one v5e chip
                      per_chip_edges_per_s: float = None,
                      ici_bytes_per_s: float = 4.5e10,
                      params: SketchParams = None,
                      weak: bool = False, graph: str = "random",
                      seed: int = 0,
                      method: str = "locality",
                      shuffle_ids: bool = False,
                      lane_shards: int = 1) -> Dict:
    """Predicted multi-chip scaling of the node-sharded sketch build.

    The virtual CPU mesh cannot *measure* scaling — its "devices" all share
    the host's cores, so wall-clock efficiency there is an artefact of the
    thread pool, not of the algorithm.  This model instead combines the two
    quantities that ARE real in a single-chip environment:

    - exact per-device communication/compute volumes from a REAL
      ``make_node_partition`` of the target graph (padded halo rows ride
      the wire — the model charges the padded volume, not the ideal one);
    - the measured single-chip hop rate (bench.py, edges/s for the fused
      minhash+HLL reduce pair).

    The sharded hop (node_sharded.py ``_sharded_hop``) overlaps the halo
    ``all_to_all`` with the local-edge reduce and then reduces halo-source
    edges against the received buffer, so per hop per device:

        t_hop = max(t_local_reduce, t_halo_exchange) + t_halo_reduce
        t_local_reduce  = E_local_padded  / R_chip
        t_halo_reduce   = E_halo_padded   / R_chip
        t_halo_exchange = (D-1) * H * row_bytes / BW_ici

    ``weak=True`` grows the graph with the mesh (``num_nodes`` *per
    device*), the pod-growth regime of BASELINE criterion 4; default is
    strong scaling of a fixed graph.  ``ici_bytes_per_s`` defaults to
    45 GB/s — one v5e ICI link direction (jax-ml.github.io/scaling-book);
    override for other topologies.

    ``graph``: 'random' (zero locality — the worst case), 'ring' (pure
    locality), or 'ws' (Watts–Strogatz ring + 5% rewiring — the synth-ws
    family of the quality testbeds).  ``method`` selects the partitioner
    ('locality' = RCM ordering, the production default; 'contiguous' =
    round-2 id-order blocks).  ``shuffle_ids`` randomly relabels the nodes
    first so id order carries no accidental locality — the honest setting
    for judging the partitioner rather than the generator's id layout.

    ``lane_shards`` (L): model the 2D graph x lane layout
    (node_sharded_build_hash_tables ``lane_axis``) — each device count D
    splits into G = D/L node shards x L lane shards.  Lanes are
    elementwise in the hop, so a lane shard reduces (and wires) only its
    slice while the node partition only has to be G-way (smaller boundary
    than D-way).  This is the lever for comm-bound graphs where no
    partition shrinks the boundary (studies/README.md: layout tricks
    provably cannot).  The per-lane-shard cost follows ``lane_row_bytes``
    — TILE-PADDED, so with the default sketch widths the usable ceiling is
    L=2 at a 1.2x row-byte cut (the round-3 model assumed full 1/L and
    overstated the lever; see lane_row_bytes and docs/PARALLELISM.md).
    Device counts not divisible by L keep L=1 for that row.
    """
    from subgraph_sketching_tpu.parallel.node_sharded import (
        make_node_partition,
    )
    if per_chip_edges_per_s is None:
        per_chip_edges_per_s = bench_artifact_rate()
    if device_counts is None:
        device_counts = [1, 2, 4, 8, 16, 32]
    params = params or SketchParams(max_hops=2)
    row_bytes = params.num_perm * 4 + (1 << params.hll_p)
    rng = np.random.default_rng(seed)

    def graph_for(d):
        n = num_nodes * d if weak else num_nodes
        e = n * avg_deg
        if graph in ("ring", "ws"):
            # ring: edges go to the avg_deg/2 nearest ids each way (pure
            # locality); ws: the same ring with 5% of edges rewired to
            # uniform targets — the synth-ws regime of the quality testbeds
            src = np.repeat(np.arange(n, dtype=np.int64), avg_deg // 2)
            off = np.tile(np.arange(1, avg_deg // 2 + 1, dtype=np.int64), n)
            dst = (src + off) % n
            if graph == "ws":
                rw = rng.random(len(dst)) < 0.05
                dst[rw] = rng.integers(0, n, int(rw.sum()))
            ei = np.stack([np.concatenate([src, dst]),
                           np.concatenate([dst, src])])
        else:
            ei = np.stack([rng.integers(0, n, e, dtype=np.int64),
                           rng.integers(0, n, e, dtype=np.int64)])
        if shuffle_ids:
            relabel = rng.permutation(n).astype(np.int64)
            ei = relabel[ei]
        return ei, n, ei.shape[1]

    out = {}
    t1 = None
    for d in device_counts:
        ei, n, e = graph_for(d)
        L = lane_shards if d % lane_shards == 0 else 1
        G = d // L
        # lane speedup is set by TILE-PADDED row bytes (bandwidth-bound
        # hop), not 1/L: with default widths L=2 buys 768->640B = 1.2x and
        # larger L nothing (lane_row_bytes docstring).  Numerator is the
        # PADDED L=1 bytes, not the logical row_bytes: the measured
        # per-chip rate already includes the L=1 layout's tile padding, so
        # for narrow sketch configs (e.g. num_perm=64 pads 256B->512B)
        # dividing by the padded L bytes from the un-padded numerator
        # would model the measured baseline itself at <1x speed.
        lane_bytes = lane_row_bytes(params, L)
        lane_speed = lane_row_bytes(params, 1) / lane_bytes
        if G == 1:
            # all edges local; reduce runs on the lane slice (L == d)
            t_hop = e / (per_chip_edges_per_s * lane_speed)
            row = {"t_hop_ms": t_hop * 1e3, "halo_rows_per_dev": 0,
                   "lane_shards": L, "comm_bound": False}
        else:
            plan = make_node_partition(ei, n, G, method=method)
            rate = per_chip_edges_per_s * lane_speed
            t_local = plan.local_src.shape[1] / rate
            t_halo_red = plan.halo_src.shape[1] / rate
            halo_bytes = (G - 1) * plan.halo_width * lane_bytes
            t_comm = halo_bytes / ici_bytes_per_s
            t_hop = max(t_local, t_comm) + t_halo_red
            row = {"t_hop_ms": t_hop * 1e3,
                   "halo_rows_per_dev": int((G - 1) * plan.halo_width),
                   "lane_shards": L,
                   "comm_bound": t_comm > t_local}
        if d == min(device_counts):
            t1 = t_hop * (1 if weak else d)  # normalise to per-unit work
        ideal = t1 / (1 if weak else d)
        row["efficiency"] = round(min(1.0, ideal / t_hop), 3)
        out[d] = row
    return {
        "mode": "weak" if weak else "strong",
        "assumptions": {
            "per_chip_edges_per_s": per_chip_edges_per_s,
            "ici_bytes_per_s": ici_bytes_per_s,
            "row_bytes": row_bytes,
            "nodes": (f"{num_nodes}/device" if weak else num_nodes),
            "avg_deg": avg_deg,
            "graph": graph,
            "partition_method": method,
            "shuffle_ids": shuffle_ids,
            "lane_shards": lane_shards,
            "lane_row_bytes": lane_row_bytes(params, lane_shards),
            "note": ("analytic: real partition halo/edge volumes x measured "
                     "single-chip rate (newest committed BENCH artifact, "
                     "bench_artifact_rate); lane "
                     "costs are TILE-PADDED (lane_row_bytes); CPU-mesh "
                     "timings cannot measure scaling (virtual devices share "
                     "host cores)"),
        },
        "per_device_count": {str(d): r for d, r in out.items()},
    }


if __name__ == "__main__":
    res = measure_scaling()
    eff = scaling_efficiency(res)
    for d in sorted(res):
        print(f"{d} devices: {res[d] / 1e6:.2f}M edges/s "
              f"(efficiency {100 * eff[d]:.0f}%)")
