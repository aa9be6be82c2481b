"""Record the per-round scaling artifact (SCALING_r{N}.json).

Runs the edge-sharded (replicated-state) and node-sharded (memory-sharded,
halo-exchange) sketch-build scaling sweeps on the virtual CPU mesh.  CPU-mesh
numbers validate the collective structure and the harness — not ICI
bandwidth; on a real pod slice the same functions report true scaling
(BASELINE.md criterion 4: >= 80% efficiency).

Usage: python tools/run_scaling.py [round_number]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from subgraph_sketching_tpu.parallel.scaling import (
        ici_scaling_model, measure_node_sharded_scaling, measure_scaling,
        scaling_efficiency,
    )
    from subgraph_sketching_tpu.sketch.params import SketchParams
    wide = SketchParams(max_hops=2, num_perm=256, hll_p=9)
    edge = measure_scaling()
    node = measure_node_sharded_scaling()
    out = {
        "backend": "cpu-virtual-8",
        "note": ("structure-validation numbers (virtual CPU mesh; "
                 "collectives are memcpy, not ICI)"),
        "edge_sharded": {
            "edges_per_s": {str(d): round(v) for d, v in edge.items()},
            "efficiency": {str(d): round(v, 3)
                           for d, v in scaling_efficiency(edge).items()},
        },
        "node_sharded": {
            "edges_per_s": {str(d): round(v) for d, v in node.items()},
            "efficiency": {str(d): round(v, 3)
                           for d, v in scaling_efficiency(node).items()},
        },
        # Projected multi-chip efficiency from REAL partition geometry +
        # the measured single-chip rate (CPU-mesh wall clocks cannot
        # measure scaling; see ici_scaling_model docstring).  Random graph
        # = zero-locality worst case; ws = the synth-ws quality-testbed
        # family (ring + 5% rewires) with SHUFFLED node ids, so id order
        # carries no locality and the partitioner has to earn the halo cut.
        "ici_model": {
            "strong_random": ici_scaling_model(),
            "strong_ring": ici_scaling_model(graph="ring"),
            "strong_ws_shuffled": ici_scaling_model(graph="ws",
                                                    shuffle_ids=True),
            # round-2 partitioner on the same graphs (the before/after for
            # the locality partitioner; BASELINE criterion 4 bar = 0.80)
            "strong_ws_shuffled_contiguous": ici_scaling_model(
                graph="ws", shuffle_ids=True, method="contiguous"),
            "strong_random_contiguous": ici_scaling_model(
                method="contiguous"),
            "weak_random": ici_scaling_model(num_nodes=100_000, weak=True,
                                             device_counts=[1, 2, 4, 8]),
            "weak_ws_shuffled": ici_scaling_model(num_nodes=100_000,
                                                  weak=True, graph="ws",
                                                  shuffle_ids=True,
                                                  device_counts=[1, 2, 4, 8]),
            # 2D graph x lane sharding, round-4 HONEST (tile-padded) model:
            # the minor dim tiles to 128 lanes, so with DEFAULT widths
            # (P=128 u32 / m=256 i8) a lane slice buys only 768->640B
            # (1.2x) while doubling per-device edges — a NET LOSS, recorded
            # here as the negative result that retires round 3's lane rows
            # (those assumed full 1/L and overstated the lever;
            # parallel/scaling.lane_row_bytes).  Lane sharding genuinely
            # helps only for WIDER sketch configs where every slice stays
            # >= one full tile: num_perm=256/hll_p=9 at L=2 divides both
            # tables exactly.
            "strong_random_lane2_default_widths": ici_scaling_model(
                lane_shards=2),
            "strong_random_wide_l1": ici_scaling_model(params=wide),
            "strong_random_wide_lane2": ici_scaling_model(
                lane_shards=2, params=wide),
            # weak scaling (pods grow with data — the production regime for
            # the zero-locality worst case)
            "weak_random_wide_lane2": ici_scaling_model(
                num_nodes=100_000, weak=True, lane_shards=2, params=wide,
                device_counts=[1, 2, 4, 8, 16]),
        },
    }
    # production-scale equality artifact (tools/scale_equality.py): merge
    # when present so SCALING carries the >=100k-node loss/metric equality
    # and per-device-bytes evidence in one place
    se_path = os.path.join(os.path.dirname(__file__),
                           "scale_equality_500k.json")
    if os.path.exists(se_path):
        with open(se_path) as f:
            out["scale_equality_500k"] = json.load(f)
    path = os.path.join(os.path.dirname(__file__), "..",
                        f"SCALING_r{rnd:02d}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"wrote {os.path.abspath(path)}")


if __name__ == "__main__":
    main()
