"""Larger-than-one-chip demo: build sketch state memory-sharded for a graph
whose tables do NOT fit a single v5e.

At 12M nodes the hop-0..2 sketch stacks are 3 x 12M x (128*4 + 256) B ~
13.8GB plus halo/working buffers — beyond one 16GB chip's practical
capacity (citation2's 2.93M nodes already uses 4.5GB with hops-only
stacks).  The node-sharded builder holds 1/D of the rows per device, so an
8-way mesh needs ~1.7GB/device.  Executed here on the virtual 8-device CPU
mesh: the memory ACCOUNTING (per-shard bytes) and the full halo-exchange
execution are real; only the interconnect is host memory.

Usage: python tools/memory_sharded_scale.py [--nodes 12000000] [--devices 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# the virtual device count must be fixed BEFORE jax initialises: pre-scan
# argv for --devices so values other than 8 actually work
_D = 8
if "--devices" in sys.argv:
    _D = int(sys.argv[sys.argv.index("--devices") + 1])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={_D}"
    # XLA-CPU kills the process when collective participants arrive >40s
    # apart ("Termination timeout ... Exiting to ensure a consistent
    # program state") — inevitable when D virtual devices share a few
    # cores and each runs minutes of chunked reduction before the
    # all_to_all.  Purely a host-simulation artifact; raise the limits.
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=12_000_000)
    ap.add_argument("--devices", type=int, default=_D)
    ap.add_argument("--deg", type=int, default=10)
    # chunk-stream the per-device edge gathers: the [E_loc, width]
    # intermediates would otherwise dominate memory at this scale (and on
    # the virtual mesh all D devices' intermediates share ONE host)
    ap.add_argument("--max-gather-rows", type=int, default=2 << 20)
    args = ap.parse_args()

    from subgraph_sketching_tpu.graph.synthetic import (
        watts_strogatz_graph_fast,
    )
    from subgraph_sketching_tpu.parallel.mesh import make_mesh
    from subgraph_sketching_tpu.parallel.node_sharded import (
        make_node_partition, node_sharded_build_hash_tables,
        node_sharded_subgraph_features,
    )
    from subgraph_sketching_tpu.sketch.elph import initialise_sketches
    from subgraph_sketching_tpu.sketch.params import SketchParams

    n, D = args.nodes, args.devices
    t0 = time.time()
    ei = watts_strogatz_graph_fast(n, args.deg, 0.1, seed=0)
    print(f"graph: {n/1e6:.1f}M nodes, {ei.shape[1]/1e6:.1f}M directed edges "
          f"({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    plan = make_node_partition(ei, n, D)
    print(f"locality partition: {time.time()-t0:.0f}s, "
          f"halo rows/dev {plan.halo_rows_per_dev}", flush=True)

    params = SketchParams(max_hops=2)
    mesh = make_mesh([D], ("graph",))
    t0 = time.time()
    mh0, hll0 = plan.pad_init(*initialise_sketches(n, params))
    print(f"hop-0 init: {time.time()-t0:.0f}s", flush=True)

    t0 = time.time()
    sk = node_sharded_build_hash_tables(
        plan, params, mesh, mh0, hll0,
        max_gather_rows=args.max_gather_rows)
    jax.block_until_ready(sk.cards)
    total = sk.minhash.nbytes + sk.hll.nbytes + sk.cards.nbytes
    shard = sum(a.addressable_shards[0].data.nbytes
                for a in (sk.minhash, sk.hll, sk.cards))
    print(f"sketch build: {time.time()-t0:.0f}s — total state "
          f"{total/1e9:.1f}GB, per-device shard {shard/1e9:.2f}GB "
          f"(1/{total//max(shard,1)} of total)", flush=True)
    assert shard * D <= total + D  # 1/D per device, certified

    rng = np.random.default_rng(0)
    links = np.stack([rng.integers(0, n, 4096, dtype=np.int32),
                      rng.integers(0, n, 4096, dtype=np.int32)], 1)
    t0 = time.time()
    sf = node_sharded_subgraph_features(links, sk, params, mesh,
                                        perm=plan.perm)
    sf = np.asarray(sf)
    print(f"features for 4096 probe links: {time.time()-t0:.1f}s, "
          f"finite={np.isfinite(sf).all()}", flush=True)
    print("OK: larger-than-one-chip sketch state built and queried "
          "memory-sharded")


if __name__ == "__main__":
    main()
