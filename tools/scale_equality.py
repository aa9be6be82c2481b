"""Production-scale multichip equality artifact (round-4 item 4).

Drives the PRODUCTION runner (runners/run.py main) at synth-ws-<N>
(default 500k nodes / 5M directed edges — citation2-class scale without
real data) on the virtual 8-device CPU mesh:

  1. ELPH --memory_sharded --mesh_shape 1,8 vs the single-device run:
     per-epoch losses and returned metrics must match (the sharded sketch
     tables + psum-assembled features are the production citation2 path).
  2. per-device sketch-state bytes: the sharded build holds exactly 1/8 of
     each table per device (the memory-sharding claim at scale).
  3. BUDDY graph-sharded preprocessing (promoted from
     tools/memory_sharded_scale.py): locality partition + node-sharded
     build at N nodes, subgraph features for a 4096-link probe batch
     bit-compared against the single-device build.

Writes one JSON blob (stdout + optional file arg) that run_scaling.py can
merge into SCALING_r{N}.json.  CPU-mesh *timings* here are structure
validation only (virtual devices share host cores); equality is the point.

Usage: python tools/scale_equality.py [N] [out.json]
"""
import io
import json
import os
import re
import resource
import sys
import time
from contextlib import redirect_stdout

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    # 8 virtual devices share this host's cores: a straggler "device" can
    # fall minutes behind at 500k-node shapes and XLA-CPU's default 40s
    # collective-rendezvous kill would tear the process apart — a pure
    # host-simulation artifact (same flags as tools/memory_sharded_scale.py)
    + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
    + " --xla_cpu_collective_call_terminate_timeout_seconds=7200")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def run_elph(n, sharded, epochs=2, train_samples=131072, mesh="1,8"):
    from subgraph_sketching_tpu.runners.run import main
    args = ["--dataset_name", f"synth-ws-{n}", "--model", "ELPH",
            "--hidden_channels", "16", "--batch_size", "4096",
            "--eval_batch_size", "65536", "--K", "50",
            "--epochs", str(epochs), "--train_samples", str(train_samples),
            "--label_dropout", "0", "--feature_dropout", "0"]
    if sharded:
        args += ["--mesh_shape", mesh, "--mesh_axes", "data,graph",
                 "--memory_sharded", "1"]
    buf = io.StringIO()
    t0 = time.time()
    with redirect_stdout(buf):
        results = main(args)
    out = buf.getvalue()
    sys.stderr.write(out)
    losses = [float(m) for m in re.findall(r"Loss: ([0-9.]+)", out)]
    return {"losses": losses, "results": results[0],
            "wall_s": round(time.time() - t0, 1), "rss_gb": round(rss_gb(), 2)}


def elph_shard_bytes(n):
    """Per-device sketch-state bytes through the production trainer."""
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.graph.datasets import get_data
    from subgraph_sketching_tpu.graph.preprocess import (
        build_link_dataset, sketch_params_from_config,
    )
    from subgraph_sketching_tpu.train.loops import ElphTrainer
    cfg = Config(dataset_name=f"synth-ws-{n}", model="ELPH",
                 hidden_channels=16, batch_size=4096, eval_batch_size=65536,
                 K=50, mesh_shape=[1, 8], mesh_axes=["data", "graph"],
                 memory_sharded=True)
    splits, _, _ = get_data(cfg)
    ds = build_link_dataset(splits["train"], cfg, "train")
    tr = ElphTrainer(cfg, ds, sketch_params_from_config(cfg),
                     ds.x.shape[-1])
    out = {}
    for name in ("sk_minhash", "sk_hll"):
        arr = tr._data["train"][name]
        shard = arr.addressable_shards[0].data
        total = int(np.prod(arr.shape)) * arr.dtype.itemsize
        per_dev = int(np.prod(shard.shape)) * arr.dtype.itemsize
        assert per_dev * 8 == total, (shard.shape, arr.shape)
        out[name] = {"total_gb": round(total / 1e9, 3),
                     "per_device_gb": round(per_dev / 1e9, 4),
                     "fraction": round(per_dev / total, 4)}
    return out


def buddy_preprocessing(n):
    """Node-sharded BUDDY preprocessing equality at N nodes: features for a
    probe batch from the sharded build == single-device build."""
    from subgraph_sketching_tpu.graph.datasets import synthetic_graph
    from subgraph_sketching_tpu.parallel.mesh import make_mesh
    from subgraph_sketching_tpu.parallel.node_sharded import (
        make_node_partition, node_sharded_build_hash_tables,
        node_sharded_subgraph_features,
    )
    from subgraph_sketching_tpu.sketch import SketchParams, build_hash_tables
    from subgraph_sketching_tpu.sketch.elph import (
        initialise_sketches, subgraph_features,
    )
    from subgraph_sketching_tpu.ops.segment_scan import make_auto_plan
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    g = synthetic_graph(f"synth-ws-{n}")
    params = SketchParams(max_hops=2)
    mesh = make_mesh([8], ("graph",))
    t0 = time.time()
    part = make_node_partition(np.asarray(g.edge_index), n, 8)
    t_part = time.time() - t0
    mh0, hll0 = part.pad_init(*initialise_sketches(n, params))
    t0 = time.time()
    sk = node_sharded_build_hash_tables(part, params, mesh, mh0, hll0,
                                        max_gather_rows=1 << 22)
    jax.block_until_ready(sk.minhash)
    t_build = time.time() - t0
    shard = sk.minhash.addressable_shards[0].data
    frac = np.prod(shard.shape) / np.prod(sk.minhash.shape)
    rng = np.random.default_rng(0)
    links = np.stack([rng.integers(0, n, 4096),
                      rng.integers(0, n, 4096)], 1).astype(np.int32)
    sf = node_sharded_subgraph_features(links, sk, params, mesh,
                                        perm=part.perm)
    gather = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
    sf = np.asarray(gather(sf).addressable_shards[0].data)
    # single-device reference
    plan = make_auto_plan(np.asarray(g.edge_index), n, max_slots=1 << 22)
    ref = build_hash_tables(jnp.asarray(g.edge_index), n, params, plan=plan)
    sf_ref = np.asarray(subgraph_features(jnp.asarray(links), ref, params))
    tables_equal = np.array_equal(
        part.to_node_order(np.asarray(gather(sk.minhash)
                                      .addressable_shards[0].data)),
        np.asarray(ref.minhash))
    max_sf_delta = float(np.max(np.abs(sf - sf_ref)))
    return {"nodes": n, "edges": int(g.edge_index.shape[1]),
            "partition_s": round(t_part, 1), "build_s": round(t_build, 1),
            "per_device_fraction": round(float(frac), 4),
            "halo_rows_per_dev": int(part.halo_rows_per_dev),
            "minhash_tables_bit_equal": bool(tables_equal),
            "probe_links": 4096,
            "max_feature_delta": max_sf_delta}


PHASES = {
    "buddy": lambda n, mesh: buddy_preprocessing(n),
    "shard_bytes": lambda n, mesh: elph_shard_bytes(n),
    "elph_sharded": lambda n, mesh: run_elph(n, True, mesh=mesh),
    "elph_single": lambda n, mesh: run_elph(n, False),
}


def main():
    argv = sys.argv[1:]
    if argv and argv[0] == "--phase":
        # child mode: one phase in a FRESH process, result as one stdout
        # line.  Per-phase subprocesses make rss_gb honest — ru_maxrss is a
        # process-lifetime high-water mark, so running all phases in one
        # process would let every later phase inherit the earlier phases'
        # peaks (the round-4 artifact showed 'sharded 16.2 GB' that was
        # really the single-device reference build's peak).
        phase, n = argv[1], int(argv[2])
        mesh = argv[3] if len(argv) > 3 else "1,4"
        res = PHASES[phase](n, mesh)
        print("PHASE_JSON:" + json.dumps(res), flush=True)
        return

    import subprocess
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    # mesh for the ELPH TRAINING phase only.  All virtual devices share ONE
    # host threadpool sized by the core count; on a 4-core host an
    # 8-participant cross-module all-reduce at 500k-node shapes can starve
    # it into deadlock (pure host-simulation artifact — the standing 100k
    # test runs the [1,8] path green every round; builds/preprocessing at
    # [8] complete fine at 500k).  Default [1,4] keeps participants <= cores.
    elph_mesh = sys.argv[3] if len(sys.argv) > 3 else "1,4"
    report = {"backend": "cpu-virtual-8", "nodes": n,
              "elph_training_mesh": elph_mesh,
              "note": ("equality artifact: CPU-mesh timings are structure "
                       "validation only; loss/metric equality and 1/8 "
                       "per-device build state are the claims; the ELPH "
                       "training phase runs on a reduced mesh on small "
                       "hosts (see elph_training_mesh); each phase runs in "
                       "its own subprocess so rss_gb is that phase's own "
                       "peak, not an inherited high-water mark")}

    def write():
        blob = json.dumps(report, indent=1)
        print(blob, flush=True)
        if out_path:
            with open(out_path, "w") as f:
                f.write(blob)

    def run_phase(name):
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--phase", name,
             str(n), elph_mesh], capture_output=True, text=True)
        sys.stderr.write(p.stderr[-4000:])
        for line in p.stdout.splitlines():
            if line.startswith("PHASE_JSON:"):
                return json.loads(line[len("PHASE_JSON:"):])
        raise RuntimeError(
            f"phase {name} produced no result (rc={p.returncode}): "
            f"{p.stdout[-500:]} {p.stderr[-1500:]}")

    # incremental writes: the deadlock-prone ELPH training phases run LAST,
    # and a phase failure must not lose the equality results already won
    report["buddy_preprocessing"] = run_phase("buddy")
    write()
    report["elph_shard_bytes"] = run_phase("shard_bytes")
    write()
    sharded = run_phase("elph_sharded")
    report["elph_memory_sharded"] = {"sharded": sharded}
    write()
    single = run_phase("elph_single")
    losses_s, losses_1 = sharded["losses"], single["losses"]
    report["elph_memory_sharded"] = {
        "sharded": sharded, "single_device": single,
        "max_loss_delta": (max(abs(a - b) for a, b in
                               zip(losses_s, losses_1))
                           if losses_s and len(losses_s) == len(losses_1)
                           else None),
        "max_metric_delta": float(np.max(np.abs(
            np.asarray(sharded["results"]) - np.asarray(single["results"])))),
    }
    write()


if __name__ == "__main__":
    main()
