"""Real multi-process execution of the multihost runtime (CPU backend).

Launches two actual processes that jax.distributed.initialize against a
local coordinator, build a GLOBAL mesh spanning both processes (2 hosts x 2
local CPU devices), run the edge-sharded sketch build with cross-process
collectives, and verify the result matches the single-process build —
upgrading parallel/multihost.py from scaffolding to executed code.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import free_local_port

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from subgraph_sketching_tpu.parallel.multihost import initialize, process_shard
from subgraph_sketching_tpu.parallel.mesh import make_mesh
from subgraph_sketching_tpu.parallel.dist_sketch import (
    edge_sharded_build_hash_tables)
from subgraph_sketching_tpu.sketch import SketchParams, build_hash_tables
from subgraph_sketching_tpu.sketch.elph import initialise_sketches
from subgraph_sketching_tpu.graph import Graph
from subgraph_sketching_tpu.graph.synthetic import barabasi_albert_graph

pid = int(sys.argv[1])
pi, pc = initialize("127.0.0.1:{port}", num_processes=2, process_id=pid)
assert pc == 2, pc
assert len(jax.devices()) == 4, jax.devices()   # global view: 2 hosts x 2

n = 64
g = Graph(barabasi_albert_graph(n, 4, seed=1), n)
params = SketchParams(max_hops=2)
mesh = make_mesh([4], ("graph",))
ei, _, mask = g.padded_edges(multiple=4)
mh0, hll0 = initialise_sketches(n, params)

# stage the globally-sharded edge list from per-process local shards
from jax.sharding import NamedSharding, PartitionSpec as P
sharding = NamedSharding(mesh, P(None, "graph"))
msharding = NamedSharding(mesh, P("graph"))
E = ei.shape[1]
sl = process_shard(E)
eig = jax.make_array_from_process_local_data(sharding, ei[:, sl])
maskg = jax.make_array_from_process_local_data(msharding, mask[sl])

sk = edge_sharded_build_hash_tables(
    eig, n, params, mesh, jnp.asarray(mh0), jnp.asarray(hll0), mask=maskg)
got_mh = np.asarray(jax.device_get(
    jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))(sk.minhash)
    .addressable_shards[0].data))
ref = build_hash_tables(jnp.asarray(g.edge_index), n, params)
np.testing.assert_array_equal(got_mh, np.asarray(ref.minhash))
print(f"proc {{pid}} OK", flush=True)
"""


_NODE_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp
from subgraph_sketching_tpu.parallel.multihost import initialize
from subgraph_sketching_tpu.parallel.mesh import make_mesh
from subgraph_sketching_tpu.parallel.node_sharded import (
    make_node_partition, node_sharded_build_hash_tables,
    node_sharded_subgraph_features)
from subgraph_sketching_tpu.sketch import SketchParams, build_hash_tables
from subgraph_sketching_tpu.sketch.elph import (initialise_sketches,
                                                subgraph_features)
from subgraph_sketching_tpu.graph import Graph
from subgraph_sketching_tpu.graph.synthetic import watts_strogatz_graph

pid = int(sys.argv[1])
pi, pc = initialize("127.0.0.1:{port}", num_processes=2, process_id=pid)
assert pc == 2 and len(jax.devices()) == 4

# MEMORY-sharded build across two real processes: locality partition +
# halo-exchange all_to_all riding the cross-process fabric; every host
# computes the identical plan (deterministic numpy), device placement is
# global.  Features psum-assemble rows from shards owned by BOTH hosts.
n = 96
g = Graph(watts_strogatz_graph(n, 6, 0.1, seed=5), n)
params = SketchParams(max_hops=2)
mesh = make_mesh([4], ("graph",))
plan = make_node_partition(np.asarray(g.edge_index), n, 4)
mh0, hll0 = plan.pad_init(*initialise_sketches(n, params))
sk = node_sharded_build_hash_tables(plan, params, mesh, mh0, hll0)

ref = build_hash_tables(jnp.asarray(g.edge_index), n, params)
from jax.sharding import NamedSharding, PartitionSpec as P
gather = jax.jit(lambda x: x, out_shardings=NamedSharding(mesh, P()))
got_mh = np.asarray(gather(sk.minhash).addressable_shards[0].data)
np.testing.assert_array_equal(plan.to_node_order(got_mh),
                              np.asarray(ref.minhash))
links = np.stack([np.arange(32), (np.arange(32) * 5 + 7) % n], 1)
sf = node_sharded_subgraph_features(links.astype(np.int32), sk, params,
                                    mesh, perm=plan.perm)
sf_ref = subgraph_features(jnp.asarray(links.astype(np.int32)), ref, params)
sf_local = np.asarray(gather(sf).addressable_shards[0].data)
np.testing.assert_allclose(sf_local, np.asarray(sf_ref), rtol=1e-6,
                           atol=1e-4)
print(f"proc {{pid}} OK", flush=True)
"""


def _run_two_procs(tmp_path, template, port):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = template.format(repo=repo, port=port)
    path = tmp_path / "worker.py"
    path.write_text(script)
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    procs = [subprocess.Popen([sys.executable, str(path), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"proc {i} OK" in out


@pytest.mark.skipif(os.environ.get("SKIP_MULTIPROCESS") == "1",
                    reason="multi-process test disabled")
def test_two_process_edge_sharded_build(tmp_path):
    _run_two_procs(tmp_path, _WORKER, free_local_port())


@pytest.mark.skipif(os.environ.get("SKIP_MULTIPROCESS") == "1",
                    reason="multi-process test disabled")
def test_two_process_node_sharded_build(tmp_path):
    """The memory-sharded path (locality partition, halo all_to_all,
    psum-assembled features) executed across TWO real processes — the
    halo exchange and row assembly ride the cross-process fabric."""
    _run_two_procs(tmp_path, _NODE_WORKER, free_local_port())
