"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip sharding is exercised without a pod via
XLA_FLAGS=--xla_force_host_platform_device_count=8 (must be set before jax
import, hence here).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# the axon TPU plugin's sitecustomize imports jax at interpreter start, which
# latches JAX_PLATFORMS before this file runs — override via jax.config too
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ba_graph():
    """30-node BA graph, the reference test-suite's standard fixture
    (test/test_hashing.py:22-31)."""
    from subgraph_sketching_tpu.graph.synthetic import barabasi_albert_graph
    return barabasi_albert_graph(30, 5, seed=0)


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)


def free_local_port() -> int:
    """An OS-assigned free TCP port for per-test jax.distributed
    coordinators.  Fixed ports collide when two suites (or a suite and a
    manual run) execute concurrently — the coordinator then fails with an
    opaque fatal error mid-test."""
    import socket

    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
