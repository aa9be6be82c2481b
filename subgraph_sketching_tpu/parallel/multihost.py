"""Multi-host (pod-slice) scaffolding.

The reference is single-process (SURVEY.md §2d); this module is the new-scope
entry point for running across hosts.  On a pod slice each host sees only its
local devices; ``initialize()`` wires up the global view, and the helpers
split host-side preprocessing so each process touches only its shard of the
link list.

Design notes (the "how to scale your model" recipe applied here):
  * the global mesh spans all hosts; the ``data`` axis is laid out so each
    host's link-batch shard lives on its local chips — DCN traffic is then
    limited to the gradient psum, which XLA routes hierarchically (ICI
    within a slice first)
  * sketch state for BUDDY is built once (deterministic) and either
    replicated per host (small graphs) or built edge-sharded with
    ``dist_sketch.edge_sharded_build_hash_tables`` on the ``graph`` axis —
    min/max merges are idempotent so the collective order does not matter
  * BatchNorm needs no special handling under GSPMD: batch-stat reductions
    are over the logical (global) batch, so XLA inserts the cross-replica
    collectives automatically — DP training is exactly equivalent to
    single-device training on the concatenated batch
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """jax.distributed.initialize with env-based autodetection.

    Call before any other jax API on every host.  Returns
    (process_index, process_count).  No-op on a single host.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return jax.process_index(), jax.process_count()


def process_shard(n: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> slice:
    """This host's contiguous shard of n items (links, edges, ...)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (n + pc - 1) // pc
    return slice(pi * per, min(n, (pi + 1) * per))


def host_local_batch(global_array: np.ndarray) -> np.ndarray:
    """Host-side slice of a globally-ordered array for
    jax.make_array_from_process_local_data-style staging."""
    return global_array[process_shard(len(global_array))]
