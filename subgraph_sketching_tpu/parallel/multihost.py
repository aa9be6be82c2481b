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
    """jax.distributed.initialize, with env/cluster autodetection when
    called with no arguments (TPU pod / SLURM launchers set the env vars
    jax's cluster plugins read).

    Call before any other jax API on every host.  Returns
    (process_index, process_count).
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    else:
        try:
            jax.distributed.initialize()
        except Exception as e:  # no recognisable multi-process context
            # stay single-process LOUDLY, so a misconfigured pod launcher
            # is visible instead of N hosts silently running independently
            print(f"multihost.initialize: no distributed context detected "
                  f"({type(e).__name__}); continuing single-process",
                  flush=True)
    return jax.process_index(), jax.process_count()


def process_shard(n: int, process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> slice:
    """This host's contiguous shard of n items (links, edges, ...).

    Shards are ceil(n / process_count) long except the tail, which may be
    short or empty when n is not a multiple — fine for independent host
    work; for global-array staging use ``host_local_batch``, which enforces
    the uniform-shard contract."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = (n + pc - 1) // pc
    return slice(pi * per, min(n, (pi + 1) * per))


def host_local_batch(global_array: np.ndarray,
                     pad_value=None) -> np.ndarray:
    """Host-side slice of a globally-ordered array for
    jax.make_array_from_process_local_data-style staging.

    Global-array assembly needs every process's slice to have the SAME
    shape.  When len(global_array) is not a multiple of process_count,
    pass ``pad_value`` to pad the short tail shards up to the uniform
    length (callers mask the pads), or get a loud error instead of a
    shard-shape mismatch deep inside jax."""
    n = len(global_array)
    pc = jax.process_count()
    per = (n + pc - 1) // pc
    out = global_array[process_shard(n)]
    if len(out) == per:
        return out
    if pad_value is None:
        raise ValueError(
            f"{n} items do not shard uniformly over {pc} processes "
            f"(shards of {per}); pad the array to a multiple or pass "
            f"pad_value to pad the tail shards")
    pad = np.full((per - len(out),) + out.shape[1:], pad_value,
                  dtype=out.dtype)
    return np.concatenate([out, pad])
