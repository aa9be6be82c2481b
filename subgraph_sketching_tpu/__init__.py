"""subgraph_sketching_tpu — a TPU-native (JAX/XLA/Pallas) framework for link
prediction with subgraph sketching (the ELPH and BUDDY model family).

Re-designed from scratch for TPU hardware with the capabilities of the
reference implementation of "Graph Neural Networks for Link Prediction with
Subgraph Sketching" (ICLR 2023): MinHash + HyperLogLog++ per-node per-hop
sketches propagated as messages, hop-pair intersection structure features,
SIGN-style feature precomputation and MLP link scoring — plus heuristics,
labelling tricks, SEAL and KGE baseline tiers.

Design principles (TPU-first, not a port):
  * static shapes everywhere — edges and link batches are padded/bucketed
  * sketches live on device in packed dtypes (uint32 minhash lanes, int8 HLL
    registers) and are updated with segment-min/max; Pallas kernels fuse the
    gather+reduce on the hot path
  * data-dependent branches (HLL estimator) are rewritten branchless
  * multi-chip scaling via jax.sharding Mesh + shard_map collectives
"""

__version__ = "0.1.0"

from subgraph_sketching_tpu.config import Config  # noqa: F401
