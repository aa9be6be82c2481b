from subgraph_sketching_tpu.parallel.mesh import make_mesh  # noqa: F401
from subgraph_sketching_tpu.parallel.dist_sketch import (  # noqa: F401
    edge_sharded_build_hash_tables,
    lane_sharded_subgraph_features,
)
