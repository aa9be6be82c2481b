from subgraph_sketching_tpu.parallel.mesh import make_mesh  # noqa: F401
from subgraph_sketching_tpu.parallel.dist_sketch import (  # noqa: F401
    edge_sharded_build_hash_tables,
    lane_sharded_subgraph_features,
    lane_sharded_subgraph_features_batched,
)
from subgraph_sketching_tpu.parallel.fault import (  # noqa: F401
    HeartbeatDetector,
    PeerFailure,
)
from subgraph_sketching_tpu.parallel.node_sharded import (  # noqa: F401
    NodePartitionPlan,
    make_node_partition,
    node_sharded_build_hash_tables,
    node_sharded_subgraph_features,
)
