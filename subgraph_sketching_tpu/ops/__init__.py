from subgraph_sketching_tpu.ops.segment import (  # noqa: F401
    segment_max,
    segment_min,
    segment_sum,
)
from subgraph_sketching_tpu.ops.graph_ops import (  # noqa: F401
    gcn_norm,
    spmm,
    degrees_from_edges,
)
