from subgraph_sketching_tpu.graph.container import Graph  # noqa: F401
from subgraph_sketching_tpu.graph.synthetic import barabasi_albert_graph  # noqa: F401
