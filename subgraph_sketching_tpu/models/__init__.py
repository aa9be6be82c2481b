from subgraph_sketching_tpu.models.gnn import (  # noqa: F401
    GCN, GCNConv, SAGE, SIGN, SIGNEmbedding, MLPLinkPredictor,
)
from subgraph_sketching_tpu.models.predictor import LinkPredictor  # noqa: F401
from subgraph_sketching_tpu.models.buddy import BUDDY  # noqa: F401
from subgraph_sketching_tpu.models.elph import ELPH  # noqa: F401
