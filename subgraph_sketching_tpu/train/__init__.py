from subgraph_sketching_tpu.train.losses import bce_loss, auc_loss, get_loss  # noqa: F401
from subgraph_sketching_tpu.train.evaluation import (  # noqa: F401
    evaluate_hits, evaluate_mrr, evaluate_auc,
)
