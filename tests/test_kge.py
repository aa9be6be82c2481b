"""KGE tier wired into the runner (train/kge_loop.py) — exceeds the
reference, whose transx.py is never dispatched from run.py."""

import numpy as np
import jax
import pytest

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.train.kge_loop import KGE_MODELS, build_kge_trainer


def _trainer(model, **kw):
    cfg = Config(dataset_name="synth-ws", model=model, hidden_channels=64,
                 batch_size=512, eval_batch_size=4096, lr=0.01, **kw)
    splits, _, _ = get_data(cfg)
    return build_kge_trainer(cfg, splits)


@pytest.mark.parametrize("model", KGE_MODELS)
def test_kge_smoke_all_models(model):
    tr = _trainer(model)
    state = tr.init_state(jax.random.PRNGKey(0))
    state, loss = tr.train_epoch(state, np.random.default_rng(0),
                                 jax.random.PRNGKey(1))
    assert np.isfinite(loss)
    pred, labels = tr.predict(state, "valid")
    assert pred.shape == labels.shape and np.isfinite(pred).all()


def test_distmult_learns():
    """distmult on the small-world graph: val AUC must clear 0.7 within a
    few epochs (transE is structurally weak on symmetric graphs — not
    asserted)."""
    from subgraph_sketching_tpu.train.evaluation import roc_auc

    tr = _trainer("distmult")
    state = tr.init_state(jax.random.PRNGKey(0))
    for ep in range(12):
        state, loss = tr.train_epoch(state, np.random.default_rng(ep),
                                     jax.random.PRNGKey(ep))
    pred, labels = tr.predict(state, "valid")
    auc = roc_auc(pred, labels)
    assert auc > 0.7, f"distmult failed to learn: val AUC {auc:.3f}"


def test_evaluate_auc_returns_triple_with_train():
    from subgraph_sketching_tpu.train.evaluation import evaluate_auc

    rng = np.random.default_rng(0)
    p = rng.random(100)
    y = (rng.random(100) < 0.5).astype(np.float32)
    two = evaluate_auc(p, y, p, y)["AUC"]
    three = evaluate_auc(p, y, p, y, p, y)["AUC"]
    assert len(two) == 2 and len(three) == 3
    assert three[0] == three[1] == three[2]


def test_kge_mrl_criterion_trains():
    """criterion='mrl' wires the margin-ranking loss (reference
    set_criterion, transx.py:77-82) — loss decreases and differs from nll."""
    import jax
    import numpy as np
    import optax
    from subgraph_sketching_tpu.models.transx import KGEModel

    rng = np.random.default_rng(0)
    pos = np.stack([rng.integers(0, 20, 32), np.zeros(32, np.int64),
                    rng.integers(0, 20, 32)], axis=1)
    negs = rng.integers(0, 20, (32, 4))
    losses = {}
    for crit in ("nll", "mrl"):
        m = KGEModel("transE", 20, 1, 8, gamma=2.0, criterion=crit)
        params = m.init_params(jax.random.PRNGKey(0))
        opt = optax.adam(1e-2)
        step = m.make_train_step(opt)
        st = opt.init(params)
        first = last = None
        for i in range(5):
            params, st, loss = step(params, st, pos, negs, False)
            first = first if first is not None else float(loss)
            last = float(loss)
        assert last < first
        losses[crit] = (first, last)
    assert losses["nll"][0] != losses["mrl"][0]
