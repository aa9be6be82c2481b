"""Flag-interaction smoke matrix through the real runner.

The reference's integration tests are "no exceptions is a pass" runs of
``run(args)`` (reference test_elph.py:207-212, test_buddy.py:123-128); this
matrix covers flag combinations the dedicated end-to-end tests don't reach:
RA, degree-normalised features, AUC loss and metric, 1- and 3-hop sketches,
feature_prop variants, the scatter fallback (--use_plan 0), and the
--use_struct_feature knockout on the ELPH path.
"""

import numpy as np
import pytest

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.runners.run import run


def _cfg(**kw):
    base = dict(dataset_name="synth-ba", hidden_channels=16, batch_size=256,
                eval_batch_size=1024, epochs=1, model="BUDDY", K=20)
    base.update(kw)
    return Config(**base)


MATRIX = [
    # multi-axis meshes through the production runner (the virtual 8-device
    # CPU mesh from conftest): DP, DP x graph-sharded, 3-axis ELPH
    dict(model="BUDDY", mesh_shape=[8]),
    dict(model="BUDDY", mesh_shape=[2, 4], mesh_axes=["data", "graph"]),
    dict(model="ELPH", mesh_shape=[2, 2, 2],
         mesh_axes=["data", "graph", "lane"]),
    dict(model="BUDDY", use_RA=True),
    dict(model="BUDDY", add_normed_features=True, loss="auc"),
    dict(model="BUDDY", sign_k=2, use_zero_one=True, floor_sf=True),
    dict(model="BUDDY", eval_metric="auc", use_plan=False),
    dict(model="ELPH", feature_prop="residual", max_hash_hops=1),
    dict(model="ELPH", feature_prop="cat", max_hash_hops=3),
    dict(model="ELPH", loss="auc", num_negs=2),
]


@pytest.mark.parametrize(
    "kw", MATRIX,
    ids=lambda kw: "-".join(f"{k}={v}" for k, v in kw.items()))
def test_flag_matrix_end_to_end(kw):
    test_res, val_res, train_res = run(_cfg(**kw))[0]
    assert np.isfinite([test_res, val_res, train_res]).all()
    assert 0.0 <= val_res <= 1.0


@pytest.mark.parametrize("model", ["BUDDY", "ELPH"])
def test_use_struct_feature_knockout(model):
    """--use_struct_feature 0 zeroes the structure features (reference
    train.py:58,203-206; inference.py:119,189-192) — the model scores from
    the GNN/SIGN side alone and the run completes."""
    test_res, val_res, train_res = run(
        _cfg(model=model, use_struct_feature=False))[0]
    assert np.isfinite([test_res, val_res, train_res]).all()


def test_elph_struct_knockout_stages_zeros():
    """Under --use_struct_feature 0 the ELPH trainer must stage zero
    structure features (and skip the sketch build entirely)."""
    from subgraph_sketching_tpu.graph.datasets import get_data
    from subgraph_sketching_tpu.graph.preprocess import (
        build_link_dataset, sketch_params_from_config,
    )
    from subgraph_sketching_tpu.train.loops import ElphTrainer

    cfg = _cfg(model="ELPH", use_struct_feature=False)
    splits, directed, _ = get_data(cfg)
    ds = build_link_dataset(splits["train"], cfg, "train", directed=directed)
    trainer = ElphTrainer(cfg, ds, sketch_params_from_config(cfg),
                          ds.x.shape[-1])
    sf = np.asarray(trainer._data["train"]["sf"])
    assert sf.shape == (ds.links.shape[0],
                        sketch_params_from_config(cfg).sf_dim)
    assert not sf.any()


@pytest.mark.parametrize("pooling", ["add", "mean"])
def test_sealmlp_via_runner(pooling):
    """SEALMLP (structure-free baseline) dispatches from the runner with
    --label_pooling (the reference defines it, seal.py:22-40, but never
    wires it into run.py)."""
    test_res, val_res, train_res = run(_cfg(
        model="SEALMLP", batch_size=64, label_pooling=pooling))[0]
    assert np.isfinite([test_res, val_res, train_res]).all()
