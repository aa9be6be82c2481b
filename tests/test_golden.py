"""Golden-output regression: bit-exact sketch state, allclose features.

Guards the full sketch pipeline against accidental semantic drift across
refactors (per-layer activation parity, SURVEY.md success criterion 1).
Regenerate with the snippet in tests/goldens/ only when semantics are
*intentionally* changed.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from subgraph_sketching_tpu.sketch import (
    SketchParams, build_hash_tables, subgraph_features,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens",
                      "sketch_golden.npz")


@pytest.mark.parametrize("hops", [1, 2, 3])
def test_sketch_pipeline_matches_golden(hops):
    z = np.load(GOLDEN)
    g, links = z["graph"], z["links"]
    p = SketchParams(max_hops=hops, use_zero_one=True)
    sk = build_hash_tables(jnp.asarray(g), 50, p)
    np.testing.assert_array_equal(np.asarray(sk.minhash),
                                  z[f"minhash_{hops}"])
    np.testing.assert_array_equal(np.asarray(sk.hll), z[f"hll_{hops}"])
    np.testing.assert_allclose(np.asarray(sk.cards), z[f"cards_{hops}"],
                               rtol=1e-5)
    sf = subgraph_features(jnp.asarray(links), sk, p)
    np.testing.assert_allclose(np.asarray(sf), z[f"sf_{hops}"], rtol=1e-4,
                               atol=1e-3)


def test_golden_matches_plan_path():
    """The fast padded-tree path must reproduce the golden sketches
    bit-exactly too."""
    from subgraph_sketching_tpu.ops.segment_scan import make_plan
    z = np.load(GOLDEN)
    g = z["graph"]
    p = SketchParams(max_hops=2, use_zero_one=True)
    plan = make_plan(g, 50)
    sk = build_hash_tables(jnp.asarray(g), 50, p, plan=plan)
    np.testing.assert_array_equal(np.asarray(sk.minhash), z["minhash_2"])
    np.testing.assert_array_equal(np.asarray(sk.hll), z["hll_2"])
