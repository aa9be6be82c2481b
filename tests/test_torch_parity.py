"""Numerical parity vs torch semantics.

The reference is built on torch.nn (Linear, BatchNorm1d); these tests build
the same computation in torch with weights copied from our flax modules and
assert allclose in eval mode — the strongest backend-independent check that
our model math matches the reference's building blocks (SURVEY.md success
criterion 1: per-layer activations allclose).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from subgraph_sketching_tpu.models import BUDDY, LinkPredictor


def torch_linear(x, kernel, bias=None):
    w = torch.from_numpy(np.asarray(kernel)).T.float()
    out = x @ w.T
    if bias is not None:
        out = out + torch.from_numpy(np.asarray(bias)).float()
    return out


def torch_batchnorm_eval(x, scale, bias, mean, var, eps=1e-5):
    bn = torch.nn.BatchNorm1d(x.shape[-1], eps=eps)
    bn.weight.data = torch.from_numpy(np.asarray(scale)).float()
    bn.bias.data = torch.from_numpy(np.asarray(bias)).float()
    bn.running_mean.data = torch.from_numpy(np.asarray(mean)).float()
    bn.running_var.data = torch.from_numpy(np.asarray(var)).float()
    bn.eval()
    return bn(x)


def test_link_predictor_matches_torch():
    B, sf_dim, h = 16, 8, 32
    rng = np.random.default_rng(0)
    sf = rng.random((B, sf_dim), dtype=np.float32)
    nf = rng.random((B, 2, h), dtype=np.float32)

    model = LinkPredictor(sf_dim=sf_dim, hidden_channels=h)
    key = jax.random.PRNGKey(3)
    var = model.init({"params": key, "dropout": key}, jnp.asarray(sf),
                     jnp.asarray(nf), training=False)
    # make BN stats non-trivial
    bs = var["batch_stats"]
    bs = jax.tree.map(lambda a: a + 0.25, bs)
    var = {"params": var["params"], "batch_stats": bs}
    ours = np.asarray(model.apply(var, jnp.asarray(sf), jnp.asarray(nf),
                                  training=False))

    # same computation in torch (reference LinkPredictor.forward,
    # models/elph.py:73-86)
    p = var["params"]
    x = torch_linear(torch.from_numpy(sf), p["label_lin_layer"]["kernel"],
                     p["label_lin_layer"]["bias"])
    x = torch_batchnorm_eval(x, p["bn_labels"]["scale"],
                             p["bn_labels"]["bias"],
                             bs["bn_labels"]["mean"], bs["bn_labels"]["var"])
    x = torch.relu(x)
    hprod = torch.from_numpy(nf[:, 0] * nf[:, 1])
    hf = torch_linear(hprod, p["lin_out"]["kernel"], p["lin_out"]["bias"])
    hf = torch_batchnorm_eval(hf, p["bn_feats"]["scale"],
                              p["bn_feats"]["bias"],
                              bs["bn_feats"]["mean"], bs["bn_feats"]["var"])
    hf = torch.relu(hf)
    cat = torch.cat([x, hf], dim=1)
    logits = torch_linear(cat, p["lin"]["kernel"], p["lin"]["bias"])
    np.testing.assert_allclose(ours, logits.detach().numpy(), rtol=2e-4,
                               atol=2e-5)


def test_buddy_degree_normalised_matches_torch():
    B, sf_dim = 12, 8
    rng = np.random.default_rng(1)
    sf = rng.random((B, sf_dim), dtype=np.float32)
    sd = rng.integers(0, 5, B).astype(np.float32)  # includes zero degrees
    dd = rng.integers(0, 5, B).astype(np.float32)

    model = BUDDY(sf_dim=sf_dim, hidden_channels=16, use_feature=False,
                  append_normalised=True)
    key = jax.random.PRNGKey(0)
    var = model.init({"params": key, "dropout": key}, jnp.asarray(sf),
                     None, jnp.asarray(sd), jnp.asarray(dd), training=False)
    ours = np.asarray(model.apply(var, jnp.asarray(sf), None,
                                  jnp.asarray(sd), jnp.asarray(dd),
                                  training=False))

    # torch version of _append_degree_normalised (models/elph.py:276-293)
    t_sf = torch.from_numpy(sf)
    normaliser = torch.sqrt(torch.from_numpy(sd * dd))
    normed = t_sf / normaliser.unsqueeze(1)
    normed[torch.isnan(normed)] = 0
    normed[torch.isinf(normed)] = 0
    cat = torch.cat([t_sf, normed], dim=1)
    p, bs = var["params"], var["batch_stats"]
    x = torch_linear(cat, p["label_lin_layer"]["kernel"],
                     p["label_lin_layer"]["bias"])
    x = torch_batchnorm_eval(x, p["bn_labels"]["scale"],
                             p["bn_labels"]["bias"],
                             bs["bn_labels"]["mean"], bs["bn_labels"]["var"])
    x = torch.relu(x)
    logits = torch_linear(x, p["lin"]["kernel"], p["lin"]["bias"])
    np.testing.assert_allclose(ours, logits.detach().numpy(), rtol=2e-4,
                               atol=2e-5)


def test_batchnorm_training_stats_match_torch():
    """Training-mode BN: our flax config must normalise with batch stats the
    way torch.nn.BatchNorm1d does (biased variance)."""
    from subgraph_sketching_tpu.models.gnn import batch_norm
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x, *, training):
            return batch_norm(training)(x)

    rng = np.random.default_rng(2)
    x = rng.random((32, 8), dtype=np.float32) * 3
    m = M()
    var = m.init(jax.random.PRNGKey(0), jnp.asarray(x), training=False)
    ours, _ = m.apply(var, jnp.asarray(x), training=True,
                      mutable=["batch_stats"])

    bn = torch.nn.BatchNorm1d(8, eps=1e-5, momentum=0.1)
    bn.train()
    theirs = bn(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(ours), theirs.detach().numpy(),
                               rtol=1e-4, atol=1e-5)


def test_sign_embedding_matches_torch():
    """SIGNEmbedding (the ddi-shape diffusion operator) vs a torch replica
    of the reference (src/models/gnn.py:149-166): the reference drops PyG
    gcn_norm's weights and re-normalises unweighted over the (A+I) edge
    set inside cache_adj_t — which is exactly our gcn_norm with self-loops
    and no weights.  Eval mode, identical weights, allclose."""
    from subgraph_sketching_tpu.models.gnn import SIGNEmbedding

    rng = np.random.default_rng(0)
    n, e, d, K = 60, 240, 8, 2
    ei = np.stack([rng.integers(0, n, e),
                   rng.integers(0, n, e)]).astype(np.int32)
    x = rng.normal(size=(n, d)).astype(np.float32)

    mod = SIGNEmbedding(hidden_channels=d, out_channels=d, K=K, dropout=0.0)
    variables = mod.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(x), jnp.asarray(ei), n, training=False)
    ours = np.asarray(mod.apply(variables, jnp.asarray(x), jnp.asarray(ei),
                                n, training=False))

    # torch replica: unweighted sym-norm over A+I (reference cache_adj_t
    # applied to the self-looped edge set from gcn_norm)
    ei_l = np.concatenate([ei, np.stack([np.arange(n), np.arange(n)])],
                          axis=1)
    A = np.zeros((n, n), np.float32)
    for s, t in ei_l.T:
        A[t, s] += 1.0
    deg = A.sum(axis=1)
    dis = np.where(deg > 0, deg ** -0.5, 0.0)
    adj = dis[:, None] * A * dis[None, :]

    params = variables["params"]
    stats = variables["batch_stats"]
    xt = torch.from_numpy(x).float()
    hs = []
    for k in range(K + 1):
        h = torch_linear(xt, params[f"lin_{k}"]["kernel"],
                         params[f"lin_{k}"]["bias"])
        h = torch_batchnorm_eval(h, params[f"bn_{k}"]["scale"],
                                 params[f"bn_{k}"]["bias"],
                                 stats[f"bn_{k}"]["mean"],
                                 stats[f"bn_{k}"]["var"])
        h = torch.relu(h)
        hs.append(h)
        xt = torch.from_numpy(adj).float() @ xt
    h = torch.cat(hs, dim=-1)
    theirs = torch_linear(h, params["lin_out"]["kernel"],
                          params["lin_out"]["bias"]).detach().numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-4)
