"""Executable torch-only oracle of the reference pipeline.

This module re-creates the reference's sketching + model + training math in
plain torch (no PyG / torch_scatter / datasketch), so the TPU build can be
diffed end-to-end against an independently-executed implementation of the
same semantics:

  * sketch construction     — reference src/hashing.py:106-165
  * HLL count estimator     — reference src/hashing.py:191-232
  * subgraph features       — reference src/hashing.py:167-189, 258-323
  * LinkPredictor / ELPH    — reference src/models/elph.py:22-218
  * BUDDY                   — reference src/models/elph.py:221-352
  * train loops             — reference src/runners/train.py:27-89, 160-228

Two deliberate deviations, both environment-forced and shared with the main
package so they cancel out in any oracle-vs-package diff:

  * node-ID hashing uses ``pandas.util.hash_array`` directly (available
    here; the package implements the same SplitMix64 finalizer and the two
    are asserted bit-equal in tests);
  * the HLL++ empirical threshold / raw-estimate / bias tables come from the
    package's regenerated ``_hll_tables.npz`` because ``datasketch`` is not
    installed in this environment.  The estimator *algorithm* (linear
    counting, threshold crossover, argsort 6-NN bias) is the reference's.

PyG's ``MessagePassing(aggr='max')`` is replaced by ``torch.scatter_reduce``
(amin/amax) over the self-looped edge list — identical aggregation semantics.
"""

from __future__ import annotations

import numpy as np
import torch
from pandas.util import hash_array

from subgraph_sketching_tpu.sketch.hll import _THRESHOLDS, _load_tables, hll_alpha

_MERSENNE = np.uint64((1 << 61) - 1)
_MAXHASH = np.uint64((1 << 32) - 1)


def _with_self_loops(edge_index: torch.Tensor, num_nodes: int) -> torch.Tensor:
    loop = torch.arange(num_nodes, dtype=edge_index.dtype)
    return torch.cat([edge_index, torch.stack([loop, loop])], dim=1)


def _scatter_prop(x: torch.Tensor, edge_index: torch.Tensor, num_nodes: int,
                  reduce: str) -> torch.Tensor:
    """out[v] = reduce over {x[u] : (u, v) in E} — E must include self-loops.

    Equivalent of PyG MessagePassing(aggr='max') / the negated-min trick
    (reference src/hashing.py:28-45).
    """
    src, dst = edge_index[0], edge_index[1]
    out = torch.zeros((num_nodes, x.shape[1]), dtype=x.dtype)
    idx = dst.unsqueeze(1).expand(-1, x.shape[1])
    return out.scatter_reduce_(0, idx, x[src], reduce=reduce,
                               include_self=False)


class OracleSketcher:
    """Torch replica of ``ElphHashes`` (reference src/hashing.py:48-323)."""

    def __init__(self, max_hops: int = 2, num_perm: int = 128, p: int = 8,
                 use_zero_one: bool = False, floor_sf: bool = False,
                 minhash_seed: int = 1):
        assert max_hops in (1, 2, 3)
        self.max_hops = max_hops
        self.num_perm = num_perm
        self.p = p
        self.m = 1 << p
        self.max_rank = 64 - p
        self.use_zero_one = use_zero_one
        self.floor_sf = floor_sf
        self.minhash_seed = minhash_seed
        self.alpha = hll_alpha(self.m)
        self.threshold = float(_THRESHOLDS[p])
        raw, bias = _load_tables(p)
        self.raw_estimates = torch.from_numpy(np.asarray(raw, np.float32))
        self.biases = torch.from_numpy(np.asarray(bias, np.float32))

    # ---- hop-0 initialisation (reference src/hashing.py:106-137) ----

    def _permutations(self) -> np.ndarray:
        gen = np.random.RandomState(self.minhash_seed)
        pairs = [(gen.randint(1, _MERSENNE, dtype=np.uint64),
                  gen.randint(0, _MERSENNE, dtype=np.uint64))
                 for _ in range(self.num_perm)]
        return np.array(pairs, dtype=np.uint64).T

    def init_minhash(self, n: int) -> torch.Tensor:
        a, b = self._permutations()
        hv = hash_array(np.arange(1, n + 1))  # 1-indexed: hash maps 0 -> 0
        with np.errstate(over="ignore"):
            sig = ((a * hv[:, None] + b) % _MERSENNE) & _MAXHASH
        return torch.from_numpy(sig.astype(np.int64))

    def init_hll(self, n: int) -> torch.Tensor:
        hv = hash_array(np.arange(1, n + 1))
        reg_index = (hv & np.uint64(self.m - 1)).astype(np.int64)
        bits = hv >> np.uint64(self.p)
        bit_length = np.ceil(np.log2(bits.astype(np.float64) + 1)).astype(int)
        ranks = self.max_rank - bit_length + 1
        if ranks.min() <= 0:
            raise ValueError("hash value overflow")
        regs = np.zeros((n, self.m), dtype=np.int8)
        regs[np.arange(n), reg_index] = ranks
        return torch.from_numpy(regs)

    # ---- propagation (reference src/hashing.py:139-165) ----

    def build_tables(self, num_nodes: int, edge_index: torch.Tensor):
        ei = _with_self_loops(edge_index, num_nodes)
        tables = {0: {"minhash": self.init_minhash(num_nodes),
                      "hll": self.init_hll(num_nodes)}}
        cards = torch.zeros((num_nodes, self.max_hops))
        for k in range(1, self.max_hops + 1):
            tables[k] = {
                "minhash": _scatter_prop(tables[k - 1]["minhash"], ei,
                                         num_nodes, "amin"),
                "hll": _scatter_prop(tables[k - 1]["hll"], ei,
                                     num_nodes, "amax"),
            }
            cards[:, k - 1] = self.hll_count(tables[k]["hll"])
        return tables, cards

    # ---- estimator (reference src/hashing.py:191-232) ----

    def hll_count(self, regs: torch.Tensor) -> torch.Tensor:
        if regs.dim() == 1:
            regs = regs.unsqueeze(0)
        out = torch.full((regs.shape[0],), self.threshold + 1.0)
        num_zero = self.m - torch.count_nonzero(regs, dim=1)
        has_zero = num_zero > 0
        out[has_zero] = self.m * torch.log(
            self.m / num_zero[has_zero].float())
        need_raw = out > self.threshold
        e = (self.alpha * self.m ** 2) / torch.sum(
            2.0 ** (-regs[need_raw].float()), dim=1)
        # 6-NN empirical bias, subtracted when e <= 5m (:197-210)
        nn = torch.argsort(
            (e.unsqueeze(-1) - self.raw_estimates) ** 2)[:, :6]
        bias = torch.mean(self.biases[nn], dim=1)
        small = e <= 5 * self.m
        e[small] = e[small] - bias[small]
        out[need_raw] = e
        return out

    def jaccard(self, src: torch.Tensor, dst: torch.Tensor) -> torch.Tensor:
        return torch.count_nonzero(src == dst, dim=-1) / self.num_perm

    # ---- subgraph features (reference src/hashing.py:167-189, 258-323) ----

    def _intersections(self, links: torch.Tensor, tables) -> dict:
        out = {}
        for k1 in range(1, self.max_hops + 1):
            for k2 in range(1, self.max_hops + 1):
                mh_u = tables[k1]["minhash"][links[:, 0]]
                mh_v = tables[k2]["minhash"][links[:, 1]]
                union = torch.maximum(tables[k1]["hll"][links[:, 0]],
                                      tables[k2]["hll"][links[:, 1]])
                out[(k1, k2)] = (self.jaccard(mh_u, mh_v)
                                 * self.hll_count(union))
        return out

    def subgraph_features(self, links: torch.Tensor, tables,
                          cards: torch.Tensor) -> torch.Tensor:
        I = self._intersections(links, tables)
        cu = cards[links[:, 0]]
        cv = cards[links[:, 1]]
        K = self.max_hops
        f01 = I[(1, 1)]
        cols = [f01]
        if K == 1:
            cols += [cv[:, 0] - f01, cu[:, 0] - f01]
        elif K == 2:
            f21 = I[(2, 1)] - f01
            f12 = I[(1, 2)] - f01
            f22 = I[(2, 2)] - f01 - f21 - f12
            f_0_1 = cv[:, 0] - f01 - f21
            f_1_0 = cu[:, 0] - f01 - f12
            f_0_2 = cv[:, 1] - (f01 + f21 + f12 + f22 + f_0_1)
            # the reference subtracts f(1,1) twice in this column (:287-288)
            f_2_0 = cu[:, 1] - f01 - (f01 + f21 + f12 + f22) - f_1_0
            cols += [f21, f12, f22, f_0_1, f_1_0, f_0_2, f_2_0]
        else:
            f21 = I[(2, 1)] - f01
            f12 = I[(1, 2)] - f01
            f22 = I[(2, 2)] - f01 - f21 - f12
            f31 = I[(3, 1)] - f01 - f21
            f13 = I[(1, 3)] - f01 - f12
            s4 = f01 + f21 + f12 + f22
            f32 = I[(3, 2)] - s4 - f31
            f23 = I[(2, 3)] - s4 - f13
            s8 = s4 + f31 + f13 + f32 + f23
            f33 = I[(3, 3)] - s8
            f_0_1 = cv[:, 0] - f01 - f21 - f31
            f_1_0 = cu[:, 0] - f01 - f12 - f13
            s5 = s4 + f31
            f_0_2 = cv[:, 1] - s5 - f32 - f_0_1
            f_2_0 = cu[:, 1] - s5 - f23 - f_1_0
            s9 = s8 + f33
            f_0_3 = cv[:, 2] - s9 - f_0_1 - f_0_2
            f_3_0 = cu[:, 2] - s9 - f_1_0 - f_2_0
            cols += [f21, f12, f22, f31, f13, f32, f23, f33,
                     f_0_1, f_1_0, f_0_2, f_2_0, f_0_3, f_3_0]
        feats = torch.stack(cols, dim=1).float()
        if not self.use_zero_one:
            if K == 2:
                feats[:, 4] = 0
                feats[:, 5] = 0
            elif K == 3:
                feats[:, 4] = 0
                feats[:, 5] = 0
                feats[:, 11] = 0
                feats[:, 12] = 0
        if self.floor_sf:
            feats[feats < 0] = 0
        return feats


# ---------------------------------------------------------------------------
# models (reference src/models/elph.py)
# ---------------------------------------------------------------------------


def oracle_gcn_norm(edge_index: torch.Tensor, num_nodes: int):
    """PyG ``gcn_norm`` with defaults: self-loops weight 1, symmetric
    D^-1/2 (A+I) D^-1/2 (used at reference src/models/elph.py:150 and inside
    every GCNConv)."""
    ei = _with_self_loops(edge_index, num_nodes)
    w = torch.ones(ei.shape[1])
    deg = torch.zeros(num_nodes).index_add_(0, ei[1], w)
    dinv = deg.pow(-0.5)
    dinv[torch.isinf(dinv)] = 0
    return ei, dinv[ei[0]] * w * dinv[ei[1]]


class OracleGCNConv(torch.nn.Module):
    """PyG GCNConv default semantics: XW, normalised aggregation, + bias."""

    def __init__(self, in_channels: int, out_channels: int):
        super().__init__()
        self.lin = torch.nn.Linear(in_channels, out_channels, bias=False)
        self.bias = torch.nn.Parameter(torch.zeros(out_channels))

    def forward(self, x, edge_index, num_nodes):
        x = self.lin(x)
        ei, w = oracle_gcn_norm(edge_index, num_nodes)
        out = torch.zeros_like(x).index_add_(0, ei[1], x[ei[0]] * w[:, None])
        return out + self.bias


class OraclePredictor(torch.nn.Module):
    """Reference LinkPredictor (src/models/elph.py:22-86), no embedding."""

    def __init__(self, sf_dim: int, hidden: int, num_features: int,
                 use_feature: bool = True, dropout: float = 0.0):
        super().__init__()
        self.use_feature = use_feature
        self.dropout = dropout
        self.label_lin_layer = torch.nn.Linear(sf_dim, sf_dim)
        self.bn_labels = torch.nn.BatchNorm1d(sf_dim)
        out_dim = sf_dim
        if use_feature:
            self.lin_out = torch.nn.Linear(hidden, hidden)
            self.bn_feats = torch.nn.BatchNorm1d(hidden)
            out_dim += hidden
        self.lin = torch.nn.Linear(out_dim, 1)

    def forward(self, sf, node_features=None):
        x = torch.relu(self.bn_labels(self.label_lin_layer(sf)))
        x = torch.nn.functional.dropout(x, self.dropout, self.training)
        if self.use_feature:
            h = node_features[:, 0, :] * node_features[:, 1, :]
            h = torch.relu(self.bn_feats(self.lin_out(h)))
            h = torch.nn.functional.dropout(h, self.dropout, self.training)
            x = torch.cat([x, h], dim=1)
        return self.lin(x)


class OracleELPH(torch.nn.Module):
    """Reference ELPH (src/models/elph.py:98-218), feature_prop='gcn'."""

    def __init__(self, sketcher: OracleSketcher, num_features: int,
                 hidden: int, dropout: float = 0.0):
        super().__init__()
        self.sketcher = sketcher
        self.dropout = dropout
        self.convs = torch.nn.ModuleList()
        dims = [num_features] + [hidden] * sketcher.max_hops
        for k in range(sketcher.max_hops):
            self.convs.append(OracleGCNConv(dims[k], dims[k + 1]))
        self.predictor = OraclePredictor(
            sketcher.max_hops * (sketcher.max_hops + 2), hidden,
            num_features, dropout=dropout)
        self._init_mh = None
        self._init_hll = None

    def forward(self, x, edge_index):
        n = x.shape[0]
        ei_hash = _with_self_loops(edge_index, n)
        if self._init_mh is None:
            self._init_mh = self.sketcher.init_minhash(n)
            self._init_hll = self.sketcher.init_hll(n)
        mh, hll = self._init_mh, self._init_hll
        tables = {0: {"minhash": mh, "hll": hll}}
        cards = torch.zeros((n, self.sketcher.max_hops))
        for k in range(1, self.sketcher.max_hops + 1):
            hll = _scatter_prop(hll, ei_hash, n, "amax")
            mh = _scatter_prop(mh, ei_hash, n, "amin")
            tables[k] = {"minhash": mh, "hll": hll}
            cards[:, k - 1] = self.sketcher.hll_count(hll)
            x = self.convs[k - 1](x, edge_index, n)
            x = torch.nn.functional.dropout(x, self.dropout, self.training)
        return x, tables, cards


class OracleBUDDY(torch.nn.Module):
    """Reference BUDDY (src/models/elph.py:221-352), sign_k=0 path."""

    def __init__(self, sf_dim: int, num_features: int, hidden: int,
                 use_feature: bool = True, use_RA: bool = False,
                 append_normalised: bool = False, dropout: float = 0.0):
        super().__init__()
        self.use_feature = use_feature
        self.use_RA = use_RA
        self.append_normalised = append_normalised
        self.dropout = dropout
        dim = sf_dim * 2 if append_normalised else sf_dim
        self.label_lin_layer = torch.nn.Linear(dim, dim)
        self.bn_labels = torch.nn.BatchNorm1d(dim)
        out_dim = dim
        if use_feature:
            self.lin_feat = torch.nn.Linear(num_features, hidden)
            self.lin_out = torch.nn.Linear(hidden, hidden)
            self.bn_feats = torch.nn.BatchNorm1d(hidden)
            out_dim += hidden
        if use_RA:
            self.bn_RA = torch.nn.BatchNorm1d(1)
            out_dim += 1
        self.lin = torch.nn.Linear(out_dim, 1)

    def forward(self, sf, node_features=None, src_degree=None,
                dst_degree=None, RA=None):
        if self.append_normalised:
            # reference _append_degree_normalised (:276-293)
            normed = sf / torch.sqrt(src_degree * dst_degree).unsqueeze(1)
            normed[torch.isnan(normed)] = 0
            normed[torch.isinf(normed)] = 0
            sf = torch.cat([sf, normed], dim=1)
        x = torch.relu(self.bn_labels(self.label_lin_layer(sf)))
        x = torch.nn.functional.dropout(x, self.dropout, self.training)
        if self.use_feature:
            h = self.lin_feat(node_features)
            h = h[:, 0, :] * h[:, 1, :]
            h = torch.relu(self.bn_feats(self.lin_out(h)))
            h = torch.nn.functional.dropout(h, self.dropout, self.training)
            x = torch.cat([x, h], dim=1)
        if self.use_RA:
            x = torch.cat([x, self.bn_RA(RA.unsqueeze(-1))], dim=1)
        return self.lin(x)


# ---------------------------------------------------------------------------
# torch -> flax weight export
# ---------------------------------------------------------------------------


def _dense(lin: torch.nn.Linear) -> dict:
    out = {"kernel": lin.weight.detach().numpy().T.copy()}
    if lin.bias is not None:
        out["bias"] = lin.bias.detach().numpy().copy()
    return out


def _bn(bn: torch.nn.BatchNorm1d):
    params = {"scale": bn.weight.detach().numpy().copy(),
              "bias": bn.bias.detach().numpy().copy()}
    stats = {"mean": bn.running_mean.detach().numpy().copy(),
             "var": bn.running_var.detach().numpy().copy()}
    return params, stats


def predictor_params_to_flax(m: OraclePredictor) -> dict:
    bn_l, st_l = _bn(m.bn_labels)
    params = {"label_lin_layer": _dense(m.label_lin_layer),
              "bn_labels": bn_l, "lin": _dense(m.lin)}
    stats = {"bn_labels": st_l}
    if m.use_feature:
        bn_f, st_f = _bn(m.bn_feats)
        params["lin_out"] = _dense(m.lin_out)
        params["bn_feats"] = bn_f
        stats["bn_feats"] = st_f
    return {"params": params, "batch_stats": stats}


def elph_params_to_flax(m: OracleELPH) -> dict:
    """Params for ELPHPredictor (gnn + predictor submodules)."""
    gnn = {}
    for k, conv in enumerate(m.convs):
        gnn[f"conv_{k}"] = {"Dense_0": {"kernel":
                                        conv.lin.weight.detach().numpy().T.copy()},
                            "bias": conv.bias.detach().numpy().copy()}
    pred = predictor_params_to_flax(m.predictor)
    return {"params": {"gnn": gnn, "predictor": pred["params"]},
            "batch_stats": {"predictor": pred["batch_stats"]}}


def buddy_params_to_flax(m: OracleBUDDY) -> dict:
    bn_l, st_l = _bn(m.bn_labels)
    params = {"label_lin_layer": _dense(m.label_lin_layer),
              "bn_labels": bn_l, "lin": _dense(m.lin)}
    stats = {"bn_labels": st_l}
    if m.use_feature:
        bn_f, st_f = _bn(m.bn_feats)
        params["lin_feat"] = _dense(m.lin_feat)
        params["lin_out"] = _dense(m.lin_out)
        params["bn_feats"] = bn_f
        stats["bn_feats"] = st_f
    if m.use_RA:
        bn_r, st_r = _bn(m.bn_RA)
        params["bn_RA"] = bn_r
        stats["bn_RA"] = st_r
    return {"params": params, "batch_stats": stats}
