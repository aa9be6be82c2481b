"""Byte-mirrored OGB on-disk fixtures.

Writes the exact directory layout the ogb package extracts
(ogb/io/read_graph_raw.py + ogb/linkproppred/dataset.py): headerless
comma-separated ``*.csv.gz`` raw files plus ``torch.save``'d split dicts —
so the package-free parser (``graph/datasets.load_ogb_raw``) is tested
against the real storage format, not an in-memory stand-in.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import torch


def _write_csv_gz(path: str, arr: np.ndarray):
    arr = np.asarray(arr)
    if arr.ndim == 1:
        arr = arr[:, None]
    with gzip.open(path, "wt") as f:
        for row in arr:
            f.write(",".join(str(v) for v in row) + "\n")


def write_collab_fixture(root: str, num_nodes: int = 60, seed: int = 0
                         ) -> str:
    """A tiny ogbl_collab tree: undirected raw edges stored ONE direction
    (add_inverse_edge=True in master.csv), edge_weight/edge_year additional
    files, split/time/*.pt with edge/weight/year (+ edge_neg for eval)."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "ogbl_collab")
    raw = os.path.join(base, "raw")
    split = os.path.join(base, "split", "time")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)

    def rnd_edges(k):
        e = rng.integers(0, num_nodes, (k, 2), dtype=np.int64)
        return e[e[:, 0] != e[:, 1]]

    tr, va, te = rnd_edges(150), rnd_edges(30), rnd_edges(30)
    w_tr = rng.integers(1, 3, len(tr), dtype=np.int64)
    y_tr = rng.integers(2000, 2016, len(tr), dtype=np.int64)
    _write_csv_gz(os.path.join(raw, "edge.csv.gz"), tr)
    _write_csv_gz(os.path.join(raw, "num-node-list.csv.gz"),
                  np.array([num_nodes]))
    _write_csv_gz(os.path.join(raw, "edge_weight.csv.gz"), w_tr)
    _write_csv_gz(os.path.join(raw, "edge_year.csv.gz"), y_tr)
    feat = np.round(rng.random((num_nodes, 8)), 4).astype(np.float32)
    _write_csv_gz(os.path.join(raw, "node-feat.csv.gz"), feat)

    torch.save({"edge": torch.as_tensor(tr),
                "weight": torch.as_tensor(w_tr),
                "year": torch.as_tensor(y_tr)},
               os.path.join(split, "train.pt"))
    for name, e in (("valid", va), ("test", te)):
        torch.save({"edge": torch.as_tensor(e),
                    "weight": torch.as_tensor(
                        rng.integers(1, 3, len(e), dtype=np.int64)),
                    "year": torch.as_tensor(
                        rng.integers(2000, 2016, len(e), dtype=np.int64)),
                    "edge_neg": torch.as_tensor(rnd_edges(40))},
                   os.path.join(split, f"{name}.pt"))
    return base


def write_citation2_fixture(root: str, num_nodes: int = 80, seed: int = 1
                            ) -> str:
    """A tiny ogbl_citation2 tree: DIRECTED raw edges (add_inverse_edge=
    False), node features, split/time/*.pt with source_node/target_node
    (+ per-source target_node_neg for eval)."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "ogbl_citation2")
    raw = os.path.join(base, "raw")
    split = os.path.join(base, "split", "time")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)

    e = rng.integers(0, num_nodes, (200, 2), dtype=np.int64)
    e = e[e[:, 0] != e[:, 1]]
    _write_csv_gz(os.path.join(raw, "edge.csv.gz"), e)
    _write_csv_gz(os.path.join(raw, "num-node-list.csv.gz"),
                  np.array([num_nodes]))
    feat = np.round(rng.random((num_nodes, 16)), 4).astype(np.float32)
    _write_csv_gz(os.path.join(raw, "node-feat.csv.gz"), feat)

    def split_dict(k, with_neg):
        src = rng.integers(0, num_nodes, k, dtype=np.int64)
        dst = rng.integers(0, num_nodes, k, dtype=np.int64)
        d = {"source_node": torch.as_tensor(src),
             "target_node": torch.as_tensor(dst)}
        if with_neg:
            d["target_node_neg"] = torch.as_tensor(
                rng.integers(0, num_nodes, (k, 5), dtype=np.int64))
        return d

    torch.save(split_dict(60, False), os.path.join(split, "train.pt"))
    torch.save(split_dict(15, True), os.path.join(split, "valid.pt"))
    torch.save(split_dict(15, True), os.path.join(split, "test.pt"))
    return base

def write_ddi_fixture(root: str, num_nodes: int = 60, seed: int = 2) -> str:
    """A tiny ogbl_ddi tree: undirected raw edges stored ONE direction
    (add_inverse_edge=True), NO node-feat file (ddi is featureless),
    split/target/*.pt with edge (+ edge_neg for eval)."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "ogbl_ddi")
    raw = os.path.join(base, "raw")
    split = os.path.join(base, "split", "target")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)

    def rnd_edges(k):
        e = rng.integers(0, num_nodes, (k, 2), dtype=np.int64)
        return e[e[:, 0] != e[:, 1]]

    tr, va, te = rnd_edges(150), rnd_edges(30), rnd_edges(30)
    _write_csv_gz(os.path.join(raw, "edge.csv.gz"), tr)
    _write_csv_gz(os.path.join(raw, "num-node-list.csv.gz"),
                  np.array([num_nodes]))
    torch.save({"edge": torch.as_tensor(tr)},
               os.path.join(split, "train.pt"))
    for name, e in (("valid", va), ("test", te)):
        torch.save({"edge": torch.as_tensor(e),
                    "edge_neg": torch.as_tensor(rnd_edges(40))},
                   os.path.join(split, f"{name}.pt"))
    return base


def write_ppa_fixture(root: str, num_nodes: int = 70, seed: int = 3) -> str:
    """A tiny ogbl_ppa tree: undirected raw edges stored ONE direction
    (add_inverse_edge=True), one-hot-ish node features,
    split/throughput/*.pt with edge (+ edge_neg for eval)."""
    rng = np.random.default_rng(seed)
    base = os.path.join(root, "ogbl_ppa")
    raw = os.path.join(base, "raw")
    split = os.path.join(base, "split", "throughput")
    os.makedirs(raw, exist_ok=True)
    os.makedirs(split, exist_ok=True)

    def rnd_edges(k):
        e = rng.integers(0, num_nodes, (k, 2), dtype=np.int64)
        return e[e[:, 0] != e[:, 1]]

    tr, va, te = rnd_edges(160), rnd_edges(30), rnd_edges(30)
    _write_csv_gz(os.path.join(raw, "edge.csv.gz"), tr)
    _write_csv_gz(os.path.join(raw, "num-node-list.csv.gz"),
                  np.array([num_nodes]))
    feat = np.eye(8, dtype=np.float32)[rng.integers(0, 8, num_nodes)]
    _write_csv_gz(os.path.join(raw, "node-feat.csv.gz"), feat)
    torch.save({"edge": torch.as_tensor(tr)},
               os.path.join(split, "train.pt"))
    for name, e in (("valid", va), ("test", te)):
        torch.save({"edge": torch.as_tensor(e),
                    "edge_neg": torch.as_tensor(rnd_edges(40))},
                   os.path.join(split, f"{name}.pt"))
    return base
