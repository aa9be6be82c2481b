"""ctypes bindings for the native (C++) host-side components.

The reference does all host preprocessing in python (its SEAL extraction is
a per-link python BFS, seal.py:291: "it is not parallelised"); here the hot
host loops are C++ with OpenMP.  Falls back to the pure-python paths when the
library can't be built.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_LIB = None
_TRIED = False

NODE_LABELS = {"drnl": 0, "hop": 1, "zo": 2, "degree": 3, "none": 4,
               "de": 5, "de+": 6}
# labelling schemes that emit two labels (dist-to-src, dist-to-dst) per node
TWO_DIM_LABELS = ("de", "de+")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    try:
        from tools.build_native import build  # repo checkout
    except ImportError:
        try:
            import sys
            sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), "tools"))
            from build_native import build  # type: ignore
        except ImportError:
            return None
    try:
        path = build(verbose=False)
        lib = ctypes.CDLL(path)
        lib.seal_extract_batch.restype = ctypes.c_int
        lib.seal_extract_version.restype = ctypes.c_int
        _LIB = lib
    except Exception as e:  # no toolchain / build failure -> python path
        print(f"native build unavailable ({e}); using python extraction")
        _LIB = None
    return _LIB


def have_native() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def seal_extract_batch_native(
        indptr: np.ndarray, indices: np.ndarray,
        weights: Optional[np.ndarray], num_nodes: int, links: np.ndarray,
        num_hops: int, max_nodes: int, max_edges: int, max_dist: int,
        node_label: str, ratio_per_hop: float = 1.0,
        max_nodes_per_hop: Optional[int] = None, seed: int = 0
        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                   np.ndarray, np.ndarray]:
    """Batched enclosing-subgraph extraction.

    Returns (nodes [B,N], z [B,N] — or [B,N,2] for de/de+ — src [B,E],
    dst [B,E], w [B,E], counts [B,2]) in the dense padded layout of
    graph.seal.SealBatchArrays.
    """
    lib = _load()
    assert lib is not None
    if max_nodes < 2 or max_edges < 1:
        raise ValueError(f"max_nodes >= 2 and max_edges >= 1 required "
                         f"(got {max_nodes}, {max_edges}): the two center "
                         f"nodes are always extracted")
    if int(np.asarray(indptr)[-1]) > np.iinfo(np.int32).max:
        # a silent int32 cast would wrap CSR offsets negative
        raise OverflowError(
            "graph has >= 2^31 nonzeros — beyond the native extractor's "
            "int32 CSR; use the python path")
    B = len(links)
    links_arr = np.asarray(links)
    if B and (links_arr.min() < 0 or links_arr.max() >= num_nodes):
        # the C++ extractor indexes per-thread stamp/local_id arrays by
        # node id with no bounds check (speed); a stray id (e.g. a -1 pad
        # leaking into the link table) would corrupt the heap inside the
        # OpenMP workers instead of failing diagnosably.  Check the
        # ORIGINAL array: an int64 id >= 2^32 would wrap through the int32
        # cast and silently alias a valid node.
        bad = links_arr[((links_arr < 0) | (links_arr >= num_nodes)).any(1)]
        raise ValueError(
            f"link endpoints out of range [0, {num_nodes}): "
            f"{bad[:5].tolist()}{' …' if len(bad) > 5 else ''}")
    links_c = np.ascontiguousarray(links, dtype=np.int32)
    indptr = np.ascontiguousarray(indptr, dtype=np.int32)
    indices = np.ascontiguousarray(indices, dtype=np.int32)
    w_in = (np.ascontiguousarray(weights, dtype=np.float32)
            if weights is not None else None)
    out_nodes = np.full((B, max_nodes), -1, dtype=np.int32)
    z_shape = ((B, max_nodes, 2) if node_label in TWO_DIM_LABELS
               else (B, max_nodes))
    out_z = np.zeros(z_shape, dtype=np.int32)
    out_src = np.zeros((B, max_edges), dtype=np.int32)
    out_dst = np.zeros((B, max_edges), dtype=np.int32)
    out_w = np.zeros((B, max_edges), dtype=np.float32)
    out_counts = np.zeros((B, 2), dtype=np.int32)
    i32, f32 = ctypes.c_int32, ctypes.c_float
    rc = lib.seal_extract_batch(
        _ptr(indptr, i32), _ptr(indices, i32),
        _ptr(w_in, f32) if w_in is not None else None,
        i32(num_nodes), _ptr(links_c, i32), i32(B),
        i32(num_hops), i32(max_nodes), i32(max_edges), i32(max_dist),
        i32(NODE_LABELS[node_label]), ctypes.c_double(ratio_per_hop),
        i32(-1 if max_nodes_per_hop is None else max_nodes_per_hop),
        ctypes.c_uint64(seed),
        _ptr(out_nodes, i32), _ptr(out_z, i32), _ptr(out_src, i32),
        _ptr(out_dst, i32), _ptr(out_w, f32), _ptr(out_counts, i32))
    if rc != 0:
        raise RuntimeError(f"seal_extract_batch failed (rc={rc})")
    return out_nodes, out_z, out_src, out_dst, out_w, out_counts
