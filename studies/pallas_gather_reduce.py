"""Pallas TPU kernel: fused gather + segmented min/max over dst-sorted edges.

The hot op of the framework (reference hot loop: PyG scatter-max hash
propagation, src/hashing.py:160-162).  XLA lowers ``x[src]`` +
``segment_min`` to a materialised [E, W] gather followed by a serialised
scatter; this kernel streams the dst-sorted edge list once, gathers neighbour
rows with a deep async-DMA pipeline, and keeps the running reduction for the
current destination row in VMEM — one pass, no [E, W] intermediate.

Layout contract (prepared by ``graph.container.Graph.csr_arrays`` + padding):
  * edges sorted by destination; src_ids/dst_ids int32 [E_pad]
  * rows [n+1, W]: row n is the reduction identity (uint32 max for min-reduce,
    0 for max-reduce); padded edges use src = dst = n
  * out is initialised to the input rows (self-inclusion = closed
    neighbourhood, matching the reference's add_self_loops) and reduced in
    place via input_output_aliasing
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DMA_DEPTH = 8  # outstanding gather DMAs


def _reduce_kernel(src_ref, dst_ref, rows_hbm, init_ref, out_hbm, acc,
                   gather_buf, gather_sems, out_sem, init_sem, *,
                   block_edges: int, is_min: bool, width: int):
    # init_ref is the donated copy of rows aliased onto out_hbm (same buffer);
    # it only exists so the output starts as the input rows
    """One grid step = one block of dst-sorted edges.

    acc:        [1, width] VMEM — running reduction for the current dst row
    gather_buf: [DMA_DEPTH, 1, width] VMEM — in-flight gathered rows
    """
    combine = jnp.minimum if is_min else jnp.maximum

    def gather(e, slot):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(src_ref[e], 1), :],
            gather_buf.at[slot],
            gather_sems.at[slot],
        )

    def load_out_row(v):
        # pull the current partial result for dst v into acc (covers dst runs
        # split across edge blocks: out already holds the running value)
        cp = pltpu.make_async_copy(out_hbm.at[pl.ds(v, 1), :], acc, init_sem)
        cp.start()
        cp.wait()

    def store_acc(v):
        cp = pltpu.make_async_copy(acc, out_hbm.at[pl.ds(v, 1), :], out_sem)
        cp.start()
        cp.wait()

    # warm up the gather pipeline
    for s in range(DMA_DEPTH):
        gather(s, s).start()

    load_out_row(dst_ref[0])

    def body(e, _):
        slot = jax.lax.rem(e, DMA_DEPTH)
        gather(e, slot).wait()
        d = dst_ref[e]

        # new destination? flush the accumulator and load the next row
        # (at e == 0 prev == d, so the flush is a no-op by construction)
        prev = dst_ref[jnp.maximum(e - 1, 0)]

        @pl.when((e > 0) & (d != prev))
        def _():
            store_acc(prev)
            load_out_row(d)

        acc[:] = combine(acc[:], gather_buf[slot])

        @pl.when(e + DMA_DEPTH < block_edges)
        def _():
            gather(e + DMA_DEPTH, slot).start()

        return 0

    jax.lax.fori_loop(0, block_edges, body, 0)
    store_acc(dst_ref[block_edges - 1])


def gather_reduce(rows: jnp.ndarray, src_ids: jnp.ndarray,
                  dst_ids: jnp.ndarray, *, is_min: bool,
                  block_edges: int = 4096) -> jnp.ndarray:
    """out[v] = reduce(rows[v], rows[u] for (u, v) in edges) — one pass.

    rows: [n+1, W] (identity row appended); src/dst: [E_pad] sorted by dst,
    E_pad a multiple of block_edges, pads pointing at row n.
    """
    n1, width = rows.shape
    e_pad = src_ids.shape[0]
    assert e_pad % block_edges == 0
    grid = e_pad // block_edges

    kernel = functools.partial(_reduce_kernel, block_edges=block_edges,
                               is_min=is_min, width=width)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_edges,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((block_edges,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # rows stay in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # aliased copy -> output
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((n1, width), rows.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, width), rows.dtype),
            pltpu.VMEM((DMA_DEPTH, 1, width), rows.dtype),
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        input_output_aliases={3: 0},  # out starts as a copy of rows
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(src_ids, dst_ids, rows, rows)
    return out


# ------------------------------------------------------- high-level wrapper --

def _min_identity(dtype):
    return np.iinfo(dtype).max if np.issubdtype(dtype, np.integer) else np.inf


def _max_identity(dtype):
    return np.iinfo(dtype).min if np.issubdtype(dtype, np.integer) else -np.inf


def prepare_csr_edges(edge_index: np.ndarray, num_nodes: int,
                      block_edges: int = 4096):
    """Host-side: sort edges by dst, pad to a block multiple with sentinel n.

    Returns (src_sorted, dst_sorted) int32 [E_pad] for gather_reduce.
    """
    order = np.argsort(edge_index[1], kind="stable")
    src = edge_index[0][order].astype(np.int32)
    dst = edge_index[1][order].astype(np.int32)
    e = len(src)
    e_pad = max(block_edges, ((e + block_edges - 1) // block_edges) * block_edges)
    pad = e_pad - e
    src = np.concatenate([src, np.full(pad, num_nodes, np.int32)])
    dst = np.concatenate([dst, np.full(pad, num_nodes, np.int32)])
    return src, dst


def append_identity_row(x: jnp.ndarray, *, is_min: bool) -> jnp.ndarray:
    ident = _min_identity(x.dtype) if is_min else _max_identity(x.dtype)
    row = jnp.full((1, x.shape[1]), ident, dtype=x.dtype)
    return jnp.concatenate([x, row], axis=0)


def _infer_block(e_pad: int, block_edges: int) -> int:
    while e_pad % block_edges:
        block_edges //= 2
    return max(block_edges, 1)


_SIGN_BIT = jnp.uint32(0x80000000)


def propagate_min_pallas(x: jnp.ndarray, src_sorted: jnp.ndarray,
                         dst_sorted: jnp.ndarray,
                         block_edges: int = 4096) -> jnp.ndarray:
    """Closed-neighbourhood elementwise min (minhash propagation hot path).

    Mosaic has no unsigned vector min, so uint32 lanes are mapped onto signed
    order with the sign-bit XOR trick (order-preserving bijection), reduced
    with signed min, and mapped back.  The two extra elementwise passes touch
    node rows only — negligible next to the per-edge gather traffic.
    """
    if x.dtype == jnp.uint32:
        biased = jax.lax.bitcast_convert_type(x ^ _SIGN_BIT, jnp.int32)
        rows = append_identity_row(biased, is_min=True)
        be = _infer_block(src_sorted.shape[0], block_edges)
        out = gather_reduce(rows, src_sorted, dst_sorted, is_min=True,
                            block_edges=be)[:-1]
        return jax.lax.bitcast_convert_type(out, jnp.uint32) ^ _SIGN_BIT
    rows = append_identity_row(x, is_min=True)
    be = _infer_block(src_sorted.shape[0], block_edges)
    return gather_reduce(rows, src_sorted, dst_sorted, is_min=True,
                         block_edges=be)[:-1]


def propagate_max_pallas(x: jnp.ndarray, src_sorted: jnp.ndarray,
                         dst_sorted: jnp.ndarray,
                         block_edges: int = 4096) -> jnp.ndarray:
    """Closed-neighbourhood elementwise max (HLL propagation hot path)."""
    rows = append_identity_row(x, is_min=False)
    be = _infer_block(src_sorted.shape[0], block_edges)
    return gather_reduce(rows, src_sorted, dst_sorted, is_min=False,
                         block_edges=be)[:-1]
