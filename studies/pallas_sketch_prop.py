"""Pallas TPU kernel v2: block-streaming sketch propagation.

The hot op (reference scatter-max hash propagation, src/hashing.py:160-162)
reformulated to avoid per-edge DMAs entirely:

  * destination nodes are partitioned into blocks of NB rows; the running
    min/max accumulator for one block lives in VMEM (NB x W)
  * edges (self-loops included) are sorted by (dst_block, src); the kernel
    streams source rows through VMEM in large sequential chunk DMAs —
    because src is sorted within a block, the chunk index only moves
    monotonically, so each (block, chunk) pair is loaded at most once, and
    the next chunk is speculatively prefetched into a second buffer
  * per edge: one VMEM read-modify-write acc[dst_local] = op(acc, row)
  * when the destination block changes, the accumulator is flushed to HBM
    with one big aligned DMA

Traffic: n_blocks * n_rows sequential reads + E VMEM RMWs + n writes — no
[E, W] intermediate, no serialised XLA scatter, no per-edge descriptors.
The TPU grid is sequential, which makes the cross-tile accumulator and
prefetch state in scratch memory sound.

uint32 minhash lanes ride as sign-bit-biased int32 (Mosaic has no unsigned
vector min); int8 HLL registers are widened to int32 for the kernel (single
int8 rows are not tiling-addressable in VMEM).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 4096        # dst rows per accumulator block
TE = 2048        # edges per grid step
CH = 512         # source rows per streamed chunk

_SIGN = jnp.uint32(0x80000000)


# ----------------------------------------------------------------- kernel --

def _block_prop_kernel(blk_ref, src_ref, dstl_ref, rows_hbm, out_hbm,
                       acc, chunk, state, chunk_sems, flush_sem,
                       *, is_min: bool, width: int, num_tiles: int,
                       max_chunk: int, ident):
    """Grid step = one tile of TE edges, all belonging to one dst block.

    blk_ref: scalar-prefetch array [num_tiles] — dst block id per tile.
    state (SMEM int32[4]): [0] cur chunk (-1 none), [1] cur dst block,
                           [2] prefetched chunk (-1 none), [3] cur buffer.
    chunk scratch is [2*CH, width]: two CH-row buffers.
    """
    t = pl.program_id(0)
    combine = jnp.minimum if is_min else jnp.maximum
    blk = blk_ref[t]

    def chunk_copy(c, buf):
        return pltpu.make_async_copy(
            rows_hbm.at[pl.ds(c * CH, CH), :],
            chunk.at[pl.ds(buf * CH, CH), :],
            chunk_sems.at[buf])

    @pl.when(t == 0)
    def _():
        state[0] = -1
        state[1] = blk
        state[2] = -1
        state[3] = 0
        acc[:] = jnp.full_like(acc, ident)

    def flush(b):
        cp = pltpu.make_async_copy(
            acc, out_hbm.at[pl.ds(b * NB, NB), :], flush_sem)
        cp.start()
        cp.wait()

    @pl.when((t > 0) & (blk != state[1]))
    def _():
        flush(state[1])
        acc[:] = jnp.full_like(acc, ident)
        state[1] = blk

    def body(e, _):
        s = src_ref[e]
        c = s // CH

        @pl.when(c != state[0])
        def _():
            pf = state[2]

            # retire any in-flight prefetch (it owns buffer 1 - cur)
            @pl.when(pf >= 0)
            def _():
                chunk_copy(pf, 1 - state[3]).wait()

            # prefetch hit: just switch buffers; miss: synchronous load
            @pl.when(pf == c)
            def _():
                state[3] = 1 - state[3]

            @pl.when(pf != c)
            def _():
                cp = chunk_copy(c, state[3])
                cp.start()
                cp.wait()

            state[0] = c
            nxt = jnp.minimum(c + 1, max_chunk)
            chunk_copy(nxt, 1 - state[3]).start()
            state[2] = nxt

        off = s - c * CH + state[3] * CH
        d = dstl_ref[e]
        acc[pl.ds(d, 1), :] = combine(acc[pl.ds(d, 1), :],
                                      chunk[pl.ds(off, 1), :])
        return 0

    jax.lax.fori_loop(0, TE, body, 0)

    @pl.when(t == num_tiles - 1)
    def _():
        @pl.when(state[2] >= 0)
        def _():
            chunk_copy(state[2], 1 - state[3]).wait()
        state[2] = -1
        flush(state[1])


def _block_prop(rows: jnp.ndarray, src: jnp.ndarray, dstl: jnp.ndarray,
                tile_blk: jnp.ndarray, num_blocks: int, *,
                is_min: bool) -> jnp.ndarray:
    """rows: [n_pad_rows, W] (n_pad_rows multiple of CH, identity chunk at
    the end); edge arrays TE-tiled; returns [num_blocks * NB, W]."""
    n_rows, width = rows.shape
    assert n_rows % CH == 0
    e_pad = src.shape[0]
    assert e_pad % TE == 0
    num_tiles = e_pad // TE
    ident = np.iinfo(np.int32).max if is_min else 0

    kernel = functools.partial(_block_prop_kernel, is_min=is_min,
                               width=width, num_tiles=num_tiles,
                               max_chunk=n_rows // CH - 1, ident=ident)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((TE,), lambda i, blk: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TE,), lambda i, blk: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((NB, width), rows.dtype),
            pltpu.VMEM((2 * CH, width), rows.dtype),
            pltpu.SMEM((4,), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_blocks * NB, width), rows.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_blk, src, dstl, rows)


# ------------------------------------------------------------- host layout --

def prepare_block_edges(edge_index: np.ndarray, num_nodes: int
                        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Sort edges (+self-loops) by (dst_block, src), pad per block to TE.

    Pad edges gather the identity chunk (src sentinel fixed up by
    ``fix_pad_src``) and write it into row 0 of the block — a no-op under
    min/max with the identity value.
    """
    loops = np.arange(num_nodes, dtype=np.int32)
    src = np.concatenate([edge_index[0].astype(np.int32), loops])
    dst = np.concatenate([edge_index[1].astype(np.int32), loops])
    blk = dst // NB
    order = np.lexsort((src, blk))
    src, dst, blk = src[order], dst[order], blk[order]
    num_blocks = int(np.ceil(num_nodes / NB))

    out_src, out_dstl, out_blk = [], [], []
    for b in range(num_blocks):
        sel = blk == b
        s = src[sel]
        d = dst[sel] - b * NB
        pad = (-len(s)) % TE
        if len(s) + pad == 0:
            pad = TE
        out_src.append(np.concatenate([s, np.full(pad, -1, np.int32)]))
        out_dstl.append(np.concatenate([d, np.zeros(pad, np.int32)]))
        out_blk.append(np.full((len(s) + pad) // TE, b, np.int32))
    src_t = np.concatenate(out_src)
    dstl_t = np.concatenate(out_dstl)
    blk_t = np.concatenate(out_blk)
    return src_t, dstl_t, blk_t, num_blocks


def _pad_rows(x: jnp.ndarray, ident) -> jnp.ndarray:
    """Pad row count to a CH multiple + one identity chunk for pad edges."""
    n = x.shape[0]
    n_pad = ((n + CH - 1) // CH) * CH + CH  # extra identity chunk at the end
    pad = jnp.full((n_pad - n, x.shape[1]), ident, dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def fix_pad_src(src_t: np.ndarray, num_nodes: int) -> np.ndarray:
    """Point pad edges (src == -1) at the identity chunk."""
    ident_row = ((num_nodes + CH - 1) // CH) * CH
    out = src_t.copy()
    out[out < 0] = ident_row
    return out


# ------------------------------------------------------------- public API --

class BlockPropPlan:
    """Host-prepared layout for repeated propagation over one graph."""

    def __init__(self, edge_index: np.ndarray, num_nodes: int):
        src_t, dstl_t, blk_t, nb = prepare_block_edges(edge_index, num_nodes)
        self.src = jnp.asarray(fix_pad_src(src_t, num_nodes))
        self.dstl = jnp.asarray(dstl_t)
        self.blk = jnp.asarray(blk_t)
        self.num_blocks = nb
        self.num_nodes = num_nodes
        self.num_edges = edge_index.shape[1]

    def propagate_minhash(self, mh: jnp.ndarray) -> jnp.ndarray:
        """Closed-neighbourhood elementwise min over uint32 lanes."""
        biased = jax.lax.bitcast_convert_type(mh ^ _SIGN, jnp.int32)
        rows = _pad_rows(biased, np.iinfo(np.int32).max)
        out = _block_prop(rows, self.src, self.dstl, self.blk,
                          self.num_blocks, is_min=True)[: self.num_nodes]
        return jax.lax.bitcast_convert_type(out, jnp.uint32) ^ _SIGN

    def propagate_hll(self, hll: jnp.ndarray) -> jnp.ndarray:
        """Closed-neighbourhood elementwise max over int8 registers."""
        wide = hll.astype(jnp.int32)
        rows = _pad_rows(wide, 0)
        out = _block_prop(rows, self.src, self.dstl, self.blk,
                          self.num_blocks, is_min=False)[: self.num_nodes]
        return out.astype(jnp.int8)
