"""Microbenchmark: the per-row async-DMA gather rate a Mosaic kernel can
sustain, vs XLA's gather unit (round-5 verdict item 8).

The one remaining hop residual is the fused slot-axis reduce; the proposed
fix was a block-granular fused gather+slot-reduce kernel.  Any such kernel
must materialise arbitrary (non-contiguous) node rows in VMEM — a sub-run's
16 slots point at arbitrary rows, so "block DMA" degenerates to per-row
DMAs issued by the scalar core.  This kernel measures EXACTLY that
primitive at its best case: indices in SMEM (per-block BlockSpec), a
DMA_DEPTH-deep pipeline of single-row copies, no reduce, no scalar VMEM
reads — just copy throughput.  Compare against the XLA gather on the same
table (bench.py: ~441M rows/s for 512B rows).

Result (recorded in studies/README.md): the scalar-issued DMA pipeline
tops out at an issue-rate-bound rows/s far below the gather unit, so a
fused Mosaic gather+reduce kernel cannot beat the shipping
XLA-gather + Pallas-merge split.  Run: python studies/pallas_dma_gather_rate.py
"""
import functools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 2048       # indices per grid step (SMEM block)
DMA_DEPTH = 8      # outstanding row copies
W = 128            # u32 lanes per row (the minhash row: one 512B tile line)


def _kernel(idx_ref, rows_hbm, out_ref, buf, sems):
    """One grid step: gather BLOCK arbitrary rows via pipelined per-row
    DMAs, accumulate an elementwise min into out (cheap, keeps the copies
    live), leave the result in out_ref."""
    def issue(i, slot):
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(idx_ref[i], 1), :],
            buf.at[pl.ds(slot, 1), :],
            sems.at[slot]).start()

    def wait(slot):
        pltpu.make_async_copy(
            buf.at[pl.ds(slot, 1), :], buf.at[pl.ds(slot, 1), :],
            sems.at[slot]).wait()

    for d in range(DMA_DEPTH):
        issue(d, d)

    def body(i, acc):
        slot = jax.lax.rem(i, DMA_DEPTH)
        wait(slot)
        v = buf[pl.ds(slot, 1), :]
        nxt = i + DMA_DEPTH
        @pl.when(nxt < BLOCK)
        def _():
            issue(nxt, slot)
        return jnp.minimum(acc, v)

    acc = jnp.full((1, W), 2**31 - 1, jnp.int32)
    acc = jax.lax.fori_loop(0, BLOCK, body, acc)
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("n_blocks",))
def dma_gather(rows, idx, n_blocks):
    kernel = _kernel
    return pl.pallas_call(
        kernel,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((BLOCK,), lambda c: (c,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, W), lambda c: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, W), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((DMA_DEPTH, W), jnp.int32),
            pltpu.SemaphoreType.DMA((DMA_DEPTH,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(idx, rows)


def main():
    print(f"dev={jax.devices()[0].platform}", flush=True)
    N = 200_000
    S = 1 << 20                      # 1M gathered rows
    rng = np.random.default_rng(0)
    rows = jnp.asarray(
        rng.integers(0, 2**31 - 1, (N, W)).astype(np.int32))
    idx = jnp.asarray(rng.integers(0, N, S, dtype=np.int32))
    jax.block_until_ready((rows, idx))
    n_blocks = S // BLOCK

    trivial = jax.jit(lambda a: a.reshape(-1)[0].astype(jnp.float32))

    @jax.jit
    def xla_gather(rows, idx):
        return rows[idx].min(axis=0)

    def timed(fn, *args):
        for _ in range(2):
            jax.block_until_ready(fn(*args))
        ts, t0s = [], []
        for _ in range(5):
            t0 = time.perf_counter()
            float(trivial(args[0]))
            t0s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            r = fn(*args)
            float(np.asarray(r).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return max(min(ts) - min(t0s), 1e-9)

    t_dma = timed(dma_gather, rows, idx, n_blocks)
    t_xla = timed(xla_gather, rows, idx)
    print(f"per-row DMA pipeline: {S/t_dma/1e6:7.1f}M rows/s "
          f"({t_dma*1e3:.1f}ms for {S/1e6:.1f}M rows)", flush=True)
    print(f"XLA gather (+min):    {S/t_xla/1e6:7.1f}M rows/s "
          f"({t_xla*1e3:.1f}ms)", flush=True)
    print(f"ratio (XLA/DMA): {t_dma/t_xla:.1f}x", flush=True)


if __name__ == "__main__":
    main()
