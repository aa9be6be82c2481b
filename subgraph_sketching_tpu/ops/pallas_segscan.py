"""Pallas sorted-segment min/max/sum for the padded-tree plan's merge step.

The one-shot plan's hop is gather -> slot-axis tree reduce -> sorted
segment min/max over the [S, W] sub-run results.  XLA lowers the segment
step (``jax.ops.segment_min/max`` with ``indices_are_sorted=True``) to a
sorted scatter that measures ~7.5ms at the bench shape (S=286k, W=128 u32
+ W=256 i8) — ~7x its HBM floor at the chip's own measured stream
bandwidth (bench.py decomposition, round 4).  The scatter is the wrong
primitive: the segment ids are non-decreasing, so segments are CONTIGUOUS
runs and the whole reduction is a streaming pass.

This kernel computes, in one sequential-grid sweep with a cross-block
carry (standard Pallas TPU accumulation pattern — grid steps execute in
order and scratch persists):

  totals[i] = op(v[j] for all j <= i in the same run)   (forward
              segmented inclusive scan; the LAST slot of each run holds
              the run's total)

via a log-depth shift/compare/select ladder in VMEM.  The ladder is the
Hillis-Steele segmented scan: at distance d, slot i folds in slot i-d iff
both belong to the same run — correct for ANY associative combine
(including non-idempotent "add": after step k slot i holds the reduction
of the up-to-2^k slots ending at i, clipped at its run start, so adjacent
windows never overlap).  ``depth`` only needs to cover the longest run
(max sub-runs per destination), which the plan knows statically — 2-3
steps at typical shapes instead of log2(block).  The caller then gathers
the per-run totals at the host-precomputed last-slot positions (an XLA
gather — fast, N rows) and (for min/max) folds in the node's own row.
Total HBM traffic: read v + write totals + gather N rows, ~1ms at bench
shape vs 7.5ms for the scatter.

Dtypes: uint32 rides biased as int32 (Mosaic has no unsigned vector
min; x ^ 0x80000000 is an order isomorphism — studies/README.md round-1
workaround), int8 widens to int32 inside VMEM (HBM traffic stays int8),
float32 "add" runs natively (the SpMM merge; equal to the XLA sorted
scatter up to float associativity — the ladder sums each run as a
balanced tree, the scatter sequentially — exact on integer data).

Reference context: this is the merge step of the scatter-max hash
propagation hot loop (reference src/hashing.py:160-162) and of the SpMM
used by GCN/SIGN (reference src/models/elph.py:136-146); the plan itself
is documented in ops/segment_scan.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# sub-runs per grid block: VMEM holds the [PC, W] block (i32-widened) plus
# a shifted copy and the pipelined in/out buffers — 2048 keeps the widest
# shipped row (W=256 i32 after widening) around 2MB/buffer
PC = 2048

_COMBINE = {"min": jnp.minimum, "max": jnp.maximum, "add": jnp.add}


def _kernel(v_ref, rid_ref, out_ref, cv_ref, cr_ref, *, op, depth_steps,
            ident, widen):
    """One grid step: forward segmented scan of a [PC, W] block.

    cv_ref [8, W] (row 0 live) / cr_ref [1, 1]: the carry — the running
    reduction and run id of the last slot seen, folded into the next
    block's leading run (runs may straddle any number of blocks)."""
    c = pl.program_id(0)
    combine = _COMBINE[op]

    @pl.when(c == 0)
    def _():
        cr_ref[0, 0] = jnp.int32(-1)          # matches no real run id (>= 0)
        cv_ref[:] = jnp.full_like(cv_ref, ident)

    v = v_ref[:]
    if widen:
        v = v.astype(jnp.int32)
    rid = rid_ref[:]                           # [PC, 1] int32
    pc = v.shape[0]
    d = 1
    for _ in range(depth_steps):
        # shift rows down by d; rows shifted in from above belong to no run
        vs = jnp.concatenate(
            [jnp.full((d,) + v.shape[1:], ident, v.dtype), v[:pc - d]],
            axis=0)
        rs = jnp.concatenate(
            [jnp.full((d, 1), -1, jnp.int32), rid[:pc - d]], axis=0)
        v = jnp.where(rs == rid, combine(v, vs), v)
        d *= 2
    # fold the cross-block carry into this block's leading run
    v = jnp.where(rid == cr_ref[0, 0], combine(v, cv_ref[0:1, :]), v)
    cv_ref[0:1, :] = v[pc - 1:pc, :]
    cr_ref[0, 0] = rid[pc - 1, 0]
    out_ref[:] = v.astype(out_ref.dtype) if widen else v


@functools.partial(jax.jit, static_argnames=("op", "depth_steps", "ident",
                                             "widen", "interpret"))
def _segscan_totals(v, rid2d, *, op, depth_steps, ident, widen, interpret):
    """Per-slot segmented inclusive-scan totals of ``v`` ([S, W]) over the
    non-decreasing run ids ``rid2d`` ([S, 1] int32)."""
    S, W = v.shape
    C = pl.cdiv(S, PC)
    kernel = functools.partial(_kernel, op=op, depth_steps=depth_steps,
                               ident=ident, widen=widen)
    return pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((PC, W), lambda c: (c, 0)),
            pl.BlockSpec((PC, 1), lambda c: (c, 0)),
        ],
        out_specs=pl.BlockSpec((PC, W), lambda c: (c, 0)),
        out_shape=jax.ShapeDtypeStruct((S, W), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, W), jnp.int32 if widen else v.dtype),
            pltpu.SMEM((1, 1), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),  # carry: strictly in order
        interpret=interpret,
    )(v, rid2d)


def segment_aggregates(v, op, rid2d, last_idx, empty, depth_steps,
                       interpret=False):
    """Per-segment aggregates of ``v`` over sorted contiguous runs.

    Returns ``out[k] = op(v[j] for slots j in run k)``, with the op's
    identity at segments that own no slot, via the forward segmented scan
    + a boundary gather at each segment's last-slot position.  This is the
    shared core: the one-shot merge (:func:`sorted_segment_combine`) adds
    the closed-neighbourhood fold-in on top; the chunked plan calls this
    per chunk and combines windows itself (ops/segment_scan.py
    ChunkedSegmentPlan.reduce).

    v: [S, W] sub-run results (uint32 "min", int8/int32 "max",
       float32 "add").
    rid2d: [S, 1] int32 non-decreasing run ids.
    last_idx: [K] int32 position of each segment's LAST slot (clamped to 0
        where the segment has none); empty: [K] bool marks those segments.
    depth_steps: static scan depth, >= ceil(log2(longest run)).
    """
    if op == "min":
        # unsigned min via the sign-bit bias (order isomorphism on u32)
        bias = jnp.uint32(0x80000000)
        vb = jax.lax.bitcast_convert_type(v ^ bias, jnp.int32)
        totals = _segscan_totals(vb, rid2d, op=op, depth_steps=depth_steps,
                                 ident=np.int32(2**31 - 1), widen=False,
                                 interpret=interpret)
        agg = jax.lax.bitcast_convert_type(
            totals[last_idx], jnp.uint32) ^ bias
        return jnp.where(empty[:, None], jnp.uint32(0xFFFFFFFF), agg)
    if op == "max":
        totals = _segscan_totals(v, rid2d, op=op, depth_steps=depth_steps,
                                 ident=np.int32(np.iinfo(v.dtype).min),
                                 widen=(v.dtype == jnp.int8),
                                 interpret=interpret)
        return jnp.where(empty[:, None],
                         jnp.asarray(np.iinfo(np.dtype(v.dtype)).min,
                                     v.dtype),
                         totals[last_idx])
    if op == "add":
        totals = _segscan_totals(v, rid2d, op=op, depth_steps=depth_steps,
                                 ident=np.float32(0), widen=False,
                                 interpret=interpret)
        return jnp.where(empty[:, None], jnp.zeros((), v.dtype),
                         totals[last_idx])
    raise ValueError(f"unsupported op for the pallas segment path: {op}")


def sorted_segment_combine(v, x, op, rid2d, last_idx, empty, depth_steps,
                           interpret=False):
    """combine(x, segment_op(v over sorted runs)) — the one-shot plan's
    merge step.

    min/max: closed neighbourhood — the node's own row ``x`` is folded in
    (which also absorbs the identity at empty segments).  add: SpMM
    semantics — no fold-in, empty segments yield 0.
    """
    agg = segment_aggregates(v, op, rid2d, last_idx, empty, depth_steps,
                             interpret=interpret)
    if op == "add":
        return agg
    combine = _COMBINE[op]
    return jnp.where(empty[:, None], x, combine(x, agg))


def supported(op: str, dtype) -> bool:
    """The pallas merge path covers the three shipped plan reductions
    (uint32 min, int8/int32 max, float32 add); everything else stays on
    XLA."""
    dt = np.dtype(dtype)
    return ((op == "min" and dt == np.uint32)
            or (op == "max" and dt in (np.int8, np.int32))
            or (op == "add" and dt == np.float32))
