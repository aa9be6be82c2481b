"""Padded-tree segmented min/max/sum for static graphs (pure XLA).

XLA's scatter-min/max on TPU serialises updates, making the naive
``segment_min(x[src], dst)`` path scatter-bound (~15M rows/s measured; the
reference's equivalent hot loop is PyG scatter-max, src/hashing.py:160-162).
The graph is static, so the whole reduction schedule is known at trace time:

  1. host: split each destination's in-edge list into sub-runs of SUB_LEN
     slots, padding the tail of each sub-run with a sentinel that points at
     an identity row appended to the node table
  2. device: one big static gather rows[slot_idx] -> [S, SUB_LEN, W], then a
     dense log2(SUB_LEN)-step tree reduction along the slot axis — pure
     elementwise ops XLA fuses, no masks, no data-dependent control flow
  3. a scatter over only S ≈ E/SUB_LEN sub-run results merges duplicates

Used for minhash (min, uint32), HLL (max, int8) and weighted SpMM
(add, float32).  ~6x faster than the scatter path at ogbl scale.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

SUB_LEN = 8   # slots per sub-run (power of two).  L=16 won every sweep
              # while the merge was an XLA scatter whose cost grew with
              # the sub-run count; the Pallas scan merge (round 4) made
              # sub-runs nearly free, so the trade tipped to the slot
              # padding side — on a Poisson-16 graph L=8 gathers 3.89M
              # slots vs L=16's 4.58M.  Round-5 interleaved sweep under
              # the scan merge (tools/probe_sublen3.py, net of adjacent
              # trivials): L=8 hop 29.4ms / L=16 31.2ms / L=12 44.9ms
              # (non-tile-aligned sublanes lose badly); SpMM d=128
              # 10.8 vs 11.4ms.  History: tools/probe_sublen{,2}.py

_PLAN_LIB = None
_PLAN_TRIED = False


def _plan_lib():
    """Native (C++) plan builder — counting sort instead of the numpy
    argsort/gather/scatter chain (86s -> ~2s at citation2 scale).  Falls
    back to numpy when no toolchain is available."""
    global _PLAN_LIB, _PLAN_TRIED
    if _PLAN_TRIED:
        return _PLAN_LIB
    _PLAN_TRIED = True
    try:
        import ctypes
        import os
        import sys
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        sys.path.insert(0, os.path.join(root, "tools"))
        from build_native import build_plan
        lib = ctypes.CDLL(build_plan(verbose=False))
        lib.plan_phase1.restype = ctypes.c_int64
        lib.plan_phase2.restype = ctypes.c_int
        lib.plan_slot_edge.restype = ctypes.c_int
        _PLAN_LIB = lib
    except Exception:
        _PLAN_LIB = None
    return _PLAN_LIB


def _i32p(a):
    import ctypes
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64p(a):
    import ctypes
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _native_plan_tables(src: np.ndarray, dst: np.ndarray, num_nodes: int,
                        sub_len: int):
    """(order, gather_idx, sub_dst, run_starts, sub_starts) via the C++
    builder, or None.  Bit-identical placement to the numpy construction
    (stable counting sort); the prefix sums feed the lazy _slot_edge
    table."""
    lib = _plan_lib()
    if lib is None:
        return None
    import ctypes
    e = len(src)
    run_starts = np.empty(num_nodes + 1, dtype=np.int64)
    sub_starts = np.empty(num_nodes + 1, dtype=np.int64)
    S = lib.plan_phase1(_i32p(dst), ctypes.c_int64(e),
                        ctypes.c_int32(num_nodes), ctypes.c_int32(sub_len),
                        _i64p(run_starts), _i64p(sub_starts))
    if S < 0:
        return None
    order = np.empty(e, dtype=np.int32)
    gather_idx = np.empty(S * sub_len, dtype=np.int32)
    sub_dst = np.empty(S, dtype=np.int32)
    rc = lib.plan_phase2(_i32p(src), _i32p(dst), ctypes.c_int64(e),
                         ctypes.c_int32(num_nodes), ctypes.c_int32(sub_len),
                         _i64p(run_starts), _i64p(sub_starts),
                         ctypes.c_int64(S), _i32p(order),
                         _i32p(gather_idx), _i32p(sub_dst))
    if rc != 0:
        return None
    return order, gather_idx, sub_dst, run_starts, sub_starts


def _pallas_path_ok(op: str, v) -> bool:
    """Shared merge-path gate: the Pallas segmented scan runs on TPU for
    the supported (op, dtype) pairs, or anywhere in interpret mode when
    SST_FORCE_PALLAS_INTERPRET is set (tests exercise the exact production
    trace on the CPU mesh that way)."""
    import os
    if os.environ.get("SST_DISABLE_PALLAS_SEGSCAN"):
        return False
    if _platform_of(v) != "tpu" and \
            not os.environ.get("SST_FORCE_PALLAS_INTERPRET"):
        return False
    from subgraph_sketching_tpu.ops import pallas_segscan as pss
    return pss.supported(op, v.dtype)


def _pallas_interpret() -> bool:
    import os
    return bool(os.environ.get("SST_FORCE_PALLAS_INTERPRET"))


def _platform_of(v) -> str:
    """Platform the computation will run on: a concrete array's committed
    device wins (arrays device_put to CPU on a TPU host must not select the
    Mosaic kernel); tracers fall back to the process default backend."""
    if not isinstance(v, jax.core.Tracer):
        try:
            devs = list(v.devices())
            if devs:
                return devs[0].platform
        except Exception:
            pass
    return jax.default_backend()


def _identity_for(op: str, dtype) -> np.generic:
    if op == "min":
        return np.iinfo(dtype).max if np.issubdtype(dtype, np.integer) \
            else np.array(np.inf, dtype)
    if op == "max":
        return np.iinfo(dtype).min if np.issubdtype(dtype, np.integer) \
            else np.array(-np.inf, dtype)
    return np.zeros((), dtype)


class SortedSegmentPlan:
    """Host-precomputed static reduction schedule for one edge list."""

    def __init__(self, edge_index: np.ndarray, num_nodes: int,
                 sub_len: int = SUB_LEN):
        self.num_segments = num_nodes
        self.sub_len = sub_len
        src = np.ascontiguousarray(edge_index[0], dtype=np.int32)
        dst = np.ascontiguousarray(edge_index[1], dtype=np.int32)
        e = len(src)
        if e == 0:
            # fully initialise the degenerate plan: staging/table accessors
            # (stage_edge_data, gather_idx, PlanSpmm.tables) must work on a
            # zero-edge split, not AttributeError
            self.num_subruns = 0
            self.order = np.zeros(0, dtype=np.int64)
            self._gather_idx_np = np.zeros(0, dtype=np.int32)
            self._gather_idx_dev = None
            self._slot_edge_cache = np.zeros(0, dtype=np.int64)
            self._prefix = None
            self._sub_dst_np = np.zeros(0, dtype=np.int32)
            self._sub_dst_dev = None
            return
        native = _native_plan_tables(src, dst, num_nodes, sub_len)
        if native is not None:
            self.order, gather_idx, sub_dst, run_starts, sub_starts = native
            self.num_subruns = len(sub_dst)
            self._gather_idx_np = gather_idx
            self._gather_idx_dev = None
            self._slot_edge_cache = None  # built lazily from prefix sums
            self._prefix = (run_starts, sub_starts)
            self._sub_dst_np = sub_dst
            self._sub_dst_dev = None
            return
        order = np.argsort(dst, kind="stable").astype(np.int64)
        self.order = order
        src, dst = src[order], dst[order]
        # Slot index of edge i (dst-sorted): with pos = i - run_starts[dst]
        # the slot is sub_starts[dst]*L + pos, so one fused gather of
        # (sub_starts*L - run_starts) replaces the pos / sub_id / slot
        # chain (each a separate 30M-element gather at citation2 scale —
        # this constructor was 245s of single-thread numpy before)
        counts = np.bincount(dst, minlength=num_nodes)
        run_starts = np.zeros(num_nodes + 1, dtype=np.int64)
        np.cumsum(counts, out=run_starts[1:])
        subruns_per_node = (counts + sub_len - 1) // sub_len
        sub_starts = np.zeros(num_nodes + 1, dtype=np.int64)
        np.cumsum(subruns_per_node, out=sub_starts[1:])
        offset = sub_starts[:-1] * sub_len - run_starts[:-1]   # per node
        slot_idx = np.arange(e, dtype=np.int64) + offset[dst]  # per edge
        sub_id = slot_idx >> int(np.log2(sub_len)) if \
            (sub_len & (sub_len - 1)) == 0 else slot_idx // sub_len
        S = int(sub_starts[-1])
        self.num_subruns = S
        # slot table: sentinel = row num_nodes (identity row).  Kept as host
        # numpy and placed on device lazily (properties below): chunk()
        # rereads these tables, and an eager upload would round-trip
        # hundreds of MB through the TPU relay (~220s at citation2 scale,
        # measured) for arrays the chunked path never uses on device
        gather_idx = np.full(S * sub_len, num_nodes, dtype=np.int32)
        gather_idx[slot_idx] = src
        self._gather_idx_np = gather_idx
        self._gather_idx_dev: Optional[jnp.ndarray] = None
        # slot -> original edge index (sentinel e -> zero weight), so edge
        # data reaches its slot host-side (stage_edge_data), never via a
        # device-side 1D gather (pathologically scalar on TPU)
        se = np.full(S * sub_len, e, dtype=np.int64)
        se[slot_idx] = order
        self._slot_edge_cache = se
        self._prefix = None
        sub_dst = np.zeros(S, dtype=np.int32)
        sub_dst[sub_id] = dst
        self._sub_dst_np = sub_dst
        self._sub_dst_dev: Optional[jnp.ndarray] = None

    @property
    def gather_idx(self) -> jnp.ndarray:
        if self._gather_idx_dev is None:
            arr = jnp.asarray(self._gather_idx_np)
            if isinstance(arr, jax.core.Tracer):
                # first touch is inside a jit trace: hand back the traced
                # constant but do NOT cache it — a cached tracer would
                # poison every later use of this plan (UnexpectedTracer)
                return arr
            self._gather_idx_dev = arr
        return self._gather_idx_dev

    @property
    def sub_dst(self) -> jnp.ndarray:
        if self._sub_dst_dev is None:
            arr = jnp.asarray(self._sub_dst_np)
            if isinstance(arr, jax.core.Tracer):
                return arr
            self._sub_dst_dev = arr
        return self._sub_dst_dev

    @property
    def _slot_edge(self) -> np.ndarray:
        # slot -> original edge id; only the SpMM staging path needs this
        # table, so the native plan defers it (saves ~25% of build time and
        # S*L*4 bytes for sketch-only plans)
        if self._slot_edge_cache is None:
            import ctypes
            e = len(self.order)
            run_starts, sub_starts = self._prefix
            out = np.empty(self.num_subruns * self.sub_len, dtype=np.int32)
            _plan_lib().plan_slot_edge(
                _i32p(self.order), _i64p(run_starts), _i64p(sub_starts),
                ctypes.c_int32(self.num_segments),
                ctypes.c_int32(self.sub_len), ctypes.c_int64(e), _i32p(out))
            self._slot_edge_cache = out
        return self._slot_edge_cache

    def stage_edge_data(self, edge_data: np.ndarray) -> jnp.ndarray:
        """Permute per-edge data (original edge order) into slot order on
        host.  Do this ONCE per weight set and pass the result to reduce."""
        wz = np.concatenate([np.asarray(edge_data),
                             np.zeros(1, dtype=np.asarray(edge_data).dtype)])
        return jnp.asarray(wz[self._slot_edge])

    def reduce(self, x: jnp.ndarray, op: str,
               edge_data_slots: Optional[jnp.ndarray] = None,
               tables: Optional[tuple] = None) -> jnp.ndarray:
        """min/max: out[v] = op(x[v], in-neighbour rows) — closed
        neighbourhood, matching sketch propagation (self always included).
        add: out[v] = sum over in-edges of w_e * x[src_e] (SpMM; self NOT
        included — put self-loops in the edge list).
        ``edge_data_slots`` comes from ``stage_edge_data``.
        ``tables`` optionally supplies (gather_idx, sub_dst, last_idx,
        empty) — i.e. ``self.reduce_tables`` — as traced jit ARGUMENTS: at
        scale the implicit device tables become executable constants that
        overflow the remote compiler (HTTP 413).  A legacy 2-tuple
        (gather_idx, sub_dst) is accepted; it keeps the XLA merge (the
        Pallas merge needs the boundary tables).
        """
        if self.num_subruns == 0:
            return x if op != "add" else jnp.zeros_like(x)
        gidx = tables[0] if tables is not None else self.gather_idx
        ident = _identity_for(op, np.dtype(x.dtype))
        rows = jnp.concatenate(
            [x, jnp.full((1,) + x.shape[1:], ident, dtype=x.dtype)], axis=0)
        v = rows[gidx]                                  # [S * L, W]
        if edge_data_slots is not None:
            w = edge_data_slots
            v = v * w.reshape((-1,) + (1,) * (v.ndim - 1)).astype(v.dtype)
        v = v.reshape((self.num_subruns, self.sub_len) + x.shape[1:])
        # single reduce over the slot axis: XLA fuses it with the gather
        # producer (measured 12% faster than an explicit binary slice-tree,
        # which materialises every level)
        red = {"min": jnp.min, "max": jnp.max, "add": jnp.sum}[op]
        v = red(v, axis=1)                              # [S, W]
        return self.merge_subruns(v, x, op, tables=tables)

    def merge_subruns(self, v: jnp.ndarray, x: jnp.ndarray, op: str,
                      tables: Optional[tuple] = None) -> jnp.ndarray:
        """The merge step of :meth:`reduce`: segment-op the [S, W] sub-run
        results over ``sub_dst`` and (for min/max) fold in the node's own
        row.  Exposed so decomposition benchmarks time the SAME path the
        production hop runs.

        On TPU the merge runs a Pallas forward segmented scan + boundary
        gather instead of XLA's sorted scatter — 5.5x faster at the bench
        shape (0.8ms vs 4.4ms; 1.12x the whole hop,
        tools/probe_pallas_segscan.py), bit-exact for min/max (idempotent
        ops are order-free; "add" matches to float associativity — the
        ladder sums each run as a balanced tree, the scatter sequentially).
        CPU (and any unsupported dtype/op, or
        SST_DISABLE_PALLAS_SEGSCAN=1) keeps the XLA path, as does a legacy
        2-tuple ``tables`` (no boundary tables to ride through jit)."""
        combine = {"min": jnp.minimum, "max": jnp.maximum, "add": jnp.add}[op]
        if self._pallas_merge_ok(op, v) and \
                (tables is None or len(tables) >= 4):
            from subgraph_sketching_tpu.ops import pallas_segscan as pss
            if tables is not None:
                sdst, last_idx, empty = tables[1], tables[2], tables[3]
                rid2d = sdst[:, None].astype(jnp.int32)
            else:
                rid2d, last_idx, empty = self._pallas_tables()
            return pss.sorted_segment_combine(
                v, x, op, rid2d, last_idx, empty, self._seg_depth,
                interpret=_pallas_interpret())
        sdst = tables[1] if tables is not None else self.sub_dst
        seg = {"min": jax.ops.segment_min, "max": jax.ops.segment_max,
               "add": jax.ops.segment_sum}[op]
        # sub_dst is non-decreasing by construction (the slot table is
        # dst-sorted); telling XLA makes the scatter a sorted-segment
        # reduction — measured 16% off the whole hop on v5e
        # (tools/probe_sorted_seg.py: 39.6 -> 34.0 ms at 3.2M edges)
        agg = seg(v, sdst, num_segments=self.num_segments,
                  indices_are_sorted=True)
        if op == "add":
            return agg
        # empty segments hold the dtype identity extremum; combining with the
        # node's own row (closed neighbourhood) absorbs them
        return combine(x, agg)

    def _pallas_merge_ok(self, op: str, v) -> bool:
        if self.num_subruns == 0:
            return False
        return _pallas_path_ok(op, v)

    @property
    def _seg_depth(self) -> int:
        """Static scan depth for the Pallas merge: covers the longest run
        (max sub-runs per destination), capped at log2(block) — runs longer
        than one block chain through the cross-block carry."""
        if getattr(self, "_seg_depth_cache", None) is None:
            from subgraph_sketching_tpu.ops.pallas_segscan import PC
            if self._prefix is not None:                 # native plan build
                max_run = int(np.diff(self._prefix[1]).max())
            else:
                sd = self._sub_dst_np
                max_run = int(np.bincount(
                    sd, minlength=self.num_segments).max()) if len(sd) else 1
            depth = max(1, int(np.ceil(np.log2(max(1, max_run)))))
            self._seg_depth_cache = min(depth, int(np.log2(PC)))
        return self._seg_depth_cache

    def _pallas_tables(self) -> tuple:
        """(rid2d [S,1] i32, last_idx [N] i32, empty [N] bool) device
        arrays for the Pallas merge — lazy like the other plan tables."""
        if getattr(self, "_pallas_tables_dev", None) is None:
            sd = self._sub_dst_np
            n = self.num_segments
            last = np.searchsorted(sd, np.arange(n), "right") - 1
            first = np.searchsorted(sd, np.arange(n), "left")
            empty = first > last
            dev = (jnp.asarray(sd[:, None].astype(np.int32)),
                   jnp.asarray(np.where(empty, 0, last).astype(np.int32)),
                   jnp.asarray(empty))
            if any(isinstance(a, jax.core.Tracer) for a in dev):
                return dev  # inside a jit trace: never cache tracers
            self._pallas_tables_dev = dev
        return self._pallas_tables_dev


    @property
    def reduce_tables(self) -> tuple:
        """(gather_idx, sub_dst, last_idx, empty) device arrays — pass this
        tuple to :meth:`reduce` as the ``tables`` argument at scale so the
        tables ride through jit as ARGUMENTS (not executable constants) on
        every merge path, Pallas included."""
        _, last_idx, empty = self._pallas_tables()
        return (self.gather_idx, self.sub_dst, last_idx, empty)

    def chunk(self, max_slots: int) -> "ChunkedSegmentPlan":
        """Split the slot table into bounded-size chunks (see
        ChunkedSegmentPlan) so the gathered intermediate never exceeds
        ``max_slots`` rows — the citation2-scale memory path."""
        return ChunkedSegmentPlan(self, max_slots)

    def reduce_sketches(self, mh: jnp.ndarray, hll: jnp.ndarray
                        ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Fused minhash-min + HLL-max propagation with ONE combined gather.

        The gather is descriptor-rate-bound on TPU (~100M rows/s measured),
        so one 768B combined row per slot halves descriptors vs separate
        512B + 256B rows — but the 192-lane row pads to 256 lanes (2 vregs)
        in the tiled layout, and the measured result (29.6M e/s vs 36M for
        the two-gather path) shows the extra bandwidth costs more than the
        descriptor saving.  Kept for narrower-sketch configs where the
        combined row fits 128 lanes.  minhash min is plain jnp.minimum on
        uint32 (exact); the int8 HLL registers ride byte-packed in uint32
        lanes with a SWAR byte-max and are bitcast back after the reduction
        (layout-only).
        """
        if self.num_subruns == 0:
            return mh, hll
        n = mh.shape[0]
        P = mh.shape[1]
        m = hll.shape[1]
        assert m % 4 == 0
        hll_packed = jax.lax.bitcast_convert_type(
            hll.reshape(n, m // 4, 4), jnp.uint32)
        combined = jnp.concatenate([mh, hll_packed], axis=1)
        # identities: biased-min identity = 0xFFFFFFFF; packed-byte-max
        # identity = 0 (registers are non-negative)
        ident = jnp.concatenate([
            jnp.full((1, P), 0xFFFFFFFF, jnp.uint32),
            jnp.zeros((1, m // 4), jnp.uint32),
        ], axis=1)
        rows = jnp.concatenate([combined, ident], axis=0)
        v = rows[self.gather_idx].reshape(
            self.num_subruns, self.sub_len, P + m // 4)
        vm = v[:, :, :P]
        vh = v[:, :, P:]

        HB = jnp.uint32(0x80808080)
        LB = jnp.uint32(0x01010101)

        def byte_max(a, b):
            # SWAR per-byte max of packed uint8 lanes; valid because HLL
            # ranks are < 64, so every byte has its high bit clear and the
            # per-byte subtraction below can never borrow across bytes
            t = (a | HB) - b
            mext = ((t >> 7) & LB) * jnp.uint32(0xFF)
            return (a & mext) | (b & ~mext)

        # the halving tree needs a power-of-two slot axis; plans support any
        # sub_len, so pad the axis with reduction identities first (no-op
        # for the default power-of-two sub_len)
        L = self.sub_len
        Lp = 1 << (L - 1).bit_length()
        if Lp != L:
            S = self.num_subruns
            vm = jnp.concatenate(
                [vm, jnp.full((S, Lp - L, P), 0xFFFFFFFF, jnp.uint32)],
                axis=1)
            vh = jnp.concatenate(
                [vh, jnp.zeros((S, Lp - L, m // 4), jnp.uint32)], axis=1)
        half = Lp
        while half > 1:
            half //= 2
            vm = jnp.minimum(vm[:, :half], vm[:, half:2 * half])
            vh = byte_max(vh[:, :half], vh[:, half:2 * half])
        # unpack at sub-run granularity (8x smaller than slot granularity)
        sub_hll = jax.lax.bitcast_convert_type(vh[:, 0], jnp.int8).reshape(
            self.num_subruns, m)
        agg_m = jax.ops.segment_min(vm[:, 0], self.sub_dst, num_segments=n,
                                    indices_are_sorted=True)
        agg_h = jax.ops.segment_max(sub_hll, self.sub_dst, num_segments=n,
                                    indices_are_sorted=True)
        out_mh = jnp.minimum(mh, agg_m)
        out_hll = jnp.maximum(hll, agg_h)
        return out_mh, out_hll


class ChunkedSegmentPlan:
    """Bounded-memory execution of a SortedSegmentPlan.

    ``SortedSegmentPlan.reduce`` materialises the gathered [S*L, W]
    intermediate — ~18GB for a citation2-scale graph (36M slots x 512B
    minhash rows), which does not fit one chip's HBM.  This plan splits the
    slot table into chunks of at most ``max_slots`` slots (cut at sub-run
    boundaries) and runs a ``lax.scan`` over them: per chunk one gather +
    tree reduction + a segment reduce over the chunk's *contiguous
    destination window* (the slot table is dst-sorted), merged into the
    output with the combining op.  min/max/add are associative and (for
    min/max) idempotent, so chunk boundaries — including a destination whose
    sub-runs straddle two chunks — are exact.

    Transient memory is max_slots x W rows instead of S*L x W.
    """

    def __init__(self, base: SortedSegmentPlan, max_slots: int):
        self.base = base
        self.num_segments = base.num_segments
        L = base.sub_len
        S = base.num_subruns
        self.sub_len = L
        if S == 0:
            # fully initialise the degenerate plan (see SortedSegmentPlan)
            self.num_chunks = 0
            self.per_chunk = 0
            self.window = 1
            self._lo_np = np.zeros(0, dtype=np.int32)
            self._gather_chunks_np = np.zeros((0, 0), dtype=np.int32)
            self._sub_local_np = np.zeros((0, 0), dtype=np.int32)
            self._dev = None
            self._padded = 0
            self._slot_edge_chunks_np = np.zeros((0, 0), dtype=np.int64)
            return
        cap = max(1, max_slots // L)                # max sub-runs per chunk
        C = (S + cap - 1) // cap
        # distribute sub-runs EVENLY over the minimal chunk count instead
        # of filling chunks to the cap: cap-filling left the tail chunk
        # mostly padding (identity-row gathers) — at the bench shape 5
        # chunks of 1.15M slots for 4.58M real slots, a 1.25x slot
        # inflation that measured as exactly the chunked path's overhead
        # over the one-shot hop (tools/probe_r5_kernels.py, round 5)
        per_chunk = (S + C - 1) // C
        self.num_chunks = C
        gi = base._gather_idx_np.reshape(S, L)      # host copy, no download
        sd = base._sub_dst_np
        n = base.num_segments
        # pad sub-runs to C * per_chunk; padded rows gather the identity
        # sentinel (row n) and reduce into a dummy local segment
        padded = C * per_chunk
        gi_p = np.full((padded, L), n, dtype=np.int32)
        gi_p[:S] = gi
        lo = np.zeros(C, dtype=np.int32)
        sub_local = np.zeros((C, per_chunk), dtype=np.int32)
        for c in range(C):
            s0, s1 = c * per_chunk, min((c + 1) * per_chunk, S)
            lo[c] = sd[s0] if s0 < S else n
            sub_local[c, :s1 - s0] = sd[s0:s1] - lo[c]
        # uniform destination-window size R (+1 dummy segment for padding)
        R = 1
        for c in range(C):
            s0, s1 = c * per_chunk, min((c + 1) * per_chunk, S)
            if s1 > s0:
                R = max(R, int(sd[s1 - 1] - sd[s0]) + 1)
        for c in range(C):  # pad tails -> dummy segment R
            s0, s1 = c * per_chunk, min((c + 1) * per_chunk, S)
            sub_local[c, s1 - s0:] = R
        self.window = R
        self.per_chunk = per_chunk
        # device placement is lazy (same rationale as SortedSegmentPlan:
        # the table upload is interconnect-bound and should not be charged
        # to host plan construction)
        self._lo_np = lo
        self._gather_chunks_np = gi_p.reshape(C, per_chunk * L)
        self._sub_local_np = sub_local
        self._dev: Optional[tuple] = None
        self._padded = padded
        self._slot_edge_chunks_np: Optional[np.ndarray] = None
        self._pallas_chunk_dev: Optional[tuple] = None
        self._chunk_depth_cache: Optional[int] = None

    @property
    def _slot_edge_chunks(self) -> np.ndarray:
        # slot -> original edge id per chunk; only stage_edge_data (the SpMM
        # path) needs this ~8B/slot table, so build it on first use
        if self._slot_edge_chunks_np is None:
            base, L, S, C = (self.base, self.sub_len, self.base.num_subruns,
                             self.num_chunks)
            se = np.full((self._padded, L), len(base.order), dtype=np.int64)
            se[:S] = np.asarray(base._slot_edge).reshape(S, L)
            self._slot_edge_chunks_np = se.reshape(C, self.per_chunk * L)
        return self._slot_edge_chunks_np

    def _device_tables(self):
        if self._dev is None:
            dev = (jnp.asarray(self._gather_chunks_np),
                   jnp.asarray(self._sub_local_np),
                   jnp.asarray(self._lo_np))
            if any(isinstance(a, jax.core.Tracer) for a in dev):
                return dev  # inside a jit trace: never cache tracers
            self._dev = dev
        return self._dev

    @property
    def gather_chunks(self) -> jnp.ndarray:
        return self._device_tables()[0]

    @property
    def sub_local(self) -> jnp.ndarray:
        return self._device_tables()[1]

    @property
    def lo(self) -> jnp.ndarray:
        return self._device_tables()[2]

    def stage_edge_data(self, edge_data: np.ndarray) -> jnp.ndarray:
        wz = np.concatenate([np.asarray(edge_data),
                             np.zeros(1, dtype=np.asarray(edge_data).dtype)])
        return jnp.asarray(wz[self._slot_edge_chunks])

    def _pallas_chunk_tables(self) -> tuple:
        """(last_idx [C, R] i32, empty [C, R] bool) per-chunk boundary
        tables for the Pallas merge (position of each window segment's last
        sub-run within its chunk) — lazy like the other device tables."""
        if self._pallas_chunk_dev is None:
            C, R = self.num_chunks, self.window
            sl = self._sub_local_np
            last = np.empty((C, R), dtype=np.int32)
            empty = np.empty((C, R), dtype=bool)
            ids = np.arange(R)
            for c in range(C):
                hi = np.searchsorted(sl[c], ids, "right") - 1
                lo_ = np.searchsorted(sl[c], ids, "left")
                empty[c] = lo_ > hi
                last[c] = np.where(empty[c], 0, hi)
            dev = (jnp.asarray(last), jnp.asarray(empty))
            if any(isinstance(a, jax.core.Tracer) for a in dev):
                return dev  # inside a jit trace: never cache tracers
            self._pallas_chunk_dev = dev
        return self._pallas_chunk_dev

    @property
    def _chunk_depth(self) -> int:
        """Static scan depth for the per-chunk Pallas merge: covers the
        longest same-destination run within any single chunk, capped at
        log2(kernel block)."""
        if self._chunk_depth_cache is None:
            from subgraph_sketching_tpu.ops.pallas_segscan import PC
            max_run = 1
            for c in range(self.num_chunks):
                row = self._sub_local_np[c]
                real = row[row != self.window]  # drop pad-id runs: a
                # mostly-padded tail chunk must not inflate the depth
                if len(real):
                    counts = np.bincount(real)
                    max_run = max(max_run, int(counts.max()))
            depth = max(1, int(np.ceil(np.log2(max(1, max_run)))))
            self._chunk_depth_cache = min(depth, int(np.log2(PC)))
        return self._chunk_depth_cache

    def _pallas_merge_ok(self, op: str, x) -> bool:
        if self.num_chunks == 0:
            return False
        return _pallas_path_ok(op, x)

    def reduce(self, x: jnp.ndarray, op: str,
               edge_data_slots: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Same contract as SortedSegmentPlan.reduce (closed neighbourhood
        for min/max; weighted sum over in-edges for add).

        On TPU each chunk's merge runs the same Pallas segmented scan as
        the one-shot plan (ops/pallas_segscan.py) over the chunk's local
        window ids — the decision is made at trace time, outside the
        ``lax.scan``, and the per-chunk boundary tables ride the scan as
        inputs."""
        if self.num_chunks == 0:
            return x if op != "add" else jnp.zeros_like(x)
        combine = {"min": jnp.minimum, "max": jnp.maximum, "add": jnp.add}[op]
        seg = {"min": jax.ops.segment_min, "max": jax.ops.segment_max,
               "add": jax.ops.segment_sum}[op]
        ident = _identity_for(op, np.dtype(x.dtype))
        n = self.num_segments
        R = self.window
        use_pallas = self._pallas_merge_ok(op, x)
        rows = jnp.concatenate(
            [x, jnp.full((1,) + x.shape[1:], ident, dtype=x.dtype)], axis=0)
        # output padded so every [lo, lo+R) window is in range
        out0 = jnp.full((n + R,) + x.shape[1:], ident, dtype=x.dtype)
        if op == "add":
            out0 = out0.at[:n].set(jnp.zeros_like(x))

        def body(out, chunk):
            gidx, slocal, lo, w, boundary = chunk
            v = rows[gidx]                                  # [pc*L, W]
            if w is not None:
                v = v * w.reshape((-1,) + (1,) * (v.ndim - 1)).astype(v.dtype)
            v = v.reshape((self.per_chunk, self.sub_len) + x.shape[1:])
            red = {"min": jnp.min, "max": jnp.max, "add": jnp.sum}[op]
            vred = red(v, axis=1)                           # [pc, W]
            # sub_local is non-decreasing per chunk (dst-sorted slots; pad
            # tails get the max segment R), same sorted-merge win as the
            # one-shot plan
            if boundary is not None:
                from subgraph_sketching_tpu.ops import pallas_segscan as pss
                last_c, empty_c = boundary
                part = pss.segment_aggregates(
                    vred, op, slocal[:, None].astype(jnp.int32),
                    last_c, empty_c, self._chunk_depth,
                    interpret=_pallas_interpret())
            else:
                part = seg(vred, slocal, num_segments=R + 1,
                           indices_are_sorted=True)[:R]
            cur = jax.lax.dynamic_slice_in_dim(out, lo, R, axis=0)
            return jax.lax.dynamic_update_slice_in_dim(
                out, combine(cur, part), lo, axis=0), None

        w_chunks = edge_data_slots if edge_data_slots is not None else None
        chunks = [self.gather_chunks, self.sub_local, self.lo]
        shape = [True, True, True, w_chunks is not None, use_pallas]
        if w_chunks is not None:
            chunks.append(w_chunks)
        if use_pallas:
            chunks.append(self._pallas_chunk_tables())

        def body_adapter(out, c):
            it = iter(c)
            parts = [next(it) if present else None for present in shape]
            return body(out, tuple(parts))

        out, _ = jax.lax.scan(body_adapter, out0, tuple(chunks))
        out = out[:n]
        if op == "add":
            return out
        return combine(x, out)


def make_plan(edge_index: np.ndarray, num_nodes: int,
              sub_len: int = SUB_LEN) -> SortedSegmentPlan:
    return SortedSegmentPlan(np.asarray(edge_index), num_nodes, sub_len)


CHUNK_SUB_LEN = 16  # sub-run slots for CHUNK-STREAMED plans.  The chunked
                    # hop prefers longer sub-runs than the one-shot hop:
                    # measured at the bench shape (tools/probe_r5_kernels
                    # runs at both L), chunked L=16 = 1.00x its one-shot
                    # vs chunked L=8 = 1.24x its (faster) one-shot — the
                    # scan-sequenced chunks don't benefit from L=8's
                    # smaller slot table the way the one-shot gather does


def _estimated_slots(dst: np.ndarray, num_nodes: int, sub_len: int) -> int:
    counts = np.bincount(dst, minlength=num_nodes)
    return int(((counts + sub_len - 1) // sub_len).sum()) * sub_len


def make_auto_plan(edge_index: np.ndarray, num_nodes: int,
                   max_slots: Optional[int] = None,
                   sub_len: Optional[int] = None):
    """Plan with bounded device memory: one-shot when the slot table fits
    ``max_slots`` rows, chunk-streamed (ChunkedSegmentPlan) otherwise.

    With ``sub_len=None`` the sub-run length is chosen per form — SUB_LEN
    for one-shot plans, CHUNK_SUB_LEN when the plan will chunk — decided
    up front from a degree histogram (two bincounts, not a thrown-away
    plan build)."""
    ei = np.asarray(edge_index)
    if sub_len is None:
        sub_len = SUB_LEN
        if max_slots and len(ei[0]) and \
                _estimated_slots(np.asarray(ei[1], dtype=np.int64),
                                 num_nodes, SUB_LEN) > max_slots:
            sub_len = CHUNK_SUB_LEN
    plan = SortedSegmentPlan(ei, num_nodes, sub_len)
    if max_slots and plan.num_subruns * plan.sub_len > max_slots:
        return plan.chunk(max_slots)
    return plan


# ------------------------------------------------- differentiable SpMM --

class PlanSpmm:
    """Differentiable weighted SpMM over a static plan pair.

    Forward: ``out[v] = sum_{(u,v)} w_e x[u]`` via the padded-tree "add"
    plan; backward: ``dL/dx = A^T g`` via a second plan built on the
    transposed edge list (the gcn_norm weights are data, so no cotangent
    for them).  This replaces the scatter-serialised ``segment_sum`` SpMM
    inside jitted GCN train steps (reference SpMM call sites:
    src/datasets/elph.py:103-107, src/models/elph.py:136-146) — the plan
    reduce measured ~3.7x the XLA scatter path at d=128 on v5e.

    At scale, pass ``self.tables`` through the jit boundary as an ARGUMENT
    (``__call__(x, tables)``): the implicit device tables otherwise become
    executable constants that overflow the remote compiler (HTTP 413).
    Chunk-streamed plans are not supported here — construct via
    ``try_build``, which returns None when either direction's one-shot
    slot table would exceed ``max_slots`` (callers then keep the scatter
    SpMM).
    """

    def __init__(self, edge_index: np.ndarray, edge_weight: np.ndarray,
                 num_nodes: int, sub_len: int = SUB_LEN):
        ei = np.asarray(edge_index)
        w = np.asarray(edge_weight, dtype=np.float32)
        self.fwd = SortedSegmentPlan(ei, num_nodes, sub_len)
        self.bwd = SortedSegmentPlan(ei[::-1], num_nodes, sub_len)
        self._w_fwd = self.fwd.stage_edge_data(w)
        self._w_bwd = self.bwd.stage_edge_data(w)

    @classmethod
    def try_build(cls, edge_index: np.ndarray, edge_weight: np.ndarray,
                  num_nodes: int, max_slots: Optional[int] = None,
                  sub_len: int = SUB_LEN) -> Optional["PlanSpmm"]:
        """Build, or return None when either direction's slot table exceeds
        ``max_slots`` (the caller then stays on the scatter SpMM; a chunked
        in-step differentiable SpMM is not supported).  The slot counts are
        exact from degree histograms, so rejection costs two bincounts —
        not two thrown-away plan builds."""
        if max_slots:
            ei = np.asarray(edge_index)
            for deg_axis in (ei[1], ei[0]):       # fwd dst, bwd dst (=src)
                counts = np.bincount(deg_axis, minlength=num_nodes)
                slots = int(((counts + sub_len - 1) // sub_len).sum()) \
                    * sub_len
                if slots > max_slots:
                    return None
        return cls(edge_index, edge_weight, num_nodes, sub_len)

    @property
    def tables(self) -> tuple:
        """(gidx_f, sdst_f, last_f, empty_f, w_f, gidx_b, sdst_b, last_b,
        empty_b, w_b) device arrays — ride these through jit as arguments
        at scale.  The boundary tables (last/empty) keep the Pallas
        segmented-scan merge available inside the jitted step."""
        return self.fwd.reduce_tables + (self._w_fwd,) \
            + self.bwd.reduce_tables + (self._w_bwd,)

    def __call__(self, x: jnp.ndarray,
                 tables: Optional[tuple] = None) -> jnp.ndarray:
        return _plan_spmm(self, x,
                          self.tables if tables is None else tables)


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _plan_spmm(ps: PlanSpmm, x, tables):
    return ps.fwd.reduce(x, "add", edge_data_slots=tables[4],
                         tables=tables[0:4])


def _plan_spmm_fwd(ps, x, tables):
    return _plan_spmm(ps, x, tables), tables


def _plan_spmm_bwd(ps, tables, g):
    dx = ps.bwd.reduce(g, "add", edge_data_slots=tables[9],
                       tables=tables[5:9])
    return dx, (None,) * 10


_plan_spmm.defvjp(_plan_spmm_fwd, _plan_spmm_bwd)
