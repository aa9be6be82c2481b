"""Headline benchmark: the framework's three hot kernels on one chip.

The driver captures ONE json line.  Headline metric = fused sketch
propagation (edges/s/chip) — the hot kernel of the whole framework
(reference hot loop: scatter-max hash propagation, src/hashing.py:160-162 —
"most of the runtime of BUDDY is building hashes and subgraph features",
reference README:94) — with a torch-CPU scatter_reduce baseline implementing
the same semantics (the reference runs on CPU/torch).

The same line also carries the other two hot kernels (BASELINE criterion 3
names subgraph-feature extraction, reference src/hashing.py:258-323; SpMM is
the GCN/SIGN workhorse, reference src/models/elph.py:136-146), each with its
own roofline figure, plus a decomposition of the hop into measured parts:

  * ``hop_vs_gather_bound`` — the fraction of the hop's time explained by
    its own measured two-row-gathers-alone bound:
    t_gathers_alone / t_hop, nominally in (0, 1] — the two timings are
    measured independently, so relay noise can push a sample slightly
    above 1 (the gathers are the minimal HBM
    traffic ANY hop implementation must pay, so higher = closer to that
    floor; 0.80 means the hop runs at 1.25x its lower bound).  Both
    programs ride the same relay in the same process, so the ratio
    cancels relay and host-load noise.
  * ``decomposition`` — net times of the hop's parts measured separately
    (gathers alone; standalone segment reduce + self fold-in; gathers +
    slot-axis reduce) and ``parts_over_hop`` = (gathers + segment) / hop:
    ~1.0 means the hop's cost is fully explained by its two measured
    memory-bound parts, with the residual being the fused slot-axis
    reduce.  (``t_gather_slot_ms`` is informational: measured standalone
    it exceeds the whole hop — XLA tiles the slot reduction worse when its
    consumer is a full checksum reduction instead of the sorted scatter —
    so it is NOT used in the sum.)
  * ``chunked`` — the SAME hop through the chunk-streamed plan
    (ChunkedSegmentPlan with max_slots = 1/4 of the one-shot slot table):
    the production memory path at citation2 scale.  Tracked per round so
    the scale path cannot regress silently (round-4 verdict item 1:
    it ran 71M e/s vs the 108M headline with no artifact watching it).
  * ``spmm`` — plan-SpMM d=128 edges/s, its own decomposition (gather
    alone; the production merge alone — Pallas segmented scan on TPU —
    with ``parts_over_spmm`` = (gather + merge) / spmm), and
    ``hbm_fraction``: the kernel's modelled minimal HBM traffic divided
    by (measured on-device stream bandwidth x net time) — the fraction of
    speed-of-light it achieves against the SAME chip's measured memcpy
    rate (``stream_bw_gbps``), so the figure needs no spec-sheet
    constants.

All device timings use the established net-of-roundtrip method: force a
host read of a scalar derived from the outputs, subtract the measured
roundtrip of a trivial program — re-measured ADJACENT to each timed
group with interleaved samples, because the relay's dispatch latency
drifts by several ms over a full run and a single start-of-run trivial
mis-attributes that drift to later groups.  Under the remote-TPU relay,
``block_until_ready`` absorbs a ~30ms dispatch/sync roundtrip per sample
(and for some programs returns early), so device-side timing alone is
untrustworthy; the host-read-net methodology is robust to both failure
modes.
"""

import json
import time

import numpy as np

NUM_NODES = 200_000
AVG_DEG = 16  # E = 3.2M directed edges
NUM_PERM = 128
HLL_P = 8
MAX_HOPS = 2
FEAT_BATCH = 1 << 18
SPMM_D = 128
WARMUP = 2
ITERS = 5


def make_graph(rng):
    e = NUM_NODES * AVG_DEG
    src = rng.integers(0, NUM_NODES, e, dtype=np.int32)
    dst = rng.integers(0, NUM_NODES, e, dtype=np.int32)
    return src, dst


def bench_tpu(src, dst, mh, hll):
    """All on-device measurements; returns a dict (see module docstring)."""
    import os

    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
    import jax.numpy as jnp

    from subgraph_sketching_tpu.ops.segment_scan import make_plan
    from subgraph_sketching_tpu.sketch.elph import subgraph_features
    from subgraph_sketching_tpu.sketch.hll import hll_count
    from subgraph_sketching_tpu.sketch.params import SketchParams, Sketches

    E = len(src)
    plan = make_plan(np.stack([src, dst]), NUM_NODES)
    mhj, hllj = jnp.asarray(mh), jnp.asarray(hll)
    gidx = plan.gather_idx
    S, L = plan.num_subruns, plan.sub_len
    m = hll.shape[1]
    IDENT = jnp.uint32(0xFFFFFFFF)

    @jax.jit
    def trivial(a):
        # works on any array rank: the roundtrip-measuring program
        return a.reshape(-1)[0].astype(jnp.float32)

    @jax.jit
    def one_hop_scalar(mh, hll):
        a = plan.reduce(mh, "min")
        b = plan.reduce(hll, "max")
        return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
            b.sum(dtype=jnp.int32).astype(jnp.float32)

    @jax.jit
    def gathers_only(mh, hll):
        # the roofline program: exactly the two row gathers the hop must
        # perform, nothing else (tools/probe_oneshot.py g_both)
        rows = jnp.concatenate(
            [mh, jnp.full((1, mh.shape[1]), IDENT, jnp.uint32)], axis=0)
        hrows = jnp.concatenate(
            [hll, jnp.zeros((1, hll.shape[1]), jnp.int8)], axis=0)
        return (rows[gidx].sum(dtype=jnp.uint32).astype(jnp.float32)
                + hrows[gidx].astype(jnp.int32).sum().astype(jnp.float32))

    @jax.jit
    def gather_slot(mh, hll):
        # part 1 of the hop: gathers + the slot-axis tree reduce (everything
        # but the segment reduction and the self fold-in)
        rows = jnp.concatenate(
            [mh, jnp.full((1, mh.shape[1]), IDENT, jnp.uint32)], axis=0)
        hrows = jnp.concatenate(
            [hll, jnp.zeros((1, hll.shape[1]), jnp.int8)], axis=0)
        vm = rows[gidx].reshape(S, L, NUM_PERM).min(axis=1)
        vh = hrows[gidx].reshape(S, L, m).max(axis=1)
        return vm.sum(dtype=jnp.uint32).astype(jnp.float32) + \
            vh.sum(dtype=jnp.int32).astype(jnp.float32)

    @jax.jit
    def segment_part(vm, vh, mh, hll):
        # part 2 of the hop: the PRODUCTION merge step (on TPU: the Pallas
        # segmented scan + boundary gather, ops/pallas_segscan.py; the XLA
        # sorted scatter elsewhere) over precomputed sub-run results + the
        # self fold-in — the same path plan.reduce runs inside the hop
        am = plan.merge_subruns(vm, mh, "min")
        ah = plan.merge_subruns(vh, hll, "max")
        return am.sum(dtype=jnp.uint32).astype(jnp.float32) + \
            ah.sum(dtype=jnp.int32).astype(jnp.float32)

    def timed(fn, *args):
        """(net_min, spread): min-of-ITERS with the trivial-program
        roundtrip re-measured ADJACENT to this group (interleaved samples)
        — the relay's dispatch latency drifts by several ms over the
        minutes a full bench run takes, so netting every group against one
        start-of-run trivial mis-attributes that drift to whichever part
        happened to run latest (observed: the ~1ms pallas merge reading as
        6.4ms)."""
        for _ in range(WARMUP):
            float(fn(*args))
        float(trivial(args[0]))
        ts, t0s = [], []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            float(trivial(args[0]))
            t0s.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        trivials.append(min(t0s))
        return max(min(ts) - min(t0s), 1e-9), (max(ts) - min(ts)) / min(ts)

    rng = np.random.default_rng(1)
    trivials = []
    timed(one_hop_scalar, mhj, hllj)  # warm everything incl. trivial
    t_trivial = trivials[0]           # reported: the relay roundtrip scale

    def net(t):
        return t  # timed() already nets against the adjacent trivial

    t_hop, spread = timed(one_hop_scalar, mhj, hllj)
    t_gather, _ = timed(gathers_only, mhj, hllj)
    t_gslot, _ = timed(gather_slot, mhj, hllj)
    vm0 = jnp.asarray(rng.integers(0, 2 ** 32 - 1, (S, NUM_PERM),
                                   dtype=np.uint32))
    vh0 = jnp.asarray(rng.integers(0, 56, (S, m)).astype(np.int8))
    t_seg, _ = timed(segment_part, vm0, vh0, mhj, hllj)

    # the chunk-streamed plan — the production memory path whenever the
    # slot table exceeds max_gather_slots (citation2 scale).  Same hop,
    # slot budget 1/4 of the one-shot table, built through make_auto_plan
    # so the row tracks the production choice (CHUNK_SUB_LEN sub-runs +
    # even chunk sizing + the per-chunk Pallas merge on TPU).
    from subgraph_sketching_tpu.ops.segment_scan import make_auto_plan
    chunked_plan = make_auto_plan(np.stack([src, dst]), NUM_NODES,
                                  max_slots=S * L // 4)
    assert type(chunked_plan).__name__ == "ChunkedSegmentPlan"

    @jax.jit
    def chunked_hop_scalar(mh, hll):
        a = chunked_plan.reduce(mh, "min")
        b = chunked_plan.reduce(hll, "max")
        return a.sum(dtype=jnp.uint32).astype(jnp.float32) + \
            b.sum(dtype=jnp.int32).astype(jnp.float32)

    t_chunked, chunked_spread = timed(chunked_hop_scalar, mhj, hllj)

    hop = {
        "eps": E / net(t_hop),
        "hop_vs_gather_bound": net(t_gather) / net(t_hop),
        "iter_spread": spread,
        "decomposition": {
            "t_trivial_ms": round(t_trivial * 1e3, 2),
            "t_hop_ms": round(net(t_hop) * 1e3, 2),
            "t_gathers_ms": round(net(t_gather) * 1e3, 2),
            "t_gather_slot_ms": round(net(t_gslot) * 1e3, 2),
            "t_segment_ms": round(net(t_seg) * 1e3, 2),
            "parts_over_hop": round(
                (net(t_gather) + net(t_seg)) / net(t_hop), 3),
        },
        "chunked": {
            "edges_per_s": round(E / net(t_chunked)),
            "num_chunks": chunked_plan.num_chunks,
            "vs_oneshot": round(net(t_chunked) / net(t_hop), 3),
            "iter_spread": round(chunked_spread, 3),
        },
    }

    # --- subgraph features on real K=2 stacks --------------------------------
    params = SketchParams(max_hops=MAX_HOPS, num_perm=NUM_PERM, hll_p=HLL_P)

    @jax.jit
    def build_stacks(mh0, hll0):
        mhs, hlls, cards = [mh0], [hll0], []
        for _ in range(MAX_HOPS):
            mhs.append(plan.reduce(mhs[-1], "min"))
            hlls.append(plan.reduce(hlls[-1], "max"))
            cards.append(hll_count(hlls[-1], HLL_P))
        return jnp.stack(mhs), jnp.stack(hlls), jnp.stack(cards, axis=1)

    mh_st, hll_st, cards_st = build_stacks(mhj, hllj)
    sk = Sketches(minhash=mh_st, hll=hll_st, cards=cards_st)
    links = jnp.asarray(rng.integers(0, NUM_NODES, (FEAT_BATCH, 2),
                                     dtype=np.int32))
    jax.block_until_ready((mh_st, hll_st, cards_st, links))

    def fsum(x):
        return x.astype(jnp.float32).sum()

    @jax.jit
    def feat_full(lnk, mh_st, hll_st, cards_st):
        s = Sketches(minhash=mh_st, hll=hll_st, cards=cards_st)
        return subgraph_features(lnk, s, params).sum()

    @jax.jit
    def feat_gathers(lnk, mh_st, hll_st, cards_st):
        # the feature kernel's own roofline: exactly the 6 endpoint-row
        # gathers it must perform (2 sides x (minhash + hll) hop rows +
        # cardinalities), nothing else
        u, v = lnk[:, 0], lnk[:, 1]
        return (fsum(mh_st[1:, u, :]) + fsum(mh_st[1:, v, :])
                + fsum(hll_st[1:, u, :].astype(jnp.int32))
                + fsum(hll_st[1:, v, :].astype(jnp.int32))
                + fsum(cards_st[u]) + fsum(cards_st[v]))

    t_feat, feat_spread = timed(feat_full, links, mh_st, hll_st, cards_st)
    t_fg, _ = timed(feat_gathers, links, mh_st, hll_st, cards_st)
    features = {
        "links_per_s": round(FEAT_BATCH / net(t_feat)),
        "batch": FEAT_BATCH,
        "vs_gather_bound": round(net(t_fg) / net(t_feat), 3),
        "iter_spread": round(feat_spread, 3),
    }

    # --- plan SpMM d=128 ------------------------------------------------------
    w = rng.random(E).astype(np.float32)
    wslots = plan.stage_edge_data(w)
    x = jnp.asarray(rng.standard_normal((NUM_NODES, SPMM_D))
                    .astype(np.float32))
    jax.block_until_ready((wslots, x))

    @jax.jit
    def spmm_plan(x, wslots):
        return plan.reduce(x, "add", edge_data_slots=wslots).sum()

    @jax.jit
    def spmm_gather(x, wslots):
        # the SpMM's own roofline program: the one weighted row gather it
        # must perform (slot rows * staged weights), nothing else
        rows = jnp.concatenate([x, jnp.zeros((1, SPMM_D), x.dtype)], axis=0)
        v = rows[gidx] * wslots[:, None]
        return v.sum()

    @jax.jit
    def spmm_merge(v0, x):
        # the production merge alone (Pallas segmented scan on TPU, XLA
        # sorted scatter elsewhere) on precomputed sub-run results — the
        # same path plan.reduce runs inside the SpMM
        return plan.merge_subruns(v0, x, "add").sum()

    t_spmm, spmm_spread = timed(spmm_plan, x, wslots)
    t_sg, _ = timed(spmm_gather, x, wslots)
    v0 = jnp.asarray(rng.standard_normal((S, SPMM_D)).astype(np.float32))
    t_sm, _ = timed(spmm_merge, v0, x)

    # measured on-chip stream bandwidth: 16 read+write passes over a 256MB
    # array inside ONE program (a lax.scan carry materialises each pass —
    # a plain multiply chain would fuse into a single pass) so the ~10ms of
    # device time clears the relay's run-to-run jitter; the [0] host read
    # forces completion — the denominator for hbm_fraction
    STREAM_PASSES = 16
    big = jnp.asarray(rng.standard_normal(64 * 1024 * 1024)
                      .astype(np.float32))
    jax.block_until_ready(big)

    @jax.jit
    def stream(a):
        y, _ = jax.lax.scan(
            lambda c, _: (c * jnp.float32(1.0000001), None), a, None,
            length=STREAM_PASSES)
        return y

    t_stream, _ = timed(lambda a: stream(a)[0], big)
    stream_bytes = 2 * big.size * 4 * STREAM_PASSES  # read + write per pass
    stream_bw = stream_bytes / net(t_stream)

    # minimal HBM traffic model for the plan SpMM (Pallas-merge form):
    # every slot reads its gathered row (d*4), its index (4B) and weight
    # (4B); the sub-run results [S, d] f32 are written by the slot reduce,
    # then read and re-written (totals) by the segmented scan; the output
    # gathers N total rows and writes N rows
    slots = S * L
    est_bytes = (slots * (SPMM_D * 4 + 4 + 4) + 3 * S * SPMM_D * 4
                 + 2 * NUM_NODES * SPMM_D * 4)
    spmm = {
        "edges_per_s": round(E / net(t_spmm)),
        "d": SPMM_D,
        "hbm_fraction": round((est_bytes / net(t_spmm)) / stream_bw, 3),
        "est_gbytes": round(est_bytes / 1e9, 3),
        "vs_gather_bound": round(net(t_sg) / net(t_spmm), 3),
        "iter_spread": round(spmm_spread, 3),
        "decomposition": {
            "t_spmm_ms": round(net(t_spmm) * 1e3, 2),
            "t_gather_ms": round(net(t_sg) * 1e3, 2),
            "t_merge_ms": round(net(t_sm) * 1e3, 2),
            # what the two measured parts leave: the fused slot-axis
            # weighted sum (not measurable standalone — like the hop's
            # t_gather_slot, XLA tiles it differently under a checksum
            # consumer), named so the artifact self-describes
            "t_residual_slot_reduce_ms": round(
                (net(t_spmm) - net(t_sg) - net(t_sm)) * 1e3, 2),
            "parts_over_spmm": round(
                (net(t_sg) + net(t_sm)) / net(t_spmm), 3),
        },
    }

    hop["features"] = features
    hop["spmm"] = spmm
    hop["stream_bw_gbps"] = round(stream_bw / 1e9, 1)
    return hop


def bench_torch_cpu(src, dst, mh, hll):
    import torch

    srct = torch.from_numpy(src).long()
    dstt = torch.from_numpy(dst).long()
    mht = torch.from_numpy(mh.astype(np.int64))
    hllt = torch.from_numpy(hll)

    def one_hop():
        out_mh = mht.clone()
        out_mh.scatter_reduce_(0, dstt[:, None].expand(-1, NUM_PERM),
                               mht[srct], reduce="amin")
        out_hll = hllt.clone()
        out_hll.scatter_reduce_(0, dstt[:, None].expand(-1, hll.shape[1]),
                                hllt[srct], reduce="amax")
        return out_mh, out_hll

    one_hop()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        one_hop()
        times.append(time.perf_counter() - t0)
    return len(src) / min(times)


def _tpu_child():
    """Run the TPU measurement and print ONE json line on stdout.
    Executed in a subprocess so the parent can enforce a deadline — the
    remote relay sometimes HANGS (jax.devices() never returns) rather than
    failing fast, and a hang cannot be caught with try/except."""
    rng = np.random.default_rng(0)
    src, dst = make_graph(rng)
    mh = rng.integers(0, 2 ** 32 - 1, (NUM_NODES, NUM_PERM), dtype=np.uint32)
    hll = rng.integers(0, 56, (NUM_NODES, 1 << HLL_P)).astype(np.int8)
    print(json.dumps(bench_tpu(src, dst, mh, hll)), flush=True)


def _measure_tpu_with_deadline(attempts=3, deadline_s=None, retry_sleep=90):
    """Run the TPU measurement in a child process with a hard per-attempt
    deadline.  Fast failures ('Unable to initialize backend' during service
    flaps) and hangs both become bounded retries, so a relay outage at round
    end costs minutes, not the whole round."""
    import os
    import subprocess
    import sys

    if deadline_s is None:
        deadline_s = int(os.environ.get("BENCH_TPU_DEADLINE_S", "560"))
    for attempt in range(attempts):
        try:
            out = subprocess.run(
                [sys.executable, __file__, "--tpu-child"],
                capture_output=True, text=True, timeout=deadline_s)
            if out.returncode == 0 and out.stdout.strip():
                return json.loads(out.stdout.strip().splitlines()[-1])
            # stderr only: stdout stays the single JSON line (driver contract)
            print(f"# TPU attempt {attempt + 1} failed (rc={out.returncode}):"
                  f" {out.stderr.strip()[-300:]}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            print(f"# TPU attempt {attempt + 1} hit the {deadline_s}s "
                  f"deadline (relay hang)", file=sys.stderr, flush=True)
        except (ValueError, json.JSONDecodeError) as e:
            print(f"# TPU attempt {attempt + 1} bad output: {e}",
                  file=sys.stderr, flush=True)
        if attempt < attempts - 1:
            time.sleep(retry_sleep)
    return None


def main():
    rng = np.random.default_rng(0)
    src, dst = make_graph(rng)
    mh = rng.integers(0, 2 ** 32 - 1, (NUM_NODES, NUM_PERM),
                      dtype=np.uint32)
    hll = rng.integers(0, 56, (NUM_NODES, 1 << HLL_P)).astype(np.int8)

    res = _measure_tpu_with_deadline()
    if res is None:
        raise SystemExit("TPU backend unavailable after 3 attempts")
    base_eps = bench_torch_cpu(src, dst, mh, hll)
    print(json.dumps({
        "metric": "sketch_propagation_throughput",
        "value": round(res["eps"]),
        "unit": "edges/s",
        "vs_baseline": round(res["eps"] / base_eps, 3),
        # relay- and host-load-independent stability figures: the fraction
        # of hop time explained by its two-gathers-alone HBM bound
        # (t_gathers / t_hop, higher = closer to the floor; both sides
        # ride the same relay, so dispatch noise cancels), and the sample
        # spread of the hop timings
        "hop_vs_gather_bound": round(res["hop_vs_gather_bound"], 3),
        "iter_spread": round(res["iter_spread"], 3),
        "decomposition": res["decomposition"],
        "chunked": res["chunked"],
        "features": res["features"],
        "spmm": res["spmm"],
        "stream_bw_gbps": res["stream_bw_gbps"],
    }))


if __name__ == "__main__":
    import sys
    if "--tpu-child" in sys.argv:
        _tpu_child()
    else:
        main()
