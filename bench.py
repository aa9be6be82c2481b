"""Headline benchmark: fused sketch-propagation throughput (edges/s/chip).

This is the hot kernel of the whole framework (reference hot loop:
scatter-max hash propagation, src/hashing.py:160-162 — "most of the runtime
of BUDDY is building hashes and subgraph features", reference README:94).

Measures one full hop of minhash(min) + HLL(max) propagation over a large
random graph on the default device (the real TPU chip under the driver), and
compares against a torch-CPU scatter_reduce baseline implementing the same
semantics (the reference runs on CPU/torch).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

NUM_NODES = 200_000
AVG_DEG = 16  # E = 3.2M directed edges
NUM_PERM = 128
HLL_P = 8
WARMUP = 2
ITERS = 5


def make_graph(rng):
    e = NUM_NODES * AVG_DEG
    src = rng.integers(0, NUM_NODES, e, dtype=np.int32)
    dst = rng.integers(0, NUM_NODES, e, dtype=np.int32)
    return src, dst


def bench_tpu(src, dst, mh, hll):
    """Times the fused one-hop program with a forced host read of a scalar
    derived from BOTH outputs, then subtracts the measured roundtrip of a
    trivial program.  Under the remote-TPU relay, ``block_until_ready``
    timing absorbs a ~30ms dispatch/sync roundtrip per sample (and for some
    programs returns early), so device-side timing alone is untrustworthy;
    the host-read-net methodology is robust to both failure modes.

    Besides edges/s it reports two relay/host-independent stability
    figures: ``hop_vs_gather_bound`` — the hop's time as a fraction of its
    own measured two-row-gathers-alone bound (the minimal HBM traffic ANY
    hop implementation must pay; both programs ride the same relay in the
    same process, so the ratio cancels relay and host-load noise) — and
    ``iter_spread`` = (max-min)/min over the hop samples."""
    import jax
    import jax.numpy as jnp

    from subgraph_sketching_tpu.ops.segment_scan import make_plan

    plan = make_plan(np.stack([src, dst]), NUM_NODES)
    mhj, hllj = jnp.asarray(mh), jnp.asarray(hll)
    gidx = plan.gather_idx
    IDENT = jnp.uint32(0xFFFFFFFF)

    @jax.jit
    def trivial(mh):
        return mh[0, 0].astype(jnp.float32)

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

    def timed(fn, *args):
        for _ in range(WARMUP):
            float(fn(*args))
        ts = []
        for _ in range(ITERS):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts), (max(ts) - min(ts)) / min(ts)

    t_trivial, _ = timed(trivial, mhj)
    t_hop, spread = timed(one_hop_scalar, mhj, hllj)
    t_gather, _ = timed(gathers_only, mhj, hllj)
    net = max(t_hop - t_trivial, 1e-9)
    net_gather = max(t_gather - t_trivial, 1e-9)
    return len(src) / net, net_gather / net, spread


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
    eps, bound_ratio, spread = bench_tpu(src, dst, mh, hll)
    print(json.dumps({"eps": eps, "hop_vs_gather_bound": bound_ratio,
                      "iter_spread": spread}), flush=True)


def _measure_tpu_with_deadline(attempts=3, deadline_s=None, retry_sleep=90):
    """Run the TPU measurement in a child process with a hard per-attempt
    deadline.  Fast failures ('Unable to initialize backend' during service
    flaps) and hangs both become bounded retries, so a relay outage at round
    end costs minutes, not the whole round."""
    import os
    import subprocess
    import sys

    if deadline_s is None:
        deadline_s = int(os.environ.get("BENCH_TPU_DEADLINE_S", "420"))
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
        # relay- and host-load-independent stability figures: the hop as a
        # fraction of its own measured two-gathers-alone HBM bound (both
        # sides ride the same relay, so dispatch noise cancels), and the
        # sample spread of the hop timings
        "hop_vs_gather_bound": round(res["hop_vs_gather_bound"], 3),
        "iter_spread": round(res["iter_spread"], 3),
    }))


if __name__ == "__main__":
    import sys
    if "--tpu-child" in sys.argv:
        _tpu_child()
    else:
        main()
