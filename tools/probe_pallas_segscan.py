"""Pallas sorted-segment merge vs XLA scatter at the bench shape (round 4).

Measures, net of the relay roundtrip (bench.py methodology):
  * segment part alone: XLA segment_min/max + fold-in  vs  pallas scan +
    boundary gather + fold-in, on the plan's real sub-run results
  * the FULL hop with each merge path (plan.reduce is the production call)
Asserts bit-exactness of both ops on-chip before timing.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import numpy as np

OUT = open(os.path.join(REPO, "tools", "perf_out.txt"), "a", buffering=1)


def log(msg):
    print(msg, flush=True)
    OUT.write(msg + "\n")


log(f"=== probe_pallas_segscan {time.strftime('%H:%M:%S')} "
    f"dev={jax.devices()[0].platform} ===")

from subgraph_sketching_tpu.ops.segment_scan import make_plan
from subgraph_sketching_tpu.ops import pallas_segscan as pss

N, DEG, P, M = 200_000, 16, 128, 256
rng = np.random.default_rng(0)
E = N * DEG
src = rng.integers(0, N, E, dtype=np.int32)
dst = rng.integers(0, N, E, dtype=np.int32)
plan = make_plan(np.stack([src, dst]), N)
S, L = plan.num_subruns, plan.sub_len
mh = jnp.asarray(rng.integers(0, 2**32 - 1, (N, P), dtype=np.uint32))
hll = jnp.asarray(rng.integers(0, 56, (N, M)).astype(np.int8))

# host tables for the pallas path
sdst = plan._sub_dst_np
last = np.searchsorted(sdst, np.arange(N), "right") - 1
first = np.searchsorted(sdst, np.arange(N), "left")
empty = first > last
last_c = jnp.asarray(np.where(empty, 0, last).astype(np.int32))
empty_d = jnp.asarray(empty)
rid2d = jnp.asarray(sdst[:, None].astype(np.int32))
runlens = np.bincount(sdst, minlength=N)
depth = max(1, int(np.ceil(np.log2(max(1, int(runlens.max()))))))
log(f"S={S} L={L} max_run={runlens.max()} depth={depth}")

gidx, sd = plan.gather_idx, plan.sub_dst
IDENT = jnp.uint32(0xFFFFFFFF)


@jax.jit
def trivial(a):
    return a[0, 0].astype(jnp.float32)


@jax.jit
def make_subruns(mh, hll):
    rows = jnp.concatenate([mh, jnp.full((1, P), IDENT, jnp.uint32)], 0)
    hrows = jnp.concatenate([hll, jnp.zeros((1, M), jnp.int8)], 0)
    vm = rows[gidx].reshape(S, L, P).min(axis=1)
    vh = hrows[gidx].reshape(S, L, M).max(axis=1)
    return vm, vh


vm, vh = jax.block_until_ready(make_subruns(mh, hll))


@jax.jit
def seg_xla(vm, vh, mh, hll):
    am = jnp.minimum(mh, jax.ops.segment_min(
        vm, sd, num_segments=N, indices_are_sorted=True))
    ah = jnp.maximum(hll, jax.ops.segment_max(
        vh, sd, num_segments=N, indices_are_sorted=True))
    return am, ah


@jax.jit
def seg_pallas(vm, vh, mh, hll):
    am = pss.sorted_segment_combine(vm, mh, "min", rid2d, last_c, empty_d,
                                    depth)
    ah = pss.sorted_segment_combine(vh, hll, "max", rid2d, last_c, empty_d,
                                    depth)
    return am, ah


a1 = jax.block_until_ready(seg_xla(vm, vh, mh, hll))
a2 = jax.block_until_ready(seg_pallas(vm, vh, mh, hll))
ok_m = bool((np.asarray(a1[0]) == np.asarray(a2[0])).all())
ok_h = bool((np.asarray(a1[1]) == np.asarray(a2[1])).all())
log(f"bit-exact on-chip: minhash={ok_m} hll={ok_h}")
assert ok_m and ok_h


def _force(o):
    float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])


def timed(fn, *args, reps=7):
    _force(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def seg_xla_s(vm, vh, mh, hll):
    am, ah = seg_xla(vm, vh, mh, hll)
    return am.sum(dtype=jnp.uint32).astype(jnp.float32).reshape(1, 1) + \
        ah.sum(dtype=jnp.int32).astype(jnp.float32)


@jax.jit
def seg_pallas_s(vm, vh, mh, hll):
    am, ah = seg_pallas(vm, vh, mh, hll)
    return am.sum(dtype=jnp.uint32).astype(jnp.float32).reshape(1, 1) + \
        ah.sum(dtype=jnp.int32).astype(jnp.float32)


t0 = timed(trivial, mh)
tx = timed(seg_xla_s, vm, vh, mh, hll) - t0
tp = timed(seg_pallas_s, vm, vh, mh, hll) - t0
log(f"segment part net: xla {tx*1e3:.2f}ms | pallas {tp*1e3:.2f}ms "
    f"({tx/max(tp,1e-9):.2f}x)")


# full hop with each path
@jax.jit
def hop_xla(mh, hll):
    vm, vh = make_subruns(mh, hll)
    am, ah = seg_xla(vm, vh, mh, hll)
    return am.sum(dtype=jnp.uint32).astype(jnp.float32).reshape(1, 1) + \
        ah.sum(dtype=jnp.int32).astype(jnp.float32)


@jax.jit
def hop_pallas(mh, hll):
    vm, vh = make_subruns(mh, hll)
    am, ah = seg_pallas(vm, vh, mh, hll)
    return am.sum(dtype=jnp.uint32).astype(jnp.float32).reshape(1, 1) + \
        ah.sum(dtype=jnp.int32).astype(jnp.float32)


# interleave A/B to cancel host-load drift
hx = hp = 1e9
for _ in range(3):
    hx = min(hx, timed(hop_xla, mh, hll, reps=3))
    hp = min(hp, timed(hop_pallas, mh, hll, reps=3))
hx, hp = hx - t0, hp - t0
log(f"full hop net: xla {hx*1e3:.2f}ms ({E/hx/1e6:.1f}M e/s) | "
    f"pallas {hp*1e3:.2f}ms ({E/hp/1e6:.1f}M e/s) ({hx/max(hp,1e-9):.2f}x)")
log("done probe_pallas_segscan")
