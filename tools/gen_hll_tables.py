"""Generate empirical HyperLogLog++ bias-correction tables.

The reference relies on the datasketch library's vendored copy of the
Google HLL++ empirical tables (reference src/hashing.py:78-80:
``hyperloglog_const._thresholds/_bias/_raw_estimate``).  Those tables were
produced by Monte-Carlo simulation (Heule, Nunkesser, Hall: "HyperLogLog in
Practice", appendix); we regenerate equivalent tables the same way rather
than copying them: for a grid of true cardinalities we simulate many HLL
sketches, record the mean raw estimate and the mean bias (raw - true), and
at query time correct an estimate by the average bias of its 6
nearest-neighbour raw-estimate entries — the identical estimator structure.

Run:  python tools/gen_hll_tables.py
Writes: subgraph_sketching_tpu/sketch/_hll_tables.npz
"""

from __future__ import annotations

import os

import numpy as np

OUT = os.path.join(os.path.dirname(__file__), "..",
                   "subgraph_sketching_tpu", "sketch", "_hll_tables.npz")

# simulation budget per precision (accuracy ~ sigma/sqrt(trials))
TRIALS = {4: 6000, 5: 6000, 6: 5000, 7: 5000, 8: 4000, 9: 1500, 10: 1500,
          11: 600, 12: 600, 13: 200, 14: 200, 15: 80, 16: 80}
GRID_POINTS = 201
ALPHA_INF = 0.7213


def alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values (vectorised)."""
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    def bl32(v):
        out = np.zeros(v.shape, dtype=np.int64)
        nz = v > 0
        out[nz] = np.floor(np.log2(v[nz].astype(np.float64))).astype(np.int64) + 1
        return out

    return np.where(hi > 0, 32 + bl32(hi), bl32(lo))


def gen_for_p(p: int, rng: np.random.Generator, scale: int = 1):
    m = 1 << p
    trials = TRIALS[p] * scale
    max_rank = 64 - p
    cards = np.unique(np.round(np.linspace(max(1, m // 8), 5.5 * m, GRID_POINTS))
                      .astype(np.int64))
    max_card = int(cards[-1])

    # one stream of hashes per trial; registers updated incrementally so each
    # grid point sees the prefix of inserts
    regs = np.zeros((trials, m), dtype=np.int8)
    raw_means = np.zeros(len(cards))
    biases = np.zeros(len(cards))
    bias_se = np.zeros(len(cards))
    trial_idx = np.arange(trials)

    prev = 0
    pow2 = 2.0 ** (-np.arange(0, max_rank + 2))
    for gi, c in enumerate(cards):
        chunk = int(c) - prev
        if chunk > 0:
            h = rng.integers(0, 2 ** 64, size=(trials, chunk), dtype=np.uint64)
            reg_idx = (h & np.uint64(m - 1)).astype(np.int64)
            ranks = (max_rank - bit_length_u64(h >> np.uint64(p)) + 1).astype(np.int8)
            flat_t = np.repeat(trial_idx, chunk)
            np.maximum.at(regs, (flat_t, reg_idx.ravel()), ranks.ravel())
        prev = int(c)
        raw = alpha(m) * m * m / pow2[regs.astype(np.int64)].sum(axis=1)
        raw_means[gi] = raw.mean()
        biases[gi] = (raw - c).mean()
        # per-grid-point Monte-Carlo standard error of the mean bias —
        # the error bar on this table entry vs the infinite-trials limit
        # (datasketch's tables are a draw from the same estimator)
        bias_se[gi] = raw.std() / np.sqrt(trials)
    return (raw_means.astype(np.float32), biases.astype(np.float32),
            bias_se.astype(np.float32))


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only-p", type=int, default=None,
                    help="generate a single precision instead of all")
    ap.add_argument("--scale", type=int, default=1,
                    help="multiply the per-p trial budget (SE ~ 1/sqrt)")
    ap.add_argument("--seed", type=int, default=20260816,
                    help="base seed (per-p seed = seed + p)")
    ap.add_argument("--out", default=OUT)
    args = ap.parse_args(argv)
    out = {}
    if args.only_p and os.path.exists(args.out):
        # --only-p regenerates ONE precision: merge into the existing file
        # instead of clobbering the other precisions' tables (overwriting
        # the shipped npz with a single-p file would break every other
        # hll_p at runtime)
        with np.load(args.out) as z:
            out = {k: np.asarray(z[k]) for k in z.files}
    ps = [args.only_p] if args.only_p else sorted(TRIALS)
    for p in ps:
        rng = np.random.default_rng(args.seed + p)
        raw, bias, se = gen_for_p(p, rng, scale=args.scale)
        out[f"raw_estimate_p{p}"] = raw
        out[f"bias_p{p}"] = bias
        out[f"bias_se_p{p}"] = se
        print(f"p={p}: grid {len(raw)} entries, raw [{raw[0]:.1f}, {raw[-1]:.1f}], "
              f"bias [{bias.min():.1f}, {bias.max():.1f}], "
              f"bias SE [{se.min():.3f}, {se.max():.3f}] "
              f"({TRIALS[p] * args.scale} trials)")
    np.savez_compressed(os.path.abspath(args.out), **out)
    print(f"wrote {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
