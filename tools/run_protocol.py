"""Leaderboard-protocol quality artifact: run the 10-rep mean±std protocol
(reference README.md:100-104, run.py:96-105) for BUDDY and ELPH on the
bundled small-world dataset and write QUALITY_r{N}.json.

Usage:  python tools/run_protocol.py [--round 2] [--reps 10] [--platform cpu]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

CONFIGS = {
    "buddy-synth-ws": dict(dataset_name="synth-ws", model="BUDDY", epochs=30,
                           K=50, lr=0.01, hidden_channels=256,
                           batch_size=1024),
    "elph-synth-ws": dict(dataset_name="synth-ws", model="ELPH", epochs=15,
                          K=50),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=2)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.runners.run import run

    out = {"protocol": f"{args.reps} reps, best-val model selection, "
                       "mean +/- std (reference README.md:100-104)"}
    for name, kw in CONFIGS.items():
        cfg = Config(reps=args.reps, **kw)
        if args.platform:
            cfg.platform = args.platform
        t0 = time.time()
        results = run(cfg)
        import numpy as np
        test = np.asarray([r[0] for r in results]) * 100
        val = np.asarray([r[1] for r in results]) * 100
        out[name] = {
            "metric": f"Hits@{kw['K']}",
            "test_mean": round(float(test.mean()), 2),
            "test_std": round(float(test.std()), 2),
            "val_mean": round(float(val.mean()), 2),
            "val_std": round(float(val.std()), 2),
            "reps": args.reps,
            "wall_s": round(time.time() - t0, 1),
            "command": "python -m subgraph_sketching_tpu.runners.run "
                       + " ".join(f"--{k} {v}" for k, v in kw.items())
                       + f" --reps {args.reps}",
        }
        print(name, out[name], flush=True)

    path = f"/root/repo/QUALITY_r{args.round:02d}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
