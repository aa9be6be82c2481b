"""Main experiment driver (reference src/runners/run.py).

CLI flag names are kept compatible with the reference so its README
reproduction commands work against this runner, e.g.:

    python -m subgraph_sketching_tpu.runners.run --dataset_name Cora \
        --model BUDDY --lr 0.01 ...
"""

from __future__ import annotations

import argparse
import dataclasses
import time
from math import inf
from typing import Optional

import jax
import numpy as np

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.graph.datasets import get_data
from subgraph_sketching_tpu.graph.preprocess import (
    sketch_params_from_config,
)
from subgraph_sketching_tpu.train.inference import test
from subgraph_sketching_tpu.train.loops import BuddyTrainer, ElphTrainer
from subgraph_sketching_tpu.utils import str2bool


def set_seed(seed: int) -> np.random.Generator:
    """Reproducibility per OGB rules (reference run.py:37-48).  Seeds the
    stdlib ``random`` module too — SEAL's per-hop neighbour sampling
    (graph/seal.py k_hop_subgraph) draws from it, matching the reference."""
    import random
    random.seed(seed)
    np.random.seed(seed)
    return np.random.default_rng(seed)


SEAL_MODELS = ("SEALDGCNN", "SEALGCN", "SEALSAGE", "SEALGIN",
               "SEALMLP")
KGE_MODELS = ("transE", "distmult", "complEx", "rotatE")


def build_trainer(cfg: Config, datasets, num_features: Optional[int]):
    if cfg.model == "BUDDY":
        trainer = BuddyTrainer(cfg, datasets["train"], num_features)
    elif cfg.model == "ELPH":
        trainer = ElphTrainer(cfg, datasets["train"],
                              sketch_params_from_config(cfg), num_features)
    else:
        raise NotImplementedError(
            f"model {cfg.model} is not wired into the runner yet")
    for split in ("valid", "test"):
        trainer.stage(split, datasets[split])
    # citation2: evaluate train metric on a small subset with aligned
    # same-source negatives (reference get_loaders, data.py:55-59)
    if cfg.dataset_name == "ogbl-citation2" and cfg.model == "BUDDY":
        from subgraph_sketching_tpu.graph.preprocess import (
            make_train_eval_dataset,
        )
        trainer.stage("train_eval", make_train_eval_dataset(datasets["train"]))
        trainer.train_eval_split = "train_eval"
    return trainer


def build_seal_trainer(cfg: Config, splits):
    from subgraph_sketching_tpu.graph.seal import SEALDataset
    from subgraph_sketching_tpu.train.seal_loop import SealTrainer
    datasets = {}
    for name, sd in splits.items():
        dynamic = {"train": cfg.dynamic_train, "valid": cfg.dynamic_val,
                   "test": cfg.dynamic_test}[name]
        datasets[name] = SEALDataset(
            sd.graph, sd.pos_edges, sd.neg_edges, num_hops=cfg.num_hops,
            node_label=cfg.node_label, ratio_per_hop=cfg.ratio_per_hop,
            max_nodes_per_hop=cfg.max_nodes_per_hop, max_dist=cfg.max_dist,
            use_feature=cfg.use_feature, dynamic=dynamic)
    num_features = (None if splits["train"].graph.x is None
                    else splits["train"].graph.x.shape[-1])
    return SealTrainer(cfg, datasets, num_features)


def run(cfg: Config):
    """Rep loop with best-val model selection (reference run.py:50-110)."""
    if cfg.model not in ("BUDDY", "ELPH") + SEAL_MODELS + KGE_MODELS:
        raise NotImplementedError(
            f"model {cfg.model} is not wired into the runner yet "
            f"(available: BUDDY, ELPH, {', '.join(SEAL_MODELS)}, "
            f"{', '.join(KGE_MODELS)})")
    if cfg.compilation_cache_dir:
        jax.config.update("jax_compilation_cache_dir",
                          cfg.compilation_cache_dir)
    print(f"executing on {jax.devices()[0].platform}")
    # multi-process runs: heartbeat failure detector so a dead peer aborts
    # the run promptly (restartable with --resume) instead of hanging the
    # survivors in the next collective; no-op single-process
    from subgraph_sketching_tpu.parallel.fault import maybe_start
    detector = maybe_start(cfg.heartbeat_dir, timeout=cfg.heartbeat_timeout)
    from subgraph_sketching_tpu.metrics_logging import MetricsLogger
    logger = MetricsLogger(
        run_dir=cfg.checkpoint_dir, use_wandb=cfg.wandb,
        config=None if cfg.checkpoint_dir is None else
        __import__("json").loads(cfg.to_json()),
        wandb_kwargs=dict(
            entity=cfg.wandb_entity, project=cfg.wandb_project,
            group=cfg.wandb_group, name=cfg.wandb_run_name,
            dir=cfg.wandb_output_dir,
            mode="offline" if cfg.use_wandb_offline else "online"))
    results_list = []
    for rep in range(cfg.reps):
        host_rng = set_seed(rep)
        splits, directed, eval_metric = get_data(cfg)
        if cfg.eval_metric != "hits":
            eval_metric = cfg.eval_metric
        t0 = time.time()
        if cfg.model in SEAL_MODELS:
            trainer = build_seal_trainer(cfg, splits)
        elif cfg.model in KGE_MODELS:
            # KGE tier needs no sketches/features — train directly on the
            # split's links (exceeds reference: transx.py is never wired
            # into the reference's run.py)
            from subgraph_sketching_tpu.train.kge_loop import (
                build_kge_trainer,
            )
            trainer = build_kge_trainer(cfg, splits)
        else:
            from subgraph_sketching_tpu.graph.preprocess import (
                build_all_splits,
            )
            datasets = build_all_splits(splits, cfg, directed=directed)
            num_features = (None if datasets["train"].x is None
                            else datasets["train"].x.shape[-1])
            trainer = build_trainer(cfg, datasets, num_features)
        print(f"preprocessing ran in {time.time() - t0:.2f}s")
        state = trainer.init_state(jax.random.PRNGKey(rep))
        start_epoch = 0
        resumed_meta = None
        if cfg.resume and cfg.checkpoint_dir and rep == 0:
            # real mid-run resume of params + batch stats + optimizer state
            # (the reference can only save final weights, run.py:108-110).
            # The loop continues FROM the restored epoch: per-epoch keys are
            # fold_in(PRNGKey(rep), epoch) and the host rng is unused, so
            # the resumed run's remaining epochs are bit-identical to an
            # uninterrupted run's (tests/test_fault.py drill).
            from subgraph_sketching_tpu.train.checkpoint import (
                latest_step, load_run_meta, restore_into,
            )
            step = latest_step(cfg.checkpoint_dir)
            if detector is not None:
                # processes may see different filesystem states (fs lag, a
                # partially-synced dir); restoring divergent steps would
                # desync the epoch-barrier tag sequences and deadlock with
                # fresh heartbeats.  Agree on the minimum visible step
                # out-of-band so every process restores the SAME checkpoint
                # — or none, if any process sees none.
                step = detector.agree_min(
                    "resume_step", -1 if step is None else step)
                step = None if step < 0 else step
            if step is not None:
                state, step = restore_into(cfg.checkpoint_dir, state,
                                           step=step)
                start_epoch = min(step, cfg.epochs)
                # best-val tracking is host state, not device state — without
                # it the resumed run would re-select best-val over the
                # remaining epochs only and report different final metrics
                resumed_meta = load_run_meta(cfg.checkpoint_dir, step)
                print(f"resumed from checkpoint step {step}")

        if cfg.check_determinism and rep == 0:
            from subgraph_sketching_tpu.train.determinism import (
                check_epoch_determinism,
            )
            n_arr, dloss = check_epoch_determinism(
                trainer, state, jax.random.fold_in(jax.random.PRNGKey(rep), 0),
                rng=host_rng)
            print(f"determinism check passed: {n_arr} state arrays "
                  f"bitwise-identical across epoch reruns (loss {dloss:.4f})")

        val_res = test_res = train_res = 0.0
        best_epoch = 0
        if resumed_meta is not None:
            val_res = resumed_meta.get("val_res", 0.0)
            test_res = resumed_meta.get("test_res", 0.0)
            train_res = resumed_meta.get("train_res", 0.0)
            best_epoch = resumed_meta.get("best_epoch", 0)
        print(f"running repetition {rep}")
        for epoch in range(start_epoch, cfg.epochs):
            t0 = time.time()
            # structured tracing (the reference has wall-clock prints only,
            # SURVEY.md §5); epoch 1 is traced so compile noise from epoch 0
            # stays out of the profile
            # distinct per-rep stream: the epoch key seeds the on-device
            # shuffle and dropout, so reps must not share it
            epoch_key = jax.random.fold_in(jax.random.PRNGKey(rep), epoch)
            if detector is not None:
                # out-of-band barrier BEFORE the epoch's first collective: a
                # peer that died since the last check raises a prompt
                # PeerFailure here instead of wedging this process inside
                # the fabric (parallel/fault.py barrier docstring)
                detector.barrier(f"rep{rep}_ep{epoch}")
            if cfg.profile_dir and epoch == 1 and rep == 0:
                with jax.profiler.trace(cfg.profile_dir):
                    state, loss = trainer.train_epoch(state, host_rng,
                                                      epoch_key)
                print(f"wrote profiler trace to {cfg.profile_dir}")
            else:
                state, loss = trainer.train_epoch(state, host_rng, epoch_key)
            if detector is not None:
                detector.check()
            if (epoch + 1) % cfg.eval_steps == 0:
                results = test(trainer, state, cfg, eval_metric,
                               train_split=getattr(trainer, "train_eval_split",
                                                   "train"))
                for key, result in results.items():
                    train_res, tmp_val, tmp_test = (list(result) + [0.0])[:3]
                    if tmp_val > val_res:
                        val_res, test_res, best_epoch = tmp_val, tmp_test, epoch
                    # per-rep metric dict mirrors the reference's wandb keys
                    # (run.py:82-88)
                    logger.log({f"rep{rep}_loss": loss,
                                f"rep{rep}_Train{key}": 100 * train_res,
                                f"rep{rep}_Val{key}": 100 * val_res,
                                f"rep{rep}_tmp_val{key}": 100 * tmp_val,
                                f"rep{rep}_tmp_test{key}": 100 * tmp_test,
                                f"rep{rep}_Test{key}": 100 * test_res,
                                f"rep{rep}_best_epoch": best_epoch,
                                f"rep{rep}_epoch_time": time.time() - t0},
                               # globally monotonic across reps: wandb drops
                               # rows whose step goes backwards, which would
                               # silently lose every rep>=1 series
                               step=rep * cfg.epochs + epoch)
                    print(key)
                    print(f"Epoch: {epoch:02d}, Best epoch: {best_epoch}, "
                          f"Loss: {loss:.4f}, Train: {100 * train_res:.2f}%, "
                          f"Valid: {100 * val_res:.2f}%, "
                          f"Test: {100 * test_res:.2f}%, "
                          f"epoch time: {time.time() - t0:.1f}")
            if (cfg.checkpoint_every and cfg.checkpoint_dir and rep == 0
                    and (epoch + 1) % cfg.checkpoint_every == 0):
                # AFTER this epoch's eval so the sidecar meta carries the
                # best-val tracking including it.  ALL processes call save:
                # orbax coordinates internally (primary host writes; a
                # process-0-only call would hang in orbax's own
                # multi-process barrier)
                from subgraph_sketching_tpu.train.checkpoint import (
                    save_checkpoint, save_run_meta,
                )
                save_checkpoint(cfg.checkpoint_dir, state, step=epoch + 1)
                if jax.process_index() == 0:
                    save_run_meta(cfg.checkpoint_dir, epoch + 1, {
                        "val_res": float(val_res), "test_res": float(test_res),
                        "train_res": float(train_res),
                        "best_epoch": int(best_epoch)})
        if start_epoch >= cfg.epochs and cfg.epochs > 0:
            # resumed from a checkpoint at/past cfg.epochs (e.g. one written
            # by --save_model after a completed run): the loop body never
            # ran.  Evaluate the restored state instead of silently
            # reporting zeros.
            print(f"checkpoint step {start_epoch} >= epochs {cfg.epochs}; "
                  f"evaluating restored state")
            results = test(trainer, state, cfg, eval_metric,
                           train_split=getattr(trainer, "train_eval_split",
                                               "train"))
            for key, result in results.items():
                train_res, tmp_val, tmp_test = (list(result) + [0.0])[:3]
                if tmp_val > val_res:
                    val_res, test_res = tmp_val, tmp_test
        results_list.append([test_res, val_res, train_res])
        if cfg.reps > 1:
            for idx, res in enumerate(results_list):
                print(f"repetition {idx}: test {res[0]:.2f}, val {res[1]:.2f}, "
                      f"train {res[2]:.2f}")
    if cfg.reps > 1:
        arr = np.array(results_list) * 100
        print({"test_mean": arr[:, 0].mean(), "val_mean": arr[:, 1].mean(),
               "train_mean": arr[:, 2].mean(),
               "test_acc_std": arr[:, 0].std(), "val_acc_std": arr[:, 1].std()})
    if cfg.save_model and cfg.checkpoint_dir:
        from subgraph_sketching_tpu.train.checkpoint import save_checkpoint
        path = save_checkpoint(cfg.checkpoint_dir, state, step=cfg.epochs)
        print(f"saved checkpoint to {path}")
    logger.finish()
    if detector is not None:
        detector.stop()
    return results_list


def make_parser() -> argparse.ArgumentParser:
    """Flags mirror reference run.py:147-261 (same names/defaults)."""
    parser = argparse.ArgumentParser(
        description="Efficient Link Prediction with Hashes (ELPH) — TPU-native")
    defaults = Config()
    for f in dataclasses.fields(Config):
        name = f"--{f.name}"
        default = getattr(defaults, f.name)
        if f.name == "use_wandb_offline":
            # the reference spells the flag --wandb_offline with dest
            # use_wandb_offline (run.py:243); accept both
            parser.add_argument("--wandb_offline", name,
                                dest="use_wandb_offline", type=str2bool,
                                nargs="?", const=True, default=default)
            continue
        if f.name == "mesh_shape":
            parser.add_argument(name, type=lambda s: [int(x) for x in
                                                      s.split(",")],
                                default=None,
                                help="device mesh, e.g. '8' or '4,2'")
            continue
        if f.name == "mesh_axes":
            parser.add_argument(name, type=lambda s: s.split(","),
                                default=["data"])
            continue
        if isinstance(default, bool):
            # nargs="?": both the reference's store_true style
            # (`--cache_subgraph_features`, README.md:77) and the sweepable
            # `--use_feature 0` style parse
            parser.add_argument(name, type=str2bool, nargs="?", const=True,
                                default=default)
        elif f.type in ("float", float) or isinstance(default, float):
            parser.add_argument(name, type=float, default=default)
        elif isinstance(default, int):
            parser.add_argument(name, type=int, default=default)
        elif default is None and "int" in str(f.type):
            # Optional[int] fields (max_nodes_per_hop, sample_size): the
            # string fallback silently produced '50' instead of 50 and
            # crashed the native SEAL extractor downstream
            parser.add_argument(name, type=int, default=None)
        else:
            parser.add_argument(name, type=str, default=default)
    return parser


def config_from_parsed(args) -> Config:
    """Parsed-args -> Config, including the negative-means-unlimited
    normalization for the sample-count fields (the reference CLI's -1
    sentinel).  Shared with tools/repro_baseline.py so reproduction runs
    get the exact semantics of this CLI."""
    d = vars(args)
    for k in ("train_samples", "val_samples", "test_samples",
              "train_cache_size"):
        if d[k] is not None and d[k] < 0:
            d[k] = inf
    return Config(**d)


def main(argv=None):
    cfg = config_from_parsed(make_parser().parse_args(argv))
    from subgraph_sketching_tpu.metrics_logging import apply_sweep_overrides
    cfg = apply_sweep_overrides(cfg)  # reference wandb_setup.py:31
    if cfg.platform:
        # config.update is the reliable way to force a platform here: the
        # axon sitecustomize imports jax at interpreter start, which latches
        # platform state before env vars set later can take effect
        jax.config.update("jax_platforms", cfg.platform)
    print(cfg)
    return run(cfg)


if __name__ == "__main__":
    main()
