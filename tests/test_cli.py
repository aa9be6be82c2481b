"""CLI-compatibility tests: every reproduction command from the reference
README (README.md:69-80) must parse through our generated parser with the
same flag spellings — including store_true-style bare booleans, the
``--dataset`` prefix abbreviation, and the ``--wandb_offline`` alias."""

import shlex

from subgraph_sketching_tpu.runners.run import make_parser

# reference README.md:69-80 verbatim, minus the ogbl-ppa line which is
# broken in the reference itself ("----use_zero_one 1 model BUDDY")
REFERENCE_COMMANDS = [
    "--dataset_name Cora --model ELPH",
    "--dataset_name Cora --model BUDDY",
    "--dataset_name Citeseer --model ELPH",
    "--dataset_name Citeseer --model BUDDY",
    "--dataset_name Pubmed --max_hash_hops 3 --feature_dropout 0.2 "
    "--model ELPH",
    "--dataset_name Pubmed --max_hash_hops 3 --feature_dropout 0.2 "
    "--model BUDDY",
    "--dataset_name ogbl-collab --K 50 --lr 0.01 --feature_dropout 0.05 "
    "--add_normed_features 1 --label_dropout 0.1 --batch_size 2048 "
    "--year 2007 --model ELPH",
    "--dataset_name ogbl-collab --K 50 --lr 0.02 --feature_dropout 0.05 "
    "--add_normed_features 1 --cache_subgraph_features --label_dropout 0.1 "
    "--year 2007 --model BUDDY",
    "--dataset ogbl-ddi --K 20 --train_node_embedding "
    "--propagate_embeddings --label_dropout 0.25 --epochs 150 "
    "--hidden_channels 256 --lr 0.0015 --num_negs 6 --use_feature 0 "
    "--sign_k 2 --batch_size 131072 --model ELPH",
    "--dataset ogbl-ddi --K 20 --train_node_embedding "
    "--propagate_embeddings --label_dropout 0.25 --epochs 150 "
    "--hidden_channels 256 --lr 0.0015 --num_negs 6 --use_feature 0 "
    "--sign_k 2 --cache_subgraph_features --batch_size 131072 --model BUDDY",
    "--dataset ogbl-citation2 --hidden_channels 128 --num_negs 5 "
    "--lr 0.0005 --sign_dropout 0.2 --feature_dropout 0.7 "
    "--label_dropout 0.8 --sign_k 3 --batch_size 261424 "
    "--eval_batch_size 522848 --cache_subgraph_features --model BUDDY",
]


def test_reference_readme_commands_parse():
    parser = make_parser()
    for cmd in REFERENCE_COMMANDS:
        args = parser.parse_args(shlex.split(cmd))
        assert args.model in ("ELPH", "BUDDY")


def test_bare_and_valued_booleans():
    parser = make_parser()
    a = parser.parse_args(["--cache_subgraph_features"])
    assert a.cache_subgraph_features is True
    a = parser.parse_args(["--cache_subgraph_features", "0"])
    assert a.cache_subgraph_features is False
    a = parser.parse_args(["--use_feature", "0"])
    assert a.use_feature is False


def test_wandb_offline_alias():
    parser = make_parser()
    assert parser.parse_args(["--wandb_offline"]).use_wandb_offline is True
    assert parser.parse_args(
        ["--use_wandb_offline", "0"]).use_wandb_offline is False


def test_reps_and_sweep_flags_parse():
    # leaderboard protocol (README.md:100-104) and sweep surface
    parser = make_parser()
    a = parser.parse_args(["--dataset_name", "Cora", "--model", "BUDDY",
                           "--reps", "10", "--wandb_sweep"])
    assert a.reps == 10 and a.wandb_sweep is True


def test_heuristics_runner_reference_flags(tmp_path):
    """The reference heuristics CLI surface (run_heuristics.py:110-120)
    parses here too: wandb_entity/wandb_project/sample_size/reps, with
    summaries mirrored to the JSONL sink via --run_dir."""
    import json
    import os

    from subgraph_sketching_tpu.runners import run_heuristics

    run_dir = str(tmp_path / "heur")
    results = run_heuristics.main([
        "--dataset_name", "synth-ba", "--reps", "1", "--heuristics", "CN",
        "--wandb_entity", "link-prediction", "--wandb_project",
        "link-prediction", "--sample_size", "5", "--run_dir", run_dir,
    ])
    assert "CN" in results and "CN_test_mean" in results["CN"]
    lines = [json.loads(l) for l in
             open(os.path.join(run_dir, "metrics.jsonl"))]
    assert any("CN_test_mean" in rec for rec in lines)


def test_heuristics_extra_k_rides_along():
    """With --K differing from the reference's dataset-specific K, the
    heuristics runner also reports Hits@K so the tier is comparable with
    model rows scored at cfg.K (QUALITY artifact comparability)."""
    from subgraph_sketching_tpu.config import Config
    from subgraph_sketching_tpu.runners import run_heuristics

    res = run_heuristics.run(Config(dataset_name="synth-ba", reps=1, K=50),
                             heuristics=("CN",))
    assert "CN_test_mean" in res["CN"]            # reference-protocol K=100
    assert "CN_hits50_test_mean" in res["CN"]     # cfg.K rides along
    res100 = run_heuristics.run(Config(dataset_name="synth-ba", reps=1),
                                heuristics=("CN",))
    assert not any("hits" in k for k in res100["CN"])  # K==100: no extra


def test_optional_int_flags_parse_as_int():
    """--max_nodes_per_hop 50 must parse to int(50), not '50' (the string
    fallback for Optional[int] fields crashed the native SEAL extractor)."""
    from subgraph_sketching_tpu.runners.run import make_parser
    args = make_parser().parse_args(
        ["--max_nodes_per_hop", "50", "--sample_size", "7"])
    assert args.max_nodes_per_hop == 50
    assert args.sample_size == 7
    defaults = make_parser().parse_args([])
    assert defaults.max_nodes_per_hop is None
    assert defaults.sample_size is None


def test_resume_past_final_epoch_evaluates(tmp_path):
    """Resuming from a checkpoint at/past --epochs must evaluate the
    restored state (with the sidecar's best-val tracking), not silently
    report zeros after skipping the whole epoch loop."""
    from subgraph_sketching_tpu.runners.run import main

    ck = str(tmp_path / "ck")
    base = ["--dataset_name", "synth-ba", "--model", "BUDDY",
            "--hidden_channels", "16", "--batch_size", "256",
            "--eval_batch_size", "1024", "--epochs", "2", "--K", "20",
            "--platform", "cpu", "--checkpoint_dir", ck,
            "--checkpoint_every", "1"]
    first = main(base)
    resumed = main(base + ["--resume", "1"])
    assert first[0][1] > 0.0          # sanity: the run learned something
    # restored-state eval + restored meta == the uninterrupted run's result
    assert resumed == first


def test_hops_only_sketches_runner_equality():
    """--hops_only_sketches must not change any number: the feature math
    reads hops 1..K either way, so the full runner's metrics are equal."""
    from subgraph_sketching_tpu.runners.run import main
    res = {}
    for flag in ("0", "1"):
        res[flag] = main(["--dataset_name", "synth-ba", "--model", "BUDDY",
                          "--hidden_channels", "16", "--batch_size", "256",
                          "--eval_batch_size", "1024", "--epochs", "2",
                          "--K", "20", "--platform", "cpu",
                          "--hops_only_sketches", flag])
    assert res["0"] == res["1"]
