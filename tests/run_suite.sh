#!/usr/bin/env bash
# The supported full-suite invocation (round-5 verdict item 6).
#
# `pytest tests/` in ONE process is green most runs (round 5 recorded a
# full 235-test single-process pass in 29m26s with PYTHONFAULTHANDLER=1),
# but both round-4 judging and round-5 building each saw ONE intermittent
# `Fatal Python error: Aborted` (SIGABRT) inside eager `jax
# apply_primitive` on the virtual 8-device CPU mesh — deep in the XLA CPU
# client, after dozens of green tests, non-deterministic, and not
# reproduced on demand.  Until the upstream trigger is isolated, CI runs
# the suite as TWO pytest processes: the split bounds the per-process
# accumulation (compiled programs, client threads) that correlates with
# the aborts, and a crash loses one half's results instead of the whole
# run.  The halves are DERIVED from the tests/ directory (alternating
# over the sorted file list), so new test files are never silently
# excluded.
#
# Usage:  bash tests/run_suite.sh          (from the repo root)
set -uo pipefail
export XLA_FLAGS="${XLA_FLAGS:---xla_force_host_platform_device_count=8}"
export PYTHONFAULTHANDLER=1   # a SIGABRT must leave a stack, not a shrug

half1=()
half2=()
i=0
for f in $(ls tests/test_*.py | sort); do
  if (( i % 2 == 0 )); then half1+=("$f"); else half2+=("$f"); fi
  i=$((i + 1))
done

rc=0
python -m pytest "${half1[@]}" -q "$@" || rc=$?
python -m pytest "${half2[@]}" -q "$@" || rc=$?
exit $rc
