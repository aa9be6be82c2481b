"""Failure detection (parallel/fault.py).

The reference has no fault story (SURVEY.md §5).  These tests prove the
heartbeat detector's semantics without needing a pod: live peers pass
``check()``, a dead peer raises ``PeerFailure`` naming the dead rank, the
startup barrier times out on an absent peer, and a real killed subprocess
is detected promptly by a surviving process (no hang).
"""

import os
import subprocess
import sys
import time

import pytest

from conftest import free_local_port
from subgraph_sketching_tpu.parallel.fault import (
    HeartbeatDetector,
    PeerFailure,
    maybe_start,
)


def test_live_peers_pass(tmp_path):
    d0 = HeartbeatDetector(str(tmp_path), 0, 2, interval=0.05, timeout=5.0)
    d1 = HeartbeatDetector(str(tmp_path), 1, 2, interval=0.05, timeout=5.0)
    d0.start()
    d1.start()
    try:
        d0.wait_all_started(startup_timeout=5.0)
        d1.wait_all_started(startup_timeout=5.0)
        for _ in range(3):
            d0.check()
            d1.check()
            time.sleep(0.1)
    finally:
        d0.stop()
        d1.stop()


def test_dead_peer_detected(tmp_path):
    d0 = HeartbeatDetector(str(tmp_path), 0, 2, interval=0.05, timeout=0.5)
    d1 = HeartbeatDetector(str(tmp_path), 1, 2, interval=0.05, timeout=0.5)
    d0.start()
    d1.start()
    d0.wait_all_started(startup_timeout=5.0)
    d1.stop()                       # rank 1 "dies"
    # backdate rank 1's heartbeat past the deadline
    stale = time.time() - 10.0
    os.utime(os.path.join(str(tmp_path), "hb_1"), (stale, stale))
    try:
        with pytest.raises(PeerFailure) as ei:
            d0.check()
        assert ei.value.dead == [1]
        assert "--resume" in str(ei.value)
    finally:
        d0.stop()


def test_vanished_heartbeat_file_detected(tmp_path):
    d0 = HeartbeatDetector(str(tmp_path), 0, 2, interval=0.05, timeout=0.5)
    d0.start()
    try:
        (tmp_path / "hb_1").write_text(str(time.time()))
        d0.check()
        os.remove(tmp_path / "hb_1")
        with pytest.raises(PeerFailure):
            d0.check()
    finally:
        d0.stop()


def test_startup_barrier_times_out(tmp_path):
    d0 = HeartbeatDetector(str(tmp_path), 0, 3, interval=0.05, timeout=1.0)
    d0.start()
    try:
        with pytest.raises(PeerFailure) as ei:
            d0.wait_all_started(startup_timeout=0.5)
        assert set(ei.value.dead) == {1, 2}
    finally:
        d0.stop()


def test_maybe_start_single_process_noop(tmp_path):
    # single jax process -> detector disabled regardless of directory
    assert maybe_start(str(tmp_path)) is None
    assert maybe_start(None) is None


def test_agree_min_two_threads(tmp_path):
    """agree_min returns the same minimum on every process — the resume-step
    agreement that keeps the epoch-barrier tag sequences identical when
    processes see different checkpoint filesystem states."""
    import threading

    d0 = HeartbeatDetector(str(tmp_path), 0, 2, interval=0.05, timeout=5.0)
    d1 = HeartbeatDetector(str(tmp_path), 1, 2, interval=0.05, timeout=5.0)
    d0.start()
    d1.start()
    out = {}
    try:
        t = threading.Thread(
            target=lambda: out.update(r1=d1.agree_min("rs", 7, timeout=10.0)))
        t.start()
        out["r0"] = d0.agree_min("rs", 3, timeout=10.0)
        t.join(timeout=10.0)
        assert out["r0"] == out["r1"] == 3
        # -1 ("no checkpoint visible") wins so nobody resumes
        t = threading.Thread(
            target=lambda: out.update(r1=d1.agree_min("rs2", -1,
                                                      timeout=10.0)))
        t.start()
        out["r0"] = d0.agree_min("rs2", 5, timeout=10.0)
        t.join(timeout=10.0)
        assert out["r0"] == out["r1"] == -1
    finally:
        d0.stop()
        d1.stop()


def test_agree_min_ignores_stale_files_from_previous_incarnation(tmp_path):
    """A restart that reuses the heartbeat dir sees the previous run's
    val_ files; reading one would make processes restore DIVERGENT
    checkpoints.  Backdated files must be ignored in favour of the fresh
    write."""
    import threading

    # previous incarnation left val files with DIFFERENT (wrong) values
    for pid, stale_val in ((0, 1), (1, 1)):
        f = tmp_path / f"val_rs_{pid}"
        f.write_text(str(stale_val))
        old = time.time() - 300.0
        os.utime(f, (old, old))

    d0 = HeartbeatDetector(str(tmp_path), 0, 2, interval=0.05, timeout=5.0)
    d1 = HeartbeatDetector(str(tmp_path), 1, 2, interval=0.05, timeout=5.0)
    d0.start()
    d1.start()
    out = {}
    try:
        t = threading.Thread(
            target=lambda: out.update(r1=d1.agree_min("rs", 7, timeout=10.0)))
        t.start()
        out["r0"] = d0.agree_min("rs", 5, timeout=10.0)
        t.join(timeout=10.0)
        # fresh agreement is min(5, 7) = 5; the stale 1s must not leak in
        assert out["r0"] == out["r1"] == 5
    finally:
        d0.stop()
        d1.stop()


def test_agree_min_absent_peer_times_out(tmp_path):
    d0 = HeartbeatDetector(str(tmp_path), 0, 2, interval=0.05, timeout=30.0)
    d0.start()
    try:
        with pytest.raises(PeerFailure):
            d0.agree_min("rs", 4, timeout=0.5)
    finally:
        d0.stop()


def test_latest_step_skips_orbax_tmp_dirs(tmp_path):
    """A crash mid-save leaves ``step_N.orbax-checkpoint-tmp-<ts>`` dirs;
    --resume must skip them (resume is exactly the crash-recovery path)."""
    from subgraph_sketching_tpu.train.checkpoint import latest_step

    (tmp_path / "step_3").mkdir()
    (tmp_path / "step_4.orbax-checkpoint-tmp-1723456789").mkdir()
    assert latest_step(str(tmp_path)) == 3
    (tmp_path / "step_10").mkdir()
    assert latest_step(str(tmp_path)) == 10


def test_run_meta_roundtrip(tmp_path):
    from subgraph_sketching_tpu.train.checkpoint import (
        load_run_meta, save_run_meta,
    )

    assert load_run_meta(str(tmp_path), 5) is None
    meta = {"val_res": 0.5, "test_res": 0.4, "train_res": 0.9,
            "best_epoch": 3}
    save_run_meta(str(tmp_path), 5, meta)
    assert load_run_meta(str(tmp_path), 5) == meta


_SURVIVOR = r"""
import sys, time
sys.path.insert(0, {repo!r})
from subgraph_sketching_tpu.parallel.fault import HeartbeatDetector, PeerFailure
det = HeartbeatDetector({hbdir!r}, 0, 2, interval=0.05, timeout=1.0)
det.start()
det.wait_all_started(startup_timeout=30.0)
deadline = time.time() + 30.0
while time.time() < deadline:            # the "training loop"
    try:
        det.check()
    except PeerFailure as e:
        print(f"DETECTED dead={{e.dead}}", flush=True)
        sys.exit(3)
    time.sleep(0.1)
print("TIMEOUT: peer death never detected", flush=True)
sys.exit(4)
"""

_VICTIM = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from subgraph_sketching_tpu.parallel.fault import HeartbeatDetector
det = HeartbeatDetector({hbdir!r}, 1, 2, interval=0.05, timeout=1.0)
det.start()
det.wait_all_started(startup_timeout=30.0)
time.sleep(0.5)
os._exit(1)                              # hard crash, no cleanup
"""


def test_two_process_kill_detected(tmp_path):
    """A surviving process notices a hard-crashed peer within the timeout
    and exits with a named error instead of hanging."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hbdir = str(tmp_path / "hb")
    scripts = []
    for name, src in [("survivor.py", _SURVIVOR), ("victim.py", _VICTIM)]:
        p = tmp_path / name
        p.write_text(src.format(repo=repo, hbdir=hbdir))
        scripts.append(str(p))
    survivor = subprocess.Popen([sys.executable, scripts[0]],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)
    victim = subprocess.Popen([sys.executable, scripts[1]])
    victim.wait(timeout=60)
    out, _ = survivor.communicate(timeout=60)
    assert survivor.returncode == 3, f"survivor output:\n{out}"
    assert "DETECTED dead=[1]" in out


def test_barrier_passes_and_detects(tmp_path):
    """barrier(): both peers arriving releases promptly; a peer that never
    arrives (heartbeat gone stale) raises PeerFailure instead of hanging."""
    import threading

    d0 = HeartbeatDetector(str(tmp_path), 0, 2, interval=0.05, timeout=0.6)
    d1 = HeartbeatDetector(str(tmp_path), 1, 2, interval=0.05, timeout=0.6)
    d0.start()
    d1.start()
    try:
        d0.wait_all_started(startup_timeout=5.0)
        t = threading.Thread(target=d1.barrier, args=("ep0",))
        t.start()
        d0.barrier("ep0")            # both arrive -> both release
        t.join(timeout=5)
        assert not t.is_alive()
        d1.stop()                    # rank 1 dies before the next barrier
        stale = time.time() - 10.0
        os.utime(os.path.join(str(tmp_path), "hb_1"), (stale, stale))
        with pytest.raises(PeerFailure) as ei:
            d0.barrier("ep1")
        assert ei.value.dead == [1]
    finally:
        d0.stop()
        d1.stop()


_DRILL_WORKER = r"""
import json, os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1])
epochs = int(sys.argv[2])
resume = sys.argv[3] == "resume"
crash_after = sys.argv[4] == "crash"
overrides = json.loads(sys.argv[5]) if len(sys.argv) > 5 else {{}}
jax.distributed.initialize({coord!r}, num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 4

from subgraph_sketching_tpu.config import Config
from subgraph_sketching_tpu.parallel.fault import PeerFailure
from subgraph_sketching_tpu.runners.run import run

base = dict(dataset_name="synth-ba", model="BUDDY", hidden_channels=16,
            batch_size=256, eval_batch_size=1024, K=20, epochs=epochs,
            mesh_shape=[4], mesh_axes=["data"],
            checkpoint_dir={ckpt!r}, checkpoint_every=1, resume=resume,
            # the fs heartbeat must fire BEFORE jax's own coordination
            # service declares the peer dead (~10s) and force-kills the
            # survivor with an uncatchable abseil FATAL
            heartbeat_dir={hbdir!r}, heartbeat_timeout=2.0)
base.update(overrides)
cfg = Config(**base)
try:
    run(cfg)
except PeerFailure as e:
    print(f"PEERFAILURE dead={{e.dead}}", flush=True)
    # os._exit: a normal exit would run jax.distributed's atexit shutdown
    # barrier, which can only fail against a dead peer (FATAL -> SIGABRT)
    os._exit(3)
print(f"proc {{pid}} finished {{epochs}} epochs", flush=True)
if crash_after:
    os._exit(1)      # hard crash, no detector/jax cleanup
"""


def _launch_drill(tmp_path, name, coord, ckpt, hbdir, args0, args1,
                  overrides=None):
    import json as _json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = tmp_path / f"{name}.py"
    path.write_text(_DRILL_WORKER.format(repo=repo, coord=coord, ckpt=ckpt,
                                         hbdir=hbdir))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    extra = [_json.dumps(overrides)] if overrides else []
    return [subprocess.Popen([sys.executable, str(path)] + a + extra,
                             stdout=subprocess.PIPE,
                             stderr=subprocess.STDOUT, env=env, text=True)
            for a in (args0, args1)]


def _final_state(ckpt_dir, step):
    from subgraph_sketching_tpu.train.checkpoint import restore_checkpoint
    state, got = restore_checkpoint(ckpt_dir, step=step)
    return state


@pytest.mark.skipif(os.environ.get("SKIP_MULTIPROCESS") == "1",
                    reason="multi-process test disabled")
def test_fault_drill_kill_resume_bitexact(tmp_path):
    """The full failure->recovery chain on the production runner, two real
    processes: train with per-epoch checkpoints, hard-kill one peer
    mid-run, assert the survivor raises PeerFailure (via the pre-epoch
    barrier — no hang), restart both processes with --resume, and assert
    the final checkpointed state is BIT-IDENTICAL to an uninterrupted
    run's.  (Per-epoch keys are fold_in(seed, epoch) and resume continues
    from the restored epoch, so the chain is exactly deterministic.)"""
    import numpy as np

    E = 4
    # phase A: uninterrupted 2-process run
    ck_a, hb_a = str(tmp_path / "ck_a"), str(tmp_path / "hb_a")
    procs = _launch_drill(tmp_path, "phase_a", f"127.0.0.1:{free_local_port()}", ck_a, hb_a,
                          ["0", str(E), "fresh", "no"],
                          ["1", str(E), "fresh", "no"])
    outs_a = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs_a)):
        assert p.returncode == 0, f"phase A proc {i}:\n{out[-3000:]}"

    # phase B: rank 1 hard-crashes after finishing epoch 2 (its own run is
    # 2 epochs long, then os._exit(1) with no cleanup); rank 0 wants E
    # epochs and must raise PeerFailure at the epoch-3 barrier
    ck_b, hb_b = str(tmp_path / "ck_b"), str(tmp_path / "hb_b")
    procs = _launch_drill(tmp_path, "phase_b", f"127.0.0.1:{free_local_port()}", ck_b, hb_b,
                          ["0", str(E), "fresh", "no"],
                          ["1", "2", "fresh", "crash"])
    outs = [p.communicate(timeout=600)[0] for p in procs]
    assert procs[0].returncode == 3, f"survivor:\n{outs[0][-3000:]}"
    assert "PEERFAILURE dead=[1]" in outs[0]
    assert procs[1].returncode == 1  # the hard crash

    # phase C: restart BOTH processes with --resume from ck_b
    procs = _launch_drill(tmp_path, "phase_c", f"127.0.0.1:{free_local_port()}", ck_b, hb_b,
                          ["0", str(E), "resume", "no"],
                          ["1", str(E), "resume", "no"])
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"phase C proc {i}:\n{out[-3000:]}"
    assert "resumed from checkpoint step 2" in outs[0]

    # final state bit-identical to the uninterrupted run
    import jax
    a = _final_state(ck_a, E)
    b = _final_state(ck_b, E)
    leaves_a = jax.tree.leaves(a)
    leaves_b = jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b) and len(leaves_a) > 0
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # and the ENTIRE final epoch line matches — including the running-best
    # Valid/Test/Best-epoch fields: the meta sidecar
    # (checkpoint.save_run_meta) restores best-val tracking across the
    # resume, so the resumed run reports the same best metrics as the
    # uninterrupted run, not a best over only its own remaining epochs
    def final_epoch_line(out):
        lines = [ln for ln in out.splitlines() if ln.startswith("Epoch: 03")]
        assert lines, out[-2000:]
        return lines[-1].rsplit(", epoch time", 1)[0]

    assert final_epoch_line(outs_a[0]) == final_epoch_line(outs[0])


@pytest.mark.skipif(os.environ.get("SKIP_MULTIPROCESS") == "1",
                    reason="multi-process test disabled")
def test_fault_drill_memory_sharded_elph(tmp_path):
    """Kill/resume bit-exactness on the CITATION2-SCALE configuration:
    ELPH --memory_sharded on a data x graph mesh across two processes.
    The node-sharded sketch state is rebuilt deterministically at startup
    (it is staged data, not checkpoint state), so resume must reproduce
    an uninterrupted run's final device state bit-for-bit here too."""
    import numpy as np

    E = 3
    ov = {"model": "ELPH", "mesh_shape": [1, 4],
          "mesh_axes": ["data", "graph"], "memory_sharded": True,
          "dataset_name": "synth-ws"}
    ck_a, hb_a = str(tmp_path / "ck_a"), str(tmp_path / "hb_a")
    procs = _launch_drill(tmp_path, "ms_a", f"127.0.0.1:{free_local_port()}", ck_a, hb_a,
                          ["0", str(E), "fresh", "no"],
                          ["1", str(E), "fresh", "no"], overrides=ov)
    outs_a = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs_a)):
        assert p.returncode == 0, f"phase A proc {i}:\n{out[-3000:]}"

    # rank 1 crashes after epoch 1; rank 0 raises PeerFailure; both resume
    ck_b, hb_b = str(tmp_path / "ck_b"), str(tmp_path / "hb_b")
    procs = _launch_drill(tmp_path, "ms_b", f"127.0.0.1:{free_local_port()}", ck_b, hb_b,
                          ["0", str(E), "fresh", "no"],
                          ["1", "1", "fresh", "crash"], overrides=ov)
    outs = [p.communicate(timeout=900)[0] for p in procs]
    assert procs[0].returncode == 3, f"survivor:\n{outs[0][-3000:]}"
    assert "PEERFAILURE dead=[1]" in outs[0]

    procs = _launch_drill(tmp_path, "ms_c", f"127.0.0.1:{free_local_port()}", ck_b, hb_b,
                          ["0", str(E), "resume", "no"],
                          ["1", str(E), "resume", "no"], overrides=ov)
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"phase C proc {i}:\n{out[-3000:]}"
    assert "resumed from checkpoint step 1" in outs[0]

    import jax
    a = _final_state(ck_a, E)
    b = _final_state(ck_b, E)
    leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(leaves_a) == len(leaves_b) and len(leaves_a) > 0
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
