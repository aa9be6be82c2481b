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
