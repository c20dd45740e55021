"""Multi-host smoke as a (skippable) pytest: 2 Gloo CPU processes, one
global mesh, one sharded generation step (VERDICT r1 #10 — promoted from
tools/multihost_smoke.py so CI exercises the jax.distributed path).

Runs in subprocesses (jax.distributed cannot re-init inside the test
process); skipped when the environment cannot bind localhost sockets or
under QWEN3_TTS_SKIP_MULTIHOST=1.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _can_bind() -> bool:
    try:
        s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        s.bind(("127.0.0.1", 0))
        s.close()
        return True
    except OSError:
        return False


@pytest.mark.skipif(
    os.environ.get("QWEN3_TTS_SKIP_MULTIHOST") == "1" or not _can_bind(),
    reason="multihost smoke disabled or no localhost sockets",
)
def test_two_process_gloo_smoke():
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)           # worker sets its own device count
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-3000:]
    assert "global devices: 8" in out, out[-3000:]


@pytest.mark.skipif(
    os.environ.get("QWEN3_TTS_SKIP_MULTIHOST") == "1" or not _can_bind(),
    reason="multihost smoke disabled or no localhost sockets",
)
def test_scaling_harness(tmp_path):
    """The 1-vs-2-process weak-scaling harness (VERDICT r2 #7) runs and
    reports throughput + efficiency. The CPU-Gloo analog's per-frame
    collective latency is ~1000x ICI's, so only the contract is asserted
    here — the >=90% BASELINE bar is what this harness measures on a pod."""
    import json

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_scaling.py"),
         "--steps", "4", "--reps", "2", "--port", "29461"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout + proc.stderr)[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["throughput_1p_audio_s_per_s"] > 0
    assert report["throughput_2p_audio_s_per_s"] > 0
    assert 0 < report["scaling_efficiency"] <= 1.5
