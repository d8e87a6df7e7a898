"""Real multi-process jax.distributed integration (CPU, 2 processes):
coordinator bring-up with bounded timeout, Gloo collective health check,
cross-process global batch assembly, sharded field op — the multi-host
runner path (SURVEY.md §2.3/§5) without a pod."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_distributed():
    port = _free_port()
    env = dict(os.environ)
    # one CPU device per process (drop the 8-virtual-device flag the suite
    # conftest sets); keep sitecustomize's plugin path harmless under cpu
    env["XLA_FLAGS"] = ""
    worker = os.path.join(os.path.dirname(__file__), "dist_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(i), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: distributed ok" in out, out
