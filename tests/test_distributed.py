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


def test_init_dead_coordinator_fails_fast():
    """An unreachable coordinator must kill the worker within the bounded
    timeout (XLA aborts the process at the deadline — the fail-fast
    contract), not hang it."""
    import time

    port = _free_port()  # nothing listens here
    env = dict(os.environ)
    env["XLA_FLAGS"] = ""
    code = (
        "import jax, sys; jax.config.update('jax_platforms', 'cpu');"
        f"sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r});"
        "from ecsimd_tpu import parallel;"
        f"parallel.initialize_distributed(coordinator_address='127.0.0.1:{port}',"
        "num_processes=2, process_id=1, timeout_s=15)"
    )
    t0 = time.monotonic()
    p = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True, timeout=120
    )
    took = time.monotonic() - t0
    assert p.returncode != 0, "init against a dead coordinator must fail"
    assert took < 90, f"fail-fast took {took:.0f}s"
