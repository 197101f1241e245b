"""REAL multi-process multihost test: 2 JAX processes (4 virtual CPU
devices each) via jax.distributed — exercises the host collectives
(process_allgather shapes, reduce, broadcast), a cross-process XLA psum,
and disjoint per-host loader sharding. The rest of the suite covers
multi-DEVICE paths; this covers multi-HOST ones the identity fallbacks
skip."""

import pytest

pytestmark = pytest.mark.slow  # heavy compile / e2e / torch-golden (README: Tests)

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(port):
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["PYTHONPATH"] = REPO
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests/mp_worker.py"),
             str(port), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    return procs, outs


def test_two_process_collectives_and_loader_sharding():
    # the free-port probe is racy (closed before the coordinator binds);
    # retry once with a fresh port on a bind-looking failure
    for attempt in range(2):
        procs, outs = _run_workers(_free_port())
        ok = all(p.returncode == 0 for p in procs)
        if ok or attempt == 1 or not any(
                "bind" in o.lower() or "address" in o.lower() for o in outs):
            break
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"mp_worker {pid}: OK" in out
