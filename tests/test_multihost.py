"""Multi-process (multi-controller) runtime test: N local processes, each
with 2 virtual CPU devices, joined via jax.distributed — the same code
path as a real multi-host TPU slice, exercising cross-process
collectives (the reference has no distributed runtime at all; this is
the new scale-out capability, SURVEY.md section 2.4)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
@pytest.mark.parametrize("nproc", [2, 4])
def test_multiprocess_cpu_collectives(nproc):
    """2 procs = the minimal cross-process path; 4 procs x 2 devices = the
    (hosts x chips) shape of the BASELINE 1->4-host scaling target."""
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(nproc), str(pid)],
            env=env, cwd=root, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"pid {pid} failed:\n{out[-4000:]}"
        assert "MULTIHOST_OK" in out, out[-2000:]
