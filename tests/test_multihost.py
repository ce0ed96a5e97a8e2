"""2-process multi-host smoke test over virtual CPU devices.

Exercises ``parallel.sharding.init_multihost`` (jax.distributed) end to end:
two OS processes, 4 virtual devices each, one 8-device global mesh, one
replicated-params / sharded-batch grad step whose all-reduced loss+grad must
match a full-batch numpy oracle in both processes. The reference has no
distributed path (SURVEY §2.4); this pins the framework's multi-host entry.
"""
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_step():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    port = str(_free_port())
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", port],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            cwd=root, env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out
    # both processes computed the identical global loss
    l0 = outs[0].split("MULTIHOST_OK 0 ")[1].split()[0]
    l1 = outs[1].split("MULTIHOST_OK 1 ")[1].split()[0]
    assert l0 == l1
