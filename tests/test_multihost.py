"""Execution coverage for parallel/multihost.py (VERDICT r2 #5).

The sharded pipelines are tested on a single-process 8-device virtual
mesh elsewhere; this file exercises the actual `jax.distributed`
bring-up with TWO OS processes over localhost (CPU + Gloo collectives),
proving `multihost.initialize` + `global_mesh` produce a working
host-spanning mesh — the "same code, bigger mesh" claim, executed.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

WORKER = Path(__file__).with_name("multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_mesh():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(WORKER.parent.parent),
        )
        for pid in range(2)
    ]
    outs = []
    for pid, pr in enumerate(procs):
        try:
            out, _ = pr.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for p2 in procs:
                p2.kill()
            raise
        outs.append(out)
        assert pr.returncode == 0, f"proc {pid} failed:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, out
