"""Multi-process jax.distributed test (SURVEY.md section 4: 'N-process
jax.distributed on CPU backend').

Launches 2 REAL processes, each with 2 virtual CPU devices, wires them
through rten_tpu.parallel.distributed.init_distributed, and verifies
process topology, a cross-process collective, and a batch-sharded
Model.run (see tests/mp_worker.py for the worker body).
"""

import os
import socket
import subprocess
import sys

import pytest

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed():
    nprocs = 2
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "mp_worker.py"),
             str(pid), str(nprocs), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=os.path.dirname(_HERE),
        )
        for pid in range(nprocs)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER_{pid}_OK" in out, out[-3000:]
