"""Multi-host execution: 2 JAX processes joined by jax.distributed, the
sharded streaming step spanning both, with the halo ppermute crossing
the process boundary (SURVEY §5 "Distributed communication backend").
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

WORKER = pathlib.Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _spawn(process_id: int, port: int, n_local: int) -> subprocess.Popen:
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # the worker sets its own device count
    env.pop("JAX_PLATFORMS", None)
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(process_id), str(port), str(n_local)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
        cwd=str(WORKER.parent),
    )


@pytest.mark.parametrize("n_local", [2])
def test_two_process_sharded_step(n_local):
    """Both processes run the sharded step over a global mesh; each
    verifies its own output shards against a local single-device
    reference.  Shard n_local-1 (process 0) receives its halo from shard
    n_local (process 1), so a pass proves the exchange crossed DCN (the
    Gloo transport on this CPU rig)."""
    port = _free_port()
    procs = [_spawn(i, port, n_local) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"WORKER_OK {i}" in out, f"process {i} output:\n{out}"
