"""The sharded Schur BA across TWO OS processes via jax.distributed.

Every other distributed artifact in this repo runs on a single-process
virtual mesh; this test exercises the actual multi-host bring-up path
(parallel/mesh.init_distributed -> jax.distributed.initialize, coordination
service on localhost, collectives crossing the process boundary) — the last
environment-available proxy for BASELINE.md's N-host scaling target.

Spawns tests/distributed_worker.py twice (2 virtual CPU devices each ->
a 4-device global mesh), each asserting parity of its addressable shards
against a process-local single-device solve.  Skipped where localhost
sockets are unavailable.
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_sharded_ba():
    try:
        port = _free_port()
    except OSError:
        pytest.skip("localhost sockets unavailable")
    coord = f"127.0.0.1:{port}"
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("JAX_PLATFORMS", "XLA_FLAGS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=420)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
        assert "PARITY_OK" in out, out
    # both processes saw the full 4-device mesh
    assert "devices=4" in outs[0] and "devices=4" in outs[1]
