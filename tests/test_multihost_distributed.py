"""Two-process jax.distributed test of the cross-host ordered gather.

Spawns two real Python processes coordinated over localhost (the
CPU-simulated multi-host setup of SURVEY.md §7 step 7) and checks that
``ordered_allgather_payloads`` reassembles ragged per-process payloads in
original block order — including the differing-payload-width case that
requires the global max-length padding.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(240)
def test_two_process_ordered_gather():
    coordinator = f"127.0.0.1:{_free_port()}"
    repo_root = os.path.dirname(os.path.dirname(_WORKER))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)  # one device per process is fine
    # The TPU-tunnel sitecustomize registers a backend at interpreter
    # start, which jax.distributed.initialize forbids; disable it for the
    # workers (they are CPU-only).
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, "2", str(i)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=repo_root,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=200)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outputs.append(out)
    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert "gather OK" in out
