"""Multi-process tests for catears_tpu.parallel.distributed.

Spawns real OS processes (CPU backend, Gloo collectives through the JAX
coordination service) — the same jax.distributed path a TPU pod slice
uses, minus the ICI.  Covers initialize(), local_batch_slice() and
global_sum() across 2 processes x 2 virtual devices each.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from catears_tpu.parallel import distributed

distributed.initialize(f"localhost:{port}", num_processes=n, process_id=pid)
assert jax.process_count() == n, jax.process_count()

# mesh (and anything creating device values) only AFTER initialize
from catears_tpu.parallel.mesh import make_mesh

# Deterministic contiguous split of a non-divisible global batch
lo, hi = distributed.local_batch_slice(5)
assert (lo, hi) == ((0, 3) if pid == 0 else (3, 5)), (pid, lo, hi)
lo, hi = distributed.local_batch_slice(4)
assert (lo, hi) == ((0, 2) if pid == 0 else (2, 4)), (pid, lo, hi)

# Cross-process metric reduction
total = distributed.global_sum(float(pid) + 1.5)
assert abs(total - 4.0) < 1e-9, total

# make_mesh sees all GLOBAL devices (2 procs x 2 local = 4)
mesh = make_mesh()
assert mesh.devices.size == 4, mesh.devices.size
print(f"worker {pid} ok")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_init_slice_and_sum(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))
    procs = [
        subprocess.Popen([sys.executable, str(script), str(i), "2",
                          str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i} ok" in out


def test_single_process_noop():
    """num_processes<=1 must not touch jax.distributed (already inited
    sessions would raise)."""
    from catears_tpu.parallel import distributed

    distributed.initialize(num_processes=1)  # must be a no-op
    lo, hi = distributed.local_batch_slice(7)
    assert (lo, hi) == (0, 7)
    assert distributed.global_sum(2.5) == 2.5
