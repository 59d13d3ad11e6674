"""REAL multi-process jax.distributed validation (round 4).

Rounds 1-3 only ever validated sharding on a single-process fake-device
mesh; this spawns TWO actual processes that federate over
jax.distributed (gloo CPU collectives), each feeding its own shard of
the pair batch (jax.make_array_from_process_local_data in
parallel/sharded.py), and solves over the global ("pairs", "tile") mesh
spanning both — the closest this single-host environment can get to the
SURVEY §2.2 multi-host row.
"""

import json
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.parametrize("tile", [1, 2], ids=["pairs-only", "pairs-x-tile"])
def test_two_process_distributed_launch(tile):
    port = _free_port()
    procs = []
    for pid in (0, 1):
        env = {
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "JAX_PLATFORMS": "cpu",
            "PATH": "/usr/bin:/bin:/usr/local/bin",
        }
        import os

        env = {**os.environ, **env}
        procs.append(subprocess.Popen(
            [sys.executable, "-m",
             "inverse_compositional_algorithm_tpu.parallel.launch",
             "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(pid),
             "--platform", "cpu", "--tile", str(tile),
             "--batch-per-host", "4", "--height", "64", "--width", "96",
             "--nscales", "2", "--repeats", "1"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True))
    outs = [p.communicate(timeout=420) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"launch process failed:\n{err[-2000:]}"
    rec = json.loads([ln for ln in outs[0][0].splitlines()
                      if ln.startswith("{")][-1])
    assert rec["hosts"] == 2
    assert rec["devices"] == 8
    assert rec["errors_finite"] is True
    assert rec["batch_global"] == 8
