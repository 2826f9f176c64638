"""Multi-process runtime test: 2 processes x 4 virtual CPU devices must
reproduce the single-process 8-device loss trajectory exactly.

This is the hardware-free stand-in for the reference's multi-rank NCCL
training (main.py:224,311-327; train.sh NCCL env): each subprocess calls
jax.distributed.initialize (gloo CPU collectives), feeds only its
host-local half of the global batch via make_array_from_process_local_data,
and runs the production train step over the global mesh. Rank 0's loss
trajectory must match the same computation on a single-process mesh.
"""
import importlib.util
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "_dist_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _load_worker_module():
    spec = importlib.util.spec_from_file_location("_dist_worker", WORKER)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_two_process_trajectory_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "losses.json"
    env = dict(os.environ)
    # workers set their own 4-device XLA flag; drop the harness's 8
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"  # never let workers touch the TPU tunnel
    logs = []
    procs = []
    for rank in (0, 1):
        log = open(tmp_path / f"rank{rank}.log", "w")
        logs.append(log)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, str(rank), "2", str(port), str(out)],
            cwd=ROOT, env=env, stdout=log, stderr=subprocess.STDOUT,
        ))
    try:
        for rank, p in enumerate(procs):
            rc = p.wait(timeout=900)  # 2 concurrent compiles on 1 core
            assert rc == 0, (
                f"rank {rank} failed:\n"
                + (tmp_path / f"rank{rank}.log").read_text()[-3000:]
            )
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
        for log in logs:
            log.close()

    dist_losses = json.loads(out.read_text())
    assert len(dist_losses) == 3

    # identical global computation on this process's single-controller
    # 8-virtual-device mesh (conftest.py)
    mod = _load_worker_module()
    ref_losses = mod.run_steps()
    np.testing.assert_allclose(dist_losses, ref_losses, rtol=2e-5, atol=1e-6)
