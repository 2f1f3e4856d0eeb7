"""Multi-host bootstrap: process-count=1 smoke of the jax.distributed
path (SURVEY §7 step 8 — the mpirun/MpiAdam analog).

A real pod cannot run here; what can is the full code path — env-var
bootstrap, coordination-service join, host-major mesh construction, and
the integrated trainer stepping over it — in a subprocess with world
size 1 (the same pattern as the reference's single-node MPI tests,
test_mpi_adam.py / test_no_mpi.py)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_multihost_smoke_one_process():
    env = dict(os.environ)
    env.update({
        "DCARL_NUM_PROCESSES": "1",
        "DCARL_PROCESS_ID": "0",
        "DCARL_COORDINATOR": "localhost:18476",
        "JAX_PLATFORMS": "cpu",
        # NOTE: under jax.distributed the CPU backend ignores
        # --xla_force_host_platform_device_count (one device per
        # process) — the mesh-vs-device-count contract is covered by
        # test_host_device_mesh_shapes below instead.
        "JAX_COMPILATION_CACHE_DIR": "/tmp/dcarl_jax_cache",
    })
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", "train_multihost.py"),
         "--smoke"],
        env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-3000:]
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 2, out.stdout
    import json
    import math

    rec = json.loads(lines[-1])
    assert rec["processes"] == 1
    assert rec["devices"] >= 1
    assert rec["step"] == 8
    assert math.isfinite(rec["loss"])
    assert rec["reward_mean"] > 0.0


def test_host_device_mesh_shapes():
    """In-process: the mesh builders agree with process/device counts."""
    import jax

    from dcarl_tpu.parallel.distributed import (host_device_mesh,
                                                host_device_mesh_2d)

    m1 = host_device_mesh("env")
    assert m1.shape["env"] == len(jax.devices())
    m2 = host_device_mesh_2d()
    assert m2.shape["host"] == jax.process_count()
    assert m2.shape["device"] == jax.local_device_count()
    assert m2.shape["host"] * m2.shape["device"] == len(jax.devices())
