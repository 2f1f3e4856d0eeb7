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


_TWO_PROC_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
from dcarl_tpu.parallel.distributed import initialize_from_env, \\
    host_device_mesh
n = initialize_from_env()
assert n == 2, n
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

mesh = host_device_mesh("env")
f = shard_map(lambda x: jax.lax.psum(x, "env"), mesh=mesh,
              in_specs=P("env"), out_specs=P())
local = np.asarray([float(jax.process_index() + 1)], np.float32)
xs = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("env")), local)
out = np.asarray(jax.device_get(f(xs))).reshape(-1)[0]
print("RESULT", jax.process_index(), out, flush=True)
"""


def test_two_process_collective():
    """A REAL world-size-2 run of the bootstrap: two OS processes join
    the coordination service, build the host-major mesh, and a psum
    over the cross-process axis returns the global sum (1 + 2 = 3) on
    both ranks — the mpirun-Allreduce contract (mpi_adam.py:51) over
    jax.distributed, testable without a pod."""
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        script = os.path.join(tmp, "worker.py")
        with open(script, "w") as f:
            f.write(_TWO_PROC_WORKER.format(repo=REPO))
        procs = []
        for rank in range(2):
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)  # 1 device per process
            env.update({
                "DCARL_NUM_PROCESSES": "2",
                "DCARL_PROCESS_ID": str(rank),
                "DCARL_COORDINATOR": "localhost:18982",
                "JAX_PLATFORMS": "cpu",
            })
            procs.append(subprocess.Popen(
                [sys.executable, script], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
        outs = [p.communicate(timeout=300) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err[-2000:]
        for out, _ in outs:
            assert "RESULT" in out
            val = float(out.split("RESULT")[1].split()[1])
            assert val == 3.0, out


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


_TRAINER_PARITY_WORKER = """
import sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from dcarl_tpu.parallel.distributed import initialize_from_env, \\
    host_device_mesh
n = initialize_from_env()
assert n == 2, n
import json
import numpy as np
from dcarl_tpu.config import DCARLConfig, DQNConfig, driving_store_config
from dcarl_tpu.train_fast import make_trainer_fast

cfg = DCARLConfig(
    dqn=DQNConfig(batch_size=4, replay_capacity=128),
    store=driving_store_config(visited_times_thres=4,
                               rl_visited_times_min=2, n_step_window=2))
mesh = host_device_mesh("env")
assert mesh.shape["env"] == 2
init_fn, _, _, run_factory = make_trainer_fast(
    mesh, "env", cfg, batch_per_device=4, store_capacity_per_device=128,
    replay_capacity_per_device=128, use_pallas=False)
run_fn = run_factory(6)
state = init_fn(seed=0)
state, metrics = run_fn(state, jax.random.PRNGKey(5))
rec = {{k: np.asarray(v.addressable_data(0)).tolist()
       for k, v in metrics._asdict().items()}}
if jax.process_index() == 0:
    print("METRICS " + json.dumps(rec), flush=True)
"""


def test_two_process_trainer_parity():
    """World-size-2 run of the INTEGRATED trainer vs a single-process
    run over the same 2-way mesh and global batch: per-step metrics
    must agree — the reference's MpiAdam-vs-Adam equivalence pattern
    (test_mpi_adam.py, common/mpi_adam.py:8-121) applied to the whole
    DCARL step (plan + gate + store psum + pmean grads)."""
    import json
    import tempfile

    import numpy as np

    # --- reference: single process, same mesh shape / global batch
    import jax

    from dcarl_tpu.config import DCARLConfig, DQNConfig, driving_store_config
    from dcarl_tpu.parallel.mesh import make_mesh
    from dcarl_tpu.train_fast import make_trainer_fast

    cfg = DCARLConfig(
        dqn=DQNConfig(batch_size=4, replay_capacity=128),
        store=driving_store_config(visited_times_thres=4,
                                   rl_visited_times_min=2, n_step_window=2))
    mesh = make_mesh("env", jax.devices()[:2])
    init_fn, _, _, run_factory = make_trainer_fast(
        mesh, "env", cfg, batch_per_device=4, store_capacity_per_device=128,
        replay_capacity_per_device=128, use_pallas=False)
    state = init_fn(seed=0)
    _, ref_metrics = run_factory(6)(state, jax.random.PRNGKey(5))
    ref = {k: np.asarray(v) for k, v in ref_metrics._asdict().items()}

    # --- two OS processes over jax.distributed
    with tempfile.TemporaryDirectory() as tmp:
        script = os.path.join(tmp, "worker.py")
        with open(script, "w") as f:
            f.write(_TRAINER_PARITY_WORKER.format(repo=REPO))
        procs = []
        for rank in range(2):
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)  # 1 device per process
            env.update({
                "DCARL_NUM_PROCESSES": "2",
                "DCARL_PROCESS_ID": str(rank),
                "DCARL_COORDINATOR": "localhost:18983",
                "JAX_PLATFORMS": "cpu",
                "JAX_COMPILATION_CACHE_DIR": "/tmp/dcarl_jax_cache",
            })
            procs.append(subprocess.Popen(
                [sys.executable, script], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
        outs = [p.communicate(timeout=900) for p in procs]
        for p, (out, err) in zip(procs, outs):
            assert p.returncode == 0, err[-3000:]
        line = [l for l in outs[0][0].splitlines()
                if l.startswith("METRICS ")]
        assert line, outs[0][0]
        got = {k: np.asarray(v)
               for k, v in json.loads(line[0][len("METRICS "):]).items()}

    assert set(got) == set(ref)
    for k in ref:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=1e-5, atol=1e-5,
            err_msg=f"metric {k} diverged between world sizes")
    # the run must be non-trivial: envs moved and the store grew
    assert ref["reward_mean"][-1] > 0.0
    assert ref["store_rows"][-1] > 0
