"""Distributed training utilities: collective gradient reduction and
the sharded end-to-end DCARL step.

The reference's ``MpiAdam`` flattens gradients, ``MPI.Allreduce``-sums
them, then applies Adam locally (common/mpi_adam.py:8-121, Allreduce at
:51).  Here the same data-parallel contract is ``lax.pmean`` inside the
jitted step: optax Adam stays untouched, gradients average over the
mesh axis, and every device applies the identical update — no parameter
drift, no flatten/unflatten, overlap handled by XLA.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def pmean_gradients(grads, axis_name: str):
    """The MpiAdam Allreduce, as one tree-wide pmean."""
    return jax.lax.pmean(grads, axis_name)


# ---------------------------------------------------------------------------
# Multi-host bootstrap (SURVEY §7 step 8)
# ---------------------------------------------------------------------------
#
# The reference scales across processes with mpirun + MPI.Allreduce
# (common/mpi_adam.py:8-121); the launcher provides rank/size and the
# optimizer allreduces over COMM_WORLD.  The TPU-native equivalent is
# jax.distributed: each host process joins a coordination service, after
# which jax.devices() spans every chip in the pod slice and one jitted
# SPMD program covers all of them — the "Allreduce" is just psum/pmean
# over a mesh axis, riding ICI (DCN only for the bootstrap handshake).


def initialize_from_env(require: bool = False) -> int:
    """Join the multi-host coordination service from environment
    variables; returns ``jax.process_count()`` afterwards.

    Env contract (the mpirun-rank analog):

    * ``DCARL_NUM_PROCESSES``  — world size (mandatory to opt in)
    * ``DCARL_PROCESS_ID``     — this host's rank (default 0)
    * ``DCARL_COORDINATOR``    — ``host:port`` of rank 0
                                 (default ``localhost:8476``, which is
                                 only valid for a 1-process smoke run)

    With none of these set: on a TPU pod runtime ``require=True`` asks
    jax.distributed to auto-detect (the Cloud TPU metadata path);
    otherwise this is a no-op and the program stays single-process.
    Calling again after initialization is a no-op.
    """
    import os

    if getattr(initialize_from_env, "_done", False):
        return jax.process_count()

    n = int(os.environ.get("DCARL_NUM_PROCESSES", "0"))
    if n > 0:
        jax.distributed.initialize(
            coordinator_address=os.environ.get("DCARL_COORDINATOR",
                                               "localhost:8476"),
            num_processes=n,
            process_id=int(os.environ.get("DCARL_PROCESS_ID", "0")),
        )
        initialize_from_env._done = True
    elif require:
        jax.distributed.initialize()  # TPU pod auto-detection
        initialize_from_env._done = True
    return jax.process_count()


def host_device_mesh(env_axis: str = "env"):
    """1-D global mesh over every device of every process, host-major.

    ``jax.devices()`` orders devices by process, so a 1-D env axis keeps
    each host's env shards on its own chips: the rule-driver scan stays
    collective-free per host, and the store-moment ``psum`` is the only
    cross-host traffic — a [Q, 3] reduction per decision tick.
    """
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.asarray(jax.devices()), (env_axis,))


def host_device_mesh_2d(host_axis: str = "host", device_axis: str = "device"):
    """(hosts, local devices) mesh for layouts that want the DCN/ICI
    boundary explicit — e.g. pmean over ``device_axis`` first (ICI),
    then ``host_axis`` (DCN), which XLA composes automatically when a
    spec names both axes."""
    import numpy as np
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()).reshape(
        jax.process_count(), jax.local_device_count())
    return Mesh(devs, (host_axis, device_axis))


def make_data_parallel_update(
    loss_fn: Callable,          # (params, batch) -> scalar loss
    tx: optax.GradientTransformation,
    mesh: Mesh,
    axis: str = "env",
):
    """Build a jitted data-parallel SGD step: batch sharded on ``axis``,
    params replicated, gradients pmean-reduced (MpiAdam equivalence —
    validated against a single-device step in tests, the same contract
    test_mpi_adam.py checks against TF Adam)."""

    def local_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    fn = shard_map(
        local_step, mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def tree_replicated_norm(tree) -> jax.Array:
    leaves = jax.tree.leaves(jax.tree.map(lambda a: jnp.sum(a * a), tree))
    return jnp.sqrt(sum(leaves))
