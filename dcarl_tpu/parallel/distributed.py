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
