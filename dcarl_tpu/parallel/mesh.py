"""Device-mesh helpers.

The reference's distribution story is MPI allreduce + subprocess pipes +
TCP sockets (SURVEY.md §2.5).  On TPU all of it becomes one SPMD
program over a ``jax.sharding.Mesh``: env batches shard over the mesh,
the confidence dataset shards over the same devices, and statistics /
gradients combine with ``psum``/``pmean`` over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_name: str = "env",
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """1-D mesh over all (or the given) devices — env-batch data
    parallelism, the layout that matches this workload (SURVEY.md §5:
    scale comes from env-batch sharding, not seq-dim sharding)."""
    devs = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devs, (axis_name,))


def shard_leading(x, mesh: Mesh, axis_name: str = "env"):
    """Place an array (or pytree) with its leading axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), x)


def replicate(x, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), x)
