"""Confidence store sharded across a device mesh.

The dataset rows stripe across devices (each shard is an independent
local :class:`ConfidenceStore`); a box query broadcasts the query batch,
every shard reduces its partial (count, sum, sumsq) moments locally
(VPU mask + MXU contraction / Pallas kernel), and a single ``psum``
over ICI combines them — numerically identical to the single-device
store because the moments are additive.

This is the TPU-native form of "the confidence store grows with fleet
experience": inserts go to each env's local shard (zero cross-device
traffic on the write path), and reads pay one small [Q, 3] collective.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from dcarl_tpu.core.store import (ConfidenceStore, QueryStats, _raw_moments,
                                  moments_to_stats, store_init, store_insert)


class ShardedStore(NamedTuple):
    """S per-device stores stacked on a leading (sharded) axis."""

    keys: jax.Array     # [S, N_local, D]
    actions: jax.Array  # [S, N_local]
    values: jax.Array   # [S, N_local]
    size: jax.Array     # [S] i32
    head: jax.Array     # [S] i32

    @property
    def num_shards(self) -> int:
        return self.keys.shape[0]

    def local(self, s) -> ConfidenceStore:
        return ConfidenceStore(self.keys[s], self.actions[s], self.values[s],
                               self.size[s], self.head[s])


def sharded_store_init(mesh: Mesh, axis: str, capacity_total: int,
                       key_dim: int, dtype=jnp.float32) -> ShardedStore:
    s = mesh.shape[axis]
    n_local = -(-capacity_total // s)
    store = ShardedStore(
        keys=jnp.zeros((s, n_local, key_dim), dtype),
        actions=jnp.zeros((s, n_local), dtype),
        values=jnp.zeros((s, n_local), dtype),
        size=jnp.zeros((s,), jnp.int32),
        head=jnp.zeros((s,), jnp.int32),
    )
    shard = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, shard), store)


def _local_insert(keys_l, actions_l, values_l, size_l, head_l,
                  rec_keys, rec_actions, rec_values, rec_mask,
                  policy: str = "ring"):
    """Insert this shard's striped slice of the record batch (runs per
    device under shard_map; leading singleton shard axis)."""
    local = ConfidenceStore(keys_l[0], actions_l[0], values_l[0],
                            size_l[0], head_l[0])
    new = store_insert(local, rec_keys[0], rec_actions[0], rec_values[0],
                       rec_mask[0], policy=policy)
    return (new.keys[None], new.actions[None], new.values[None],
            new.size[None], new.head[None])


def sharded_insert(
    store: ShardedStore,
    mesh: Mesh,
    axis: str,
    keys: jax.Array,     # [M, D] record batch (replicated or host)
    actions: jax.Array,  # [M]
    values: jax.Array,   # [M]
    mask: jax.Array,     # [M]
    policy: str = "ring",
) -> ShardedStore:
    """Stripe the M records round-robin across shards and append
    locally, under the same full-store ``policy`` contract as
    :func:`dcarl_tpu.core.store.store_insert` (each shard applies it to
    its own capacity).  Records where ``mask`` is False are dropped."""
    s = store.num_shards
    m = keys.shape[0]
    m_pad = -(-m // s) * s
    pad = m_pad - m

    def pad0(x):
        return jnp.pad(x, [(0, pad)] + [(0, 0)] * (x.ndim - 1))

    # stripe: shard i takes rows i, i+S, i+2S, ...
    keys_s = pad0(keys).reshape(m_pad // s, s, -1).transpose(1, 0, 2)
    actions_s = pad0(actions).reshape(m_pad // s, s).T
    values_s = pad0(values).reshape(m_pad // s, s).T
    mask_s = pad0(mask).reshape(m_pad // s, s).T

    spec = P(axis)
    f = shard_map(
        partial(_local_insert, policy=policy), mesh=mesh,
        in_specs=(spec, spec, spec, spec, spec, spec, spec, spec, spec),
        out_specs=(spec, spec, spec, spec, spec),
    )
    out = f(store.keys, store.actions, store.values, store.size, store.head,
            keys_s, actions_s, values_s, mask_s)
    return ShardedStore(*out)


def sharded_query_stats(
    store: ShardedStore,
    mesh: Mesh,
    axis: str,
    queries: jax.Array,      # [Q, D] (replicated)
    half_widths: jax.Array,  # [D]
) -> QueryStats:
    """Box-query statistics over the union of all shards: local masked
    moments + one psum (the MPI-allreduce pattern of mpi_moments.py,
    re-designed as an ICI collective)."""

    def local_moments(keys_l, values_l, size_l, q, w):
        n_local = keys_l.shape[1]
        valid = (
            jax.lax.broadcasted_iota(jnp.int32, (n_local, 1), 0).squeeze(-1)
            < size_l[0]
        )
        part = _raw_moments(keys_l[0], values_l[0], valid, q, w)
        return jax.lax.psum(part, axis)

    f = shard_map(
        local_moments, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(), P()),
        out_specs=P(),
    )
    moments = f(store.keys, store.values, store.size, queries, half_widths)
    return moments_to_stats(moments)
