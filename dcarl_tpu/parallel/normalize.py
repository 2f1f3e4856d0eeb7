"""Running observation/return normalization, single- and multi-device.

Re-design of the SB fork's ``RunningMeanStd`` (parallel-variance merge,
stable_baselines/common/running_mean_std.py:5-37), ``VecNormalize``
(common/vec_env/vec_normalize.py), and the MPI variants
(``mpi_moments``/``mpi_running_mean_std``): the cross-process
``MPI.Allreduce`` becomes ``lax.psum`` over a mesh axis inside
``shard_map``, so distributed statistics are exact (not per-worker
approximations) with one small collective.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class RunningMeanStd(NamedTuple):
    mean: jax.Array
    var: jax.Array
    count: jax.Array  # scalar (float, starts at epsilon)


def rms_init(shape, epsilon: float = 1e-4, dtype=jnp.float32) -> RunningMeanStd:
    return RunningMeanStd(
        mean=jnp.zeros(shape, dtype),
        var=jnp.ones(shape, dtype),
        count=jnp.asarray(epsilon, dtype),
    )


def rms_update_from_moments(rms: RunningMeanStd, batch_mean, batch_var,
                            batch_count) -> RunningMeanStd:
    """Chan et al. parallel-variance merge — the exact update of
    running_mean_std.py:21-37."""
    batch_mean = jnp.asarray(batch_mean, rms.mean.dtype)
    batch_var = jnp.asarray(batch_var, rms.var.dtype)
    batch_count = jnp.asarray(batch_count, rms.count.dtype)
    delta = batch_mean - rms.mean
    tot = rms.count + batch_count
    new_mean = rms.mean + delta * batch_count / tot
    m_a = rms.var * rms.count
    m_b = batch_var * batch_count
    m2 = m_a + m_b + delta ** 2 * rms.count * batch_count / tot
    return RunningMeanStd(mean=new_mean, var=m2 / tot, count=tot)


def rms_update(rms: RunningMeanStd, batch: jax.Array) -> RunningMeanStd:
    """Update from a local [B, ...] batch."""
    return rms_update_from_moments(
        rms, jnp.mean(batch, axis=0), jnp.var(batch, axis=0),
        jnp.asarray(batch.shape[0], rms.count.dtype))


def rms_update_distributed(rms: RunningMeanStd, local_batch: jax.Array,
                           axis_name: str) -> RunningMeanStd:
    """Cross-device exact moments via psum (mpi_moments.py:1-71
    capability): call inside shard_map/pmap with the batch sharded on
    ``axis_name``."""
    n_local = local_batch.shape[0]
    s = jax.lax.psum(jnp.sum(local_batch, axis=0), axis_name)
    ss = jax.lax.psum(jnp.sum(local_batch ** 2, axis=0), axis_name)
    n = jax.lax.psum(jnp.asarray(n_local, local_batch.dtype), axis_name)
    mean = s / n
    var = jnp.maximum(ss / n - mean ** 2, 0.0)
    return rms_update_from_moments(rms, mean, var, n)


class VecNormalizeState(NamedTuple):
    """VecNormalize (obs + discounted-return normalization)."""

    obs_rms: RunningMeanStd
    ret_rms: RunningMeanStd
    returns: jax.Array  # [B] running discounted returns


def vec_normalize_init(obs_shape, batch: int) -> VecNormalizeState:
    return VecNormalizeState(
        obs_rms=rms_init(obs_shape),
        ret_rms=rms_init(()),
        returns=jnp.zeros((batch,)),
    )


def normalize_obs(state: VecNormalizeState, obs, clip: float = 10.0,
                  epsilon: float = 1e-8):
    return jnp.clip(
        (obs - state.obs_rms.mean) / jnp.sqrt(state.obs_rms.var + epsilon),
        -clip, clip)


def normalize_reward(state: VecNormalizeState, reward, clip: float = 10.0,
                     epsilon: float = 1e-8):
    return jnp.clip(reward / jnp.sqrt(state.ret_rms.var + epsilon),
                    -clip, clip)


def vec_normalize_update(state: VecNormalizeState, obs, reward, done,
                         gamma: float = 0.99) -> VecNormalizeState:
    """Track obs stats and discounted-return stats (vec_normalize.py
    step_wait semantics: returns reset where done)."""
    returns = state.returns * gamma + reward
    return VecNormalizeState(
        obs_rms=rms_update(state.obs_rms, obs),
        ret_rms=rms_update(state.ret_rms, returns),  # mean tracked, unused
        returns=jnp.where(done, 0.0, returns),
    )
