"""On-device replay buffers.

Re-design of the reference's buffers — ``NaivePrioritizedBuffer``
(prio^alpha sampling + importance weights,
Data_From_Carla/Agent/drl_library/dqn/replay_buffer.py:5-71) and the
dense ``Replay_Buffer`` (:73-157); also covers the SB fork's
``ReplayBuffer``/``PrioritizedReplayBuffer`` capability surface
(stable_baselines/common/replay_buffer.py).

TPU shape: fixed preallocated arrays, masked ring writes, and
prioritized sampling via per-draw Gumbel argmax — each of the B
independent ``argmax(log p + Gumbel)`` rows is one exact draw (with
replacement) from the prio^alpha / sum(prio^alpha) categorical that the
reference's cumulative-sum segment tree implements, with no tree and no
host round-trip.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Replay(NamedTuple):
    obs: jax.Array        # [N, D]
    action: jax.Array     # [N] i32
    reward: jax.Array     # [N]
    next_obs: jax.Array   # [N, D]
    done: jax.Array       # [N] f32
    priority: jax.Array   # [N] (>= 0; 0 for empty slots)
    size: jax.Array       # i32
    head: jax.Array       # i32


def replay_init(capacity: int, obs_dim: int, dtype=jnp.float32,
                action_shape: tuple = (), action_dtype=None) -> Replay:
    """Discrete by default (scalar i32 actions); pass
    ``action_shape=(A,)`` for continuous-control buffers (the fork's
    DDPG/TD3/SAC ReplayBuffer stores float action vectors)."""
    if action_dtype is None:
        action_dtype = jnp.int32 if action_shape == () else dtype
    return Replay(
        obs=jnp.zeros((capacity, obs_dim), dtype),
        action=jnp.zeros((capacity,) + tuple(action_shape), action_dtype),
        reward=jnp.zeros((capacity,), dtype),
        next_obs=jnp.zeros((capacity, obs_dim), dtype),
        done=jnp.zeros((capacity,), dtype),
        priority=jnp.zeros((capacity,), dtype),
        size=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
    )


def replay_push(
    replay: Replay,
    obs: jax.Array,       # [M, D]
    action: jax.Array,    # [M]
    reward: jax.Array,    # [M]
    next_obs: jax.Array,  # [M, D]
    done: jax.Array,      # [M]
    mask: jax.Array | None = None,
) -> Replay:
    """Masked batched append with max-priority init for new rows
    (NaivePrioritizedBuffer.push:13-27).

    Unmasked pushes whose batch divides the capacity take a contiguous
    ring-block write (dynamic_update_slice) instead of an M-row scatter
    — the lockstep trainer pushes a fixed [B] block every step, and a
    block write is a plain DMA while a scatter pays per-row index
    processing.  Falls back to the scatter when the head is unaligned
    (e.g. after interleaved masked pushes)."""
    capacity = replay.obs.shape[0]
    batch = obs.shape[0]
    max_prio = jnp.maximum(jnp.max(replay.priority), 1.0)
    dt = replay.obs.dtype
    fields = dict(
        obs=obs.astype(dt), action=action.astype(replay.action.dtype),
        reward=reward.astype(dt), next_obs=next_obs.astype(dt),
        done=done.astype(dt),
        priority=jnp.full(batch, max_prio, dt))

    def scatter(replay, m):
        mi = m.astype(jnp.int32)
        offsets = jnp.cumsum(mi) - mi
        slots = jnp.where(m, (replay.head + offsets) % capacity, capacity)
        n_new = jnp.sum(mi)
        return Replay(
            **{k: getattr(replay, k).at[slots].set(v, mode="drop")
               for k, v in fields.items()},
            # keep i32 under jax_enable_x64 (sum() promotes)
            size=jnp.minimum(replay.size + n_new, capacity).astype(jnp.int32),
            head=((replay.head + n_new) % capacity).astype(jnp.int32),
        )

    if mask is not None or capacity % batch != 0:
        return scatter(replay, jnp.ones(batch, bool) if mask is None
                       else mask)

    def dense(replay):
        def upd(buf, new):
            head = replay.head.astype(jnp.int32)
            start = (head,) + (jnp.zeros((), jnp.int32),) * (buf.ndim - 1)
            return jax.lax.dynamic_update_slice(buf, new, start)

        return Replay(
            **{k: upd(getattr(replay, k), v) for k, v in fields.items()},
            size=jnp.minimum(replay.size + batch, capacity).astype(jnp.int32),
            head=((replay.head + batch) % capacity).astype(jnp.int32),
        )

    aligned = (replay.head % batch) == 0
    return jax.lax.cond(aligned, dense,
                        lambda r: scatter(r, jnp.ones(batch, bool)), replay)


class Batch(NamedTuple):
    obs: jax.Array
    action: jax.Array
    reward: jax.Array
    next_obs: jax.Array
    done: jax.Array
    indices: jax.Array
    weights: jax.Array  # importance-sampling weights (max-normalized)


def replay_sample(
    replay: Replay,
    key: jax.Array,
    batch_size: int,
    alpha: float = 0.6,
    beta: float = 0.4,
) -> Batch:
    """Prioritized sample (NaivePrioritizedBuffer.sample:29-56):
    p_i = prio_i^alpha / sum, IS weights (N * p_i)^-beta normalized by
    their max.  alpha=0 degenerates to uniform sampling."""
    capacity = replay.obs.shape[0]
    occupied = (
        jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0).squeeze(-1)
        < replay.size
    )
    logits = alpha * jnp.log(jnp.maximum(replay.priority, 1e-12))
    logits = jnp.where(occupied, logits, -jnp.inf)
    # Gumbel trick: i.i.d. draws from the categorical (with replacement)
    g = jax.random.gumbel(key, (batch_size, capacity))
    indices = jnp.argmax(logits[None, :] + g, axis=1)

    probs = jax.nn.softmax(logits)
    n = jnp.maximum(replay.size.astype(probs.dtype), 1.0)
    w = (n * jnp.maximum(probs[indices], 1e-12)) ** (-beta)
    weights = w / jnp.max(w)  # batch-max normalization, like the reference

    return Batch(
        obs=replay.obs[indices],
        action=replay.action[indices],
        reward=replay.reward[indices],
        next_obs=replay.next_obs[indices],
        done=replay.done[indices],
        indices=indices,
        weights=weights.astype(replay.obs.dtype),
    )


def replay_update_priorities(replay: Replay, indices: jax.Array,
                             priorities: jax.Array) -> Replay:
    """update_priorities (:68-71)."""
    return replay._replace(
        priority=replay.priority.at[indices].set(
            priorities.astype(replay.priority.dtype)))
