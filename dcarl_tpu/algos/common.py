"""Shared algorithm machinery: schedules, returns/advantages, target
networks, rollout collection.

Re-designs of the SB fork's ``common/`` layer
(software/src/tools/DCARL/stable_baselines/common/):

* schedules.py:24-108 -> :func:`linear_schedule`, :func:`constant_schedule`
* the per-algorithm discounted-return / GAE code (a2c/a2c.py,
  ppo2/ppo2.py:330-360) -> :func:`discounted_returns`, :func:`gae`
* target-network Polyak updates (ddpg/td3/sac) -> :func:`polyak`
* BaseRLModel's env interaction loop (base_class.py) ->
  :func:`collect_rollout`, a ``lax.scan`` over a batched on-device env.

Everything is shape-static and jit/vmap/pjit-compatible.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Schedules (schedules.py)


def constant_schedule(value: float) -> Callable[[jax.Array], jax.Array]:
    return lambda step: jnp.asarray(value, jnp.float32)


def linear_schedule(total_steps: int, initial: float, final: float
                    ) -> Callable[[jax.Array], jax.Array]:
    """LinearSchedule (schedules.py:78-108): linear interpolation,
    clamped at ``final`` after ``total_steps``."""

    def sched(step):
        frac = jnp.minimum(step.astype(jnp.float32) / total_steps, 1.0)
        return initial + frac * (final - initial)

    return sched


# ---------------------------------------------------------------------------
# Returns / advantages


def discounted_returns(rewards: jax.Array, dones: jax.Array,
                       bootstrap: jax.Array, gamma: float) -> jax.Array:
    """[T, B] n-step discounted returns with episode cuts; the A2C
    target (a2c.py discount_with_dones)."""

    def body(carry, inp):
        r, d = inp
        ret = r + gamma * carry * (1.0 - d)
        return ret, ret

    _, rets = jax.lax.scan(body, bootstrap, (rewards, dones), reverse=True)
    return rets


def gae(rewards: jax.Array, values: jax.Array, dones: jax.Array,
        last_value: jax.Array, gamma: float, lam: float
        ) -> Tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation (ppo2.py:330-360).

    rewards/values/dones: [T, B]; last_value: [B].
    Returns (advantages[T, B], returns[T, B])."""
    next_values = jnp.concatenate([values[1:], last_value[None]], axis=0)
    deltas = rewards + gamma * next_values * (1.0 - dones) - values

    def body(carry, inp):
        delta, d = inp
        adv = delta + gamma * lam * (1.0 - d) * carry
        return adv, adv

    _, advs = jax.lax.scan(body, jnp.zeros_like(last_value),
                           (deltas, dones), reverse=True)
    return advs, advs + values


def polyak(target_params, params, tau: float):
    """target <- (1-tau) target + tau params (ddpg.py setup_target_updates)."""
    return jax.tree.map(lambda t, p: (1.0 - tau) * t + tau * p,
                        target_params, params)


def maybe_pmean(grads, axis_name: Optional[str]):
    """The MpiAdam Allreduce (mpi_adam.py:51) as a mesh collective; a
    no-op outside pmap/shard_map."""
    if axis_name is None:
        return grads
    return jax.lax.pmean(grads, axis_name)


# ---------------------------------------------------------------------------
# Rollout collection over a batched on-device env


class EnvFns(NamedTuple):
    """A batched on-device environment: the VecEnv ABC
    (common/vec_env/base_vec_env.py) collapsed to two pure functions.

    reset: (key[B,2]) -> (state, obs[B, ...])
    step:  (state, action[B, ...], key[B,2]) -> (state, obs, reward[B],
            done[B]) with auto-reset (terminal obs replaced, as
    DummyVecEnv does with ``terminal_observation``)."""

    reset: Callable
    step: Callable
    num_actions: Optional[int] = None      # discrete envs
    action_dim: Optional[int] = None       # continuous envs
    obs_dim: int = 0


class Transition(NamedTuple):
    obs: jax.Array       # [T, B, obs]
    action: jax.Array    # [T, B, ...]
    reward: jax.Array    # [T, B]
    done: jax.Array      # [T, B]
    next_obs: jax.Array  # [T, B, obs]


def collect_rollout(env: EnvFns, policy_fn: Callable, env_state, obs,
                    key: jax.Array, n_steps: int) -> Tuple:
    """Scan ``n_steps`` of policy interaction; policy_fn(obs, key) ->
    action.  Returns (env_state, obs, Transition[T, B, ...])."""

    def body(carry, k):
        st, ob = carry
        k_act, k_env = jax.random.split(k)
        batch = ob.shape[0]
        act = policy_fn(ob, k_act)
        env_keys = jax.random.split(k_env, batch)
        st, next_ob, rew, done = env.step(st, act, env_keys)
        return (st, next_ob), Transition(ob, act, rew, done, next_ob)

    keys = jax.random.split(key, n_steps)
    (env_state, obs), traj = jax.lax.scan(body, (env_state, obs), keys)
    return env_state, obs, traj


# ---------------------------------------------------------------------------
# Learnability fixtures (identity_env.py — the SB test pattern)


def identity_env(num_actions: int = 3, ep_len: int = 8) -> EnvFns:
    """IdentityEnv (common/identity_env.py:1-40): obs is a category,
    reward 1 iff action == obs; trivially learnable, used to smoke-test
    every discrete algorithm end-to-end (tests/test_identity.py)."""

    def reset(keys):
        obs_id = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, num_actions))(keys)
        state = (obs_id, jnp.zeros(obs_id.shape, jnp.int32))
        return state, jax.nn.one_hot(obs_id, num_actions)

    def step(state, action, keys):
        obs_id, t = state
        reward = (action == obs_id).astype(jnp.float32)
        t = t + 1
        done = t >= ep_len
        new_id = jax.vmap(
            lambda k: jax.random.randint(k, (), 0, num_actions))(keys)
        t = jnp.where(done, 0, t)
        return (new_id, t), jax.nn.one_hot(new_id, num_actions), reward, done

    return EnvFns(reset=reset, step=step, num_actions=num_actions,
                  obs_dim=num_actions)


def identity_env_box(action_dim: int = 1, ep_len: int = 8) -> EnvFns:
    """IdentityEnvBox: continuous variant — reward 1 iff |a - obs| <
    0.05 (identity_env.py:43-66), relaxed to a dense -|a - obs| reward
    so gradient methods see signal at float32."""

    def reset(keys):
        target = jax.vmap(lambda k: jax.random.uniform(
            k, (action_dim,), minval=-1.0, maxval=1.0))(keys)
        return (target, jnp.zeros((target.shape[0],), jnp.int32)), target

    def step(state, action, keys):
        target, t = state
        reward = -jnp.mean(jnp.abs(action - target), axis=-1)
        t = t + 1
        done = t >= ep_len
        new_target = jax.vmap(lambda k: jax.random.uniform(
            k, (action_dim,), minval=-1.0, maxval=1.0))(keys)
        new_target = jnp.where(done[:, None], new_target, target)
        t = jnp.where(done, 0, t)
        return (new_target, t), new_target, reward, done

    return EnvFns(reset=reset, step=step, action_dim=action_dim,
                  obs_dim=action_dim)
