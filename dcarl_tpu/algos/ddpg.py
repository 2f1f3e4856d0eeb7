"""DDPG — deep deterministic policy gradient.

TPU-native form of the fork's ``ddpg/ddpg.py`` (1,214 LoC): actor +
critic with target networks, Gaussian action noise, on-device uniform
replay.  The fork's MpiAdam gradient Allreduce (mpi_adam.py:51) is the
``axis_name`` pmean; its parameter-noise and popart variants are
omitted (off by default in the reference's usage).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.algos import nets
from dcarl_tpu.algos.common import EnvFns, maybe_pmean, polyak
from dcarl_tpu.models import replay as RB


class DDPGConfig(NamedTuple):
    gamma: float = 0.99
    tau: float = 0.001               # ddpg.py default
    actor_lr: float = 1e-4
    critic_lr: float = 1e-3
    action_noise: float = 0.1
    batch_size: int = 128
    replay_capacity: int = 50_000
    train_start: int = 100


class DDPGState(NamedTuple):
    actor_params: dict
    critic_params: dict
    target_actor: dict
    target_critic: dict
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    replay: RB.Replay
    env_state: object
    obs: jax.Array
    step: jax.Array


def make_ddpg(env: EnvFns, cfg: DDPGConfig = DDPGConfig(), hidden=(64, 64),
              axis_name: Optional[str] = None):
    actor = nets.DeterministicActor(env.action_dim, hidden)
    critic = nets.QCritic(hidden)
    atx = optax.adam(cfg.actor_lr)
    ctx = optax.adam(cfg.critic_lr)

    def init_fn(key, batch: int):
        k_a, k_c, k_env = jax.random.split(key, 3)
        obs0 = jnp.zeros((1, env.obs_dim))
        act0 = jnp.zeros((1, env.action_dim))
        ap = actor.init(k_a, obs0)
        cp = critic.init(k_c, obs0, act0)
        env_state, obs = env.reset(jax.random.split(k_env, batch))
        rb = RB.replay_init(cfg.replay_capacity, env.obs_dim,
                            action_shape=(env.action_dim,))
        return DDPGState(ap, cp, ap, cp, atx.init(ap), ctx.init(cp), rb,
                         env_state, obs, jnp.zeros((), jnp.int32))

    def critic_loss(cp, state: DDPGState, batch: RB.Batch):
        next_a = actor.apply(state.target_actor, batch.next_obs)
        target_q = critic.apply(state.target_critic, batch.next_obs, next_a)
        y = batch.reward + cfg.gamma * (1.0 - batch.done) * target_q
        q = critic.apply(cp, batch.obs, batch.action)
        return jnp.mean((q - jax.lax.stop_gradient(y)) ** 2)

    def actor_loss(ap, cp, batch: RB.Batch):
        return -jnp.mean(critic.apply(cp, batch.obs, actor.apply(ap,
                                                                 batch.obs)))

    def update_fn(state: DDPGState, key):
        k_act, k_env, k_sample = jax.random.split(key, 3)
        batch = state.obs.shape[0]

        a = actor.apply(state.actor_params, state.obs)
        a = jnp.clip(a + cfg.action_noise
                     * jax.random.normal(k_act, a.shape), -1.0, 1.0)
        env_state, next_obs, rew, done = env.step(
            state.env_state, a, jax.random.split(k_env, batch))
        rb = RB.replay_push(state.replay, state.obs, a, rew, next_obs,
                            done.astype(jnp.float32))

        mb = RB.replay_sample(rb, k_sample, cfg.batch_size)
        cg = jax.grad(critic_loss)(state.critic_params, state, mb)
        ag = jax.grad(actor_loss)(state.actor_params, state.critic_params,
                                  mb)
        cg = maybe_pmean(cg, axis_name)
        ag = maybe_pmean(ag, axis_name)

        ready = rb.size >= cfg.train_start
        cg, ag = jax.tree.map(
            lambda g: jnp.where(ready, g, jnp.zeros_like(g)), (cg, ag))

        cu, copt = ctx.update(cg, state.critic_opt, state.critic_params)
        cp = optax.apply_updates(state.critic_params, cu)
        au, aopt = atx.update(ag, state.actor_opt, state.actor_params)
        ap = optax.apply_updates(state.actor_params, au)

        metrics = {"reward_mean": jnp.mean(rew),
                   "replay_size": rb.size.astype(jnp.float32)}
        return DDPGState(
            ap, cp,
            polyak(state.target_actor, ap, cfg.tau),
            polyak(state.target_critic, cp, cfg.tau),
            aopt, copt, rb, env_state, next_obs, state.step + 1), metrics

    def act_fn(state: DDPGState, obs):
        return actor.apply(state.actor_params, obs)

    return init_fn, update_fn, act_fn
