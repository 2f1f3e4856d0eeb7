"""TD3 — twin-delayed DDPG.

TPU-native form of the fork's ``td3/td3.py`` (482 LoC): twin critics
with min-target, target-policy smoothing noise, delayed actor updates.
The delay is a ``jnp.where`` gate on the actor gradient instead of a
Python-side modulo, so the whole update stays one jitted program.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.algos import nets
from dcarl_tpu.algos.common import EnvFns, maybe_pmean, polyak
from dcarl_tpu.models import replay as RB


class TD3Config(NamedTuple):
    gamma: float = 0.99
    tau: float = 0.005               # td3.py defaults
    actor_lr: float = 3e-4
    critic_lr: float = 3e-4
    action_noise: float = 0.1
    target_noise: float = 0.2        # target_policy_noise
    noise_clip: float = 0.5          # target_noise_clip
    policy_delay: int = 2
    batch_size: int = 128
    replay_capacity: int = 50_000
    train_start: int = 100


class TD3State(NamedTuple):
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


def make_td3(env: EnvFns, cfg: TD3Config = TD3Config(), hidden=(64, 64),
             axis_name: Optional[str] = None):
    actor = nets.DeterministicActor(env.action_dim, hidden)
    critic = nets.TwinQCritic(hidden)
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
        return TD3State(ap, cp, ap, cp, atx.init(ap), ctx.init(cp), rb,
                        env_state, obs, jnp.zeros((), jnp.int32))

    def critic_loss(cp, state: TD3State, batch: RB.Batch, key):
        noise = jnp.clip(
            cfg.target_noise * jax.random.normal(key, batch.action.shape),
            -cfg.noise_clip, cfg.noise_clip)
        next_a = jnp.clip(actor.apply(state.target_actor, batch.next_obs)
                          + noise, -1.0, 1.0)
        tq1, tq2 = critic.apply(state.target_critic, batch.next_obs, next_a)
        y = batch.reward + cfg.gamma * (1.0 - batch.done) \
            * jnp.minimum(tq1, tq2)
        q1, q2 = critic.apply(cp, batch.obs, batch.action)
        y = jax.lax.stop_gradient(y)
        return jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)

    def actor_loss(ap, cp, batch: RB.Batch):
        q1, _ = critic.apply(cp, batch.obs, actor.apply(ap, batch.obs))
        return -jnp.mean(q1)

    def update_fn(state: TD3State, key):
        k_act, k_env, k_sample, k_noise = jax.random.split(key, 4)
        batch = state.obs.shape[0]

        a = actor.apply(state.actor_params, state.obs)
        a = jnp.clip(a + cfg.action_noise
                     * jax.random.normal(k_act, a.shape), -1.0, 1.0)
        env_state, next_obs, rew, done = env.step(
            state.env_state, a, jax.random.split(k_env, batch))
        rb = RB.replay_push(state.replay, state.obs, a, rew, next_obs,
                            done.astype(jnp.float32))

        mb = RB.replay_sample(rb, k_sample, cfg.batch_size)
        ready = rb.size >= cfg.train_start
        delayed = ready & (state.step % cfg.policy_delay == 0)

        cg = jax.grad(critic_loss)(state.critic_params, state, mb, k_noise)
        ag = jax.grad(actor_loss)(state.actor_params, state.critic_params,
                                  mb)
        cg = maybe_pmean(cg, axis_name)
        ag = maybe_pmean(ag, axis_name)
        cg = jax.tree.map(lambda g: jnp.where(ready, g, jnp.zeros_like(g)),
                          cg)
        ag = jax.tree.map(lambda g: jnp.where(delayed, g, jnp.zeros_like(g)),
                          ag)

        cu, copt = ctx.update(cg, state.critic_opt, state.critic_params)
        cp = optax.apply_updates(state.critic_params, cu)
        au, aopt = atx.update(ag, state.actor_opt, state.actor_params)
        ap = optax.apply_updates(state.actor_params, au)

        tau_a = jnp.where(delayed, cfg.tau, 0.0)
        metrics = {"reward_mean": jnp.mean(rew),
                   "replay_size": rb.size.astype(jnp.float32)}
        return TD3State(
            ap, cp,
            jax.tree.map(lambda t, p: (1 - tau_a) * t + tau_a * p,
                         state.target_actor, ap),
            jax.tree.map(lambda t, p: (1 - tau_a) * t + tau_a * p,
                         state.target_critic, cp),
            aopt, copt, rb, env_state, next_obs, state.step + 1), metrics

    def act_fn(state: TD3State, obs):
        return actor.apply(state.actor_params, obs)

    return init_fn, update_fn, act_fn
