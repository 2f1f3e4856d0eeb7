"""SAC — soft actor-critic with automatic temperature.

TPU-native form of the fork's ``sac/sac.py`` (565 LoC): tanh-squashed
Gaussian actor, twin soft critics, and the auto-tuned entropy
temperature (``ent_coef='auto'``, target entropy = -|A|, sac.py
setup_model).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.algos import nets
from dcarl_tpu.algos.common import EnvFns, maybe_pmean, polyak
from dcarl_tpu.models import replay as RB


class SACConfig(NamedTuple):
    gamma: float = 0.99
    tau: float = 0.005
    lr: float = 3e-4
    batch_size: int = 128
    replay_capacity: int = 50_000
    train_start: int = 100


class SACState(NamedTuple):
    actor_params: dict
    critic_params: dict
    target_critic: dict
    log_alpha: jax.Array
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    alpha_opt: optax.OptState
    replay: RB.Replay
    env_state: object
    obs: jax.Array
    step: jax.Array


def make_sac(env: EnvFns, cfg: SACConfig = SACConfig(), hidden=(64, 64),
             axis_name: Optional[str] = None):
    actor = nets.SquashedGaussianActor(env.action_dim, hidden)
    critic = nets.TwinQCritic(hidden)
    target_entropy = -float(env.action_dim)  # sac.py 'auto' default
    atx = optax.adam(cfg.lr)
    ctx = optax.adam(cfg.lr)
    altx = optax.adam(cfg.lr)

    def init_fn(key, batch: int):
        k_a, k_c, k_env = jax.random.split(key, 3)
        obs0 = jnp.zeros((1, env.obs_dim))
        act0 = jnp.zeros((1, env.action_dim))
        ap = actor.init(k_a, obs0)
        cp = critic.init(k_c, obs0, act0)
        log_alpha = jnp.zeros(())
        env_state, obs = env.reset(jax.random.split(k_env, batch))
        rb = RB.replay_init(cfg.replay_capacity, env.obs_dim,
                            action_shape=(env.action_dim,))
        return SACState(ap, cp, cp, log_alpha, atx.init(ap), ctx.init(cp),
                        altx.init(log_alpha), rb, env_state, obs,
                        jnp.zeros((), jnp.int32))

    def critic_loss(cp, state: SACState, batch: RB.Batch, key):
        mean, log_std = actor.apply(state.actor_params, batch.next_obs)
        next_a, next_logp = nets.squashed_sample(mean, log_std, key)
        tq1, tq2 = critic.apply(state.target_critic, batch.next_obs, next_a)
        alpha = jnp.exp(state.log_alpha)
        soft_v = jnp.minimum(tq1, tq2) - alpha * next_logp
        y = jax.lax.stop_gradient(
            batch.reward + cfg.gamma * (1.0 - batch.done) * soft_v)
        q1, q2 = critic.apply(cp, batch.obs, batch.action)
        return jnp.mean((q1 - y) ** 2) + jnp.mean((q2 - y) ** 2)

    def actor_loss(ap, state: SACState, batch: RB.Batch, key):
        mean, log_std = actor.apply(ap, batch.obs)
        a, logp = nets.squashed_sample(mean, log_std, key)
        q1, q2 = critic.apply(state.critic_params, batch.obs, a)
        alpha = jnp.exp(state.log_alpha)
        return jnp.mean(alpha * logp - jnp.minimum(q1, q2)), logp

    def alpha_loss(log_alpha, logp):
        return -jnp.mean(log_alpha
                         * jax.lax.stop_gradient(logp + target_entropy))

    def update_fn(state: SACState, key):
        k_act, k_env, k_sample, k_a1, k_a2 = jax.random.split(key, 5)
        batch = state.obs.shape[0]

        mean, log_std = actor.apply(state.actor_params, state.obs)
        a, _ = nets.squashed_sample(mean, log_std, k_act)
        env_state, next_obs, rew, done = env.step(
            state.env_state, a, jax.random.split(k_env, batch))
        rb = RB.replay_push(state.replay, state.obs, a, rew, next_obs,
                            done.astype(jnp.float32))

        mb = RB.replay_sample(rb, k_sample, cfg.batch_size)
        ready = rb.size >= cfg.train_start

        cg = jax.grad(critic_loss)(state.critic_params, state, mb, k_a1)
        (ag, logp) = jax.grad(actor_loss, has_aux=True)(
            state.actor_params, state, mb, k_a2)
        alg = jax.grad(alpha_loss)(state.log_alpha, logp)
        cg, ag, alg = (maybe_pmean(g, axis_name) for g in (cg, ag, alg))
        cg, ag, alg = jax.tree.map(
            lambda g: jnp.where(ready, g, jnp.zeros_like(g)), (cg, ag, alg))

        cu, copt = ctx.update(cg, state.critic_opt, state.critic_params)
        cp = optax.apply_updates(state.critic_params, cu)
        au, aopt = atx.update(ag, state.actor_opt, state.actor_params)
        ap = optax.apply_updates(state.actor_params, au)
        alu, alopt = altx.update(alg, state.alpha_opt, state.log_alpha)
        log_alpha = optax.apply_updates(state.log_alpha, alu)

        metrics = {"reward_mean": jnp.mean(rew),
                   "alpha": jnp.exp(log_alpha),
                   "replay_size": rb.size.astype(jnp.float32)}
        return SACState(
            ap, cp, polyak(state.target_critic, cp, cfg.tau), log_alpha,
            aopt, copt, alopt, rb, env_state, next_obs,
            state.step + 1), metrics

    def act_fn(state: SACState, obs, key=None):
        mean, log_std = actor.apply(state.actor_params, obs)
        if key is None:
            return jnp.tanh(mean)  # deterministic eval
        a, _ = nets.squashed_sample(mean, log_std, key)
        return a

    return init_fn, update_fn, act_fn
