"""A2C — synchronous advantage actor-critic.

TPU-native form of the SB fork's ``a2c/a2c.py`` (379 LoC): n-step
rollouts from B parallel envs, policy-gradient + value + entropy loss.
The SubprocVecEnv worker pool becomes a batched on-device env under one
``lax.scan``; multi-device data parallelism is a ``pmean`` on gradients
(``axis_name``) instead of parameter-server TF queues.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.algos import nets
from dcarl_tpu.algos.common import (EnvFns, collect_rollout,
                                    discounted_returns, maybe_pmean)


class A2CConfig(NamedTuple):
    n_steps: int = 5
    gamma: float = 0.99
    learning_rate: float = 7e-4
    vf_coef: float = 0.25       # a2c.py defaults
    ent_coef: float = 0.01
    max_grad_norm: float = 0.5


class A2CState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_state: object
    obs: jax.Array
    step: jax.Array


def make_a2c(env: EnvFns, cfg: A2CConfig = A2CConfig(),
             hidden=(64, 64), axis_name: Optional[str] = None):
    """Returns (init_fn(key, batch) -> A2CState,
    update_fn(state, key) -> (state, metrics)), both jittable."""
    net = nets.CategoricalActorCritic(env.num_actions, hidden)
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.rmsprop(cfg.learning_rate, decay=0.99, eps=1e-5))

    def init_fn(key, batch: int):
        k_net, k_env = jax.random.split(key)
        params = net.init(k_net, jnp.zeros((1, env.obs_dim)))
        env_state, obs = env.reset(jax.random.split(k_env, batch))
        return A2CState(params, tx.init(params), env_state, obs,
                        jnp.zeros((), jnp.int32))

    def loss_fn(params, traj, returns):
        logits, values = net.apply(params, traj.obs)
        logp = nets.categorical_log_prob(logits, traj.action)
        adv = returns - values
        pg_loss = -jnp.mean(logp * jax.lax.stop_gradient(adv))
        vf_loss = jnp.mean(adv ** 2)
        ent = jnp.mean(nets.categorical_entropy(logits))
        loss = pg_loss + cfg.vf_coef * vf_loss - cfg.ent_coef * ent
        return loss, (pg_loss, vf_loss, ent)

    def update_fn(state: A2CState, key):
        def policy(obs, k):
            logits, _ = net.apply(state.params, obs)
            return jax.random.categorical(k, logits)

        env_state, obs, traj = collect_rollout(
            env, policy, state.env_state, state.obs, key, cfg.n_steps)
        _, last_value = net.apply(state.params, obs)
        returns = discounted_returns(traj.reward, traj.done.astype(jnp.float32),
                                     last_value, cfg.gamma)

        grads, aux = jax.grad(loss_fn, has_aux=True)(state.params, traj,
                                                     returns)
        grads = maybe_pmean(grads, axis_name)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"pg_loss": aux[0], "vf_loss": aux[1], "entropy": aux[2],
                   "reward_mean": jnp.mean(traj.reward)}
        return A2CState(params, opt_state, env_state, obs,
                        state.step + 1), metrics

    return init_fn, update_fn
