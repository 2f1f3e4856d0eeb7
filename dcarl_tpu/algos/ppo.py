"""PPO — clipped-surrogate policy optimization (the fork's PPO2).

TPU-native form of ``ppo2/ppo2.py`` (570 LoC): GAE over an on-device
rollout, then E epochs x M minibatches of the clipped loss, all inside
one jit (``lax.scan`` over shuffled minibatch indices — the Runner +
feed-dict loop collapses into a single program).  Discrete and
continuous action spaces supported, mirroring MlpPolicy's
categorical/diag-Gaussian heads.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.algos import nets
from dcarl_tpu.algos.common import EnvFns, collect_rollout, gae, maybe_pmean


class PPOConfig(NamedTuple):
    n_steps: int = 128
    gamma: float = 0.99
    lam: float = 0.95
    clip_range: float = 0.2
    learning_rate: float = 2.5e-4
    vf_coef: float = 0.5
    ent_coef: float = 0.01
    max_grad_norm: float = 0.5
    n_epochs: int = 4
    n_minibatches: int = 4
    # PPO1 (pposgd_simple.py:50-53, schedule='linear'): anneal both the
    # clip range and the learning rate to 0 over total_updates.
    anneal_updates: int = 0        # 0 = constant (PPO2 default)


def ppo1_config(total_updates: int) -> PPOConfig:
    """The fork's PPO1 surface (pposgd_simple.py:50-53): 256-step actor
    batches, clip 0.2, Adam 1e-3/eps 1e-5, lambda 0.95, 4 optimizer
    epochs, linear annealing — as a PPOConfig."""
    return PPOConfig(n_steps=256, lam=0.95, clip_range=0.2,
                     learning_rate=1e-3, ent_coef=0.01, n_epochs=4,
                     n_minibatches=4, anneal_updates=total_updates)


class PPOState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    env_state: object
    obs: jax.Array
    step: jax.Array


def make_ppo(env: EnvFns, cfg: PPOConfig = PPOConfig(), hidden=(64, 64),
             axis_name: Optional[str] = None):
    discrete = env.num_actions is not None
    if discrete:
        net = nets.CategoricalActorCritic(env.num_actions, hidden)
    else:
        net = nets.GaussianActorCritic(env.action_dim, hidden)
    if cfg.anneal_updates:
        lr = optax.linear_schedule(
            cfg.learning_rate, 0.0,
            cfg.anneal_updates * cfg.n_epochs * cfg.n_minibatches)
    else:
        lr = cfg.learning_rate
    tx = optax.chain(optax.clip_by_global_norm(cfg.max_grad_norm),
                     optax.adam(lr, eps=1e-5))

    def log_prob_value(params, obs, action):
        if discrete:
            logits, value = net.apply(params, obs)
            return (nets.categorical_log_prob(logits, action),
                    nets.categorical_entropy(logits), value)
        mean, log_std, value = net.apply(params, obs)
        return (nets.gaussian_log_prob(mean, log_std, action),
                nets.gaussian_entropy(log_std), value)

    def sample(params, obs, key):
        if discrete:
            logits, _ = net.apply(params, obs)
            return jax.random.categorical(key, logits)
        mean, log_std, _ = net.apply(params, obs)
        return mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)

    def init_fn(key, batch: int):
        k_net, k_env = jax.random.split(key)
        params = net.init(k_net, jnp.zeros((1, env.obs_dim)))
        env_state, obs = env.reset(jax.random.split(k_env, batch))
        return PPOState(params, tx.init(params), env_state, obs,
                        jnp.zeros((), jnp.int32))

    def minibatch_loss(params, mb, clip):
        obs, action, old_logp, adv, ret = mb
        logp, ent, value = log_prob_value(params, obs, action)
        ratio = jnp.exp(logp - old_logp)
        adv_n = (adv - jnp.mean(adv)) / (jnp.std(adv) + 1e-8)
        pg = -jnp.mean(jnp.minimum(
            ratio * adv_n,
            jnp.clip(ratio, 1.0 - clip, 1.0 + clip) * adv_n))
        vf = 0.5 * jnp.mean((value - ret) ** 2)
        return pg + cfg.vf_coef * vf - cfg.ent_coef * jnp.mean(ent), (pg, vf)

    def update_fn(state: PPOState, key):
        k_roll, k_perm = jax.random.split(key)
        if cfg.anneal_updates:
            frac = jnp.maximum(
                0.0, 1.0 - state.step.astype(jnp.float32)
                / cfg.anneal_updates)
        else:
            frac = jnp.asarray(1.0)
        clip = cfg.clip_range * frac
        policy = partial(sample, state.params)
        env_state, obs, traj = collect_rollout(
            env, policy, state.env_state, state.obs, k_roll, cfg.n_steps)

        old_logp, _, values = log_prob_value(state.params, traj.obs,
                                             traj.action)
        if discrete:
            _, last_value = net.apply(state.params, obs)
        else:
            _, _, last_value = net.apply(state.params, obs)
        adv, ret = gae(traj.reward, values, traj.done.astype(jnp.float32),
                       last_value, cfg.gamma, cfg.lam)

        n = cfg.n_steps * traj.reward.shape[1]
        flat = jax.tree.map(lambda a: a.reshape((n,) + a.shape[2:]),
                            (traj.obs, traj.action, old_logp, adv, ret))
        mb_size = n // cfg.n_minibatches

        def epoch(carry, k):
            params, opt_state = carry
            perm = jax.random.permutation(k, n)

            def mb_step(c, mb_idx):
                p, o = c
                sel = jax.lax.dynamic_slice_in_dim(perm, mb_idx * mb_size,
                                                   mb_size)
                mb = jax.tree.map(lambda a: a[sel], flat)
                grads, aux = jax.grad(minibatch_loss, has_aux=True)(p, mb,
                                                                    clip)
                grads = maybe_pmean(grads, axis_name)
                updates, o = tx.update(grads, o, p)
                return (optax.apply_updates(p, updates), o), aux

            (params, opt_state), auxes = jax.lax.scan(
                mb_step, (params, opt_state), jnp.arange(cfg.n_minibatches))
            return (params, opt_state), auxes

        (params, opt_state), auxes = jax.lax.scan(
            epoch, (state.params, state.opt_state),
            jax.random.split(k_perm, cfg.n_epochs))

        metrics = {"pg_loss": jnp.mean(auxes[0]),
                   "vf_loss": jnp.mean(auxes[1]),
                   "reward_mean": jnp.mean(traj.reward)}
        return PPOState(params, opt_state, env_state, obs,
                        state.step + 1), metrics

    return init_fn, update_fn
