"""GAIL — generative adversarial imitation learning.

TPU-native form of the SB fork's ``gail/model.py`` +
``gail/adversary.py``: a transition discriminator D(s, a) trained to
separate expert transitions from generator transitions, whose
``-log(1 - D)`` output replaces the environment reward for a TRPO
generator.  Reference surface mirrored (not copied):

* adversary net: 2x tanh hidden (``hidden_size_adversary=100``) -> 1
  logit over concat(normalized obs, one-hot action)
  (adversary.py build_graph);
* discriminator loss: sigmoid cross-entropy (generator label 0,
  expert label 1) minus ``adversary_entcoeff=1e-3`` times the logit
  Bernoulli entropy (adversary.py:83-97);
* reward: ``-log(1 - sigmoid(logit) + 1e-8)`` (adversary.py:99);
* schedule: ``g_step=3`` generator (TRPO) updates per ``d_step=1``
  discriminator update (model.py:35-46), here one jitted program per
  outer update;
* obs normalization: the adversary's RunningMeanStd obfilter becomes
  a :class:`~dcarl_tpu.parallel.normalize.RunningMeanStd` carried in
  the state and updated distributedly.

The expert dataset (``gail/dataset``) is a pair of device arrays
``(expert_obs[N, obs], expert_act[N])``; minibatches are uniform
gathers, so the whole loop is shape-static.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.algos import nets
from dcarl_tpu.algos.common import EnvFns, collect_rollout, maybe_pmean
from dcarl_tpu.algos.trpo import TRPOConfig, TRPOState, make_trpo
from dcarl_tpu.parallel.normalize import (RunningMeanStd, rms_init,
                                          rms_update)


class GAILConfig(NamedTuple):
    trpo: TRPOConfig = TRPOConfig()
    hidden_size_adversary: int = 100
    adversary_entcoeff: float = 1e-3
    g_step: int = 3
    d_step: int = 1
    d_stepsize: float = 3e-4
    d_batch: int = 256
    normalize: bool = True


class Adversary(nn.Module):
    """TransitionClassifier (adversary.py:34-135)."""

    hidden: int = 100

    @nn.compact
    def __call__(self, obs, act_feat):
        x = jnp.concatenate([obs, act_feat], axis=-1)
        x = jnp.tanh(nn.Dense(self.hidden)(x))
        x = jnp.tanh(nn.Dense(self.hidden)(x))
        return nn.Dense(1)(x)[..., 0]


def _logit_bernoulli_entropy(logits):
    """(1 - sigmoid(x)) x - log sigmoid(x) (adversary.py:23-31)."""
    return (1.0 - jax.nn.sigmoid(logits)) * logits + jax.nn.softplus(
        -logits)


class GAILState(NamedTuple):
    trpo: TRPOState
    d_params: dict
    d_opt: optax.OptState
    obs_rms: RunningMeanStd
    step: jax.Array


def make_gail(env: EnvFns, expert_obs: jax.Array, expert_act: jax.Array,
              cfg: GAILConfig = GAILConfig(), hidden=(64, 64),
              axis_name: Optional[str] = None):
    """Returns (init_fn(key, batch) -> GAILState, update_fn(state, key)
    -> (state, metrics)).  One update = g_step TRPO updates on
    adversary rewards + d_step discriminator updates."""
    discrete = env.num_actions is not None
    adv_net = Adversary(cfg.hidden_size_adversary)
    dtx = optax.adam(cfg.d_stepsize)
    trpo_init, trpo_update = make_trpo(env, cfg.trpo, hidden, axis_name)
    obs_dim = env.obs_dim

    def act_feat(action):
        if discrete:
            return jax.nn.one_hot(action, env.num_actions)
        return action

    def norm_obs(rms: RunningMeanStd, obs):
        if not cfg.normalize:
            return obs
        return (obs - rms.mean) / jnp.sqrt(rms.var + 1e-8)

    def init_fn(key, batch: int):
        k_t, k_d = jax.random.split(key)
        trpo_state = trpo_init(k_t, batch)
        feat_dim = env.num_actions if discrete else env.action_dim
        d_params = adv_net.init(k_d, jnp.zeros((1, obs_dim)),
                                jnp.zeros((1, feat_dim)))
        return GAILState(trpo_state, d_params, dtx.init(d_params),
                         rms_init((obs_dim,)), jnp.zeros((), jnp.int32))

    def adversary_reward(d_params, rms, obs, action):
        logits = adv_net.apply(d_params, norm_obs(rms, obs),
                               act_feat(action))
        # reward_op (adversary.py:99)
        return -jnp.log(1.0 - jax.nn.sigmoid(logits) + 1e-8)

    def d_loss_fn(d_params, rms, gen_obs, gen_act, exp_obs, exp_act):
        gen_logits = adv_net.apply(d_params, norm_obs(rms, gen_obs),
                                   act_feat(gen_act))
        exp_logits = adv_net.apply(d_params, norm_obs(rms, exp_obs),
                                   act_feat(exp_act))
        gen_loss = jnp.mean(jax.nn.softplus(gen_logits))          # label 0
        exp_loss = jnp.mean(jax.nn.softplus(-exp_logits))         # label 1
        ent = jnp.mean(_logit_bernoulli_entropy(
            jnp.concatenate([gen_logits, exp_logits])))
        total = gen_loss + exp_loss - cfg.adversary_entcoeff * ent
        gen_acc = jnp.mean((jax.nn.sigmoid(gen_logits) < 0.5))
        exp_acc = jnp.mean((jax.nn.sigmoid(exp_logits) > 0.5))
        return total, (gen_loss, exp_loss, gen_acc, exp_acc)

    def update_fn(state: GAILState, key):
        k_g, k_d = jax.random.split(key)

        # --- g_step generator (TRPO) updates on adversary rewards ----
        def g_update(carry, k):
            trpo_state, rms = carry
            env_state, obs, traj = collect_rollout(
                env, lambda o, kk: trpo_update.sample(
                    trpo_state.params, o, kk),
                trpo_state.env_state, trpo_state.obs, k, cfg.trpo.n_steps)
            d_rew = adversary_reward(state.d_params, rms, traj.obs,
                                     traj.action)
            traj = traj._replace(reward=d_rew)
            rms = rms_update(rms, traj.obs.reshape(-1, obs_dim))
            trpo_state, m = trpo_update.from_traj(trpo_state, traj, obs,
                                                  env_state)
            return (trpo_state, rms), (m["reward_mean"], traj)

        (trpo_state, obs_rms), (d_rews, trajs) = jax.lax.scan(
            g_update, (state.trpo, state.obs_rms),
            jax.random.split(k_g, cfg.g_step))

        gen_obs = trajs.obs.reshape(-1, obs_dim)
        gen_act = trajs.action.reshape(
            (-1,) if discrete else (-1, env.action_dim))

        # --- d_step discriminator updates -----------------------------
        def d_update(carry, k):
            d_params, d_opt = carry
            kg, ke = jax.random.split(k)
            gi = jax.random.randint(kg, (cfg.d_batch,), 0,
                                    gen_obs.shape[0])
            ei = jax.random.randint(ke, (cfg.d_batch,), 0,
                                    expert_obs.shape[0])
            grads, aux = jax.grad(d_loss_fn, has_aux=True)(
                d_params, obs_rms, gen_obs[gi], gen_act[gi],
                expert_obs[ei], expert_act[ei])
            grads = maybe_pmean(grads, axis_name)
            updates, d_opt = dtx.update(grads, d_opt, d_params)
            return (optax.apply_updates(d_params, updates), d_opt), aux

        (d_params, d_opt), d_aux = jax.lax.scan(
            d_update, (state.d_params, state.d_opt),
            jax.random.split(k_d, cfg.d_step))

        metrics = {"adversary_reward": jnp.mean(d_rews),
                   "gen_loss": jnp.mean(d_aux[0]),
                   "expert_loss": jnp.mean(d_aux[1]),
                   "gen_acc": jnp.mean(d_aux[2]),
                   "expert_acc": jnp.mean(d_aux[3])}
        return GAILState(trpo_state, d_params, d_opt, obs_rms,
                         state.step + 1), metrics

    return init_fn, update_fn
