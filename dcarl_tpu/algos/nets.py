"""Policy/value networks for the algorithm family.

The SB fork's ``common/policies.py`` (MlpPolicy and friends, 751 LoC)
defines shared-trunk actor-critic MLPs; here they are small flax
modules.  Continuous policies use tanh-squashed Gaussians (SAC,
sac/policies.py) or plain tanh-deterministic actors (DDPG/TD3).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LOG_STD_MIN, LOG_STD_MAX = -20.0, 2.0


class MLP(nn.Module):
    features: Sequence[int]
    activate_last: bool = False

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            x = nn.Dense(f)(x)
            if i < len(self.features) - 1 or self.activate_last:
                x = nn.tanh(x)
        return x


class CategoricalActorCritic(nn.Module):
    """MlpPolicy (common/policies.py): shared trunk, categorical pi +
    value head — A2C/PPO/TRPO discrete."""

    num_actions: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs) -> Tuple[jax.Array, jax.Array]:
        h = MLP(self.hidden, activate_last=True)(obs)
        logits = nn.Dense(self.num_actions)(h)
        value = nn.Dense(1)(h)[..., 0]
        return logits, value


class GaussianActorCritic(nn.Module):
    """Continuous MlpPolicy: diagonal Gaussian with state-independent
    log-std (common/distributions.py DiagGaussian) + value head."""

    action_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.hidden, activate_last=True)(obs)
        mean = nn.Dense(self.action_dim)(h)
        log_std = self.param("log_std", nn.initializers.zeros,
                             (self.action_dim,))
        value = nn.Dense(1)(h)[..., 0]
        return mean, jnp.broadcast_to(log_std, mean.shape), value


class DeterministicActor(nn.Module):
    """DDPG/TD3 actor (ddpg/policies.py): tanh-bounded action."""

    action_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.hidden, activate_last=True)(obs)
        return nn.tanh(nn.Dense(self.action_dim)(h))


class QCritic(nn.Module):
    """State-action critic Q(s, a)."""

    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs, action):
        x = jnp.concatenate([obs, action], axis=-1)
        return MLP((*self.hidden, 1))(x)[..., 0]


class TwinQCritic(nn.Module):
    """TD3/SAC twin critics (td3/policies.py)."""

    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs, action):
        return (QCritic(self.hidden)(obs, action),
                QCritic(self.hidden)(obs, action))


class SquashedGaussianActor(nn.Module):
    """SAC actor (sac/policies.py): tanh-squashed Gaussian with
    state-dependent log-std and change-of-variables log-prob."""

    action_dim: int
    hidden: Sequence[int] = (64, 64)

    @nn.compact
    def __call__(self, obs):
        h = MLP(self.hidden, activate_last=True)(obs)
        mean = nn.Dense(self.action_dim)(h)
        log_std = jnp.clip(nn.Dense(self.action_dim)(h),
                           LOG_STD_MIN, LOG_STD_MAX)
        return mean, log_std


def squashed_sample(mean, log_std, key):
    """Sample a ~ tanh(N(mean, std)) and its log-prob (sac/policies.py
    gaussian_likelihood + squash correction)."""
    std = jnp.exp(log_std)
    eps = jax.random.normal(key, mean.shape)
    pre = mean + std * eps
    act = jnp.tanh(pre)
    logp = -0.5 * (eps ** 2 + 2.0 * log_std + jnp.log(2.0 * jnp.pi))
    # tanh change of variables, numerically stable form
    logp = logp - 2.0 * (jnp.log(2.0) - pre - jax.nn.softplus(-2.0 * pre))
    return act, jnp.sum(logp, axis=-1)


def categorical_log_prob(logits, action):
    logp = jax.nn.log_softmax(logits)
    return jnp.take_along_axis(logp, action[..., None], axis=-1)[..., 0]


def categorical_entropy(logits):
    logp = jax.nn.log_softmax(logits)
    return -jnp.sum(jnp.exp(logp) * logp, axis=-1)


def gaussian_log_prob(mean, log_std, action):
    var = jnp.exp(2.0 * log_std)
    return jnp.sum(
        -0.5 * ((action - mean) ** 2 / var + 2.0 * log_std
                + jnp.log(2.0 * jnp.pi)), axis=-1)


def gaussian_entropy(log_std):
    return jnp.sum(log_std + 0.5 * jnp.log(2.0 * jnp.pi * jnp.e), axis=-1)
