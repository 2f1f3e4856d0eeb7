"""Q-network families (flax).

Covers every network the reference defines:

* ``MLPQNet`` — the 2x128 ReLU MLP used by the value-collection agent
  (dqn_value_collect.py:21-35) and the SB MlpPolicy default.
* ``AttentionQNet`` — the ego-attention Q-network
  (Data_From_Carla/Agent/drl_library/dqn/dqn.py:24-54): per-vehicle
  5-feature tokens, single-head QKV self-attention of width 3, the
  first (ego) token's attended embedding feeding a 2x128 MLP head.
  Also exposes ``encoded_state`` (the attended ego embedding used as
  the trust-set key, :87-99) and ``ego_attention`` (:68-83).
* ``DuelingQNet`` / ``BootstrapQNet`` — the TF1 legacy builders
  (Data_From_Carla/Agent/model.py:6-62): dueling value/advantage
  composition and a 10-head bootstrap ensemble.

bfloat16-friendly: pass ``dtype=jnp.bfloat16`` for MXU-resident
compute; parameters stay float32.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPQNet(nn.Module):
    num_actions: int
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        x = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        return nn.Dense(self.num_actions, dtype=self.dtype)(x).astype(
            jnp.float32)


class AttentionQNet(nn.Module):
    """Input: [..., n_tokens * token_dim] flat observation."""

    num_actions: int
    token_dim: int = 5
    width: int = 3
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.q_lin = nn.Dense(self.width, dtype=self.dtype)
        self.k_lin = nn.Dense(self.width, dtype=self.dtype)
        self.v_lin = nn.Dense(self.width, dtype=self.dtype)
        self.head = nn.Sequential([
            nn.Dense(self.hidden, dtype=self.dtype), nn.relu,
            nn.Dense(self.hidden, dtype=self.dtype), nn.relu,
            nn.Dense(self.num_actions, dtype=self.dtype),
        ])

    def _tokens(self, x):
        n = x.shape[-1] // self.token_dim
        return x.reshape(x.shape[:-1] + (n, self.token_dim)).astype(self.dtype)

    def _attend(self, x):
        t = self._tokens(x)
        q, k, v = self.q_lin(t), self.k_lin(t), self.v_lin(t)
        scale = 1.0 / jnp.sqrt(jnp.float32(x.shape[-1]))
        scores = jax.nn.softmax(
            jnp.einsum("...nd,...md->...nm", q, k) * scale, axis=-1)
        return jnp.einsum("...nm,...md->...nd", scores, v), (q, k, v)

    def __call__(self, x):
        """Q-values from the ego token's attended embedding
        (dqn.py:42-53: scores softmax over keys, attended value row 0)."""
        attended, _ = self._attend(x)
        return self.head(attended[..., 0, :]).astype(jnp.float32)

    def encoded_state(self, x):
        """The attended ego embedding — the trust-set key (dqn.py:87-99)."""
        attended, _ = self._attend(x)
        return attended[..., 0, :].astype(jnp.float32)

    def ego_attention(self, x):
        """Ego-query attention weights over all tokens (dqn.py:68-83)."""
        _, (q, k, v) = self._attend(x)
        scale = 1.0 / jnp.sqrt(jnp.float32(x.shape[-1]))
        ego_scores = jax.nn.softmax(
            jnp.einsum("...d,...md->...m", q[..., 0, :], k) * scale, axis=-1)
        return (ego_scores[..., None] * v).astype(jnp.float32)


class DuelingQNet(nn.Module):
    """Dueling composition Q = V + A - mean(A) (model.py:24-44)."""

    num_actions: int
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(h))
        value = nn.Dense(1, dtype=self.dtype)(h)
        adv = nn.Dense(self.num_actions, dtype=self.dtype)(h)
        q = value + adv - jnp.mean(adv, axis=-1, keepdims=True)
        return q.astype(jnp.float32)


class BootstrapQNet(nn.Module):
    """K independent heads over a shared torso (model.py:46-62)."""

    num_actions: int
    num_heads: int = 10
    hidden: int = 128
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(x))
        h = nn.relu(nn.Dense(self.hidden, dtype=self.dtype)(h))
        heads = [nn.Dense(self.num_actions, dtype=self.dtype)(h)
                 for _ in range(self.num_heads)]
        return jnp.stack(heads, axis=-2).astype(jnp.float32)  # [..., K, A]
