"""Distribution-based dataset generation (TPU-native data sampler).

Reproduces the generative process of the reference's
``Data_Sampling/data_sampling.py``:

* 20 states with scalar descriptors ~ U(0, 1)                  (:41)
* per-state true action values ~ U(-50, 100)                   (:43-44)
* state visitation ~ floor(N(3, 1) / 6 * state_num)            (:12-17)
* uniform-random actions, observed value ~ N(true, 50)         (:5-9, :49-55)

as one jitted ``jax.random`` program.  Out-of-range state draws are kept
with a validity mask instead of being dropped (static shapes); consumers
filter by ``valid``.  The reference's scipy RNG stream is not
reproducible bit-for-bit by design — bit-exact golden tests run against
the *bundled* datasets instead (see data/datasets.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class SampledDataset(NamedTuple):
    data: jax.Array           # [N, 4] rows [state_idx, state_scalar, action, value]
    valid: jax.Array          # [N] bool — state draw fell inside [0, state_num)
    action_values: jax.Array  # [S, A] ground truth
    states: jax.Array         # [S] state descriptors


@partial(jax.jit, static_argnames=("state_num", "action_num", "size"))
def generate(
    key: jax.Array,
    state_num: int = 20,
    action_num: int = 11,
    size: int = 50000,
    min_value: float = -50.0,
    max_value: float = 100.0,
    noise_scale: float = 50.0,
) -> SampledDataset:
    k_states, k_av, k_idx, k_act, k_noise = jax.random.split(key, 5)

    states = jax.random.uniform(k_states, (state_num,), dtype=jnp.float32)
    action_values = jax.random.uniform(
        k_av, (state_num, action_num), minval=min_value, maxval=max_value,
        dtype=jnp.float32,
    )

    raw = jax.random.normal(k_idx, (size,), dtype=jnp.float32) + 3.0
    idx = jnp.floor(raw / 6.0 * state_num).astype(jnp.int32)
    valid = (idx >= 0) & (idx < state_num)
    idx_c = jnp.clip(idx, 0, state_num - 1)

    act = jax.random.randint(k_act, (size,), 0, action_num, dtype=jnp.int32)
    true = action_values[idx_c, act]
    value = true + noise_scale * jax.random.normal(k_noise, (size,), dtype=jnp.float32)

    data = jnp.stack(
        [idx_c.astype(jnp.float32), states[idx_c], act.astype(jnp.float32), value],
        axis=1,
    )
    return SampledDataset(data=data, valid=valid,
                          action_values=action_values, states=states)


@partial(jax.jit, static_argnames=("state_num", "size"))
def generate_state_indices_manual(
    key: jax.Array, state_num: int, size: int, rare_prob: float = 0.1
) -> jax.Array:
    """``random_state_manual`` equivalent (data_sampling.py:19-27):
    state 0 with probability ``rare_prob``, else uniform over [1, S)."""
    k_bern, k_uni = jax.random.split(key)
    rare = jax.random.uniform(k_bern, (size,)) <= rare_prob
    uni = jax.random.randint(k_uni, (size,), 1, state_num, dtype=jnp.int32)
    return jnp.where(rare, 0, uni)
