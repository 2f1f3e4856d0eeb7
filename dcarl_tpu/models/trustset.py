"""Trust set over encoded states.

The reference imports ``Planning_library.trustset`` (drl dqn.py:13) —
a module *missing from the repo* — whose call sites define the API:
``add_data(encoded_state, action, reward)``, ``in_TS(state[, act])``,
``get_state_num(encoded_state) -> N_a`` (per-action visit counts for
UCB, dqn.py:114-131), and ``TS_ConfidenceValue(state, act)`` (hybrid
action scoring, dqn.py:56-66).

Rebuilt here on the confidence store: encoded states (the attention
embedding) keyed with the action, box-queried with fixed half-widths.
The confidence value reuses the DCARL bounds — optimistic for the rule
action, pessimistic otherwise — which is exactly the TSRL scoring the
demo layer uses.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dcarl_tpu.config import ConfidenceConfig
from dcarl_tpu.core import confidence as C
from dcarl_tpu.core.rls import all_action_stats, candidate_keys
from dcarl_tpu.core.store import ConfidenceStore, store_init, store_insert


class TrustSet(NamedTuple):
    store: ConfidenceStore
    half_widths: jax.Array  # [enc_dim + 1]


def trustset_init(capacity: int, enc_dim: int,
                  state_half_width: float = 0.3) -> TrustSet:
    w = jnp.concatenate([
        jnp.full((enc_dim,), state_half_width, jnp.float32),
        jnp.asarray([0.1], jnp.float32),  # exact action match
    ])
    return TrustSet(store=store_init(capacity, enc_dim + 1), half_widths=w)


def add_data(ts: TrustSet, enc_state: jax.Array, action: jax.Array,
             reward: jax.Array, mask: Optional[jax.Array] = None) -> TrustSet:
    """Batched: enc_state [M, E], action [M], reward [M]."""
    keys = jnp.concatenate(
        [enc_state, action.astype(enc_state.dtype)[:, None]], axis=1)
    m = jnp.ones(keys.shape[0], bool) if mask is None else mask
    return ts._replace(
        store=store_insert(ts.store, keys, action.astype(jnp.float32),
                           reward, m))


def state_action_counts(ts: TrustSet, enc_state: jax.Array,
                        num_actions: int,
                        use_pallas: Optional[bool] = None) -> jax.Array:
    """N_a per action (get_state_num): [B, A] visit counts."""
    stats = all_action_stats(ts.store, enc_state, ts.half_widths,
                             num_actions, use_pallas=use_pallas)
    return stats.count


def in_trust_set(ts: TrustSet, enc_state: jax.Array, num_actions: int,
                 use_pallas: Optional[bool] = None) -> jax.Array:
    """in_TS(state): any recorded data near the encoded state —
    the no-data-punishment gate (dqn.py:191-196). [B] bool."""
    return jnp.sum(state_action_counts(ts, enc_state, num_actions,
                                       use_pallas), axis=-1) > 0


def in_trust_set_action(ts: TrustSet, enc_state: jax.Array,
                        num_actions: int,
                        use_pallas: Optional[bool] = None) -> jax.Array:
    """in_TS(state, act) per action: [B, A] bool (act_ts gating,
    dqn.py:101-112)."""
    return state_action_counts(ts, enc_state, num_actions, use_pallas) > 0


def confidence_values(ts: TrustSet, enc_state: jax.Array, num_actions: int,
                      ccfg: ConfidenceConfig = ConfidenceConfig(),
                      use_pallas: Optional[bool] = None) -> jax.Array:
    """TS_ConfidenceValue per action (act_hybrid scoring): DCARL bounds —
    upper bound for the rule action 0, min(lower, CI-lower) otherwise;
    priors where below the data threshold.  [B, A]."""
    stats = all_action_stats(ts.store, enc_state, ts.half_widths,
                             num_actions, use_pallas=use_pallas)
    nf = jnp.maximum(stats.count, 1).astype(jnp.float32)
    mean = jnp.where(stats.count > 0, stats.mean, 0.0)
    total = mean * nf
    sigma = jnp.where(stats.count > 0, stats.sigma, 0.0)
    is_rule = (
        jax.lax.broadcasted_iota(jnp.int32, (1, num_actions), 1)
        == ccfg.rule_action
    )
    bound = C.tsrl_bound(mean, total, sigma, nf, is_rule, ccfg)
    prior = jnp.where(is_rule, ccfg.rule_prior, ccfg.other_prior)
    return jnp.where(stats.count > ccfg.n_thres, bound,
                     jnp.broadcast_to(prior, bound.shape))


def hybrid_act(ts: TrustSet, enc_state: jax.Array, num_actions: int,
               ccfg: ConfidenceConfig = ConfidenceConfig(),
               use_pallas: Optional[bool] = None) -> jax.Array:
    """act_hybrid (dqn.py:56-66): argmax of per-action confidence
    values. [B] i32."""
    return jnp.argmax(
        confidence_values(ts, enc_state, num_actions, ccfg, use_pallas),
        axis=-1).astype(jnp.int32)
