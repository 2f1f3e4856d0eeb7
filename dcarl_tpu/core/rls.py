"""RLS — the confidence-aware policy-selection layer (field variant).

Re-design of the reference's on-vehicle ``RLS`` class
(software/src/tools/DCARL/stable_baselines/deepq/RLS.py), the component
that gates a learned action behind statistical confidence:

* **train mode** (act_train, RLS.py:84-118): force the rule action when
  it is under-explored (visited_times < thres) or performing well
  (a U(-1,0) explore draw falls below its mean value); otherwise let the
  DQN's epsilon-greedy action through.
* **test mode** (act_test, RLS.py:120-157): for each candidate action
  1..7, a Welch z-test of its stored value distribution against the rule
  action's; the first candidate with ``Phi(z) > confidence_thres`` wins,
  else the rule action.  Candidates are skipped while the rule is
  under-explored, the candidate has <5 visits, or the rule is already
  near-optimal (mean > -0.1).
* **dataset building** (add_data, RLS.py:185-215): a 20-deep trajectory
  buffer; entries older than 10 steps flush with their instantaneous
  reward; at episode end the remaining window is backfilled with the
  terminal reward discounted by gamma^(steps-to-end).

All decision paths are vectorized: statistics for the rule and all 7
candidates of B envs evaluate as one (B*8)-query batch against the
store, and the "first passing candidate" scan becomes an argmax over a
priority mask.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.stats import norm

from dcarl_tpu.config import StoreConfig
from dcarl_tpu.core.store import (ConfidenceStore, QueryStats,
                                  box_query_stats, store_insert)


def state_with_action(obs: jax.Array, action: jax.Array) -> jax.Array:
    """state || action key (RLS.py:96-98), batched over leading dims."""
    return jnp.concatenate(
        [obs, jnp.asarray(action, obs.dtype)[..., None]], axis=-1)


def candidate_keys(obs: jax.Array, num_actions: int) -> jax.Array:
    """[..., A, D+1] keys for actions 0..A-1 of each observation."""
    a = jnp.arange(num_actions, dtype=obs.dtype)
    obs_b = jnp.broadcast_to(obs[..., None, :],
                             obs.shape[:-1] + (num_actions, obs.shape[-1]))
    a_b = jnp.broadcast_to(a, obs.shape[:-1] + (num_actions,))
    return jnp.concatenate([obs_b, a_b[..., None]], axis=-1)


class ActionStats(NamedTuple):
    """Per-(env, action) store statistics."""

    count: jax.Array  # [..., A]
    mean: jax.Array
    var: jax.Array
    sigma: jax.Array


def all_action_stats(
    store: ConfidenceStore,
    obs: jax.Array,          # [B, D_obs]
    half_widths: jax.Array,  # [D_obs + 1]
    num_actions: int,
    use_pallas: Optional[bool] = None,
) -> ActionStats:
    """One fused store query for every action of every env."""
    keys = candidate_keys(obs, num_actions)          # [B, A, D]
    flat = keys.reshape(-1, keys.shape[-1])
    stats = box_query_stats(store, flat, half_widths, use_pallas=use_pallas)
    shape = keys.shape[:-1]
    return ActionStats(
        count=stats.count.reshape(shape),
        mean=stats.mean.reshape(shape),
        var=stats.var.reshape(shape),
        sigma=stats.sigma.reshape(shape),
    )


def act_test(
    stats: ActionStats,
    cfg: StoreConfig = StoreConfig(),
) -> jax.Array:
    """Batched act_test (RLS.py:120-157): [B] selected actions.

    For candidates 1..A-1 compute the Welch z-test against action 0;
    eligibility requires the rule well-explored, the candidate visited
    >= 5 times, and the rule not already near-optimal.  The selected
    action is the *lowest-indexed* passing candidate (the reference
    returns inside an ascending loop), else 0.
    """
    count = stats.count.astype(stats.mean.dtype)
    rule_count = count[..., 0:1]
    rule_mean = stats.mean[..., 0:1]
    rule_var = stats.var[..., 0:1]

    eligible = (
        (rule_count >= cfg.visited_times_thres)
        & (count >= cfg.rl_visited_times_min)
        & (rule_mean <= cfg.rule_good_thres)
    )

    var_diff = rule_var / jnp.maximum(rule_count, 1.0) \
        + stats.var / jnp.maximum(count, 1.0)
    sigma_diff = jnp.sqrt(jnp.maximum(var_diff, 1e-12))
    z = (stats.mean - rule_mean) / sigma_diff
    passes = eligible & (norm.cdf(z) > cfg.confidence_thres)
    passes = passes.at[..., 0].set(False)  # action 0 is the fallback

    any_pass = jnp.any(passes, axis=-1)
    if cfg.select_mode == "best":
        # strongest evidence wins (StoreConfig.select_mode)
        pick = jnp.argmax(jnp.where(passes, z, -jnp.inf),
                          axis=-1).astype(jnp.int32)
    else:
        # reference semantics: lowest-indexed passing candidate
        pick = jnp.argmax(passes, axis=-1).astype(jnp.int32)
    return jnp.where(any_pass, pick, 0)


def should_use_rule(
    stats: ActionStats,
    key: jax.Array,
    cfg: StoreConfig = StoreConfig(),
) -> jax.Array:
    """Batched train-mode gate (RLS.py:100-118): rule under-explored, or
    rule performing well against a U(explore_low, explore_high) draw
    (the reference's U(-1, 0), generalized to the config's reward
    support — see StoreConfig.explore_low)."""
    rule_count = stats.count[..., 0]
    rule_mean = stats.mean[..., 0]
    under_explored = rule_count < cfg.visited_times_thres
    explore = jax.random.uniform(key, rule_mean.shape,
                                 minval=cfg.explore_low,
                                 maxval=cfg.explore_high)
    rule_good = explore < rule_mean
    return under_explored | rule_good


def act_train(
    stats: ActionStats,
    rl_action: jax.Array,
    key: jax.Array,
    cfg: StoreConfig = StoreConfig(),
) -> jax.Array:
    """Batched act_train (RLS.py:84-90)."""
    use_rule = should_use_rule(stats, key, cfg)
    return jnp.where(use_rule, 0, rl_action).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Trajectory buffer: n-step flush + terminal backfill (RLS.py:185-215)
# ---------------------------------------------------------------------------


class TrajectoryBuffer(NamedTuple):
    """Per-env ring window of the last <= ``window`` transitions."""

    obs: jax.Array     # [W, D_obs]
    action: jax.Array  # [W]
    reward: jax.Array  # [W]
    length: jax.Array  # i32


def traj_buffer_init(window: int, obs_dim: int, dtype=jnp.float32
                     ) -> TrajectoryBuffer:
    return TrajectoryBuffer(
        obs=jnp.zeros((window, obs_dim), dtype),
        action=jnp.zeros((window,), dtype),
        reward=jnp.zeros((window,), dtype),
        length=jnp.zeros((), jnp.int32),
    )


class FlushRecords(NamedTuple):
    """Fixed-shape record emission: slot 0 is the steady-state flush,
    slots 1..W are the terminal backfill."""

    keys: jax.Array    # [W+1, D_obs + 1]
    actions: jax.Array  # [W+1]
    values: jax.Array  # [W+1]
    valid: jax.Array   # [W+1] bool


def traj_buffer_push(
    buf: TrajectoryBuffer,
    obs: jax.Array,
    action: jax.Array,
    reward: jax.Array,
    done: jax.Array,
    cfg: StoreConfig = StoreConfig(),
) -> Tuple[TrajectoryBuffer, FlushRecords]:
    """Append one transition; emit dataset records per the reference's
    add_data:

    * while the buffer exceeds the n-step window, the oldest entry is
      recorded with its own instantaneous reward (RLS.py:188-199),
    * on ``done``, every remaining entry is recorded with
      ``terminal_reward * gamma**(len_after_pop)`` — the oldest entry
      gets the largest discount (RLS.py:201-215).
    """
    w = buf.obs.shape[0]
    assert w == cfg.n_step_window, "buffer window must match config"

    # Append: shift-left-by-one when full keeps the newest `w` entries.
    full = buf.length >= w
    obs_shift = jnp.where(full, jnp.roll(buf.obs, -1, axis=0), buf.obs)
    act_shift = jnp.where(full, jnp.roll(buf.action, -1), buf.action)
    rew_shift = jnp.where(full, jnp.roll(buf.reward, -1), buf.reward)
    # the rolled-out oldest entry (pre-shift slot 0) flushes below
    flushed_obs = buf.obs[0]
    flushed_action = buf.action[0]
    flushed_reward = buf.reward[0]

    pos = jnp.minimum(buf.length, w - 1)
    new_obs = obs_shift.at[pos].set(obs)
    new_action = act_shift.at[pos].set(action.astype(buf.action.dtype))
    new_reward = rew_shift.at[pos].set(reward)
    length = jnp.minimum(buf.length + 1, w)

    # appending onto a full window pops one record (never fires in
    # episode mode: the window covers whole episodes by contract)
    flush_valid = full & (cfg.value_mode != "episode")

    idx = jnp.arange(w)
    if cfg.value_mode in ("nstep", "episode"):
        # Discounted window return from each entry onward
        # (StoreConfig.value_mode): steady flush = popped reward + the
        # discounted sum over the kept window; backfill entry i =
        # sum_{j>=i} gamma^(j-i) * r_j up to the episode end.
        # "episode" mode is the same suffix-sum math with the window
        # sized to cover whole episodes (n_step_window >=
        # max_episode_steps, validated by the trainers): the steady
        # flush then never fires and every record is a suffix return to
        # the EPISODE boundary — the reference collection loop's
        # whole-episode value semantics (dqn_value_collect.py:128-145).
        g = jnp.asarray(cfg.gamma, new_reward.dtype)
        in_ep = (idx < length).astype(new_reward.dtype)
        flushed_reward = flushed_reward + jnp.sum(
            (g ** (idx + 1).astype(new_reward.dtype)) * new_reward * in_ep)
        disc = g ** jnp.maximum(
            idx[None, :] - idx[:, None], 0).astype(new_reward.dtype)
        disc = disc * (idx[None, :] >= idx[:, None]) * in_ep[None, :]
        # HIGHEST: keep bit-parity with the lane-major twin on TPU
        # (MXU default truncates f32 operands to bf16)
        backfill_values = jnp.matmul(disc, new_reward,
                                     precision=jax.lax.Precision.HIGHEST)
    else:
        # Reference semantics (RLS.py:188-215): terminal backfill =
        # the newest entry's reward, discounted backwards; entry i
        # pops with length-1-i remaining -> gamma**(length - 1 - i).
        terminal_reward = new_reward[length - 1]
        exponent = jnp.maximum(length - 1 - idx, 0).astype(new_reward.dtype)
        backfill_values = terminal_reward * (cfg.gamma ** exponent)
    backfill_valid = done & (idx < length)

    keys = jnp.concatenate([
        state_with_action(flushed_obs, flushed_action)[None],
        state_with_action(new_obs, new_action),
    ])
    actions = jnp.concatenate([flushed_action[None], new_action])
    values = jnp.concatenate([flushed_reward[None], backfill_values])
    valid = jnp.concatenate([flush_valid[None], backfill_valid])

    # On done the buffer empties (everything was recorded).
    length = jnp.where(done, 0, length)
    return (
        TrajectoryBuffer(new_obs, new_action, new_reward, length),
        FlushRecords(keys=keys, actions=actions, values=values, valid=valid),
    )


def insert_records(store: ConfidenceStore, recs: FlushRecords
                   ) -> ConfidenceStore:
    """Append a (possibly batched) set of flush records to the store."""
    keys = recs.keys.reshape(-1, recs.keys.shape[-1])
    return store_insert(
        store,
        keys,
        recs.actions.reshape(-1),
        recs.values.reshape(-1),
        recs.valid.reshape(-1),
    )


class LaneRecords(NamedTuple):
    """Lane-major twin of :class:`FlushRecords`: row 0 is the steady
    flush, rows 1..W the terminal backfill, batch on the LAST axis."""

    keys: jax.Array     # [W+1, D_obs + 1, B]
    actions: jax.Array  # [W+1, B]
    values: jax.Array   # [W+1, B]
    valid: jax.Array    # [W+1, B] bool


def traj_push_lane(
    buf_obs: jax.Array,  # [W, D_obs, B]
    buf_act: jax.Array,  # [W, B]
    buf_rew: jax.Array,  # [W, B]
    length: jax.Array,   # [B] i32
    obs: jax.Array,      # [D_obs, B] lane-major
    action: jax.Array,   # [B]
    reward: jax.Array,   # [B]
    done: jax.Array,     # [B] bool
    cfg: StoreConfig = StoreConfig(),
):
    """Lane-major (batch-last) twin of :func:`traj_buffer_push`.

    Identical semantics and record ORDER (slot 0 flush, slots 1..W the
    window oldest-first) — ``tests/test_store_rls.py`` pins bitwise
    agreement with the vmapped reference implementation.  The point is
    layout: ``vmap`` of the per-env version lowers the window roll and
    the position write to per-env gathers/scatters, which profiled as
    THE dominant trainer cost (56% of the step, DESIGN.md §3c); here
    the roll is one batch-shared slice-concat and the write a one-hot
    select — pure elementwise work that rides the VPU lanes.

    Returns ``((buf_obs, buf_act, buf_rew, length), LaneRecords)``.
    """
    w, d_obs, b = buf_obs.shape
    assert w == cfg.n_step_window, "buffer window must match config"
    dt = buf_rew.dtype
    action = action.astype(buf_act.dtype)

    full = length >= w                                    # [B]
    if cfg.value_mode == "episode":
        # Episodes always end (done/timeout) before the window fills
        # (n_step_window >= max_episode_steps, trainer-validated), so
        # the buffer can never be full at a push: skip the roll — at
        # W ~ episode scale the [W, D, B] roll traffic would otherwise
        # dominate the push.
        obs_shift, act_shift, rew_shift = buf_obs, buf_act, buf_rew
    else:
        roll_obs = jnp.concatenate([buf_obs[1:], buf_obs[:1]], axis=0)
        roll_act = jnp.concatenate([buf_act[1:], buf_act[:1]], axis=0)
        roll_rew = jnp.concatenate([buf_rew[1:], buf_rew[:1]], axis=0)
        obs_shift = jnp.where(full[None, None, :], roll_obs, buf_obs)
        act_shift = jnp.where(full[None, :], roll_act, buf_act)
        rew_shift = jnp.where(full[None, :], roll_rew, buf_rew)

    # the rolled-out oldest entry (pre-shift slot 0) flushes below
    flushed_obs = buf_obs[0]                              # [D, B]
    flushed_action = buf_act[0]                           # [B]
    flushed_reward = buf_rew[0]

    pos = jnp.minimum(length, w - 1)                      # [B]
    iota = jnp.arange(w)
    oh = iota[:, None] == pos[None, :]                    # [W, B]
    new_obs = jnp.where(oh[:, None, :], obs[None], obs_shift)
    new_act = jnp.where(oh, action[None, :], act_shift)
    new_rew = jnp.where(oh, reward[None, :], rew_shift)
    length2 = jnp.minimum(length + 1, w)

    flush_valid = full & (cfg.value_mode != "episode")
    idx = iota[:, None]                                   # [W, 1]
    if cfg.value_mode in ("nstep", "episode"):
        g = jnp.asarray(cfg.gamma, dt)
        in_ep = (idx < length2[None, :]).astype(dt)       # [W, B]
        flushed_reward = flushed_reward + jnp.sum(
            (g ** (idx + 1).astype(dt)) * new_rew * in_ep, axis=0)
        disc = g ** jnp.maximum(
            iota[None, :] - iota[:, None], 0).astype(dt)
        disc = disc * (iota[None, :] >= iota[:, None])
        # HIGHEST: the TPU MXU default truncates f32 operands to bf16;
        # these are the VALUES written to the confidence store, and the
        # readable trainer computes them with exact f32 arithmetic.
        backfill_values = jnp.einsum("ij,jb->ib", disc, new_rew * in_ep,
                                     precision=jax.lax.Precision.HIGHEST)
    else:
        # terminal backfill (RLS.py:201-215): newest entry's reward,
        # discounted backwards
        oh_t = (iota[:, None] == (length2 - 1)[None, :]).astype(dt)
        terminal_reward = jnp.sum(new_rew * oh_t, axis=0)  # [B]
        exponent = jnp.maximum(length2[None, :] - 1 - idx, 0).astype(dt)
        backfill_values = terminal_reward[None, :] * (cfg.gamma ** exponent)
    backfill_valid = done[None, :] & (idx < length2[None, :])

    flush_key = jnp.concatenate(
        [flushed_obs, flushed_action[None, :]], axis=0)   # [D+1, B]
    entry_keys = jnp.concatenate(
        [new_obs, new_act[:, None, :]], axis=1)           # [W, D+1, B]
    keys = jnp.concatenate([flush_key[None], entry_keys])
    actions = jnp.concatenate([flushed_action[None], new_act])
    values = jnp.concatenate([flushed_reward[None], backfill_values])
    valid = jnp.concatenate([flush_valid[None], backfill_valid])

    length3 = jnp.where(done, 0, length2)
    return ((new_obs, new_act, new_rew, length3),
            LaneRecords(keys=keys, actions=actions, values=values,
                        valid=valid))
