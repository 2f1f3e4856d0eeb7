"""Act-hold segment-push replay semantics — the trustset DQN loop's
collection rule.

The reference's CARLA trustset trainer does NOT push one transition per
step.  It samples one DQN action, HOLDS it across env ticks while the
planner keeps re-planning around it, and accumulates the segment
(Data_From_Carla/Agent/drl_library/dqn/dqn.py:353-393):

* ``dqn_action`` is sampled only when ``None`` (:362-364) and then kept;
* every tick appends ``[obs, reward]`` to ``passed_data`` and adds the
  reward into ``sum_reward`` (:376-377);
* when ``sum_reward > r_thres or len(passed_data) > pass_thres or
  done`` (:381, constants r_thres=1, pass_thres=10 at :275-276), the
  WHOLE held segment is pushed: entry i gets the running
  ``sum_reward`` after subtracting the rewards of entries before it —
  the suffix sum of segment rewards — with the segment's final
  ``next_obs``/``done`` shared by every entry (:382-385);
* one extra env tick then re-uses the last control action and pushes a
  single ordinary transition with the SAME held action (:388-393),
  after which the outer loop resamples (``dqn_action = None``).

Here that becomes a fixed-shape, batched state machine: the segment
buffer is ``[B, L, D]`` with ``L = pass_thres + 1`` (the trigger fires
at the latest when length exceeds ``pass_thres``, so no segment can
outgrow L), the suffix-sum push is a masked cumulative subtraction, and
the post-segment extra push is a ``tail`` flag (the reference executes
the extra tick even when the segment broke on ``done``; under a
lockstep auto-reset env that tick acts in the freshly reset episode —
the one documented divergence, the reference instead steps a terminal
CARLA world once).  ``tests/test_segment.py`` pins the machinery
against a literal Python-deque reimplementation of the reference loop.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SegmentConfig:
    """Trigger thresholds (drl_library/dqn/dqn.py:275-276)."""

    r_thres: float = 1.0
    pass_thres: int = 10

    @property
    def max_len(self) -> int:
        # len(passed_data) > pass_thres triggers right after the append
        # that made length == pass_thres + 1.
        return self.pass_thres + 1


class SegmentHold(NamedTuple):
    """Per-env act-hold state (batched, batch-first: L is tiny)."""

    obs: jax.Array         # [B, L, D] held segment observations
    reward: jax.Array      # [B, L] held segment rewards
    length: jax.Array      # [B] i32 entries currently held
    action: jax.Array      # [B] i32 the held dqn action
    sum_reward: jax.Array  # [B] running segment reward sum
    fresh: jax.Array       # [B] bool — next select samples a new action
    tail: jax.Array        # [B] bool — the post-segment extra step


class SegmentRecords(NamedTuple):
    """Fixed-shape push emission: up to L records per env per step."""

    obs: jax.Array       # [B, L, D]
    action: jax.Array    # [B, L] i32 (the held action, broadcast)
    value: jax.Array     # [B, L] suffix-sum shared return (tail: reward)
    next_obs: jax.Array  # [B, L, D] (the segment-final next_obs, broadcast)
    done: jax.Array      # [B, L] (the segment-final done, broadcast)
    valid: jax.Array     # [B, L] bool


def segment_init(batch: int, obs_dim: int,
                 cfg: SegmentConfig = SegmentConfig(),
                 dtype=jnp.float32) -> SegmentHold:
    l = cfg.max_len
    return SegmentHold(
        obs=jnp.zeros((batch, l, obs_dim), dtype),
        reward=jnp.zeros((batch, l), dtype),
        length=jnp.zeros((batch,), jnp.int32),
        action=jnp.zeros((batch,), jnp.int32),
        sum_reward=jnp.zeros((batch,), dtype),
        fresh=jnp.ones((batch,), bool),
        tail=jnp.zeros((batch,), bool),
    )


def segment_select_action(hold: SegmentHold, rl_action: jax.Array
                          ) -> Tuple[SegmentHold, jax.Array]:
    """The act-hold gate (dqn.py:362-364): envs whose segment is open
    (or in the tail step) keep their held action; fresh envs adopt this
    step's epsilon-greedy proposal.  Returns (hold, executed_action)."""
    action = jnp.where(hold.fresh, rl_action.astype(jnp.int32), hold.action)
    return hold._replace(action=action, fresh=jnp.zeros_like(hold.fresh)), \
        action


def segment_push(hold: SegmentHold, obs: jax.Array, reward: jax.Array,
                 next_obs: jax.Array, done: jax.Array,
                 cfg: SegmentConfig = SegmentConfig()
                 ) -> Tuple[SegmentHold, SegmentRecords]:
    """Advance the state machine after one env tick.

    ``obs`` is the observation the held action was executed FROM this
    tick (the reference appends the pre-step ``obs``, dqn.py:376).
    Exactly one of three things happens per env:

    * segment grows (no trigger): no records;
    * trigger (dqn.py:381-385): every held entry is emitted with its
      suffix-sum value, the final next_obs/done shared; ``tail`` set;
    * tail step (dqn.py:388-393): one ordinary transition with the held
      action and THIS tick's reward; ``fresh`` set.
    """
    b, l, d = hold.obs.shape
    dt = hold.reward.dtype
    idx = jnp.arange(l)

    in_tail = hold.tail

    # --- segment append (only meaningful for non-tail envs)
    pos = jnp.minimum(hold.length, l - 1)
    oh = idx[None, :] == pos[:, None]                       # [B, L]
    obs_buf = jnp.where(oh[:, :, None], obs[:, None, :], hold.obs)
    rew_buf = jnp.where(oh, reward[:, None], hold.reward)
    length = hold.length + 1
    sum_reward = hold.sum_reward + reward

    trigger = (~in_tail) & ((sum_reward > jnp.asarray(cfg.r_thres, dt))
                            | (length > cfg.pass_thres) | done)

    # --- suffix-sum values, computed the reference's way: entry i gets
    # sum_reward minus the rewards of entries before it (dqn.py:382-385)
    in_seg = idx[None, :] < length[:, None]                 # [B, L]
    rew_m = jnp.where(in_seg, rew_buf, 0.0)
    prefix_excl = jnp.cumsum(rew_m, axis=1) - rew_m
    suffix = sum_reward[:, None] - prefix_excl

    seg_valid = trigger[:, None] & in_seg
    tail_valid = in_tail[:, None] & (idx[None, :] == 0)

    records = SegmentRecords(
        obs=jnp.where(tail_valid[:, :, None], obs[:, None, :], obs_buf),
        action=jnp.broadcast_to(hold.action[:, None], (b, l)),
        value=jnp.where(tail_valid, reward[:, None], suffix),
        next_obs=jnp.broadcast_to(next_obs[:, None, :], (b, l, d)),
        done=jnp.broadcast_to(done[:, None].astype(dt), (b, l)),
        valid=seg_valid | tail_valid,
    )

    # --- next state: trigger -> tail; tail -> fresh; else keep growing
    new_hold = SegmentHold(
        obs=obs_buf,
        reward=rew_buf,
        length=jnp.where(trigger | in_tail, 0, length),
        action=hold.action,
        sum_reward=jnp.where(trigger | in_tail, 0.0, sum_reward),
        fresh=in_tail,
        tail=trigger,
    )
    return new_hold, records


# ---------------------------------------------------------------------------
# Integrated trustset DQN trainer (the reference's act-hold loop,
# dqn.py:353-415, over the native vectorized driving stack)
# ---------------------------------------------------------------------------


def make_trustset_trainer(
    scenario=None,
    env_cfg=None,
    wcfg=None,
    dqn_cfg=None,
    seg_cfg: SegmentConfig = SegmentConfig(),
    batch: int = 64,
    replay_capacity: int = 1 << 14,
    trustset_capacity: int = 1 << 14,
    enc_half_width: float = 0.3,
    dtype=jnp.float32,
):
    """The trustset DQN training loop end-to-end: attention Q-net
    proposes via epsilon-greedy, the act-hold machine holds the action
    across ticks while the Werling planner executes the corresponding
    lattice candidate (trajectory_update_CP semantics: the held index
    picks the candidate, 0 = brake backup), segments push into
    prioritized replay with suffix-sum shared returns, and the TD step
    punishes targets whose next encoded state is outside the trust set
    (train_step_with_trustset, dqn.py:176-213).

    Returns (init_fn, run_fn):
      init_fn(seed) -> carry
      run_fn(carry, key, n_steps) -> (carry, metrics dict of [S] arrays)
    """
    import numpy as np

    from dcarl_tpu.config import DQNConfig, EnvConfig, WerlingConfig
    from dcarl_tpu.env import driving_env as de
    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.models import dqn as DQ
    from dcarl_tpu.models import networks as NET
    from dcarl_tpu.models import replay as RB
    from dcarl_tpu.models import trustset as TS
    from dcarl_tpu.planning import fast_rollout as FR

    env_cfg = env_cfg or EnvConfig()
    wcfg = wcfg or WerlingConfig()
    dqn_cfg = dqn_cfg or DQNConfig()
    sc = scenario or t_intersection(env_cfg)
    sa = de.scenario_to_device(sc, dtype)
    in_idx = de.in_state_indices(sc)
    tab = FR.build_ref_tables(np.asarray(sc.ref_path, np.float64), dtype)
    npdt = np.dtype(jnp.zeros((), dtype).dtype.name).type
    n_obj = (env_cfg.state_dim - 5) // 5
    n_v = len(wcfg.target_speeds)
    n_paths = wcfg.num_paths
    num_actions = n_paths + 1
    obs_dim = env_cfg.state_dim

    net = NET.AttentionQNet(num_actions=num_actions,
                            token_dim=dqn_cfg.token_dim,
                            width=dqn_cfg.attention_width,
                            hidden=dqn_cfg.hidden_dim)
    learner = DQ.DQN(net, obs_dim=obs_dim, cfg=dqn_cfg)

    class Carry(NamedTuple):
        env: FR.FastEnvState
        hold: SegmentHold
        dqn: DQ.DQNState
        ts: TS.TrustSet

    def init_fn(seed: int = 0) -> Carry:
        key = jax.random.PRNGKey(seed)
        k_env, k_net = jax.random.split(key)
        env_keys = jax.random.split(k_env, batch)
        env_bf = jax.vmap(lambda k: de.reset(sa, k, env_cfg))(env_keys)
        enc_dim = net.apply(
            net.init(k_net, jnp.zeros((1, obs_dim))),
            jnp.zeros((1, obs_dim)), method="encoded_state").shape[-1]
        return Carry(
            env=FR._state_to_lane_major(env_bf),
            hold=segment_init(batch, obs_dim, seg_cfg, dtype),
            dqn=learner.init(k_net, replay_capacity=replay_capacity),
            ts=TS.trustset_init(trustset_capacity, enc_dim,
                                state_half_width=enc_half_width),
        )

    def one_step(carry: Carry, key):
        k_act, k_env, k_train = jax.random.split(key, 3)
        state = carry.env
        obs = FR._obs_ori_soa(state, in_idx)                 # [20, B]
        obs_bf = obs.T
        ego_x, ego_y = obs[0], obs[1]
        ego_vx, ego_vy, ego_yaw = obs[2], obs[3], obs[4]

        # 1. act-hold: epsilon-greedy proposal, held across the segment
        rl_action = learner.act_epsilon_greedy(carry.dqn, obs_bf, k_act)
        hold, action = segment_select_action(carry.hold, rl_action)

        # 2. plan + execute the held candidate (trajectory_update_CP:
        # the dqn index picks the lattice candidate, 0 = brake backup)
        s0, d_signed, vd = FR._project_ego(ego_x, ego_y, ego_vx, ego_vy,
                                           tab, npdt)
        c_speed = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        lat = FR._plan_lattice(s0, -d_signed, vd, c_speed, tab, wcfg, npdt)
        exec_idx = jnp.clip(action, 0, n_paths)
        brake_path = jnp.argmin(lat.cf, axis=0).astype(jnp.int32)
        p_sel = jnp.where(exec_idx == 0, brake_path, exec_idx - 1)
        oh_p = FR._onehot(p_sel, n_paths).astype(npdt)
        traj_x = jnp.sum(lat.x * oh_p[:, None, :], axis=0)
        traj_y = jnp.sum(lat.y * oh_p[:, None, :], axis=0)
        oh_v = oh_p.reshape(-1, n_v, oh_p.shape[-1]).sum(axis=0)
        speed_end = jnp.sum(lat.s_d_end * oh_v, axis=0)
        speed_end = jnp.where(exec_idx == 0, 0.0, speed_end)
        ego_v = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        acc, steer = FR._control(ego_x, ego_y, ego_yaw, ego_v,
                                 traj_x, traj_y, speed_end, npdt)
        env2, reward, done = FR._step_env_soa(state, acc, steer, k_env,
                                              sa, in_idx, env_cfg, npdt)
        obs2_bf = FR._obs_ori_soa(env2, in_idx).T

        # 3. segment push -> replay (suffix-sum shared returns)
        hold, recs = segment_push(hold, obs_bf, reward, obs2_bf, done,
                                  seg_cfg)
        l = seg_cfg.max_len
        replay = RB.replay_push(
            carry.dqn.replay,
            recs.obs.reshape(batch * l, obs_dim),
            recs.action.reshape(-1),
            recs.value.reshape(-1),
            recs.next_obs.reshape(batch * l, obs_dim),
            recs.done.reshape(-1),
            mask=recs.valid.reshape(-1))
        dqn_state = carry.dqn._replace(replay=replay)

        # 4. trustset TD step (encoded batch added to the set, targets
        # outside it punished).  The reference trains only once the
        # buffer can fill a batch (dqn.py:405: ``if frame_idx >
        # batch_size``); before that the sampled batch would be empty
        # slots, so the whole update is discarded via select.
        new_dqn, new_ts, loss = learner.train_step_with_trustset(
            dqn_state, carry.ts, k_train, dqn_state.params)
        has_data = dqn_state.replay.size >= dqn_cfg.batch_size

        def sel(a, b):
            return jnp.where(has_data, a, b)

        dqn_state = jax.tree.map(sel, new_dqn, dqn_state)
        ts = jax.tree.map(sel, new_ts, carry.ts)
        loss = jnp.where(has_data, loss, 0.0)

        metrics = {
            "loss": loss,
            "reward_mean": jnp.mean(reward),
            "pushed": jnp.sum(recs.valid.astype(jnp.int32)),
            "segments_closed": jnp.sum(hold.tail.astype(jnp.int32)),
            "replay_size": dqn_state.replay.size,
            "ts_rows": ts.store.size,
            "held_fraction": jnp.mean((~hold.fresh).astype(jnp.float32)),
        }
        return Carry(env=env2, hold=hold, dqn=dqn_state, ts=ts), metrics

    from functools import partial

    @partial(jax.jit, static_argnums=(2,))
    def run_fn(carry: Carry, key: jax.Array, n_steps: int = 16):
        keys = jax.random.split(key, n_steps)
        return jax.lax.scan(one_step, carry, keys)

    return init_fn, run_fn
