"""Closed-loop rollout: env -> Werling planner -> controller -> env.

The on-device equivalent of the reference's value-collection driver
(Data_From_Carla/Agent/drl_library/dqn/dqn_value_collect.py:53-146):

* every tick the planner produces the candidate lattice and the rule
  pick; the controller tracks the selected trajectory,
* once per episode, when the ego first crosses ``trigger_y`` (obs y <
  90, :96-101), the loop locks in candidate ``used_action`` —
  round-robin over {brake, all lattice paths} across episodes — and
  keeps following that locked trajectory to episode end,
* at episode end the {triggered state, action, episode return} tuple is
  recorded (collected_data.txt, :128-137) and the action rotates
  (:144-145).

Everything (env physics, lattice, collision check, control, recording)
is one jitted ``lax.scan`` per batch of envs; records stream out as
fixed-shape per-step outputs masked by ``done``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.config import EnvConfig, WerlingConfig
from dcarl_tpu.control.controller import get_control
from dcarl_tpu.env import driving_env as de
from dcarl_tpu.env.scenario import Scenario
from dcarl_tpu.ops import spline as spl
from dcarl_tpu.planning import werling as W

TRIGGER_Y = 90.0


class RolloutCarry(NamedTuple):
    env: de.EnvState
    triggered: jax.Array       # bool — HRL action locked this episode
    locked_xy: jax.Array       # [T, 2] locked trajectory
    locked_speed: jax.Array    # [T]
    recorded_state: jax.Array  # [20] obs_ori at trigger time
    used_action: jax.Array     # i32 current round-robin candidate
    obs_ori: jax.Array         # [20]


class StepRecord(NamedTuple):
    done: jax.Array
    collided: jax.Array
    passed: jax.Array
    recorded_state: jax.Array
    used_action: jax.Array
    episode_return: jax.Array
    reward: jax.Array
    rule_index: jax.Array


def _obstacles_from_obs_ori(obs_ori: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """The reference's DynamicMap ingests only (x, y, vx, vy) per object
    and leaves yaw at 0 (dynamic_map.py:94-106) — the planner's
    prediction offsets therefore use yaw=0; reproduced faithfully."""
    objs = obs_ori[5:].reshape(-1, 5)
    obstacles = objs.at[:, 4].set(0.0)
    valid = jnp.ones((objs.shape[0],), dtype=bool)
    return obstacles, valid


def make_collector(sc: Scenario,
                   env_cfg: EnvConfig = EnvConfig(),
                   wcfg: WerlingConfig = WerlingConfig(),
                   dtype=jnp.float32):
    """Build the jitted batched collector.

    Returns (init_fn, run_fn):
      init_fn(keys[B]) -> RolloutCarry[B]
      run_fn(carry, keys[B, S]) -> (carry, StepRecord[B, S])
    """
    sa = de.scenario_to_device(sc, dtype)
    idx = de.in_state_indices(sc)
    ref_line = jnp.asarray(sc.ref_path, dtype)
    rp = spl.refpath_from_xy(ref_line[:, 0], ref_line[:, 1])
    n_t = wcfg.n_time_steps

    def plan_tick(obs_ori):
        ego = obs_ori[:5]
        obstacles, valid = _obstacles_from_obs_ori(obs_ori)
        return W.plan_with_rule(rp, ref_line, ego, obstacles, valid, wcfg)

    def one_step(carry: RolloutCarry, key) -> Tuple[RolloutCarry, StepRecord]:
        obs_ori = carry.obs_ori
        out = plan_tick(obs_ori)

        # Trigger: lock the round-robin candidate once y < TRIGGER_Y
        # (dqn_value_collect.py:96-101).
        trigger_now = (~carry.triggered) & (obs_ori[1] < TRIGGER_Y)
        hrl_traj = W.trajectory_by_index(out.lattice, carry.used_action)
        rule_traj = W.trajectory_by_index(out.lattice, out.rule_index)

        locked_xy = jnp.where(trigger_now, hrl_traj.xy, carry.locked_xy)
        locked_speed = jnp.where(trigger_now, hrl_traj.desired_speed,
                                 carry.locked_speed)
        recorded_state = jnp.where(trigger_now, obs_ori, carry.recorded_state)
        triggered = carry.triggered | trigger_now

        follow_xy = jnp.where(triggered, locked_xy, rule_traj.xy)
        follow_speed = jnp.where(triggered, locked_speed,
                                 rule_traj.desired_speed)

        ego = obs_ori[:5]
        ego_v = jnp.sqrt(ego[2] ** 2 + ego[3] ** 2)
        ctrl = get_control(ego[0], ego[1], ego[4], ego_v, follow_xy,
                           follow_speed)
        action = jnp.stack([ctrl.acc, ctrl.steering])

        episode_return_before = carry.env.episode_return
        env_state, obs, reward, done, new_obs_ori = de.step_autoreset(
            carry.env, action, key, sa, idx, env_cfg)

        record = StepRecord(
            done=done,
            collided=env_state.collided,
            passed=env_state.passed,
            recorded_state=recorded_state,
            used_action=carry.used_action,
            episode_return=episode_return_before + reward,
            reward=reward,
            rule_index=out.rule_index,
        )

        # Episode-end bookkeeping: rotate the candidate action over
        # P+1 = num_paths+1 choices (dqn_value_collect.py:144-145).
        n_actions = wcfg.num_paths + 1
        used_action = jnp.where(done, (carry.used_action + 1) % n_actions,
                                carry.used_action)
        triggered = jnp.where(done, False, triggered)

        new_carry = RolloutCarry(
            env=env_state,
            triggered=triggered,
            locked_xy=locked_xy,
            locked_speed=locked_speed,
            recorded_state=recorded_state,
            used_action=used_action,
            obs_ori=new_obs_ori,
        )
        return new_carry, record

    def init_one(key):
        env0 = de.reset(sa, key, env_cfg)
        _, obs_ori = de.wrap_state(env0, sa, idx, env_cfg)
        return RolloutCarry(
            env=env0,
            triggered=jnp.zeros((), bool),
            locked_xy=jnp.zeros((n_t, 2), dtype),
            locked_speed=jnp.zeros((n_t,), dtype),
            recorded_state=jnp.zeros((env_cfg.state_dim,), dtype),
            used_action=jnp.zeros((), jnp.int32),
            obs_ori=obs_ori,
        )

    @jax.jit
    def init_fn(keys):
        return jax.vmap(init_one)(keys)

    @jax.jit
    def run_fn(carry, step_keys):
        """step_keys: [B, S] fold-in keys; scans S steps for B envs."""

        def scan_one(c, keys):
            return jax.lax.scan(one_step, c, keys)

        return jax.vmap(scan_one)(carry, step_keys)

    return init_fn, run_fn


def make_rule_driver(sc: Scenario,
                     env_cfg: EnvConfig = EnvConfig(),
                     wcfg: WerlingConfig = WerlingConfig(),
                     dtype=jnp.float32):
    """Pure rule-policy driver (no HRL trigger): every tick follow the
    planner's rule pick.  The throughput workhorse for benchmarks."""
    sa = de.scenario_to_device(sc, dtype)
    idx = de.in_state_indices(sc)
    ref_line = jnp.asarray(sc.ref_path, dtype)
    rp = spl.refpath_from_xy(ref_line[:, 0], ref_line[:, 1])

    def one_step(carry, key):
        env_state, obs_ori = carry
        ego = obs_ori[:5]
        obstacles, valid = _obstacles_from_obs_ori(obs_ori)
        out = W.plan_with_rule(rp, ref_line, ego, obstacles, valid, wcfg)
        traj = W.trajectory_by_index(out.lattice, out.rule_index)
        ego_v = jnp.sqrt(ego[2] ** 2 + ego[3] ** 2)
        ctrl = get_control(ego[0], ego[1], ego[4], ego_v, traj.xy,
                           traj.desired_speed)
        action = jnp.stack([ctrl.acc, ctrl.steering])
        env_state, obs, reward, done, obs_ori = de.step_autoreset(
            env_state, action, key, sa, idx, env_cfg)
        return (env_state, obs_ori), (reward, done, env_state.passed,
                                      env_state.collided)

    def init_one(key):
        env0 = de.reset(sa, key, env_cfg)
        _, obs_ori = de.wrap_state(env0, sa, idx, env_cfg)
        return env0, obs_ori

    @jax.jit
    def init_fn(keys):
        return jax.vmap(init_one)(keys)

    @jax.jit
    def run_fn(carry, step_keys):
        def scan_one(c, keys):
            return jax.lax.scan(one_step, c, keys)

        return jax.vmap(scan_one)(carry, step_keys)

    return init_fn, run_fn
