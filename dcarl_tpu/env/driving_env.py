"""Vectorized lockstep driving environment (pure-JAX CARLA replacement).

Gym-style semantics of the reference env
(TestScenario_Town03.py:350-426): ``reset -> (state, state_ori)``,
``step(action) -> (state, reward, done, state_ori)`` with

* 20-D observation: ego + 3 objects x (x, y, vx, vy, yaw), objects in
  ego frame (``wrap_state``, :206-293),
* reward ``sqrt(v) * 0.1`` per tick, -100 on collision, 0 on stuck,
* termination on pass (y < 73.7), stuck (<0.1 m/s for 2 s), collision,
* dt = 0.05 s.

CARLA's physics server becomes an on-device kinematic bicycle model:
``action = (acc, steer)`` where ``acc`` in [-1, 1] maps to
throttle/brake like the reference's ``step`` (:375-379) and ``steer``
is the front-wheel angle (the pure-pursuit controller emits exactly
that geometry, so the loop is self-consistent).

Everything is a fixed-shape pytree: a single env is ``EnvState``;
``B`` envs are the same pytree with a leading batch axis via ``vmap``.
Auto-reset uses ``jnp.where`` blending (SubprocVecEnv's auto-reset,
re-designed for lockstep tensors — SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.config import EnvConfig
from dcarl_tpu.env.scenario import Scenario
from dcarl_tpu.ops.geometry import transfer_to_ego_frame


class EnvState(NamedTuple):
    ego: jax.Array          # [5] x, y, vx, vy, yaw
    ego_speed: jax.Array    # scalar
    vehicles: jax.Array     # [V, 5]
    walker: jax.Array       # [5]
    stuck_steps: jax.Array  # i32 consecutive slow ticks
    step_count: jax.Array   # i32
    done: jax.Array         # bool — episode ended this step
    collided: jax.Array     # bool
    passed: jax.Array       # bool
    stuck: jax.Array        # bool
    episode_return: jax.Array


class ScenarioArrays(NamedTuple):
    """Device-side copy of the static scenario."""

    vehicle_spawns: jax.Array
    vehicle_moving: jax.Array
    vehicle_in_state: jax.Array
    walker_spawn: jax.Array
    ego_spawn: jax.Array
    ref_path: jax.Array


def scenario_to_device(sc: Scenario, dtype=jnp.float32) -> ScenarioArrays:
    return ScenarioArrays(
        vehicle_spawns=jnp.asarray(sc.vehicle_spawns, dtype),
        vehicle_moving=jnp.asarray(sc.vehicle_moving),
        vehicle_in_state=jnp.asarray(sc.vehicle_in_state),
        walker_spawn=jnp.asarray(sc.walker_spawn, dtype),
        ego_spawn=jnp.asarray(sc.ego_spawn, dtype),
        ref_path=jnp.asarray(sc.ref_path, dtype),
    )


def reset(sa: ScenarioArrays, key: jax.Array,
          cfg: EnvConfig = EnvConfig()) -> EnvState:
    """Fixed spawn points with small pose jitter (CARLA's physics settle
    introduces comparable variation; keyed for reproducibility)."""
    k_ego, k_veh = jax.random.split(key)
    dtype = sa.ego_spawn.dtype
    j = cfg.reset_jitter
    ego = sa.ego_spawn + jnp.concatenate([
        jax.random.uniform(k_ego, (2,), dtype, -j, j) if j else
        jnp.zeros((2,), dtype),
        jnp.zeros((3,), dtype),
    ])
    vehicles = sa.vehicle_spawns
    jitter = (jax.random.uniform(k_veh, (vehicles.shape[0], 2), dtype, -j, j)
              if j else jnp.zeros((vehicles.shape[0], 2), dtype))
    vehicles = vehicles.at[:, :2].add(jitter)
    zero = jnp.zeros((), dtype)
    return EnvState(
        ego=ego,
        ego_speed=zero,
        vehicles=vehicles,
        walker=sa.walker_spawn,
        stuck_steps=jnp.zeros((), jnp.int32),
        step_count=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        collided=jnp.zeros((), bool),
        passed=jnp.zeros((), bool),
        stuck=jnp.zeros((), bool),
        episode_return=zero,
    )


def wrap_state(state: EnvState, sa: ScenarioArrays,
               in_state_idx: Tuple[int, ...],
               cfg: EnvConfig = EnvConfig()) -> Tuple[jax.Array, jax.Array]:
    """(state, state_ori): 20-D ego-frame and world-frame observations.

    Object order matches the reference's reset: walker first, then the
    in-state vehicles (TestScenario_Town03.py:352-357 via spawn_human
    then spawn_fixed_veh).  ``in_state_idx`` is the *static* tuple of
    scripted-vehicle indices exposed in the state (from
    :func:`in_state_indices`)."""
    ego = state.ego
    objs = jnp.concatenate([
        state.walker[None],
        state.vehicles[jnp.asarray(in_state_idx)],
    ])
    state_ori = jnp.concatenate([ego, objs.reshape(-1)])

    ex, ey, eyaw = ego[0], ego[1], ego[4]

    def to_ego(row):
        x, y, vx, vy, yaw = row[0], row[1], row[2], row[3], row[4]
        return jnp.stack(transfer_to_ego_frame(x, y, vx, vy, yaw, ex, ey, eyaw))

    rows = jnp.concatenate([ego[None], objs])
    obs = jax.vmap(to_ego)(rows).reshape(-1)
    return obs, state_ori


def in_state_indices(sc: Scenario) -> Tuple[int, ...]:
    """Static indices of scripted vehicles exposed in the state."""
    import numpy as np

    return tuple(int(i) for i in np.where(np.asarray(sc.vehicle_in_state))[0])


def _step_ego(ego, ego_speed, acc_cmd, steer_cmd, cfg: EnvConfig):
    """Kinematic bicycle with throttle/brake split like the reference's
    control mapping (:375-379)."""
    throttle = jnp.maximum(0.0, acc_cmd)
    brake = jnp.maximum(0.0, -acc_cmd)
    accel = throttle * cfg.max_accel - brake * cfg.max_brake \
        - 0.05 * ego_speed  # light drag
    v = jnp.clip(ego_speed + accel * cfg.dt, 0.0, 60.0)
    steer = jnp.clip(steer_cmd, -cfg.max_steer, cfg.max_steer)
    yaw = ego[4] + v / cfg.wheelbase * jnp.tan(steer) * cfg.dt
    vx = v * jnp.cos(yaw)
    vy = v * jnp.sin(yaw)
    x = ego[0] + vx * cfg.dt
    y = ego[1] + vy * cfg.dt
    return jnp.stack([x, y, vx, vy, yaw]), v


def _step_traffic(state: EnvState, sa: ScenarioArrays, cfg: EnvConfig):
    """Scripted traffic: autopilot vehicles hold their spawn heading at
    constant speed; the pedestrian walks its heading at 0.9 m/s."""
    veh = state.vehicles
    moving = sa.vehicle_moving[:, None]
    new_xy = veh[:, :2] + veh[:, 2:4] * cfg.dt
    veh = veh.at[:, :2].set(jnp.where(moving, new_xy, veh[:, :2]))
    walker = state.walker.at[:2].add(state.walker[2:4] * cfg.dt)
    return veh, walker


def step(
    state: EnvState,
    action: jax.Array,
    sa: ScenarioArrays,
    in_state_idx: Tuple[int, ...],
    cfg: EnvConfig = EnvConfig(),
) -> Tuple[EnvState, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One env tick -> (state', obs, reward, done, obs_ori).

    Reward/termination semantics: TestScenario_Town03.py:399-424.
    """
    ego, v = _step_ego(state.ego, state.ego_speed, action[0], action[1], cfg)
    vehicles, walker = _step_traffic(state, sa, cfg)

    # Collision: circle check against every actor (collision sensor
    # equivalent).
    actor_xy = jnp.concatenate([vehicles[:, :2], walker[None, :2]])
    d2 = jnp.sum((actor_xy - ego[:2]) ** 2, axis=1)
    collided = jnp.any(d2 < cfg.collision_radius ** 2)
    if cfg.offroute_dist > 0:
        # Road departure counts as a collision (Town03's buildings wall
        # the route; an off-road ego hits the environment).
        d2r = jnp.min(jnp.sum((sa.ref_path[:, :2] - ego[:2]) ** 2, axis=1))
        collided = collided | (d2r > cfg.offroute_dist ** 2)

    passed = ego[1] < cfg.pass_line_y
    slow = v < cfg.stuck_speed
    stuck_steps = jnp.where(slow, state.stuck_steps + 1, 0)
    stuck = stuck_steps > jnp.int32(cfg.stuck_time / cfg.dt)

    reward = jnp.sqrt(v) * cfg.speed_reward_scale \
        + cfg.reward_pass * passed
    reward = jnp.where(collided, cfg.reward_collision, reward)
    reward = jnp.where(stuck & ~collided, cfg.reward_stuck, reward)

    step_count = state.step_count + 1
    timeout = step_count >= cfg.max_episode_steps
    done = collided | passed | stuck | timeout

    new_state = EnvState(
        ego=ego,
        ego_speed=v,
        vehicles=vehicles,
        walker=walker,
        stuck_steps=stuck_steps,
        step_count=step_count,
        done=done,
        collided=collided,
        passed=passed,
        stuck=stuck,
        episode_return=state.episode_return + reward,
    )
    obs, obs_ori = wrap_state(new_state, sa, in_state_idx, cfg)
    return new_state, obs, reward, done, obs_ori


def step_autoreset(
    state: EnvState,
    action: jax.Array,
    key: jax.Array,
    sa: ScenarioArrays,
    in_state_idx: Tuple[int, ...],
    cfg: EnvConfig = EnvConfig(),
) -> Tuple[EnvState, jax.Array, jax.Array, jax.Array, jax.Array]:
    """Lockstep auto-reset: where an episode ended, blend in a fresh
    reset state (the tensorized form of SubprocVecEnv's worker
    auto-reset, subproc_vec_env.py:10-47)."""
    new_state, obs, reward, done, obs_ori = step(state, action, sa,
                                                 in_state_idx, cfg)
    fresh = reset(sa, key, cfg)
    blended = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(done, (1,) * a.ndim) if a.ndim else done, b, a),
        new_state, fresh)
    # preserve the 'done'/outcome flags of the finished episode for logging
    blended = blended._replace(done=done, collided=new_state.collided,
                               passed=new_state.passed, stuck=new_state.stuck)
    obs_r, obs_ori_r = wrap_state(blended, sa, in_state_idx, cfg)
    obs = jnp.where(done, obs_r, obs)
    obs_ori = jnp.where(done, obs_ori_r, obs_ori)
    return blended, obs, reward, done, obs_ori


def make_vec_env(sc: Scenario, cfg: EnvConfig = EnvConfig(), dtype=jnp.float32):
    """Returns (reset_fn, step_fn, obs_fn) vmapped over a batch of envs —
    the DummyVecEnv/SubprocVecEnv equivalent: one jitted program
    stepping [B] envs in lockstep.

    reset_fn(keys[B])                  -> (states, obs[B,20], obs_ori[B,20])
    step_fn(states, actions[B,2], keys)-> (states, obs, reward, done, obs_ori)
    """
    sa = scenario_to_device(sc, dtype)
    idx = in_state_indices(sc)

    def reset_fn(keys):
        states = jax.vmap(lambda k: reset(sa, k, cfg))(keys)
        obs, obs_ori = jax.vmap(lambda s: wrap_state(s, sa, idx, cfg))(states)
        return states, obs, obs_ori

    def step_fn(states, actions, keys):
        return jax.vmap(
            lambda s, a, k: step_autoreset(s, a, k, sa, idx, cfg)
        )(states, actions, keys)

    return jax.jit(reset_fn), jax.jit(step_fn)
