"""Vectorized multilane (highway) environment — the field stack's world.

The reference exercises its lane-level stack by replaying vehicle
rosbags through cognition into a two-lane ``MapState`` and serving the
DQN+RLS agent over a socket gym (``ZZZCarlaEnv_lane``: Discrete(8),
20-D state, reward 1 per step, 0 on collision —
software/src/tools/DCARL/gym_routing/envs/cz_dqn.py:30-141).  The
TPU-native equivalent is a lane-coordinate highway simulator: IDM
traffic on an L-lane road segment, the ego commanded by
(target_lane, target_speed) decisions at the planner rate (5 Hz,
planning.launch), producing the same ``MultiLaneState``/20-D
observation the decision layer consumes.

Everything is fixed-shape and batches with ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.planning.multilane import LaneVehicle, MultiLaneState


class MultiLaneEnvConfig(NamedTuple):
    num_lanes: int = 2
    num_vehicles: int = 8
    dt: float = 0.2                  # decision tick (5 Hz)
    road_length: float = 400.0       # distance to the junction/exit
    speed_limit: float = 15.0        # m/s
    lane_change_rate: float = 1.0    # lane-index units / s
    collision_ds: float = 5.0        # longitudinal collision envelope
    collision_dlane: float = 0.5     # lateral collision envelope
    max_steps: int = 200
    target_lane_index: int = 1       # exit lane
    # IDM traffic parameters
    traffic_speed_mean: float = 10.0
    traffic_speed_spread: float = 3.0
    idm_a: float = 1.5
    idm_b: float = 2.0
    idm_t: float = 1.5
    idm_g0: float = 8.0


class MultiLaneEnvState(NamedTuple):
    ego_s: jax.Array
    ego_lane: jax.Array     # continuous
    ego_speed: jax.Array
    ego_vd: jax.Array       # lane-units/s lateral speed
    veh_s: jax.Array        # [K]
    veh_lane: jax.Array     # [K]
    veh_speed: jax.Array    # [K]
    veh_pref: jax.Array     # [K] preferred speeds
    step_count: jax.Array
    done: jax.Array
    collided: jax.Array
    left_road: jax.Array    # passed the exit (leave_current_mmap)


def reset(key: jax.Array, cfg: MultiLaneEnvConfig = MultiLaneEnvConfig()
          ) -> MultiLaneEnvState:
    k_lane, k_s, k_v = jax.random.split(key, 3)
    K = cfg.num_vehicles
    veh_lane = jax.random.randint(k_lane, (K,), 0, cfg.num_lanes).astype(
        jnp.float32)
    # spawn spread out ahead/behind the ego
    veh_s = jax.random.uniform(k_s, (K,), minval=-60.0, maxval=200.0)
    veh_pref = cfg.traffic_speed_mean + cfg.traffic_speed_spread * \
        jax.random.uniform(k_v, (K,), minval=-1.0, maxval=1.0)
    zero = jnp.zeros(())
    return MultiLaneEnvState(
        ego_s=zero,
        ego_lane=jnp.zeros(()),
        ego_speed=jnp.asarray(8.0),
        ego_vd=zero,
        veh_s=veh_s,
        veh_lane=veh_lane,
        veh_speed=veh_pref,
        veh_pref=veh_pref,
        step_count=jnp.zeros((), jnp.int32),
        done=jnp.zeros((), bool),
        collided=jnp.zeros((), bool),
        left_road=jnp.zeros((), bool),
    )


def to_multilane_state(st: MultiLaneEnvState,
                       cfg: MultiLaneEnvConfig = MultiLaneEnvConfig()
                       ) -> MultiLaneState:
    """Build the cognition output (MapState.mmap) from raw sim state —
    per-lane nearest front/rear vehicles relative to the ego."""
    L = cfg.num_lanes
    lanes = jnp.arange(L, dtype=jnp.float32)
    lane_dist = jnp.abs(st.veh_lane[:, None] - lanes[None, :])
    member = lane_dist <= 0.5
    rel_s = st.veh_s[:, None] - st.ego_s

    front_key = jnp.where(member & (rel_s > 0), rel_s, jnp.inf)
    front_idx = jnp.argmin(front_key, axis=0)
    front_exists = jnp.isfinite(jnp.min(front_key, axis=0))
    rear_key = jnp.where(member & (rel_s <= 0), rel_s, -jnp.inf)
    rear_idx = jnp.argmax(rear_key, axis=0)
    rear_exists = jnp.max(rear_key, axis=0) > -jnp.inf

    front = LaneVehicle(
        exists=front_exists,
        s=jnp.where(front_exists, rel_s[front_idx, jnp.arange(L)], 50.0),
        d=jnp.where(front_exists, st.veh_lane[front_idx], lanes),
        vs=jnp.where(front_exists, st.veh_speed[front_idx], 20.0),
        vd=jnp.zeros((L,)),
    )
    rear = LaneVehicle(
        exists=rear_exists,
        s=jnp.where(rear_exists, rel_s[rear_idx, jnp.arange(L)], -50.0),
        d=jnp.where(rear_exists, st.veh_lane[rear_idx], lanes),
        vs=jnp.where(rear_exists, st.veh_speed[rear_idx], 0.0),
        vd=jnp.zeros((L,)),
    )
    return MultiLaneState(
        ego_lane_index=st.ego_lane,
        ego_speed=st.ego_speed,
        ego_vd=st.ego_vd,
        front=front,
        rear=rear,
        speed_limit=jnp.full((L,), cfg.speed_limit),
        distance_to_junction=cfg.road_length - st.ego_s,
        target_lane_index=jnp.asarray(float(cfg.target_lane_index)),
        traffic_light_stop=jnp.zeros((L,), bool),
        stop_distance=jnp.full((L,), 1e6),
    )


def _idm_traffic(st: MultiLaneEnvState, cfg: MultiLaneEnvConfig):
    """Traffic vehicles follow the nearest leader in their lane (IDM),
    treating the ego as a leader too."""
    all_s = jnp.concatenate([st.veh_s, st.ego_s[None]])
    all_lane = jnp.concatenate([st.veh_lane, st.ego_lane[None]])
    all_v = jnp.concatenate([st.veh_speed, st.ego_speed[None]])

    rel = all_s[None, :] - st.veh_s[:, None]            # [K, K+1]
    same_lane = jnp.abs(all_lane[None, :] - st.veh_lane[:, None]) <= 0.5
    ahead = same_lane & (rel > 0.1)
    gap_key = jnp.where(ahead, rel, jnp.inf)
    leader = jnp.argmin(gap_key, axis=1)
    has_leader = jnp.isfinite(jnp.min(gap_key, axis=1))
    gap = jnp.where(has_leader, gap_key[jnp.arange(gap_key.shape[0]), leader],
                    100.0)
    lv = jnp.where(has_leader, all_v[leader], st.veh_pref)

    v = st.veh_speed
    dv = v - lv
    g1 = cfg.idm_g0 + cfg.idm_t * v + v * dv / (
        2.0 * jnp.sqrt(cfg.idm_a * cfg.idm_b))
    acc = cfg.idm_a * (1.0 - (v / jnp.maximum(st.veh_pref, 0.1)) ** 4
                       - (g1 / jnp.maximum(gap, 1.0)) ** 2)
    new_v = jnp.clip(v + acc * cfg.dt, 0.0, 30.0)
    new_s = st.veh_s + new_v * cfg.dt
    return new_s, new_v


def step(
    st: MultiLaneEnvState,
    target_lane: jax.Array,
    target_speed: jax.Array,
    cfg: MultiLaneEnvConfig = MultiLaneEnvConfig(),
) -> Tuple[MultiLaneEnvState, jax.Array, jax.Array]:
    """One 0.2 s decision tick -> (state', reward, done).

    Reward follows the socket gym (cz_dqn.py): 1 per surviving step, 0
    on collision; episode ends on collision or on leaving the multilane
    segment."""
    # ego longitudinal: first-order tracking of the commanded speed
    v_cmd = jnp.clip(target_speed, 0.0, 30.0)
    accel = jnp.clip((v_cmd - st.ego_speed) / cfg.dt, -4.0, 2.5)
    ego_speed = jnp.maximum(st.ego_speed + accel * cfg.dt, 0.0)
    ego_s = st.ego_s + ego_speed * cfg.dt

    # ego lateral: slew toward the target lane index
    diff = target_lane.astype(jnp.float32) - st.ego_lane
    max_move = cfg.lane_change_rate * cfg.dt
    move = jnp.clip(diff, -max_move, max_move)
    ego_lane = jnp.clip(st.ego_lane + move, 0.0, cfg.num_lanes - 1.0)
    ego_vd = move / cfg.dt

    veh_s, veh_speed = _idm_traffic(st, cfg)

    close_s = jnp.abs(veh_s - ego_s) < cfg.collision_ds
    close_lane = jnp.abs(st.veh_lane - ego_lane) < cfg.collision_dlane
    collided = jnp.any(close_s & close_lane)

    left_road = ego_s >= cfg.road_length
    step_count = st.step_count + 1
    done = collided | left_road | (step_count >= cfg.max_steps)
    reward = jnp.where(collided, 0.0, 1.0)

    new = MultiLaneEnvState(
        ego_s=ego_s, ego_lane=ego_lane, ego_speed=ego_speed, ego_vd=ego_vd,
        veh_s=veh_s, veh_lane=st.veh_lane, veh_speed=veh_speed,
        veh_pref=st.veh_pref, step_count=step_count, done=done,
        collided=collided, left_road=left_road,
    )
    return new, reward, done


def step_autoreset(st: MultiLaneEnvState, target_lane, target_speed,
                   key: jax.Array,
                   cfg: MultiLaneEnvConfig = MultiLaneEnvConfig()):
    new, reward, done = step(st, target_lane, target_speed, cfg)
    fresh = reset(key, cfg)
    blended = jax.tree.map(
        lambda a, b: jnp.where(
            jnp.reshape(done, (1,) * a.ndim) if a.ndim else done, b, a),
        new, fresh)
    blended = blended._replace(done=done, collided=new.collided,
                               left_road=new.left_road)
    return blended, reward, done
