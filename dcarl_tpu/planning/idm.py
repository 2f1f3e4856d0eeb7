"""IDM longitudinal rule policy.

Re-design of the field stack's Intelligent Driver Model
(software/src/planning/decision/lane_models/src/
zzz_planning_decision_lane_models/longitudinal.py:9-138): identical
constants (T=3.6, g0=19, a=2.73, b=6.65, delta=4, dt=0.2), the
low-speed acceleration boost, the neighbor-lane cut-in response, and
the traffic-light stop rule — vectorized over all lanes of all envs at
once (the reference computes one lane per call)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dcarl_tpu.planning.multilane import MultiLaneState

T_HEADWAY = 3.6
G0 = 7.0 + 12.0
A_MAX = 2.73
B_COMF = 1.65 + 5.0
DELTA = 4
DECISION_DT = 0.2


def idm_speed_in_lane(
    ego_speed: jax.Array,
    speed_limit: jax.Array,     # [L] in m/s*3.6 units? reference: /3.6
    front_exists: jax.Array,    # [..., L]
    front_gap: jax.Array,       # [..., L] m (distance to front vehicle)
    front_speed: jax.Array,     # [..., L] m/s
) -> jax.Array:
    """IDM_speed_in_lane (longitudinal.py:63-99) for every lane at once:
    v' = max(0, v + a_idm * dt)."""
    v = ego_speed[..., None]
    v0 = jnp.maximum(speed_limit, 1e-3)
    a = jnp.where(v < 5.0, A_MAX + (5.0 - v) / 5.0 * 2.0, A_MAX)

    dv = jnp.where(front_exists, v - front_speed, 0.0)
    g = jnp.where(front_exists, jnp.maximum(front_gap, 1e-3), 50.0)
    g1 = jnp.where(
        front_exists,
        G0 + T_HEADWAY * v + v * dv / (2.0 * jnp.sqrt(a * B_COMF)),
        0.0)

    acc = a * (1.0 - (v / v0) ** DELTA - (g1 / g) ** 2)
    return jnp.maximum(0.0, (v + acc * DECISION_DT))


def traffic_light_speed(
    ego_speed: jax.Array,
    must_stop: jax.Array,      # [..., L] bool (not STOP_STATE_THRU)
    stop_distance: jax.Array,  # [..., L]
) -> jax.Array:
    """traffic_light_speed (longitudinal.py:102-113): 0 when the stop
    line is within the braking envelope, inf otherwise."""
    v = ego_speed[..., None]
    braking = 10.0 + v * v / 2.0 / 2.0
    stop_now = must_stop & (stop_distance < braking)
    return jnp.where(stop_now, 0.0, jnp.inf)


def cutting_in(neighbor_front_d: jax.Array, neighbor_exists: jax.Array,
               neighbor_idx: jax.Array, ego_idx: jax.Array) -> jax.Array:
    """neighbor_vehicle_is_cutting_in (longitudinal.py:116-132): the
    neighbor lane's front vehicle is laterally between the two lane
    centers.  (The reference also gates on a tracked MOVING_LEFT/RIGHT
    behavior flag; with instantaneous lateral position between centers
    the geometric test below is the active condition.)"""
    between = (neighbor_idx - neighbor_front_d) * (ego_idx - neighbor_front_d) < 0
    return neighbor_exists & between


def longitudinal_speed(
    mmap: MultiLaneState,
    target_lane_index: jax.Array,
    traffic_light: bool = False,
) -> jax.Array:
    """IDM.longitudinal_speed (longitudinal.py:22-61): the lane's IDM
    speed, min-ed with neighbor-lane IDM speeds when their front
    vehicles are cutting in, and with the traffic-light rule."""
    num_lanes = mmap.num_lanes
    front_gap = jnp.abs(mmap.front.s)
    per_lane = idm_speed_in_lane(mmap.ego_speed, mmap.speed_limit,
                                 mmap.front.exists, front_gap,
                                 mmap.front.vs)  # [..., L]

    idx = jnp.clip(target_lane_index.astype(jnp.int32), 0, num_lanes - 1)
    speed = jnp.take_along_axis(per_lane, idx[..., None], axis=-1)[..., 0]
    idx_f = idx.astype(per_lane.dtype)

    # neighbor cut-in response (left = idx+1, right = idx-1)
    for delta in (1, -1):
        n_idx = idx + delta
        valid = (n_idx >= 0) & (n_idx < num_lanes)
        n_idx_c = jnp.clip(n_idx, 0, num_lanes - 1)
        n_front_d = jnp.take_along_axis(mmap.front.d, n_idx_c[..., None],
                                        axis=-1)[..., 0]
        n_exists = jnp.take_along_axis(mmap.front.exists, n_idx_c[..., None],
                                       axis=-1)[..., 0]
        cut = cutting_in(n_front_d, n_exists,
                         n_idx_c.astype(per_lane.dtype), idx_f) & valid
        n_speed = jnp.take_along_axis(per_lane, n_idx_c[..., None],
                                      axis=-1)[..., 0]
        speed = jnp.where(cut, jnp.minimum(speed, n_speed), speed)

    if traffic_light:
        tl = traffic_light_speed(mmap.ego_speed, mmap.traffic_light_stop,
                                 mmap.stop_distance)
        tl_lane = jnp.take_along_axis(tl, idx[..., None], axis=-1)[..., 0]
        speed = jnp.minimum(speed, tl_lane)

    # out-of-range target lane -> 0 (longitudinal.py:26-28)
    in_range = (target_lane_index >= 0) & (target_lane_index <= num_lanes - 1)
    return jnp.where(in_range, speed, 0.0)
