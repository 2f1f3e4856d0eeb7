"""LaneUtility — the field stack's rule-based lateral policy.

Re-design of zzz_planning_decision_lane_models/lateral.py:9-155:
utility = 1.5 * available_speed + exit-proximity bonus; a lane change
is admissible only when front/rear gaps in the target lane satisfy
``gap > max(10 + 3*dv, 20)``; the current lane gets a +0.5 hysteresis
bonus; junction tail speed caps the longitudinal command
(lateral.py:129-148).  Vectorized over env batches."""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.planning import idm
from dcarl_tpu.planning.multilane import MultiLaneState

CHANGE_LANE_THRES = 0.5


def lane_utility(mmap: MultiLaneState, lane_index: jax.Array) -> jax.Array:
    """utility(lane) = 1.5*v_avail + 1/(|exit-lane|+1) * max(0, 200-d) * 0.1
    (lateral.py:101-108)."""
    speed = idm.longitudinal_speed(mmap, lane_index)
    exit_gap = jnp.abs(mmap.target_lane_index - lane_index.astype(
        mmap.ego_speed.dtype))
    bonus = 1.0 / (exit_gap + 1.0) * jnp.maximum(
        0.0, 200.0 - mmap.distance_to_junction) * 0.1
    return speed * 1.5 + bonus


def lane_change_safe(mmap: MultiLaneState, target_index: jax.Array
                     ) -> jax.Array:
    """Gap-acceptance check (lateral.py:110-127 capability): front gap >
    max(10 + 3*(v_ego - v_front), 20), rear gap > max(10 + 3*(v_rear -
    v_ego), 20); lanes outside the road are unsafe."""
    num_lanes = mmap.num_lanes
    in_range = (target_index >= 0) & (target_index <= num_lanes - 1)
    idx = jnp.clip(target_index, 0, num_lanes - 1)

    def take(x):
        return jnp.take_along_axis(x, idx[..., None], axis=-1)[..., 0]

    ego_v = mmap.ego_speed
    f_exists = take(mmap.front.exists)
    f_gap = jnp.abs(take(mmap.front.s))
    f_v = take(mmap.front.vs)
    front_safe = ~f_exists | (
        f_gap > jnp.maximum(10.0 + 3.0 * (ego_v - f_v), 20.0))

    r_exists = take(mmap.rear.exists)
    r_gap = jnp.abs(take(mmap.rear.s))
    r_v = take(mmap.rear.vs)
    rear_safe = ~r_exists | (
        r_gap > jnp.maximum(10.0 + 3.0 * (r_v - ego_v), 20.0))

    return in_range & front_safe & rear_safe


def generate_lane_change_index(mmap: MultiLaneState) -> jax.Array:
    """lateral.py:77-99: compare current/left/right utilities with the
    +0.5 keep-lane bonus; unsafe changes score -1."""
    ego_idx = jnp.round(mmap.ego_lane_index).astype(jnp.int32)
    current = lane_utility(mmap, ego_idx) + CHANGE_LANE_THRES
    left_u = jnp.where(lane_change_safe(mmap, ego_idx + 1),
                       lane_utility(mmap, ego_idx + 1), -1.0)
    right_u = jnp.where(lane_change_safe(mmap, ego_idx - 1),
                        lane_utility(mmap, ego_idx - 1), -1.0)

    pick_right = (right_u > current) & (right_u >= left_u)
    pick_left = (left_u > current) & (left_u > right_u)
    return jnp.where(pick_right, ego_idx - 1,
                     jnp.where(pick_left, ego_idx + 1, ego_idx))


def tail_speed(mmap: MultiLaneState) -> jax.Array:
    """Junction-approach speed cap (lateral.py:129-148): decelerate so
    sqrt(2*0.4*d) bounds the achievable stop."""
    d = mmap.distance_to_junction
    available = jnp.sqrt(jnp.maximum(2.0 * 0.4 * d, 0.0))
    ego_v = mmap.ego_speed
    dec = (ego_v - available) * 5.0
    capped = ego_v - dec * 0.4
    speed = jnp.where(available > ego_v, 10000.0, capped)
    return jnp.where(d <= 0.0, 0.0, speed)


def lateral_decision(mmap: MultiLaneState) -> Tuple[jax.Array, jax.Array]:
    """LaneUtility.lateral_decision (lateral.py:62-75): (target_lane,
    target_speed) with the junction tail-speed cap."""
    target_index = generate_lane_change_index(mmap)
    target_speed = idm.longitudinal_speed(mmap, target_index,
                                          traffic_light=True)
    return target_index, jnp.minimum(target_speed, tail_speed(mmap))
