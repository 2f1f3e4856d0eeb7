"""Multilane world model — the cognition layer's MapState, tensorized.

The field stack's cognition nodes (NearestLocator /
DrivingSpaceConstructor) produce a ``MapState`` message: ego state +
ego Frenet state + a multilane model with per-lane sorted front/rear
obstacles (software/src/cognition/protocol/msg/MapState.msg,
obstacle_locator.py).  Here that structure is a fixed-shape pytree the
lane-level rule policies (IDM, LaneUtility) and the RLS decision layer
consume directly — built either from a native multilane env or from any
set of tracked objects via :func:`locate_objects`.

Conventions follow the reference: lane indices count from the outside
(0 = outermost); ``ego_lane_index`` is continuous between lane centers
(dynamic_map.py:337-369); front/rear vehicles are the nearest in each
lane by arc-length distance.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class LaneVehicle(NamedTuple):
    """Nearest vehicle ahead/behind in one lane (RoadObstacle summary:
    ffstate s/d/vs/vd + presence)."""

    exists: jax.Array  # [..., L] bool
    s: jax.Array       # [..., L] longitudinal position (ego at s=0)
    d: jax.Array       # [..., L] continuous lane index of the vehicle
    vs: jax.Array      # [..., L] longitudinal speed
    vd: jax.Array      # [..., L] lateral speed


class MultiLaneState(NamedTuple):
    """The mmap: everything the lane-level policies read."""

    ego_lane_index: jax.Array       # continuous lane index
    ego_speed: jax.Array            # m/s
    ego_vd: jax.Array               # lateral speed (lane-index units/s)
    front: LaneVehicle              # per-lane nearest front vehicle
    rear: LaneVehicle               # per-lane nearest rear vehicle
    speed_limit: jax.Array          # [L] lane speed limits (m/s * 3.6 in msg)
    distance_to_junction: jax.Array  # m to the multilane exit
    target_lane_index: jax.Array    # exit lane
    traffic_light_stop: jax.Array   # [L] bool: lane must stop
    stop_distance: jax.Array        # [L] m to the stop line

    @property
    def num_lanes(self) -> int:
        return self.front.s.shape[-1]


def locate_objects(
    num_lanes: int,
    ego_s: jax.Array,
    ego_lane: jax.Array,
    obj_s: jax.Array,      # [K] arc-length positions
    obj_lane: jax.Array,   # [K] continuous lane indices
    obj_vs: jax.Array,     # [K]
    obj_vd: jax.Array,     # [K]
    obj_valid: jax.Array,  # [K]
    lane_dist_thres: float = 1.0,
) -> tuple[LaneVehicle, LaneVehicle]:
    """Sort tracked objects into per-lane nearest front/rear slots —
    the vectorized core of
    ``locate_surrounding_objects_in_lanes`` (dynamic_map.py:293-334):
    an object joins the lane whose center is nearest (within
    ``lane_dist_thres`` lane units); front = smallest s > ego_s, rear =
    largest s < ego_s."""
    lanes = jnp.arange(num_lanes, dtype=obj_lane.dtype)
    lane_dist = jnp.abs(obj_lane[:, None] - lanes[None, :])   # [K, L]
    closest = jnp.argmin(lane_dist, axis=1)                   # [K]
    in_lane = (jnp.min(lane_dist, axis=1) <= lane_dist_thres) & obj_valid

    member = (closest[:, None] == jnp.arange(num_lanes)[None, :]) \
        & in_lane[:, None]                                    # [K, L]
    rel_s = obj_s[:, None] - ego_s

    front_key = jnp.where(member & (rel_s > 0), rel_s, jnp.inf)
    front_idx = jnp.argmin(front_key, axis=0)                 # [L]
    front_exists = jnp.isfinite(jnp.min(front_key, axis=0))

    rear_key = jnp.where(member & (rel_s <= 0), rel_s, -jnp.inf)
    rear_idx = jnp.argmax(rear_key, axis=0)
    rear_exists = jnp.max(rear_key, axis=0) > -jnp.inf

    front = LaneVehicle(
        exists=front_exists,
        s=jnp.where(front_exists, rel_s[front_idx, 0], 50.0),
        d=jnp.where(front_exists, obj_lane[front_idx],
                    jnp.arange(num_lanes, dtype=obj_lane.dtype)),
        vs=jnp.where(front_exists, obj_vs[front_idx], 20.0),
        vd=jnp.where(front_exists, obj_vd[front_idx], 0.0),
    )
    rear = LaneVehicle(
        exists=rear_exists,
        s=jnp.where(rear_exists, rel_s[rear_idx, 0], -50.0),
        d=jnp.where(rear_exists, obj_lane[rear_idx],
                    jnp.arange(num_lanes, dtype=obj_lane.dtype)),
        vs=jnp.where(rear_exists, obj_vs[rear_idx], 0.0),
        vd=jnp.where(rear_exists, obj_vd[rear_idx], 0.0),
    )
    return front, rear
