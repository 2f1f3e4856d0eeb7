"""Global route planning — rolling waypoint windows + hazard checks.

Re-design of the reference's CARLA-side ``RoutePlanner``
(ST/.../Agent/zzz/route_planner.py:30-282): a 5 m-sampled waypoint
queue rolled forward as the ego advances (waypoints closer than
``min_distance`` behind are purged), a fixed-size forward buffer
handed to the local planner, plus the two hazard checks the agent
consumes (traffic light within proximity on our road, lead vehicle
within proximity in our lane); and of the env's ``global_routing``
(TestScenario_Town03.py:149-180), which asks a global planner for the
start->goal polyline once per episode.

TPU shape: the route is ONE fixed [N, 2] polyline computed host-side
at reset (resampled at ``sampling_radius``); per-step work — cursor
advance, window gather, hazard reductions — is jit/vmap-safe with
static shapes, so 64k envs roll their route windows in lockstep.
"""

from __future__ import annotations

import enum
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..ops import geometry as geo

SAMPLING_RADIUS = 5.0    # m between route waypoints (route_planner.py:36)
MIN_DISTANCE = 4.0       # purge radius behind ego (:37)
PROXIMITY_THRES = 15.0   # hazard lookahead (:49)


class RoadOption(enum.IntEnum):
    """Topology options at branch points (route_planner.py:14-28)."""
    VOID = -1
    LEFT = 1
    RIGHT = 2
    STRAIGHT = 3
    LANEFOLLOW = 4


class Route(NamedTuple):
    """A computed global route: uniformly sampled waypoints + options."""
    waypoints: jnp.ndarray   # [N, 2]
    options: jnp.ndarray     # [N] i32 RoadOption codes
    cursor: jnp.ndarray      # i32 index of the first un-passed waypoint


def make_route(path_xy: np.ndarray,
               sampling_radius: float = SAMPLING_RADIUS) -> Route:
    """Resample a global start->goal polyline (the product of the
    reference's GlobalRoutePlanner / waypoint .next() walk) at the
    sampling radius.  Branch detection on a single polyline route is
    trivially LANEFOLLOW with turn options from heading change."""
    dense = geo.dense_polyline2d_np(np.asarray(path_xy, float),
                                    resolution=sampling_radius)
    d = np.diff(dense, axis=0)
    yaw = np.arctan2(d[:, 1], d[:, 0])
    turn = np.zeros(len(dense))
    turn[1:-1] = np.degrees(
        (np.diff(yaw) + np.pi) % (2 * np.pi) - np.pi)
    options = np.full(len(dense), int(RoadOption.LANEFOLLOW), np.int32)
    options[turn > 30] = int(RoadOption.LEFT)
    options[turn < -30] = int(RoadOption.RIGHT)
    return Route(waypoints=jnp.asarray(dense, jnp.float32),
                 options=jnp.asarray(options),
                 cursor=jnp.zeros((), jnp.int32))


def advance(route: Route, ego_x, ego_y,
            min_distance: float = MIN_DISTANCE) -> Route:
    """Purge passed waypoints: move the cursor past every waypoint
    within ``min_distance`` of the ego OR already behind the nearest
    one (run_step's buffer purge, route_planner.py:120-138) — jit-safe
    monotone advance."""
    wp = route.waypoints
    p = jnp.stack([jnp.asarray(ego_x, wp.dtype),
                   jnp.asarray(ego_y, wp.dtype)])
    dist = jnp.linalg.norm(wp - p, axis=1)
    nearest = jnp.argmin(dist).astype(jnp.int32)
    # waypoints up to `nearest` are behind; also consume the nearest
    # itself once within min_distance
    new_cursor = jnp.maximum(
        route.cursor,
        jnp.where(dist[nearest] < min_distance, nearest + 1, nearest))
    new_cursor = jnp.minimum(new_cursor, wp.shape[0] - 1)
    return route._replace(cursor=new_cursor.astype(jnp.int32))


def window(route: Route, size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-size forward waypoint buffer (the ``_waypoint_buffer``
    handed to the local planner); the route end clamps."""
    idx = jnp.clip(route.cursor + jnp.arange(size), 0,
                   route.waypoints.shape[0] - 1)
    return route.waypoints[idx], route.options[idx]


def distance_remaining(route: Route) -> jnp.ndarray:
    """Arc length from the cursor to the goal."""
    wp = route.waypoints
    seg = jnp.linalg.norm(jnp.diff(wp, axis=0), axis=1)
    passed = jnp.arange(seg.shape[0]) < route.cursor
    return jnp.sum(jnp.where(passed, 0.0, seg))


def hazard_vehicle_ahead(route: Route, ego_x, ego_y,
                         veh_xy: jnp.ndarray,      # [K, 2]
                         veh_valid: jnp.ndarray,   # [K] bool
                         proximity: float = PROXIMITY_THRES,
                         lane_half_width: float = 2.0) -> jnp.ndarray:
    """Lead-vehicle hazard (_is_vehicle_hazard semantics): any valid
    vehicle within ``proximity`` of the ego whose projection onto the
    forward route lies ahead and within a lane half-width laterally."""
    wp, _ = window(route, 8)
    p_ego = jnp.stack([jnp.asarray(ego_x, wp.dtype),
                       jnp.asarray(ego_y, wp.dtype)])

    def check(p, ok):
        proj = geo.project_point_to_polyline(p, wp)
        near = jnp.linalg.norm(p - p_ego) < proximity
        in_lane = jnp.abs(proj.distance) < lane_half_width
        ahead = proj.dist_start > 0.5
        return ok & near & in_lane & ahead

    import jax
    hits = jax.vmap(check)(veh_xy, veh_valid)
    return jnp.any(hits)


def hazard_red_light(route: Route, ego_x, ego_y,
                     light_xy: jnp.ndarray,     # [K, 2] stop-line points
                     light_red: jnp.ndarray,    # [K] bool
                     proximity: float = PROXIMITY_THRES) -> jnp.ndarray:
    """Red-light hazard (_is_light_red semantics): a red light's stop
    point within proximity and ahead on the route."""
    wp, _ = window(route, 8)
    p_ego = jnp.stack([jnp.asarray(ego_x, wp.dtype),
                       jnp.asarray(ego_y, wp.dtype)])

    def check(p, red):
        proj = geo.project_point_to_polyline(p, wp)
        near = jnp.linalg.norm(p - p_ego) < proximity
        return red & near & (proj.dist_start > 0.0) \
            & (jnp.abs(proj.distance) < 5.0)

    import jax
    hits = jax.vmap(check)(light_xy, light_red)
    return jnp.any(hits)
