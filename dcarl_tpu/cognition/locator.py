"""NearestLocator — build the lane-level world model from raw tracks.

TPU-native re-design of
software/src/cognition/object_locator/src/zzz_cognition_object_locator/
obstacle_locator.py: the 20 Hz ROS node that merges the static map,
tracked objects, and ego pose into a ``MapState`` becomes one batched
pure function.  Per-object Python loops with R-tree-free
``dist_from_point_to_polyline2d`` calls become a [K objects x L lanes]
vectorized projection; the per-lane sorted front/rear lists become
nearest-slot reductions (the consumers — IDM, LaneUtility, RLSDecision
— only read the nearest vehicle per lane).
"""

from __future__ import annotations

from enum import IntEnum
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.ops.geometry import (cartesian_to_frenet,
                                    project_point_to_polyline)
from dcarl_tpu.planning.multilane import LaneVehicle, MultiLaneState


class MapModel(IntEnum):
    """MapState.msg model enum."""

    JUNCTION = 0
    MULTILANE = 1


class Behavior(IntEnum):
    """RoadObstacle.msg behavior enum (subset the stack consumes)."""

    FOLLOW = 0
    MOVING_LEFT = 1
    MOVING_RIGHT = 2


class LightSignal(IntEnum):
    """ObjectSignals traffic-light enum (perception msg subset)."""

    UNKNOWN = 0
    RED = 1
    YELLOW = 2
    GREEN = 3


class StopState(IntEnum):
    """Lane.msg stop_state enum (navigation/protocol/msg/Lane.msg:20-26)."""

    UNKNOWN = 0
    THRU = 1
    YIELD = 2
    STOP = 3


class TrafficLightDetection(NamedTuple):
    """Fixed-M traffic-light detection table (the constructor's
    ``_traffic_light_detection_buffer``, driving_space_constructor.py:
    77-80)."""

    signal: jax.Array  # [M] LightSignal
    valid: jax.Array   # [M] bool


def locate_traffic_lights_in_lanes(
    lights: TrafficLightDetection, num_lanes: int,
) -> jax.Array:
    """[L] per-lane StopState from light detections
    (locate_traffic_light_in_lanes, driving_space_constructor.py:
    1179-1213), branchless:

    * one detection        -> its state applies to every lane,
    * exactly L detections -> light i states lane i,
    * any other count > 1  -> all lanes STOP unless any light is green,
    * zero detections      -> UNKNOWN (caller falls back to the map's
      stop_state, like the reference's early return).
    """
    sig = jnp.where(lights.valid, lights.signal, LightSignal.UNKNOWN.value)
    m = jnp.sum(lights.valid.astype(jnp.int32))

    def to_state(s):
        return jnp.select(
            [s == LightSignal.RED.value,
             s == LightSignal.YELLOW.value,
             s == LightSignal.GREEN.value],
            [StopState.STOP.value, StopState.YIELD.value,
             StopState.THRU.value],
            StopState.UNKNOWN.value).astype(jnp.int32)

    # valid signals compacted to the front (lane i <- i-th valid light)
    order = jnp.argsort(~lights.valid)  # stable: valid first, in order
    sig_c = jnp.take(sig, order)
    l_idx = jnp.arange(num_lanes)
    per_lane = to_state(sig_c[jnp.minimum(l_idx, sig_c.shape[0] - 1)])
    first = to_state(sig_c[0])

    any_green = jnp.any((sig == LightSignal.GREEN.value) & lights.valid)
    mismatched = jnp.where(any_green, StopState.THRU.value,
                           StopState.STOP.value).astype(jnp.int32)

    out = jnp.select(
        [m == 0, m == 1, m == num_lanes],
        [jnp.full((num_lanes,), StopState.UNKNOWN.value, jnp.int32),
         jnp.full((num_lanes,), 1, jnp.int32) * first,
         per_lane],
        jnp.full((num_lanes,), 1, jnp.int32) * mismatched)
    return out


class SignKind(IntEnum):
    """Detected road-sign classes consumed by the lane locators."""

    NONE = 0
    STOP = 1
    SPEED_LIMIT = 2


class RoadSignDetection(NamedTuple):
    """Fixed-M detected road signs (stop signs / speed-limit boards).

    The reference left both locators as stubs — ``locate_stop_sign_in
    _lanes`` is a literal ``pass`` and the speed limit a hardcoded
    40 km/h (driving_space_constructor.py:1214-1229) — so this goes
    beyond it: signs carry a world position and are attributed to
    their NEAREST lane."""

    kind: jax.Array   # [M] SignKind
    value: jax.Array  # [M] speed limit (m/s) for SPEED_LIMIT signs
    x: jax.Array      # [M]
    y: jax.Array      # [M]
    valid: jax.Array  # [M] bool


def _sign_lane_attribution(signs: RoadSignDetection, lanes: jax.Array,
                           attach_dist: float) -> jax.Array:
    """[M, L] bool: sign m applies to lane l (its nearest lane, within
    ``attach_dist`` of the center line)."""
    proj = jax.vmap(lambda sx, sy: _project_all(sx, sy, lanes))(
        signs.x, signs.y)
    ad = jnp.abs(proj.distance)                       # [M, L]
    nearest = jnp.argmin(ad, axis=1)                  # [M]
    m_idx = jnp.arange(signs.x.shape[0])
    close = ad[m_idx, nearest] <= attach_dist
    return ((nearest[:, None] == jnp.arange(lanes.shape[0])[None, :])
            & (signs.valid & close)[:, None])


def locate_stop_signs_in_lanes(signs: RoadSignDetection, lanes: jax.Array,
                               attach_dist: float = 8.0) -> jax.Array:
    """[L] bool — lane has a detected stop sign (the implementation the
    reference's ``locate_stop_sign_in_lanes`` stub promises,
    driving_space_constructor.py:1214-1219): each STOP detection stops
    its nearest lane; the stop line sits at the lane end like the
    traffic-light case."""
    member = _sign_lane_attribution(signs, lanes, attach_dist)
    is_stop = signs.kind == SignKind.STOP.value
    return jnp.any(member & is_stop[:, None], axis=0)


def locate_speed_limits_in_lanes(signs: RoadSignDetection,
                                 lanes: jax.Array,
                                 default_limit: jax.Array,
                                 attach_dist: float = 8.0) -> jax.Array:
    """[L] m/s — per-lane speed limit: the MINIMUM of the map default
    and any detected speed-limit sign attributed to the lane (replaces
    the reference's hardcoded ``40`` at
    driving_space_constructor.py:1220-1229)."""
    member = _sign_lane_attribution(signs, lanes, attach_dist)
    is_lim = signs.kind == SignKind.SPEED_LIMIT.value
    applies = member & is_lim[:, None]                # [M, L]
    lim = jnp.where(applies, signs.value[:, None], jnp.inf)
    return jnp.minimum(default_limit, jnp.min(lim, axis=0))


class StaticLocalMap(NamedTuple):
    """The windowed static map (navigation's Map msg): L lanes sampled
    to a common point count N, outermost lane first (reference lane
    ordering)."""

    lanes: jax.Array           # [L, N, 2] central path polylines
    tangents: jax.Array        # [L, N] tangent yaw at each point
    speed_limit: jax.Array     # [L] m/s
    stop_thru: jax.Array       # [L] bool — Lane.STOP_STATE_THRU
    target_lane_index: jax.Array  # scalar

    @property
    def num_lanes(self) -> int:
        return self.lanes.shape[0]


class EgoPose(NamedTuple):
    x: jax.Array
    y: jax.Array
    vx: jax.Array
    vy: jax.Array
    yaw: jax.Array


class TrackedObjects(NamedTuple):
    """Fixed-K tracked-object table (TrackingBoxArray equivalent)."""

    x: jax.Array      # [K]
    y: jax.Array      # [K]
    vx: jax.Array     # [K]
    vy: jax.Array     # [K]
    yaw: jax.Array    # [K]
    valid: jax.Array  # [K] bool


def _project_all(x, y, lanes):
    """Project one point onto all L lanes: returns the
    PolylineProjection pytree batched to [L]."""
    p = jnp.stack([x, y])
    return jax.vmap(lambda line: project_point_to_polyline(p, line))(lanes)


def locate_objects_in_lane(x, y, lanes: jax.Array,
                           lane_dist_thres: float = 5.0) -> jax.Array:
    """Continuous lane index of a point (locate_object_in_lane,
    obstacle_locator.py:138-170): interpolate between the two nearest
    lane center lines when the point lies between them; -1 when farther
    than ``lane_dist_thres`` from every lane."""
    proj = _project_all(x, y, lanes)
    d = proj.distance                      # [L] signed
    ad = jnp.abs(d)
    L = lanes.shape[0]

    a = jnp.argmin(ad)
    ad2 = ad.at[a].set(jnp.inf)
    b = jnp.argmin(ad2)
    da, db = d[a], d[b]
    la, lb = jnp.abs(da), jnp.abs(db)

    outside = da * db > 0                   # same side of both centers
    between = (b.astype(jnp.float32) * la + a.astype(jnp.float32) * lb) \
        / jnp.maximum(la + lb, 1e-9)
    idx = jnp.where(outside | (L < 2), a.astype(jnp.float32), between)
    return jnp.where(la > lane_dist_thres, -1.0, idx)


def predict_vehicle_behavior(yaw, x, y, smap: StaticLocalMap,
                             lane_change_thres: float = 0.2) -> jax.Array:
    """Behavior enum from heading vs lane tangent
    (predict_vehicle_behavior, obstacle_locator.py:378-404)."""
    proj = _project_all(x, y, smap.lanes)
    closest_lane = jnp.argmin(jnp.abs(proj.distance))
    closest_idx = proj.closest_idx[closest_lane]
    lane_dir = smap.tangents[closest_lane, closest_idx]
    d_theta = (yaw - lane_dir + jnp.pi) % (2.0 * jnp.pi) - jnp.pi
    return jnp.where(
        jnp.abs(d_theta) > lane_change_thres,
        jnp.where(d_theta > 0, Behavior.MOVING_LEFT.value,
                  Behavior.MOVING_RIGHT.value),
        Behavior.FOLLOW.value).astype(jnp.int32)


def update_map_state(
    smap: StaticLocalMap,
    ego: EgoPose,
    objects: TrackedObjects,
    lights: "TrafficLightDetection | None" = None,
    signs: "RoadSignDetection | None" = None,
    lane_end_dist_thres: float = 15.0,
    lane_head_thres: float = 3.0,
    lane_dist_thres: float = 5.0,
    lane_width: float = 3.0,
    vehicle_width: float = 1.7,
    danger_area: float = 30.0,
) -> Tuple[MultiLaneState, jax.Array, jax.Array]:
    """The NearestLocator.update tick (obstacle_locator.py:68-136 +
    locate_ego_vehicle_in_lanes:189-229 +
    locate_surrounding_objects_in_lanes:231-305 + the
    DrivingSpaceConstructor's light ingestion,
    driving_space_constructor.py:84-142, 1179-1213).

    Returns (mmap, model, behaviors[K]):
      * ``mmap``  — the MultiLaneState the planners consume,
      * ``model`` — MapModel.JUNCTION when the ego is off-lane / at a
        lane head / close to a THRU lane end (the junction hand-off),
      * ``behaviors`` — per-object Behavior enum.

    ``lights`` feeds per-lane stop states: a RED/YELLOW lane reports
    ``traffic_light_stop`` with ``stop_distance`` = the ego's distance
    to that lane's end (the stop line sits at the lane end, where the
    reference's NativeMap loops terminate at junctions) — consumed by
    :func:`dcarl_tpu.planning.idm.traffic_light_speed`.
    """
    L = smap.num_lanes
    lanes_f = jnp.arange(L, dtype=jnp.float32)

    # --- ego location
    ego_proj = _project_all(ego.x, ego.y, smap.lanes)   # [L]
    ego_lane_index = locate_objects_in_lane(ego.x, ego.y, smap.lanes,
                                            lane_dist_thres)
    ego_rounded = jnp.clip(jnp.round(ego_lane_index).astype(jnp.int32),
                           0, L - 1)
    ego_head = ego_proj.dist_start                      # [L]
    ego_tail = ego_proj.dist_end

    off_lane = ego_lane_index < 0
    near_tail = (ego_tail[ego_rounded] <= lane_end_dist_thres) \
        & smap.stop_thru[ego_rounded]
    near_head = ego_head[ego_rounded] <= lane_head_thres
    model = jnp.where(off_lane | near_tail | near_head,
                      MapModel.JUNCTION.value,
                      MapModel.MULTILANE.value).astype(jnp.int32)

    ego_ff = cartesian_to_frenet(ego.x, ego.y, ego.vx, ego.vy, ego.yaw,
                                 smap.lanes[ego_rounded],
                                 smap.tangents[ego_rounded])
    ego_speed = jnp.sqrt(ego.vx ** 2 + ego.vy ** 2)

    # --- objects onto lanes: [K, L] projections
    obj_proj = jax.vmap(lambda ox, oy: _project_all(ox, oy, smap.lanes))(
        objects.x, objects.y)
    obj_dist = obj_proj.distance                        # [K, L]
    closest = jnp.argmin(jnp.abs(obj_dist), axis=1)     # [K]
    k_idx = jnp.arange(objects.x.shape[0])
    d_closest = jnp.abs(obj_dist[k_idx, closest])
    dist_to_ego = jnp.sqrt((objects.x - ego.x) ** 2
                           + (objects.y - ego.y) ** 2)
    usable = objects.valid & (dist_to_ego <= danger_area) \
        & (d_closest <= lane_width * 0.5 + vehicle_width * 0.5)

    member = (closest[:, None] == jnp.arange(L)[None, :]) & usable[:, None]

    obj_head = obj_proj.dist_start                      # [K, L]
    obj_tail = obj_proj.dist_end
    # front: smaller distance-to-lane-end than the ego; relative s =
    # ego_tail - obj_tail (obstacle_locator.py:279). rear: relative s =
    # obj_head - ego_head (negative, :297).
    front_s = ego_tail[None, :] - obj_tail              # [K, L]
    rear_s = obj_head - ego_head[None, :]

    is_front = member & (obj_tail < ego_tail[None, :])
    is_rear = member & (obj_head < ego_head[None, :]) & ~is_front

    # per-object Frenet speed in its closest lane
    obj_ff = jax.vmap(
        lambda ox, oy, ovx, ovy, oyaw, c: cartesian_to_frenet(
            ox, oy, ovx, ovy, oyaw, smap.lanes[c], smap.tangents[c])
    )(objects.x, objects.y, objects.vx, objects.vy, objects.yaw, closest)
    obj_lane_cont = jax.vmap(
        lambda ox, oy: locate_objects_in_lane(ox, oy, smap.lanes,
                                              lane_dist_thres)
    )(objects.x, objects.y)

    front_key = jnp.where(is_front, front_s, jnp.inf)
    front_idx = jnp.argmin(front_key, axis=0)           # [L] nearest front
    front_exists = jnp.isfinite(jnp.min(front_key, axis=0))
    rear_key = jnp.where(is_rear, rear_s, -jnp.inf)
    rear_idx = jnp.argmax(rear_key, axis=0)
    rear_exists = jnp.max(rear_key, axis=0) > -jnp.inf

    l_idx = jnp.arange(L)
    front = LaneVehicle(
        exists=front_exists,
        s=jnp.where(front_exists, front_s[front_idx, l_idx], 50.0),
        d=jnp.where(front_exists, obj_lane_cont[front_idx], lanes_f),
        vs=jnp.where(front_exists, obj_ff.vs[front_idx], 20.0),
        vd=jnp.where(front_exists, obj_ff.vd[front_idx], 0.0),
    )
    rear = LaneVehicle(
        exists=rear_exists,
        s=jnp.where(rear_exists, rear_s[rear_idx, l_idx], -50.0),
        d=jnp.where(rear_exists, obj_lane_cont[rear_idx], lanes_f),
        vs=jnp.where(rear_exists, obj_ff.vs[rear_idx], 0.0),
        vd=jnp.where(rear_exists, obj_ff.vd[rear_idx], 0.0),
    )

    behaviors = jax.vmap(
        lambda oyaw, ox, oy: predict_vehicle_behavior(oyaw, ox, oy, smap)
    )(objects.yaw, objects.x, objects.y)

    # --- traffic lights -> per-lane stop states + stop-line distance
    if lights is None:
        stop_state = jnp.full((L,), StopState.UNKNOWN.value, jnp.int32)
    else:
        stop_state = locate_traffic_lights_in_lanes(lights, L)
    # UNKNOWN (no detections) means no standing red — the reference's
    # early return leaves the map's default; the stop line sits at the
    # lane end.
    light_stop = (stop_state == StopState.STOP.value) \
        | (stop_state == StopState.YIELD.value)

    # --- detected road signs: stop signs stop their lane; speed-limit
    # boards cap it (both locators the reference stubbed out,
    # driving_space_constructor.py:1214-1229)
    speed_limit = smap.speed_limit
    if signs is not None:
        light_stop = light_stop | locate_stop_signs_in_lanes(
            signs, smap.lanes)
        speed_limit = locate_speed_limits_in_lanes(
            signs, smap.lanes, speed_limit)

    mmap = MultiLaneState(
        ego_lane_index=ego_lane_index,
        ego_speed=ego_speed,
        ego_vd=ego_ff.vd,
        front=front,
        rear=rear,
        speed_limit=speed_limit,
        distance_to_junction=ego_tail[ego_rounded],
        target_lane_index=smap.target_lane_index.astype(jnp.float32),
        traffic_light_stop=light_stop,
        stop_distance=jnp.where(light_stop, ego_tail, 1e6),
    )
    return mmap, model, behaviors
