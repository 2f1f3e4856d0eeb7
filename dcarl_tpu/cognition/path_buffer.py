"""PathBuffer — rolling dense reference-path window around the ego.

TPU-native re-design of
software/src/cognition/object_locator/src/zzz_cognition_object_locator/
path_buffer.py: the deque of waypoints (dequeue passed points, enqueue
from the received route, flag rerouting / junction fallback when the
remaining route is short) becomes a fixed-shape cursor into a static
route array — ``dynamic_slice`` window + scalar cursor state, fully
jittable and batched over envs.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.ops.geometry import project_point_to_polyline


class PathBufferState(NamedTuple):
    cursor: jax.Array         # i32 — route index of the window start
    rerouting: jax.Array      # bool — route nearly exhausted & stopped


def path_buffer_init() -> PathBufferState:
    return PathBufferState(cursor=jnp.zeros((), jnp.int32),
                           rerouting=jnp.zeros((), bool))


def path_buffer_update(
    state: PathBufferState,
    route: jax.Array,         # [N, 2] full dense reference path (static)
    ego_x, ego_y, ego_speed,
    window: int = 150,        # buffer_size (path_buffer.py:19)
    remained_passed_points: int = 5,
    required_reference_path_length: int = 15,
    prepare_stop_path_length: int = 30,
) -> Tuple[PathBufferState, jax.Array, jax.Array, jax.Array]:
    """One update tick (path_buffer.py:82-155).

    Returns (state', segment[window, 2], valid[window], junction_flag):
    the window keeps ``remained_passed_points`` behind the nearest
    waypoint; ``junction_flag`` mirrors the reference's fallback to the
    junction model when fewer than ``prepare_stop_path_length`` points
    remain; ``rerouting`` latches when the route is nearly exhausted
    while (almost) stopped — the renew_ref_path trigger."""
    n = route.shape[0]
    proj = project_point_to_polyline(jnp.stack([ego_x, ego_y]), route)
    nearest = proj.closest_idx

    # never move backwards; keep a few passed points
    cursor = jnp.maximum(state.cursor, nearest - remained_passed_points)
    cursor = jnp.clip(cursor, 0, n - 1)

    idx = cursor + jnp.arange(window)
    valid = idx < n
    seg = route[jnp.clip(idx, 0, n - 1)]
    # pad the tail with the last route point
    seg = jnp.where(valid[:, None], seg, route[n - 1])

    remaining = n - cursor
    junction_flag = remaining < prepare_stop_path_length
    rerouting = (remaining < required_reference_path_length) \
        & (ego_speed < 1.0 / 3.6)

    return (PathBufferState(cursor=cursor, rerouting=rerouting),
            seg, valid, junction_flag)
