"""Lane-level local trajectory — keep-lane windows + hermite lane change.

Re-design of the reference's ``PolylineTrajectory``
(SW/planning/decision/lane_models/src/zzz_planning_decision_lane_models/
local_trajectory.py:13-112), which turns the lateral decision
``(target_lane_index, desired_speed)`` into an executable path for the
controller (the ``DecisionTrajectory`` payload):

- ego within ``rectify_thres`` of the target centerline -> the dense
  centerline window ahead of ego, length ``v * time_ahead +
  distance_ahead`` (:28-43);
- otherwise -> a cubic hermite blend from the ego pose to a point
  ``lc_dis = max(rectify_dt * v, 6 m)`` down the target centerline
  (tangent-aligned both ends), concatenated with the centerline
  continuation (:48-89, :91-112).

TPU shape: everything is fixed-size — the centerline arrives as a
uniformly-dense ``[N, 2]`` polyline (resolution ``res``), the output is
always ``[n_out, 2]`` with points beyond the horizon clamped to the
last valid point (pure pursuit ignores duplicates), and the
keep-vs-change branch is a ``jnp.where`` select.  Batch over envs with
``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops import geometry as geo

HERMITE_PTS = 20      # reference hermite resolution (:91)
RECTIFY_THRES = 2.0   # m (:15)
TIME_AHEAD = 5.0      # s (:15)
DIST_AHEAD = 10.0     # m (:15)
LC_DT = 1.5           # s per lane of lateral offset (:16)
LC_V = 2.67           # m/s fallback rectify speed (:16)
RECTIFY_MIN_D = 6.0   # m minimum lane-change distance (:48)


class LocalTrajectory(NamedTuple):
    """DecisionTrajectory analog: fixed-shape path + desired speed."""

    points: jnp.ndarray        # [n_out, 2]
    desired_speed: jnp.ndarray  # scalar
    lane_change: jnp.ndarray   # bool: hermite blend active


def cubic_hermite(p0, p1, m0, m1, n: int = HERMITE_PTS) -> jnp.ndarray:
    """[n, 2] cubic hermite curve (basis of local_trajectory.py:91-112)."""
    t = jnp.linspace(0.0, 1.0, n)[:, None]
    h00 = 2 * t**3 - 3 * t**2 + 1
    h10 = t**3 - 2 * t**2 + t
    h01 = -2 * t**3 + 3 * t**2
    h11 = t**3 - t**2
    return h00 * p0[None] + h10 * m0[None] + h01 * p1[None] + h11 * m1[None]


def _window(line: jnp.ndarray, start_idx, n_out: int, max_idx) -> jnp.ndarray:
    """Gather ``n_out`` consecutive points from ``start_idx``, clamping
    into [0, max_idx] so out-of-horizon points repeat the last one."""
    idx = jnp.clip(start_idx + jnp.arange(n_out), 0, max_idx)
    return line[idx]


def get_trajectory(
    dense_center: jnp.ndarray,   # [N, 2] target-lane centerline (uniform res)
    ego_x, ego_y, ego_yaw,
    desired_speed,
    ego_lane_index,
    target_lane_index,           # float; -1 => reference-path follow
    res: float = 0.5,
    n_out: int = 64,
) -> LocalTrajectory:
    """Fixed-shape ``PolylineTrajectory.get_trajectory``.

    The caller selects ``dense_center`` (the target lane's centerline,
    or the junction reference path for index -1 — main.py routes this);
    the keep/change policy and geometry follow local_trajectory.py.
    """
    n = dense_center.shape[0]
    desired_speed = jnp.asarray(desired_speed, dense_center.dtype)
    ego_lane_index = jnp.asarray(ego_lane_index, dense_center.dtype)
    target_lane_index = jnp.asarray(target_lane_index, dense_center.dtype)
    ego_yaw = jnp.asarray(ego_yaw, dense_center.dtype)
    p_ego = jnp.stack([jnp.asarray(ego_x, dense_center.dtype),
                       jnp.asarray(ego_y, dense_center.dtype)])
    proj = geo.project_point_to_polyline(p_ego, dense_center)
    nearest_idx = proj.closest_idx
    nearest_dis = jnp.abs(proj.distance)

    ahead_dis = desired_speed * TIME_AHEAD + DIST_AHEAD
    ahead_pts = (ahead_dis / res).astype(jnp.int32)
    max_idx = n - 1

    # ---- keep-lane branch: centerline window ahead of ego (:39-43)
    keep = _window(dense_center, nearest_idx, n_out,
                   jnp.minimum(nearest_idx + ahead_pts, max_idx))

    # ---- lane-change branch (:48-89)
    is_multilane = target_lane_index >= 0
    rectify_dt = jnp.where(
        is_multilane,
        jnp.abs(ego_lane_index - target_lane_index) * LC_DT,
        nearest_dis / LC_V)
    lc_dis = jnp.maximum(rectify_dt * desired_speed, RECTIFY_MIN_D)
    lc_pts = (lc_dis / res).astype(jnp.int32)
    end_idx = jnp.clip(nearest_idx + lc_pts, 0, max_idx)
    p_end = dense_center[end_idx]
    # end tangent from the centerline segment at the end point
    nxt = jnp.clip(end_idx + 1, 0, max_idx)
    tangent_end = dense_center[nxt] - dense_center[jnp.maximum(nxt - 1, 0)]
    tangent_end = tangent_end / jnp.maximum(
        jnp.linalg.norm(tangent_end), 1e-6)
    tangent_start = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)]) \
        .astype(dense_center.dtype)
    # tangent magnitude ~ segment length keeps curvature sane
    scale = jnp.maximum(jnp.linalg.norm(p_end - p_ego), 1e-3)
    lc_path = cubic_hermite(p_ego, p_end, tangent_start * scale,
                            tangent_end * scale)
    cont = _window(dense_center, end_idx, n_out - HERMITE_PTS,
                   jnp.minimum(nearest_idx + ahead_pts, max_idx))
    change = jnp.concatenate([lc_path, cont], axis=0)

    do_change = nearest_dis > RECTIFY_THRES
    points = jnp.where(do_change, change, keep)
    return LocalTrajectory(points=points,
                           desired_speed=jnp.asarray(desired_speed),
                           lane_change=do_change)
