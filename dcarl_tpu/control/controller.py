"""Longitudinal PID + lateral pure-pursuit control, as pure functions.

Re-design of the reference controller
(Data_From_Carla/Agent/zzz/controller.py): speed PID with
K_P = 0.25/3.6 on km/h error (K_I = K_D = 0, full brake when the target
speed is zero; :26-90) and speed-scaled-lookahead pure pursuit with
wheelbase lf+lr = 1.2+1.95 (:92-199).  Both are stateless in effect
(the reference's integral/derivative gains are zero), so they vectorize
over env batches without carried controller state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

PID_KP = 0.25 / 3.6
LF = 1.2
LR = 1.95
LWB = LF + LR


class ControlAction(NamedTuple):
    acc: jax.Array       # [-1, 1] throttle/brake split
    steering: jax.Array  # front-wheel angle [rad]


def longitudinal_pid(target_speed, current_speed) -> jax.Array:
    """_pid_control (controller.py:53-90): P-only on km/h error;
    hard brake when commanded to stop."""
    e_kmh = (target_speed - current_speed) * 3.6
    u = jnp.clip(PID_KP * e_kmh, -1.0, 1.0)
    return jnp.where(target_speed == 0, -1.0, u)


def _lookahead_distance(v):
    """Speed-scaled lookahead (controller.py:105-117)."""
    dt = jnp.where(v > 10.0, 0.5 - (v - 10.0) * 0.01, 0.5)
    return jnp.maximum(dt * v, 3.0)


def pure_pursuit(ego_x, ego_y, ego_yaw, ego_v, trajectory_xy) -> jax.Array:
    """PurePuesuitController.run_step (controller.py:97-186): find the
    lookahead point on the trajectory, then the pure-pursuit steering
    law about the rear axle.

    The reference densifies the trajectory to 0.1 m and picks the first
    dense point past the lookahead arc length; here the lookahead point
    is interpolated *exactly* on the original polyline — same geometry
    without the 512-point resample (which dominated the TPU step cost:
    per-env gathers with a tiny lane dimension)."""
    ego = jnp.stack([ego_x, ego_y])

    d2 = jnp.sum((trajectory_xy - ego) ** 2, axis=1)
    start_idx = jnp.argmin(d2)
    seg = jnp.linalg.norm(jnp.diff(trajectory_xy, axis=0), axis=1)
    cum = jnp.concatenate([jnp.zeros((1,), seg.dtype), jnp.cumsum(seg)])
    target_s = cum[start_idx] + _lookahead_distance(ego_v)
    # interpolate the exact lookahead point (clamps to the path end)
    wp_x = jnp.interp(target_s, cum, trajectory_xy[:, 0])
    wp_y = jnp.interp(target_s, cum, trajectory_xy[:, 1])
    wp = jnp.stack([wp_x, wp_y])

    v_vec = jnp.stack([jnp.cos(ego_yaw), jnp.sin(ego_yaw)])
    w_vec = wp - ego
    w_norm = jnp.maximum(jnp.linalg.norm(w_vec), 1e-9)
    cos_a = jnp.clip(jnp.dot(w_vec, v_vec) / w_norm, -1.0, 1.0)
    alpha = jnp.arccos(cos_a)
    cross_z = v_vec[0] * w_vec[1] - v_vec[1] * w_vec[0]
    alpha = jnp.where(cross_z < 0, -alpha, alpha)

    rear = ego - v_vec * LR
    l = jnp.maximum(jnp.linalg.norm(wp - rear), 1e-6)
    return jnp.arctan(2.0 * jnp.sin(alpha) * LWB / l)


def get_control(ego_x, ego_y, ego_yaw, ego_v, trajectory_xy,
                desired_speed) -> ControlAction:
    """Controller.get_control (controller.py:17-24): PID on the
    trajectory's final desired speed + pure-pursuit steering."""
    acc = longitudinal_pid(desired_speed[-1], ego_v)
    steer = pure_pursuit(ego_x, ego_y, ego_yaw, ego_v, trajectory_xy)
    return ControlAction(acc=acc, steering=steer)
