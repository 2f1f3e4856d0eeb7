"""Batched Werling (Frenet-lattice) trajectory planner.

TPU-native re-design of the reference's ``JunctionTrajectoryPlanner``
(Data_From_Carla/Agent/zzz/JunctionTrajectoryPlanner.py): the lattice is
*static-shaped* — [n_d lateral offsets] x [n_T horizons] x [n_v target
speeds] boundary-condition grids solved in closed form
(:mod:`dcarl_tpu.ops.polynomial`), evaluated on a shared time grid, and
converted to global frame through the cubic-spline reference path in one
vectorized pass.  The reference's list filtering (``check_paths``) and
sorted early-exit collision scan (``get_optimal_trajectory``) become
boolean masks + a masked argmin, which batches over thousands of envs
under ``vmap`` and maps onto the VPU/MXU without dynamic shapes.

Candidate indexing matches the reference action space: index 0 is the
brake trajectory, index i>=1 is lattice path i-1 in enumeration order
(d-major, then horizon, then target speed) —
JunctionTrajectoryPlanner.py:113-130.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.config import WerlingConfig
from dcarl_tpu.ops import polynomial as poly
from dcarl_tpu.ops import spline as spl
from dcarl_tpu.ops.geometry import cartesian_to_frenet
from dcarl_tpu.planning.predictor import (PredictedObstacles,
                                          check_collision_free,
                                          predict_obstacles)


class FrenetStart(NamedTuple):
    """Planner start state (calculate_start_state,
    JunctionTrajectoryPlanner.py:253-283)."""

    s0: jax.Array
    c_d: jax.Array
    c_d_d: jax.Array
    c_d_dd: jax.Array
    c_speed: jax.Array


def start_state_from_ego(ego_x, ego_y, ego_vx, ego_vy, ego_yaw,
                         ref_line: jax.Array) -> FrenetStart:
    """Project the ego pose onto the dense reference polyline; the
    reference flips the lateral sign (c_d = -ffstate.d, :279-281)."""
    f = cartesian_to_frenet(ego_x, ego_y, ego_vx, ego_vy, ego_yaw, ref_line)
    v = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
    return FrenetStart(s0=f.s, c_d=-f.d, c_d_d=f.vd,
                       c_d_dd=jnp.zeros_like(f.s), c_speed=v)


class Lattice(NamedTuple):
    """All candidate trajectories of one planning tick (batch under
    vmap for [B] envs)."""

    d: jax.Array        # [P, T] lateral offset
    s: jax.Array        # [P, T] longitudinal position
    s_d: jax.Array      # [P, T] longitudinal speed (desired-speed output)
    x: jax.Array        # [P, T] global
    y: jax.Array        # [P, T]
    yaw: jax.Array      # [P, T]
    curvature: jax.Array  # [P, T-1]
    cf: jax.Array       # [P] total cost
    feasible: jax.Array  # [P] speed/accel/curvature limits OK


def plan(rp: spl.RefPath, start: FrenetStart,
         cfg: WerlingConfig = WerlingConfig()) -> Lattice:
    """Generate the full candidate lattice (calc_frenet_paths +
    calc_global_paths + check_paths in one fused program)."""
    horizons = cfg.horizons
    if len(horizons) != 1:
        raise NotImplementedError(
            "multiple horizons need per-path time masks; the reference "
            "grid (4.0..4.2 step 0.3) has exactly one")
    Ti = horizons[0]
    n_t = cfg.n_time_steps
    dtype = jnp.result_type(start.s0)
    d_offsets = jnp.asarray(cfg.d_offsets, dtype)
    tvs = jnp.asarray(cfg.target_speeds, dtype)
    n_d, n_v = d_offsets.shape[0], tvs.shape[0]
    t = jnp.arange(n_t, dtype=dtype) * cfg.dt

    # Lateral quintics: one per d offset.
    lat = poly.solve_quintic(start.c_d, start.c_d_d, start.c_d_dd,
                             d_offsets, 0.0, 0.0, Ti)
    lat_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (n_d,))[:, None], lat)
    d = poly.quintic_eval(lat_b, t[None, :])        # [n_d, T]
    d_ddd = poly.quintic_d3(lat_b, t[None, :])

    # Longitudinal quartics: one per target speed.
    lon = poly.solve_quartic(start.s0, start.c_speed, 0.0, tvs, 0.0, Ti)
    lon_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (n_v,))[:, None], lon)
    s = poly.quartic_eval(lon_b, t[None, :])        # [n_v, T]
    s_d = poly.quartic_d1(lon_b, t[None, :])
    s_dd = poly.quartic_d2(lon_b, t[None, :])
    s_ddd = poly.quartic_d3(lon_b, t[None, :])

    # Costs (JunctionTrajectoryPlanner.py:322-331).
    Jp = jnp.sum(d_ddd ** 2, axis=1)                # [n_d]
    Js = jnp.sum(s_ddd ** 2, axis=1)                # [n_v]
    ds_cost = (cfg.target_speed - s_d[:, -1]) ** 2  # [n_v]
    cd = cfg.kj * Jp + cfg.kt * Ti + cfg.kd * d[:, -1] ** 2
    cv = cfg.kj * Js + cfg.kt * Ti + cfg.kd * ds_cost
    cf = (cfg.klat * cd[:, None] + cfg.klon * cv[None, :]).reshape(-1)

    # Full [P, T] grids (d-major, then speed: reference enumeration).
    d_full = jnp.broadcast_to(d[:, None, :], (n_d, n_v, n_t)).reshape(-1, n_t)
    s_full = jnp.broadcast_to(s[None, :, :], (n_d, n_v, n_t)).reshape(-1, n_t)
    s_d_full = jnp.broadcast_to(s_d[None], (n_d, n_v, n_t)).reshape(-1, n_t)
    s_dd_full = jnp.broadcast_to(s_dd[None], (n_d, n_v, n_t)).reshape(-1, n_t)

    # Global conversion (calc_global_paths :342-365); fused evaluation
    # shares one segment search across x/y/tangent.
    ix, iy, idx, idy = spl.refpath_pos_tangent(rp, s_full)
    iyaw = jnp.arctan2(idy, idx)
    x = ix + d_full * jnp.cos(iyaw + jnp.pi / 2.0)
    y = iy + d_full * jnp.sin(iyaw + jnp.pi / 2.0)

    dx = jnp.diff(x, axis=1)
    dy = jnp.diff(y, axis=1)
    yaw_seg = jnp.arctan2(dy, dx)                   # [P, T-1]
    yaw = jnp.concatenate([yaw_seg, yaw_seg[:, -1:]], axis=1)
    ds_seg = jnp.sqrt(dx ** 2 + dy ** 2)
    ds_seg = jnp.where(ds_seg < 1e-5, 0.1, ds_seg)  # carla-bug guard (:369)
    curv = jnp.diff(yaw, axis=1) / ds_seg           # [P, T-1]

    feasible = (
        ~jnp.any(s_d_full > cfg.max_speed, axis=1)
        & ~jnp.any(jnp.abs(s_dd_full) > cfg.max_accel, axis=1)
        & ~jnp.any(jnp.abs(curv) > cfg.max_curvature, axis=1)
    )

    return Lattice(d=d_full, s=s_full, s_d=s_d_full, x=x, y=y, yaw=yaw,
                   curvature=curv, cf=cf, feasible=feasible)


def rule_trajectory_index(
    lattice: Lattice,
    pred: PredictedObstacles,
    cfg: WerlingConfig = WerlingConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """The rule policy's pick (get_optimal_trajectory :123-130): the
    minimum-cost feasible, collision-free candidate, as index+1; 0
    (brake) when none qualifies.  Returns (index, collision_free[P])."""
    free = check_collision_free(lattice.x, lattice.y, pred, cfg)
    ok = lattice.feasible & free
    masked_cost = jnp.where(ok, lattice.cf, jnp.inf)
    best = jnp.argmin(masked_cost).astype(jnp.int32)
    index = jnp.where(jnp.any(ok), best + 1, 0)
    return index, free


class Trajectory(NamedTuple):
    """The executable trajectory (TrajectoryAction equivalent)."""

    xy: jax.Array             # [T, 2]
    desired_speed: jax.Array  # [T]


def trajectory_by_index(lattice: Lattice, index: jax.Array) -> Trajectory:
    """Candidate lookup (get_trajectory_by_index :132-141): index 0 is
    the brake trajectory — the minimum-cost path with desired speed
    zeroed (the stateless branch of get_backup_trajectory :143-152);
    index i>=1 is lattice path i-1."""
    brake_path = jnp.argmin(lattice.cf).astype(jnp.int32)
    p = jnp.where(index == 0, brake_path, index - 1)
    xy = jnp.stack([lattice.x[p], lattice.y[p]], axis=1)
    speed = jnp.where(index == 0, jnp.zeros_like(lattice.s_d[p]),
                      lattice.s_d[p])
    return Trajectory(xy=xy, desired_speed=speed)


class PlanOutput(NamedTuple):
    lattice: Lattice
    rule_index: jax.Array
    collision_free: jax.Array


def plan_with_rule(
    rp: spl.RefPath,
    ref_line: jax.Array,
    ego: jax.Array,                 # [5] x, y, vx, vy, yaw
    obstacles: jax.Array,           # [K, 5]
    obstacles_valid: jax.Array,     # [K]
    cfg: WerlingConfig = WerlingConfig(),
) -> PlanOutput:
    """Full planning tick: start state -> lattice -> rule selection
    (the trajectory_update pipeline :90-101, sans cross-tick state)."""
    start = start_state_from_ego(ego[0], ego[1], ego[2], ego[3], ego[4],
                                 ref_line)
    lattice = plan(rp, start, cfg)
    pred = predict_obstacles(obstacles, obstacles_valid, cfg)
    index, free = rule_trajectory_index(lattice, pred, cfg)
    return PlanOutput(lattice=lattice, rule_index=index, collision_free=free)
