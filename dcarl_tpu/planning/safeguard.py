"""Reachable-set safeguard.

Re-design of the field stack's safety layer
(software/src/planning/safeguard/src/zzz_planning_safeguard/
reachable_set.py:28-227): every obstacle's constant-velocity reachable
set (a disc growing linearly in time) is intersected with the decision
trajectory; the safeguard caps the commanded speed so the ego cannot
reach any intersection point before the obstacle can
(``get_safeguard_speed``).  The node in the reference currently passes
trajectories through unchanged (checks commented out at
safeguard/nodes/reachable_set:17-69) — here the check is active and
vectorized over [B] envs x [K] obstacles x [T] trajectory points.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SafeguardConfig(NamedTuple):
    ego_radius: float = 1.5       # ego footprint radius
    obstacle_radius: float = 1.0  # obstacle footprint radius
    time_margin: float = 0.5      # s: ego must arrive this much earlier
    max_horizon: float = 5.0      # s: reachable-set horizon


def check_trajectory(
    traj_xy: jax.Array,       # [..., T, 2]
    desired_speed: jax.Array,  # [..., T]
    obstacles: jax.Array,     # [K, 5] x, y, vx, vy, yaw
    obstacles_valid: jax.Array,  # [K]
    cfg: SafeguardConfig = SafeguardConfig(),
) -> jax.Array:
    """[...] bool: True when the trajectory stays outside every
    obstacle's reachable set for the arrival-time schedule implied by
    ``desired_speed`` (ReachableSet.check_trajectory semantics)."""
    seg = jnp.linalg.norm(jnp.diff(traj_xy, axis=-2), axis=-1)  # [..., T-1]
    v_seg = jnp.maximum(desired_speed[..., :-1], 0.1)
    arrival = jnp.concatenate([
        jnp.zeros_like(seg[..., :1]),
        jnp.cumsum(seg / v_seg, axis=-1),
    ], axis=-1)                                                  # [..., T]

    ox = obstacles[:, 0]
    oy = obstacles[:, 1]
    ospeed = jnp.sqrt(obstacles[:, 2] ** 2 + obstacles[:, 3] ** 2)

    # distance from each trajectory point to each obstacle [..., T, K]
    dx = traj_xy[..., :, None, 0] - ox
    dy = traj_xy[..., :, None, 1] - oy
    dist = jnp.sqrt(dx ** 2 + dy ** 2)

    # obstacle reach time to that point (disc growth)
    reach_time = (dist - cfg.ego_radius - cfg.obstacle_radius) \
        / jnp.maximum(ospeed, 0.1)
    relevant = (arrival[..., :, None] <= cfg.max_horizon) \
        & obstacles_valid[None, :]
    conflict = relevant & (
        reach_time <= arrival[..., :, None] + cfg.time_margin)
    return ~jnp.any(conflict, axis=(-2, -1))


def get_safeguard_speed(
    traj_xy: jax.Array,
    desired_speed: jax.Array,
    obstacles: jax.Array,
    obstacles_valid: jax.Array,
    cfg: SafeguardConfig = SafeguardConfig(),
    num_candidates: int = 8,
) -> jax.Array:
    """The speed cap (ReachableSet.get_safeguard_speed): the largest
    uniform speed scale in (0, 1] whose arrival schedule clears every
    reachable set; 0 when even crawling conflicts.  Evaluates a static
    ladder of scales in one batch (compiler-friendly replacement for
    the reference's iterative shrink loop)."""
    scales = jnp.linspace(1.0, 1.0 / num_candidates, num_candidates)

    def ok(scale):
        return check_trajectory(traj_xy, desired_speed * scale,
                                obstacles, obstacles_valid, cfg)

    safe = jax.vmap(ok)(scales)          # [C, ...]
    # pick the largest safe scale; if none, 0
    any_safe = jnp.any(safe, axis=0)
    first = jnp.argmax(safe, axis=0)     # scales are descending
    scale = jnp.where(any_safe, scales[first], 0.0)
    return desired_speed * scale[..., None]
