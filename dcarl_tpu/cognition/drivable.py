"""Dynamic drivable-area boundary.

TPU-native re-design of DrivingSpaceConstructor's
``calculate_drivable_area`` (driving_space_constructor.py:827-1100):
the reference shatters the static drivable-area polygon and obstacle
contours to 0.2 m, converts to (angle, distance) around the ego, and
keeps — per angular direction — the nearest point, yielding a
star-shaped ``DynamicBoundary`` whose points carry the velocity of the
blocking object.  Here the angular sweep is a fixed-bin segment-min
(static shapes, one ``scatter-min``), batched over envs with ``vmap``.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class DynamicBoundary(NamedTuple):
    """Per-angular-bin boundary sample (DynamicBoundaryPoint msg:
    x, y + the blocking edge's velocity)."""

    x: jax.Array      # [B_bins]
    y: jax.Array
    vx: jax.Array
    vy: jax.Array
    dist: jax.Array   # distance from ego (inf where the bin is open)


def _corners(cx, cy, yaw, length, width):
    """[4, 2] rectangle corners (box_to_corners_2d, geometry.pyx:204)."""
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    dx = jnp.asarray([1, 1, -1, -1]) * (length / 2.0)
    dy = jnp.asarray([1, -1, 1, -1]) * (width / 2.0)
    return jnp.stack([cx + c * dx - s * dy, cy + s * dx + c * dy], axis=1)


def dynamic_boundary(
    ego_x, ego_y,
    static_polygon: jax.Array,   # [P, 2] drivable-area polygon (dense)
    obs_x, obs_y, obs_vx, obs_vy, obs_yaw,  # [K] obstacle states
    obs_valid,                   # [K]
    obs_length: float = 4.5,
    obs_width: float = 1.8,
    num_bins: int = 256,
    contour_samples: int = 16,
) -> DynamicBoundary:
    """Angular-sweep boundary: static polygon points (velocity 0) and
    obstacle contour samples (object velocity) compete per angular bin;
    the nearest wins (driving_space_constructor.py:843-1100)."""
    two_pi = 2.0 * jnp.pi

    def to_bins(px, py, pvx, pvy, valid):
        ang = jnp.arctan2(py - ego_y, px - ego_x)
        dist = jnp.sqrt((px - ego_x) ** 2 + (py - ego_y) ** 2)
        bins = jnp.floor((ang + jnp.pi) / two_pi * num_bins).astype(jnp.int32)
        bins = jnp.clip(bins, 0, num_bins - 1)
        dist = jnp.where(valid, dist, jnp.inf)
        return bins, dist, px, py, pvx, pvy

    # static polygon contributes with zero velocity
    sp_valid = jnp.ones((static_polygon.shape[0],), bool)
    sb, sd, sx, sy, svx, svy = to_bins(
        static_polygon[:, 0], static_polygon[:, 1],
        jnp.zeros(static_polygon.shape[0]), jnp.zeros(static_polygon.shape[0]),
        sp_valid)

    # obstacle contours: sample each box edge loop
    t = jnp.linspace(0.0, 4.0, contour_samples, endpoint=False)

    def contour(cx, cy, yaw):
        corners = _corners(cx, cy, yaw, obs_length, obs_width)  # [4, 2]
        seg = jnp.floor(t).astype(jnp.int32) % 4
        frac = t - jnp.floor(t)
        a = corners[seg]
        b = corners[(seg + 1) % 4]
        return a + frac[:, None] * (b - a)                       # [S, 2]

    pts = jax.vmap(contour)(obs_x, obs_y, obs_yaw)               # [K, S, 2]
    K, S = pts.shape[0], pts.shape[1]
    ovx = jnp.repeat(obs_vx, S)
    ovy = jnp.repeat(obs_vy, S)
    ovalid = jnp.repeat(obs_valid, S)
    ob, od, ox, oy, ovx, ovy = to_bins(
        pts[..., 0].reshape(-1), pts[..., 1].reshape(-1), ovx, ovy, ovalid)

    bins = jnp.concatenate([sb, ob])
    dist = jnp.concatenate([sd, od])
    px = jnp.concatenate([sx, ox])
    py = jnp.concatenate([sy, oy])
    pvx = jnp.concatenate([svx, ovx])
    pvy = jnp.concatenate([svy, ovy])

    # segment-min per bin, then gather the argmin point
    bin_min = jnp.full((num_bins,), jnp.inf).at[bins].min(dist)
    is_min = (dist == bin_min[bins]) & jnp.isfinite(dist)
    # first winner per bin via scatter of indices
    order = jnp.arange(dist.shape[0])
    winner = jnp.full((num_bins,), dist.shape[0],
                      jnp.int32).at[bins].min(
        jnp.where(is_min, order, dist.shape[0]).astype(jnp.int32))
    has = winner < dist.shape[0]
    w = jnp.clip(winner, 0, dist.shape[0] - 1)

    return DynamicBoundary(
        x=jnp.where(has, px[w], ego_x),
        y=jnp.where(has, py[w], ego_y),
        vx=jnp.where(has, pvx[w], 0.0),
        vy=jnp.where(has, pvy[w], 0.0),
        dist=jnp.where(has, bin_min, jnp.inf),
    )
