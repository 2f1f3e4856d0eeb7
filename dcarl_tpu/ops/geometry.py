"""Batched polyline geometry kernels.

TPU-native re-design of the reference's geometry layer, which exists
twice there: pure-Python (Data_From_Carla/Agent/zzz/tools.py:48-302) and
compiled Cython (software/src/library/src/zzz_common/geometry.pyx).  The
branch-heavy "8-case" signed point-to-polyline distance becomes a
vectorized select so that B points x N segments evaluate as one fused
XLA program and batch under ``vmap``/``shard_map``.

All functions take ``line`` as an [N, 2] array and are differentiable.
Host-side (numpy, dynamic-shape) variants used during static scenario
construction carry the ``_np`` suffix.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def wrap_angle(theta):
    """Normalize angle to [-pi, pi) (tools.py:48-57 / geometry.pyx:12-21)."""
    return (theta + jnp.pi) % (2.0 * jnp.pi) - jnp.pi


def polyline_length(line: jax.Array) -> jax.Array:
    """Total arc length (tools.py:59-69)."""
    return jnp.sum(jnp.linalg.norm(jnp.diff(line, axis=0), axis=1))


def arclengths(line: jax.Array) -> jax.Array:
    """[N] cumulative arc length with 0 at the first vertex."""
    seg = jnp.linalg.norm(jnp.diff(line, axis=0), axis=1)
    return jnp.concatenate([jnp.zeros((1,), line.dtype), jnp.cumsum(seg)])


def resample_polyline(line: jax.Array, num: int) -> jax.Array:
    """Arc-length uniform resampling to a *static* number of points —
    the in-jit counterpart of ``dense_polyline2d`` (tools.py:72-96),
    whose output length is data-dependent in the reference."""
    s = arclengths(line)
    s_space = jnp.linspace(0.0, s[-1], num)
    x = jnp.interp(s_space, s, line[:, 0])
    y = jnp.interp(s_space, s, line[:, 1])
    return jnp.stack([x, y], axis=1)


def dense_polyline2d_np(line: np.ndarray, resolution: float) -> np.ndarray:
    """Host-side dense resampling with the reference's exact sizing rule
    ``num = round(total/resolution)`` (tools.py:72-96).  Used once when
    building static scenario reference paths."""
    line = np.asarray(line, dtype=np.float64)
    if line is None or len(line) == 0:
        raise ValueError("Line input is null")
    s = np.concatenate([[0], np.cumsum(np.linalg.norm(np.diff(line, axis=0), axis=1))])
    num = int(round(s[-1] / resolution))
    s_space = np.linspace(0, s[-1], num=num)
    x = np.interp(s_space, s, line[:, 0])
    y = np.interp(s_space, s, line[:, 1])
    return np.stack([x, y], axis=1)


def dist_point_to_segments(p: jax.Array, a: jax.Array, b: jax.Array):
    """Vectorized (dl, d1, d2) for point ``p`` against segments a->b
    (tools.py:124-138): ``dl`` signed perpendicular distance, ``d1``
    projection arc from the head, ``d2`` projection arc to the tail."""
    x0, y0 = p[0], p[1]
    x1, y1 = a[..., 0], a[..., 1]
    x2, y2 = b[..., 0], b[..., 1]
    l = jnp.sqrt((y2 - y1) ** 2 + (x2 - x1) ** 2)
    safe_l = jnp.where(l == 0, 1.0, l)
    dl = ((y2 - y1) * x0 - (x2 - x1) * y0 + x2 * y1 - x1 * y2) / safe_l
    d1 = (x1 * x1 + x0 * (x2 - x1) - x1 * x2 + y1 * y1 + y0 * (y2 - y1) - y1 * y2) / safe_l
    d2 = (x2 * x2 - x0 * (x2 - x1) - x1 * x2 + y2 * y2 - y0 * (y2 - y1) - y1 * y2) / safe_l
    # degenerate segment: distance to the (equal) endpoints
    dl0 = jnp.sqrt((y0 - y1) ** 2 + (x0 - x1) ** 2)
    dl = jnp.where(l == 0, dl0, dl)
    d1 = jnp.where(l == 0, 0.0, d1)
    d2 = jnp.where(l == 0, 0.0, d2)
    return dl, d1, d2


class PolylineProjection(NamedTuple):
    """Result of the signed point-to-polyline projection."""

    distance: jax.Array      # signed lateral distance
    closest_idx: jax.Array   # index of the nearest vertex
    closest_type: jax.Array  # 0: vertex, 1: next segment, -1: previous segment
    dist_start: jax.Array    # arc length from line start to the foot point
    dist_end: jax.Array      # arc length from the foot point to line end


def project_point_to_polyline(p: jax.Array, line: jax.Array) -> PolylineProjection:
    """Signed distance + arc-length projection of one point onto a
    polyline — the vectorized 8-case logic of
    ``dist_from_point_to_polyline2d`` (tools.py:141-222,
    geometry.pyx:53-151) as nested ``where`` selects.

    Batch over points with ``jax.vmap(project_point_to_polyline,
    in_axes=(0, None))``.
    """
    n = line.shape[0]
    dist_line = jnp.linalg.norm(line - p, axis=1)
    ci = jnp.argmin(dist_line).astype(jnp.int32)

    seg_prev = jnp.clip(ci - 1, 0, n - 2)  # segment [ci-1, ci]
    seg_next = jnp.clip(ci, 0, n - 2)      # segment [ci, ci+1]

    dl_p, d1_p, d2_p = dist_point_to_segments(p, line[seg_prev], line[seg_prev + 1])
    dl_n, d1_n, d2_n = dist_point_to_segments(p, line[seg_next], line[seg_next + 1])

    at_start = ci == 0
    at_end = ci == n - 1

    # --- interior vertex-sign case (case 5): sign from the turn direction
    ci_m1 = jnp.clip(ci - 1, 0, n - 1)
    ci_p1 = jnp.clip(ci + 1, 0, n - 1)
    turn_dl, _, _ = dist_point_to_segments(line[ci_p1], line[ci_m1][None],
                                           line[ci][None])
    vertex_sign_interior = jnp.where(turn_dl[0] > 0, -1.0, 1.0)

    d_vertex = dist_line[ci]
    # start / end vertex cases keep the sign of the adjacent segment's dl
    dist_c0_start = jnp.where(dl_n < 0, -d_vertex, d_vertex)  # case 1
    dist_c0_end = jnp.where(dl_p < 0, -d_vertex, d_vertex)    # case 3
    dist_c0_mid = vertex_sign_interior * d_vertex              # case 5

    # Select per position category.
    # closest_type: 1 next segment, -1 previous segment, 0 vertex.
    def interior():
        both_out = (d2_p < 0) & (d1_n < 0)
        prev_out = d2_p < 0
        next_out = d1_n < 0
        pick_prev = jnp.abs(dl_n) > jnp.abs(dl_p)  # case 8 tie-break
        dist = jnp.where(
            both_out, dist_c0_mid,
            jnp.where(prev_out, dl_n,
                      jnp.where(next_out, dl_p,
                                jnp.where(pick_prev, dl_p, dl_n))))
        ctype = jnp.where(
            both_out, 0,
            jnp.where(prev_out, 1,
                      jnp.where(next_out, -1,
                                jnp.where(pick_prev, -1, 1))))
        return dist, ctype

    dist_i, type_i = interior()
    dist_s = jnp.where(d1_n < 0, dist_c0_start, dl_n)
    type_s = jnp.where(d1_n < 0, 0, 1)
    dist_e = jnp.where(d2_p < 0, dist_c0_end, dl_p)
    type_e = jnp.where(d2_p < 0, 0, -1)

    distance = jnp.where(at_start, dist_s, jnp.where(at_end, dist_e, dist_i))
    ctype = jnp.where(at_start, type_s,
                      jnp.where(at_end, type_e, type_i)).astype(jnp.int32)

    # --- arc-length bookkeeping (tools.py:205-220)
    cum = arclengths(line)
    total = cum[-1]
    ds_next = d1_n + cum[seg_next]
    de_next = d2_n + (total - cum[seg_next + 1])
    ds_prev = d1_p + cum[seg_prev]
    de_prev = d2_p + (total - cum[seg_prev + 1])
    ds_vert = cum[ci]
    de_vert = total - cum[ci]

    dist_start = jnp.where(ctype == 1, ds_next,
                           jnp.where(ctype == -1, ds_prev, ds_vert))
    dist_end = jnp.where(ctype == 1, de_next,
                         jnp.where(ctype == -1, de_prev, de_vert))
    return PolylineProjection(distance, ci, ctype, dist_start, dist_end)


project_points_to_polyline = jax.vmap(project_point_to_polyline,
                                      in_axes=(0, None))


class FrenetState(NamedTuple):
    s: jax.Array    # arc length along the line
    d: jax.Array    # signed lateral offset
    psi: jax.Array  # heading error relative to the line tangent
    vs: jax.Array   # longitudinal velocity
    vd: jax.Array   # lateral velocity


def cartesian_to_frenet(
    x, y, vx, vy, yaw, line: jax.Array, tangents: jax.Array | None = None
) -> FrenetState:
    """Cartesian -> Frenet conversion (tools.py:224-257,
    kinematics.pyx:115-178): project onto the line, take the tangent of
    the hosting segment, rotate velocity into the (s, d) frame."""
    p = jnp.stack([jnp.asarray(x, line.dtype), jnp.asarray(y, line.dtype)])
    proj = project_point_to_polyline(p, line)
    n = line.shape[0]
    ci = proj.closest_idx

    nxt = jnp.clip(ci + 1, 0, n - 1)
    prv = jnp.clip(ci - 1, 0, n - 1)
    psi_next = jnp.arctan2(line[nxt, 1] - line[ci, 1], line[nxt, 0] - line[ci, 0])
    psi_prev = jnp.arctan2(line[ci, 1] - line[prv, 1], line[ci, 0] - line[prv, 0])
    if tangents is None:
        psi_vert = psi_next
    else:
        psi_vert = tangents[ci]
    psi_line = jnp.where(proj.closest_type == 1, psi_next,
                         jnp.where(proj.closest_type == -1, psi_prev, psi_vert))

    c, s = jnp.cos(psi_line), jnp.sin(psi_line)
    vs = vx * c + vy * s
    vd = -vx * s + vy * c
    return FrenetState(s=proj.dist_start, d=proj.distance,
                       psi=wrap_angle(yaw - psi_line), vs=vs, vd=vd)


def transfer_to_ego_frame(x, y, vx, vy, yaw, ego_x, ego_y, ego_yaw):
    """Rigid transform of (position, velocity, yaw) into the ego frame
    (Planning_library/coordinates.py:5-33), vectorized over leading
    dims."""
    c, s = jnp.cos(-ego_yaw), jnp.sin(-ego_yaw)
    dx, dy = x - ego_x, y - ego_y
    x_t = c * dx - s * dy
    y_t = s * dx + c * dy
    vx_t = c * vx - s * vy
    vy_t = s * vx + c * vy
    return x_t, y_t, vx_t, vy_t, yaw - ego_yaw


def box_to_corners_2d(cx, cy, yaw, length, width):
    """Oriented-box corner extraction (geometry.pyx:204-226), batched.
    Returns [..., 4, 2] corners in CCW order starting front-left."""
    hl, hw = length / 2.0, width / 2.0
    local = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], dtype=jnp.float32)
    local = local * jnp.stack([jnp.broadcast_to(hl, jnp.shape(hl)),
                               jnp.broadcast_to(hw, jnp.shape(hw))], axis=-1)[..., None, :]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    rx = local[..., 0] * c[..., None] - local[..., 1] * s[..., None] + cx[..., None]
    ry = local[..., 0] * s[..., None] + local[..., 1] * c[..., None] + cy[..., None]
    return jnp.stack([rx, ry], axis=-1)


def curvature(x: jax.Array, y: jax.Array) -> jax.Array:
    """Discrete curvature along a path from heading differences
    (JunctionTrajectoryPlanner.py:366-377 semantics: dyaw/ds with the
    last value repeated)."""
    dx = jnp.diff(x)
    dy = jnp.diff(y)
    yaw = jnp.arctan2(dy, dx)
    ds = jnp.sqrt(dx ** 2 + dy ** 2)
    ds = jnp.where(ds < 1e-5, 0.1, ds)
    dyaw = jnp.diff(yaw)
    c = dyaw / ds[:-1]
    return jnp.concatenate([c, c[-1:], c[-1:]])


# ---------------------------------------------------------------------------
# Host-side oracle (numpy, direct transliteration of the published
# algorithm's description) for testing the vectorized version.
# ---------------------------------------------------------------------------


def project_point_to_polyline_np(x0: float, y0: float, line: np.ndarray
                                 ) -> Tuple[float, int, int, float, float]:
    """Reference-semantics host implementation (scalar, branchy) of the
    signed polyline distance; used as the test oracle and by host-side
    scenario tooling."""
    line = np.asarray(line, dtype=np.float64)

    def seg(x1, y1, x2, y2):
        l = math.hypot(x2 - x1, y2 - y1)
        if l == 0:
            return math.hypot(x0 - x1, y0 - y1), 0.0, 0.0
        dl = ((y2 - y1) * x0 - (x2 - x1) * y0 + x2 * y1 - x1 * y2) / l
        d1 = (x1 * x1 + x0 * (x2 - x1) - x1 * x2 + y1 * y1 + y0 * (y2 - y1) - y1 * y2) / l
        d2 = (x2 * x2 - x0 * (x2 - x1) - x1 * x2 + y2 * y2 - y0 * (y2 - y1) - y1 * y2) / l
        return dl, d1, d2

    dist_line = np.linalg.norm(line - [x0, y0], axis=1)
    ci = int(np.argmin(dist_line))
    n = len(line)
    ctype = 0
    dl_p = d1_p = d2_p = dl_n = d1_n = d2_n = 0.0
    if ci == 0:
        dl_n, d1_n, d2_n = seg(*line[0], *line[1])
        if d1_n < 0:
            dist = dist_line[ci] if dl_n >= 0 else -dist_line[ci]
        else:
            dist, ctype = dl_n, 1
    elif ci == n - 1:
        dl_p, d1_p, d2_p = seg(*line[n - 2], *line[n - 1])
        if d2_p < 0:
            dist = dist_line[ci] if dl_p >= 0 else -dist_line[ci]
        else:
            dist, ctype = dl_p, -1
    else:
        dl_p, d1_p, d2_p = seg(*line[ci - 1], *line[ci])
        dl_n, d1_n, d2_n = seg(*line[ci], *line[ci + 1])
        if d2_p < 0 and d1_n < 0:
            dist = dist_line[ci]
            # sign from turn direction of the corner
            x2, y2 = line[ci + 1]
            xa, ya = line[ci - 1]
            xb, yb = line[ci]
            l = math.hypot(xb - xa, yb - ya)
            dl_corner = ((yb - ya) * x2 - (xb - xa) * y2 + xb * ya - xa * yb) / l if l else 0.0
            if dl_corner > 0:
                dist = -dist
        elif d2_p < 0:
            dist, ctype = dl_n, 1
        elif d1_n < 0:
            dist, ctype = dl_p, -1
        else:
            if abs(dl_n) > abs(dl_p):
                dist, ctype = dl_p, -1
            else:
                dist, ctype = dl_n, 1

    seg_len = np.linalg.norm(np.diff(line, axis=0), axis=1)
    cum = np.concatenate([[0], np.cumsum(seg_len)])
    total = cum[-1]
    if ctype == 1:
        dist_start = d1_n + cum[ci]
        dist_end = d2_n + total - cum[ci + 1]
    elif ctype == -1:
        dist_start = d1_p + cum[ci - 1]
        dist_end = d2_p + total - cum[ci]
    else:
        dist_start = cum[ci]
        dist_end = total - cum[ci]
    return float(dist), ci, ctype, float(dist_start), float(dist_end)
