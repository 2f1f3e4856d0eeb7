"""Lane-major (batch-last) fused rule driver — the throughput path.

Semantically identical to :func:`dcarl_tpu.planning.rollout.make_rule_driver`
(env physics -> Werling lattice -> collision gating -> pure-pursuit
control, reference call stack SURVEY.md §3.2), but laid out for the TPU
vector unit: every array carries the env batch ``B`` as its LAST axis so
the 8x128 VPU lanes ride the batch, not the tiny lattice dims.

Why this exists: the readable path (``rollout.py``) maps one env through
``vmap``, which puts ``B`` first and leaves trailing dims of 10 paths x
13 time steps — ~4% lane utilization on a (8, 128) tile.  Measured on a
v5e chip, the identical program in batch-last layout is ~5x faster.

Layout rules used throughout:

* per-env scalars        -> ``[B]``
* per-(path, time) data  -> ``[P, T, B]`` (P, T are sublane/unrolled)
* table lookups (spline segments, path-by-index) -> one-hot masked
  accumulation or a ``[K, N] @ [N, B]`` matmul on the MXU — never a
  lane-indexed gather, which XLA lowers to per-lane dynamic-slice loops
  (measured ~100x slower than the one-hot contraction at these sizes).

The module reproduces the exact select/tie-break semantics of the
readable path (first-min ``argmin``, the 8-case polyline projection of
``ops/geometry.py``, stride-2 collision indices of
``planning/predictor.py``), so with ``EnvConfig.reset_jitter = 0`` the
two drivers produce bit-identical trajectories — asserted by
``tests/test_fast_rollout.py``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcarl_tpu.config import EnvConfig, WerlingConfig
from dcarl_tpu.env import driving_env as de
from dcarl_tpu.env.scenario import Scenario
from dcarl_tpu.ops import polynomial as poly

PID_KP = 0.25 / 3.6
LF, LR = 1.2, 1.95
LWB = LF + LR


# ---------------------------------------------------------------------------
# Static reference-path tables (host-side, built once per driver)
# ---------------------------------------------------------------------------


class RefTables(NamedTuple):
    """Precomputed per-vertex / per-segment constants of the reference
    polyline + its arc-length cubic spline, shaped for lane-major use."""

    line: np.ndarray        # [N, 2] polyline vertices
    cum: np.ndarray         # [N] cumulative arc length (polyline chords)
    gather: np.ndarray      # [G, N] vertex-indexed rows for the MXU gather
    knots: np.ndarray       # [M] spline knots (chordal s)
    seg: np.ndarray         # [M-1, 8] per-segment (ax,bx,cx,dx, ay,by,cy,dy)


_G_ROWS = 19  # rows in the projection gather matrix (see _build_tables)


def build_ref_tables(ref_line: np.ndarray, dtype=jnp.float32) -> RefTables:
    """One-stop host-side table build: reference-path spline fit +
    projection gather rows.  Pinned to the local CPU backend — this is
    build-time precomputation of a few hundred scalars, and dispatching
    its many small ops to a (possibly remote) TPU costs minutes of
    round-trips for zero benefit."""
    from dcarl_tpu.ops import spline as spl

    ref_line = np.asarray(ref_line, np.float64)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        rp = spl.refpath_from_xy(jnp.asarray(ref_line[:, 0], dtype),
                                 jnp.asarray(ref_line[:, 1], dtype))
        rp_host = {
            "s": np.asarray(rp.s, np.float64),
            "ax": np.asarray(rp.sx.a, np.float64),
            "bx": np.asarray(rp.sx.b, np.float64),
            "cx": np.asarray(rp.sx.c, np.float64),
            "dx": np.asarray(rp.sx.d, np.float64),
            "ay": np.asarray(rp.sy.a, np.float64),
            "by": np.asarray(rp.sy.b, np.float64),
            "cy": np.asarray(rp.sy.c, np.float64),
            "dy": np.asarray(rp.sy.d, np.float64),
        }
    return _build_tables(ref_line, rp_host)


def _build_tables(ref_line: np.ndarray, rp_host) -> RefTables:
    """``rp_host``: host copies (np.ndarray) of RefPath spline coeffs."""
    line = np.asarray(ref_line, np.float64)
    n = line.shape[0]
    cum = np.concatenate(
        [[0.0], np.cumsum(np.linalg.norm(np.diff(line, axis=0), axis=1))])

    idx = np.arange(n)
    sp = np.clip(idx - 1, 0, n - 2)   # previous segment start
    sn = np.clip(idx, 0, n - 2)       # next segment start
    cim1 = np.clip(idx - 1, 0, n - 1)
    cip1 = np.clip(idx + 1, 0, n - 1)

    x, y = line[:, 0], line[:, 1]
    gather = np.stack([
        x, y,                          # 0,1: line[ci]
        x[cim1], y[cim1],              # 2,3: line[ci-1]
        x[cip1], y[cip1],              # 4,5: line[ci+1]
        x[sp], y[sp],                  # 6,7: line[seg_prev]
        x[sp + 1], y[sp + 1],          # 8,9: line[seg_prev+1]
        x[sn], y[sn],                  # 10,11: line[seg_next]
        x[sn + 1], y[sn + 1],          # 12,13: line[seg_next+1]
        cum[sp], cum[sp + 1],          # 14,15
        cum[sn], cum[sn + 1],          # 16,17
        cum,                           # 18: cum[ci]
    ])
    assert gather.shape[0] == _G_ROWS

    knots = np.asarray(rp_host["s"], np.float64)
    m = knots.shape[0]
    seg = np.stack([
        rp_host["ax"][: m - 1], rp_host["bx"][: m - 1],
        rp_host["cx"][: m - 1], rp_host["dx"][: m - 1],
        rp_host["ay"][: m - 1], rp_host["by"][: m - 1],
        rp_host["cy"][: m - 1], rp_host["dy"][: m - 1],
    ], axis=1)
    return RefTables(line=line, cum=cum, gather=gather, knots=knots, seg=seg)


# ---------------------------------------------------------------------------
# Lane-major kernels
# ---------------------------------------------------------------------------


def _onehot(idx: jax.Array, n: int) -> jax.Array:
    """[n, B] float one-hot of an int [B] index vector."""
    rng = jnp.arange(n, dtype=idx.dtype)
    return (rng[:, None] == idx[None, :]).astype(jnp.float32)


def _project_ego(px: jax.Array, py: jax.Array, vx: jax.Array, vy: jax.Array,
                 tab: RefTables, dtype) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Signed projection of [B] ego points onto the reference polyline.

    Lane-major port of ``ops.geometry.project_point_to_polyline`` +
    the velocity rotation of ``cartesian_to_frenet`` — identical 8-case
    select logic, with the per-vertex gathers done as ONE ``[G, N] @
    [N, B]`` matmul.  Returns (s0, d_signed, vd).
    """
    line = jnp.asarray(tab.line, dtype)          # [N, 2]
    n = line.shape[0]
    dx = line[:, 0][:, None] - px[None, :]       # [N, B]
    dy = line[:, 1][:, None] - py[None, :]
    dist2 = dx * dx + dy * dy
    ci = jnp.argmin(dist2, axis=0).astype(jnp.int32)   # [B]
    d_vertex = jnp.sqrt(jnp.min(dist2, axis=0))

    oh = _onehot(ci, n)                          # [N, B]
    g = jnp.asarray(tab.gather, dtype) @ oh.astype(dtype)  # [G, B]
    (cx, cy, x_m1, y_m1, x_p1, y_p1,
     x_sp, y_sp, x_sp1, y_sp1, x_sn, y_sn, x_sn1, y_sn1,
     cum_sp, cum_sp1, cum_sn, cum_sn1, cum_ci) = [g[i] for i in range(_G_ROWS)]

    def seg_dists(x0, y0, x1, y1, x2, y2):
        l = jnp.sqrt((y2 - y1) ** 2 + (x2 - x1) ** 2)
        safe_l = jnp.where(l == 0, 1.0, l)
        dl = ((y2 - y1) * x0 - (x2 - x1) * y0 + x2 * y1 - x1 * y2) / safe_l
        d1 = (x1 * x1 + x0 * (x2 - x1) - x1 * x2
              + y1 * y1 + y0 * (y2 - y1) - y1 * y2) / safe_l
        d2 = (x2 * x2 - x0 * (x2 - x1) - x1 * x2
              + y2 * y2 - y0 * (y2 - y1) - y1 * y2) / safe_l
        dl0 = jnp.sqrt((y0 - y1) ** 2 + (x0 - x1) ** 2)
        dl = jnp.where(l == 0, dl0, dl)
        d1 = jnp.where(l == 0, 0.0, d1)
        d2 = jnp.where(l == 0, 0.0, d2)
        return dl, d1, d2

    dl_p, d1_p, d2_p = seg_dists(px, py, x_sp, y_sp, x_sp1, y_sp1)
    dl_n, d1_n, d2_n = seg_dists(px, py, x_sn, y_sn, x_sn1, y_sn1)

    at_start = ci == 0
    at_end = ci == n - 1

    # interior vertex-sign (case 5): turn direction at the vertex
    turn_dl, _, _ = seg_dists(x_p1, y_p1, x_m1, y_m1, cx, cy)
    vertex_sign_interior = jnp.where(turn_dl > 0, -1.0, 1.0)

    dist_c0_start = jnp.where(dl_n < 0, -d_vertex, d_vertex)
    dist_c0_end = jnp.where(dl_p < 0, -d_vertex, d_vertex)
    dist_c0_mid = vertex_sign_interior * d_vertex

    both_out = (d2_p < 0) & (d1_n < 0)
    prev_out = d2_p < 0
    next_out = d1_n < 0
    pick_prev = jnp.abs(dl_n) > jnp.abs(dl_p)
    dist_i = jnp.where(
        both_out, dist_c0_mid,
        jnp.where(prev_out, dl_n,
                  jnp.where(next_out, dl_p,
                            jnp.where(pick_prev, dl_p, dl_n))))
    type_i = jnp.where(
        both_out, 0,
        jnp.where(prev_out, 1,
                  jnp.where(next_out, -1,
                            jnp.where(pick_prev, -1, 1))))

    dist_s = jnp.where(d1_n < 0, dist_c0_start, dl_n)
    type_s = jnp.where(d1_n < 0, 0, 1)
    dist_e = jnp.where(d2_p < 0, dist_c0_end, dl_p)
    type_e = jnp.where(d2_p < 0, 0, -1)

    distance = jnp.where(at_start, dist_s, jnp.where(at_end, dist_e, dist_i))
    ctype = jnp.where(at_start, type_s,
                      jnp.where(at_end, type_e, type_i)).astype(jnp.int32)

    ds_next = d1_n + cum_sn
    ds_prev = d1_p + cum_sp
    dist_start = jnp.where(ctype == 1, ds_next,
                           jnp.where(ctype == -1, ds_prev, cum_ci))

    # tangent heading of the hosting segment (cartesian_to_frenet)
    psi_next = jnp.arctan2(y_p1 - cy, x_p1 - cx)
    psi_prev = jnp.arctan2(cy - y_m1, cx - x_m1)
    psi_line = jnp.where(ctype == 1, psi_next,
                         jnp.where(ctype == -1, psi_prev, psi_next))
    vd = -vx * jnp.sin(psi_line) + vy * jnp.cos(psi_line)
    return dist_start, distance, vd


def _spline_pos_tangent(s: jax.Array, tab: RefTables, dtype):
    """(x, y, dx, dy) of the arc-length spline at ``s`` [..., B] —
    branchless piecewise Horner: one masked accumulate per segment
    (exactly one mask fires per point), no lane-indexed gathers.
    Matches ``ops.spline.refpath_pos_tangent`` bit-for-bit: same clamped
    segment rule (searchsorted right - 1 into [0, M-2]) and the same
    fused Horner forms."""
    knots = tab.knots
    m = knots.shape[0]
    x = jnp.zeros_like(s)
    y = jnp.zeros_like(s)
    dx_t = jnp.zeros_like(s)
    dy_t = jnp.zeros_like(s)
    for i in range(m - 1):
        lo = dtype(knots[i])
        if i == 0:
            inseg = s < dtype(knots[1])
        elif i == m - 2:
            inseg = s >= lo
        else:
            inseg = (s >= lo) & (s < dtype(knots[i + 1]))
        ax, bx, cx, dxc, ay, by, cy, dyc = (dtype(v) for v in tab.seg[i])
        dt = s - lo
        px = ax + (bx + (cx + dxc * dt) * dt) * dt
        py = ay + (by + (cy + dyc * dt) * dt) * dt
        tx = bx + (2.0 * cx + 3.0 * dxc * dt) * dt
        ty = by + (2.0 * cy + 3.0 * dyc * dt) * dt
        x = x + jnp.where(inseg, px, 0.0)
        y = y + jnp.where(inseg, py, 0.0)
        dx_t = dx_t + jnp.where(inseg, tx, 0.0)
        dy_t = dy_t + jnp.where(inseg, ty, 0.0)
    return x, y, dx_t, dy_t


class FastLattice(NamedTuple):
    x: jax.Array          # [P, T, B]
    y: jax.Array          # [P, T, B]
    s_d_end: jax.Array    # [n_v, B] terminal longitudinal speed
    cf: jax.Array         # [P, B]
    feasible: jax.Array   # [P, B]


def _plan_lattice(s0, c_d, c_d_d, c_speed, tab: RefTables,
                  wcfg: WerlingConfig, dtype) -> FastLattice:
    """Werling lattice, batch-last (mirrors ``werling.plan``).  The
    spline is evaluated at the [n_v, T, B] longitudinal grid only — the
    n_d lateral offsets share it (the readable path evaluates all
    [P, T] points; the values are identical because s does not depend
    on the lateral index)."""
    Ti = wcfg.horizons[0]
    n_t = wcfg.n_time_steps
    d_offsets = np.asarray(wcfg.d_offsets)
    tvs = np.asarray(wcfg.target_speeds)
    n_d, n_v = len(d_offsets), len(tvs)
    t = jnp.arange(n_t, dtype=dtype) * dtype(wcfg.dt)     # [T]
    t3 = t[None, :, None]                                  # [1, T, 1]

    zero = jnp.zeros_like(s0)
    # Lateral quintics: boundary (c_d, c_d_d, 0) -> (d_off, 0, 0).
    d_off = jnp.asarray(d_offsets, dtype)[:, None]        # [n_d, 1]
    lat = poly.solve_quintic(c_d[None, :], c_d_d[None, :], zero[None, :],
                             d_off, 0.0, 0.0, dtype(Ti))   # [n_d, B] coeffs
    lat3 = jax.tree.map(lambda a: a[:, None, :], lat)      # [n_d, 1, B]
    d = poly.quintic_eval(lat3, t3)                        # [n_d, T, B]
    d_ddd = poly.quintic_d3(lat3, t3)

    # Longitudinal quartics: (s0, c_speed, 0) -> (tv, 0).
    tv = jnp.asarray(tvs, dtype)[:, None]                  # [n_v, 1]
    lon = poly.solve_quartic(s0[None, :], c_speed[None, :], zero[None, :],
                             tv, 0.0, dtype(Ti))           # [n_v, B]
    lon3 = jax.tree.map(lambda a: a[:, None, :], lon)
    s = poly.quartic_eval(lon3, t3)                        # [n_v, T, B]
    s_dv = poly.quartic_d1(lon3, t3)
    s_dd = poly.quartic_d2(lon3, t3)
    s_ddd = poly.quartic_d3(lon3, t3)

    # Costs (werling.plan / JunctionTrajectoryPlanner.py:322-331).
    Jp = jnp.sum(d_ddd ** 2, axis=1)                       # [n_d, B]
    Js = jnp.sum(s_ddd ** 2, axis=1)                       # [n_v, B]
    ds_cost = (dtype(wcfg.target_speed) - s_dv[:, -1, :]) ** 2
    cd = dtype(wcfg.kj) * Jp + dtype(wcfg.kt) * dtype(Ti) \
        + dtype(wcfg.kd) * d[:, -1, :] ** 2
    cv = dtype(wcfg.kj) * Js + dtype(wcfg.kt) * dtype(Ti) \
        + dtype(wcfg.kd) * ds_cost
    cf = (dtype(wcfg.klat) * cd[:, None, :]
          + dtype(wcfg.klon) * cv[None, :, :])             # [n_d, n_v, B]

    # Global conversion on the shared longitudinal grid.
    ix, iy, idx_, idy_ = _spline_pos_tangent(s, tab, dtype)  # [n_v, T, B]
    iyaw = jnp.arctan2(idy_, idx_)
    half_pi = dtype(np.pi / 2.0)
    cos_n = jnp.cos(iyaw + half_pi)
    sin_n = jnp.sin(iyaw + half_pi)
    # [n_d, n_v, T, B]
    x = ix[None] + d[:, None] * cos_n[None]
    y = iy[None] + d[:, None] * sin_n[None]

    p = n_d * n_v
    b = s0.shape[0]
    x = x.reshape(p, n_t, b)
    y = y.reshape(p, n_t, b)

    dxp = jnp.diff(x, axis=1)
    dyp = jnp.diff(y, axis=1)
    yaw_seg = jnp.arctan2(dyp, dxp)                        # [P, T-1, B]
    yaw = jnp.concatenate([yaw_seg, yaw_seg[:, -1:, :]], axis=1)
    ds_seg = jnp.sqrt(dxp ** 2 + dyp ** 2)
    ds_seg = jnp.where(ds_seg < 1e-5, 0.1, ds_seg)
    curv = jnp.diff(yaw, axis=1) / ds_seg                  # [P, T-1, B]

    ok_v = (~jnp.any(s_dv > dtype(wcfg.max_speed), axis=1)
            & ~jnp.any(jnp.abs(s_dd) > dtype(wcfg.max_accel), axis=1))  # [n_v, B]
    ok_curv = ~jnp.any(jnp.abs(curv) > dtype(wcfg.max_curvature), axis=1)  # [P, B]
    feasible = (jnp.broadcast_to(ok_v[None], (n_d, n_v, b)).reshape(p, b)
                & ok_curv)

    return FastLattice(x=x, y=y, s_d_end=s_dv[:, -1, :],
                       cf=cf.reshape(p, b), feasible=feasible)


def _collision_free(lat: FastLattice, obstacles: jax.Array,
                    wcfg: WerlingConfig, dtype) -> jax.Array:
    """[P, B] collision-free mask (mirrors ``predictor.py``: stride-2
    indices from 2, constant-velocity rollouts, move_gap circle pair)."""
    n_pred_t = int(wcfg.max_t / wcfg.dt)
    n_path_t = lat.x.shape[1]
    len_predict = min(n_path_t - 1, n_pred_t - 1)
    idx = np.arange(2, len_predict, 2)
    # same rounding as predictor.py: f-dtype arange * dt, then index
    t_grid = jnp.arange(n_pred_t, dtype=dtype) * dtype(wcfg.dt)
    t_check = t_grid[idx]                                  # [S]

    ox0 = obstacles[:, 0, :][:, None, :]                   # [K, 1, B]
    oy0 = obstacles[:, 1, :][:, None, :]
    ovx = obstacles[:, 2, :][:, None, :]
    ovy = obstacles[:, 3, :][:, None, :]
    oyaw = obstacles[:, 4, :][:, None, :]
    xt = ox0 + t_check[None, :, None] * ovx                # [K, S, B]
    yt = oy0 + t_check[None, :, None] * ovy
    gap = dtype(wcfg.move_gap)
    gx = jnp.cos(oyaw) * gap
    gy = jnp.sin(oyaw) * gap
    ox = jnp.stack([xt + gx, xt - gx], axis=1)             # [K, 2, S, B]
    oy = jnp.stack([yt + gy, yt - gy], axis=1)

    px = lat.x[:, idx, :]                                  # [P, S, B]
    py = lat.y[:, idx, :]
    d2 = ((ox[None] - px[:, None, None]) ** 2
          + (oy[None] - py[:, None, None]) ** 2)           # [P, K, 2, S, B]
    hit = d2 <= dtype(wcfg.robot_radius) ** 2
    return ~jnp.any(hit, axis=(1, 2, 3))                   # [P, B]


def _control(ego_x, ego_y, ego_yaw, ego_v, traj_x, traj_y, speed_end, dtype):
    """PID + pure pursuit, batch-last (mirrors ``control/controller.py``;
    the T-point interp uses a masked accumulate instead of jnp.interp's
    gather)."""
    n_t = traj_x.shape[0]
    # PID (longitudinal_pid)
    e_kmh = (speed_end - ego_v) * 3.6
    u = jnp.clip(dtype(PID_KP) * e_kmh, -1.0, 1.0)
    acc = jnp.where(speed_end == 0, -1.0, u)

    # pure pursuit lookahead
    d2 = (traj_x - ego_x[None]) ** 2 + (traj_y - ego_y[None]) ** 2  # [T, B]
    start_idx = jnp.argmin(d2, axis=0).astype(jnp.int32)
    segx = jnp.diff(traj_x, axis=0)
    segy = jnp.diff(traj_y, axis=0)
    seg = jnp.sqrt(segx ** 2 + segy ** 2)                  # [T-1, B]
    cum = jnp.concatenate([jnp.zeros((1,) + seg.shape[1:], dtype),
                           jnp.cumsum(seg, axis=0)])       # [T, B]
    oh_start = _onehot(start_idx, n_t).astype(dtype)
    cum_start = jnp.sum(cum * oh_start, axis=0)

    lookahead_dt = jnp.where(ego_v > 10.0, 0.5 - (ego_v - 10.0) * 0.01, 0.5)
    target_s = cum_start + jnp.maximum(lookahead_dt * ego_v, 3.0)

    # linear interp on the (cum, traj) table — clamped like jnp.interp
    i = jnp.sum((cum <= target_s[None]).astype(jnp.int32), axis=0) - 1
    i = jnp.clip(i, 0, n_t - 2)
    oh_i = _onehot(i, n_t - 1).astype(dtype)               # [T-1, B]
    c_lo = jnp.sum(cum[:-1] * oh_i, axis=0)
    c_hi = jnp.sum(cum[1:] * oh_i, axis=0)
    x_lo = jnp.sum(traj_x[:-1] * oh_i, axis=0)
    x_hi = jnp.sum(traj_x[1:] * oh_i, axis=0)
    y_lo = jnp.sum(traj_y[:-1] * oh_i, axis=0)
    y_hi = jnp.sum(traj_y[1:] * oh_i, axis=0)
    denom = c_hi - c_lo
    frac = jnp.where(denom > 0, (target_s - c_lo) / jnp.where(denom == 0, 1.0, denom), 0.0)
    frac = jnp.clip(frac, 0.0, 1.0)
    wp_x = x_lo + frac * (x_hi - x_lo)
    wp_y = y_lo + frac * (y_hi - y_lo)

    vx_h = jnp.cos(ego_yaw)
    vy_h = jnp.sin(ego_yaw)
    wx = wp_x - ego_x
    wy = wp_y - ego_y
    w_norm = jnp.maximum(jnp.sqrt(wx ** 2 + wy ** 2), 1e-9)
    cos_a = jnp.clip((wx * vx_h + wy * vy_h) / w_norm, -1.0, 1.0)
    alpha = jnp.arccos(cos_a)
    cross_z = vx_h * wy - vy_h * wx
    alpha = jnp.where(cross_z < 0, -alpha, alpha)

    rear_x = ego_x - vx_h * dtype(LR)
    rear_y = ego_y - vy_h * dtype(LR)
    l = jnp.maximum(jnp.sqrt((wp_x - rear_x) ** 2 + (wp_y - rear_y) ** 2), 1e-6)
    steer = jnp.arctan(2.0 * jnp.sin(alpha) * dtype(LWB) / l)
    return acc, steer


# ---------------------------------------------------------------------------
# Lane-major env
# ---------------------------------------------------------------------------


class FastEnvState(NamedTuple):
    ego: jax.Array          # [5, B]
    ego_speed: jax.Array    # [B]
    vehicles: jax.Array     # [V, 5, B]
    walker: jax.Array       # [5, B]
    stuck_steps: jax.Array  # [B] i32
    step_count: jax.Array   # [B] i32
    done: jax.Array         # [B] bool
    collided: jax.Array
    passed: jax.Array
    stuck: jax.Array
    episode_return: jax.Array


def _state_to_lane_major(s: de.EnvState) -> FastEnvState:
    """Transpose a vmapped (batch-first) EnvState into lane-major."""
    return FastEnvState(
        ego=s.ego.T, ego_speed=s.ego_speed,
        vehicles=jnp.transpose(s.vehicles, (1, 2, 0)),
        walker=s.walker.T, stuck_steps=s.stuck_steps,
        step_count=s.step_count, done=s.done, collided=s.collided,
        passed=s.passed, stuck=s.stuck, episode_return=s.episode_return)


def _reset_soa(key: jax.Array, b: int, sa: de.ScenarioArrays,
               cfg: EnvConfig, dtype) -> FastEnvState:
    """Batch reset from ONE step key (jitter drawn as [.., B] blocks —
    same distribution as the per-env-key path, cheaper to generate)."""
    k_ego, k_veh = jax.random.split(key)
    j = dtype(cfg.reset_jitter)
    ego = sa.ego_spawn[:, None] + jnp.concatenate([
        jax.random.uniform(k_ego, (2, b), dtype, -1.0, 1.0) * j,
        jnp.zeros((3, b), dtype)])
    v = sa.vehicle_spawns.shape[0]
    veh = jnp.broadcast_to(sa.vehicle_spawns[:, :, None],
                           (v, 5, b)).astype(dtype)
    jitter = jax.random.uniform(k_veh, (v, 2, b), dtype, -1.0, 1.0) * j
    veh = veh.at[:, :2, :].add(jitter)
    zeros = jnp.zeros((b,), dtype)
    return FastEnvState(
        ego=ego, ego_speed=zeros, vehicles=veh,
        walker=jnp.broadcast_to(sa.walker_spawn[:, None], (5, b)).astype(dtype),
        stuck_steps=jnp.zeros((b,), jnp.int32),
        step_count=jnp.zeros((b,), jnp.int32),
        done=jnp.zeros((b,), bool), collided=jnp.zeros((b,), bool),
        passed=jnp.zeros((b,), bool), stuck=jnp.zeros((b,), bool),
        episode_return=zeros)


def _step_env_soa(state: FastEnvState, acc_cmd, steer_cmd, key,
                  sa: de.ScenarioArrays, in_state_idx, cfg: EnvConfig, dtype):
    """Lane-major port of ``driving_env.step_autoreset`` (identical
    physics/reward/termination/auto-reset semantics)."""
    b = acc_cmd.shape[0]
    # --- ego kinematics (_step_ego)
    throttle = jnp.maximum(0.0, acc_cmd)
    brake = jnp.maximum(0.0, -acc_cmd)
    accel = throttle * dtype(cfg.max_accel) - brake * dtype(cfg.max_brake) \
        - 0.05 * state.ego_speed
    v = jnp.clip(state.ego_speed + accel * dtype(cfg.dt), 0.0, 60.0)
    steer = jnp.clip(steer_cmd, -dtype(cfg.max_steer), dtype(cfg.max_steer))
    yaw = state.ego[4] + v / dtype(cfg.wheelbase) * jnp.tan(steer) * dtype(cfg.dt)
    vx = v * jnp.cos(yaw)
    vy = v * jnp.sin(yaw)
    x = state.ego[0] + vx * dtype(cfg.dt)
    y = state.ego[1] + vy * dtype(cfg.dt)
    ego = jnp.stack([x, y, vx, vy, yaw])

    # --- traffic (_step_traffic)
    veh = state.vehicles
    moving = sa.vehicle_moving[:, None]
    new_xy = veh[:, :2, :] + veh[:, 2:4, :] * dtype(cfg.dt)
    veh = veh.at[:, :2, :].set(jnp.where(moving[..., None], new_xy,
                                         veh[:, :2, :]))
    walker = state.walker.at[:2].add(state.walker[2:4] * dtype(cfg.dt))

    # --- collision / termination / reward
    actor_x = jnp.concatenate([veh[:, 0, :], walker[0][None]])   # [V+1, B]
    actor_y = jnp.concatenate([veh[:, 1, :], walker[1][None]])
    d2 = (actor_x - x[None]) ** 2 + (actor_y - y[None]) ** 2
    collided = jnp.any(d2 < dtype(cfg.collision_radius) ** 2, axis=0)
    if cfg.offroute_dist > 0:
        # road departure == environment collision (driving_env.step)
        d2r = jnp.min(
            (sa.ref_path[:, 0][:, None] - x[None]) ** 2
            + (sa.ref_path[:, 1][:, None] - y[None]) ** 2, axis=0)
        collided = collided | (d2r > dtype(cfg.offroute_dist) ** 2)

    passed = y < dtype(cfg.pass_line_y)
    slow = v < dtype(cfg.stuck_speed)
    stuck_steps = jnp.where(slow, state.stuck_steps + 1, 0)
    stuck = stuck_steps > jnp.int32(cfg.stuck_time / cfg.dt)

    reward = jnp.sqrt(v) * dtype(cfg.speed_reward_scale) \
        + dtype(cfg.reward_pass) * passed
    reward = jnp.where(collided, dtype(cfg.reward_collision), reward)
    reward = jnp.where(stuck & ~collided, dtype(cfg.reward_stuck), reward)

    step_count = state.step_count + 1
    timeout = step_count >= cfg.max_episode_steps
    done = collided | passed | stuck | timeout

    new_state = FastEnvState(
        ego=ego, ego_speed=v, vehicles=veh, walker=walker,
        stuck_steps=stuck_steps, step_count=step_count, done=done,
        collided=collided, passed=passed, stuck=stuck,
        episode_return=state.episode_return + reward)

    # --- auto-reset blend
    fresh = _reset_soa(key, b, sa, cfg, dtype)
    blended = jax.tree.map(
        lambda a, f: jnp.where(
            jnp.reshape(done, (1,) * (a.ndim - 1) + done.shape), f, a),
        new_state, fresh)
    blended = blended._replace(done=done, collided=collided, passed=passed,
                               stuck=stuck)
    return blended, reward, done


def _obs_ori_soa(state: FastEnvState, in_state_idx) -> jax.Array:
    """[20, B] world-frame observation (walker first, then in-state
    vehicles — matches ``driving_env.wrap_state``)."""
    rows = [state.ego]
    rows.append(state.walker)
    for i in in_state_idx:
        rows.append(state.vehicles[i])
    return jnp.concatenate(rows, axis=0)


# ---------------------------------------------------------------------------
# The fused driver
# ---------------------------------------------------------------------------


def make_rule_driver_fast(sc: Scenario,
                          env_cfg: EnvConfig = EnvConfig(),
                          wcfg: WerlingConfig = WerlingConfig(),
                          dtype=jnp.float32):
    """Lane-major rule driver: (init_fn, run_fn) with

      init_fn(keys[B, 2])            -> carry  (same init as the readable
                                       driver: per-env keyed reset)
      run_fn(carry, step_keys[S, 2]) -> (carry, (reward[S,B], done[S,B],
                                       passed[S,B], collided[S,B]))

    Identical tick semantics to ``rollout.make_rule_driver``; outputs
    are [S, B] (step-major) instead of [B, S].
    """
    sa = de.scenario_to_device(sc, dtype)
    idx = de.in_state_indices(sc)
    ref_line = np.asarray(sc.ref_path, np.float64)
    tab = build_ref_tables(ref_line, dtype)
    npdt = np.dtype(jnp.zeros((), dtype).dtype.name).type
    n_obj = (env_cfg.state_dim - 5) // 5
    n_v = len(wcfg.target_speeds)
    n_paths = wcfg.num_paths

    def one_step(state: FastEnvState, key):
        obs = _obs_ori_soa(state, idx)                       # [20, B]
        ego_x, ego_y = obs[0], obs[1]
        ego_vx, ego_vy, ego_yaw = obs[2], obs[3], obs[4]

        # planner start state (start_state_from_ego: c_d = -d)
        s0, d_signed, vd = _project_ego(ego_x, ego_y, ego_vx, ego_vy,
                                        tab, npdt)
        c_speed = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        lat = _plan_lattice(s0, -d_signed, vd, c_speed, tab, wcfg, npdt)

        # obstacles: rows 5.. of obs with yaw zeroed (rollout semantics)
        obstacles = obs[5:].reshape(n_obj, 5, -1)
        obstacles = obstacles.at[:, 4, :].set(0.0)
        free = _collision_free(lat, obstacles, wcfg, npdt)

        ok = lat.feasible & free
        masked_cost = jnp.where(ok, lat.cf, jnp.inf)
        best = jnp.argmin(masked_cost, axis=0).astype(jnp.int32)  # [B]
        rule_index = jnp.where(jnp.any(ok, axis=0), best + 1, 0)

        # trajectory_by_index: 0 = brake (min-cost path, zero speed)
        brake_path = jnp.argmin(lat.cf, axis=0).astype(jnp.int32)
        p_sel = jnp.where(rule_index == 0, brake_path, rule_index - 1)
        oh_p = _onehot(p_sel, n_paths).astype(npdt)          # [P, B]
        traj_x = jnp.sum(lat.x * oh_p[:, None, :], axis=0)   # [T, B]
        traj_y = jnp.sum(lat.y * oh_p[:, None, :], axis=0)
        # terminal speed of the selected path: path p -> speed index p % n_v
        oh_v = oh_p.reshape(-1, n_v, oh_p.shape[-1]).sum(axis=0)  # [n_v, B]
        speed_end = jnp.sum(lat.s_d_end * oh_v, axis=0)
        speed_end = jnp.where(rule_index == 0, 0.0, speed_end)

        ego_v = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        acc, steer = _control(ego_x, ego_y, ego_yaw, ego_v,
                              traj_x, traj_y, speed_end, npdt)

        state, reward, done = _step_env_soa(state, acc, steer, key, sa,
                                            idx, env_cfg, npdt)
        return state, (reward, done, state.passed, state.collided)

    @jax.jit
    def init_fn(keys):
        states = jax.vmap(lambda k: de.reset(sa, k, env_cfg))(keys)
        return _state_to_lane_major(states)

    @jax.jit
    def run_fn(carry, step_keys):
        return jax.lax.scan(one_step, carry, step_keys)

    return init_fn, run_fn


# ---------------------------------------------------------------------------
# Lane-major value collector (the HRL round-robin collection loop)
# ---------------------------------------------------------------------------


class FastCollectorCarry(NamedTuple):
    env: FastEnvState
    triggered: jax.Array       # [B] bool
    locked_x: jax.Array        # [T, B]
    locked_y: jax.Array        # [T, B]
    locked_speed_end: jax.Array  # [B]
    recorded_state: jax.Array  # [20, B]
    used_action: jax.Array     # [B] i32


class FastStepRecord(NamedTuple):
    done: jax.Array            # [B]
    collided: jax.Array
    passed: jax.Array
    recorded_state: jax.Array  # [20, B]
    used_action: jax.Array
    episode_return: jax.Array
    reward: jax.Array
    rule_index: jax.Array


def make_collector_fast(sc: Scenario,
                        env_cfg: EnvConfig = EnvConfig(),
                        wcfg: WerlingConfig = WerlingConfig(),
                        dtype=jnp.float32,
                        trigger_y: float = 90.0):
    """Lane-major port of ``rollout.make_collector`` (the
    dqn_value_collect.py loop, SURVEY.md §3.2): identical trigger/lock/
    round-robin semantics, [S, B]-shaped records.  ~5x the readable
    path's throughput on TPU (same layout win as the rule driver)."""
    sa = de.scenario_to_device(sc, dtype)
    idx = de.in_state_indices(sc)
    ref_line = np.asarray(sc.ref_path, np.float64)
    tab = build_ref_tables(ref_line, dtype)
    npdt = np.dtype(jnp.zeros((), dtype).dtype.name).type
    n_obj = (env_cfg.state_dim - 5) // 5
    n_v = len(wcfg.target_speeds)
    n_paths = wcfg.num_paths
    n_t = wcfg.n_time_steps

    def pick_path(lat: FastLattice, index: jax.Array):
        """trajectory_by_index semantics, lane-major: -> (x, y,
        speed_end) of candidate ``index`` (0 = brake)."""
        brake_path = jnp.argmin(lat.cf, axis=0).astype(jnp.int32)
        p_sel = jnp.where(index == 0, brake_path, index - 1)
        oh_p = _onehot(p_sel, n_paths).astype(npdt)
        tx = jnp.sum(lat.x * oh_p[:, None, :], axis=0)
        ty = jnp.sum(lat.y * oh_p[:, None, :], axis=0)
        oh_v = oh_p.reshape(-1, n_v, oh_p.shape[-1]).sum(axis=0)
        se = jnp.sum(lat.s_d_end * oh_v, axis=0)
        se = jnp.where(index == 0, 0.0, se)
        return tx, ty, se

    def one_step(carry: FastCollectorCarry, key):
        state = carry.env
        obs = _obs_ori_soa(state, idx)
        ego_x, ego_y = obs[0], obs[1]
        ego_vx, ego_vy, ego_yaw = obs[2], obs[3], obs[4]

        s0, d_signed, vd = _project_ego(ego_x, ego_y, ego_vx, ego_vy,
                                        tab, npdt)
        c_speed = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        lat = _plan_lattice(s0, -d_signed, vd, c_speed, tab, wcfg, npdt)

        obstacles = obs[5:].reshape(n_obj, 5, -1)
        obstacles = obstacles.at[:, 4, :].set(0.0)
        free = _collision_free(lat, obstacles, wcfg, npdt)
        ok = lat.feasible & free
        masked_cost = jnp.where(ok, lat.cf, jnp.inf)
        best = jnp.argmin(masked_cost, axis=0).astype(jnp.int32)
        rule_index = jnp.where(jnp.any(ok, axis=0), best + 1, 0)

        # trigger: lock the round-robin candidate once y < trigger_y
        trigger_now = (~carry.triggered) & (ego_y < npdt(trigger_y))
        hrl_x, hrl_y, hrl_se = pick_path(lat, carry.used_action)
        rule_x, rule_y, rule_se = pick_path(lat, rule_index)

        locked_x = jnp.where(trigger_now[None, :], hrl_x, carry.locked_x)
        locked_y = jnp.where(trigger_now[None, :], hrl_y, carry.locked_y)
        locked_se = jnp.where(trigger_now, hrl_se, carry.locked_speed_end)
        recorded_state = jnp.where(trigger_now[None, :], obs,
                                   carry.recorded_state)
        triggered = carry.triggered | trigger_now

        follow_x = jnp.where(triggered[None, :], locked_x, rule_x)
        follow_y = jnp.where(triggered[None, :], locked_y, rule_y)
        follow_se = jnp.where(triggered, locked_se, rule_se)

        ego_v = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        acc, steer = _control(ego_x, ego_y, ego_yaw, ego_v,
                              follow_x, follow_y, follow_se, npdt)

        episode_return_before = state.episode_return
        state, reward, done = _step_env_soa(state, acc, steer, key, sa,
                                            idx, env_cfg, npdt)

        record = FastStepRecord(
            done=done, collided=state.collided, passed=state.passed,
            recorded_state=recorded_state, used_action=carry.used_action,
            episode_return=episode_return_before + reward, reward=reward,
            rule_index=rule_index)

        n_actions = n_paths + 1
        used_action = jnp.where(done, (carry.used_action + 1) % n_actions,
                                carry.used_action)
        triggered = jnp.where(done, False, triggered)

        return FastCollectorCarry(
            env=state, triggered=triggered, locked_x=locked_x,
            locked_y=locked_y, locked_speed_end=locked_se,
            recorded_state=recorded_state, used_action=used_action), record

    @jax.jit
    def init_fn(keys):
        b = keys.shape[0]
        states = jax.vmap(lambda k: de.reset(sa, k, env_cfg))(keys)
        return FastCollectorCarry(
            env=_state_to_lane_major(states),
            triggered=jnp.zeros((b,), bool),
            locked_x=jnp.zeros((n_t, b), dtype),
            locked_y=jnp.zeros((n_t, b), dtype),
            locked_speed_end=jnp.zeros((b,), dtype),
            recorded_state=jnp.zeros((env_cfg.state_dim, b), dtype),
            used_action=jnp.zeros((b,), jnp.int32))

    @jax.jit
    def run_fn(carry, step_keys):
        return jax.lax.scan(one_step, carry, step_keys)

    return init_fn, run_fn


# ---------------------------------------------------------------------------
# Confidence-gated deployment driver (RLS test mode at scale)
# ---------------------------------------------------------------------------


def _lane_major_spec(mesh, axis: str, batch: int | None = None):
    """NamedSharding builder: shard a lane-major pytree on its LAST
    axis (the env batch) over ``axis``; scalars replicate.

    When ``batch`` is given, every non-scalar leaf must have that exact
    trailing extent — a leaf whose last axis is NOT the env batch (e.g.
    per-env PRNG keys shaped [B, 2]) would otherwise silently shard the
    wrong axis or fail mesh divisibility with a confusing error."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    def spec(x):
        if getattr(x, "ndim", 0) == 0:
            return NamedSharding(mesh, P())
        if batch is not None and x.shape[-1] != batch:
            raise ValueError(
                f"lane-major leaf has trailing axis {x.shape[-1]}, expected "
                f"the env batch {batch}; only batch-last arrays can be "
                f"sharded by _lane_major_spec (leaf shape {x.shape})")
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + [axis])))

    return spec


def shard_rule_driver(init_fn, run_fn, mesh, axis: str = "env"):
    """Wrap the lane-major rule driver for a device mesh.

    The rule driver has no cross-env coupling, so sharding is pure data
    parallelism: every array's trailing env-batch axis is laid out over
    ``axis`` and XLA partitions the whole scan with zero collectives —
    the TPU-native form of the reference's SubprocVecEnv process pool
    (subproc_vec_env.py:10-47), except the "workers" are mesh devices
    inside one program.  Returns (init_sharded, run_sharded); ``keys``
    passed to init must have batch divisible by the mesh size.
    """
    import jax as _jax

    def init_sharded(keys):
        carry = init_fn(keys)
        spec = _lane_major_spec(mesh, axis, batch=keys.shape[0])
        return _jax.tree.map(lambda x: _jax.device_put(x, spec(x)), carry)

    @_jax.jit
    def run_sharded(carry, step_keys):
        return run_fn(carry, step_keys)

    return init_sharded, run_sharded


def make_gated_driver_fast(sc: Scenario,
                           env_cfg: EnvConfig = EnvConfig(),
                           wcfg: WerlingConfig = WerlingConfig(),
                           store_cfg=None,
                           dtype=jnp.float32,
                           use_pallas: bool | None = None,
                           psum_axis: "str | None" = None,
                           pallas_interpret: bool = False,
                           with_query_offset: bool = False):
    """Lane-major confidence-gated driver — the reference's deployment
    mode (DCARL_agent.py:35-43 predict loop + RLS.act_test,
    RLS.py:120-157) as one fused program over [B] lockstep envs:

      plan lattice -> query the confidence store for every candidate
      action of every env (one fused kernel) -> Welch z-test gate ->
      follow the winning candidate (rule trajectory when none passes)
      -> env tick.

    The store is FIXED (inference mode, ``is_training=False`` —
    deepq/dqn.py:106): store building is the trainer's job
    (dcarl_tpu/train.py).  RLS action semantics: gated action 0 =
    follow the planner's rule pick; g >= 1 = follow lattice candidate
    g; the EXECUTED trajectory index is recorded per step, mirroring
    ``env_action`` recording (dqn.py:228-236).

    Returns (init_fn, run_fn):
      init_fn(keys[B, 2]) -> carry
      run_fn(carry, step_keys[S, 2], store_keys[N, D+1], store_values[N],
             store_valid[N]) -> (carry, (reward, done, passed, collided,
                                         executed_action, gated_action))
      each [S, B]; ``gated_action`` is the raw z-test output g (0 =
      fell back to the rule pick), ``executed_action`` the trajectory
      index actually followed.

    ``with_query_offset=True`` appends a ``query_offset`` [state_dim]
    argument to ``run_fn``: it is ADDED to every observation before the
    store query (keys and statistics untouched otherwise).  This is the
    vehicle-life frame alignment: the scenario dynamics are
    translation-invariant, so a fleet operating at world position X
    runs in the local frame while its queries address the world-frame
    history at ``local + offset(X)`` — the offset drifts over the
    vehicle's life without recompiling the driver
    (dcarl_tpu/workingset.py).
    """
    import jax as _jax

    from dcarl_tpu.config import StoreConfig
    from dcarl_tpu.core import rls as RLSmod
    from dcarl_tpu.core.store import _raw_moments, moments_to_stats
    from dcarl_tpu.ops.pallas_store import (prepare_peraction_store,
                                            query_peraction_prepared)

    scfg = store_cfg or StoreConfig()
    if use_pallas is None:
        use_pallas = _jax.default_backend() == "tpu"

    sa = de.scenario_to_device(sc, dtype)
    idx = de.in_state_indices(sc)
    ref_line = np.asarray(sc.ref_path, np.float64)
    tab = build_ref_tables(ref_line, dtype)
    npdt = np.dtype(jnp.zeros((), dtype).dtype.name).type
    n_obj = (env_cfg.state_dim - 5) // 5
    n_v = len(wcfg.target_speeds)
    n_paths = wcfg.num_paths
    num_actions = n_paths + 1
    from dcarl_tpu.core.store import FIELD_HALF_WIDTHS
    hw = np.asarray(scfg.half_widths or FIELD_HALF_WIDTHS, np.float64)
    if hw.shape[0] != env_cfg.state_dim + 1:
        raise ValueError("store half_widths must match state_dim + 1")
    if hw[-1] >= 0.5:
        # The action-grouped Pallas kernel bands on an exact-action
        # composite key: an action half-width that can reach across the
        # 1.0 action-lattice gap would be silently pruned there.
        raise ValueError(
            f"action half_width {hw[-1]} >= 0.5 allows cross-action box "
            "matches, which the action-grouped query kernel prunes; use "
            "an exact-match width (< 0.5, e.g. the reference's 0.1)")
    half_widths = jnp.asarray(hw, dtype)

    def one_step(carry, key, store_keys, store_values, store_valid,
                 query_offset=None, prep=None):
        state = carry
        obs = _obs_ori_soa(state, idx)                      # [20, B]
        b = obs.shape[1]
        ego_x, ego_y = obs[0], obs[1]
        ego_vx, ego_vy, ego_yaw = obs[2], obs[3], obs[4]

        s0, d_signed, vd = _project_ego(ego_x, ego_y, ego_vx, ego_vy,
                                        tab, npdt)
        c_speed = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        lat = _plan_lattice(s0, -d_signed, vd, c_speed, tab, wcfg, npdt)

        obstacles = obs[5:].reshape(n_obj, 5, -1)
        obstacles = obstacles.at[:, 4, :].set(0.0)
        free = _collision_free(lat, obstacles, wcfg, npdt)
        ok = lat.feasible & free
        masked_cost = jnp.where(ok, lat.cf, jnp.inf)
        best = jnp.argmin(masked_cost, axis=0).astype(jnp.int32)
        rule_index = jnp.where(jnp.any(ok, axis=0), best + 1, 0)

        # --- confidence query: every action of every env in one kernel
        obs_bf = obs.T                                      # [B, 20]
        if query_offset is not None:
            # world-frame alignment (see with_query_offset): queries
            # shift into the history's frame; planning/control stay in
            # the local frame
            obs_bf = obs_bf + query_offset[None, :].astype(obs_bf.dtype)
        if psum_axis is not None:
            # Sharded store + sharded envs: every env's z-test must see
            # the GLOBAL store (the single R-tree, RLS.py:161-181), so
            # the (small) query batch is all-gathered over the mesh,
            # each shard computes partial moments for the FULL global
            # batch against its local rows, the psum below combines
            # per-query partials across shards, and the local env block
            # is sliced back out.  A bare psum of local-batch moments
            # would instead sum moments of DIFFERENT envs that share a
            # local index — chimeric statistics whenever envs differ
            # across shards (any jittered run).
            obs_q = _jax.lax.all_gather(obs_bf, psum_axis, axis=0,
                                        tiled=True)         # [B_glob, 20]
        else:
            obs_q = obs_bf
        if use_pallas:
            # ONE 20-D query per env; per-action moments come from the
            # kernel's feats matmul (each integer-lattice row matches
            # exactly one action), against the store PREPARED once per
            # run (sort/dedup/bounds hoisted out of the scan —
            # prepare_peraction_store).
            moments = query_peraction_prepared(
                prep, obs_q.astype(jnp.float32),
                interpret=pallas_interpret).reshape(-1, 3)
        else:
            queries = RLSmod.candidate_keys(obs_q, num_actions)
            flat_q = queries.reshape(-1, queries.shape[-1])
            moments = _raw_moments(store_keys.astype(dtype),
                                   store_values.astype(dtype),
                                   store_valid, flat_q.astype(dtype),
                                   half_widths)
        if psum_axis is not None:
            # psum_scatter, not psum+slice: each shard needs only its
            # local env block of the summed moments.  (The AOT HLO
            # census shows XLA currently lowers this back to
            # all-reduce+slice at these shapes — SCALING_r05.md — but
            # the scatter form states the true requirement and lets the
            # compiler pick the cheaper collective when it can.)
            moments = _jax.lax.psum_scatter(
                moments, psum_axis, scatter_dimension=0, tiled=True)
        qs = moments_to_stats(moments)
        stats = RLSmod.ActionStats(
            count=qs.count.reshape(b, num_actions).astype(npdt),
            mean=qs.mean.reshape(b, num_actions).astype(npdt),
            var=qs.var.reshape(b, num_actions).astype(npdt),
            sigma=qs.sigma.reshape(b, num_actions).astype(npdt))

        g = RLSmod.act_test(stats, scfg)                    # [B]
        executed = jnp.where(g == 0, rule_index, g).astype(jnp.int32)

        # follow the executed candidate
        brake_path = jnp.argmin(lat.cf, axis=0).astype(jnp.int32)
        p_sel = jnp.where(executed == 0, brake_path, executed - 1)
        oh_p = _onehot(p_sel, n_paths).astype(npdt)
        traj_x = jnp.sum(lat.x * oh_p[:, None, :], axis=0)
        traj_y = jnp.sum(lat.y * oh_p[:, None, :], axis=0)
        oh_v = oh_p.reshape(-1, n_v, oh_p.shape[-1]).sum(axis=0)
        speed_end = jnp.sum(lat.s_d_end * oh_v, axis=0)
        speed_end = jnp.where(executed == 0, 0.0, speed_end)

        ego_v = jnp.sqrt(ego_vx ** 2 + ego_vy ** 2)
        acc, steer = _control(ego_x, ego_y, ego_yaw, ego_v,
                              traj_x, traj_y, speed_end, npdt)
        state, reward, done = _step_env_soa(state, acc, steer, key, sa,
                                            idx, env_cfg, npdt)
        return state, (reward, done, state.passed, state.collided, executed,
                       g)

    @jax.jit
    def init_fn(keys):
        states = jax.vmap(lambda k: de.reset(sa, k, env_cfg))(keys)
        return _state_to_lane_major(states)

    def _prep(store_keys, store_values, store_valid):
        if not use_pallas:
            return None
        return prepare_peraction_store(
            store_keys.astype(jnp.float32),
            store_values.astype(jnp.float32), store_valid,
            half_widths.astype(jnp.float32), num_actions=num_actions)

    if with_query_offset:
        @jax.jit
        def run_fn(carry, step_keys, store_keys, store_values, store_valid,
                   query_offset):
            prep = _prep(store_keys, store_values, store_valid)

            def body(c, k):
                return one_step(c, k, store_keys, store_values, store_valid,
                                query_offset, prep=prep)

            return jax.lax.scan(body, carry, step_keys)
    else:
        @jax.jit
        def run_fn(carry, step_keys, store_keys, store_values, store_valid):
            prep = _prep(store_keys, store_values, store_valid)

            def body(c, k):
                return one_step(c, k, store_keys, store_values, store_valid,
                                prep=prep)

            return jax.lax.scan(body, carry, step_keys)

    return init_fn, run_fn


def make_gated_driver_sharded(sc: Scenario,
                              mesh,
                              axis: str = "env",
                              env_cfg: EnvConfig = EnvConfig(),
                              wcfg: WerlingConfig = WerlingConfig(),
                              store_cfg=None,
                              dtype=jnp.float32,
                              use_pallas: bool | None = None,
                              pallas_interpret: bool = False):
    """Multi-chip deployment form of :func:`make_gated_driver_fast`.

    Envs shard over ``axis`` (pure data parallelism, like
    :func:`shard_rule_driver`); the confidence store ALSO shards over
    the same devices (rows axis).  Each decision tick all-gathers the
    query batch over the mesh, computes per-shard partial moments for
    the FULL global batch against the local store rows, ``psum``s the
    partials so every env's Welch z-test sees the GLOBAL statistics —
    the reference's single global R-tree (RLS.py:161-181) laid over
    the mesh, in inference mode (RLS.act_test, RLS.py:120-157) — and
    slices the local env block back out.  The per-step collectives are
    one [B_local, 20] all-gather + one [B_global*A, 3] psum;
    everything else partitions cleanly.

    Returns (init_fn, run_fn) with the same call signatures as the
    single-device driver; ``keys``/env batch and store rows must divide
    the mesh size.  Results match the 1-device driver on the
    concatenated batch bit-for-bit on the integer gate outputs and to
    f32 reduction-order tolerance on the moments, INCLUDING runs whose
    envs differ across shards (jittered init uses per-env keys) —
    asserted by ``__graft_entry__.dryrun_multichip`` and
    ``tests/test_sharded_driver.py``.  Mid-run auto-resets draw jitter
    in per-shard blocks, so long jittered runs are
    distribution-equivalent (the statistics each env sees stay exact
    either way).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    init_fn, run_fn = make_gated_driver_fast(
        sc, env_cfg, wcfg, store_cfg=store_cfg, dtype=dtype,
        use_pallas=use_pallas, psum_axis=axis,
        pallas_interpret=pallas_interpret)

    def _lane_p(x):
        return P(*([None] * (max(getattr(x, "ndim", 1), 1) - 1) + [axis]))

    @jax.jit
    def init_sharded(keys):
        b = keys.shape[0]
        carry_shapes = jax.eval_shape(
            init_fn, jax.ShapeDtypeStruct((b,) + keys.shape[1:], keys.dtype))
        cspec = jax.tree.map(_lane_p, carry_shapes)
        f = shard_map(init_fn, mesh=mesh, in_specs=P(axis),
                      out_specs=cspec, check_vma=False)
        return f(keys)

    @jax.jit
    def run_sharded(carry, step_keys, store_keys, store_values, store_valid):
        cspec = jax.tree.map(_lane_p, carry)
        f = shard_map(
            run_fn, mesh=mesh,
            in_specs=(cspec, P(), P(axis), P(axis), P(axis)),
            out_specs=(cspec, (P(None, axis),) * 6),
            check_vma=False)
        return f(carry, step_keys, store_keys, store_values, store_valid)

    return init_sharded, run_sharded
