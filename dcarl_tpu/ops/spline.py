"""Natural cubic splines and arc-length parameterized 2-D reference
paths, vectorized for TPU.

Re-design of the reference's ``cubic_spline_planner.py`` (Spline /
Spline2D): identical math — natural boundary conditions, per-segment
cubic coefficients, chordal arc-length parameterization for 2-D — but
the spline is a pytree of coefficient arrays and evaluation is a
vectorized gather (``searchsorted`` + Horner), so an entire trajectory
lattice ([B, n_paths, n_t] query points) evaluates as one program.

Evaluation clamps to the knot range rather than returning None outside
it (the reference's ``calc`` returns None and callers drop those points;
under static shapes we clamp and let feasibility masks handle the tail).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CubicSpline1D(NamedTuple):
    """Piecewise cubic y(t) = a_i + b_i dx + c_i dx^2 + d_i dx^3 on
    [x_i, x_{i+1}]; coefficient layout matches cubic_spline_planner
    Spline.__init__."""

    x: jax.Array  # [N] knots
    a: jax.Array  # [N]   (y values)
    b: jax.Array  # [N-1]
    c: jax.Array  # [N]
    d: jax.Array  # [N-1]


def fit_natural_cubic(x: jax.Array, y: jax.Array) -> CubicSpline1D:
    """Natural cubic spline fit (c''=0 at both ends), solving the same
    tridiagonal system the reference builds densely
    (cubic_spline_planner.py:104-135)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    n = x.shape[0]
    h = jnp.diff(x)

    # Tridiagonal system A @ c = B with natural BC rows.
    main = jnp.concatenate([
        jnp.ones((1,), x.dtype),
        2.0 * (h[:-1] + h[1:]),
        jnp.ones((1,), x.dtype),
    ])
    zero = jnp.zeros((1,), x.dtype)
    lower = jnp.concatenate([zero, h[:-1], zero])  # A[i, i-1]; BC rows have none
    upper = jnp.concatenate([zero, h[1:], zero])   # A[i, i+1]; A[0,1]=0 natural BC
    rhs = jnp.concatenate([
        jnp.zeros((1,), x.dtype),
        3.0 * (y[2:] - y[1:-1]) / h[1:] - 3.0 * (y[1:-1] - y[:-2]) / h[:-1],
        jnp.zeros((1,), x.dtype),
    ])

    # Thomas algorithm as a scan (O(N), jit-friendly).
    def fwd(carry, inp):
        cp_prev, dp_prev = carry
        a_l, b_m, c_u, d_r = inp
        denom = b_m - a_l * cp_prev
        cp = c_u / denom
        dp = (d_r - a_l * dp_prev) / denom
        return (cp, dp), (cp, dp)

    inputs = (lower, main, upper, rhs)
    # row 0 handled by the init carry
    (_, _), (cps, dps) = jax.lax.scan(
        fwd, (jnp.zeros((), x.dtype), jnp.zeros((), x.dtype)),
        jax.tree.map(lambda v: v, inputs))

    def bwd(c_next, inp):
        cp, dp = inp
        c_i = dp - cp * c_next
        return c_i, c_i

    _, cs_rev = jax.lax.scan(bwd, jnp.zeros((), x.dtype), (cps, dps),
                             reverse=True)
    c = cs_rev

    b = (y[1:] - y[:-1]) / h - h * (c[1:] + 2.0 * c[:-1]) / 3.0
    d = (c[1:] - c[:-1]) / (3.0 * h)
    return CubicSpline1D(x=x, a=y, b=b, c=c, d=d)


def _segment_index(sp: CubicSpline1D, t: jax.Array) -> jax.Array:
    i = jnp.searchsorted(sp.x, t, side="right") - 1
    return jnp.clip(i, 0, sp.x.shape[0] - 2)


def spline_eval(sp: CubicSpline1D, t: jax.Array) -> jax.Array:
    i = _segment_index(sp, t)
    dx = t - sp.x[i]
    return sp.a[i] + sp.b[i] * dx + sp.c[i] * dx ** 2 + sp.d[i] * dx ** 3


def spline_d1(sp: CubicSpline1D, t: jax.Array) -> jax.Array:
    i = _segment_index(sp, t)
    dx = t - sp.x[i]
    return sp.b[i] + 2.0 * sp.c[i] * dx + 3.0 * sp.d[i] * dx ** 2


def spline_d2(sp: CubicSpline1D, t: jax.Array) -> jax.Array:
    i = _segment_index(sp, t)
    dx = t - sp.x[i]
    return 2.0 * sp.c[i] + 6.0 * sp.d[i] * dx


class RefPath(NamedTuple):
    """Arc-length parameterized 2-D path (Spline2D equivalent)."""

    s: jax.Array  # [N] chordal arc lengths
    sx: CubicSpline1D
    sy: CubicSpline1D

    @property
    def length(self) -> jax.Array:
        return self.s[-1]


def refpath_from_xy(x: jax.Array, y: jax.Array) -> RefPath:
    """Spline2D.__init__ (cubic_spline_planner.py:143-156)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    ds = jnp.sqrt(jnp.diff(x) ** 2 + jnp.diff(y) ** 2)
    s = jnp.concatenate([jnp.zeros((1,), x.dtype), jnp.cumsum(ds)])
    return RefPath(s=s, sx=fit_natural_cubic(s, x), sy=fit_natural_cubic(s, y))


def refpath_position(rp: RefPath, s: jax.Array) -> Tuple[jax.Array, jax.Array]:
    return spline_eval(rp.sx, s), spline_eval(rp.sy, s)


def refpath_pos_tangent(
    rp: RefPath, s: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(x, y, dx/ds, dy/ds) with ONE shared segment search — the x and y
    splines share their knot vector (rp.s), so the binary search and its
    gathers need not run four times (the planner evaluates position and
    tangent for every lattice point; this fusion is the hot path)."""
    sx, sy = rp.sx, rp.sy
    i = _segment_index(sx, s)
    dt = s - sx.x[i]
    x = sx.a[i] + (sx.b[i] + (sx.c[i] + sx.d[i] * dt) * dt) * dt
    y = sy.a[i] + (sy.b[i] + (sy.c[i] + sy.d[i] * dt) * dt) * dt
    dx = sx.b[i] + (2.0 * sx.c[i] + 3.0 * sx.d[i] * dt) * dt
    dy = sy.b[i] + (2.0 * sy.c[i] + 3.0 * sy.d[i] * dt) * dt
    return x, y, dx, dy


def refpath_yaw(rp: RefPath, s: jax.Array) -> jax.Array:
    return jnp.arctan2(spline_d1(rp.sy, s), spline_d1(rp.sx, s))


def refpath_curvature(rp: RefPath, s: jax.Array) -> jax.Array:
    dx, dy = spline_d1(rp.sx, s), spline_d1(rp.sy, s)
    ddx, ddy = spline_d2(rp.sx, s), spline_d2(rp.sy, s)
    return (ddy * dx - ddx * dy) / (dx ** 2 + dy ** 2)
