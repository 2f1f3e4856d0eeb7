"""Batched motion models for tracking/prediction.

Re-design of the reference's ``zzz_common.dynamic_models`` (Cython/ROS
stack: Field_testing/.../library/src/zzz_common/dynamic_models.py:11-104)
as vectorized, jit-friendly JAX functions:

- ``motion_br``    Brownian (identity mean)
- ``motion_cv``    constant velocity                  [x, y, vx, vy]
- ``motion_ca``    constant acceleration              [x, y, vx, vy, ax, ay]
- ``motion_ctrv``  constant turn-rate & velocity      [x, y, th, v, w]
- ``motion_ctra``  constant turn-rate & acceleration  [x, y, th, v, a, w]
- ``motion_csaa``  constant steering angle & accel.   [x, y, th, v, a, c]
                   (clothoid step via Fresnel integrals)

The reference leaves CA/CTRV as ``NotImplementedError``; they are
implemented here (strict superset).  All functions take ``state`` with
an arbitrary batch prefix ``[..., D]`` and a scalar ``dt`` and are safe
under ``jit``/``vmap`` — the near-zero turn-rate branch is a masked
``jnp.where`` with poisoned denominators rather than Python control
flow.

``fresnel`` is a from-scratch JAX implementation (power series +
asymptotic expansion) because neither jax.scipy nor TPU runtimes ship
one; it is validated against ``scipy.special.fresnel`` in
tests/test_motion_models.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .geometry import wrap_angle

__all__ = [
    "fresnel", "motion_br", "motion_cv", "motion_ca", "motion_ctrv",
    "motion_ctra", "motion_csaa",
]

_SERIES_TERMS = 36
_ASYMPTOTIC_TERMS = 8
_CROSSOVER = 3.2  # |x| below → power series, above → asymptotic


def _fresnel_series(x):
    """Power series (A&S 7.3.11/12), accurate to f64 roundoff for
    |x| <= ~3.5 (alternating terms peak ~1e6 ⇒ ~1e-10 after
    cancellation)."""
    u = 0.5 * jnp.pi * x * x
    u2 = u * u

    def body(n, carry):
        s, c, a, b = carry
        # a_n = (-1)^n u^{2n} / (2n)!   ; C = x Σ a_n/(4n+1)
        # b_n = (-1)^n u^{2n+1}/(2n+1)! ; S = x Σ b_n/(4n+3)
        c = c + a / (4.0 * n + 1.0)
        s = s + b / (4.0 * n + 3.0)
        a = -a * u2 / ((2.0 * n + 1.0) * (2.0 * n + 2.0))
        b = -b * u2 / ((2.0 * n + 2.0) * (2.0 * n + 3.0))
        return s, c, a, b

    zero = jnp.zeros_like(x)
    s, c, _, _ = jax.lax.fori_loop(
        0, _SERIES_TERMS, body,
        (zero, zero, jnp.ones_like(x), u))
    return x * s, x * c


def _fresnel_asymptotic(x):
    """Large-|x| expansion (A&S 7.3.27/28):
    C = 1/2 + f sin(u) - g cos(u), S = 1/2 - f cos(u) - g sin(u),
    f ~ (1/pi x) Σ (-1)^m (4m-1)!!/(pi x^2)^{2m},
    g ~ (1/pi x) Σ (-1)^m (4m+1)!!/(pi x^2)^{2m+1}."""
    u = 0.5 * jnp.pi * x * x
    z = jnp.maximum(jnp.pi * x * x, 1e-30)
    inv_z2 = 1.0 / (z * z)

    f = jnp.zeros_like(x)
    g = jnp.zeros_like(x)
    tf = jnp.ones_like(x)           # (4m-1)!!/z^{2m}, m=0 → 1
    tg = 1.0 / z                    # (4m+1)!!/z^{2m+1}, m=0 → 1/z
    sign = 1.0
    dfac_f, dfac_g = 1.0, 1.0       # running double factorials
    for m in range(_ASYMPTOTIC_TERMS):
        f = f + sign * tf
        g = g + sign * tg
        # (4m+3)!! = (4m-1)!! * (4m+1)(4m+3);  (4m+5)!! similar
        tf = tf * (4.0 * m + 1.0) * (4.0 * m + 3.0) * inv_z2
        tg = tg * (4.0 * m + 3.0) * (4.0 * m + 5.0) * inv_z2
        sign = -sign
    pix = jnp.pi * jnp.maximum(jnp.abs(x), 1e-30)
    f = f / pix
    g = g / pix
    su, cu = jnp.sin(u), jnp.cos(u)
    c = 0.5 + f * su - g * cu
    s = 0.5 - f * cu - g * su
    return s, c


def fresnel(x):
    """Fresnel integrals ``(S(x), C(x))`` with the scipy convention
    S(x)=∫₀ˣ sin(πt²/2)dt, C(x)=∫₀ˣ cos(πt²/2)dt.  Elementwise, odd in
    x, abs error ≲3e-8 (f64) over the real line."""
    x = jnp.asarray(x)
    ax = jnp.abs(x)
    # poison each branch's out-of-domain inputs to benign values
    s_ser, c_ser = _fresnel_series(jnp.minimum(ax, _CROSSOVER))
    s_asy, c_asy = _fresnel_asymptotic(jnp.maximum(ax, _CROSSOVER))
    big = ax > _CROSSOVER
    s = jnp.where(big, s_asy, s_ser)
    c = jnp.where(big, c_asy, c_ser)
    return jnp.sign(x) * s, jnp.sign(x) * c


def motion_br(state, dt):
    """Brownian motion: mean unchanged (dynamic_models.py:11-21)."""
    del dt
    return jnp.asarray(state)


def motion_cv(state, dt):
    """Constant velocity over [..., (x, y, vx, vy, ...)]
    (dynamic_models.py:24-38)."""
    state = jnp.asarray(state)
    return state.at[..., 0].add(state[..., 2] * dt) \
                .at[..., 1].add(state[..., 3] * dt)


def motion_ca(state, dt):
    """Constant acceleration over [..., (x, y, vx, vy, ax, ay)].
    Reference stub (dynamic_models.py:40) — implemented here."""
    state = jnp.asarray(state)
    ax_, ay_ = state[..., 4], state[..., 5]
    return state.at[..., 0].add(state[..., 2] * dt + 0.5 * ax_ * dt * dt) \
                .at[..., 1].add(state[..., 3] * dt + 0.5 * ay_ * dt * dt) \
                .at[..., 2].add(ax_ * dt) \
                .at[..., 3].add(ay_ * dt)


def motion_ctrv(state, dt):
    """Constant turn-rate and velocity over [..., (x, y, th, v, w)].
    Reference stub (dynamic_models.py:43) — implemented here; the
    straight-line limit is the masked w→0 branch."""
    state = jnp.asarray(state)
    x, y, th, v, w = (state[..., i] for i in range(5))
    nth = wrap_angle(th + w * dt)
    straight = jnp.abs(w) < 1e-8
    w_safe = jnp.where(straight, 1.0, w)
    nx = jnp.where(straight,
                   x + v * jnp.cos(th) * dt,
                   x + v / w_safe * (jnp.sin(nth) - jnp.sin(th)))
    ny = jnp.where(straight,
                   y + v * jnp.sin(th) * dt,
                   y - v / w_safe * (jnp.cos(nth) - jnp.cos(th)))
    return state.at[..., 0].set(nx).at[..., 1].set(ny).at[..., 2].set(nth)


def motion_ctra(state, dt):
    """Constant turn-rate and acceleration over
    [..., (x, y, th, v, a, w)] (dynamic_models.py:46-71).  The
    reference's ``np.isclose(w, 0)`` Python branch becomes a masked
    ``where`` with a poisoned denominator."""
    state = jnp.asarray(state)
    x, y, th, v, a, w = (state[..., i] for i in range(6))
    nth = wrap_angle(th + w * dt)
    nv = v + a * dt
    straight = jnp.abs(w) < 1e-8
    w_safe = jnp.where(straight, 1.0, w)
    ww = w_safe * w_safe
    sin_nth, cos_nth = jnp.sin(nth), jnp.cos(nth)
    sin_th, cos_th = jnp.sin(th), jnp.cos(th)
    nx_turn = x + (nv * w_safe * sin_nth + a * cos_nth
                   - v * w_safe * sin_th - a * cos_th) / ww
    ny_turn = y + (-nv * w_safe * cos_nth + a * sin_nth
                   + v * w_safe * cos_th - a * sin_th) / ww
    nx_str = x + 0.5 * (nv + v) * cos_th * dt
    ny_str = y + 0.5 * (nv + v) * sin_th * dt
    nx = jnp.where(straight, nx_str, nx_turn)
    ny = jnp.where(straight, ny_str, ny_turn)
    return state.at[..., 0].set(nx).at[..., 1].set(ny) \
                .at[..., 2].set(nth).at[..., 3].set(nv)


def motion_csaa(state, dt):
    """Constant steering angle and acceleration (clothoid) over
    [..., (x, y, th, v, a, c)] (dynamic_models.py:73-104).  Faithful to
    the reference expression including its literal operator precedence
    (the trailing ``/ 4*sqrt(a*c)*c`` multiplies, it does not divide) —
    validated term-for-term in tests/test_motion_models.py."""
    state = jnp.asarray(state)
    x, y, th, v, a, c = (state[..., i] for i in range(6))
    gamma1 = (c * v * v) / (4.0 * a) + th
    gamma2 = c * dt * v + c * dt * dt * a - th
    eta = jnp.sqrt(2.0 * jnp.pi) * v * c
    root = jnp.sqrt(c / 2.0 * a * jnp.pi)
    sz1, cz1 = fresnel((2.0 * a * dt + v) * root)
    sz2, cz2 = fresnel(v * root)
    sac = jnp.sqrt(a * c)
    cg1, sg1 = jnp.cos(gamma1), jnp.sin(gamma1)
    nx = x + (eta * (cg1 * cz1 + sg1 * sz1 - cg1 * cz2 - sg1 * sz2)
              + 2.0 * jnp.sin(gamma2) * sac
              + 2.0 * jnp.sin(th) * sac) / 4.0 * sac * c
    ny = y + (eta * (-cg1 * sz1 + sg1 * cz1 - sg1 * cz2 - cg1 * sz2)
              + 2.0 * jnp.cos(gamma2) * sac
              - 2.0 * jnp.sin(th) * sac) / 4.0 * sac * c
    nth = wrap_angle(th - c * dt * dt * a / 2.0 - c * dt * v)
    nv = v + a * dt
    return state.at[..., 0].set(nx).at[..., 1].set(ny) \
                .at[..., 2].set(nth).at[..., 3].set(nv)
