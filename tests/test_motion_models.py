"""Motion-model parity vs the reference semantics
(zzz_common/dynamic_models.py) and the JAX fresnel vs scipy."""

import numpy as np
import pytest
import scipy.special

import jax
import jax.numpy as jnp

from dcarl_tpu.ops import motion_models as mm


def test_fresnel_matches_scipy():
    x = np.concatenate([
        np.linspace(-12.0, 12.0, 4001),
        np.array([0.0, 1e-8, -1e-8, 3.1999, 3.2001, 100.0, -57.3]),
    ])
    s_ref, c_ref = scipy.special.fresnel(x)
    s, c = jax.jit(mm.fresnel)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(s), s_ref, atol=5e-8)
    np.testing.assert_allclose(np.asarray(c), c_ref, atol=5e-8)


def _ref_ctra(state, dt):
    # reference semantics, dynamic_models.py:46-71
    x, y, th, v, a, w = state
    nth = (th + w * dt + np.pi) % (2 * np.pi) - np.pi
    nv = v + a * dt
    if np.isclose(w, 0):
        nx = x + (nv + v) / 2 * np.cos(th) * dt
        ny = y + (nv + v) / 2 * np.sin(th) * dt
    else:
        nx = x + (nv * w * np.sin(nth) + a * np.cos(nth)
                  - v * w * np.sin(th) - a * np.cos(th)) / (w * w)
        ny = y + (-nv * w * np.cos(nth) + a * np.sin(nth)
                  + v * w * np.cos(th) - a * np.sin(th)) / (w * w)
    out = np.array(state, dtype=float)
    out[:4] = (nx, ny, nth, nv)
    return out


def _ref_csaa(state, dt):
    # reference semantics incl. literal precedence, dynamic_models.py:73-104
    x, y, th, v, a, c = state
    gamma1 = (c * v * v) / (4 * a) + th
    gamma2 = c * dt * v + c * dt * dt * a - th
    eta = np.sqrt(2 * np.pi) * v * c
    zeta1 = (2 * a * dt + v) * np.sqrt(c / 2 * a * np.pi)
    zeta2 = v * np.sqrt(c / 2 * a * np.pi)
    sz1, cz1 = scipy.special.fresnel(zeta1)
    sz2, cz2 = scipy.special.fresnel(zeta2)
    nx = x + (eta * (np.cos(gamma1) * cz1 + np.sin(gamma1) * sz1
                     - np.cos(gamma1) * cz2 - np.sin(gamma1) * sz2)
              + 2 * np.sin(gamma2) * np.sqrt(a * c)
              + 2 * np.sin(th) * np.sqrt(a * c)) / 4 * np.sqrt(a * c) * c
    ny = y + (eta * (-np.cos(gamma1) * sz1 + np.sin(gamma1) * cz1
                     - np.sin(gamma1) * cz2 - np.cos(gamma1) * sz2)
              + 2 * np.cos(gamma2) * np.sqrt(a * c)
              - 2 * np.sin(th) * np.sqrt(a * c)) / 4 * np.sqrt(a * c) * c
    nth = (th - c * dt * dt * a / 2 - c * dt * v + np.pi) % (2 * np.pi) - np.pi
    nv = v + a * dt
    out = np.array(state, dtype=float)
    out[:4] = (nx, ny, nth, nv)
    return out


def test_cv_and_br():
    s = jnp.asarray([[1.0, 2.0, 3.0, -4.0], [0.0, 0.0, 1.0, 1.0]])
    out = mm.motion_cv(s, 0.5)
    np.testing.assert_allclose(np.asarray(out),
                               [[2.5, 0.0, 3.0, -4.0],
                                [0.5, 0.5, 1.0, 1.0]])
    np.testing.assert_allclose(np.asarray(mm.motion_br(s, 0.5)),
                               np.asarray(s))


def test_ca_consistent_with_cv_at_zero_accel():
    s6 = jnp.asarray([1.0, 2.0, 3.0, -4.0, 0.0, 0.0])
    out = mm.motion_ca(s6, 0.7)
    np.testing.assert_allclose(np.asarray(out[:4]),
                               np.asarray(mm.motion_cv(s6[:4], 0.7)))
    s6a = jnp.asarray([0.0, 0.0, 1.0, 0.0, 2.0, -1.0])
    out = mm.motion_ca(s6a, 2.0)
    np.testing.assert_allclose(np.asarray(out),
                               [6.0, -2.0, 5.0, -2.0, 2.0, -1.0])


@pytest.mark.parametrize("w", [0.0, 1e-12, 0.3, -0.7])
def test_ctra_matches_reference(w):
    rng = np.random.default_rng(3)
    for _ in range(10):
        st = np.array([rng.normal(), rng.normal(),
                       rng.uniform(-3, 3), rng.uniform(0, 20),
                       rng.normal(0, 2), w])
        ref = _ref_ctra(st, 0.1)
        got = np.asarray(mm.motion_ctra(jnp.asarray(st), 0.1))
        np.testing.assert_allclose(got, ref, atol=1e-9)


def test_ctra_batched_jit():
    rng = np.random.default_rng(4)
    st = rng.normal(size=(32, 6))
    step = jax.jit(lambda s: mm.motion_ctra(s, 0.05))
    out = np.asarray(step(jnp.asarray(st)))
    ref = np.stack([_ref_ctra(s, 0.05) for s in st])
    np.testing.assert_allclose(out, ref, atol=1e-9)
    assert not np.isnan(out).any()


def test_ctrv_limits():
    st = jnp.asarray([0.0, 0.0, 0.0, 10.0, 0.0])
    out = np.asarray(mm.motion_ctrv(st, 1.0))
    np.testing.assert_allclose(out, [10.0, 0.0, 0.0, 10.0, 0.0], atol=1e-12)
    # quarter circle: w=pi/2 over 1s, v=r*w
    r = 4.0
    st = jnp.asarray([0.0, 0.0, 0.0, r * np.pi / 2, np.pi / 2])
    out = np.asarray(mm.motion_ctrv(st, 1.0))
    np.testing.assert_allclose(out[:2], [r, r], atol=1e-9)


def test_csaa_matches_reference():
    rng = np.random.default_rng(5)
    for _ in range(10):
        st = np.array([rng.normal(), rng.normal(),
                       rng.uniform(-1, 1), rng.uniform(1, 15),
                       rng.uniform(0.5, 3.0), rng.uniform(0.01, 0.2)])
        ref = _ref_csaa(st, 0.1)
        got = np.asarray(mm.motion_csaa(jnp.asarray(st), 0.1))
        np.testing.assert_allclose(got, ref, atol=1e-6)
