"""Unit tests for the batched geometry/spline/polynomial kernels against
straightforward numpy oracles (the validation strategy SURVEY.md §7
prescribes for the branch-heavy vectorized geometry)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcarl_tpu.ops import geometry as G
from dcarl_tpu.ops import polynomial as P
from dcarl_tpu.ops import spline as S


def random_polyline(rng, n):
    # random smooth-ish walk, no repeated points
    steps = rng.normal(1.0, 0.4, (n - 1, 2))
    return np.concatenate([[[0.0, 0.0]], np.cumsum(steps, axis=0)])


def test_wrap_angle():
    # avoid exactly +/-pi: both signs are the same angle and XLA/numpy
    # mod may differ in which representative they return there
    th = jnp.asarray([0.0, 3.1, -3.1, 3 * np.pi, -2.5 * np.pi, 0.3, 7.0])
    out = np.asarray(G.wrap_angle(th))
    expect = (np.asarray(th) + np.pi) % (2 * np.pi) - np.pi
    np.testing.assert_allclose(out, expect, atol=1e-12)
    assert np.all(out >= -np.pi) and np.all(out < np.pi + 1e-12)


def test_project_point_to_polyline_matches_oracle():
    rng = np.random.default_rng(0)
    for trial in range(30):
        n = rng.integers(3, 40)
        line = random_polyline(rng, n)
        p = rng.normal(0, 1, 2) + line[rng.integers(0, n)]
        got = G.project_point_to_polyline(jnp.asarray(p), jnp.asarray(line))
        want = G.project_point_to_polyline_np(p[0], p[1], line)
        assert int(got.closest_idx) == want[1], trial
        assert int(got.closest_type) == want[2], trial
        np.testing.assert_allclose(float(got.distance), want[0], atol=1e-9)
        np.testing.assert_allclose(float(got.dist_start), want[3], atol=1e-9)
        np.testing.assert_allclose(float(got.dist_end), want[4], atol=1e-9)


def test_project_points_batched():
    rng = np.random.default_rng(1)
    line = random_polyline(rng, 25)
    pts = rng.normal(0, 3, (64, 2)) + line.mean(0)
    got = G.project_points_to_polyline(jnp.asarray(pts), jnp.asarray(line))
    for i in range(64):
        want = G.project_point_to_polyline_np(pts[i, 0], pts[i, 1], line)
        np.testing.assert_allclose(float(got.distance[i]), want[0], atol=1e-9)
        np.testing.assert_allclose(float(got.dist_start[i]), want[3], atol=1e-9)


def test_frenet_roundtrip_on_straight_line():
    line = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0]])
    f = G.cartesian_to_frenet(5.0, 2.0, 3.0, 1.0, 0.1, line)
    assert float(f.s) == pytest.approx(5.0)
    # positive lateral side per the reference's dl sign convention
    assert abs(float(f.d)) == pytest.approx(2.0)
    assert float(f.vs) == pytest.approx(3.0)
    assert abs(float(f.vd)) == pytest.approx(1.0)
    assert float(f.psi) == pytest.approx(0.1)


def test_ego_frame_transform():
    # matches Planning_library/coordinates.py __main__ example
    x, y, vx, vy, yaw = G.transfer_to_ego_frame(
        10.0, 10.0, -1.0, 1.0, 0.75 * np.pi, 5.0, 10.0, 0.25 * np.pi)
    np.testing.assert_allclose(
        [float(x), float(y), float(vx), float(vy), float(yaw)],
        [3.5355339059, -3.5355339059, 0.0, 1.4142135624, 0.5 * np.pi],
        atol=1e-9)


def test_dense_polyline_np_and_resample():
    rng = np.random.default_rng(2)
    line = random_polyline(rng, 12)
    dense = G.dense_polyline2d_np(line, 0.5)
    # spacing at most resolution (up to rounding), endpoints preserved
    gaps = np.linalg.norm(np.diff(dense, axis=0), axis=1)
    assert gaps.max() < 0.75
    np.testing.assert_allclose(dense[0], line[0], atol=1e-12)
    np.testing.assert_allclose(dense[-1], line[-1], atol=1e-12)

    res = np.asarray(G.resample_polyline(jnp.asarray(line), 64))
    assert res.shape == (64, 2)
    np.testing.assert_allclose(res[0], line[0], atol=1e-9)
    np.testing.assert_allclose(res[-1], line[-1], atol=1e-9)


def _reference_spline_c(x, y):
    """Dense natural-spline system exactly as cubic_spline_planner builds
    it, solved with np.linalg.solve (the oracle)."""
    nx = len(x)
    h = np.diff(x)
    A = np.zeros((nx, nx))
    A[0, 0] = 1.0
    for i in range(nx - 1):
        if i != nx - 2:
            A[i + 1, i + 1] = 2.0 * (h[i] + h[i + 1])
        A[i + 1, i] = h[i]
        A[i, i + 1] = h[i]
    A[0, 1] = 0.0
    A[nx - 1, nx - 2] = 0.0
    A[nx - 1, nx - 1] = 1.0
    B = np.zeros(nx)
    for i in range(nx - 2):
        B[i + 1] = 3.0 * (y[i + 2] - y[i + 1]) / h[i + 1] - \
            3.0 * (y[i + 1] - y[i]) / h[i]
    return np.linalg.solve(A, B)


def test_cubic_spline_matches_reference_solver():
    rng = np.random.default_rng(3)
    x = np.sort(rng.uniform(0, 50, 20))
    x[0], y = 0.0, rng.normal(0, 5, 20)
    sp = S.fit_natural_cubic(jnp.asarray(x), jnp.asarray(y))
    c_ref = _reference_spline_c(x, y)
    np.testing.assert_allclose(np.asarray(sp.c), c_ref, atol=1e-9)

    # interpolation exact at the knots, continuous derivative
    at_knots = np.asarray(S.spline_eval(sp, jnp.asarray(x[:-1] + 1e-12)))
    np.testing.assert_allclose(at_knots, y[:-1], atol=1e-6)
    ts = np.linspace(0, x[-1] - 1e-6, 200)
    v = np.asarray(S.spline_eval(sp, jnp.asarray(ts)))
    assert np.all(np.isfinite(v))


def test_refpath_yaw_curvature_on_circle():
    th = np.linspace(0, np.pi, 100)
    R = 20.0
    rp = S.refpath_from_xy(jnp.asarray(R * np.cos(th)), jnp.asarray(R * np.sin(th)))
    s_mid = rp.s[-1] * 0.5
    k = float(S.refpath_curvature(rp, s_mid))
    assert k == pytest.approx(1.0 / R, rel=0.02)  # CCW circle: positive curvature
    x, y = S.refpath_position(rp, s_mid)
    assert float(jnp.hypot(x, y)) == pytest.approx(R, rel=1e-3)


def test_quintic_matches_linear_solve():
    rng = np.random.default_rng(4)
    for _ in range(20):
        xs, vxs, axs, xe, vxe, axe = rng.normal(0, 5, 6)
        T = rng.uniform(1.0, 6.0)
        c = P.solve_quintic(xs, vxs, axs, xe, vxe, axe, T)
        A = np.array([[T ** 3, T ** 4, T ** 5],
                      [3 * T ** 2, 4 * T ** 3, 5 * T ** 4],
                      [6 * T, 12 * T ** 2, 20 * T ** 3]])
        b = np.array([xe - xs - vxs * T - axs / 2 * T ** 2,
                      vxe - vxs - axs * T,
                      axe - axs])
        sol = np.linalg.solve(A, b)
        np.testing.assert_allclose([float(c.a3), float(c.a4), float(c.a5)],
                                   sol, atol=1e-8)
        # boundary conditions hold
        np.testing.assert_allclose(float(P.quintic_eval(c, T)), xe, atol=1e-8)
        np.testing.assert_allclose(float(P.quintic_d1(c, T)), vxe, atol=1e-8)
        np.testing.assert_allclose(float(P.quintic_d2(c, T)), axe, atol=1e-7)


def test_quartic_matches_linear_solve():
    rng = np.random.default_rng(5)
    for _ in range(20):
        xs, vxs, axs, vxe, axe = rng.normal(0, 5, 5)
        T = rng.uniform(1.0, 6.0)
        c = P.solve_quartic(xs, vxs, axs, vxe, axe, T)
        A = np.array([[3 * T ** 2, 4 * T ** 3],
                      [6 * T, 12 * T ** 2]])
        b = np.array([vxe - vxs - axs * T, axe - axs])
        sol = np.linalg.solve(A, b)
        np.testing.assert_allclose([float(c.a3), float(c.a4)], sol, atol=1e-8)
        np.testing.assert_allclose(float(P.quartic_d1(c, T)), vxe, atol=1e-8)
        np.testing.assert_allclose(float(P.quartic_d2(c, T)), axe, atol=1e-7)


def test_polynomials_batched():
    rng = np.random.default_rng(6)
    shape = (5, 1, 2)
    args = [jnp.asarray(rng.normal(0, 3, shape)) for _ in range(6)]
    T = jnp.asarray(rng.uniform(2, 5, shape))
    c = P.solve_quintic(*args, T)
    c_b = jax.tree.map(lambda a: a[..., None], c)  # broadcast over time axis
    t = jnp.linspace(0.0, 2.0, 14)
    vals = P.quintic_eval(c_b, t[None, None, None, :])
    assert vals.shape == (5, 1, 2, 14)
    assert bool(jnp.all(jnp.isfinite(vals)))
