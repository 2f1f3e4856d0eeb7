"""PolylineTrajectory parity: keep-lane windows and hermite lane-change
blending (local_trajectory.py:13-112 semantics)."""

import numpy as np

import jax
import jax.numpy as jnp

from dcarl_tpu.planning import local_trajectory as LT


def _straight_lane(y=0.0, n=400, res=0.5):
    x = np.arange(n) * res
    return jnp.asarray(np.c_[x, np.full(n, y)], jnp.float32)


def test_keep_lane_window():
    lane = _straight_lane()
    out = LT.get_trajectory(lane, ego_x=10.0, ego_y=0.1, ego_yaw=0.0,
                            desired_speed=4.0, ego_lane_index=0.0,
                            target_lane_index=0.0)
    assert not bool(out.lane_change)
    pts = np.asarray(out.points)
    # window starts at ego's projection and follows the centerline
    assert abs(pts[0, 0] - 10.0) <= 0.5
    np.testing.assert_allclose(pts[:, 1], 0.0, atol=1e-5)
    assert (np.diff(pts[:, 0]) >= -1e-6).all()
    # horizon = v*time_ahead + distance_ahead = 30 m -> clamp afterwards
    assert pts[-1, 0] <= 10.0 + 30.0 + 0.5 + 1e-5


def test_lane_change_hermite():
    target = _straight_lane(y=3.5)
    out = LT.get_trajectory(target, ego_x=20.0, ego_y=0.0, ego_yaw=0.0,
                            desired_speed=5.0, ego_lane_index=0.0,
                            target_lane_index=1.0)
    assert bool(out.lane_change)
    pts = np.asarray(out.points)
    # starts at the ego position, ends on the target centerline
    np.testing.assert_allclose(pts[0], [20.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(pts[-1, 1], 3.5, atol=1e-4)
    # lateral motion is monotone towards the target lane (smooth blend)
    y = pts[:, 1]
    assert (np.diff(y) >= -5e-2).all()
    # lc distance = max(|Δlane|*1.5s * 5 m/s, 6) = 7.5 m
    i_end = LT.HERMITE_PTS - 1
    assert abs(pts[i_end, 0] - 27.5) < 1.0
    # start tangent respects ego yaw
    d0 = pts[1] - pts[0]
    assert abs(np.arctan2(d0[1], d0[0])) < 0.3


def test_reference_path_follow_mode():
    # target_lane_index == -1: rectify_dt = dis / 2.67 (junction mode)
    ref = _straight_lane(y=4.0)
    out = LT.get_trajectory(ref, ego_x=0.0, ego_y=0.0, ego_yaw=0.0,
                            desired_speed=4.0, ego_lane_index=0.0,
                            target_lane_index=-1.0)
    assert bool(out.lane_change)
    pts = np.asarray(out.points)
    np.testing.assert_allclose(pts[-1, 1], 4.0, atol=1e-4)


def test_jit_vmap_batched():
    lane = _straight_lane(y=3.5)

    @jax.jit
    def run(xs):
        return jax.vmap(lambda x: LT.get_trajectory(
            lane, x, 0.0, 0.0, 5.0, 0.0, 1.0).points)(xs)

    out = np.asarray(run(jnp.asarray([5.0, 20.0, 40.0])))
    assert out.shape == (3, 64, 2)
    assert np.isfinite(out).all()
