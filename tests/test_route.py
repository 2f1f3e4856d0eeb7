"""Route planner semantics (route_planner.py re-design): rolling
windows, cursor purge, hazards."""

import numpy as np

import jax
import jax.numpy as jnp

from dcarl_tpu.navigation import route as R


def _l_route():
    # straight 100 m east, then 90-degree left turn north for 100 m
    a = np.c_[np.linspace(0, 100, 21), np.zeros(21)]
    b = np.c_[np.full(20, 100.0), np.linspace(5, 100, 20)]
    return R.make_route(np.vstack([a, b]))


def test_make_route_sampling_and_options():
    r = _l_route()
    wp = np.asarray(r.waypoints)
    seg = np.linalg.norm(np.diff(wp, axis=0), axis=1)
    assert np.all(seg <= R.SAMPLING_RADIUS * 1.1)  # ~uniform resample
    opts = np.asarray(r.options)
    assert (opts == int(R.RoadOption.LEFT)).sum() >= 1   # the turn
    assert (opts == int(R.RoadOption.LANEFOLLOW)).sum() > 30


def test_advance_and_window_roll_forward():
    r = _l_route()
    w0, _ = R.window(r, 5)
    np.testing.assert_allclose(np.asarray(w0)[0], [0.0, 0.0], atol=1e-5)
    r = R.advance(r, 30.0, 0.0)
    w1, _ = R.window(r, 5)
    assert np.asarray(w1)[0, 0] >= 25.0   # passed waypoints purged
    # cursor is monotone: driving backwards does not rewind
    r2 = R.advance(r, 0.0, 0.0)
    assert int(r2.cursor) >= int(r.cursor)
    # remaining distance shrinks as we advance
    assert float(R.distance_remaining(r)) < float(
        R.distance_remaining(_l_route()))


def test_advance_is_jittable_batched():
    r = _l_route()

    @jax.jit
    def roll(route, xs):
        def body(rt, x):
            rt = R.advance(rt, x, 0.0)
            return rt, R.window(rt, 4)[0]
        return jax.lax.scan(body, route, xs)

    _, wins = roll(r, jnp.linspace(0.0, 90.0, 10))
    assert wins.shape == (10, 4, 2)
    assert np.isfinite(np.asarray(wins)).all()


def test_vehicle_hazard():
    r = _l_route()
    r = R.advance(r, 10.0, 0.0)
    veh = jnp.asarray([[20.0, 0.5], [20.0, 10.0], [5.0, 0.0]], jnp.float32)
    ok = jnp.asarray([True, True, True])
    assert bool(R.hazard_vehicle_ahead(r, 10.0, 0.0, veh, ok))
    # only the off-lane and behind vehicles -> no hazard
    assert not bool(R.hazard_vehicle_ahead(
        r, 10.0, 0.0, veh, jnp.asarray([False, True, True])))
    # far vehicle -> no hazard
    far = jnp.asarray([[80.0, 0.0]], jnp.float32)
    assert not bool(R.hazard_vehicle_ahead(r, 10.0, 0.0, far,
                                           jnp.asarray([True])))


def test_red_light_hazard():
    r = _l_route()
    lights = jnp.asarray([[12.0, 0.0]], jnp.float32)
    assert bool(R.hazard_red_light(r, 5.0, 0.0, lights,
                                   jnp.asarray([True])))
    assert not bool(R.hazard_red_light(r, 5.0, 0.0, lights,
                                       jnp.asarray([False])))
