"""Werling lattice, prediction/collision, controller and rollout tests
(reference semantics: JunctionTrajectoryPlanner.py, predict.py,
controller.py, dqn_value_collect.py)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcarl_tpu.config import EnvConfig, WerlingConfig
from dcarl_tpu.control import controller as ctl
from dcarl_tpu.env.scenario import t_intersection
from dcarl_tpu.ops import spline as spl
from dcarl_tpu.planning import werling as W
from dcarl_tpu.planning.predictor import check_collision_free, predict_obstacles
from dcarl_tpu.planning.rollout import make_collector, make_rule_driver

WCFG = WerlingConfig()


def straight_refpath(length=200.0, n=101):
    x = jnp.linspace(0.0, length, n)
    y = jnp.zeros(n)
    rp = spl.refpath_from_xy(x, y)
    line = jnp.stack([x, y], axis=1)
    return rp, line


def test_lattice_shapes_and_grid():
    assert WCFG.d_offsets == (-4.0, -2.0, 0.0, 2.0, 4.0)
    assert len(WCFG.horizons) == 1 and abs(WCFG.horizons[0] - 4.0) < 1e-9
    assert len(WCFG.target_speeds) == 2
    assert WCFG.num_paths == 10
    assert WCFG.n_time_steps == 13  # arange(0, 4.0, 0.3)

    rp, line = straight_refpath()
    start = W.FrenetStart(s0=jnp.float64(10.0), c_d=jnp.float64(0.0),
                          c_d_d=jnp.float64(0.0), c_d_dd=jnp.float64(0.0),
                          c_speed=jnp.float64(5.0))
    lat = W.plan(rp, start, WCFG)
    assert lat.x.shape == (10, 13)
    assert lat.cf.shape == (10,)
    assert bool(jnp.all(lat.feasible))

    # lateral offsets approach their targets (quintic BC at T=4.0 but the
    # grid ends at 3.9, so near-target); d-major enumeration order
    d_end = np.asarray(lat.d[:, -1]).reshape(5, 2)
    for i, d_off in enumerate(WCFG.d_offsets):
        np.testing.assert_allclose(d_end[i], d_off, atol=0.05)

    # terminal speeds near target-speed samples
    sd_end = np.asarray(lat.s_d[:, -1]).reshape(5, 2)
    np.testing.assert_allclose(sd_end[0], WCFG.target_speeds, atol=0.15)


def test_global_conversion_straight_line():
    """On a straight x-axis path the lattice normal is +y (yaw+90deg),
    so global y equals the lateral offset d."""
    rp, line = straight_refpath()
    start = W.FrenetStart(*map(jnp.float64, (20.0, 1.0, 0.0, 0.0, 6.0)))
    lat = W.plan(rp, start, WCFG)
    np.testing.assert_allclose(np.asarray(lat.y), np.asarray(lat.d),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(lat.x), np.asarray(lat.s),
                               atol=1e-6)


def test_collision_gating_changes_rule_pick():
    rp, line = straight_refpath()
    start = W.FrenetStart(*map(jnp.float64, (0.0, 0.0, 0.0, 0.0, 8.0)))
    lat = W.plan(rp, start, WCFG)

    # no obstacles -> min-cost index + 1
    no_obs = predict_obstacles(jnp.zeros((1, 5)), jnp.zeros((1,), bool), WCFG)
    idx_free, free = W.rule_trajectory_index(lat, no_obs, WCFG)
    assert bool(jnp.all(free))
    assert int(idx_free) == int(jnp.argmin(lat.cf)) + 1

    # stationary obstacle parked on the d=0 path ahead
    blocker = jnp.asarray([[20.0, 0.0, 0.0, 0.0, 0.0]])
    pred = predict_obstacles(blocker, jnp.ones((1,), bool), WCFG)
    idx_blocked, free_b = W.rule_trajectory_index(lat, pred, WCFG)
    assert not bool(free_b[int(idx_free) - 1])       # old pick now collides
    assert int(idx_blocked) != int(idx_free)
    # the new pick is the cheapest collision-free feasible path
    ok = np.asarray(lat.feasible & free_b)
    costs = np.where(ok, np.asarray(lat.cf), np.inf)
    assert int(idx_blocked) == int(np.argmin(costs)) + 1


def test_all_blocked_gives_brake():
    rp, line = straight_refpath()
    start = W.FrenetStart(*map(jnp.float64, (0.0, 0.0, 0.0, 0.0, 8.0)))
    lat = W.plan(rp, start, WCFG)
    # deep wall of obstacles across every lateral offset (deep in x so
    # the reference's stride-2 time sampling cannot thread between rows)
    gx, gy = jnp.meshgrid(jnp.linspace(6.0, 20.0, 8), jnp.linspace(-6.0, 6.0, 9))
    n = gx.size
    wall = jnp.stack([gx.ravel(), gy.ravel(), jnp.zeros(n), jnp.zeros(n),
                      jnp.zeros(n)], axis=1)
    pred = predict_obstacles(wall, jnp.ones((n,), bool), WCFG)
    idx, free = W.rule_trajectory_index(lat, pred, WCFG)
    assert int(idx) == 0

    traj = W.trajectory_by_index(lat, idx)
    np.testing.assert_allclose(np.asarray(traj.desired_speed), 0.0)


def test_trajectory_by_index_maps_to_lattice():
    rp, line = straight_refpath()
    start = W.FrenetStart(*map(jnp.float64, (0.0, 0.0, 0.0, 0.0, 8.0)))
    lat = W.plan(rp, start, WCFG)
    traj = W.trajectory_by_index(lat, jnp.int32(3))
    np.testing.assert_allclose(np.asarray(traj.xy[:, 0]),
                               np.asarray(lat.x[2]), atol=1e-9)
    np.testing.assert_allclose(np.asarray(traj.desired_speed),
                               np.asarray(lat.s_d[2]), atol=1e-9)


def test_prediction_constant_velocity():
    obs = jnp.asarray([[0.0, 0.0, 2.0, 1.0, 0.0]])
    pred = predict_obstacles(obs, jnp.ones((1,), bool), WCFG)
    n_t = int(WCFG.max_t / WCFG.dt)
    assert pred.x.shape == (1, 2, n_t)
    # front circle: x = x0 + t*vx + move_gap (yaw=0)
    t5 = 5 * WCFG.dt
    np.testing.assert_allclose(float(pred.x[0, 0, 5]), t5 * 2.0 + 1.0,
                               atol=1e-6)
    np.testing.assert_allclose(float(pred.y[0, 0, 5]), t5 * 1.0, atol=1e-6)


def test_controller_pid():
    assert float(ctl.longitudinal_pid(0.0, 5.0)) == -1.0
    # P-only on km/h error: 0.25/3.6 * (kmh diff)
    got = float(ctl.longitudinal_pid(8.0, 4.0))
    assert got == pytest.approx(min(1.0, 0.25 / 3.6 * (8 - 4) * 3.6), abs=1e-6)
    assert float(ctl.longitudinal_pid(4.0, 20.0)) == -1.0  # clipped


def test_pure_pursuit_steering_sign():
    # straight path ahead -> zero steer
    traj = jnp.stack([jnp.linspace(0, 50, 20), jnp.zeros(20)], axis=1)
    s = float(ctl.pure_pursuit(0.0, 0.0, 0.0, 5.0, traj))
    assert abs(s) < 1e-3
    # target to the left (+y) -> positive steer; right -> negative
    left = jnp.stack([jnp.linspace(0, 30, 20),
                      jnp.linspace(0, 10, 20)], axis=1)
    assert float(ctl.pure_pursuit(0.0, 0.0, 0.0, 5.0, left)) > 0.01
    right = jnp.stack([jnp.linspace(0, 30, 20),
                       -jnp.linspace(0, 10, 20)], axis=1)
    assert float(ctl.pure_pursuit(0.0, 0.0, 0.0, 5.0, right)) < -0.01


def test_rule_driver_reaches_goal():
    sc = t_intersection()
    init_fn, run_fn = make_rule_driver(sc)
    B, S = 4, 900
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    carry = init_fn(keys)
    skeys = jax.random.split(jax.random.PRNGKey(1), B * S).reshape(B, S, 2)
    carry, (reward, done, passed, collided) = run_fn(carry, skeys)
    d = np.asarray(done)
    p = np.asarray(passed)
    assert d.sum() >= B  # several episodes finished
    assert p[d].sum() >= 1  # the rule policy does pass the junction
    assert np.isfinite(np.asarray(reward)).all()


def test_collector_round_robin():
    sc = t_intersection()
    init_fn, run_fn = make_collector(sc)
    B, S = 2, 700
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    carry = init_fn(keys)
    skeys = jax.random.split(jax.random.PRNGKey(1), B * S).reshape(B, S, 2)
    carry, rec = run_fn(carry, skeys)
    done = np.asarray(rec.done)
    acts = np.asarray(rec.used_action)
    assert done.sum() >= 2
    # the candidate action rotates mod (num_paths + 1) across episodes
    for b in range(B):
        ends = np.where(done[b])[0]
        seq = acts[b][ends]
        for i in range(len(ends) - 1):
            assert seq[i + 1] == (seq[i] + 1) % (WCFG.num_paths + 1)
    # recorded trigger state has ego y < 90 where episodes completed
    rs = np.asarray(rec.recorded_state)
    for b in range(B):
        ends = np.where(done[b])[0]
        # skip episodes that ended before triggering (y never < 90)
        trig = rs[b][ends][:, 1]
        assert ((trig == 0) | (trig < 90.0 + 1e-6)).all()
    # returns finite
    assert np.isfinite(np.asarray(rec.episode_return)).all()
