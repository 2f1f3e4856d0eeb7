"""VEG (continuous-models) planner tests — reference:
continuous_models/VEG/VEG_planner.py (ships untested)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcarl_tpu.config import WerlingConfig
from dcarl_tpu.env.scenario import t_intersection
from dcarl_tpu.ops import spline as spl
from dcarl_tpu.planning import veg
from dcarl_tpu.planning import werling as W


@pytest.fixture(scope="module")
def setup():
    sc = t_intersection()
    ref_line = jnp.asarray(sc.ref_path, jnp.float64)
    rp = spl.refpath_from_xy(ref_line[:, 0], ref_line[:, 1])
    ego = jnp.asarray([sc.ref_path[2, 0], sc.ref_path[2, 1], 3.0, 0.0, 0.0],
                      jnp.float64)
    K = 3
    obstacles = jnp.zeros((K, 5), jnp.float64).at[:, 0].set(1e4)
    valid = jnp.zeros((K,), bool)
    return rp, ref_line, ego, obstacles, valid


def test_wrap_state_shape_and_rule_point(setup):
    rp, ref_line, ego, obstacles, valid = setup
    out = W.plan_with_rule(rp, ref_line, ego, obstacles, valid)
    st = veg.wrap_state(ref_line, ego, obstacles, valid,
                        jnp.zeros(()), jnp.zeros(()),
                        out.lattice, out.rule_index)
    assert st.state.shape == (veg.VEG_STATE_DIM,)
    # absent obstacles contribute zeros (VEG_planner.py:156-166)
    np.testing.assert_allclose(np.asarray(st.state[4:]), 0.0)
    # rule point carries the ACTION_SPACE_SYMMETRY shift (:216)
    p = int(out.rule_index) - 1
    expect_v = float(out.lattice.s_d[p, veg.KICK_IN_POINT]) \
        - veg.ACTION_SPACE_SYMMETRY
    assert float(st.rule_point[1]) == pytest.approx(expect_v)


def test_kick_in_requires_q_margin(setup):
    rp, ref_line, ego, obstacles, valid = setup
    action = jnp.asarray([0.0, 5.0], jnp.float64)

    plan_lo = veg.plan_veg(rp, ref_line, ego, obstacles, valid, action,
                           rl_q=jnp.asarray(1.0), rule_q=jnp.asarray(0.9))
    assert not bool(plan_lo.kicked_in)  # margin 0.1 < THRESHOLD 0.2

    plan_hi = veg.plan_veg(rp, ref_line, ego, obstacles, valid, action,
                           rl_q=jnp.asarray(1.5), rule_q=jnp.asarray(0.9))
    assert bool(plan_hi.kicked_in)


def test_kick_in_rejects_out_of_range_action(setup):
    rp, ref_line, ego, obstacles, valid = setup
    action = jnp.asarray([5000.0, 5.0], jnp.float64)  # > ACTION_LIMIT
    plan = veg.plan_veg(rp, ref_line, ego, obstacles, valid, action,
                        rl_q=jnp.asarray(9.0), rule_q=jnp.asarray(0.0))
    assert not bool(plan.kicked_in)


def test_emergency_stop_zeroes_speed(setup):
    rp, ref_line, ego, obstacles, valid = setup
    action = jnp.asarray([0.0, 0.1], jnp.float64)  # < MIN_SPEED_RL
    plan = veg.plan_veg(rp, ref_line, ego, obstacles, valid, action,
                        rl_q=jnp.asarray(9.0), rule_q=jnp.asarray(0.0))
    assert bool(plan.kicked_in)
    np.testing.assert_allclose(np.asarray(plan.desired_speed), 0.0)


def test_rl_trajectory_reaches_targets(setup):
    rp, ref_line, ego, obstacles, valid = setup
    start = W.start_state_from_ego(ego[0], ego[1], ego[2], ego[3], ego[4],
                                   ref_line)
    cfg = WerlingConfig()
    d_t, v_t = jnp.asarray(1.5, jnp.float64), jnp.asarray(6.0, jnp.float64)
    xy, speed, feasible, _end = veg.plan_rl_kick(rp, start, d_t, v_t, cfg)
    assert bool(feasible)
    # speed approaches the commanded terminal speed along the horizon
    assert float(speed[-1]) == pytest.approx(
        6.0, abs=0.5 + 6.0 * cfg.dt)  # grid ends one dt before T
    assert xy.shape == (cfg.n_time_steps, 2)


def test_rule_fallback_matches_rule_trajectory(setup):
    rp, ref_line, ego, obstacles, valid = setup
    out = W.plan_with_rule(rp, ref_line, ego, obstacles, valid)
    rule_traj = W.trajectory_by_index(out.lattice, out.rule_index)
    plan = veg.plan_veg(rp, ref_line, ego, obstacles, valid,
                        jnp.asarray([0.0, 5.0], jnp.float64),
                        rl_q=jnp.asarray(0.0), rule_q=jnp.asarray(0.0))
    np.testing.assert_allclose(np.asarray(plan.xy),
                               np.asarray(rule_traj.xy))
    np.testing.assert_allclose(np.asarray(plan.desired_speed),
                               np.asarray(rule_traj.desired_speed))


def test_itsc_variant_threshold_and_bias(setup):
    """VEG_ITSC deltas (VEG_ITSC/VEG_planner.py:88,148-149): the gate
    needs a Q-advantage > 5.0 (not 0.2), and the kicked speed target is
    the RL action plus 12.5/3.6 m/s."""
    rp, ref_line, ego, obstacles, valid = setup
    icfg = veg.itsc_config()
    act = jnp.asarray([0.0, 3.0], jnp.float64)

    # advantage 1.0 kicks the base variant but NOT itsc
    plan_base = veg.plan_veg(rp, ref_line, ego, obstacles, valid, act,
                             rl_q=jnp.asarray(1.0), rule_q=jnp.asarray(0.0))
    plan_itsc = veg.plan_veg(rp, ref_line, ego, obstacles, valid, act,
                             rl_q=jnp.asarray(1.0), rule_q=jnp.asarray(0.0),
                             vcfg=icfg)
    assert bool(plan_base.kicked_in)
    assert not bool(plan_itsc.kicked_in)

    # advantage 6.0 kicks itsc; terminal speed tracks act + 12.5/3.6
    plan_itsc2 = veg.plan_veg(rp, ref_line, ego, obstacles, valid, act,
                              rl_q=jnp.asarray(6.0), rule_q=jnp.asarray(0.0),
                              vcfg=icfg)
    assert bool(plan_itsc2.kicked_in)
    cfg = WerlingConfig()
    v_cmd = 3.0 + 12.5 / 3.6
    kick_end_speed = float(plan_itsc2.desired_speed[cfg.n_time_steps - 1])
    assert kick_end_speed == pytest.approx(v_cmd, abs=0.5 + v_cmd * cfg.dt)


def test_itsc_two_segment_chain(setup):
    """The ITSC kicked trajectory chains a rule-optimal continuation
    after the RL segment (trajectory_update_withRL_second) — twice the
    time steps, continuous at the seam."""
    rp, ref_line, ego, obstacles, valid = setup
    icfg = veg.itsc_config()
    cfg = WerlingConfig()
    act = jnp.asarray([0.0, 5.0], jnp.float64)
    plan = veg.plan_veg(rp, ref_line, ego, obstacles, valid, act,
                        rl_q=jnp.asarray(10.0), rule_q=jnp.asarray(0.0),
                        vcfg=icfg)
    assert bool(plan.kicked_in)
    T = cfg.n_time_steps
    assert plan.xy.shape == (2 * T, 2)
    seam = np.linalg.norm(np.asarray(plan.xy[T]) - np.asarray(plan.xy[T - 1]))
    # seam gap bounded by one step of travel at the commanded speed
    assert seam < (5.0 + 12.5 / 3.6) * cfg.dt * 3.0


def test_itsc_emergency_stop_floor(setup):
    """ITSC emergency stop: commanded speed below 3/3.6 (after bias the
    commanded v_cmd) -> speed profile 0 on the kicked path
    (Werling_trajectory.py:188-189)."""
    rp, ref_line, ego, obstacles, valid = setup
    icfg = veg.itsc_config()
    # v_cmd = act + bias < 3/3.6 requires act < 3/3.6 - 12.5/3.6 < 0
    act = jnp.asarray([0.0, -3.0], jnp.float64)
    plan = veg.plan_veg(rp, ref_line, ego, obstacles, valid, act,
                        rl_q=jnp.asarray(10.0), rule_q=jnp.asarray(0.0),
                        vcfg=icfg)
    assert bool(plan.kicked_in)
    np.testing.assert_allclose(np.asarray(plan.desired_speed), 0.0)
