"""Field-stack lane-level tests: IDM, LaneUtility, RLSDecision mapping,
safeguard, and the multilane env end-to-end decision tick (the rosbag
replay loop of SURVEY.md §3.3, natively)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcarl_tpu.env import multilane_env as ML
from dcarl_tpu.planning import decision as DEC
from dcarl_tpu.planning import idm
from dcarl_tpu.planning import lane_utility as LU
from dcarl_tpu.planning import safeguard as SG
from dcarl_tpu.planning.multilane import LaneVehicle, MultiLaneState

CFG = ML.MultiLaneEnvConfig()


def make_mmap(ego_lane=0.0, ego_speed=10.0, front_s=(50.0, 50.0),
              front_v=(20.0, 20.0), front_exists=(False, False),
              rear_s=(-50.0, -50.0), rear_v=(0.0, 0.0),
              rear_exists=(False, False), dist_junction=400.0,
              speed_limit=15.0):
    L = 2
    lanes = jnp.arange(L, dtype=jnp.float32)
    return MultiLaneState(
        ego_lane_index=jnp.asarray(ego_lane),
        ego_speed=jnp.asarray(ego_speed),
        ego_vd=jnp.zeros(()),
        front=LaneVehicle(exists=jnp.asarray(front_exists),
                          s=jnp.asarray(front_s), d=lanes,
                          vs=jnp.asarray(front_v), vd=jnp.zeros((L,))),
        rear=LaneVehicle(exists=jnp.asarray(rear_exists),
                         s=jnp.asarray(rear_s), d=lanes,
                         vs=jnp.asarray(rear_v), vd=jnp.zeros((L,))),
        speed_limit=jnp.full((L,), speed_limit),
        distance_to_junction=jnp.asarray(dist_junction),
        target_lane_index=jnp.asarray(1.0),
        traffic_light_stop=jnp.zeros((L,), bool),
        stop_distance=jnp.full((L,), 1e6),
    )


def test_idm_free_road_accelerates():
    m = make_mmap(ego_speed=5.0)
    v = idm.longitudinal_speed(m, jnp.asarray(0))
    assert float(v) > 5.0


def test_idm_blocked_decelerates():
    m = make_mmap(ego_speed=12.0, front_exists=(True, False),
                  front_s=(8.0, 50.0), front_v=(2.0, 20.0))
    v_blocked = idm.longitudinal_speed(m, jnp.asarray(0))
    v_free = idm.longitudinal_speed(m, jnp.asarray(1))
    assert float(v_blocked) < float(v_free)
    assert float(v_blocked) < 12.0


def test_idm_traffic_light():
    m = make_mmap(ego_speed=10.0)
    m = m._replace(traffic_light_stop=jnp.asarray([True, False]),
                   stop_distance=jnp.asarray([20.0, 1e6]))
    v = idm.longitudinal_speed(m, jnp.asarray(0), traffic_light=True)
    assert float(v) == 0.0  # inside braking envelope 10 + v^2/4 = 35


def test_lane_utility_prefers_free_lane():
    # lane 0 blocked by slow vehicle, lane 1 free and safe
    m = make_mmap(ego_lane=0.0, ego_speed=10.0,
                  front_exists=(True, False), front_s=(12.0, 50.0),
                  front_v=(2.0, 20.0))
    idx = LU.generate_lane_change_index(m)
    assert int(idx) == 1

    # unsafe rear gap in lane 1 -> stay
    m2 = m._replace(rear=LaneVehicle(
        exists=jnp.asarray([False, True]),
        s=jnp.asarray([-50.0, -5.0]), d=jnp.arange(2, dtype=jnp.float32),
        vs=jnp.asarray([0.0, 15.0]), vd=jnp.zeros((2,))))
    idx2 = LU.generate_lane_change_index(m2)
    assert int(idx2) == 0


def test_lane_change_safe_gaps():
    m = make_mmap(front_exists=(False, True), front_s=(50.0, 25.0),
                  front_v=(20.0, 10.0), ego_speed=10.0)
    # gap 25 > max(10 + 3*0, 20) -> safe
    assert bool(LU.lane_change_safe(m, jnp.asarray(1)))
    m2 = make_mmap(front_exists=(False, True), front_s=(50.0, 15.0),
                   front_v=(20.0, 10.0), ego_speed=10.0)
    assert not bool(LU.lane_change_safe(m2, jnp.asarray(1)))
    # out of range lanes unsafe
    assert not bool(LU.lane_change_safe(m, jnp.asarray(2)))
    assert not bool(LU.lane_change_safe(m, jnp.asarray(-1)))


def test_wrap_state_layout():
    m = make_mmap(ego_lane=1.0, ego_speed=9.0,
                  front_exists=(True, False), front_s=(30.0, 50.0),
                  front_v=(8.0, 20.0))
    s = DEC.wrap_state(m)
    assert s.shape == (20,)
    assert float(s[0]) == 0.0
    assert float(s[1]) == 1.0
    assert float(s[2]) == 9.0
    # lane-0 front vehicle at [4..8)
    np.testing.assert_allclose(np.asarray(s[4:8]), [30.0, 0.0, 8.0, 0.0])
    # lane-1 front defaults (no vehicle): s=50, d=1, vs=20, vd=0
    np.testing.assert_allclose(np.asarray(s[8:12]), [50.0, 1.0, 20.0, 0.0])
    # rear defaults
    np.testing.assert_allclose(np.asarray(s[12:16]), [-50.0, 0.0, 0.0, 0.0])


def test_decision_action_mapping():
    m = make_mmap(ego_lane=1.0, ego_speed=10.0)
    # action 1: hard brake
    d = DEC.decision_from_discrete_action(m, jnp.asarray(1))
    assert float(d.target_speed) == pytest.approx(10.0 - 4.0 * 0.75)
    assert int(d.target_lane_index) == 1
    # action 4: outside lane, accelerate
    d4 = DEC.decision_from_discrete_action(m, jnp.asarray(4))
    assert int(d4.target_lane_index) == 0
    assert float(d4.target_speed) == pytest.approx(10.0 + 2.0 * 0.75)
    # action 7: inside lane, decelerate
    d7 = DEC.decision_from_discrete_action(m, jnp.asarray(7))
    assert int(d7.target_lane_index) == 1
    assert float(d7.target_speed) == pytest.approx(10.0 - 2.0 * 0.75)
    # action 0: rule decision (defers to LaneUtility)
    d0 = DEC.decision_from_discrete_action(m, jnp.asarray(0))
    rule_lane, rule_speed = LU.lateral_decision(m)
    assert int(d0.target_lane_index) == int(rule_lane)
    assert float(d0.target_speed) == pytest.approx(float(rule_speed))


def test_safeguard_caps_speed():
    # straight trajectory at 10 m/s crossing a stationary obstacle
    T = 14
    xy = jnp.stack([jnp.linspace(0, 40, T), jnp.zeros(T)], axis=1)
    speed = jnp.full((T,), 10.0)
    blocker = jnp.asarray([[20.0, 0.0, 0.0, 0.0, 0.0]])
    ok = SG.check_trajectory(xy, speed, blocker, jnp.ones(1, bool))
    assert not bool(ok)
    capped = SG.get_safeguard_speed(xy, speed, blocker, jnp.ones(1, bool))
    assert float(capped.max()) < 10.0

    # no obstacles -> unchanged
    free = SG.get_safeguard_speed(xy, speed, blocker, jnp.zeros(1, bool))
    np.testing.assert_allclose(np.asarray(free), np.asarray(speed))


def test_multilane_env_rule_policy_drives():
    """End-to-end field tick: env -> MultiLaneState -> LaneUtility ->
    decision -> env (the §3.3 loop without ROS/sockets)."""
    from dcarl_tpu.planning.lane_utility import lateral_decision

    def run_episode(seed):
        st = ML.reset(jax.random.PRNGKey(seed), CFG)
        total = 0.0
        for _ in range(CFG.max_steps):
            m = ML.to_multilane_state(st, CFG)
            lane, speed = lateral_decision(m)
            st, r, done = ML.step(st, lane, speed, CFG)
            total += float(r)
            if bool(done):
                break
        return st, total

    outcomes = [run_episode(s) for s in range(3)]
    # the rule policy makes forward progress without constant collisions
    assert any(float(st.ego_s) > 100.0 for st, _ in outcomes)
    assert any(bool(st.left_road) for st, _ in outcomes) or \
        all(not bool(st.collided) for st, _ in outcomes)


def test_multilane_env_batched_with_rls_decision():
    """Batched agent tick: wrap_state -> (mock) action -> decision ->
    step, all under jit/vmap."""
    B = 8
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    states = jax.vmap(lambda k: ML.reset(k, CFG))(keys)

    @jax.jit
    def tick(states, actions, keys):
        def one(st, a, k):
            m = ML.to_multilane_state(st, CFG)
            d = DEC.decision_from_discrete_action(m, a)
            return ML.step_autoreset(st, d.target_lane_index,
                                     d.target_speed, k, CFG)
        return jax.vmap(one)(states, actions, keys)

    actions = jnp.zeros((B,), jnp.int32)
    sk = jax.random.split(jax.random.PRNGKey(1), B)
    states, r, done = tick(states, actions, sk)
    obs = jax.vmap(lambda st: DEC.wrap_state(ML.to_multilane_state(st, CFG)))(
        states)
    assert obs.shape == (B, 20)
    assert np.isfinite(np.asarray(obs)).all()
