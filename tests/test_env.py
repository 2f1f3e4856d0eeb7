"""Vectorized driving-env semantics tests (reward, termination,
observation layout — TestScenario_Town03.py:206-293, :350-426)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcarl_tpu.config import EnvConfig
from dcarl_tpu.env import driving_env as de
from dcarl_tpu.env.scenario import t_intersection

CFG = EnvConfig()
SC = t_intersection(CFG)
SA = de.scenario_to_device(SC)
IDX = de.in_state_indices(SC)


def _reset(seed=0):
    st = de.reset(SA, jax.random.PRNGKey(seed), CFG)
    obs, obs_ori = de.wrap_state(st, SA, IDX, CFG)
    return st, obs, obs_ori


def test_reset_layout():
    st, obs, obs_ori = _reset()
    assert obs.shape == (20,)
    assert obs_ori.shape == (20,)
    # ego near spawn
    np.testing.assert_allclose(np.asarray(obs_ori[:2]), [242.0, 110.0],
                               atol=0.2)
    # ego-frame ego state is the origin with its own yaw zeroed
    np.testing.assert_allclose(np.asarray(obs[:5]), 0.0, atol=1e-5)
    # walker is object 0 (spawn order: human then in-state vehicles)
    np.testing.assert_allclose(np.asarray(obs_ori[5:7]), [248.0, 80.0],
                               atol=1e-5)


def test_throttle_accelerates_southbound():
    st, _, _ = _reset()
    action = jnp.asarray([1.0, 0.0])
    for _ in range(40):
        st, obs, r, done, obs_ori = de.step(st, action, SA, IDX, CFG)
    assert float(st.ego_speed) > 5.0
    assert float(st.ego[1]) < 109.0  # heading -y
    # reward = sqrt(v) * 0.1 while alive
    np.testing.assert_allclose(float(r), np.sqrt(float(st.ego_speed)) * 0.1,
                               atol=1e-5)


def test_stuck_termination():
    st, _, _ = _reset()
    action = jnp.asarray([0.0, 0.0])
    done = False
    steps = 0
    while not done and steps < 100:
        st, obs, r, done, _ = de.step(st, action, SA, IDX, CFG)
        done = bool(done)
        steps += 1
    assert bool(st.stuck)
    assert float(r) == 0.0  # stuck reward (TestScenario_Town03.py:417-420)
    assert steps == int(CFG.stuck_time / CFG.dt) + 1


def test_pass_termination_and_collision_reward():
    st, _, _ = _reset()
    # teleport ego just above the pass line, moving fast
    st = st._replace(ego=jnp.asarray([242.0, 73.9, 0.0, -10.0, -np.pi / 2]),
                     ego_speed=jnp.asarray(10.0))
    st2, obs, r, done, _ = de.step(st, jnp.asarray([1.0, 0.0]), SA, IDX, CFG)
    assert bool(st2.passed) and bool(done)

    # teleport onto the walker -> collision reward -100
    st3 = st._replace(ego=st.ego.at[0:2].set(jnp.asarray([247.5, 80.0]))
                      .at[3].set(0.0))
    st4, obs, r, done, _ = de.step(st3, jnp.asarray([0.0, 0.0]), SA, IDX, CFG)
    assert bool(st4.collided) and bool(done)
    assert float(r) == CFG.reward_collision


def test_autoreset_blends_fresh_state():
    st, _, _ = _reset()
    st = st._replace(ego=jnp.asarray([242.0, 73.9, 0.0, -10.0, -np.pi / 2]),
                     ego_speed=jnp.asarray(10.0))
    st2, obs, r, done, obs_ori = de.step_autoreset(
        st, jnp.asarray([1.0, 0.0]), jax.random.PRNGKey(7), SA, IDX, CFG)
    assert bool(done)
    # state is fresh (ego back at spawn) but outcome flags preserved
    np.testing.assert_allclose(float(st2.ego[1]), 110.0, atol=0.2)
    assert bool(st2.passed)
    assert float(st2.episode_return) == 0.0
    # obs corresponds to the fresh state
    np.testing.assert_allclose(np.asarray(obs_ori[1]), 110.0, atol=0.2)


def test_vmap_parity():
    """Batched env equals per-env results slot by slot (the
    Dummy-vs-Subproc parity test pattern, SURVEY.md §4)."""
    reset_fn, step_fn = de.make_vec_env(SC, CFG)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    states, obs, obs_ori = reset_fn(keys)
    actions = jnp.tile(jnp.asarray([[0.7, 0.01]]), (4, 1))
    skeys = jax.random.split(jax.random.PRNGKey(1), 4)
    states2, obs2, r2, d2, ori2 = step_fn(states, actions, skeys)

    # slot 2 alone
    st = de.reset(SA, keys[2], CFG)
    st_s, obs_s, r_s, d_s, ori_s = de.step_autoreset(
        st, actions[2], skeys[2], SA, IDX, CFG)
    np.testing.assert_allclose(np.asarray(obs2[2]), np.asarray(obs_s),
                               atol=1e-6)
    np.testing.assert_allclose(float(r2[2]), float(r_s), atol=1e-6)
