"""Learnability smoke tests for the algorithm family — the SB fork's
test pattern (tests/test_identity.py:12-40: every algorithm must crack
IdentityEnv; tests/test_her.py: HER cracks BitFlippingEnv)."""

import jax
import jax.numpy as jnp
import pytest

from dcarl_tpu.algos import a2c, common, ddpg, her, ppo, sac, td3, trpo


def run_updates(init_fn, update_fn, n_iters, batch=32, seed=0):
    state = init_fn(jax.random.PRNGKey(seed), batch)
    step = jax.jit(update_fn)
    rewards = []
    for i in range(n_iters):
        state, metrics = step(state, jax.random.PRNGKey(1000 + i))
        rewards.append(float(metrics["reward_mean"]))
    return state, rewards


def test_schedules():
    s = common.linear_schedule(100, 1.0, 0.1)
    assert float(s(jnp.asarray(0))) == pytest.approx(1.0)
    assert float(s(jnp.asarray(100))) == pytest.approx(0.1)
    assert float(s(jnp.asarray(500))) == pytest.approx(0.1)
    assert float(s(jnp.asarray(50))) == pytest.approx(0.55)


def test_gae_matches_manual():
    T, B = 4, 1
    r = jnp.ones((T, B))
    v = jnp.zeros((T, B))
    d = jnp.zeros((T, B))
    last_v = jnp.zeros((B,))
    adv, ret = common.gae(r, v, d, last_v, gamma=0.5, lam=1.0)
    # with v=0, lam=1: ret[t] = sum_k gamma^k r[t+k]
    assert float(ret[3, 0]) == pytest.approx(1.0)
    assert float(ret[2, 0]) == pytest.approx(1.5)
    assert float(ret[0, 0]) == pytest.approx(1.875)


def test_discounted_returns_episode_cut():
    r = jnp.asarray([[1.0], [1.0], [1.0]])
    d = jnp.asarray([[0.0], [1.0], [0.0]])
    boot = jnp.asarray([10.0])
    ret = common.discounted_returns(r, d, boot, gamma=0.9)
    assert float(ret[2, 0]) == pytest.approx(10.0)  # 1 + .9*10
    assert float(ret[1, 0]) == pytest.approx(1.0)   # cut
    assert float(ret[0, 0]) == pytest.approx(1.9)


def test_a2c_identity():
    env = common.identity_env(num_actions=3)
    init_fn, update_fn = a2c.make_a2c(env, a2c.A2CConfig(n_steps=8))
    _, rewards = run_updates(init_fn, update_fn, 300)
    assert sum(rewards[-20:]) / 20 > 0.8, rewards[-20:]


def test_ppo_identity():
    env = common.identity_env(num_actions=3)
    init_fn, update_fn = ppo.make_ppo(
        env, ppo.PPOConfig(n_steps=32, n_epochs=4, n_minibatches=4))
    _, rewards = run_updates(init_fn, update_fn, 40)
    assert sum(rewards[-5:]) / 5 > 0.8, rewards[-5:]


def test_ppo_continuous_identity():
    env = common.identity_env_box(action_dim=1)
    init_fn, update_fn = ppo.make_ppo(
        env, ppo.PPOConfig(n_steps=32, learning_rate=1e-3))
    _, rewards = run_updates(init_fn, update_fn, 150)
    assert sum(rewards[-5:]) / 5 > -0.15, rewards[-5:]


def test_trpo_identity():
    env = common.identity_env(num_actions=3)
    init_fn, update_fn = trpo.make_trpo(
        env, trpo.TRPOConfig(n_steps=64, max_kl=0.05))
    _, rewards = run_updates(init_fn, update_fn, 40)
    assert sum(rewards[-5:]) / 5 > 0.7, rewards[-5:]


def det_eval_error(state, act_fn):
    """Mean |a - target| of the deterministic policy on fresh targets
    (obs == target in IdentityEnvBox)."""
    a = act_fn(state, state.obs)
    return float(jnp.mean(jnp.abs(a - state.obs)))


def test_ddpg_identity_box():
    env = common.identity_env_box(action_dim=1)
    init_fn, update_fn, act_fn = ddpg.make_ddpg(
        env, ddpg.DDPGConfig(batch_size=64, replay_capacity=4096,
                             actor_lr=1e-3, critic_lr=1e-3))
    state, _ = run_updates(init_fn, update_fn, 800)
    assert det_eval_error(state, act_fn) < 0.15


def test_td3_identity_box():
    env = common.identity_env_box(action_dim=1)
    init_fn, update_fn, act_fn = td3.make_td3(
        env, td3.TD3Config(batch_size=64, replay_capacity=4096,
                           actor_lr=1e-3, critic_lr=1e-3))
    state, _ = run_updates(init_fn, update_fn, 800)
    assert det_eval_error(state, act_fn) < 0.15


def test_sac_identity_box():
    env = common.identity_env_box(action_dim=1)
    init_fn, update_fn, act_fn = sac.make_sac(
        env, sac.SACConfig(batch_size=64, replay_capacity=4096, lr=1e-3))
    state, _ = run_updates(init_fn, update_fn, 800)
    assert det_eval_error(state, act_fn) < 0.2


def test_her_buffer_relabel_semantics():
    buf = her.her_buffer_init(episodes=4, ep_len=3, n=2)
    obs = jnp.asarray([[[0., 0.], [1., 0.], [1., 1.]]])
    act = jnp.asarray([[0, 1, 0]], jnp.int32)
    nxt = jnp.asarray([[[1., 0.], [1., 1.], [0., 1.]]])
    goal = jnp.asarray([[1., 1.]])
    buf = her.her_buffer_push(buf, obs, act, nxt, goal, jnp.asarray([3]))
    assert int(buf.size) == 1
    mb = her.her_sample(buf, jax.random.PRNGKey(0), 64, relabel_prob=1.0)
    # relabeled goals must be achieved states of the same episode
    for g in jax.device_get(mb.obs[:, 2:]):
        assert any((g == jax.device_get(nxt[0, i])).all() for i in range(3))
    # reward is 0 exactly when next state matches the (relabeled) goal
    match = jnp.all(mb.next_obs[:, :2] == mb.obs[:, 2:], axis=-1)
    assert jnp.array_equal(mb.reward == 0.0, match)


def test_her_dqn_bitflip():
    n_bits = 5
    init_fn, update_fn, q_fn, (reset_fn, step_fn, T) = her.make_her_dqn(
        n_bits, her.HERDQNConfig(buffer_episodes=256))
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(lambda s, k: update_fn(s, k))
    for i in range(300):
        state = step(state, jax.random.PRNGKey(2000 + i))

    # evaluate greedy success rate
    st, obs = reset_fn(jax.random.split(jax.random.PRNGKey(9), 64))
    solved = jnp.zeros((64,), bool)
    for t in range(T):
        a = jnp.argmax(q_fn(state, obs), axis=-1)
        st, obs, rew, done = step_fn(st, a,
                                     jax.random.split(
                                         jax.random.PRNGKey(100 + t), 64))
        solved = solved | (rew == 0.0)
    assert float(jnp.mean(solved)) > 0.55, float(jnp.mean(solved))


def test_acer_identity():
    from dcarl_tpu.algos import acer
    env = common.identity_env(num_actions=3)
    init_fn, update_fn = acer.make_acer(
        env, acer.ACERConfig(n_steps=8, buffer_segments=16,
                             replay_start=2), batch=16)
    state = init_fn(jax.random.PRNGKey(0))
    step = jax.jit(update_fn)
    rewards = []
    for i in range(150):
        state, metrics = step(state, jax.random.PRNGKey(1000 + i))
        rewards.append(float(metrics["reward_mean"]))
    assert sum(rewards[-20:]) / 20 > 0.9, rewards[-20:]


def test_acktr_identity():
    from dcarl_tpu.algos import acktr
    env = common.identity_env(num_actions=3)
    init_fn, update_fn = acktr.make_acktr(env, acktr.ACKTRConfig(n_steps=8))
    _, rewards = run_updates(init_fn, update_fn, 150, batch=16)
    assert sum(rewards[-20:]) / 20 > 0.9, rewards[-20:]


def test_gail_imitates_expert():
    import numpy as np

    from dcarl_tpu.algos import gail, nets
    env = common.identity_env(num_actions=3)
    ids = np.random.default_rng(0).integers(0, 3, 512)
    exp_obs = jnp.asarray(np.eye(3)[ids], jnp.float32)
    exp_act = jnp.asarray(ids)
    init_fn, update_fn = gail.make_gail(
        env, exp_obs, exp_act,
        gail.GAILConfig(trpo=trpo.TRPOConfig(n_steps=16, entcoeff=0.01)))
    state = init_fn(jax.random.PRNGKey(0), 32)
    step = jax.jit(update_fn)
    for i in range(150):
        state, _ = step(state, jax.random.PRNGKey(1000 + i))
    logits, _ = nets.CategoricalActorCritic(3, (64, 64)).apply(
        state.trpo.params, jnp.eye(3, dtype=jnp.float32))
    assert list(jnp.argmax(logits, -1)) == [0, 1, 2]


def test_ppo1_annealed_identity():
    env = common.identity_env(num_actions=3)
    cfg = ppo.ppo1_config(total_updates=60)._replace(n_steps=16)
    init_fn, update_fn = ppo.make_ppo(env, cfg)
    _, rewards = run_updates(init_fn, update_fn, 60, batch=16)
    assert sum(rewards[-10:]) / 10 > 0.8, rewards[-10:]
