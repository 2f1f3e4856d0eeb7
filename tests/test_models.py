"""Model-layer tests: networks, replay (vs reference sampling math),
DQN learnability on an identity env (the SB fork's test_identity.py
pattern — SURVEY.md §4), trust-set gating."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcarl_tpu.config import DQNConfig
from dcarl_tpu.models import dqn as D
from dcarl_tpu.models import networks as N
from dcarl_tpu.models import replay as RB
from dcarl_tpu.models import trustset as TS


def test_network_shapes():
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((7, 20))

    mlp = N.MLPQNet(num_actions=11)
    p = mlp.init(key, x)
    assert mlp.apply(p, x).shape == (7, 11)

    att = N.AttentionQNet(num_actions=8, token_dim=5)
    p = att.init(key, x)
    assert att.apply(p, x).shape == (7, 8)
    enc = att.apply(p, x, method="encoded_state")
    assert enc.shape == (7, 3)
    ego = att.apply(p, x, method="ego_attention")
    assert ego.shape == (7, 4, 3)  # per-token attended values

    duel = N.DuelingQNet(num_actions=5)
    p = duel.init(key, x)
    q = duel.apply(p, x)
    assert q.shape == (7, 5)

    boot = N.BootstrapQNet(num_actions=5, num_heads=10)
    p = boot.init(key, x)
    assert boot.apply(p, x).shape == (7, 10, 5)


def test_attention_is_permutation_sensitive_on_ego_only():
    """Swapping two non-ego tokens must not change the ego encoding
    (attention is a set operation over keys/values)."""
    key = jax.random.PRNGKey(1)
    att = N.AttentionQNet(num_actions=8, token_dim=5)
    x = jax.random.normal(key, (1, 20))
    p = att.init(key, x)
    q1 = att.apply(p, x)
    xs = np.asarray(x).reshape(4, 5).copy()
    xs[[1, 2]] = xs[[2, 1]]
    q2 = att.apply(p, jnp.asarray(xs.reshape(1, 20)))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)


def test_replay_push_sample_priorities():
    rng = np.random.default_rng(0)
    replay = RB.replay_init(64, 4)
    obs = jnp.asarray(rng.normal(0, 1, (10, 4)), jnp.float32)
    replay = RB.replay_push(replay, obs, jnp.arange(10), jnp.arange(10.0),
                            obs, jnp.zeros(10))
    assert int(replay.size) == 10

    batch = RB.replay_sample(replay, jax.random.PRNGKey(0), 32,
                             alpha=0.6, beta=0.4)
    assert batch.obs.shape == (32, 4)
    assert np.asarray(batch.indices).max() < 10
    assert np.asarray(batch.weights).max() == pytest.approx(1.0)

    # raising one priority concentrates sampling on it
    replay = RB.replay_update_priorities(
        replay, jnp.asarray([3]), jnp.asarray([1000.0]))
    batch2 = RB.replay_sample(replay, jax.random.PRNGKey(1), 256,
                              alpha=1.0, beta=0.4)
    frac = (np.asarray(batch2.indices) == 3).mean()
    assert frac > 0.9


def test_replay_gumbel_matches_categorical_distribution():
    """Gumbel-top-1 sampling draws from prio^alpha / sum — the exact
    distribution of the reference's np.random.choice
    (replay_buffer.py:33-38)."""
    replay = RB.replay_init(8, 1)
    obs = jnp.zeros((4, 1))
    replay = RB.replay_push(replay, obs, jnp.zeros(4, jnp.int32),
                            jnp.zeros(4), obs, jnp.zeros(4))
    prios = jnp.asarray([1.0, 2.0, 4.0, 8.0])
    replay = RB.replay_update_priorities(replay, jnp.arange(4), prios)
    alpha = 0.6
    batch = RB.replay_sample(replay, jax.random.PRNGKey(2), 20000,
                             alpha=alpha, beta=0.0)
    counts = np.bincount(np.asarray(batch.indices), minlength=8)[:4]
    expect = np.asarray(prios) ** alpha
    expect = expect / expect.sum()
    np.testing.assert_allclose(counts / counts.sum(), expect, atol=0.02)


def test_schedules():
    cfg = DQNConfig()
    assert float(D.epsilon_by_frame(jnp.int32(0), cfg)) == pytest.approx(0.9)
    assert float(D.epsilon_by_frame(jnp.int32(10_000_000), cfg)) == \
        pytest.approx(0.1, abs=1e-3)
    assert float(D.beta_by_frame(jnp.int32(0), cfg)) == pytest.approx(0.4)
    assert float(D.beta_by_frame(jnp.int32(2000), cfg)) == 1.0


@pytest.mark.parametrize("double_q", [False, True])
def test_dqn_learns_identity_env(double_q):
    """IdentityEnv pattern: obs is a one-hot state; acting with the
    matching index yields reward 1.  A correct DQN reaches near-greedy
    accuracy quickly (test_identity.py:12-40 capability)."""
    n = 4
    cfg = DQNConfig(lr=5e-3, batch_size=64, replay_capacity=4096, gamma=0.0,
                    epsilon_decay=200.0)
    learner = D.DQN(N.MLPQNet(num_actions=n, hidden=32), obs_dim=n, cfg=cfg,
                    double_q=double_q)
    state = learner.init(jax.random.PRNGKey(0), replay_capacity=4096)

    key = jax.random.PRNGKey(1)
    # pre-fill with random transitions
    for step in range(60):
        key, k1, k2 = jax.random.split(key, 3)
        s = jax.random.randint(k1, (32,), 0, n)
        obs = jax.nn.one_hot(s, n)
        a = jax.random.randint(k2, (32,), 0, n)
        r = (a == s).astype(jnp.float32)
        state = state._replace(replay=RB.replay_push(
            state.replay, obs, a, r, obs, jnp.ones(32)))

    for step in range(300):
        key, k = jax.random.split(key)
        state, loss = learner.train_step(state, k)

    obs = jnp.eye(n)
    q = learner.q_values(state.params, obs)
    acc = (jnp.argmax(q, axis=-1) == jnp.arange(n)).mean()
    assert float(acc) == 1.0
    assert float(loss) < 0.1


def test_trustset_gating_and_ucb():
    ts = TS.trustset_init(256, enc_dim=3)
    enc = jnp.asarray([[0.0, 0.0, 0.0]] * 5)
    acts = jnp.asarray([0.0, 1.0, 1.0, 2.0, 1.0])
    rews = jnp.asarray([1.0, -1.0, -0.5, 0.3, -0.2])
    ts = TS.add_data(ts, enc, acts, rews)

    counts = TS.state_action_counts(ts, enc[:1], 4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(counts[0]), [1, 3, 1, 0])

    in_ts = TS.in_trust_set(ts, enc[:1], 4, use_pallas=False)
    assert bool(in_ts[0])
    far = jnp.asarray([[10.0, 10.0, 10.0]])
    assert not bool(TS.in_trust_set(ts, far, 4, use_pallas=False)[0])

    per_act = TS.in_trust_set_action(ts, enc[:1], 4, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(per_act[0]),
                                  [True, True, True, False])

    cv = TS.confidence_values(ts, enc[:1], 4, use_pallas=False)
    # all counts <= n_thres -> priors: rule 100, others -50
    np.testing.assert_allclose(np.asarray(cv[0]), [100.0, -50.0, -50.0, -50.0])
    assert int(TS.hybrid_act(ts, enc[:1], 4, use_pallas=False)[0]) == 0


def test_trustset_punished_training_runs():
    cfg = DQNConfig(batch_size=8, replay_capacity=128)
    net = N.AttentionQNet(num_actions=4, token_dim=5)
    learner = D.DQN(net, obs_dim=20, cfg=cfg)
    state = learner.init(jax.random.PRNGKey(0), replay_capacity=128)
    ts = TS.trustset_init(256, enc_dim=3)

    key = jax.random.PRNGKey(1)
    obs = jax.random.normal(key, (32, 20))
    state = state._replace(replay=RB.replay_push(
        state.replay, obs, jnp.zeros(32, jnp.int32), jnp.ones(32), obs,
        jnp.zeros(32)))
    state, ts, loss = learner.train_step_with_trustset(
        state, ts, key, state.target_params)
    assert np.isfinite(float(loss))
    assert int(ts.store.size) == cfg.batch_size
