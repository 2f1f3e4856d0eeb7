"""VecMonitor / VecVideoRecorder / DQN param-noise tests.

Covers the SB fork surfaces bench/monitor.py, common/vec_env/
vec_video_recorder.py, and deepq/build_graph.py's param-noise act path
(SURVEY.md §2.4)."""

import numpy as np
import pytest

from dcarl_tpu.parallel.vec_env import (DummyVecEnv, VecMonitor,
                                        VecVideoRecorder, load_monitor_csv)


class _CountEnv:
    """Deterministic env: reward 1/step, episode length `length`."""

    def __init__(self, length):
        self.length = length
        self.t = 0

    def reset(self):
        self.t = 0
        return np.zeros(4, np.float32)

    def step(self, action):
        self.t += 1
        done = self.t >= self.length
        return np.full(4, self.t, np.float32), 1.0, done, {}


def test_vec_monitor_episode_stats(tmp_path):
    path = str(tmp_path / "run")
    venv = VecMonitor(DummyVecEnv([lambda: _CountEnv(3),
                                   lambda: _CountEnv(5)]), path)
    venv.reset()
    for _ in range(10):
        obs, rew, done, infos = venv.step(np.zeros(2))
        for i, info in enumerate(infos):
            if done[i]:
                assert "episode" in info
    # env0 finishes at steps 3,6,9; env1 at 5,10
    assert venv.get_episode_lengths() == [3, 5, 3, 3, 5]
    assert venv.get_episode_rewards() == [3.0, 5.0, 3.0, 3.0, 5.0]
    venv.close()

    header, rows = load_monitor_csv(path + ".monitor.csv")
    assert "t_start" in header
    assert [r["l"] for r in rows] == [3, 5, 3, 3, 5]
    assert rows[0]["env"] == 0 and rows[1]["env"] == 1


def test_vec_video_recorder(tmp_path):
    folder = str(tmp_path / "videos")

    def render(obs):
        return np.full((8, 8, 3), int(obs[0][0]) % 255, np.uint8)

    venv = VecVideoRecorder(
        DummyVecEnv([lambda: _CountEnv(100)]), folder,
        record_video_trigger=lambda step: step == 2,
        video_length=4, render_fn=render)
    venv.reset()
    for _ in range(10):
        venv.step(np.zeros(1))
    venv.close()

    assert len(venv.recorded_paths) == 1
    assert venv.recorded_paths[0].endswith(".gif")
    import glob

    npz = glob.glob(folder + "/*.npz")
    assert len(npz) == 1
    frames = np.load(npz[0])["frames"]
    assert frames.shape == (4, 8, 8, 3)
    # the triggering step's own frame is included (trigger at step 2)
    # — pixel value tracks env time
    assert [int(f[0, 0, 0]) for f in frames] == [2, 3, 4, 5]


def test_param_noise_adapts():
    import jax
    import jax.numpy as jnp

    from dcarl_tpu.config import DQNConfig
    from dcarl_tpu.models.dqn import (DQN, DQNParamNoise, param_noise_init,
                                      perturb_params)
    from dcarl_tpu.models.networks import MLPQNet

    cfg = DQNConfig(hidden_dim=32)
    dqn = DQN(MLPQNet(num_actions=5, hidden=32), obs_dim=8, cfg=cfg)
    state = dqn.init(jax.random.PRNGKey(0), replay_capacity=64)
    pn = param_noise_init(0.05)
    helper = DQNParamNoise(dqn)

    obs = jax.random.normal(jax.random.PRNGKey(1), (16, 8))
    a = helper.act(state, pn, obs, jax.random.PRNGKey(2))
    assert a.shape == (16,) and (a >= 0).all() and (a < 5).all()

    # zero-scale perturbation is the identity
    p0 = perturb_params(state.params, jax.random.PRNGKey(3), jnp.zeros(()))
    for l0, l1 in zip(jax.tree.leaves(p0), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))

    # tiny scale => KL below threshold => scale grows by 1.01;
    # huge scale => KL above threshold => shrinks
    pn_small = param_noise_init(1e-6)
    new_small, kl_small = helper.adapt(state, pn_small, obs,
                                       jax.random.PRNGKey(4))
    assert float(new_small.scale) == pytest.approx(1e-6 * 1.01)
    pn_big = param_noise_init(50.0)
    new_big, kl_big = helper.adapt(state, pn_big, obs, jax.random.PRNGKey(5))
    assert float(new_big.scale) == pytest.approx(50.0 / 1.01)
    assert float(kl_big) > float(kl_small)
