"""Tests for the auxiliary subsystems: monitor, calibration, field-log
analysis, the msgpack planner bridge, VecEnv adapters, visualization."""

import os

import numpy as np
import pytest

import jax.numpy as jnp


# ---------------------------------------------------------------- monitor

def test_monitor_status_transitions():
    from dcarl_tpu.utils.monitor import Monitor, Status

    t = [0.0]
    mon = Monitor(clock=lambda: t[0])
    mon.register("cognition", rate_hz=20.0)   # period 0.05
    mon.beat("cognition")
    assert mon.check()["cognition"].status == Status.OK
    t[0] += 0.06 * 1.6
    assert mon.check()["cognition"].status == Status.WARN
    t[0] += 1.0
    assert mon.check()["cognition"].status == Status.STALE
    mon.beat("cognition")
    assert mon.check()["cognition"].status == Status.OK
    assert mon.healthy()


def test_monitor_guard_counts_and_reraises():
    from dcarl_tpu.utils.monitor import Monitor, Status

    mon = Monitor()
    mon.register("planner", rate_hz=5.0)
    for _ in range(2):
        with mon.guard("planner", reraise_after=3):
            raise RuntimeError("boom")
    st = mon.check()["planner"]
    assert st.status == Status.ERROR
    assert st.failure_count == 2
    assert "boom" in st.last_error
    with pytest.raises(RuntimeError):
        with mon.guard("planner", reraise_after=3):
            raise RuntimeError("boom")
    # success clears the consecutive counter
    with mon.guard("planner"):
        pass
    assert mon.check()["planner"].status == Status.OK


def test_with_fallback_degrades_to_rule():
    from dcarl_tpu.utils.monitor import Monitor, with_fallback

    mon = Monitor()

    def rl(state):
        raise ConnectionError("agent down")

    fn = with_fallback(rl, lambda state: 0, monitor=mon, name="rl")
    assert fn([1.0, 2.0]) == 0
    assert mon.check()["rl"].failure_count == 1


# ------------------------------------------------------------ calibration

def test_calibration_tables_monotone_and_invertible():
    from dcarl_tpu.control.calibration import (
        feedforward_command, measure_table)

    acc = measure_table()
    dec = measure_table(brake=True)
    a = np.asarray(acc.acc)
    d = np.asarray(dec.acc)
    # more throttle -> more accel; more brake -> more decel
    assert (np.diff(a, axis=1) >= -1e-6).all()
    assert (np.diff(d, axis=1) <= 1e-6).all()
    # drag: at fixed throttle, faster -> less accel
    assert (np.diff(a, axis=0) <= 1e-6).all()
    # inverse lookup achieves the asked-for accel
    cmd = feedforward_command(acc, jnp.asarray([5.0]), jnp.asarray([2.0]))
    i = int(np.searchsorted(np.asarray(acc.speeds), 5.0))
    j = int(np.searchsorted(np.asarray(acc.commands), float(cmd[0]) - 1e-9))
    assert a[i, j] >= 2.0 - 1e-6


def test_calibration_save_load_roundtrip(tmp_path):
    from dcarl_tpu.control.calibration import (
        load_table, measure_table, save_tables)

    acc = measure_table()
    dec = measure_table(brake=True)
    ap, dp = str(tmp_path / "acc.txt"), str(tmp_path / "dec.txt")
    save_tables(acc, dec, ap, dp)
    back = load_table(ap, acc.speeds, acc.commands)
    np.testing.assert_allclose(np.asarray(back.acc), np.asarray(acc.acc),
                               atol=1e-5)


# --------------------------------------------------------- field analysis

def _synthetic_scenario(tmp_path):
    t = 1000.0 + np.arange(200) * 0.05
    np.savetxt(tmp_path / "control.txt",
               np.c_[t, np.full_like(t, 5.0),
                     np.where(np.arange(200) % 2, 65536.0 - 100.0, 100.0)])
    np.savetxt(tmp_path / "automode.txt",
               np.c_[t, np.where(np.arange(200) < 50, 1.0, 2.0)])
    x = np.linspace(0, 30, 200)
    np.savetxt(tmp_path / "traffic.txt",
               np.c_[t, np.zeros((200, 2)), x, np.zeros(200),
                     np.zeros((200, 3))])
    np.savetxt(tmp_path / "surrounding_obj.txt",
               np.c_[t, x + 10, np.ones(200), np.zeros((200, 2))])
    np.savetxt(tmp_path / "decision.txt",
               np.c_[t, np.ones(200), np.zeros(200), x, np.zeros(200)])
    return str(tmp_path)


def test_field_analysis_synthetic(tmp_path):
    from dcarl_tpu.utils import field_analysis as fa

    d = _synthetic_scenario(tmp_path)
    a = fa.analyze_scenario(d)
    assert a["distance_m"] == pytest.approx(30.0, abs=1e-6)
    assert a["auto_mode_fraction"] == pytest.approx(0.75)
    assert a["target_speed_mean"] == pytest.approx(5.0)
    # steering unwrap: ±100 raw counts, not 65436
    assert a["steering_abs_max"] == pytest.approx(100.0)
    figs = fa.plot_scenario(d, str(tmp_path / "scen"))
    assert os.path.exists(figs["control"])
    assert os.path.exists(figs["trajectory"])


def test_unwrap_and_lowess():
    from dcarl_tpu.utils.field_analysis import lowess, unwrap_steering

    raw = np.array([0.0, 520.0, 65536.0 - 520.0, 65016.0, 65535.0])
    np.testing.assert_allclose(unwrap_steering(raw),
                               [0.0, 520.0, -520.0, -520.0, -1.0])
    rng = np.random.default_rng(0)
    y = np.sin(np.linspace(0, 3, 300)) + rng.normal(0, 0.2, 300)
    sm = lowess(y, frac=0.2)
    truth = np.sin(np.linspace(0, 3, 300))
    assert np.abs(sm - truth).mean() < np.abs(y - truth).mean() * 0.5


REF_SCEN = "/root/reference/Field_testing/Scenario1"


@pytest.mark.skipif(not os.path.isdir(REF_SCEN),
                    reason="reference field logs not mounted")
def test_field_analysis_reference_scenario1():
    from dcarl_tpu.utils import field_analysis as fa

    a = fa.analyze_scenario(REF_SCEN)
    assert a["duration_s"] > 10.0
    assert a["distance_m"] > 10.0          # the vehicle actually drove
    assert 0.0 <= a["auto_mode_fraction"] <= 1.0
    assert a["steering_abs_max"] <= 520.0  # unwrap brought it in range
    assert a["n_surrounding_detections"] > 100


# ----------------------------------------------------------------- bridge

def test_agent_bridge_roundtrip_and_fallback():
    pytest.importorskip("msgpack")
    from dcarl_tpu.bridge import AgentServer, PlannerClient

    def policy(msg):
        # lane protocol: 20-D state + [collision, leave_mmap]
        assert len(msg) == 22
        return int(msg[0] > 0.5)

    with AgentServer(policy) as srv:
        client = PlannerClient(port=srv.address[1])
        assert client.decide([1.0] + [0.0] * 19) == 1
        assert client.decide([0.0] * 20) == 0
        client.close()
    # server gone -> fallback to rule action 0
    dead = PlannerClient(port=srv.address[1], timeout=0.2,
                         fallback_action=0)
    assert dead.decide([1.0] * 20) == 0


def test_agent_bridge_veg_protocol():
    pytest.importorskip("msgpack")
    from dcarl_tpu.bridge import AgentServer, PlannerClient

    def veg_policy(msg):
        return [0.5, -1.5, float(len(msg)), 3.25]  # action, q values...

    with AgentServer(veg_policy) as srv:
        client = PlannerClient(port=srv.address[1])
        out = client.decide([0.0] * 10)
        assert out == [0.5, -1.5, 12.0, 3.25]
        client.close()


# ---------------------------------------------------------------- vec env

class _CountEnv:
    """Identity-style toy env: obs = counter, done after 3 steps."""

    def __init__(self, offset=0):
        self.offset = offset
        self.n = 0

    def reset(self):
        self.n = 0
        return np.array([self.offset + self.n], np.float64)

    def step(self, action):
        self.n += 1
        done = self.n >= 3
        return (np.array([self.offset + self.n], np.float64),
                float(action), done, {})


@pytest.mark.parametrize("cls_name", ["DummyVecEnv", "SubprocVecEnv"])
def test_vec_env_parity(cls_name):
    from dcarl_tpu.parallel import vec_env as V

    import functools

    cls = getattr(V, cls_name)
    # partial over the module-level class: picklable for spawn workers
    venv = cls([functools.partial(_CountEnv, 10 * i) for i in range(3)])
    obs = venv.reset()
    np.testing.assert_allclose(obs[:, 0], [0.0, 10.0, 20.0])
    for k in range(1, 3):
        obs, rew, done, infos = venv.step(np.ones(3))
        np.testing.assert_allclose(obs[:, 0], [k, 10 + k, 20 + k])
        assert not done.any()
    obs, rew, done, infos = venv.step(np.ones(3))
    assert done.all()
    # auto-reset returned fresh obs; terminal obs preserved in info
    np.testing.assert_allclose(obs[:, 0], [0.0, 10.0, 20.0])
    np.testing.assert_allclose(
        [i["terminal_observation"][0] for i in infos], [3.0, 13.0, 23.0])
    venv.close()


def test_jax_vec_env_adapter():
    from dcarl_tpu.config import EnvConfig
    from dcarl_tpu.env.driving_env import make_vec_env
    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.parallel.vec_env import JaxVecEnv, VecCheckNan

    reset_fn, step_fn = make_vec_env(t_intersection(), EnvConfig())
    venv = VecCheckNan(JaxVecEnv(reset_fn, step_fn, num_envs=4))
    obs = venv.reset()
    assert obs.shape[0] == 4
    obs2, rew, done, infos = venv.step(np.zeros((4, 2)))
    assert obs2.shape == obs.shape and rew.shape == (4,)


def test_vec_frame_stack_and_check_nan():
    from dcarl_tpu.parallel.vec_env import (
        DummyVecEnv, VecCheckNan, VecFrameStack)

    venv = VecFrameStack(DummyVecEnv([lambda: _CountEnv()]), n_stack=3)
    obs = venv.reset()
    np.testing.assert_allclose(obs[0], [0, 0, 0])
    obs, *_ = venv.step(np.ones(1))
    np.testing.assert_allclose(obs[0], [0, 0, 1])
    obs, *_ = venv.step(np.ones(1))
    np.testing.assert_allclose(obs[0], [0, 1, 2])

    class NanEnv(_CountEnv):
        def step(self, action):
            o, r, d, i = super().step(action)
            return o * np.nan, r, d, i

    guarded = VecCheckNan(DummyVecEnv([NanEnv]))
    guarded.reset()
    with pytest.raises(ValueError, match="non-finite"):
        guarded.step(np.ones(1))


# ------------------------------------------------------------- visualize

def test_markers_and_render(tmp_path):
    from dcarl_tpu.utils import visualize as viz

    objs = [dict(x=0, y=0, yaw=0.3, vx=3, vy=0, cls="car", uid=7),
            dict(x=5, y=2, cls="pedestrian")]
    markers = viz.object_markers(objs)
    kinds = {m["type"] for m in markers}
    assert {"box", "label", "centroid", "arrow"} <= kinds
    paths = np.stack([np.c_[np.linspace(0, 10, 8),
                            np.full(8, d)] for d in (-2.0, 0.0, 2.0)])
    markers += viz.trajectory_markers(paths, costs=np.array([3.0, 1.0, 2.0]),
                                      chosen=1)
    p = str(tmp_path / "scene.json")
    viz.save_markers(p, markers)
    assert viz.load_markers(p)[0]["type"] == markers[0]["type"]
    out = viz.render(markers, out_path=str(tmp_path / "scene.png"))
    assert os.path.exists(out)
