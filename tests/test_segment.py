"""Act-hold segment-push semantics vs a literal Python reimplementation
of the reference loop (drl_library/dqn/dqn.py:353-393)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcarl_tpu.models.segment import (SegmentConfig, segment_init,
                                      segment_push, segment_select_action)


def _oracle(rl, rew, done, obs, nobs, cfg: SegmentConfig):
    """Per-env sequential reimplementation of the reference's act-hold
    loop: sample-and-hold, append (obs, reward), trigger on
    ``sum_reward > r_thres or len > pass_thres or done``, push the
    whole segment with the running-subtraction shared returns
    (dqn.py:381-385), then one extra single-transition push with the
    same held action (:388-393)."""
    pushes = []          # (t, obs, action, value, next_obs, done)
    fresh, tail, held = True, False, None
    buf, s = [], 0.0
    for t in range(len(rew)):
        a = int(rl[t]) if fresh else held
        held, fresh = a, False
        if tail:
            pushes.append((t, obs[t], a, float(rew[t]), nobs[t],
                           bool(done[t])))
            tail, fresh, buf, s = False, True, [], 0.0
        else:
            buf.append((obs[t], float(rew[t])))
            s += float(rew[t])
            if s > cfg.r_thres or len(buf) > cfg.pass_thres or done[t]:
                ss = s
                for (o, r) in buf:
                    pushes.append((t, o, a, ss, nobs[t], bool(done[t])))
                    ss -= r
                tail, buf, s = True, [], 0.0
    return pushes


def _run_machine(rl, rew, done, obs, nobs, cfg: SegmentConfig):
    """Drive the batched machinery one env at a time, collecting valid
    records in emission order."""
    t_steps, b = rew.shape
    d = obs.shape[-1]
    hold = segment_init(b, d, cfg)
    out = []
    for t in range(t_steps):
        hold, action = segment_select_action(hold, jnp.asarray(rl[t]))
        hold, recs = segment_push(hold, jnp.asarray(obs[t]),
                                  jnp.asarray(rew[t]),
                                  jnp.asarray(nobs[t]),
                                  jnp.asarray(done[t]), cfg)
        valid = np.asarray(recs.valid)
        for e in range(b):
            for i in range(valid.shape[1]):
                if valid[e, i]:
                    out.append((e, t, np.asarray(recs.obs)[e, i],
                                int(np.asarray(recs.action)[e, i]),
                                float(np.asarray(recs.value)[e, i]),
                                np.asarray(recs.next_obs)[e, i],
                                bool(np.asarray(recs.done)[e, i])))
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_segment_push_matches_reference_oracle(seed):
    rng = np.random.default_rng(seed)
    t_steps, b, d = 60, 3, 4
    cfg = SegmentConfig(r_thres=1.0, pass_thres=10)
    rl = rng.integers(0, 11, (t_steps, b))
    rew = rng.normal(0.25, 0.5, (t_steps, b)).astype(np.float32)
    done = rng.random((t_steps, b)) < 0.08
    obs = rng.normal(0, 1, (t_steps, b, d)).astype(np.float32)
    nobs = rng.normal(0, 1, (t_steps, b, d)).astype(np.float32)

    got = _run_machine(rl, rew, done, obs, nobs, cfg)
    for e in range(b):
        want = _oracle(rl[:, e], rew[:, e], done[:, e], obs[:, e, :],
                       nobs[:, e, :], cfg)
        have = [g for g in got if g[0] == e]
        assert len(have) == len(want), (e, len(have), len(want))
        for (t_w, o_w, a_w, v_w, n_w, d_w), \
                (_, t_h, o_h, a_h, v_h, n_h, d_h) in zip(want, have):
            assert t_w == t_h
            assert a_w == a_h
            assert d_w == d_h
            np.testing.assert_allclose(o_h, o_w, atol=1e-6)
            np.testing.assert_allclose(n_h, n_w, atol=1e-6)
            np.testing.assert_allclose(v_h, v_w, atol=1e-5)


def test_segment_trigger_on_length():
    """A zero-reward stream must trigger purely on pass_thres (len >
    pass_thres, i.e. at entry pass_thres + 1) and the suffix values are
    all zero."""
    cfg = SegmentConfig(r_thres=1.0, pass_thres=3)
    b, d = 2, 3
    hold = segment_init(b, d, cfg)
    zeros = jnp.zeros((b,), jnp.float32)
    obs = jnp.zeros((b, d), jnp.float32)
    done = jnp.zeros((b,), bool)
    for step in range(cfg.pass_thres + 1):
        hold, _ = segment_select_action(hold, jnp.full((b,), 5, jnp.int32))
        hold, recs = segment_push(hold, obs, zeros, obs, done, cfg)
        n_valid = int(np.asarray(recs.valid).sum())
        if step < cfg.pass_thres:
            assert n_valid == 0
        else:
            assert n_valid == b * (cfg.pass_thres + 1)
            assert bool(np.asarray(hold.tail).all())
            np.testing.assert_array_equal(np.asarray(recs.action)[
                np.asarray(recs.valid)], 5)


def test_trustset_trainer_integrates():
    """The full trustset DQN loop (act-hold -> planner executes the
    held candidate -> segment push -> prioritized replay -> trust-set
    punished TD) runs, pushes segment records, and learns on finite
    losses."""
    from dcarl_tpu.config import DQNConfig, EnvConfig
    from dcarl_tpu.models.segment import make_trustset_trainer

    init_fn, run_fn = make_trustset_trainer(
        env_cfg=EnvConfig(reset_jitter=0.05),
        dqn_cfg=DQNConfig(batch_size=8, replay_capacity=1 << 10),
        seg_cfg=SegmentConfig(r_thres=1.0, pass_thres=3),
        batch=8,
        replay_capacity=1 << 10,
        trustset_capacity=1 << 10,
    )
    carry = init_fn(seed=0)
    carry, metrics = run_fn(carry, jax.random.PRNGKey(1), 12)
    m = {k: np.asarray(v) for k, v in metrics.items()}
    assert int(m["pushed"].sum()) > 0, "no segment records pushed"
    assert int(m["segments_closed"].sum()) > 0, "no segment ever closed"
    assert int(m["replay_size"][-1]) > 0
    assert int(m["ts_rows"][-1]) > 0, "trust set never grew"
    assert np.isfinite(m["loss"]).all()
    # act-hold actually holds: most steps run with an open segment
    assert m["held_fraction"][-1] > 0.5
