"""Lane-major fast driver == readable driver.

The fast path (planning/fast_rollout.py) re-lays-out the entire
env->planner->controller tick for TPU lanes; these tests pin its
semantics to the readable batch-first path (planning/rollout.py), which
itself is pinned to the reference call stack (SURVEY.md §3.2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcarl_tpu.config import EnvConfig, WerlingConfig
from dcarl_tpu.env.scenario import t_intersection
from dcarl_tpu.planning.fast_rollout import (_plan_lattice, _project_ego,
                                             _build_tables,
                                             make_rule_driver_fast)
from dcarl_tpu.planning.rollout import make_rule_driver


def test_fast_driver_matches_readable_driver():
    """Full closed-loop parity over enough steps to cross episode ends
    (pass events + auto-resets), f64, zero reset jitter so both key
    streams are irrelevant."""
    sc = t_intersection()
    cfg = EnvConfig(reset_jitter=0.0)
    B, S = 16, 300
    dtype = jnp.float64

    init_s, run_s = make_rule_driver(sc, cfg, dtype=dtype)
    init_f, run_f = make_rule_driver_fast(sc, cfg, dtype=dtype)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    carry_s = init_s(keys)
    carry_f = init_f(keys)

    sk_slow = jax.random.split(jax.random.PRNGKey(1), B * S).reshape(B, S, 2)
    sk_fast = jax.random.split(jax.random.PRNGKey(1), S)

    _, (r_s, d_s, p_s, c_s) = run_s(carry_s, sk_slow)     # [B, S]
    _, (r_f, d_f, p_f, c_f) = run_f(carry_f, sk_fast)     # [S, B]

    r_s, d_s, p_s, c_s = (np.asarray(a).T for a in (r_s, d_s, p_s, c_s))
    np.testing.assert_allclose(np.asarray(r_f), r_s, rtol=1e-9, atol=1e-9)
    assert (np.asarray(d_f) == d_s).all()
    assert (np.asarray(p_f) == p_s).all()
    assert (np.asarray(c_f) == c_s).all()
    # the scenario actually exercises episode ends in this window
    assert d_s.any()


def test_fast_driver_f32_close():
    """f32 cross-layout drift stays at float-noise level over a short
    horizon (different reduction orders, same math)."""
    sc = t_intersection()
    cfg = EnvConfig(reset_jitter=0.0)
    B, S = 8, 30

    init_s, run_s = make_rule_driver(sc, cfg, dtype=jnp.float32)
    init_f, run_f = make_rule_driver_fast(sc, cfg, dtype=jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    _, (r_s, d_s, _, _) = run_s(init_s(keys),
                                jax.random.split(jax.random.PRNGKey(1),
                                                 B * S).reshape(B, S, 2))
    _, (r_f, d_f, _, _) = run_f(init_f(keys),
                                jax.random.split(jax.random.PRNGKey(1), S))
    np.testing.assert_allclose(np.asarray(r_f), np.asarray(r_s).T,
                               rtol=1e-3, atol=1e-3)


def test_project_ego_matches_geometry_op():
    """The fused lane-major projection equals ops.geometry's
    cartesian_to_frenet on random poses around the path."""
    from dcarl_tpu.ops import spline as spl
    from dcarl_tpu.ops.geometry import cartesian_to_frenet

    sc = t_intersection()
    ref = np.asarray(sc.ref_path, np.float64)
    rp = spl.refpath_from_xy(jnp.asarray(ref[:, 0]), jnp.asarray(ref[:, 1]))
    rp_host = {
        "s": np.asarray(rp.s), "ax": np.asarray(rp.sx.a),
        "bx": np.asarray(rp.sx.b), "cx": np.asarray(rp.sx.c),
        "dx": np.asarray(rp.sx.d), "ay": np.asarray(rp.sy.a),
        "by": np.asarray(rp.sy.b), "cy": np.asarray(rp.sy.c),
        "dy": np.asarray(rp.sy.d),
    }
    tab = _build_tables(ref, rp_host)

    rng = np.random.default_rng(0)
    n = 64
    base = ref[rng.integers(0, len(ref), n)]
    px = base[:, 0] + rng.normal(0, 3.0, n)
    py = base[:, 1] + rng.normal(0, 3.0, n)
    vx = rng.normal(0, 5.0, n)
    vy = rng.normal(0, 5.0, n)

    s0, d, vd = _project_ego(jnp.asarray(px), jnp.asarray(py),
                             jnp.asarray(vx), jnp.asarray(vy),
                             tab, np.float64)

    line = jnp.asarray(ref)
    for i in range(n):
        f = cartesian_to_frenet(px[i], py[i], vx[i], vy[i], 0.0, line)
        np.testing.assert_allclose(float(s0[i]), float(f.s), atol=1e-9)
        np.testing.assert_allclose(float(d[i]), float(f.d), atol=1e-9)
        np.testing.assert_allclose(float(vd[i]), float(f.vd), atol=1e-9)


def test_fast_lattice_matches_werling_plan():
    from dcarl_tpu.ops import spline as spl
    from dcarl_tpu.planning import werling as W

    sc = t_intersection()
    wcfg = WerlingConfig()
    ref = np.asarray(sc.ref_path, np.float64)
    rp = spl.refpath_from_xy(jnp.asarray(ref[:, 0]), jnp.asarray(ref[:, 1]))
    rp_host = {
        "s": np.asarray(rp.s), "ax": np.asarray(rp.sx.a),
        "bx": np.asarray(rp.sx.b), "cx": np.asarray(rp.sx.c),
        "dx": np.asarray(rp.sx.d), "ay": np.asarray(rp.sy.a),
        "by": np.asarray(rp.sy.b), "cy": np.asarray(rp.sy.c),
        "dy": np.asarray(rp.sy.d),
    }
    tab = _build_tables(ref, rp_host)

    rng = np.random.default_rng(1)
    b = 8
    s0 = jnp.asarray(rng.uniform(1.0, 30.0, b))
    c_d = jnp.asarray(rng.normal(0, 1.0, b))
    c_d_d = jnp.asarray(rng.normal(0, 0.5, b))
    c_speed = jnp.asarray(rng.uniform(0.0, 10.0, b))

    fast = _plan_lattice(s0, c_d, c_d_d, c_speed, tab, wcfg, np.float64)

    for i in range(b):
        start = W.FrenetStart(s0=s0[i], c_d=c_d[i], c_d_d=c_d_d[i],
                              c_d_dd=jnp.zeros(()), c_speed=c_speed[i])
        ref_lat = W.plan(rp, start, wcfg)
        np.testing.assert_allclose(np.asarray(fast.x[:, :, i]),
                                   np.asarray(ref_lat.x), atol=1e-9)
        np.testing.assert_allclose(np.asarray(fast.y[:, :, i]),
                                   np.asarray(ref_lat.y), atol=1e-9)
        np.testing.assert_allclose(np.asarray(fast.cf[:, i]),
                                   np.asarray(ref_lat.cf), atol=1e-9)
        assert (np.asarray(fast.feasible[:, i])
                == np.asarray(ref_lat.feasible)).all()


def test_fast_collector_matches_readable_collector():
    """HRL value-collection loop parity: trigger/lock, round-robin
    rotation, and episode-return records across resets."""
    from dcarl_tpu.planning.fast_rollout import make_collector_fast
    from dcarl_tpu.planning.rollout import make_collector

    sc = t_intersection()
    cfg = EnvConfig(reset_jitter=0.0)
    B, S = 12, 300
    dtype = jnp.float64

    init_s, run_s = make_collector(sc, cfg, dtype=dtype)
    init_f, run_f = make_collector_fast(sc, cfg, dtype=dtype)

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    sk_slow = jax.random.split(jax.random.PRNGKey(1), B * S).reshape(B, S, 2)
    sk_fast = jax.random.split(jax.random.PRNGKey(1), S)

    _, rec_s = run_s(init_s(keys), sk_slow)     # fields [B, S]
    _, rec_f = run_f(init_f(keys), sk_fast)     # fields [S, B]

    assert (np.asarray(rec_f.done) == np.asarray(rec_s.done).T).all()
    assert (np.asarray(rec_f.used_action)
            == np.asarray(rec_s.used_action).T).all()
    assert (np.asarray(rec_f.rule_index)
            == np.asarray(rec_s.rule_index).T).all()
    np.testing.assert_allclose(np.asarray(rec_f.reward),
                               np.asarray(rec_s.reward).T, atol=1e-9)
    np.testing.assert_allclose(np.asarray(rec_f.episode_return),
                               np.asarray(rec_s.episode_return).T, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(rec_f.recorded_state),
        np.transpose(np.asarray(rec_s.recorded_state), (1, 2, 0)), atol=1e-9)
    # the window exercises triggers, episode ends, and action rotation
    d = np.asarray(rec_s.done)
    assert d.any()
    assert (np.asarray(rec_s.used_action).max() >= 1)


def test_gated_driver_confidence_activation():
    """Deployment-mode gated driver: an empty store falls back to the
    rule pick everywhere; a store seeded so one candidate clearly beats
    the rule (Welch z-test) activates exactly that candidate wherever
    eligibility holds — and the gated stats match the readable
    all_action_stats + act_test composition."""
    from dcarl_tpu.config import StoreConfig
    from dcarl_tpu.core import rls as RLSmod
    from dcarl_tpu.core.store import (ConfidenceStore, FIELD_HALF_WIDTHS,
                                      box_query_stats)
    from dcarl_tpu.planning.fast_rollout import make_gated_driver_fast

    sc = t_intersection()
    cfg = EnvConfig(reset_jitter=0.0)
    scfg = StoreConfig(visited_times_thres=10, rl_visited_times_min=5)
    B, S = 8, 20
    dtype = jnp.float64

    init_f, run_f = make_gated_driver_fast(sc, cfg, store_cfg=scfg,
                                           dtype=dtype, use_pallas=False)
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    carry = init_f(keys)
    sk = jax.random.split(jax.random.PRNGKey(1), S)

    # empty store -> pure rule behavior == the fast rule driver
    n_rows = 256
    d = len(FIELD_HALF_WIDTHS)
    empty_keys = jnp.zeros((n_rows, d), jnp.float32)
    empty_vals = jnp.zeros((n_rows,), jnp.float32)
    empty_valid = jnp.zeros((n_rows,), bool)
    _, (r_g, d_g, p_g, c_g, act_g, gate_g) = run_f(
        carry, sk, empty_keys, empty_vals, empty_valid)
    assert (np.asarray(gate_g) == 0).all()  # empty store: gate never fires

    init_r, run_r = make_rule_driver_fast(sc, cfg, dtype=dtype)
    carry_r = init_r(keys)
    _, (r_r, d_r, _, _) = run_r(carry_r, sk)
    np.testing.assert_allclose(np.asarray(r_g), np.asarray(r_r), atol=1e-9)

    # seeded store: candidate action 3 has many high-value entries near
    # the ACTUAL start observation (world-frame objects included); the
    # rule key (0) gets many low-value entries
    from dcarl_tpu.env import driving_env as de_mod

    sa = de_mod.scenario_to_device(sc, dtype)
    idx0 = de_mod.in_state_indices(sc)
    env0 = de_mod.reset(sa, keys[0], cfg)
    _, obs0_j = de_mod.wrap_state(env0, sa, idx0, cfg)
    obs0 = np.asarray(obs0_j)
    rng = np.random.default_rng(2)
    rows, vals = [], []
    for _ in range(40):
        base = obs0 + rng.normal(0, 0.05, 20)
        rows.append(np.concatenate([base, [0.0]]))
        vals.append(-5.0 + rng.normal(0, 0.1))
        rows.append(np.concatenate([base, [3.0]]))
        vals.append(5.0 + rng.normal(0, 0.1))
    pad = n_rows - len(rows)
    keys_np = np.concatenate([np.asarray(rows),
                              np.full((pad, d), 1e6)]).astype(np.float32)
    vals_np = np.concatenate([np.asarray(vals), np.zeros(pad)]).astype(np.float32)
    valid_np = np.concatenate([np.ones(len(rows), bool), np.zeros(pad, bool)])

    carry2 = init_f(keys)
    _, (r2, d2, p2, c2, act2, _gate2) = run_f(carry2, jax.random.split(
        jax.random.PRNGKey(1), 3), jnp.asarray(keys_np),
        jnp.asarray(vals_np), jnp.asarray(valid_np))
    # first step: every env sits at the seeded observation -> candidate 3
    assert (np.asarray(act2)[0] == 3).all()

    # cross-check the gate against the readable composition
    store = ConfidenceStore(jnp.asarray(keys_np, jnp.float64),
                            jnp.asarray(keys_np[:, -1], jnp.float64),
                            jnp.asarray(vals_np, jnp.float64),
                            jnp.asarray(len(rows), jnp.int32),
                            jnp.asarray(0, jnp.int32))
    obs_b = jnp.asarray(np.tile(obs0, (4, 1)))
    stats = RLSmod.all_action_stats(store, obs_b,
                                    jnp.asarray(FIELD_HALF_WIDTHS, jnp.float64),
                                    11, use_pallas=False)
    g = RLSmod.act_test(stats, scfg)
    assert (np.asarray(g) == 3).all()
