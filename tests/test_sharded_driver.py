"""Sharded lane-major driver: 1-device vs 8-device equivalence.

The mesh-sharded rule driver is collective-free data parallelism; its
outputs must be bit-identical to the unsharded program (the
Dummy-vs-Subproc parity pattern of the reference's test_vec_envs.py,
re-cast for a device mesh — SURVEY.md §4)."""

import jax
import numpy as np

from dcarl_tpu.config import EnvConfig
from dcarl_tpu.env.scenario import t_intersection
from dcarl_tpu.parallel.mesh import make_mesh
from dcarl_tpu.planning.fast_rollout import (make_rule_driver_fast,
                                             shard_rule_driver)


def test_sharded_driver_matches_unsharded():
    sc = t_intersection()
    cfg = EnvConfig(reset_jitter=0.0)
    init_fn, run_fn = make_rule_driver_fast(sc, env_cfg=cfg)

    batch, steps = 16, 12
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    step_keys = jax.random.split(jax.random.PRNGKey(1), steps)

    carry0 = init_fn(keys)
    _, out0 = run_fn(carry0, step_keys)

    mesh = make_mesh("env", jax.devices())
    init_s, run_s = shard_rule_driver(init_fn, run_fn, mesh, "env")
    carry1 = init_s(keys)
    _, out1 = run_s(carry1, step_keys)

    for a, b, name in zip(out0, out1, ("reward", "done", "passed",
                                       "collided")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_sharded_gated_driver_matches_unsharded():
    """Gated deployment driver under the mesh: envs sharded, store
    sharded, per-shard moments psum'd into global statistics — outputs
    (incl. the z-test activations) bit-equal to the 1-device driver
    over the concatenated batch (RLS.py:120-157 under the mesh)."""
    import jax.numpy as jnp

    from dcarl_tpu.config import StoreConfig, driving_store_config
    from dcarl_tpu.planning.fast_rollout import (make_gated_driver_fast,
                                                 make_gated_driver_sharded)

    cfg = EnvConfig(reset_jitter=0.0)
    scfg = driving_store_config(visited_times_thres=5,
                                rl_visited_times_min=3)
    sc = t_intersection(cfg)

    batch, steps, rows = 16, 10, 64
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    step_keys = jax.random.split(jax.random.PRNGKey(1), steps)

    # store seeded AT the envs' initial states: rule action 0 looks
    # mediocre, action 3 looks strong -> the z-test activates at least
    # on the first ticks (then envs move out of the evidence boxes)
    init_fn, run_fn = make_gated_driver_fast(sc, cfg, store_cfg=scfg,
                                             use_pallas=False)
    carry0 = init_fn(keys)
    from dcarl_tpu.planning import fast_rollout as FR
    from dcarl_tpu.env import driving_env as de
    obs = np.asarray(FR._obs_ori_soa(carry0, de.in_state_indices(sc)))  # [20,B]
    d = cfg.state_dim + 1
    rng = np.random.default_rng(3)
    s_keys = np.zeros((rows, d), np.float32)
    per = rows // batch
    for i in range(batch):
        blk = s_keys[i * per:(i + 1) * per]
        blk[:, :-1] = obs[:, i][None, :] + rng.normal(0, 0.05,
                                                      (per, d - 1))
        blk[:, -1] = np.where(np.arange(per) % 2 == 0, 0.0, 3.0)
    s_vals = np.where(s_keys[:, -1] == 0, 0.05, 3.0).astype(np.float32)
    s_vals += rng.normal(0, 0.01, rows).astype(np.float32)
    s_keys_j = jnp.asarray(s_keys)
    s_vals_j = jnp.asarray(s_vals)
    s_valid = jnp.ones((rows,), bool)

    _, out0 = run_fn(carry0, step_keys, s_keys_j, s_vals_j, s_valid)
    gate0 = np.asarray(out0[5])
    assert (gate0 != 0).any(), "test store must trigger activations"

    mesh = make_mesh("env", jax.devices())
    init_s, run_s = make_gated_driver_sharded(sc, mesh, "env", cfg,
                                              store_cfg=scfg,
                                              use_pallas=False)
    carry1 = init_s(keys)
    _, out1 = run_s(carry1, step_keys, s_keys_j, s_vals_j, s_valid)

    for a, b, name in zip(out0, out1, ("reward", "done", "passed",
                                       "collided", "executed", "gate")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, err_msg=name)
    # activations are integers: exact parity required
    np.testing.assert_array_equal(gate0, np.asarray(out1[5]))


def _seed_store_at_initial_states(obs, rows, batch, d, rng):
    """Evidence at each env's (distinct) initial state: rule action 0
    mediocre, action 3 strong with tight variance."""
    s_keys = np.zeros((rows, d), np.float32)
    per = rows // batch
    for i in range(batch):
        blk = s_keys[i * per:(i + 1) * per]
        blk[:, :-1] = obs[:, i][None, :] + rng.normal(0, 0.05, (per, d - 1))
        blk[:, -1] = np.where(np.arange(per) % 2 == 0, 0.0, 3.0)
    s_vals = np.where(s_keys[:, -1] == 0, 0.05, 3.0).astype(np.float32)
    s_vals += rng.normal(0, 0.01, rows).astype(np.float32)
    return s_keys, s_vals


def test_sharded_gated_driver_jittered_envs():
    """The chimeric-statistics regression: with reset_jitter > 0 every
    env's initial state DIFFERS (init uses per-env keys), so envs on
    different shards are genuinely distinct — a bare psum of
    local-batch moments would mix moments of different envs sharing a
    local index.  The gather-psum-slice path must reproduce the
    1-device driver's per-env statistics: integer gate outputs exactly,
    floats to f32 reduction-order tolerance.  (Steps are kept below any
    possible termination so mid-run auto-reset RNG — drawn in
    per-shard blocks — never fires; init jitter is per-env-keyed and
    shard-layout independent.)"""
    import jax.numpy as jnp

    from dcarl_tpu.config import driving_store_config
    from dcarl_tpu.planning.fast_rollout import (make_gated_driver_fast,
                                                 make_gated_driver_sharded)

    cfg = EnvConfig(reset_jitter=0.3)
    scfg = driving_store_config(visited_times_thres=5,
                                rl_visited_times_min=3)
    sc = t_intersection(cfg)

    batch, steps, rows = 16, 8, 64
    keys = jax.random.split(jax.random.PRNGKey(2), batch)
    step_keys = jax.random.split(jax.random.PRNGKey(3), steps)

    init_fn, run_fn = make_gated_driver_fast(sc, cfg, store_cfg=scfg,
                                             use_pallas=False)
    carry0 = init_fn(keys)
    from dcarl_tpu.env import driving_env as de
    from dcarl_tpu.planning import fast_rollout as FR
    obs = np.asarray(FR._obs_ori_soa(carry0, de.in_state_indices(sc)))
    # jitter must actually have made the envs distinct
    assert np.unique(obs[0]).size > 1, "envs unexpectedly identical"
    s_keys, s_vals = _seed_store_at_initial_states(
        obs, rows, batch, cfg.state_dim + 1, np.random.default_rng(3))
    s_keys_j = jnp.asarray(s_keys)
    s_vals_j = jnp.asarray(s_vals)
    s_valid = jnp.ones((rows,), bool)

    _, out0 = run_fn(carry0, step_keys, s_keys_j, s_vals_j, s_valid)
    gate0 = np.asarray(out0[5])
    assert (gate0 != 0).any(), "test store must trigger activations"
    assert not np.asarray(out0[1]).any(), "no env may terminate (RNG blocks)"

    mesh = make_mesh("env", jax.devices())
    init_s, run_s = make_gated_driver_sharded(sc, mesh, "env", cfg,
                                              store_cfg=scfg,
                                              use_pallas=False)
    carry1 = init_s(keys)
    _, out1 = run_s(carry1, step_keys, s_keys_j, s_vals_j, s_valid)

    np.testing.assert_array_equal(gate0, np.asarray(out1[5]))
    np.testing.assert_array_equal(np.asarray(out0[4]),
                                  np.asarray(out1[4]))  # executed
    np.testing.assert_allclose(np.asarray(out0[0]), np.asarray(out1[0]),
                               atol=1e-5)  # reward


def test_sharded_gated_driver_pallas_interpret():
    """Kernel-under-shard_map composition (the deployment
    configuration): the sharded gated driver with the Pallas per-action
    kernel in interpret mode must match the XLA-path sharded driver —
    exercised off-hardware so the mesh+kernel interaction (gather,
    per-shard kernel launch on local rows, psum) is covered by the
    default suite, with the XLA path as the oracle."""
    import jax.numpy as jnp

    from dcarl_tpu.config import driving_store_config
    from dcarl_tpu.planning.fast_rollout import make_gated_driver_sharded

    cfg = EnvConfig(reset_jitter=0.3)
    scfg = driving_store_config(visited_times_thres=5,
                                rl_visited_times_min=3)
    sc = t_intersection(cfg)

    batch, steps, rows = 16, 3, 64
    keys = jax.random.split(jax.random.PRNGKey(2), batch)
    step_keys = jax.random.split(jax.random.PRNGKey(3), steps)

    mesh = make_mesh("env", jax.devices())
    init_x, run_x = make_gated_driver_sharded(sc, mesh, "env", cfg,
                                              store_cfg=scfg,
                                              use_pallas=False)
    carry = init_x(keys)
    from dcarl_tpu.env import driving_env as de
    from dcarl_tpu.planning import fast_rollout as FR
    obs = np.asarray(FR._obs_ori_soa(carry, de.in_state_indices(sc)))
    s_keys, s_vals = _seed_store_at_initial_states(
        obs, rows, batch, cfg.state_dim + 1, np.random.default_rng(3))
    s_keys_j = jnp.asarray(s_keys)
    s_vals_j = jnp.asarray(s_vals)
    s_valid = jnp.ones((rows,), bool)

    _, out_x = run_x(carry, step_keys, s_keys_j, s_vals_j, s_valid)
    gate_x = np.asarray(out_x[5])
    assert (gate_x != 0).any(), "test store must trigger activations"

    init_p, run_p = make_gated_driver_sharded(sc, mesh, "env", cfg,
                                              store_cfg=scfg,
                                              use_pallas=True,
                                              pallas_interpret=True)
    carry_p = init_p(keys)
    _, out_p = run_p(carry_p, step_keys, s_keys_j, s_vals_j, s_valid)

    np.testing.assert_array_equal(gate_x, np.asarray(out_p[5]))
    np.testing.assert_allclose(np.asarray(out_x[0]), np.asarray(out_p[0]),
                               atol=1e-5)
