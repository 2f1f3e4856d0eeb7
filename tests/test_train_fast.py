"""Lane-major integrated trainer: equivalence with the readable trainer.

The fast trainer (train_fast.py) re-lays the planning/env half of the
integrated SPMD step in the batch-last layout; with zero reset jitter
and the same PRNG key it must reproduce the readable trainer
(train.py) step for step — same gating decisions, same store growth,
same TD batches, same metrics.  This is the same pinning strategy as
tests/test_fast_rollout.py (DESIGN.md §4b: "fast can never drift from
correct silently").
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcarl_tpu.config import DCARLConfig, DQNConfig, EnvConfig
from dcarl_tpu.parallel.mesh import make_mesh
from dcarl_tpu.train import make_trainer
from dcarl_tpu.train_fast import make_trainer_fast


def _cfg():
    return DCARLConfig(
        env=EnvConfig(reset_jitter=0.0),
        dqn=DQNConfig(batch_size=8, replay_capacity=256,
                      target_update_every=3),
    )


@pytest.fixture(scope="module")
def trainers():
    cfg = _cfg()
    devices = jax.devices()[:2]
    mesh = make_mesh("env", devices)
    kw = dict(batch_per_device=4, store_capacity_per_device=512,
              replay_capacity_per_device=128)
    init_a, step_a, _ = make_trainer(mesh, "env", cfg, **kw)
    init_b, step_b, _, run_factory = make_trainer_fast(
        mesh, "env", cfg, use_pallas=False, **kw)
    return init_a, step_a, init_b, step_b, run_factory


def test_fast_trainer_matches_readable(trainers):
    init_a, step_a, init_b, step_b, _ = trainers
    sa = init_a(seed=0)
    sb = init_b(seed=0)

    # identical initial params and observations (modulo layout)
    for la, lb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    np.testing.assert_allclose(
        np.asarray(sa.obs_ori), np.transpose(np.asarray(sb.obs_ori),
                                             (0, 2, 1)), rtol=1e-6)

    for step in range(6):
        key = jax.random.PRNGKey(100 + step)
        sa, ma = step_a(sa, key)
        sb, mb = step_b(sb, key)
        for name in ma._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(ma, name)), np.asarray(getattr(mb, name)),
                rtol=1e-4, atol=1e-5, err_msg=f"step {step} metric {name}")

    # store contents grew identically (same gating -> same records)
    np.testing.assert_array_equal(np.asarray(sa.store_size),
                                  np.asarray(sb.store_size))
    np.testing.assert_allclose(np.asarray(sa.store_values),
                               np.asarray(sb.store_values),
                               rtol=1e-5, atol=1e-6)
    # learner params stayed in lockstep through 6 updates
    for la, lb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4, atol=1e-6)


def test_fast_trainer_scanned_runner(trainers):
    _, _, init_b, step_b, run_factory = trainers
    run3 = run_factory(3)
    s0 = init_b(seed=1)
    s_scan, ms = run3(s0, jax.random.PRNGKey(7))
    assert np.asarray(ms.reward_mean).shape == (3,)
    # the scanned runner must agree with 3 sequential step_fn calls
    s_seq = init_b(seed=1)
    keys = jax.random.split(jax.random.PRNGKey(7), 3)
    for k in keys:
        s_seq, m = step_b(s_seq, k)
    np.testing.assert_allclose(np.asarray(m.reward_mean),
                               np.asarray(ms.reward_mean)[-1],
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(s_seq.store_size),
                                  np.asarray(s_scan.store_size))


def test_fast_trainer_pallas_branch_interpret():
    """The use_pallas=True branch (the flagship TPU path, default on
    TPU and used by bench.py) must agree with the _raw_moments branch on
    the trainer's own query shapes/dtypes — run it in interpret mode on
    the CPU mesh and pin the two step-for-step."""
    cfg = _cfg()
    mesh = make_mesh("env", jax.devices()[:1])
    kw = dict(batch_per_device=4, store_capacity_per_device=512,
              replay_capacity_per_device=128)
    init_raw, step_raw, _, _ = make_trainer_fast(
        mesh, "env", cfg, use_pallas=False, **kw)
    init_pl, step_pl, _, _ = make_trainer_fast(
        mesh, "env", cfg, use_pallas=True, pallas_interpret=True, **kw)

    sr = init_raw(seed=3)
    sp = init_pl(seed=3)
    for step in range(4):
        key = jax.random.PRNGKey(50 + step)
        sr, mr = step_raw(sr, key)
        sp, mp = step_pl(sp, key)
        for name in mr._fields:
            np.testing.assert_allclose(
                np.asarray(getattr(mr, name)), np.asarray(getattr(mp, name)),
                rtol=1e-4, atol=1e-5, err_msg=f"step {step} metric {name}")
    np.testing.assert_array_equal(np.asarray(sr.store_size),
                                  np.asarray(sp.store_size))
    np.testing.assert_allclose(np.asarray(sr.store_values),
                               np.asarray(sp.store_values),
                               rtol=1e-5, atol=1e-6)


def test_fast_trainer_jitter_distributional():
    """With nonzero reset_jitter (the default regime) the fast and
    readable trainers draw reset randomness in different block orders,
    so they are only distribution-equivalent.  Assert the aggregate
    statistics agree over a multi-step run."""
    cfg = DCARLConfig(
        env=EnvConfig(reset_jitter=0.1),
        dqn=DQNConfig(batch_size=8, replay_capacity=256,
                      target_update_every=3),
    )
    mesh = make_mesh("env", jax.devices()[:2])
    kw = dict(batch_per_device=16, store_capacity_per_device=2048,
              replay_capacity_per_device=256)
    init_a, step_a, _ = make_trainer(mesh, "env", cfg, **kw)
    init_b, step_b, _, _ = make_trainer_fast(
        mesh, "env", cfg, use_pallas=False, **kw)

    sa, sb = init_a(seed=0), init_b(seed=0)
    rew_a, rew_b = [], []
    n_steps = 12
    for step in range(n_steps):
        key = jax.random.PRNGKey(900 + step)
        sa, ma = step_a(sa, key)
        sb, mb = step_b(sb, key)
        rew_a.append(float(ma.reward_mean))
        rew_b.append(float(mb.reward_mean))

    # store growth rates match exactly: flush cadence is jitter-free
    # (driven by buffer fill / dones, which agree in distribution and,
    # for the flush path, in count)
    grow_a = int(np.sum(np.asarray(sa.store_size)))
    grow_b = int(np.sum(np.asarray(sb.store_size)))
    assert abs(grow_a - grow_b) <= 0.2 * max(grow_a, grow_b, 1)
    # reward trajectories agree to jitter-scale tolerance
    np.testing.assert_allclose(np.mean(rew_a), np.mean(rew_b),
                               rtol=0.2, atol=0.05)


def test_fast_trainer_8dev_mesh():
    """Full-mesh dryrun: the flagship multi-chip path compiles and runs
    on all 8 virtual devices."""
    cfg = _cfg()
    mesh = make_mesh("env", jax.devices())
    init_fn, step_fn, _, _ = make_trainer_fast(
        mesh, "env", cfg, batch_per_device=2,
        store_capacity_per_device=128, replay_capacity_per_device=64,
        use_pallas=False)
    state = init_fn(seed=0)
    state, metrics = step_fn(state, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics.loss))
    assert float(metrics.rule_fraction) >= 0.0


def test_backfill_budget_and_dense_writes():
    """The compacted-backfill and dense-block write paths must preserve
    the exact path's query-visible behavior: with an ample budget the
    three trainers (exact scatter / budgeted scatter / dense blocks)
    produce identical metrics step for step, dropped_records stays 0,
    and a starved budget reports drops instead of failing silently."""
    cfg = _cfg()
    mesh = make_mesh("env", jax.devices()[:1])
    B, W = 4, cfg.store.n_step_window
    cap = 256  # divisible by B + budget for the dense variant
    budget = 60
    assert cap % (B + budget) == 0

    kw = dict(batch_per_device=B, store_capacity_per_device=cap,
              replay_capacity_per_device=128, use_pallas=False)
    init_e, step_e, _, _ = make_trainer_fast(mesh, "env", cfg, **kw)
    init_b, step_b, _, _ = make_trainer_fast(
        mesh, "env", cfg, backfill_budget_per_step=budget, **kw)
    init_d, step_d, _, _ = make_trainer_fast(
        mesh, "env", cfg, backfill_budget_per_step=budget,
        dense_store_writes=True, **kw)

    se, sb, sd = init_e(seed=5), init_b(seed=5), init_d(seed=5)
    for step in range(30):
        key = jax.random.PRNGKey(300 + step)
        se, me = step_e(se, key)
        sb, mb = step_b(sb, key)
        sd, md = step_d(sd, key)
        assert float(mb.dropped_records) == 0.0
        assert float(md.dropped_records) == 0.0
        for name in ("reward_mean", "loss", "rule_fraction"):
            np.testing.assert_allclose(
                np.asarray(getattr(me, name)), np.asarray(getattr(mb, name)),
                rtol=1e-5, err_msg=f"budget step {step} {name}")
            np.testing.assert_allclose(
                np.asarray(getattr(me, name)), np.asarray(getattr(md, name)),
                rtol=1e-5, err_msg=f"dense step {step} {name}")
    # budgeted store contents == exact store contents (same slots)
    np.testing.assert_array_equal(np.asarray(se.store_size),
                                  np.asarray(sb.store_size))
    np.testing.assert_allclose(np.asarray(se.store_values),
                               np.asarray(sb.store_values), atol=1e-6)
    # dense store holds the same VALID rows (sentinels occupy extra
    # slots); compare the sets of real keys
    dk = np.asarray(sd.store_keys)[0]
    real = dk[:, 0] < 1e8
    n_real = int(real.sum())
    assert n_real <= int(np.asarray(sd.store_size)[0])

    # starved budget: drops are counted, not silent.  Short episodes
    # force synchronized terminal backfills (4 envs x up-to-8 rows per
    # done step) through a budget of 2.
    cfg_short = DCARLConfig(
        env=EnvConfig(reset_jitter=0.0, max_episode_steps=8),
        dqn=DQNConfig(batch_size=8, replay_capacity=256,
                      target_update_every=3),
    )
    init_s, step_s, _, _ = make_trainer_fast(
        mesh, "env", cfg_short, backfill_budget_per_step=2, **kw)
    ss = init_s(seed=5)
    drops = 0.0
    for step in range(20):
        ss, msd = step_s(ss, jax.random.PRNGKey(300 + step))
        drops += float(msd.dropped_records)
    assert drops > 0.0
