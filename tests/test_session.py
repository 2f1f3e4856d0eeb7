"""Cross-session lifecycle tests (round-4 VERDICT item 3).

The reference's continuous improvement is multi-session: the RLS
dataset is persisted forever and reloaded on every construction
(deepq/RLS.py:34-76), and the agent is load-or-new
(DCARL_agent.py:18-43).  These tests pin the TPU equivalents:

* save -> restore -> BIT-IDENTICAL continuation of the integrated
  ``FastTrainState`` (every leaf equal to the uninterrupted run),
* train -> spool -> new process-equivalent session -> import the text
  history -> evidence visible to queries -> training continues and the
  history keeps growing.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcarl_tpu.config import DCARLConfig, DQNConfig, driving_store_config
from dcarl_tpu.parallel.mesh import make_mesh
from dcarl_tpu.session import TrainSession, seed_store_from_text

CFG = DCARLConfig(
    dqn=DQNConfig(batch_size=4, replay_capacity=128),
    store=driving_store_config(visited_times_thres=4,
                               rl_visited_times_min=2,
                               n_step_window=2),
)
TRAINER_KW = dict(batch_per_device=4, store_capacity_per_device=128,
                  replay_capacity_per_device=128, use_pallas=False)


def _mesh(n=2):
    return make_mesh("env", jax.devices()[:n])


def test_save_restore_bit_identical_continuation(tmp_path):
    """Checkpoint mid-run, rebuild the trainer from scratch (a fresh
    TrainSession, as a new process would), restore, continue: every
    state leaf must equal the uninterrupted run's bitwise."""
    mesh = _mesh()
    sess = TrainSession(str(tmp_path), mesh, "env", CFG, **TRAINER_KW)
    run3 = sess.run_factory(3)

    k1, k2 = jax.random.PRNGKey(10), jax.random.PRNGKey(20)
    state, step0 = sess.init_or_resume(seed=0)
    assert step0 == 0
    state, _ = run3(state, k1)
    sess.save(state, step=3)
    state_cont, _ = run3(state, k2)          # uninterrupted reference

    sess2 = TrainSession(str(tmp_path), mesh, "env", CFG, **TRAINER_KW)
    restored, step = sess2.init_or_resume(seed=0)
    assert step == 3
    run3b = sess2.run_factory(3)
    state_resumed, _ = run3b(restored, k2)

    leaves_a, tree_a = jax.tree.flatten(state_cont)
    leaves_b, tree_b = jax.tree.flatten(state_resumed)
    assert tree_a == tree_b
    for la, lb in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_spool_import_continue_improving(tmp_path):
    """Session A trains and spools its store history; session B (fresh
    params/replay, different directory) imports the text history, sees
    the evidence in queries, and keeps appending to its own history."""
    mesh = _mesh()
    dir_a, dir_b = str(tmp_path / "a"), str(tmp_path / "b")

    sess_a = TrainSession(dir_a, mesh, "env", CFG, **TRAINER_KW)
    run5 = sess_a.run_factory(5)
    state, _ = sess_a.init_or_resume(seed=0)
    key = jax.random.PRNGKey(0)
    for i in range(3):                        # spool once per chunk
        key, sub = jax.random.split(key)
        state, _ = run5(state, sub)
        sess_a.spool(state)
    sess_a.save(state, step=15)
    hist_a = sess_a.history_rows()
    device_rows = int(np.asarray(state.store_size).sum())
    assert hist_a > 0
    assert hist_a == device_rows  # nothing wrapped at this scale: 1:1

    # --- new session, fresh everything, history imported
    sess_b = TrainSession(dir_b, mesh, "env", CFG, **TRAINER_KW)
    state_b, step_b = sess_b.init_or_resume(seed=99)
    assert step_b == 0
    assert int(np.asarray(state_b.store_size).sum()) == 0
    state_b = seed_store_from_text(state_b, sess_a.state_path,
                                   sess_a.value_path)
    assert int(np.asarray(state_b.store_size).sum()) == hist_a
    np.testing.assert_array_equal(np.asarray(state_b.store_total),
                                  np.asarray(state_b.store_size))

    # imported evidence answers queries (the RLS.py:47-52 reload's
    # whole point): query one imported key, expect >= 1 match
    from dcarl_tpu.core import store as S
    keys0 = np.asarray(state_b.store_keys)[0]
    size0 = int(np.asarray(state_b.store_size)[0])
    store0 = S.ConfidenceStore(
        jnp.asarray(keys0), state_b.store_actions[0],
        state_b.store_values[0], state_b.store_size[0],
        state_b.store_head[0])
    hw = jnp.asarray(CFG.store.half_widths, jnp.float32)
    qs = S.box_query_stats(store0, jnp.asarray(keys0[:1]), hw,
                           use_pallas=False)
    assert size0 > 0 and int(qs.count[0]) >= 1

    # session B keeps improving: more training rows appended to ITS
    # history on top of the imported evidence
    run5b = sess_b.run_factory(5)
    state_b, _ = run5b(state_b, jax.random.PRNGKey(7))
    sess_b.spool(state_b)
    assert sess_b.history_rows() > 0
    assert int(np.asarray(state_b.store_size).sum()) > hist_a \
        or int(np.asarray(state_b.store_total).sum()) > hist_a


def test_store_total_counts_ring_wraps(tmp_path):
    """store_total keeps exact insert counts past capacity, so the
    spooled history can exceed the device working set — the unbounded
    growth contract (RLS.py:185-215) with a fixed-shape device ring."""
    tiny = dict(batch_per_device=8, store_capacity_per_device=32,
                replay_capacity_per_device=32, use_pallas=False)
    mesh = _mesh(1)
    sess = TrainSession(str(tmp_path), mesh, "env", CFG, **tiny)
    run2 = sess.run_factory(2)
    state, _ = sess.init_or_resume(seed=0)
    key = jax.random.PRNGKey(0)
    hist = 0
    for i in range(12):
        key, sub = jax.random.split(key)
        state, _ = run2(state, sub)
        hist += sess.spool(state)
    total = int(np.asarray(state.store_total)[0])
    size = int(np.asarray(state.store_size)[0])
    assert hist == total
    assert size <= 32
    assert total > 32, "test needs the ring to wrap"
    assert sess.history_rows() == total
