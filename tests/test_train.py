"""Integrated-trainer tests: the full SPMD DCARL step on the virtual
mesh, and mesh-size invariance of the global batch semantics."""

import numpy as np
import pytest
import jax

from dcarl_tpu.config import DCARLConfig, DQNConfig
from dcarl_tpu.parallel.mesh import make_mesh
from dcarl_tpu.train import make_trainer


def _tiny_cfg():
    return DCARLConfig(dqn=DQNConfig(batch_size=4, replay_capacity=128))


def test_full_step_runs_on_mesh():
    mesh = make_mesh("env")
    init_fn, step_fn, _ = make_trainer(
        mesh, "env", _tiny_cfg(), batch_per_device=2,
        store_capacity_per_device=64, replay_capacity_per_device=64)
    state = init_fn(seed=0)
    key = jax.random.PRNGKey(1)
    for i in range(3):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, k)
    assert np.isfinite(float(metrics.loss))
    assert int(state.frame) == 3
    # with an empty store the RLS gate forces the rule action everywhere
    assert float(metrics.rule_fraction) == 1.0


def test_records_reach_store_and_drive_metrics():
    mesh = make_mesh("env")
    init_fn, step_fn, _ = make_trainer(
        mesh, "env", _tiny_cfg(), batch_per_device=2,
        store_capacity_per_device=256, replay_capacity_per_device=256)
    state = init_fn(seed=0)
    key = jax.random.PRNGKey(2)
    # after > n_step_window steps the trajectory buffers start flushing
    for i in range(14):
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, k)
    assert int(metrics.store_rows) > 0
    # replay holds one transition per env per step
    assert int(jax.device_get(state.replay.size).sum()) == \
        14 * 2 * len(jax.devices())


def test_single_device_mesh_also_works():
    mesh = make_mesh("env", jax.devices()[:1])
    init_fn, step_fn, _ = make_trainer(
        mesh, "env", _tiny_cfg(), batch_per_device=4,
        store_capacity_per_device=64, replay_capacity_per_device=64)
    state = init_fn(seed=0)
    state, metrics = step_fn(state, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics.loss))
