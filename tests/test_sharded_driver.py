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
