"""Multi-device parity tests on the virtual 8-device CPU mesh —
the collective-vs-single-device equivalence strategy that replaces the
reference's MPI-vs-local tests (test_mpi_adam.py pattern, SURVEY.md §4)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from dcarl_tpu.core import store as S
from dcarl_tpu.parallel import distributed as DD
from dcarl_tpu.parallel import mesh as M
from dcarl_tpu.parallel import normalize as NM
from dcarl_tpu.parallel import sharded_store as SS

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multi-device (virtual) mesh")


def test_sharded_store_matches_single_device():
    mesh = M.make_mesh("env")
    d = 6
    rng = np.random.default_rng(0)
    n = 100
    keys = jnp.asarray(rng.normal(0, 3, (n, d)), jnp.float32)
    actions = jnp.asarray(rng.integers(0, 8, n), jnp.float32)
    values = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    mask = jnp.asarray(rng.random(n) < 0.9)
    w = jnp.asarray(np.abs(rng.normal(1.5, 0.5, d)) + 0.3, jnp.float32)
    queries = jnp.asarray(rng.normal(0, 3, (32, d)), jnp.float32)

    # single-device reference
    single = S.store_init(256, d)
    single = S.store_insert(single, keys, actions, values, mask)
    ref = S.box_query_stats(single, queries, w, use_pallas=False)

    # sharded
    sstore = SS.sharded_store_init(mesh, "env", 256, d)
    sstore = SS.sharded_insert(sstore, mesh, "env", keys, actions, values,
                               mask)
    got = SS.sharded_query_stats(sstore, mesh, "env", queries, w)

    np.testing.assert_array_equal(np.asarray(got.count), np.asarray(ref.count))
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(ref.mean),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(ref.var),
                               atol=1e-4)
    # total rows stored matches the mask count
    assert int(jnp.sum(sstore.size)) == int(mask.sum())


def test_sharded_insert_accumulates():
    mesh = M.make_mesh("env")
    d = 3
    sstore = SS.sharded_store_init(mesh, "env", 64, d)
    for i in range(5):
        keys = jnp.full((4, d), float(i))
        sstore = SS.sharded_insert(sstore, mesh, "env", keys,
                                   jnp.zeros(4), jnp.full((4,), float(i)),
                                   jnp.ones(4, bool))
    assert int(jnp.sum(sstore.size)) == 20


def test_data_parallel_update_matches_single():
    """pmean-reduced data-parallel Adam step == single-device step on
    the concatenated batch (the MpiAdam equivalence contract)."""
    mesh = M.make_mesh("env")
    n_dev = len(jax.devices())
    rng = np.random.default_rng(1)

    dim, out = 8, 4
    w0 = jnp.asarray(rng.normal(0, 0.1, (dim, out)), jnp.float32)
    params = {"w": w0}
    tx = optax.adam(1e-2)

    def loss_fn(p, batch):
        x, y = batch
        pred = x @ p["w"]
        return jnp.mean((pred - y) ** 2)

    B = n_dev * 16
    x = jnp.asarray(rng.normal(0, 1, (B, dim)), jnp.float32)
    y = jnp.asarray(rng.normal(0, 1, (B, out)), jnp.float32)

    # single-device step
    loss_s, grads = jax.value_and_grad(loss_fn)(params, (x, y))
    upd, opt_s = tx.update(grads, tx.init(params), params)
    params_single = optax.apply_updates(params, upd)

    # distributed step
    step = DD.make_data_parallel_update(loss_fn, tx, mesh, "env")
    params_d, _, loss_d = step(params, tx.init(params),
                               (M.shard_leading(x, mesh),
                                M.shard_leading(y, mesh)))

    np.testing.assert_allclose(float(loss_d), float(loss_s), atol=1e-6)
    np.testing.assert_allclose(np.asarray(params_d["w"]),
                               np.asarray(params_single["w"]), atol=1e-6)


def test_rms_distributed_matches_global():
    mesh = M.make_mesh("env")
    n_dev = len(jax.devices())
    rng = np.random.default_rng(2)
    B = n_dev * 32
    batch = jnp.asarray(rng.normal(3, 2, (B, 5)), jnp.float32)

    rms0 = NM.rms_init((5,))
    ref = NM.rms_update(rms0, batch)

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    f = shard_map(
        lambda b: NM.rms_update_distributed(rms0, b, "env"),
        mesh=mesh, in_specs=P("env"), out_specs=P(),
        check_vma=False,
    )
    got = f(M.shard_leading(batch, mesh))
    np.testing.assert_allclose(np.asarray(got.mean), np.asarray(ref.mean),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.var), np.asarray(ref.var),
                               rtol=1e-4)
    np.testing.assert_allclose(float(got.count), float(ref.count), atol=1e-5)


def test_vec_normalize_semantics():
    st = NM.vec_normalize_init((3,), batch=4)
    obs = jnp.ones((4, 3)) * 2.0
    rew = jnp.asarray([1.0, -1.0, 0.5, 0.0])
    done = jnp.asarray([False, True, False, False])
    st = NM.vec_normalize_update(st, obs, rew, done, gamma=0.9)
    assert float(st.returns[1]) == 0.0  # reset where done
    assert float(st.returns[0]) == pytest.approx(1.0)
    n_obs = NM.normalize_obs(st, obs)
    assert np.isfinite(np.asarray(n_obs)).all()
