"""Confidence store + RLS selection tests against brute-force numpy
oracles of the reference semantics (deepq/RLS.py)."""

from collections import deque

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcarl_tpu.config import StoreConfig
from dcarl_tpu.core import rls as R
from dcarl_tpu.core import store as S

CFG = StoreConfig(capacity=512, key_dim=5, n_step_window=10)


def _fill_store(rng, n, d, capacity=512):
    store = S.store_init(capacity, d)
    keys = rng.normal(0, 5, (n, d))
    actions = rng.integers(0, 8, n).astype(float)
    keys[:, -1] = actions
    values = rng.normal(0, 1, n)
    store = S.store_insert(store, jnp.asarray(keys, jnp.float32),
                           jnp.asarray(actions, jnp.float32),
                           jnp.asarray(values, jnp.float32),
                           jnp.ones((n,), bool))
    return store, keys, values


def _oracle_stats(keys, values, q, w):
    inside = np.all(np.abs(keys - q) <= w, axis=1)
    cnt = int(inside.sum())
    if cnt == 0:
        return 0, -1.0, -1.0
    v = values[inside]
    return cnt, float(v.mean()), float(v.var())


def test_box_query_matches_oracle():
    rng = np.random.default_rng(0)
    d = 5
    store, keys, values = _fill_store(rng, 300, d)
    w = np.array([1.0, 2.0, 0.5, 3.0, 0.1])
    queries = rng.normal(0, 5, (64, d))
    queries[:, -1] = rng.integers(0, 8, 64)

    stats = S.box_query_stats(store, jnp.asarray(queries, jnp.float32),
                              jnp.asarray(w, jnp.float32), use_pallas=False)
    for i in range(64):
        cnt, mean, var = _oracle_stats(keys, values, queries[i], w)
        assert int(stats.count[i]) == cnt, i
        np.testing.assert_allclose(float(stats.mean[i]), mean, atol=1e-4)
        np.testing.assert_allclose(float(stats.var[i]), var, atol=1e-4)


def test_pallas_kernel_interpret_matches_xla():
    rng = np.random.default_rng(1)
    d = 21
    n, q = 700, 40
    keys = jnp.asarray(rng.normal(0, 5, (n, d)), jnp.float32)
    values = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    valid = jnp.asarray(rng.random(n) < 0.8)
    queries = jnp.asarray(rng.normal(0, 5, (q, d)), jnp.float32)
    w = jnp.asarray(np.abs(rng.normal(2, 1, d)) + 0.5, jnp.float32)

    from dcarl_tpu.core.store import _raw_moments
    from dcarl_tpu.ops.pallas_store import box_query_moments_pallas

    ref = np.asarray(_raw_moments(keys, values, valid, queries, w))
    got = np.asarray(box_query_moments_pallas(
        keys, values, valid, queries, w,
        q_tile=16, n_tile=256, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_pallas_sorted_kernel_matches_xla():
    """Sorted-band-pruned kernel: exact same moments as the brute
    reduction (moments are order-invariant), including partially-filled
    stores (invalid tail) and padded tiles."""
    rng = np.random.default_rng(2)
    d = 21
    n, q = 700, 40
    keys = jnp.asarray(rng.normal(0, 5, (n, d)), jnp.float32)
    values = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    valid = jnp.asarray(rng.random(n) < 0.6)
    queries = jnp.asarray(rng.normal(0, 5, (q, d)), jnp.float32)
    w = jnp.asarray(np.abs(rng.normal(2, 1, d)) + 0.5, jnp.float32)

    from dcarl_tpu.core.store import _raw_moments
    from dcarl_tpu.ops.pallas_store import box_query_moments_sorted

    ref = np.asarray(_raw_moments(keys, values, valid, queries, w))
    got = np.asarray(box_query_moments_sorted(
        keys, values, valid, queries, w,
        q_tile=16, n_tile=256, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3)

    # empty store: all queries report zero matches
    got0 = np.asarray(box_query_moments_sorted(
        keys, values, jnp.zeros((n,), bool), queries, w,
        q_tile=16, n_tile=256, interpret=True))
    np.testing.assert_allclose(got0, 0.0)


def test_pallas_grouped_kernel_matches_xla():
    """Action-grouped entry point: identical moments to the flat brute
    reduction for the [A, Qa, D] candidate-query layout (the trainer's
    and gated driver's shape), including partially-filled stores."""
    rng = np.random.default_rng(5)
    d, A, Qa = 21, 11, 24
    n = 700
    keys = np.asarray(rng.normal(0, 5, (n, d)), np.float32)
    keys[:, -1] = rng.integers(0, A, n)
    values = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    valid = jnp.asarray(rng.random(n) < 0.6)
    obs = np.asarray(rng.normal(0, 5, (Qa, d - 1)), np.float32)
    queries_g = np.concatenate([
        np.broadcast_to(obs[None], (A, Qa, d - 1)),
        np.broadcast_to(np.arange(A, dtype=np.float32)[:, None, None],
                        (A, Qa, 1))], axis=-1)
    w = jnp.asarray(np.abs(rng.normal(2, 1, d)) + 0.5, jnp.float32)
    w = w.at[-1].set(0.1)

    from dcarl_tpu.core.store import _raw_moments
    from dcarl_tpu.ops.pallas_store import box_query_moments_grouped

    flat_q = jnp.asarray(queries_g.reshape(A * Qa, d))
    ref = np.asarray(_raw_moments(jnp.asarray(keys), values, valid,
                                  flat_q, w)).reshape(A, Qa, 3)
    got = np.asarray(box_query_moments_grouped(
        jnp.asarray(keys), values, valid, jnp.asarray(queries_g), w,
        q_tile=16, n_tile=256, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_store_ring_overwrite():
    d = 3
    store = S.store_init(4, d)
    for i in range(6):
        store = S.store_insert(
            store,
            jnp.full((1, d), float(i)),
            jnp.asarray([float(i)]),
            jnp.asarray([float(i)]),
            jnp.ones((1,), bool))
    assert int(store.size) == 4
    # oldest rows (0, 1) overwritten by (4, 5)
    vals = sorted(np.asarray(store.values).tolist())
    assert vals == [2.0, 3.0, 4.0, 5.0]


def test_store_reject_policy_freezes_prefix():
    """policy='reject': once full, NEW rows are dropped (append-only
    frozen prefix — the dataset-order contract of RLS.py:185-215 under
    a finite budget), size saturates at capacity."""
    d = 3
    store = S.store_init(4, d)
    for i in range(7):
        store = S.store_insert(
            store,
            jnp.full((1, d), float(i)),
            jnp.asarray([float(i)]),
            jnp.asarray([float(i)]),
            jnp.ones((1,), bool),
            policy="reject")
    assert int(store.size) == 4
    assert sorted(np.asarray(store.values).tolist()) == [0.0, 1.0, 2.0, 3.0]

    # a straddling batch keeps exactly the rows that fit, in order
    store2 = S.store_init(4, d)
    store2 = S.store_insert(store2, jnp.zeros((2, d)), jnp.zeros(2),
                            jnp.asarray([10.0, 11.0]), jnp.ones(2, bool),
                            policy="reject")
    store2 = S.store_insert(store2, jnp.zeros((5, d)), jnp.zeros(5),
                            jnp.asarray([12.0, 13.0, 14.0, 15.0, 16.0]),
                            jnp.ones(5, bool), policy="reject")
    assert int(store2.size) == 4
    assert np.asarray(store2.values).tolist() == [10.0, 11.0, 12.0, 13.0]


def test_store_ring_single_batch_overflow():
    """A single batch larger than capacity must land the NEWEST rows
    (defined ring semantics, no duplicate-slot scatter races)."""
    d = 2
    store = S.store_init(4, d)
    vals = jnp.arange(10.0)
    store = S.store_insert(store, jnp.zeros((10, d)), jnp.zeros(10), vals,
                           jnp.ones(10, bool))
    assert int(store.size) == 4
    assert sorted(np.asarray(store.values).tolist()) == [6.0, 7.0, 8.0, 9.0]
    # head advanced by the 4 KEPT rows (the dropped ones never landed);
    # the next insert overwrites the oldest survivor first
    assert int(store.head) == 0

    # queries keep working against the survivors
    stats = S.box_query_stats(store, jnp.zeros((1, d)),
                              jnp.asarray([1.0, 1.0]), use_pallas=False)
    assert int(stats.count[0]) == 4
    np.testing.assert_allclose(float(stats.mean[0]), 7.5, atol=1e-5)


def test_sharded_store_overflow_policies():
    """Fill a sharded store past per-shard capacity under both
    policies; every shard applies the policy to its own ring."""
    from dcarl_tpu.parallel.mesh import make_mesh
    from dcarl_tpu.parallel import sharded_store as SS

    mesh = make_mesh("env", jax.devices()[:4])
    d = 3
    for policy in ("ring", "reject"):
        store = SS.sharded_store_init(mesh, "env", capacity_total=16, key_dim=d)
        n_local = store.keys.shape[1]
        # 3 waves of 16 records -> 12 per shard into capacity 4
        for wave in range(3):
            vals = jnp.arange(16.0) + 100.0 * wave
            store = SS.sharded_insert(store, mesh, "env",
                                      jnp.zeros((16, d)), jnp.zeros(16),
                                      vals, jnp.ones(16, bool), policy=policy)
        sizes = np.asarray(store.size)
        assert (sizes == n_local).all(), sizes
        vals_all = np.sort(np.asarray(store.values).reshape(-1))
        if policy == "ring":
            expect = np.sort((np.arange(16.0) + 200.0))  # newest wave
        else:
            expect = np.sort(np.arange(16.0))            # oldest wave
        np.testing.assert_allclose(vals_all, expect)


def test_store_dense_block_write_matches_scatter_stats():
    """store_insert_dense_block: sentinel rows occupy capacity but can
    never match a query box, so query statistics equal the masked
    scatter's; blocks ring-wrap whole (capacity % M == 0)."""
    rng = np.random.default_rng(9)
    d, m, cap = 4, 8, 32
    w = jnp.asarray([1.0, 1.0, 1.0, 0.1])

    dense = S.store_init(cap, d)
    sparse = S.store_init(cap, d)
    all_keys, all_vals = [], []
    for wave in range(6):  # 48 rows through a 32-cap ring
        keys = rng.normal(0, 2, (m, d)).astype(np.float32)
        keys[:, -1] = rng.integers(0, 3, m)
        vals = rng.normal(0, 1, m).astype(np.float32)
        mask = rng.random(m) < 0.7
        dense = S.store_insert_dense_block(
            dense, jnp.asarray(keys), jnp.asarray(keys[:, -1]),
            jnp.asarray(vals), jnp.asarray(mask))
        sparse = S.store_insert(
            sparse, jnp.asarray(keys), jnp.asarray(keys[:, -1]),
            jnp.asarray(vals), jnp.asarray(mask))
        all_keys.append(keys[mask])
        all_vals.append(vals[mask])

    assert int(dense.size) == cap
    # sentinel rows present but inert: query stats match the RECENT
    # window.  Compare only where both stores still hold the same rows:
    # the dense ring holds the last 4 blocks (32 rows incl. sentinels).
    queries = jnp.asarray(rng.normal(0, 2, (40, d)), jnp.float32)
    queries = queries.at[:, -1].set(
        jnp.asarray(rng.integers(0, 3, 40), jnp.float32))
    sd = S.box_query_stats(dense, queries, w, use_pallas=False)
    # oracle over the dense ring's valid (non-sentinel) contents
    dk = np.asarray(dense.keys)
    dv = np.asarray(dense.values)
    real = dk[:, 0] < S.SENTINEL_KEY / 2
    for i in range(40):
        inside = np.all(np.abs(dk[real] - np.asarray(queries)[i]) <=
                        np.asarray(w), axis=1)
        assert int(sd.count[i]) == int(inside.sum()), i
        if inside.sum():
            np.testing.assert_allclose(float(sd.mean[i]),
                                       dv[real][inside].mean(), atol=1e-5)

    # capacity not a multiple of the block -> explicit error
    with pytest.raises(ValueError):
        S.store_insert_dense_block(S.store_init(30, d), jnp.zeros((8, d)),
                                   jnp.zeros(8), jnp.zeros(8),
                                   jnp.ones(8, bool))


def test_store_spooler_preserves_history_across_wrap():
    """StoreSpooler + ring store == the reference's unbounded
    append-only text history (RLS.py:34-76): spooling at least once per
    `capacity` inserts loses nothing even as the device ring wraps."""
    import os
    import tempfile

    from dcarl_tpu.utils.checkpoint import StoreSpooler

    d = 3
    store = S.store_init(8, d)
    with tempfile.TemporaryDirectory() as tmp:
        sp = StoreSpooler(os.path.join(tmp, "visited_state.txt"),
                          os.path.join(tmp, "visited_value.txt"))
        all_vals = []
        for wave in range(6):
            vals = np.arange(5.0) + 10.0 * wave
            all_vals.extend(vals.tolist())
            store = S.store_insert(
                store, jnp.full((5, d), float(wave)),
                jnp.zeros(5), jnp.asarray(vals, jnp.float32),
                jnp.ones(5, bool))
            appended = sp.spool(store, n_inserted=5)
            assert appended == 5
        assert sp.total_spooled == 30
        hist = np.loadtxt(os.path.join(tmp, "visited_value.txt"), ndmin=2)
        np.testing.assert_allclose(hist[:, 1], np.asarray(all_vals))
        states = np.loadtxt(os.path.join(tmp, "visited_state.txt"), ndmin=2)
        assert states.shape == (30, d)

        # spooling after > capacity inserts must raise, not lose data
        store2 = S.store_insert(
            store, jnp.zeros((9, d)), jnp.zeros(9),
            jnp.arange(9.0), jnp.ones(9, bool))
        with pytest.raises(ValueError):
            sp.spool(store2, n_inserted=9)


def test_masked_insert_skips_invalid():
    d = 2
    store = S.store_init(8, d)
    keys = jnp.asarray([[1.0, 0], [2.0, 0], [3.0, 0]])
    mask = jnp.asarray([True, False, True])
    store = S.store_insert(store, keys, jnp.zeros(3), jnp.asarray([1., 2., 3.]),
                           mask)
    assert int(store.size) == 2
    assert sorted(np.asarray(store.values[:2]).tolist()) == [1.0, 3.0]


def _stats_from_arrays(count, mean, var):
    count = jnp.asarray(count, jnp.float32)
    mean = jnp.asarray(mean, jnp.float32)
    var = jnp.asarray(var, jnp.float32)
    return R.ActionStats(count=count, mean=mean, var=var,
                         sigma=jnp.sqrt(jnp.maximum(var, 0)))


def test_act_test_welch_semantics():
    cfg = StoreConfig()
    # rule: well-explored, poor mean; candidate 3 clearly better
    count = [[40, 2, 10, 30, 10, 10, 10, 10]]
    mean = [[-0.5, 5.0, -0.6, 0.4, -0.55, -0.5, -0.5, -0.5]]
    var = [[0.1] * 8]
    a = R.act_test(_stats_from_arrays(count, mean, var), cfg)
    # candidate 1 has only 2 visits (skipped), candidate 2 is worse
    # (z<0 -> cdf<0.5), candidate 3 passes
    assert int(a[0]) == 3

    # rule near-optimal -> always rule (mean_rule > -0.1 skip)
    mean2 = [[-0.05, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0]]
    a2 = R.act_test(_stats_from_arrays(count, mean2, var), cfg)
    assert int(a2[0]) == 0

    # rule under-explored -> rule
    count3 = [[3, 100, 100, 100, 100, 100, 100, 100]]
    a3 = R.act_test(_stats_from_arrays(count3, mean, var), cfg)
    assert int(a3[0]) == 0

    # lowest-index passing candidate wins (reference loop order)
    mean4 = [[-0.5, -0.5, 1.0, 2.0, -0.5, -0.5, -0.5, -0.5]]
    count4 = [[40, 10, 10, 10, 10, 10, 10, 10]]
    a4 = R.act_test(_stats_from_arrays(count4, mean4, var), cfg)
    assert int(a4[0]) == 2


def test_act_train_gating():
    cfg = StoreConfig()
    key = jax.random.PRNGKey(0)
    # under-explored rule -> forced rule regardless of RL action
    stats = _stats_from_arrays([[3] + [50] * 7], [[-0.5] * 8], [[0.1] * 8])
    a = R.act_train(stats, jnp.asarray([5]), key, cfg)
    assert int(a[0]) == 0
    # well-explored, very poor rule mean (-1 <= draw < 0 always >= -1
    # > mean) -> RL action passes through
    stats2 = _stats_from_arrays([[100] + [50] * 7], [[-1.5] * 8], [[0.1] * 8])
    a2 = R.act_train(stats2, jnp.asarray([5]), key, cfg)
    assert int(a2[0]) == 5
    # mean_rule = -1 sentinel (no data but count thres met is impossible;
    # still: draw in (-1,0) > -1 -> rule)  [explore < mean never true]
    stats3 = _stats_from_arrays([[100] + [50] * 7], [[0.5] * 8], [[0.1] * 8])
    a3 = R.act_train(stats3, jnp.asarray([2]), key, cfg)
    assert int(a3[0]) == 0  # mean 0.5 > any U(-1,0) draw -> rule good


class _DequeOracle:
    """Reference add_data trajectory bookkeeping (RLS.py:185-215)."""

    def __init__(self, gamma=0.95):
        self.buf = deque(maxlen=20)
        self.gamma = gamma
        self.records = []

    def add(self, obs, action, rew, done):
        self.buf.append((obs, action, rew))
        while len(self.buf) > 10:
            o, a, r = self.buf.popleft()
            self.records.append((tuple(o) + (a,), a, r))
        if done:
            _, _, rew_right = self.buf[-1]
            while len(self.buf) > 0:
                o, a, r = self.buf.popleft()
                v = rew_right * self.gamma ** len(self.buf)
                self.records.append((tuple(o) + (a,), a, v))


def test_trajectory_buffer_matches_deque_oracle():
    rng = np.random.default_rng(2)
    cfg = StoreConfig()
    obs_dim = 4
    buf = R.traj_buffer_init(cfg.n_step_window, obs_dim)
    oracle = _DequeOracle(cfg.gamma)
    got = []

    for step in range(60):
        obs = rng.normal(0, 1, obs_dim).astype(np.float32)
        action = float(rng.integers(0, 8))
        rew = float(rng.normal(0, 1))
        done = step in (24, 42, 47)  # episode ends incl. short episodes

        buf, recs = R.traj_buffer_push(
            buf, jnp.asarray(obs), jnp.asarray(action), jnp.asarray(rew),
            jnp.asarray(done), cfg)
        oracle.add(obs, action, rew, done)

        valid = np.asarray(recs.valid)
        for i in np.where(valid)[0]:
            got.append((tuple(np.asarray(recs.keys[i])),
                        float(recs.actions[i]), float(recs.values[i])))

    assert len(got) == len(oracle.records)
    for (gk, ga, gv), (ok, oa, ov) in zip(got, oracle.records):
        np.testing.assert_allclose(gk, ok, atol=1e-5)
        assert ga == oa
        np.testing.assert_allclose(gv, ov, atol=1e-5)


def test_trajectory_buffer_nstep_mode():
    """value_mode='nstep': every record carries the discounted window
    return from its entry onward, truncated at episode end."""
    rng = np.random.default_rng(7)
    cfg = StoreConfig(value_mode="nstep")
    obs_dim = 3
    buf = R.traj_buffer_init(cfg.n_step_window, obs_dim)

    episode = []  # (obs, action, reward) of the running episode
    got = []
    expect = []

    def discounted(rews, i):
        return sum(cfg.gamma ** (j - i) * rews[j] for j in range(i, len(rews)))

    for step in range(40):
        obs = rng.normal(0, 1, obs_dim).astype(np.float32)
        action = float(rng.integers(0, 8))
        rew = float(rng.normal(0, 1))
        done = step in (17, 33)
        episode.append((obs, action, rew))

        buf, recs = R.traj_buffer_push(
            buf, jnp.asarray(obs), jnp.asarray(action), jnp.asarray(rew),
            jnp.asarray(done), cfg)
        valid = np.asarray(recs.valid)
        for i in np.where(valid)[0]:
            got.append(float(recs.values[i]))

        # oracle: a flush happens when the episode's live window exceeds
        # n_step_window; its value is the W+1-step discounted return
        live = episode
        while len(live) > cfg.n_step_window:
            rews = [r for (_, _, r) in live]
            expect.append(discounted(rews[:cfg.n_step_window + 1], 0))
            live = live[1:]
            episode = live
        if done:
            rews = [r for (_, _, r) in live]
            for i in range(len(live)):
                expect.append(discounted(rews, i))
            episode = []

    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_insert_records_roundtrip():
    cfg = StoreConfig()
    store = S.store_init(256, 5)
    buf = R.traj_buffer_init(cfg.n_step_window, 4)
    rng = np.random.default_rng(3)
    for step in range(30):
        obs = jnp.asarray(rng.normal(0, 1, 4), jnp.float32)
        buf, recs = R.traj_buffer_push(
            buf, obs, jnp.asarray(1.0), jnp.asarray(0.5),
            jnp.asarray(step == 29), cfg)
        store = R.insert_records(store, recs)
    # 30 pushes: 20 flushes (steps 10..29 pre-done) + terminal backfill 10
    assert int(store.size) == 30


def test_grouped_kernel_exact_on_dense_sentinel_store():
    """Round-4 advisor fix: a store written via store_insert_dense_block
    holds VALID rows whose keys are SENTINEL_KEY; the grouped kernel's
    band-span reduction must exclude them, or the f32 composite band key
    quantizes to steps >> w0 and true matches near band boundaries get
    falsely pruned for action groups >= 1."""
    rng = np.random.default_rng(11)
    d, A, Qa, m, cap = 5, 4, 16, 16, 256
    store = S.store_init(cap, d)
    for wave in range(8):
        keys = rng.normal(0, 3, (m, d)).astype(np.float32)
        keys[:, -1] = rng.integers(0, A, m)
        vals = rng.normal(0, 1, m).astype(np.float32)
        mask = rng.random(m) < 0.5   # ~half the rows become sentinels
        store = S.store_insert_dense_block(
            store, jnp.asarray(keys), jnp.asarray(keys[:, -1]),
            jnp.asarray(vals), jnp.asarray(mask))

    valid = (jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1)
             < store.size)
    obs = rng.normal(0, 3, (Qa, d - 1)).astype(np.float32)
    queries_g = np.concatenate([
        np.broadcast_to(obs[None], (A, Qa, d - 1)),
        np.broadcast_to(np.arange(A, dtype=np.float32)[:, None, None],
                        (A, Qa, 1))], axis=-1)
    w = jnp.asarray([2.0, 2.0, 2.0, 2.0, 0.1], jnp.float32)

    from dcarl_tpu.core.store import _raw_moments
    from dcarl_tpu.ops.pallas_store import box_query_moments_grouped

    flat_q = jnp.asarray(queries_g.reshape(A * Qa, d))
    ref = np.asarray(_raw_moments(store.keys, store.values, valid,
                                  flat_q, w)).reshape(A, Qa, 3)
    assert ref[1:, :, 0].sum() > 0, "test needs matches in groups >= 1"
    got = np.asarray(box_query_moments_grouped(
        store.keys, store.values, valid, jnp.asarray(queries_g), w,
        q_tile=16, n_tile=64, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3)


def test_spooler_detects_whole_ring_wrap():
    """Round-4 advisor fix: inferred-mode spooling cannot distinguish
    'no inserts' from 'exactly capacity inserts' by the head alone; the
    content fingerprint must turn that silent data loss into an error."""
    import os
    import tempfile

    from dcarl_tpu.utils.checkpoint import StoreSpooler

    d, cap = 3, 8
    store = S.store_init(cap, d)
    with tempfile.TemporaryDirectory() as tmp:
        sp = StoreSpooler(os.path.join(tmp, "s.txt"),
                          os.path.join(tmp, "v.txt"))
        store = S.store_insert(store, jnp.ones((4, d)), jnp.zeros(4),
                               jnp.arange(4.0), jnp.ones(4, bool))
        assert sp.spool(store) == 4          # inferred: head 0 -> 4
        # exactly `capacity` inserts: head returns to 4, contents differ
        store = S.store_insert(store, jnp.full((cap, d), 2.0),
                               jnp.zeros(cap), jnp.arange(cap) + 10.0,
                               jnp.ones(cap, bool))
        with pytest.raises(ValueError, match="whole multiple"):
            sp.spool(store)
        # a genuine no-op snapshot stays fine
        sp2 = StoreSpooler(os.path.join(tmp, "s2.txt"),
                           os.path.join(tmp, "v2.txt"))
        assert sp2.spool(store, n_inserted=4) == 4  # sync to head 4
        assert sp2.spool(store) == 0                # unchanged: no-op


def test_spooler_skips_sentinel_rows():
    """Round-4 advisor fix: dense-block sentinel padding rows must not
    leak into the persisted reference text history (import would count
    them as real evidence)."""
    import os
    import tempfile

    from dcarl_tpu.utils.checkpoint import StoreSpooler, import_store_text

    d, m, cap = 3, 8, 32
    store = S.store_init(cap, d)
    keys = np.ones((m, d), np.float32)
    mask = np.zeros(m, bool)
    mask[:5] = True
    with tempfile.TemporaryDirectory() as tmp:
        sp = StoreSpooler(os.path.join(tmp, "s.txt"),
                          os.path.join(tmp, "v.txt"))
        store = S.store_insert_dense_block(
            store, jnp.asarray(keys), jnp.zeros(m), jnp.arange(float(m)),
            jnp.asarray(mask))
        appended = sp.spool(store, n_inserted=m)
        assert appended == 5                # sentinels skipped
        re = import_store_text(os.path.join(tmp, "s.txt"),
                               os.path.join(tmp, "v.txt"), cap)
        assert int(re.size) == 5
        assert float(jnp.abs(re.keys[:5]).max()) < S.SENTINEL_KEY / 2


def test_driving_store_config_gamma_one():
    """Round-4 advisor fix: the nstep gate rescale must use the
    gamma -> 1 limit (w) instead of dividing by zero."""
    from dcarl_tpu.config import driving_store_config

    cfg = driving_store_config(value_mode="nstep", gamma=1.0,
                               n_step_window=10)
    assert cfg.explore_high == pytest.approx(3.8)
    assert cfg.rule_good_thres == pytest.approx(3.4)


def test_gated_driver_rejects_cross_action_width():
    """Round-4 advisor fix: an action half-width >= 0.5 would be
    silently pruned by the action-grouped kernel; the factory raises."""
    from dcarl_tpu.config import DRIVING_HALF_WIDTHS, EnvConfig
    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.planning.fast_rollout import make_gated_driver_fast

    bad = DRIVING_HALF_WIDTHS[:-1] + (1.0,)
    with pytest.raises(ValueError, match="cross-action"):
        make_gated_driver_fast(
            t_intersection(), EnvConfig(),
            store_cfg=StoreConfig(half_widths=bad))


def test_traj_push_lane_matches_vmapped_reference():
    """Round-4 perf rewrite: the lane-major trajectory push must be
    BITWISE-equal (same record order, same values) to the vmapped
    per-env traj_buffer_push in both value modes."""
    rng = np.random.default_rng(17)
    B, W, D = 6, 5, 4
    for mode in ("reference", "nstep"):
        cfg = StoreConfig(n_step_window=W, gamma=0.9, value_mode=mode)
        buf_obs = jnp.asarray(rng.normal(0, 1, (B, W, D)), jnp.float32)
        buf_act = jnp.asarray(rng.integers(0, 5, (B, W)), jnp.float32)
        buf_rew = jnp.asarray(rng.normal(0, 1, (B, W)), jnp.float32)
        length = jnp.asarray(rng.integers(0, W + 1, B), jnp.int32)
        obs = jnp.asarray(rng.normal(0, 1, (B, D)), jnp.float32)
        act = jnp.asarray(rng.integers(0, 5, B), jnp.float32)
        rew = jnp.asarray(rng.normal(0, 1, B), jnp.float32)
        done = jnp.asarray(rng.random(B) < 0.5)

        def push_one(to, ta, tr, tl, o, a, r, d):
            buf = R.TrajectoryBuffer(to, ta, tr, tl)
            return R.traj_buffer_push(buf, o, a, r, d, cfg)

        bufs_ref, recs_ref = jax.vmap(push_one)(
            buf_obs, buf_act, buf_rew, length, obs, act, rew, done)

        bufs_ln, recs_ln = R.traj_push_lane(
            buf_obs.transpose(1, 2, 0), buf_act.T, buf_rew.T, length,
            obs.T, act, rew, done, cfg)

        np.testing.assert_array_equal(
            np.asarray(bufs_ref.obs), np.asarray(bufs_ln[0]).transpose(2, 0, 1))
        np.testing.assert_array_equal(np.asarray(bufs_ref.action),
                                      np.asarray(bufs_ln[1]).T)
        np.testing.assert_array_equal(np.asarray(bufs_ref.reward),
                                      np.asarray(bufs_ln[2]).T)
        np.testing.assert_array_equal(np.asarray(bufs_ref.length),
                                      np.asarray(bufs_ln[3]))
        np.testing.assert_array_equal(
            np.asarray(recs_ref.keys),
            np.asarray(recs_ln.keys).transpose(2, 0, 1))
        np.testing.assert_array_equal(np.asarray(recs_ref.valid),
                                      np.asarray(recs_ln.valid).T)
        np.testing.assert_allclose(np.asarray(recs_ref.values),
                                   np.asarray(recs_ln.values).T,
                                   rtol=1e-6, atol=1e-7, err_msg=mode)


def test_active_region_cache_exact_for_in_region_queries():
    """Round-4 vehicle-life working set: the device cache built by
    active_region_mask answers every IN-REGION query identically to the
    full (host-resident) history — the exactness contract that lets the
    store grow past HBM while the device holds a working set."""
    rng = np.random.default_rng(23)
    d, n = 5, 20000
    keys = rng.normal(0, 30, (n, d)).astype(np.float32)
    keys[:, -1] = rng.integers(0, 4, n)
    vals = rng.normal(0, 1, n).astype(np.float32)
    w = np.asarray([2.0, 2.0, 1.0, 1.0, 0.1], np.float32)

    center, radius = (5.0, -3.0), (10.0, 10.0)
    mask = S.active_region_mask(keys, w, (0, 1), center, radius)
    assert 0 < mask.sum() < n  # a real subset

    q = rng.uniform(-1, 1, (64, d)).astype(np.float32)
    q[:, 0] = center[0] + rng.uniform(-radius[0], radius[0], 64)
    q[:, 1] = center[1] + rng.uniform(-radius[1], radius[1], 64)
    q[:, -1] = rng.integers(0, 4, 64)

    full = np.asarray(S._raw_moments(
        jnp.asarray(keys), jnp.asarray(vals), jnp.ones(n, bool),
        jnp.asarray(q), jnp.asarray(w)))
    sub_k, sub_v = keys[mask], vals[mask]
    cached = np.asarray(S._raw_moments(
        jnp.asarray(sub_k), jnp.asarray(sub_v),
        jnp.ones(int(mask.sum()), bool), jnp.asarray(q), jnp.asarray(w)))
    np.testing.assert_array_equal(full, cached)
    assert full[:, 0].sum() > 0  # the test exercises real matches

    # out-of-region queries are allowed to differ -> must re-center
    q_out = q.copy()
    q_out[:, 0] = center[0] + 3 * radius[0]
    full_o = np.asarray(S._raw_moments(
        jnp.asarray(keys), jnp.asarray(vals), jnp.ones(n, bool),
        jnp.asarray(q_out), jnp.asarray(w)))
    assert full_o[:, 0].sum() >= 0  # (smoke: full store still answers)


def test_peraction_kernel_matches_grouped_candidates():
    """Round-4 deployment query: box_query_moments_peraction (ONE obs
    query per env + feats-matmul action scatter) must equal the flat
    brute reduction over the full [A, B, D] candidate batch — the
    exactness hinges on the integer action lattice with half-width
    < 0.5, which the driving config guarantees."""
    rng = np.random.default_rng(31)
    d, A, B = 21, 11, 48
    n = 2000
    obs = np.asarray(rng.normal(0, 5, (B, d - 1)), np.float32)
    src = rng.integers(0, B, n)
    keys = np.zeros((n, d), np.float32)
    keys[:, :-1] = obs[src] + rng.normal(0, 1.0, (n, d - 1))
    keys[:, -1] = rng.integers(0, A, n)
    values = jnp.asarray(rng.normal(0, 1, n), jnp.float32)
    valid = jnp.asarray(rng.random(n) < 0.7)
    w = jnp.asarray(np.abs(rng.normal(2, 1, d)) + 1.5, jnp.float32)
    w = w.at[-1].set(0.1)

    from dcarl_tpu.core.store import _raw_moments
    from dcarl_tpu.ops.pallas_store import box_query_moments_peraction

    qg = np.concatenate([
        np.broadcast_to(obs[None], (A, B, d - 1)),
        np.broadcast_to(np.arange(A, dtype=np.float32)[:, None, None],
                        (A, B, 1))], axis=-1)
    ref = np.asarray(_raw_moments(
        jnp.asarray(keys), values, valid,
        jnp.asarray(qg.reshape(A * B, d)), w)
    ).reshape(A, B, 3).transpose(1, 0, 2)
    assert ref[..., 0].sum() > 0
    got = np.asarray(box_query_moments_peraction(
        jnp.asarray(keys), values, valid, jnp.asarray(obs), w,
        num_actions=A, q_tile=32, n_tile=256, interpret=True))
    np.testing.assert_allclose(got, ref, atol=1e-3)

    # rows with out-of-lattice actions match nothing
    keys2 = keys.copy()
    keys2[:100, -1] = A + 3
    got2 = np.asarray(box_query_moments_peraction(
        jnp.asarray(keys2), values, valid, jnp.asarray(obs), w,
        num_actions=A, q_tile=32, n_tile=256, interpret=True))
    ref2 = np.asarray(_raw_moments(
        jnp.asarray(keys2), values, valid,
        jnp.asarray(qg.reshape(A * B, d)), w)
    ).reshape(A, B, 3).transpose(1, 0, 2)
    np.testing.assert_allclose(got2, ref2, atol=1e-3)


def test_trajectory_buffer_episode_mode():
    """value_mode='episode': NO steady flush ever fires; at episode end
    every entry carries the discounted suffix return to the EPISODE
    boundary (the whole-episode semantics of dqn_value_collect.py:
    128-145) — with gamma=1 the undiscounted episode suffix return."""
    rng = np.random.default_rng(11)
    # window covers the longest episode (the trainer-validated contract)
    cfg = StoreConfig(value_mode="episode", gamma=1.0, n_step_window=20)
    obs_dim = 3
    buf = R.traj_buffer_init(cfg.n_step_window, obs_dim)

    episode = []
    got, expect = [], []
    for step in range(50):
        obs = rng.normal(0, 1, obs_dim).astype(np.float32)
        action = float(rng.integers(0, 8))
        rew = float(rng.normal(0, 1))
        done = step in (14, 20, 38, 49)  # episodes of length 15, 6, 18, 11
        episode.append((obs, action, rew))

        buf, recs = R.traj_buffer_push(
            buf, jnp.asarray(obs), jnp.asarray(action), jnp.asarray(rew),
            jnp.asarray(done), cfg)
        valid = np.asarray(recs.valid)
        assert not valid[0], "episode mode must never emit a steady flush"
        for i in np.where(valid)[0]:
            got.append((tuple(np.asarray(recs.keys[i])),
                        float(recs.values[i])))
        if done:
            rews = [r for (_, _, r) in episode]
            for i, (o, a, _) in enumerate(episode):
                expect.append((tuple(o) + (a,), sum(rews[i:])))
            episode = []

    assert len(got) == len(expect) and len(got) == 50
    for (gk, gv), (ok, ov) in zip(got, expect):
        np.testing.assert_allclose(gk, ok, atol=1e-5)
        np.testing.assert_allclose(gv, ov, rtol=1e-5, atol=1e-5)


def test_traj_push_lane_episode_matches_per_env():
    """Lane-major episode-mode push is bitwise-equal to the vmapped
    per-env implementation (the same pin as the nstep/reference modes,
    extended to the no-roll episode branch)."""
    rng = np.random.default_rng(5)
    cfg = StoreConfig(value_mode="episode", gamma=1.0, n_step_window=12)
    w, d, b = cfg.n_step_window, 3, 4
    buf_obs = jnp.zeros((w, d, b))
    buf_act = jnp.zeros((w, b))
    buf_rew = jnp.zeros((w, b))
    length = jnp.zeros((b,), jnp.int32)

    vm_push = jax.vmap(
        lambda bo, ba, br, ln, o, a, r, dn: R.traj_buffer_push(
            R.TrajectoryBuffer(bo, ba, br, ln), o, a, r, dn, cfg))
    vm_obs = jnp.zeros((b, w, d))
    vm_act = jnp.zeros((b, w))
    vm_rew = jnp.zeros((b, w))
    vm_len = jnp.zeros((b,), jnp.int32)

    since_done = np.zeros(b, int)
    for step in range(30):
        obs = jnp.asarray(rng.normal(0, 1, (d, b)), jnp.float32)
        act = jnp.asarray(rng.integers(0, 8, b), jnp.float32)
        rew = jnp.asarray(rng.normal(0, 1, b), jnp.float32)
        # episode-mode contract: no episode may outlive the window —
        # random dones plus a timeout at length w - 1
        since_done += 1
        done_np = (rng.random(b) < 0.15) | (since_done >= w - 1)
        since_done[done_np] = 0
        done = jnp.asarray(done_np)

        (buf_obs, buf_act, buf_rew, length), lane = R.traj_push_lane(
            buf_obs, buf_act, buf_rew, length, obs, act, rew, done, cfg)
        bufs, recs = vm_push(vm_obs, vm_act, vm_rew, vm_len,
                             obs.T, act, rew, done)
        vm_obs, vm_act, vm_rew, vm_len = (bufs.obs, bufs.action,
                                          bufs.reward, bufs.length)

        np.testing.assert_array_equal(np.asarray(lane.valid),
                                      np.asarray(recs.valid).T)
        np.testing.assert_array_equal(
            np.asarray(lane.keys), np.asarray(recs.keys).transpose(1, 2, 0))
        np.testing.assert_array_equal(np.asarray(lane.values),
                                      np.asarray(recs.values).T)
        np.testing.assert_array_equal(length, vm_len)


def test_episode_mode_trainer_validation_and_warmup_mask():
    """make_trainer_fast rejects an undersized window; with
    init_step_offset the staggered first episodes are masked (no record
    from an offset episode reaches the store) and later full episodes
    populate it."""
    from dcarl_tpu.config import (DCARLConfig, DQNConfig, EnvConfig,
                                  driving_store_config)
    from dcarl_tpu.parallel.mesh import make_mesh
    from dcarl_tpu.train_fast import make_trainer_fast

    mesh = make_mesh("env", jax.devices()[:1])
    env = EnvConfig(max_episode_steps=10, reset_jitter=0.05)
    bad = DCARLConfig(env=env, store=driving_store_config(
        value_mode="episode", n_step_window=5),
        dqn=DQNConfig(batch_size=4, replay_capacity=128))
    with pytest.raises(ValueError, match="episode"):
        make_trainer_fast(mesh, "env", bad, batch_per_device=4,
                          store_capacity_per_device=1 << 10,
                          replay_capacity_per_device=128, use_pallas=False)

    cfg = DCARLConfig(env=env, store=driving_store_config(
        value_mode="episode", gamma=1.0, n_step_window=10,
        visited_times_thres=3, rl_visited_times_min=2),
        dqn=DQNConfig(batch_size=4, replay_capacity=128))
    init_fn, step_fn, _, run_factory = make_trainer_fast(
        mesh, "env", cfg, batch_per_device=6,
        store_capacity_per_device=1 << 10,
        replay_capacity_per_device=128, use_pallas=False,
        init_step_offset=True)
    state = init_fn(seed=0)
    offsets0 = np.asarray(state.env.step_count)[0]
    assert np.unique(offsets0).size > 1, "offsets must stagger episodes"

    run_fn = run_factory(25)
    state, metrics = run_fn(state, jax.random.PRNGKey(1))
    m = {k: np.asarray(v) for k, v in metrics._asdict().items()}
    rows = m["store_rows"]
    # warmup (offset) episodes end within the first max_episode_steps
    # ticks and must insert nothing
    first_done_wave = rows[: 3]
    assert (first_done_wave == 0).all(), rows
    # after warmup, full episodes emit one record per step of their
    # length at each boundary
    assert rows[-1] > 0, rows
    # every store row must carry a FULL episode's suffix return: with
    # gamma=1 and reward ~ sqrt(v)*0.1 >= 0, the first entry of each
    # episode carries the whole-episode sum >= any other entry of it
    sizes = np.asarray(state.store_size)[0]
    assert sizes == rows[-1]


def test_peraction_kernel_dedup_heavy_duplication():
    """The kernel's run-aggregation path: a store where each unique key
    repeats many times with DIFFERENT values (the collection stack's
    locked-state repetition) must produce exactly the XLA reduction's
    moments — the weighted (count, sum, sumsq) rows are an exact
    regrouping, not an approximation."""
    from dcarl_tpu.config import DRIVING_HALF_WIDTHS
    from dcarl_tpu.core.rls import candidate_keys
    from dcarl_tpu.core.store import _raw_moments
    from dcarl_tpu.ops.pallas_store import box_query_moments_peraction

    rng = np.random.default_rng(31)
    uniq, reps, d, A = 40, 50, 21, 11
    base = rng.normal(0, 5, (uniq, d)).astype(np.float32)
    base[:, -1] = rng.integers(0, A, uniq)
    keys = np.repeat(base, reps, axis=0)
    perm = rng.permutation(uniq * reps)
    keys = keys[perm]
    vals = rng.normal(0, 1, uniq * reps).astype(np.float32)
    n = uniq * reps + 37  # ragged invalid tail with stale content
    keys_full = np.concatenate(
        [keys, rng.normal(0, 5, (37, d)).astype(np.float32)])
    vals_full = np.concatenate([vals, np.ones(37, np.float32)])
    valid = np.arange(n) < uniq * reps

    q = base[rng.integers(0, uniq, 16), :-1] + rng.normal(
        0, 0.2, (16, d - 1)).astype(np.float32)
    w = jnp.asarray(DRIVING_HALF_WIDTHS, jnp.float32)
    got = np.asarray(box_query_moments_peraction(
        jnp.asarray(keys_full), jnp.asarray(vals_full),
        jnp.asarray(valid), jnp.asarray(q), w, num_actions=A,
        interpret=True))
    qg = candidate_keys(jnp.asarray(q), A).reshape(-1, d)
    ref = np.asarray(_raw_moments(
        jnp.asarray(keys_full), jnp.asarray(vals_full),
        jnp.asarray(valid), qg, w)).reshape(16, A, 3)
    assert ref[:, :, 0].sum() > 0
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)
