"""Golden tests for the confidence core against the reference semantics
and the bundled demo datasets (acceptance criterion: reproduce
Simulation_1/2 trajectories — BASELINE.md)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from dcarl_tpu.config import ConfidenceConfig
from dcarl_tpu.core import confidence as C
from dcarl_tpu.data import datasets, sampling

from reference_oracle import oracle_run

CFG = ConfidenceConfig()


def _run_golden(data, av, action_num, capacity):
    table, out = C.golden_run(
        jnp.asarray(data), jnp.asarray(av), action_num=action_num,
        capacity=capacity, cfg=CFG,
    )
    return jax.device_get(table), jax.device_get(out)


def _check_against_oracle(data, av, action_num):
    cap = C.required_capacity(data, av.shape[0], action_num)
    table, out = _run_golden(data, av, action_num, cap)
    oracle = oracle_run(data, av, action_num)

    np.testing.assert_array_equal(out.tsrl_action, oracle["step_actions"])
    np.testing.assert_array_equal(table.activation_step, oracle["activation_step"])
    np.testing.assert_allclose(out.step_value, oracle["step_values"],
                               rtol=0, atol=1e-9)
    np.testing.assert_allclose(out.overall_value, oracle["overall"],
                               rtol=0, atol=1e-8)
    np.testing.assert_allclose(table.tsrl, oracle["tsrl"], rtol=0, atol=1e-9)


def test_bound_functions_match_reference_formulas():
    vals = np.array([12.0, -3.0, 55.5, 80.0, -20.0, 4.0, 61.0, 7.5, 90.0,
                     -44.0, 13.0, 2.0], dtype=np.float64)
    n = len(vals)
    mean, dsum, sigma = vals.mean(), vals.sum(), vals.std()
    import math
    margin = 150.0 * math.sqrt(math.log(1 / 0.05) / 2 / n)
    ub_ref = min(100.0, mean + margin)
    lb_ref = mean - margin
    ci_ref = (dsum / n / (n + 1) - 4 * sigma / (n + 1) + dsum / (n + 1)
              - 150.0 * math.sqrt(math.log(1 / 0.05) / 2 / (n + 1)))

    nf = jnp.float64(n)
    assert float(C.upper_bound(mean, nf, CFG)) == pytest.approx(ub_ref, abs=1e-12)
    assert float(C.lower_bound(mean, nf, CFG)) == pytest.approx(lb_ref, abs=1e-12)
    assert float(C.ci_lower_bound(dsum, sigma, nf, CFG)) == pytest.approx(
        ci_ref, abs=1e-12)
    assert float(C.mean_value(jnp.float64(150.0), CFG)) == 100.0


def test_golden_matches_oracle_synthetic():
    rng = np.random.default_rng(0)
    n, S, A = 600, 4, 5
    data = np.stack([
        rng.integers(0, S, n).astype(np.float64),
        rng.random(n),
        rng.integers(0, A, n).astype(np.float64),
        rng.normal(20, 50, n),
    ], axis=1)
    av = rng.uniform(-50, 100, (S, A))
    _check_against_oracle(data, av, A)


@pytest.mark.skipif(not datasets.reference_available(),
                    reason="reference datasets not mounted")
def test_simulation1_golden():
    ds = datasets.load_sim1()
    data = ds.data[: ds.stream_len]
    _check_against_oracle(data, ds.action_values, ds.action_num)


@pytest.mark.skipif(not datasets.reference_available(),
                    reason="reference datasets not mounted")
def test_simulation2_golden_truncated():
    """Default-on Sim-2 golden: the first 5k samples of the bundled
    stream, bit-compared against the oracle (the full 20k-stream run is
    the --expensive variant below)."""
    ds = datasets.load_sim2()
    data = ds.data[:5000]
    _check_against_oracle(data, ds.action_values, ds.action_num)
    # Pinned headline literal for the truncated stream (the Sim-1
    # activation step got the same hardening): an oracle+implementation
    # shared bug cannot fake an independently recorded constant.
    cap = C.required_capacity(data, ds.action_values.shape[0], ds.action_num)
    _, out = _run_golden(data, ds.action_values, ds.action_num, cap)
    assert float(out.overall_value[-1]) == pytest.approx(
        170.5799942422991, abs=1e-6)


@pytest.mark.skipif(not datasets.reference_available(),
                    reason="reference datasets not mounted")
@pytest.mark.expensive
def test_simulation2_golden():
    ds = datasets.load_sim2()
    data = ds.data[: ds.stream_len]
    _check_against_oracle(data, ds.action_values, ds.action_num)
    # The reference demo's headline improvement accounting over the full
    # 20k stream (Simulation_2/test_DCARL.py:99-105): overall_value
    # ~= 597.719, pinned as a literal.
    cap = C.required_capacity(data, ds.action_values.shape[0], ds.action_num)
    _, out = _run_golden(data, ds.action_values, ds.action_num, cap)
    assert float(out.overall_value[-1]) == pytest.approx(
        597.7193818873675, abs=1e-5)


@pytest.mark.skipif(not datasets.reference_available(),
                    reason="reference datasets not mounted")
def test_simulation1_known_activation():
    """The Sim-1 demo's headline output is the activation step where the
    learned action first beats the rule bound; it must be deterministic
    for the bundled stream."""
    ds = datasets.load_sim1()
    data = ds.data[: ds.stream_len]
    cap = C.required_capacity(data, 1, ds.action_num)
    table, out = _run_golden(data, ds.action_values, ds.action_num, cap)
    oracle = oracle_run(data, ds.action_values, ds.action_num)
    assert table.activation_step[0] == oracle["activation_step"][0]
    # The literal step, independently verified against the REAL
    # reference script (Simulation_1/test_DCARL.py run headless) — a
    # bug shared by oracle and implementation cannot fake this.
    assert int(table.activation_step[0]) == 4438


def test_running_table_decisions_match_golden():
    """The O(1)-memory running table must make identical argmax decisions
    to the full-sample golden table (values agree to fp tolerance)."""
    rng = np.random.default_rng(1)
    n, S, A = 800, 3, 6
    data = np.stack([
        rng.integers(0, S, n).astype(np.float64),
        rng.random(n),
        rng.integers(0, A, n).astype(np.float64),
        rng.normal(0, 40, n),
    ], axis=1)
    av = rng.uniform(-50, 100, (S, A))

    cap = C.required_capacity(data, S, A)
    _, out_g = _run_golden(data, av, A, cap)

    table = C.running_init((S, A), CFG, dtype=jnp.float64)

    def step(tab, row):
        tab = C.running_update(tab, row[0].astype(jnp.int32),
                               row[2].astype(jnp.int32), row[3], CFG)
        idx = row[0].astype(jnp.int32)
        act, val = C.select_actions(tab.tsrl[idx])
        return tab, (act, val)

    _, (acts, vals) = jax.lax.scan(step, table, jnp.asarray(data))
    np.testing.assert_array_equal(np.asarray(acts), out_g.tsrl_action)
    np.testing.assert_allclose(np.asarray(vals), out_g.step_value, atol=1e-6)


def test_running_update_batch_consistent():
    """Batch ingest produces the same sufficient statistics as sequential
    ingest, and the same final bounds."""
    rng = np.random.default_rng(2)
    n, S, A = 500, 4, 4
    idx = jnp.asarray(rng.integers(0, S, n), dtype=jnp.int32)
    act = jnp.asarray(rng.integers(0, A, n), dtype=jnp.int32)
    val = jnp.asarray(rng.normal(10, 30, n))

    t_seq = C.running_init((S, A), CFG, dtype=jnp.float64)
    for i in range(n):
        t_seq = C.running_update(t_seq, idx[i], act[i], val[i], CFG)

    t_batch = C.running_update_batch(
        C.running_init((S, A), CFG, dtype=jnp.float64), idx, act, val, CFG)

    np.testing.assert_array_equal(np.asarray(t_batch.count), np.asarray(t_seq.count))
    np.testing.assert_allclose(np.asarray(t_batch.total), np.asarray(t_seq.total),
                               atol=1e-9)
    np.testing.assert_allclose(np.asarray(t_batch.tsrl), np.asarray(t_seq.tsrl),
                               atol=1e-9)


def test_sampling_distribution():
    """Generated dataset matches the reference's generative process
    distributionally (data_sampling.py:30-67)."""
    ds = sampling.generate(jax.random.PRNGKey(0), state_num=20,
                           action_num=11, size=50000)
    data, valid = np.asarray(ds.data), np.asarray(ds.valid)
    assert data.shape == (50000, 4)
    kept = data[valid]
    # visitation should peak near state 10 (N(3,1)/6*20 ~ N(10, 3.3))
    counts = np.bincount(kept[:, 0].astype(int), minlength=20)
    assert counts.argmax() in (9, 10)
    assert valid.mean() > 0.9
    # actions uniform over 11
    acts = np.bincount(kept[:, 2].astype(int), minlength=11)
    assert acts.min() > 0.7 * acts.max()
    # values centered on truth with sd ~50
    av = np.asarray(ds.action_values)
    resid = kept[:, 3] - av[kept[:, 0].astype(int), kept[:, 2].astype(int)]
    assert abs(resid.mean()) < 2.0
    assert abs(resid.std() - 50.0) < 2.0


def test_vmapped_streams():
    """Many independent confidence streams batch under vmap — the fleet
    form used for throughput scaling."""
    B, n, S, A = 8, 200, 3, 4
    rng = np.random.default_rng(3)
    data = np.stack([
        rng.integers(0, S, (B, n)).astype(np.float64),
        rng.random((B, n)),
        rng.integers(0, A, (B, n)).astype(np.float64),
        rng.normal(0, 40, (B, n)),
    ], axis=2)

    def one(stream):
        table = C.running_init((S, A), CFG, dtype=jnp.float64)

        def step(tab, row):
            tab = C.running_update(tab, row[0].astype(jnp.int32),
                                   row[2].astype(jnp.int32), row[3], CFG)
            return tab, ()

        tab, _ = jax.lax.scan(step, table, stream)
        return tab.tsrl

    batched = jax.jit(jax.vmap(one))(jnp.asarray(data))
    single = one(jnp.asarray(data[0]))
    np.testing.assert_allclose(np.asarray(batched[0]), np.asarray(single),
                               atol=1e-9)
