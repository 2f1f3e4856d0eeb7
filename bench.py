"""DCARL-TPU benchmark.

Measures the north-star metric: env-steps/s of the full vectorized
driving stack (env physics + Werling lattice + collision gating +
pure-pursuit control, all under one jit), plus batched
confidence-evals/s of the Pallas store kernel as a secondary number.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

vs_baseline scales against the driver target of >=10M env-steps/s
aggregate on a 16-chip v5p (625k/chip); the reference itself publishes
no throughput numbers (BASELINE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _enable_compile_cache():
    """The lane-major driver is a large fused program (~3 min cold
    compile over the remote TPU tunnel); the persistent cache makes
    repeat bench runs start in seconds."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dcarl_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass  # older jax without these flags


def bench_env_steps(batch: int, steps: int, repeats: int = 3):
    import jax

    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.planning.fast_rollout import make_rule_driver_fast

    sc = t_intersection()
    init_fn, run_fn = make_rule_driver_fast(sc)
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    carry = init_fn(keys)
    step_keys = jax.random.split(jax.random.PRNGKey(1), steps)

    # warmup/compile
    carry, out = run_fn(carry, step_keys)
    jax.block_until_ready(out[0])

    best = float("inf")
    for i in range(repeats):
        sk = jax.random.split(jax.random.PRNGKey(2 + i), steps)
        t0 = time.perf_counter()
        carry, out = run_fn(carry, sk)
        jax.block_until_ready(out[0])
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def bench_confidence_evals(n_rows: int, n_queries: int, repeats: int = 5):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcarl_tpu.core.store import FIELD_HALF_WIDTHS, _raw_moments
    from dcarl_tpu.ops.pallas_store import box_query_moments_sorted

    rng = np.random.default_rng(0)
    d = len(FIELD_HALF_WIDTHS)
    keys = jnp.asarray(rng.normal(0, 5, (n_rows, d)), jnp.float32)
    keys = keys.at[:, -1].set(
        jnp.asarray(rng.integers(0, 8, n_rows), jnp.float32))
    values = jnp.asarray(rng.normal(0, 1, n_rows), jnp.float32)
    valid = jnp.ones((n_rows,), bool)
    queries = jnp.asarray(rng.normal(0, 5, (n_queries, d)), jnp.float32)
    queries = queries.at[:, -1].set(
        jnp.asarray(rng.integers(0, 8, n_queries), jnp.float32))
    w = jnp.asarray(FIELD_HALF_WIDTHS, jnp.float32)

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        # Real-hardware numeric parity of the Pallas kernel against the
        # XLA reduction (the suite's interpret-mode parity can't cover
        # Mosaic codegen): a subset of queries keeps the raw path cheap.
        q_sub = queries[:512]
        got = np.asarray(box_query_moments_sorted(keys, values, valid,
                                                  q_sub, w))
        ref = np.asarray(_raw_moments(keys, values, valid, q_sub, w))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)
    fn = box_query_moments_sorted if on_tpu else _raw_moments
    # The remote-tunnel dispatch floor is ~25 ms per executable launch;
    # chain enough kernel calls inside one program that the kernel, not
    # the launch, dominates what we time.
    inner = 128 if on_tpu else 4

    @jax.jit
    def f(keys, values, valid, queries, w):
        def body(c, _):
            out = fn(keys, values, valid, queries + c, w)
            return c + jnp.sum(out) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=inner)
        return c

    args = (keys, values, valid, queries, w)
    f(*args).block_until_ready()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = f(*args)
        out.block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return n_queries * inner / best


def bench_train_steps(batch: int, steps: int, store_capacity: int,
                      repeats: int = 3):
    """Integrated training loop (plan -> confidence query -> RLS gate ->
    DQN -> drive -> store insert -> TD update) env-steps/s, lane-major
    trainer on a 1-device mesh."""
    import jax

    from dcarl_tpu.config import DCARLConfig, driving_store_config
    from dcarl_tpu.parallel.mesh import make_mesh
    from dcarl_tpu.train_fast import make_trainer_fast

    mesh = make_mesh("env", jax.devices()[:1])
    init_fn, _, _, run_factory = make_trainer_fast(
        mesh, "env", DCARLConfig(store=driving_store_config()),
        batch_per_device=batch,
        store_capacity_per_device=store_capacity,
        replay_capacity_per_device=store_capacity,
        # steady-state backfill load is ~B/episode_len * window rows per
        # step; the budget covers 4x that (dropped_records metric guards)
        backfill_budget_per_step=max(2048, batch // 4),
        # dense_store_writes stays off here: at this bench's
        # batch/capacity ratio no whole number of (batch + budget)
        # blocks fits the ring; the dense path pays off at deployment
        # ratios (B << capacity, e.g. the improvement run's 2048/131072)
    )
    run_fn = run_factory(steps)
    state = init_fn(seed=0)
    state, ms = run_fn(state, jax.random.PRNGKey(0))   # compile + warmup
    jax.block_until_ready(ms.reward_mean)

    # Every timed repeat restarts from the same post-warmup snapshot so
    # the store fill (which query cost depends on) is identical across
    # repeats — best-of-N measures one steady state, not the emptiest.
    snapshot = jax.tree.map(lambda x: x.copy(), state)
    best = float("inf")
    for i in range(repeats):
        t0 = time.perf_counter()
        _, ms = run_fn(snapshot, jax.random.PRNGKey(1 + i))
        jax.block_until_ready(ms.reward_mean)
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def bench_gated_steps(batch: int, steps: int, store_rows: int,
                      repeats: int = 3):
    """Confidence-gated deployment driver (make_gated_driver_fast — the
    inference-mode product: plan + fused all-candidate store query +
    Welch z-test + drive) env-steps/s against a populated store.

    The store is built by the INTEGRATED TRAINER — the reference's own
    deployment story (DCARL_agent.py: train -> persist the RLS dataset
    -> deploy against it): a short training run whose ring retains the
    newest ``store_rows`` flush/backfill records of a desynchronized
    fleet, i.e. dense DISTINCT visited-state keys across the whole
    corridor.  (Round 4 built it from collector ``recorded_state``
    rows, which are zeros until an episode's trigger fires — at bench
    rollout lengths that store had only ~6 unique keys, so the query
    faced almost no real work.  The trainer store is the honest, and
    much harder, serving distribution.)"""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcarl_tpu.config import DCARLConfig, EnvConfig, \
        driving_store_config
    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.parallel.mesh import make_mesh
    from dcarl_tpu.planning.fast_rollout import make_gated_driver_fast
    from dcarl_tpu.train_fast import make_trainer_fast

    scfg = driving_store_config()
    env_cfg = EnvConfig()
    sc = t_intersection(env_cfg)
    init_fn, run_fn = make_gated_driver_fast(sc, env_cfg, store_cfg=scfg)

    on_tpu = jax.default_backend() == "tpu"
    tb = 16384 if on_tpu else 32
    fill_steps = 300 if on_tpu else 8
    mesh = make_mesh("env", jax.devices()[:1])
    init_t, _, _, run_factory = make_trainer_fast(
        mesh, "env", DCARLConfig(store=scfg),
        batch_per_device=tb,
        store_capacity_per_device=store_rows,
        replay_capacity_per_device=1 << 14,
        backfill_budget_per_step=max(512, tb // 4))
    run_t = run_factory(fill_steps)
    t_state = run_t(init_t(seed=7), jax.random.PRNGKey(8))[0]
    s_keys = jnp.asarray(t_state.store_keys[0])
    s_vals = jnp.asarray(t_state.store_values[0])
    n_rows = int(np.asarray(t_state.store_size)[0])
    s_valid = jnp.arange(store_rows) < n_rows

    if jax.default_backend() == "tpu":
        # Real-hardware parity of the deployment query kernel (the
        # per-action feats-matmul path the gated driver runs) against
        # the XLA reduction over the full candidate batch.
        from dcarl_tpu.core.store import _raw_moments
        from dcarl_tpu.ops.pallas_store import box_query_moments_peraction

        d = env_cfg.state_dim + 1
        hw = jnp.asarray(scfg.half_widths, jnp.float32)
        obs_probe = s_keys[:32, :-1] + 0.5  # near-data probes
        a_n = env_cfg.action_dim
        qg = jnp.concatenate([
            jnp.broadcast_to(obs_probe[None], (a_n, 32, d - 1)),
            jnp.broadcast_to(
                jnp.arange(a_n, dtype=jnp.float32)[:, None, None],
                (a_n, 32, 1))], axis=-1).reshape(-1, d)
        ref = np.asarray(_raw_moments(s_keys, s_vals, s_valid, qg, hw)
                         ).reshape(a_n, 32, 3).transpose(1, 0, 2)
        got = np.asarray(box_query_moments_peraction(
            s_keys, s_vals, s_valid, obs_probe, hw, num_actions=a_n))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)

    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    carry = init_fn(keys)
    sk = jax.random.split(jax.random.PRNGKey(1), steps)
    carry, out = run_fn(carry, sk, s_keys, s_vals, s_valid)
    jax.block_until_ready(out[0])

    best = float("inf")
    for i in range(repeats):
        sk = jax.random.split(jax.random.PRNGKey(2 + i), steps)
        t0 = time.perf_counter()
        carry, out = run_fn(carry, sk, s_keys, s_vals, s_valid)
        jax.block_until_ready(out[0])
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def main():
    _enable_compile_cache()
    import jax

    backend = jax.default_backend()
    if backend == "tpu":
        # Lane-major driver (fast_rollout.py) swept 8k-128k on v5e:
        # peaks at B=32768 (~14.7M steps/s; 8k gives 13.5M, 128k turns
        # HBM-bound at 12.5M).  steps=300 keeps the ~25 ms launch floor
        # under 4% of the run.
        batch, steps = 32768, 300
        store_rows, store_queries = 1 << 16, 4096
        train_batch, train_steps, train_store = 32768, 20, 1 << 16
        gated_batch, gated_steps, gated_rows = 65536, 50, 1 << 18
    else:  # CPU smoke mode
        batch, steps = 64, 50
        store_rows, store_queries = 4096, 256
        train_batch, train_steps, train_store = 16, 3, 512
        gated_batch, gated_steps, gated_rows = 32, 5, 1024

    env_rate = bench_env_steps(batch, steps)
    conf_rate = bench_confidence_evals(store_rows, store_queries)
    train_rate = bench_train_steps(train_batch, train_steps, train_store)
    gated_rate = bench_gated_steps(gated_batch, gated_steps, gated_rows)

    target_per_chip = 625_000.0  # 10M aggregate / 16 chips (BASELINE.json)
    print(json.dumps({
        "metric": "env-steps/s per chip (vectorized driving env)",
        "value": round(env_rate, 1),
        "unit": "env-steps/s",
        "vs_baseline": round(env_rate / target_per_chip, 4),
        "confidence_evals_per_s": round(conf_rate, 1),
        "confidence_store_rows": store_rows,
        "pallas_parity_checked": backend == "tpu",
        "train_env_steps_per_s": round(train_rate, 1),
        "train_batch": train_batch,
        "train_store_rows": train_store,
        "gated_env_steps_per_s": round(gated_rate, 1),
        "gated_batch": gated_batch,
        "gated_store_rows": gated_rows,
        "env_batch": batch,
        "backend": backend,
    }))


if __name__ == "__main__":
    main()
