"""Ablation profile of the integrated trainer + gated-driver steps.

Op-level ``jax.profiler`` device traces cannot be captured over the
remote-TPU tunnel this repo benches on (start_trace blocks on the
profiler service), so the breakdown is measured the other honest way:
re-trace the SAME step program with one semantic component stubbed to a
shape-matched zero-cost function, and report the wall-clock delta.
Deltas include each component's fusion context (what XLA can DCE when
the component is gone), which is exactly the cost that matters for
optimization decisions.

Run on the bench TPU:  python tools/profile_breakdown.py
Writes PROFILE.json and prints a markdown table (pasted into
DESIGN.md §3b as the round-4 evidence).
"""

import contextlib
import json
import os
import sys
import time
from unittest import mock

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _enable_compile_cache():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dcarl_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass


# ---------------------------------------------------------------------------
# shape-matched stubs
# ---------------------------------------------------------------------------


def _stub_grouped_query():
    import jax.numpy as jnp

    def f(keys, values, valid, queries, half_widths, **kw):
        return jnp.zeros(queries.shape[:2] + (3,), jnp.float32)

    return mock.patch("dcarl_tpu.ops.pallas_store.box_query_moments_grouped",
                      new=f)


def _stub_raw_moments():
    import jax.numpy as jnp

    def f(keys, values, valid, queries, half_widths):
        return jnp.zeros((queries.shape[0], 3), jnp.float32)

    return mock.patch("dcarl_tpu.core.store._raw_moments", new=f)


def _stub_peraction_query():
    # the round-4 deployment query kernel (the gated driver's hot path)
    import jax.numpy as jnp

    def f(keys, values, valid, obs_queries, half_widths, num_actions=11,
          **kw):
        return jnp.zeros((obs_queries.shape[0], num_actions, 3),
                         jnp.float32)

    return mock.patch(
        "dcarl_tpu.ops.pallas_store.box_query_moments_peraction", new=f)


def _stub_prepared_query():
    # the round-5 deployment query: prepare/query split — the gated
    # driver prepares the store once per run and calls
    # query_peraction_prepared inside the scan.  Stub the scan-side
    # query (the hot path); preparation stays, as in the real driver.
    import jax.numpy as jnp

    def f(prep, obs_queries, q_tile=4096, interpret=False):
        obs_dim = prep.kbf.shape[0]
        num_actions = (prep.rows_cat.shape[0] - obs_dim - 1) // 3
        return jnp.zeros((obs_queries.shape[0], num_actions, 3),
                         jnp.float32)

    return mock.patch(
        "dcarl_tpu.ops.pallas_store.query_peraction_prepared", new=f)


def _stub_control():
    import jax.numpy as jnp

    def f(ego_x, ego_y, ego_yaw, ego_v, traj_x, traj_y, speed_end, dtype):
        z = jnp.zeros_like(ego_x)
        return z, z

    return mock.patch("dcarl_tpu.planning.fast_rollout._control", new=f)


def _stub_project():
    import jax.numpy as jnp

    def f(px, py, vx, vy, tab, dtype):
        z = jnp.zeros_like(px)
        return z, z, z

    return mock.patch("dcarl_tpu.planning.fast_rollout._project_ego", new=f)


def _stub_store_insert():
    def ident(store, *a, **k):
        return store

    return [mock.patch("dcarl_tpu.core.store.store_insert", new=ident),
            mock.patch("dcarl_tpu.core.store.store_insert_dense_block",
                       new=ident)]


def _stub_traj_push():
    import jax.numpy as jnp

    from dcarl_tpu.core import rls as RLS

    def f(buf, obs, action, reward, done, cfg):
        w = buf.obs.shape[0]
        d = buf.obs.shape[1]
        recs = RLS.FlushRecords(
            keys=jnp.zeros((w + 1, d + 1)),
            actions=jnp.zeros((w + 1,)),
            values=jnp.zeros((w + 1,)),
            valid=jnp.zeros((w + 1,), bool))
        return buf, recs

    return mock.patch("dcarl_tpu.core.rls.traj_buffer_push", new=f)


def _stub_td_loss():
    import jax.numpy as jnp

    def f(self, params, target_params, batch, pad):
        return jnp.zeros(()), jnp.ones_like(batch.reward)

    return mock.patch("dcarl_tpu.models.dqn.DQN.td_loss", new=f)


def _stub_dqn_act():
    import jax.numpy as jnp

    def f(self, state, obs, key):
        return jnp.zeros((obs.shape[0],), jnp.int32)

    return mock.patch("dcarl_tpu.models.dqn.DQN.act_epsilon_greedy", new=f)


def _stub_replay():
    import jax.numpy as jnp

    from dcarl_tpu.models import replay as RB

    def push(replay, *a, **k):
        return replay

    def sample(replay, key, batch_size, alpha=0.6, beta=0.4):
        idx = jnp.zeros((batch_size,), jnp.int32)
        return RB.Batch(
            obs=jnp.zeros((batch_size, replay.obs.shape[1]),
                          replay.obs.dtype),
            action=jnp.zeros((batch_size,), replay.action.dtype),
            reward=jnp.zeros((batch_size,), replay.reward.dtype),
            next_obs=jnp.zeros((batch_size, replay.obs.shape[1]),
                               replay.obs.dtype),
            done=jnp.zeros((batch_size,), replay.done.dtype),
            indices=idx,
            weights=jnp.ones((batch_size,), replay.obs.dtype))

    def upd(replay, indices, priorities):
        return replay

    return [mock.patch("dcarl_tpu.models.replay.replay_push", new=push),
            mock.patch("dcarl_tpu.models.replay.replay_sample", new=sample),
            mock.patch("dcarl_tpu.models.replay.replay_update_priorities",
                       new=upd)]


def _stub_plan():
    import jax.numpy as jnp
    import numpy as np

    from dcarl_tpu.planning import fast_rollout as FR

    def plan(s0, c_d, c_d_d, c_speed, tab, wcfg, dtype):
        b = s0.shape[0]
        p = wcfg.num_paths
        n_t = wcfg.n_time_steps
        n_v = len(wcfg.target_speeds)
        return FR.FastLattice(
            x=jnp.zeros((p, n_t, b), dtype) + s0[None, None, :],
            y=jnp.zeros((p, n_t, b), dtype),
            s_d_end=jnp.zeros((n_v, b), dtype),
            cf=jnp.zeros((p, b), dtype),
            feasible=jnp.ones((p, b), bool))

    def free(lat, obstacles, wcfg, dtype):
        return jnp.ones(lat.cf.shape, bool)

    return [mock.patch("dcarl_tpu.planning.fast_rollout._plan_lattice",
                       new=plan),
            mock.patch("dcarl_tpu.planning.fast_rollout._collision_free",
                       new=free)]


def _stub_env():
    import jax.numpy as jnp

    def step(state, acc_cmd, steer_cmd, key, sa, idx, cfg, npdt):
        b = acc_cmd.shape[0]
        return state, jnp.zeros((b,), acc_cmd.dtype), jnp.zeros((b,), bool)

    return mock.patch("dcarl_tpu.planning.fast_rollout._step_env_soa",
                      new=step)


ABLATIONS_TRAIN = {
    "full": [],
    "-store_query": [_stub_grouped_query, _stub_raw_moments,
                     _stub_peraction_query],
    "-store_write": [_stub_store_insert],
    "-traj_push": [_stub_traj_push],
    "-td_update": [_stub_td_loss],
    "-dqn_act": [_stub_dqn_act],
    "-replay": [_stub_replay],
    "-plan": [_stub_plan],
    "-env_step": [_stub_env],
}

ABLATIONS_GATED = {
    "full": [],
    "-store_query": [_stub_grouped_query, _stub_raw_moments,
                     _stub_peraction_query, _stub_prepared_query],
    "-plan": [_stub_plan],
    "-control": [_stub_control],
    "-project": [_stub_project],
    "-env_step": [_stub_env],
}


def _flatten(makers):
    out = []
    for m in makers:
        p = m()
        out.extend(p if isinstance(p, list) else [p])
    return out


def time_trainer(patches, batch, steps, store_capacity, repeats=3):
    import jax

    from dcarl_tpu.config import DCARLConfig, driving_store_config
    from dcarl_tpu.parallel.mesh import make_mesh
    from dcarl_tpu.train_fast import make_trainer_fast

    with contextlib.ExitStack() as st:
        for p in _flatten(patches):
            st.enter_context(p)
        mesh = make_mesh("env", jax.devices()[:1])
        init_fn, _, _, run_factory = make_trainer_fast(
            mesh, "env", DCARLConfig(store=driving_store_config()),
            batch_per_device=batch,
            store_capacity_per_device=store_capacity,
            replay_capacity_per_device=store_capacity,
            backfill_budget_per_step=max(2048, batch // 4))
        run_fn = run_factory(steps)
        state = init_fn(seed=0)
        state, ms = run_fn(state, jax.random.PRNGKey(0))
        jax.block_until_ready(ms.reward_mean)
        snapshot = jax.tree.map(lambda x: x.copy(), state)
        best = float("inf")
        for i in range(repeats):
            t0 = time.perf_counter()
            _, ms = run_fn(snapshot, jax.random.PRNGKey(1 + i))
            jax.block_until_ready(ms.reward_mean)
            best = min(best, time.perf_counter() - t0)
    return best / steps


_ROLLOUT_STORE_CACHE = {}


def _rollout_store(store_rows, env_cfg):
    """bench.py's store: the INTEGRATED TRAINER's ring contents (the
    reference's train -> persist -> deploy story) — dense distinct
    visited-state records, the serving distribution the headline gated
    number is measured on."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcarl_tpu.config import DCARLConfig, driving_store_config
    from dcarl_tpu.parallel.mesh import make_mesh
    from dcarl_tpu.train_fast import make_trainer_fast

    if store_rows in _ROLLOUT_STORE_CACHE:
        return _ROLLOUT_STORE_CACHE[store_rows]
    on_tpu = jax.default_backend() == "tpu"
    tb = 16384 if on_tpu else 32
    fill_steps = 300 if on_tpu else 8
    mesh = make_mesh("env", jax.devices()[:1])
    init_t, _, _, run_factory = make_trainer_fast(
        mesh, "env", DCARLConfig(store=driving_store_config()),
        batch_per_device=tb,
        store_capacity_per_device=store_rows,
        replay_capacity_per_device=1 << 14,
        backfill_budget_per_step=max(512, tb // 4))
    run_t = run_factory(fill_steps)
    t_state = run_t(init_t(seed=7), jax.random.PRNGKey(8))[0]
    n_rows = int(np.asarray(t_state.store_size)[0])
    out = (jnp.asarray(t_state.store_keys[0]),
           jnp.asarray(t_state.store_values[0]),
           jnp.arange(store_rows) < n_rows)
    _ROLLOUT_STORE_CACHE[store_rows] = out
    return out


def time_gated(patches, batch, steps, store_rows, repeats=3,
               store_kind="corridor"):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dcarl_tpu.config import EnvConfig, driving_store_config
    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.planning.fast_rollout import make_gated_driver_fast

    scfg = driving_store_config()
    env_cfg = EnvConfig()
    if store_kind == "rollout":
        s_keys_j, s_vals, s_valid = _rollout_store(store_rows, env_cfg)
    else:
        rng = np.random.default_rng(0)
        d = env_cfg.state_dim + 1
        s_keys = np.zeros((store_rows, d), np.float32)
        s_keys[:, 0] = rng.normal(242.0, 1.0, store_rows)
        s_keys[:, 1] = rng.uniform(70.0, 112.0, store_rows)
        s_keys[:, 2] = rng.normal(0.0, 2.0, store_rows)
        s_keys[:, 3] = rng.normal(-5.0, 3.0, store_rows)
        s_keys[:, 4] = rng.normal(-1.57, 0.2, store_rows)
        s_keys[:, 5:-1] = rng.normal(0.0, 8.0, (store_rows, d - 6))
        s_keys[:, -1] = rng.integers(0, 11, store_rows)
        s_vals = jnp.asarray(rng.normal(1.5, 0.5, store_rows), jnp.float32)
        s_valid = jnp.ones((store_rows,), bool)
        s_keys_j = jnp.asarray(s_keys)

    with contextlib.ExitStack() as st:
        for p in _flatten(patches):
            st.enter_context(p)
        sc = t_intersection(env_cfg)
        init_fn, run_fn = make_gated_driver_fast(sc, env_cfg, store_cfg=scfg)
        keys = jax.random.split(jax.random.PRNGKey(0), batch)
        carry = init_fn(keys)
        sk = jax.random.split(jax.random.PRNGKey(1), steps)
        carry, out = run_fn(carry, sk, s_keys_j, s_vals, s_valid)
        jax.block_until_ready(out[0])
        best = float("inf")
        for i in range(repeats):
            sk = jax.random.split(jax.random.PRNGKey(2 + i), steps)
            t0 = time.perf_counter()
            carry, out = run_fn(carry, sk, s_keys_j, s_vals, s_valid)
            jax.block_until_ready(out[0])
            best = min(best, time.perf_counter() - t0)
    return best / steps


def main():
    _enable_compile_cache()
    import jax

    # Optional section filter: `python tools/profile_breakdown.py gated`
    # runs only the named sections (trainer / gated / gated_rollout) and
    # merges them into an existing PROFILE.json instead of replacing it.
    # `cpu` forces the CPU backend (a session sitecustomize may pin a
    # TPU backend that wins over the JAX_PLATFORMS env var).
    # `fast` keeps only the decisive ablations (full / -store_query /
    # -plan) — each ablation is a fresh XLA compile of the whole step
    # program, which dominates tool wall-time over the remote tunnel.
    only = set(sys.argv[1:])
    if "cpu" in only:
        only.discard("cpu")
        jax.config.update("jax_platforms", "cpu")
    fast = "fast" in only
    only.discard("fast")
    core = ("full", "-store_query", "-plan")
    abl_train = ({k: ABLATIONS_TRAIN[k] for k in core} if fast
                 else ABLATIONS_TRAIN)
    abl_gated = ({k: ABLATIONS_GATED[k] for k in core} if fast
                 else ABLATIONS_GATED)

    backend = jax.default_backend()
    if backend == "tpu":
        tb, ts, tcap = 32768, 20, 1 << 16
        gb, gs, grows = 65536, 50, 1 << 18
    else:
        tb, ts, tcap = 64, 3, 1024
        gb, gs, grows = 64, 5, 2048

    results = {"backend": backend,
               "trainer": {"batch": tb, "store_rows": tcap, "ablations": {}},
               "gated": {"batch": gb, "store_rows": grows,
                         "store_kind": "corridor (worst case)",
                         "ablations": {}},
               "gated_rollout": {"batch": gb, "store_rows": grows,
                                 "store_kind":
                                 "real collector rollouts (bench.py)",
                                 "ablations": {}}}

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PROFILE.json")
    run_secs = [s for s in ("trainer", "gated", "gated_rollout")
                if not only or s in only]
    if only and os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        for sec in ("trainer", "gated", "gated_rollout"):
            if sec not in run_secs and sec in prev:
                results[sec] = prev[sec]

    if "trainer" in run_secs:
        for name, makers in abl_train.items():
            dt = time_trainer(makers, tb, ts, tcap)
            results["trainer"]["ablations"][name] = dt
            print(f"trainer {name:14s} {dt * 1e3:8.2f} ms/step "
                  f"({tb / dt / 1e6:6.2f} M env-steps/s)", flush=True)

    if "gated" in run_secs:
        for name, makers in abl_gated.items():
            dt = time_gated(makers, gb, gs, grows)
            results["gated"]["ablations"][name] = dt
            print(f"gated   {name:14s} {dt * 1e3:8.2f} ms/step "
                  f"({gb / dt / 1e6:6.2f} M env-steps/s)", flush=True)

    if "gated_rollout" in run_secs:
        # the headline store: bench.py's real rollout records
        for name, makers in abl_gated.items():
            dt = time_gated(makers, gb, gs, grows, store_kind="rollout")
            results["gated_rollout"]["ablations"][name] = dt
            print(f"gated@rollout {name:12s} {dt * 1e3:8.2f} ms/step "
                  f"({gb / dt / 1e6:6.2f} M env-steps/s)", flush=True)

    # markdown delta table
    for sec in run_secs:
        if "full" not in results[sec]["ablations"]:
            continue
        full = results[sec]["ablations"]["full"]
        print(f"\n| {sec} component | ms/step saved | % of step |")
        print("|---|---|---|")
        for name, dt in results[sec]["ablations"].items():
            if name == "full":
                continue
            delta = full - dt
            print(f"| {name[1:]} | {delta * 1e3:.2f} | "
                  f"{delta / full * 100:.1f}% |")
        print(f"| (full step) | {full * 1e3:.2f} ms | 100% |")

    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
