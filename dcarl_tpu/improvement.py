"""Continuous-improvement experiment — the capability DCARL exists for.

The paper's claim (reference README.md:3, "Continuous Improvement of
Self-Driving Cars using Dynamic Confidence-Aware Reinforcement
Learning") is a *closed loop*: the vehicle drives with a trusted rule
policy, every executed (state, action, value) lands in the confidence
dataset (deepq/RLS.py:185-215), and once the Welch z-test proves — with
confidence — that a learned candidate beats the rule somewhere, that
candidate is activated exactly there (RLS.py:120-157).  Fleet
performance then improves monotonically while safety is anchored to the
rule everywhere the data is silent.

This module runs that loop end-to-end on the native driving stack:

1. **Train** (`train_store`): the integrated lane-major trainer
   (train_fast.py — the on-vehicle loop of deepq/dqn.py:226-236 as one
   SPMD program) from an *empty* store.  A deliberately conservative
   rule (inflated collision-check radius, the usual posture of a
   deployed rule policy) brakes for obstacles well before it must, so
   there is real headroom for candidates to win.
2. **Deploy** (`evaluate_gated`): the confidence-gated driver
   (fast_rollout.make_gated_driver_fast — inference mode,
   is_training=False, dqn.py:106) over the trained store, seed-matched
   against the same driver with an EMPTY store (the z-test then never
   passes, so it is exactly the pure rule fleet — same compiled
   program, same env randomness).
3. **Compare**: activation fraction, mean step reward, episode return,
   pass/collision rates.  Improvement = the gated fleet beats the rule
   fleet on return while the z-test keeps activations confined to
   well-evidenced states.

`examples/run_improvement.py` is the CLI; `tests/test_improvement.py`
runs the CPU-scale version default-on.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dcarl_tpu.config import (DCARLConfig, DQNConfig, EnvConfig,
                              WerlingConfig, driving_store_config)
from dcarl_tpu.env.scenario import t_intersection
from dcarl_tpu.parallel.mesh import make_mesh
from dcarl_tpu.planning.fast_rollout import make_gated_driver_fast
from dcarl_tpu.train_fast import make_trainer_fast


def demo_config(
    conservative_radius: float = 6.0,
    confidence_thres: float = 0.8,
    visited_times_thres: int = 10,
    rl_visited_times_min: int = 5,
    reset_jitter: float = 0.1,
    value_mode: str = "nstep",
    select_mode: str = "best",
    **store_overrides,
) -> DCARLConfig:
    """The improvement-demo configuration.

    ``conservative_radius`` inflates ONLY the rule policy's collision
    check (WerlingConfig.robot_radius feeds the rule's path gating in
    fast_rollout; the env's physical collision radius stays at
    EnvConfig.collision_radius=1.0) — the rule brakes whenever anything
    comes within 2.5 m of a candidate path, long before contact.  That
    is the reference scenario: a safe, over-cautious rule with headroom
    the learned candidates can claim where the data proves it.
    """
    return DCARLConfig(
        env=EnvConfig(reset_jitter=reset_jitter, offroute_dist=6.0),
        werling=WerlingConfig(robot_radius=conservative_radius),
        store=driving_store_config(
            confidence_thres=confidence_thres,
            visited_times_thres=visited_times_thres,
            rl_visited_times_min=rl_visited_times_min,
            value_mode=value_mode,
            select_mode=select_mode,
            **store_overrides,
        ),
        dqn=DQNConfig(batch_size=32, replay_capacity=1 << 16),
    )


def train_store(
    cfg: DCARLConfig,
    batch_per_device: int = 256,
    steps: int = 600,
    chunk: int = 50,
    store_capacity_per_device: int = 1 << 15,
    seed: int = 0,
    n_devices: int = 1,
    use_pallas: Optional[bool] = None,
) -> Tuple[Dict[str, np.ndarray], Dict[str, list]]:
    """Run the integrated trainer from an empty store.

    Returns (store, history): ``store`` holds the merged
    keys/values/valid arrays of every shard; ``history`` has per-chunk
    means of the training metrics (store_rows, rule_fraction, ...).
    """
    mesh = make_mesh("env", jax.devices()[:n_devices])
    init_fn, _, _, run_factory = make_trainer_fast(
        mesh, "env", cfg,
        batch_per_device=batch_per_device,
        store_capacity_per_device=store_capacity_per_device,
        replay_capacity_per_device=store_capacity_per_device,
        use_pallas=use_pallas,
    )
    run_fn = run_factory(chunk)
    state = init_fn(seed=seed)

    history: Dict[str, list] = {}
    key = jax.random.PRNGKey(seed + 1)
    for i in range(steps // chunk):
        key, sub = jax.random.split(key)
        state, metrics = run_fn(state, sub)
        m = {k: np.asarray(v) for k, v in metrics._asdict().items()}
        for k, v in m.items():
            history.setdefault(k, []).append(float(v.mean()))
        history.setdefault("step", []).append((i + 1) * chunk)

    # Merge store shards: [S, N, D] -> [S*N, D] with a per-shard valid
    # prefix mask (matches the psum-of-shard-moments query semantics).
    keys_sh = np.asarray(state.store_keys)           # [S, N, D]
    vals_sh = np.asarray(state.store_values)         # [S, N]
    sizes = np.asarray(state.store_size)             # [S]
    s, n, d = keys_sh.shape
    valid = (np.arange(n)[None, :] < sizes[:, None])
    store = {
        "keys": keys_sh.reshape(s * n, d).astype(np.float32),
        "values": vals_sh.reshape(s * n).astype(np.float32),
        "valid": valid.reshape(s * n),
        "rows": int(sizes.sum()),
    }
    return store, history


def evaluate_gated(
    cfg: DCARLConfig,
    store: Optional[Dict[str, np.ndarray]],
    n_envs: int = 512,
    n_steps: int = 300,
    seed: int = 100,
    use_pallas: Optional[bool] = None,
    store_rows_hint: int = 1024,
) -> Dict[str, float]:
    """Roll the confidence-gated fleet; ``store=None`` means the empty
    store (== the pure rule fleet on identical seeds)."""
    sc = t_intersection(cfg.env)
    init_f, run_f = make_gated_driver_fast(
        sc, cfg.env, cfg.werling, store_cfg=cfg.store,
        use_pallas=use_pallas)

    if store is None:
        n = store_rows_hint
        d = len(cfg.store.half_widths or ()) or 21
        s_keys = jnp.full((n, d), 1e9, jnp.float32)
        s_vals = jnp.zeros((n,), jnp.float32)
        s_valid = jnp.zeros((n,), bool)
    else:
        s_keys = jnp.asarray(store["keys"])
        s_vals = jnp.asarray(store["values"])
        s_valid = jnp.asarray(store["valid"])

    keys = jax.random.split(jax.random.PRNGKey(seed), n_envs)
    carry = init_f(keys)
    sk = jax.random.split(jax.random.PRNGKey(seed + 1), n_steps)
    _, (reward, done, passed, collided, executed, gate) = run_f(
        carry, sk, s_keys, s_vals, s_valid)

    reward = np.asarray(reward)
    done = np.asarray(done)
    passed = np.asarray(passed) & done
    collided = np.asarray(collided) & done
    gate = np.asarray(gate)

    episodes = int(done.sum())
    denom = max(episodes, 1)
    kilosteps = reward.size / 1000.0
    return {
        # reward per env-step: the fleet's time-normalized reward rate —
        # the primary comparison (a faster fleet completes MORE, shorter
        # episodes, so per-episode return would penalize speed)
        "mean_step_reward": float(reward.mean()),
        "episodes": episodes,
        "passes_per_kstep": float(passed.sum()) / kilosteps,
        "collisions_per_kstep": float(collided.sum()) / kilosteps,
        "pass_rate": float(passed.sum()) / denom,
        "collision_rate": float(collided.sum()) / denom,
        "activation_fraction": float((gate != 0).mean()),
        "env_steps": int(reward.size),
    }


def run_improvement(
    cfg: Optional[DCARLConfig] = None,
    batch_per_device: int = 256,
    train_steps: int = 600,
    chunk: int = 50,
    store_capacity_per_device: int = 1 << 15,
    eval_envs: int = 512,
    eval_steps: int = 300,
    seed: int = 0,
    n_devices: int = 1,
    use_pallas: Optional[bool] = None,
) -> Dict:
    """The full experiment.  Returns a JSON-serializable report."""
    cfg = cfg or demo_config()
    store, history = train_store(
        cfg, batch_per_device=batch_per_device, steps=train_steps,
        chunk=chunk, store_capacity_per_device=store_capacity_per_device,
        seed=seed, n_devices=n_devices, use_pallas=use_pallas)

    rule = evaluate_gated(cfg, None, n_envs=eval_envs, n_steps=eval_steps,
                          seed=seed + 100, use_pallas=use_pallas,
                          store_rows_hint=len(store["values"]))
    gated = evaluate_gated(cfg, store, n_envs=eval_envs, n_steps=eval_steps,
                           seed=seed + 100, use_pallas=use_pallas)

    return {
        "config": {
            "conservative_radius": cfg.werling.robot_radius,
            "confidence_thres": cfg.store.confidence_thres,
            "visited_times_thres": cfg.store.visited_times_thres,
            "rl_visited_times_min": cfg.store.rl_visited_times_min,
            "batch_per_device": batch_per_device,
            "train_steps": train_steps,
            "eval_envs": eval_envs,
            "eval_steps": eval_steps,
            "seed": seed,
        },
        "train": {
            "store_rows": store["rows"],
            "final_rule_fraction": history["rule_fraction"][-1],
            "history": history,
        },
        "eval_rule": rule,
        "eval_gated": gated,
        "improvement": {
            "reward_rate_ratio": gated["mean_step_reward"]
            / rule["mean_step_reward"]
            if rule["mean_step_reward"] else float("inf"),
            "reward_rate_delta": gated["mean_step_reward"]
            - rule["mean_step_reward"],
            "pass_throughput_ratio": gated["passes_per_kstep"]
            / rule["passes_per_kstep"]
            if rule["passes_per_kstep"] else float("inf"),
            "collision_delta_per_kstep": gated["collisions_per_kstep"]
            - rule["collisions_per_kstep"],
            "activation_fraction": gated["activation_fraction"],
        },
    }
