"""Closed-loop rollout demo: vectorized T-intersection env + Werling
planner + controller, with round-robin value collection (the reference's
test_value_collect.py loop, fully on-device).

Usage: python examples/run_rollout.py [--envs 8] [--steps 1200] [--cpu]
"""

import argparse

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--envs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--readable", action="store_true",
                    help="use the batch-first readable collector "
                         "(slow compile on a remote TPU; the default "
                         "is the lane-major fast collector)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dcarl_tpu.env.scenario import t_intersection

    sc = t_intersection()
    B, S = args.envs, args.steps
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    import time

    if args.readable:
        from dcarl_tpu.planning.rollout import make_collector

        init_fn, run_fn = make_collector(sc)
        carry = init_fn(keys)
        step_keys = jax.random.split(jax.random.PRNGKey(1),
                                     B * S).reshape(B, S, 2)
        t0 = time.time()
        carry, rec = run_fn(carry, step_keys)
        jax.block_until_ready(rec.reward)
        dt = time.time() - t0
        done = np.asarray(rec.done)
        ret = np.asarray(rec.episode_return)
        act = np.asarray(rec.used_action)
        coll = np.asarray(rec.collided)
        passed = np.asarray(rec.passed)
    else:
        from dcarl_tpu.planning.fast_rollout import make_collector_fast

        init_fn, run_fn = make_collector_fast(sc)
        carry = init_fn(keys)
        step_keys = jax.random.split(jax.random.PRNGKey(1), S)
        t0 = time.time()
        carry, rec = run_fn(carry, step_keys)
        jax.block_until_ready(rec.reward)
        dt = time.time() - t0
        # lane-major records are [S, ..., B]; flatten like the readable
        done = np.asarray(rec.done).T
        ret = np.asarray(rec.episode_return).T
        act = np.asarray(rec.used_action).T
        coll = np.asarray(rec.collided).T
        passed = np.asarray(rec.passed).T

    n_ep = int(done.sum())
    print(f"{B} envs x {S} steps in {dt:.2f}s "
          f"({B * S / dt:,.0f} env-steps/s incl. compile)")
    print(f"episodes: {n_ep}, passes: {int(passed[done].sum())}, "
          f"collisions: {int(coll[done].sum())}")
    # collected {state, action, return} tuples, like collected_data.txt
    rows = [(int(a), float(r)) for a, r in zip(act[done], ret[done])]
    print("sample (action, return) records:", rows[:10])


if __name__ == "__main__":
    main()
