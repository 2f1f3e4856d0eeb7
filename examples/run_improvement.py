"""Continuous-improvement experiment CLI.

Runs the closed loop the DCARL paper claims (README.md:3): integrated
trainer from an EMPTY confidence store -> store fills with executed
(state, action, value) evidence -> the Welch z-test activates learned
candidates exactly where the data proves they beat the conservative
rule -> the gated fleet measurably outperforms the pure rule fleet on
matched seeds.  See dcarl_tpu/improvement.py for the mechanics.

    python examples/run_improvement.py                 # TPU-scale run
    python examples/run_improvement.py --smoke         # CPU-scale run
    python examples/run_improvement.py --out IMPROVEMENT

Writes <out>.json and <out>.png.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2048)
    p.add_argument("--train-steps", type=int, default=2000)
    p.add_argument("--chunk", type=int, default=100)
    p.add_argument("--store-capacity", type=int, default=1 << 17)
    p.add_argument("--eval-envs", type=int, default=1024)
    p.add_argument("--eval-steps", type=int, default=400)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default="IMPROVEMENT")
    p.add_argument("--smoke", action="store_true")
    p.add_argument("--suite", action="store_true",
                   help="run the full round-4 experiment suite (main + "
                        "reference-default + negative control + "
                        "pass-limited + two-session lifecycle)")
    p.add_argument("--session-root", default="/tmp/dcarl_sessions")
    args = p.parse_args()

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dcarl_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dcarl_tpu.improvement import (demo_config, run_improvement,
                                       run_improvement_suite)

    if args.smoke:
        args.batch, args.train_steps, args.chunk = 64, 250, 50
        args.store_capacity = 1 << 14
        args.eval_envs, args.eval_steps = 64, 250

    if args.suite:
        rep = run_improvement_suite(
            args.session_root,
            batch_per_device=args.batch,
            train_steps=args.train_steps,
            chunk=args.chunk,
            store_capacity_per_device=args.store_capacity,
            eval_envs=args.eval_envs,
            eval_steps=args.eval_steps,
            seed=args.seed,
        )
        with open(args.out + ".json", "w") as f:
            json.dump(rep, f, indent=1)
        print(json.dumps(rep["summary"]))
        return

    cfg = demo_config(visited_times_thres=6, rl_visited_times_min=3) \
        if args.smoke else demo_config()
    rep = run_improvement(
        cfg,
        batch_per_device=args.batch,
        train_steps=args.train_steps,
        chunk=args.chunk,
        store_capacity_per_device=args.store_capacity,
        eval_envs=args.eval_envs,
        eval_steps=args.eval_steps,
        seed=args.seed,
    )

    with open(args.out + ".json", "w") as f:
        json.dump(rep, f, indent=1)
    print(json.dumps({"improvement": rep["improvement"],
                      "store_rows": rep["train"]["store_rows"],
                      "final_rule_fraction":
                      rep["train"]["final_rule_fraction"]}))

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        h = rep["train"]["history"]
        fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
        axes[0].plot(h["step"], h["store_rows"], color="#3f51b5")
        axes[0].set_title("confidence store rows")
        axes[0].set_xlabel("train step")
        axes[1].plot(h["step"], h["rule_fraction"], color="#3f51b5")
        axes[1].set_ylim(0, 1.05)
        axes[1].set_title("trainer rule fraction (gate flips)")
        axes[1].set_xlabel("train step")
        labels = ["rule fleet", "gated fleet"]
        rates = [rep["eval_rule"]["mean_step_reward"],
                 rep["eval_gated"]["mean_step_reward"]]
        bars = axes[2].bar(labels, rates, color=["#9e9e9e", "#3f51b5"])
        act = rep["eval_gated"]["activation_fraction"]
        ratio = rep["improvement"]["reward_rate_ratio"]
        axes[2].set_title(f"deployment reward rate "
                          f"(x{ratio:.3f}, activation {act:.1%})")
        axes[2].bar_label(bars, fmt="%.4f")
        fig.suptitle("DCARL continuous improvement: store growth -> "
                     "z-test activation -> fleet beats the rule")
        fig.tight_layout()
        fig.savefig(args.out + ".png", dpi=120)
        print(f"wrote {args.out}.json, {args.out}.png")
    except Exception as e:  # matplotlib optional
        print(f"wrote {args.out}.json (no plot: {e})")


if __name__ == "__main__":
    main()
