"""Continuous-improvement loop, end-to-end at CPU scale (default-on).

The capability the framework exists for (reference README.md:3): the
integrated trainer fills the confidence store from an empty start, the
train-mode gate flips off pure-rule behavior as rule evidence
accumulates (RLS.py:100-118), and at deployment the Welch z-test
(RLS.py:120-157) activates learned candidates where the data proves
they beat a deliberately conservative rule — measurably improving the
fleet's reward rate on matched seeds with no safety regression.

The full-scale run with committed artifacts is
examples/run_improvement.py (IMPROVEMENT.json / .png); this pins the
same loop at a small, deterministic scale.
"""

import numpy as np
import pytest

from dcarl_tpu.config import DRIVING_HALF_WIDTHS
from dcarl_tpu.improvement import demo_config, run_improvement


@pytest.fixture(scope="module")
def report():
    # CPU-affordable scale: doubled box half-widths + low visit
    # thresholds make evidence accumulate fast enough that 48 envs x
    # 250 steps reach activation (~3 min); the committed
    # IMPROVEMENT.json is the full-scale TPU run of the same loop.
    wide = tuple(min(w * 2, 50.0) for w in DRIVING_HALF_WIDTHS[:-1]) + (0.1,)
    cfg = demo_config(visited_times_thres=4, rl_visited_times_min=2,
                      half_widths=wide)
    return run_improvement(
        cfg, batch_per_device=48, train_steps=250, chunk=50,
        store_capacity_per_device=1 << 14, eval_envs=48, eval_steps=250,
        seed=0, n_devices=1, use_pallas=False)


def test_store_grows_and_gate_flips(report):
    assert report["train"]["store_rows"] > 1000
    # the gate flips off pure-rule once the rule's box statistics clear
    # visited_times_thres
    assert report["train"]["final_rule_fraction"] < 0.95


def test_ztest_activates_candidates(report):
    # deployment-mode activation happens (act_test picks non-rule
    # candidates somewhere), while the empty-store control never does
    assert report["eval_rule"]["activation_fraction"] == 0.0
    assert report["eval_gated"]["activation_fraction"] > 0.02


def test_gated_fleet_beats_rule_fleet(report):
    imp = report["improvement"]
    # measurable improvement on matched seeds...
    assert imp["reward_rate_ratio"] > 1.0, imp
    # ...with no safety regression
    assert imp["collision_delta_per_kstep"] <= 0.0
    assert report["eval_gated"]["pass_rate"] >= \
        report["eval_rule"]["pass_rate"] - 1e-9


@pytest.fixture(scope="module")
def negative_report():
    # Same scale as `report` but under the REFERENCE's reward
    # convention (0 per step, -100 on collision): no candidate can
    # out-value a collision-free rule, a crashing one is strictly
    # worse, and the gate must stay shut.
    import dataclasses

    wide = tuple(min(w * 2, 50.0) for w in DRIVING_HALF_WIDTHS[:-1]) + (0.1,)
    cfg = demo_config(visited_times_thres=4, rl_visited_times_min=2,
                      half_widths=wide, value_mode="reference",
                      explore_low=-1.0, explore_high=0.0,
                      rule_good_thres=-0.1)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, speed_reward_scale=0.0))
    return run_improvement(
        cfg, batch_per_device=48, train_steps=250, chunk=50,
        store_capacity_per_device=1 << 14, eval_envs=48, eval_steps=250,
        seed=0, n_devices=1, use_pallas=False)


def test_negative_control_bad_candidates_never_activate(negative_report):
    """The safety half of DCARL's claim at fleet scale (lower-bound
    selection semantics, Simulation_1/test_DCARL.py:20-28 /
    RLS.py:135-154): when every candidate is genuinely worse than the
    rule, activation stays ~0 and the gated fleet does not regress
    against the pure rule fleet."""
    imp = negative_report["improvement"]
    # bad candidates must not be activated (tiny exploration-boundary
    # slack allowed: < 2% of decisions)
    assert imp["activation_fraction"] < 0.02, imp
    # no safety regression: gated collision rate does not exceed rule's
    assert imp["collision_delta_per_kstep"] <= 0.5, imp
    # and no meaningful performance regression either.  Under the
    # reference's zero-per-step reward the rule fleet's reward rate is
    # exactly 0, so the ratio serializes as null (no Infinity in
    # committed JSON) and the regression check moves to the delta:
    # gated reward reflects only collisions (-100 each), so ~0 delta
    # means no added collisions.
    if imp["reward_rate_ratio"] is not None:
        assert imp["reward_rate_ratio"] > 0.95, imp
    else:
        assert imp["reward_rate_delta"] >= -0.05, imp


def test_episode_value_mode_trains_and_deploys():
    """The episode-return write path (value_mode='episode': suffix
    returns to the episode boundary, the reference collection loop's
    whole-episode semantics) through the FULL loop at CPU scale:
    staggered first episodes are masked, the store fills with
    full-episode values, and the gated fleet deploys against it.  The
    pass-recovery measurement at scale is the committed
    IMPROVEMENT.json pass_limited_episode arm."""
    import dataclasses

    wide = tuple(min(w * 2, 50.0) for w in DRIVING_HALF_WIDTHS[:-1]) + (0.1,)
    cfg = demo_config(visited_times_thres=4, rl_visited_times_min=2,
                      half_widths=wide, value_mode="episode", gamma=1.0,
                      n_step_window=60)
    cfg = dataclasses.replace(
        cfg, env=dataclasses.replace(cfg.env, max_episode_steps=60,
                                     reward_pass=2.0))
    report = run_improvement(
        cfg, batch_per_device=48, train_steps=200, chunk=50,
        store_capacity_per_device=1 << 14, eval_envs=32, eval_steps=120,
        seed=0, n_devices=1, use_pallas=False,
        backfill_budget_per_step=192, init_step_offset=True)
    # store fills with (masked-warmup) full-episode records
    assert report["train"]["store_rows"] > 500
    # records are whole-episode suffix returns: with gamma=1 and the
    # env's nonnegative shaped reward every stored value is >= 0 and
    # the per-episode first entry carries the episode total
    assert report["train"]["final_rule_fraction"] < 1.0
    assert report["eval_rule"]["activation_fraction"] == 0.0
