"""VEG — Value-Estimation-Guided continuous-action planner.

TPU-native re-design of the reference's continuous_models stack
(software/src/planning/decision/continuous_models/VEG/VEG_planner.py +
Werling_planner_RL.py): the junction-time planner that

1. wraps a 16-D Frenet state (ego + 3 nearest obstacles,
   VEG_planner.py:140-178),
2. extracts the rule trajectory's "RL point" — (d, s_d - 15/3.6) at
   KICK_IN_POINT = 7 (2.1 s at DT 0.3; VEG_planner.py:211-219),
3. ships it to the RL agent over TCP 2333 and receives
   (rl_action = [d_target, v_target], rl_q, rule_q),
4. "kicks in" a Werling trajectory toward the RL target iff
   ``rl_q - rule_q > THRESHOLD`` and the action is in range, else keeps
   the rule trajectory (generate_VEG_trajectory, :224-240).

On TPU the socket disappears — the Q-function is a function in the same
program — and the single-target Werling solve (quintic lateral to
d_target + quartic longitudinal to v_target,
Werling_planner_RL.py:123-160) is a closed-form batched evaluation.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.config import WerlingConfig
from dcarl_tpu.ops import polynomial as poly
from dcarl_tpu.ops import spline as spl
from dcarl_tpu.planning import werling as W

THRESHOLD = 0.2                    # VEG_planner.py:20
ACTION_SPACE_SYMMETRY = 15.0 / 3.6  # :22 (sic: ACTION_SPACE_SYMMERTY)
KICK_IN_POINT = 7                  # :27 — 2.1 s / DT 0.3
OBSTACLES_CONSIDERED = 3
MIN_SPEED_RL = 0.5                 # Werling_planner_RL emergency stop
ACTION_LIMIT = 2333.0              # out-of-range sentinel (:235)

VEG_STATE_DIM = 16


import dataclasses


@dataclasses.dataclass(frozen=True)
class VEGConfig:
    """Variant switch between the two reference VEG stacks.

    ``variant="veg"`` is VEG/VEG_planner.py (defaults above);
    ``variant="itsc"`` is VEG_ITSC/VEG_planner.py + Werling_trajectory
    .py — the ITSC-paper build, whose behavioral deltas are:

    * Q-advantage gate threshold 5.0, not 0.2
      (VEG_ITSC/VEG_planner.py:88, :148 ``q_value - rule_q > threshold``)
    * +12.5/3.6 m/s speed bias added to the received RL speed action
      before planning (:149)
    * emergency stop below 3/3.6 m/s, not 0.5 (Werling_trajectory
      .py:188-189)
    * the executed trajectory is TWO chained Werling segments: the RL
      kick segment, then a rule-optimal continuation planned from its
      end state (trajectory_update_withRL_second,
      Werling_trajectory.py:172-240)
    * the longitudinal start is biased one second ahead
      (``s0 = ffstate.s + c_speed * 1.0``, :202/:219)
    * the rule point is sampled at delta_T = 0.75 s of its finer 0.15 s
      grid (index 15 ~ 2.25 s; VEG_ITSC/VEG_planner.py:114-115, :246-252)
    """

    variant: str = "veg"
    threshold: float = THRESHOLD
    speed_bias: float = 0.0
    min_speed_rl: float = MIN_SPEED_RL
    second_segment: bool = False
    s0_lookahead_s: float = 0.0
    kick_in_point: int = KICK_IN_POINT


def itsc_config() -> VEGConfig:
    return VEGConfig(
        variant="itsc",
        threshold=5.0,
        speed_bias=12.5 / 3.6,
        min_speed_rl=3.0 / 3.6,
        second_segment=True,
        s0_lookahead_s=1.0,
        kick_in_point=KICK_IN_POINT,  # same ~2.1-2.25 s on our 0.3 s grid
    )


class VEGState(NamedTuple):
    """What the agent sees per tick (wrap_state): 16-D state +
    [collision, leave_mmap, threshold] + the rule point."""

    state: jax.Array       # [16]
    collision: jax.Array   # scalar
    leave: jax.Array       # scalar
    rule_point: jax.Array  # [2] (d, s_d - symmetry) at the kick-in step


def wrap_state(ref_line: jax.Array, ego: jax.Array,
               obstacles: jax.Array, obstacles_valid: jax.Array,
               collision: jax.Array, leave: jax.Array,
               rule_lattice: W.Lattice, rule_index: jax.Array) -> VEGState:
    """VEG_planner.wrap_state (:140-178) + get_RL_point_from_trajectory
    (:211-219), vectorized: ego/obstacle states in Frenet frame of the
    reference path, obstacles sorted by Euclidean distance, nearest 3."""
    from dcarl_tpu.ops.geometry import cartesian_to_frenet

    ego_f = cartesian_to_frenet(ego[0], ego[1], ego[2], ego[3], ego[4],
                                ref_line)
    head = jnp.stack([ego_f.s, -ego_f.d, ego_f.vs, ego_f.vd])

    dist = jnp.sqrt((obstacles[:, 0] - ego[0]) ** 2
                    + (obstacles[:, 1] - ego[1]) ** 2)
    dist = jnp.where(obstacles_valid, dist, jnp.inf)
    order = jnp.argsort(dist)[:OBSTACLES_CONSIDERED]

    def obs_feat(k):
        o = obstacles[k]
        f = cartesian_to_frenet(o[0], o[1], o[2], o[3], o[4], ref_line)
        present = jnp.isfinite(dist[k])
        return jnp.where(present,
                         jnp.stack([f.s, -f.d, f.vs, f.vd]),
                         jnp.zeros((4,), obstacles.dtype))

    tail = jax.vmap(obs_feat)(order).reshape(-1)
    state = jnp.concatenate([head, tail])

    # rule point: the rule trajectory's (d, s_d) at the kick-in step
    p = jnp.where(rule_index == 0, jnp.argmin(rule_lattice.cf), rule_index - 1)
    kick = min(KICK_IN_POINT, rule_lattice.d.shape[1] - 1)
    rule_point = jnp.stack([
        rule_lattice.d[p, kick],
        rule_lattice.s_d[p, kick] - ACTION_SPACE_SYMMETRY,
    ])
    return VEGState(state=state, collision=collision, leave=leave,
                    rule_point=rule_point)


def plan_rl_kick(rp: spl.RefPath, start: W.FrenetStart,
                 d_target: jax.Array, v_target: jax.Array,
                 cfg: WerlingConfig = WerlingConfig()
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-target Werling solve toward the RL action
    (frenet_optimal_planning_withRL, Werling_planner_RL.py:162-210):
    lateral quintic start -> d_target, longitudinal quartic start speed
    -> v_target over one horizon.  Returns (xy[T, 2], speed[T],
    feasible, end_state)."""
    Ti = cfg.horizons[0]
    n_t = cfg.n_time_steps
    dtype = jnp.result_type(start.s0)
    t = jnp.arange(n_t, dtype=dtype) * cfg.dt

    lat = poly.solve_quintic(start.c_d, start.c_d_d, start.c_d_dd,
                             d_target, 0.0, 0.0, Ti)
    lat_b = jax.tree.map(lambda a: jnp.asarray(a, dtype)[None], lat)
    d = poly.quintic_eval(lat_b, t[None])[0]
    lon = poly.solve_quartic(start.s0, start.c_speed, 0.0, v_target, 0.0, Ti)
    lon_b = jax.tree.map(lambda a: jnp.asarray(a, dtype)[None], lon)
    s = poly.quartic_eval(lon_b, t[None])[0]
    s_d = poly.quartic_d1(lon_b, t[None])[0]
    s_dd = poly.quartic_d2(lon_b, t[None])[0]

    ix = spl.spline_eval(rp.sx, s)
    iy = spl.spline_eval(rp.sy, s)
    iyaw = jnp.arctan2(spl.spline_d1(rp.sy, s), spl.spline_d1(rp.sx, s))
    x = ix + d * jnp.cos(iyaw + jnp.pi / 2.0)
    y = iy + d * jnp.sin(iyaw + jnp.pi / 2.0)

    feasible = (~jnp.any(s_d > cfg.max_speed)
                & ~jnp.any(jnp.abs(s_dd) > cfg.max_accel))
    end = W.FrenetStart(s0=s[-1], c_d=d[-1], c_d_d=0.0, c_d_dd=0.0,
                        c_speed=s_d[-1])
    return jnp.stack([x, y], axis=1), s_d, feasible, end


class VEGPlan(NamedTuple):
    xy: jax.Array            # [T, 2] executable trajectory
    desired_speed: jax.Array  # [T]
    kicked_in: jax.Array     # bool — RL overrode the rule
    rule_index: jax.Array


def plan_veg(
    rp: spl.RefPath,
    ref_line: jax.Array,
    ego: jax.Array,                # [5]
    obstacles: jax.Array,          # [K, 5]
    obstacles_valid: jax.Array,    # [K]
    rl_action: jax.Array,          # [2] (d_target, v_target) — already
                                   # shifted by ACTION_SPACE_SYMMETRY
    rl_q: jax.Array,
    rule_q: jax.Array,
    cfg: WerlingConfig = WerlingConfig(),
    vcfg: VEGConfig = VEGConfig(),
) -> VEGPlan:
    """One VEG planning tick (trajectory_update :111-139 +
    generate_VEG_trajectory :224-240; ITSC variant per
    :class:`VEGConfig`): kick in the RL trajectory iff its Q beats the
    rule Q by the variant threshold, the action is in range, and the
    target speed clears the emergency-stop floor.  For the ITSC
    variant the kicked trajectory is the two-segment chain of
    trajectory_update_withRL_second."""
    out = W.plan_with_rule(rp, ref_line, ego, obstacles, obstacles_valid,
                           cfg)
    rule_traj = W.trajectory_by_index(out.lattice, out.rule_index)

    start = W.start_state_from_ego(ego[0], ego[1], ego[2], ego[3], ego[4],
                                   ref_line)
    if vcfg.s0_lookahead_s:
        # ITSC longitudinal bias: s0 = ffstate.s + c_speed * 1.0
        # (Werling_trajectory.py:202/:219)
        start = start._replace(
            s0=start.s0 + start.c_speed * vcfg.s0_lookahead_s)
    v_cmd = rl_action[1] + vcfg.speed_bias
    rl_xy, rl_speed, rl_feasible, rl_end = plan_rl_kick(
        rp, start, rl_action[0], v_cmd, cfg)

    if vcfg.second_segment:
        # ITSC continuation: a rule-optimal (obstacle-free, cost-min)
        # segment planned from the kick segment's end state and chained
        # after it (trajectory_update_withRL_second's second
        # frenet_optimal_planning with ob=[]).
        lat2 = W.plan(rp, rl_end, cfg)
        cost2 = jnp.where(lat2.feasible, lat2.cf, jnp.inf)
        p2 = jnp.argmin(cost2)
        lat2_xy = jnp.stack([lat2.x[p2], lat2.y[p2]], axis=1)
        lat2_speed = lat2.s_d[p2]
        rl_xy = jnp.concatenate([rl_xy, lat2_xy], axis=0)
        rl_speed = jnp.concatenate([rl_speed, lat2_speed])
        rule_xy = jnp.concatenate([rule_traj.xy, rule_traj.xy[-1:]
                                   .repeat(lat2_xy.shape[0], axis=0)])
        rule_speed = jnp.concatenate([
            rule_traj.desired_speed,
            rule_traj.desired_speed[-1:].repeat(lat2_speed.shape[0])])
    else:
        rule_xy = rule_traj.xy
        rule_speed = rule_traj.desired_speed

    in_range = jnp.all(jnp.abs(rl_action) < ACTION_LIMIT)
    not_stopping = v_cmd >= vcfg.min_speed_rl
    kick = ((rl_q - rule_q) > vcfg.threshold) & in_range & rl_feasible

    # emergency stop: RL commands near-zero speed -> rule path, speed 0
    # (trajectory_update_RL_kick :125-135; ITSC floor 3/3.6,
    # Werling_trajectory.py:188-189)
    xy = jnp.where(kick, rl_xy, rule_xy)
    speed = jnp.where(kick & not_stopping, rl_speed,
                      jnp.where(kick, jnp.zeros_like(rl_speed),
                                rule_speed))
    return VEGPlan(xy=xy, desired_speed=speed,
                   kicked_in=kick, rule_index=out.rule_index)
