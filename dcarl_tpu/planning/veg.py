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
    feasible)."""
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
    return jnp.stack([x, y], axis=1), s_d, feasible


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
) -> VEGPlan:
    """One VEG planning tick (trajectory_update :111-139 +
    generate_VEG_trajectory :224-240): kick in the RL trajectory iff
    its Q beats the rule Q by THRESHOLD, the action is in range, and
    the target speed clears the emergency-stop floor."""
    out = W.plan_with_rule(rp, ref_line, ego, obstacles, obstacles_valid,
                           cfg)
    rule_traj = W.trajectory_by_index(out.lattice, out.rule_index)

    start = W.start_state_from_ego(ego[0], ego[1], ego[2], ego[3], ego[4],
                                   ref_line)
    rl_xy, rl_speed, rl_feasible = plan_rl_kick(
        rp, start, rl_action[0], rl_action[1], cfg)

    in_range = jnp.all(jnp.abs(rl_action) < ACTION_LIMIT)
    not_stopping = rl_action[1] >= MIN_SPEED_RL
    kick = ((rl_q - rule_q) > THRESHOLD) & in_range & rl_feasible

    # emergency stop: RL commands near-zero speed -> rule path, speed 0
    # (trajectory_update_RL_kick :125-135)
    xy = jnp.where(kick, rl_xy, rule_traj.xy)
    speed = jnp.where(kick & not_stopping, rl_speed,
                      jnp.where(kick, jnp.zeros_like(rl_speed),
                                rule_traj.desired_speed))
    return VEGPlan(xy=xy, desired_speed=speed,
                   kicked_in=kick, rule_index=out.rule_index)
