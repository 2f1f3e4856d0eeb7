"""RLSDecision — the lane-level learning decision layer.

Re-design of
zzz_planning_decision_lane_models/learning.py:17-208.  The reference
wraps a 20-D multilane state, ships it over a TCP/msgpack socket to the
DQN+RLS agent process, and maps the returned discrete action 0-7 onto a
(target_lane, target_speed) command.  On TPU the socket disappears —
the agent is a function in the same program — and every step of every
env evaluates in one batch.

Action space (learning.py:156-208, documented in
gym_routing/envs/cz_dqn.py):
  0: rule (LaneUtility)            1: hard brake (-4 * 0.75)
  2: outside lane, keep speed      3: inside lane, keep speed
  4: outside lane, +2*0.75         5: inside lane, +2*0.75
  6: outside lane, -2*0.75         7: inside lane, -2*0.75
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.planning import lane_utility as LU
from dcarl_tpu.planning.multilane import MultiLaneState

ACC = 2.0
DECISION_DT = 0.75
HARD_BRAKE = 4.0
NUM_ACTIONS = 8


def wrap_state(mmap: MultiLaneState) -> jax.Array:
    """The 20-D RL state (learning.py:91-151): [0]=0,
    [1]=ego_lane_index, [2]=ego_speed, [3]=ego_vd, then per lane k the
    front vehicle (s, d, vs, vd) at [4+4k..] and rear at [12+4k..];
    defaults 50/k/20/0 (front) and -50/k/0/0 (rear); the single-lane
    case fills the phantom second lane with lane-1 defaults."""
    dtype = mmap.ego_speed.dtype
    batch = jnp.shape(mmap.ego_speed)
    L = mmap.num_lanes
    assert L <= 2, "the reference state layout carries two lanes"

    def pad_lane(arr, default):
        if L == 2:
            return arr
        fill = jnp.full(batch + (2 - L,), default, dtype)
        return jnp.concatenate([arr, fill], axis=-1)

    f_s = pad_lane(jnp.where(mmap.front.exists, mmap.front.s, 50.0), 50.0)
    f_d = pad_lane(jnp.where(mmap.front.exists, mmap.front.d,
                             jnp.arange(L, dtype=dtype)), 1.0)
    f_vs = pad_lane(jnp.where(mmap.front.exists, mmap.front.vs, 20.0), 20.0)
    f_vd = pad_lane(jnp.where(mmap.front.exists, mmap.front.vd, 0.0), 0.0)

    r_s = pad_lane(jnp.where(mmap.rear.exists, mmap.rear.s, -50.0), -50.0)
    r_d = pad_lane(jnp.where(mmap.rear.exists, mmap.rear.d,
                             jnp.arange(L, dtype=dtype)), 1.0)
    r_vs = pad_lane(jnp.where(mmap.rear.exists, mmap.rear.vs, 0.0), 0.0)
    r_vd = pad_lane(jnp.where(mmap.rear.exists, mmap.rear.vd, 0.0), 0.0)

    front = jnp.stack([f_s, f_d, f_vs, f_vd], axis=-1).reshape(batch + (8,))
    rear = jnp.stack([r_s, r_d, r_vs, r_vd], axis=-1).reshape(batch + (8,))

    head = jnp.stack([
        jnp.zeros(batch, dtype),
        mmap.ego_lane_index.astype(dtype),
        mmap.ego_speed,
        mmap.ego_vd,
    ], axis=-1)
    return jnp.concatenate([head, front, rear], axis=-1)


class LaneDecision(NamedTuple):
    target_lane_index: jax.Array
    target_speed: jax.Array


def decision_from_discrete_action(
    mmap: MultiLaneState,
    action: jax.Array,  # [...] i32 in [0, 8)
) -> LaneDecision:
    """get_decision_from_discrete_action (learning.py:156-208),
    vectorized with a select over the 8 commands."""
    L = mmap.num_lanes
    inside = jnp.int32(0 if L == 1 else 1)
    outside = jnp.int32(0)
    ego_y = jnp.round(mmap.ego_lane_index).astype(jnp.int32)
    v = mmap.ego_speed

    rule_lane, rule_speed = LU.lateral_decision(mmap)

    lanes = jnp.stack([
        rule_lane,
        ego_y,                              # 1 hard brake
        jnp.broadcast_to(outside, ego_y.shape),
        jnp.broadcast_to(inside, ego_y.shape),
        jnp.broadcast_to(outside, ego_y.shape),
        jnp.broadcast_to(inside, ego_y.shape),
        jnp.broadcast_to(outside, ego_y.shape),
        jnp.broadcast_to(inside, ego_y.shape),
    ], axis=-1)
    speeds = jnp.stack([
        rule_speed,
        v - HARD_BRAKE * DECISION_DT,
        v, v,
        v + ACC * DECISION_DT, v + ACC * DECISION_DT,
        v - ACC * DECISION_DT, v - ACC * DECISION_DT,
    ], axis=-1)

    a = jnp.clip(action, 0, NUM_ACTIONS - 1)[..., None]
    return LaneDecision(
        target_lane_index=jnp.take_along_axis(lanes, a, axis=-1)[..., 0],
        target_speed=jnp.take_along_axis(speeds, a, axis=-1)[..., 0],
    )
