"""Rigid-body kinematics: frame composition and Cartesian->Frenet.

TPU-native re-design of the reference's compiled Cython kinematics
(software/src/library/src/zzz_common/kinematics.pyx): the ROS-message
plumbing becomes a plain :class:`RigidBodyState` pytree of arrays, so
the full rigid-body composition (quaternion orientation, velocity with
omega x r transport terms, acceleration with centripetal / Euler /
Coriolis terms — kinematics.pyx:18-113) is one jitted function that
batches over tracked objects and envs with ``vmap``.

The Frenet conversion (kinematics.pyx:115-178) lives in
:func:`dcarl_tpu.ops.geometry.cartesian_to_frenet`; a state-pytree
wrapper is provided here for parity.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from dcarl_tpu.ops.geometry import FrenetState, cartesian_to_frenet


class RigidBodyState(NamedTuple):
    """Pose + twist + accel of one body in some frame (the
    RigidBodyState msg, driver/protocol/msg, without covariances)."""

    position: jax.Array       # [3]
    orientation: jax.Array    # [4] quaternion (x, y, z, w)
    linear_vel: jax.Array     # [3]
    angular_vel: jax.Array    # [3]
    linear_acc: jax.Array     # [3]
    angular_acc: jax.Array    # [3]

    @classmethod
    def create(cls, position=None, orientation=None, linear_vel=None,
               angular_vel=None, linear_acc=None, angular_acc=None,
               dtype=jnp.float32):
        z3 = jnp.zeros((3,), dtype)
        qi = jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype)

        def pick(v, default):
            return default if v is None else jnp.asarray(v, dtype)

        return cls(pick(position, z3), pick(orientation, qi),
                   pick(linear_vel, z3), pick(angular_vel, z3),
                   pick(linear_acc, z3), pick(angular_acc, z3))


def quaternion_multiply(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Hamilton product, (x, y, z, w) layout (tf.transformations
    convention used at kinematics.pyx:59)."""
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ], axis=-1)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """[..., 4] (x,y,z,w) -> [..., 3, 3] rotation matrix."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w),
                   2 * (x * z + y * w)], axis=-1),
        jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z),
                   2 * (y * z - x * w)], axis=-1),
        jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w),
                   1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)


def yaw_to_quaternion(yaw) -> jax.Array:
    half = jnp.asarray(yaw) / 2.0
    zero = jnp.zeros_like(half)
    return jnp.stack([zero, zero, jnp.sin(half), jnp.cos(half)], axis=-1)


def quaternion_yaw(q: jax.Array) -> jax.Array:
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def get_absolute_state(rel: RigidBodyState, base: RigidBodyState
                       ) -> RigidBodyState:
    """Full rigid-body frame composition (kinematics.pyx:18-113):

      q_abs   = q_base * q_rel
      r_abs   = R_base r_rel + r_base
      w_abs   = R_base w_rel + w_base
      v_abs   = v_base + w_base x (R_base r_rel) + R_base v_rel
      e_abs   = R_base e_base' ... (reference applies R to base accel)
      a_abs   = a_base + e_base x r + w x (w x r) + a_rel + 2 w x v_rel

    Note two reference quirks reproduced faithfully: the base
    angular/linear accelerations are rotated by R_base (pyx:100,110 —
    ``e_base.dot(R_base.T)``) even though they are already in the
    static frame, and ``t_rel.dot(R_base.T)`` (pyx:71) right-multiplies
    by R^T, i.e. rotates by R."""
    R = quaternion_to_matrix(base.orientation)

    rot = lambda v: R @ v
    r_rel = rot(rel.position)
    w_rel = rot(rel.angular_vel)
    v_rel = rot(rel.linear_vel)
    e_base = rot(base.angular_acc)
    a_base = rot(base.linear_acc)

    q_abs = quaternion_multiply(base.orientation, rel.orientation)
    r_abs = r_rel + base.position
    w_abs = w_rel + base.angular_vel
    v_abs = base.linear_vel + jnp.cross(base.angular_vel, r_rel) + v_rel
    e_abs = e_base + rel.angular_acc + jnp.cross(base.angular_vel, w_rel)
    a_abs = (a_base + jnp.cross(e_base, r_rel)
             + jnp.cross(base.angular_vel,
                         jnp.cross(base.angular_vel, r_rel))
             + rel.linear_acc + 2.0 * jnp.cross(base.angular_vel, v_rel))

    return RigidBodyState(r_abs, q_abs, v_abs, w_abs, a_abs, e_abs)


get_absolute_state_batch = jax.vmap(get_absolute_state, in_axes=(0, None))


def get_frenet_state(state: RigidBodyState, line: jax.Array,
                     tangents: Optional[jax.Array] = None) -> FrenetState:
    """RigidBodyState -> FrenetSerretState2D along a polyline
    (kinematics.pyx:115-178): planar projection of the 3-D state."""
    yaw = quaternion_yaw(state.orientation)
    return cartesian_to_frenet(state.position[..., 0], state.position[..., 1],
                               state.linear_vel[..., 0],
                               state.linear_vel[..., 1],
                               yaw, line, tangents)
