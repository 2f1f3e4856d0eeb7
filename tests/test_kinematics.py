"""Kinematics tests — rigid-body composition identities and the
Frenet wrapper (reference: zzz_common/kinematics.pyx, which ships with
no tests; these cover the physics invariants instead)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcarl_tpu.ops import kinematics as K


def make_state(**kw):
    return K.RigidBodyState.create(dtype=jnp.float64, **kw)


def test_quaternion_roundtrip():
    yaw = 0.7
    q = K.yaw_to_quaternion(yaw)
    assert float(K.quaternion_yaw(q)) == pytest.approx(yaw)
    R = K.quaternion_to_matrix(q)
    c, s = np.cos(yaw), np.sin(yaw)
    np.testing.assert_allclose(
        np.asarray(R), [[c, -s, 0], [s, c, 0], [0, 0, 1]], atol=1e-12)


def test_identity_base_is_noop():
    rel = make_state(position=[1.0, 2.0, 0.0], linear_vel=[3.0, 0.0, 0.0],
                     linear_acc=[0.5, 0.1, 0.0],
                     orientation=K.yaw_to_quaternion(0.3))
    base = make_state()
    out = K.get_absolute_state(rel, base)
    for a, b in zip(jax.tree.leaves(out), jax.tree.leaves(rel)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_pure_translation():
    rel = make_state(position=[1.0, 0.0, 0.0])
    base = make_state(position=[10.0, 20.0, 0.0])
    out = K.get_absolute_state(rel, base)
    np.testing.assert_allclose(np.asarray(out.position), [11.0, 20.0, 0.0],
                               atol=1e-12)


def test_rotation_composition():
    rel = make_state(position=[1.0, 0.0, 0.0],
                     orientation=K.yaw_to_quaternion(0.2))
    base = make_state(orientation=K.yaw_to_quaternion(np.pi / 2))
    out = K.get_absolute_state(rel, base)
    # position rotated 90 deg
    np.testing.assert_allclose(np.asarray(out.position), [0.0, 1.0, 0.0],
                               atol=1e-12)
    assert float(K.quaternion_yaw(out.orientation)) == pytest.approx(
        np.pi / 2 + 0.2)


def test_rotating_base_velocity_transport():
    """v_abs = v_base + w x r + R v_rel (kinematics.pyx:92)."""
    rel = make_state(position=[1.0, 0.0, 0.0])
    base = make_state(angular_vel=[0.0, 0.0, 2.0])
    out = K.get_absolute_state(rel, base)
    # w x r = (0,0,2) x (1,0,0) = (0,2,0)
    np.testing.assert_allclose(np.asarray(out.linear_vel), [0.0, 2.0, 0.0],
                               atol=1e-12)


def test_centripetal_acceleration():
    """a_abs includes w x (w x r) (kinematics.pyx:110)."""
    rel = make_state(position=[1.0, 0.0, 0.0])
    base = make_state(angular_vel=[0.0, 0.0, 2.0])
    out = K.get_absolute_state(rel, base)
    # w x (w x r) = -w^2 r = (-4, 0, 0)
    np.testing.assert_allclose(np.asarray(out.linear_acc), [-4.0, 0.0, 0.0],
                               atol=1e-12)


def test_coriolis_term():
    """2 w x v_rel appears when the body moves in a rotating frame."""
    rel = make_state(linear_vel=[1.0, 0.0, 0.0])
    base = make_state(angular_vel=[0.0, 0.0, 1.0])
    out = K.get_absolute_state(rel, base)
    # 2 w x v = 2*(0,0,1)x(1,0,0) = (0,2,0)
    np.testing.assert_allclose(np.asarray(out.linear_vel), [1.0, 0.0, 0.0],
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.linear_acc), [0.0, 2.0, 0.0],
                               atol=1e-12)


def test_batch_composition():
    rels = jax.vmap(lambda i: K.RigidBodyState.create(
        position=jnp.asarray([i, 0.0, 0.0], jnp.float64),
        dtype=jnp.float64))(jnp.arange(4, dtype=jnp.float64))
    base = make_state(position=[100.0, 0.0, 0.0])
    out = K.get_absolute_state_batch(rels, base)
    np.testing.assert_allclose(np.asarray(out.position[:, 0]),
                               [100.0, 101.0, 102.0, 103.0])


def test_frenet_wrapper_matches_geometry():
    from dcarl_tpu.ops.geometry import cartesian_to_frenet
    line = jnp.asarray([[0.0, 0.0], [10.0, 0.0], [20.0, 0.0]], jnp.float64)
    st = make_state(position=[5.0, 1.0, 0.0], linear_vel=[2.0, 0.5, 0.0],
                    orientation=K.yaw_to_quaternion(0.1))
    f = K.get_frenet_state(st, line)
    ref = cartesian_to_frenet(5.0, 1.0, 2.0, 0.5, 0.1, line)
    assert float(f.s) == pytest.approx(float(ref.s))
    assert float(f.d) == pytest.approx(float(ref.d))
    assert float(f.vs) == pytest.approx(float(ref.vs))
