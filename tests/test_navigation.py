"""Navigation map-provider tests (reference NativeMap ships untested)."""

import jax.numpy as jnp
import numpy as np
import pytest

from dcarl_tpu.cognition import EgoPose, MapModel, update_map_state
from dcarl_tpu.cognition.locator import TrackedObjects
from dcarl_tpu.navigation import synthetic_loop_map, window_static_map


def test_window_contains_ego_neighborhood():
    lmap = synthetic_loop_map(n_lanes=2, n_points=512, radius=100.0)
    # ego on the outer lane at angle 0
    smap = window_static_map(lmap, 100.0, 0.0, window=128)
    assert smap.lanes.shape == (2, 128, 2)
    # the window must pass near the ego
    d = np.linalg.norm(np.asarray(smap.lanes[0]) - np.array([100.0, 0.0]),
                       axis=1)
    assert d.min() < 1.5
    # with back_fraction 0.25 the ego is ~25% into the window
    assert 16 < int(d.argmin()) < 48


def test_window_wraps_around_loop_seam():
    lmap = synthetic_loop_map(n_lanes=1, n_points=512, radius=100.0)
    # place the ego exactly at the loop seam (theta=0 is index 0)
    smap = window_static_map(lmap, 100.0, -0.1, window=64)
    # contiguous window: consecutive points are close
    seg = np.linalg.norm(np.diff(np.asarray(smap.lanes[0]), axis=0), axis=1)
    assert seg.max() < 5.0


def test_tangents_follow_loop_direction():
    lmap = synthetic_loop_map(n_lanes=1, n_points=1024, radius=100.0)
    smap = window_static_map(lmap, 100.0, 0.0, window=64)
    i = int(np.linalg.norm(
        np.asarray(smap.lanes[0]) - np.array([100.0, 0.0]),
        axis=1).argmin())
    # CCW circle at angle 0 has tangent pointing +y
    assert float(smap.tangents[0, i]) == pytest.approx(np.pi / 2, abs=0.05)


def test_provider_feeds_cognition():
    lmap = synthetic_loop_map(n_lanes=2, n_points=1024, radius=200.0)
    smap = window_static_map(lmap, 200.0, 0.0, window=256)
    ego = EgoPose(x=jnp.asarray(200.0), y=jnp.asarray(0.0),
                  vx=jnp.asarray(0.0), vy=jnp.asarray(8.0),
                  yaw=jnp.asarray(jnp.pi / 2))
    K = 4
    objs = TrackedObjects(x=jnp.full((K,), 1e4), y=jnp.zeros((K,)),
                          vx=jnp.zeros((K,)), vy=jnp.zeros((K,)),
                          yaw=jnp.zeros((K,)),
                          valid=jnp.zeros((K,), bool))
    mmap, model, _ = update_map_state(smap, ego, objs)
    assert int(model) == MapModel.MULTILANE
    assert float(mmap.ego_lane_index) == pytest.approx(0.0, abs=0.05)
    assert float(mmap.ego_speed) == pytest.approx(8.0)
