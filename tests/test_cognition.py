"""Cognition layer tests — lane locating, map-state construction, path
buffer, drivable boundary (reference: obstacle_locator.py,
path_buffer.py, driving_space_constructor.py — which ship untested;
these pin the documented semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcarl_tpu.cognition import (EgoPose, MapModel, PathBufferState,
                                 StaticLocalMap, TrackedObjects,
                                 dynamic_boundary, locate_objects_in_lane,
                                 path_buffer_init, path_buffer_update,
                                 update_map_state)


def straight_map(L=2, n=50, lane_sep=3.5, length=100.0):
    xs = jnp.linspace(0.0, length, n)
    lanes = jnp.stack([
        jnp.stack([xs, jnp.full((n,), i * lane_sep)], axis=1)
        for i in range(L)])
    tangents = jnp.zeros((L, n))
    return StaticLocalMap(
        lanes=lanes, tangents=tangents,
        speed_limit=jnp.full((L,), 15.0),
        stop_thru=jnp.ones((L,), bool),
        target_lane_index=jnp.asarray(1),
    )


def no_objects(K=4):
    z = jnp.zeros((K,))
    return TrackedObjects(x=z + 1e4, y=z, vx=z, vy=z, yaw=z,
                          valid=jnp.zeros((K,), bool))


def test_locate_on_lane_center():
    smap = straight_map()
    idx = locate_objects_in_lane(jnp.asarray(50.0), jnp.asarray(0.0),
                                 smap.lanes)
    assert float(idx) == pytest.approx(0.0, abs=1e-6)
    idx = locate_objects_in_lane(jnp.asarray(50.0), jnp.asarray(3.5),
                                 smap.lanes)
    assert float(idx) == pytest.approx(1.0, abs=1e-6)


def test_locate_between_lanes_interpolates():
    smap = straight_map()
    idx = locate_objects_in_lane(jnp.asarray(50.0), jnp.asarray(1.75),
                                 smap.lanes)
    assert float(idx) == pytest.approx(0.5, abs=1e-6)
    idx = locate_objects_in_lane(jnp.asarray(50.0), jnp.asarray(0.875),
                                 smap.lanes)
    assert float(idx) == pytest.approx(0.25, abs=1e-6)


def test_locate_far_off_lane_returns_sentinel():
    smap = straight_map()
    idx = locate_objects_in_lane(jnp.asarray(50.0), jnp.asarray(-30.0),
                                 smap.lanes)
    assert float(idx) == -1.0


def test_ego_midlane_multilane_model():
    smap = straight_map()
    ego = EgoPose(x=jnp.asarray(50.0), y=jnp.asarray(0.0),
                  vx=jnp.asarray(5.0), vy=jnp.asarray(0.0),
                  yaw=jnp.asarray(0.0))
    mmap, model, _ = update_map_state(smap, ego, no_objects())
    assert int(model) == MapModel.MULTILANE
    assert float(mmap.ego_lane_index) == pytest.approx(0.0, abs=1e-6)
    assert float(mmap.ego_speed) == pytest.approx(5.0)
    assert float(mmap.distance_to_junction) == pytest.approx(50.0, abs=1e-5)
    assert not bool(mmap.front.exists[0])
    assert not bool(mmap.rear.exists[0])


def test_ego_near_lane_end_junction_model():
    smap = straight_map()
    ego = EgoPose(x=jnp.asarray(90.0), y=jnp.asarray(0.0),
                  vx=jnp.asarray(5.0), vy=jnp.asarray(0.0),
                  yaw=jnp.asarray(0.0))
    _, model, _ = update_map_state(smap, ego, no_objects())
    assert int(model) == MapModel.JUNCTION  # dist to tail 10 <= 15


def test_front_rear_assignment():
    smap = straight_map()
    ego = EgoPose(x=jnp.asarray(50.0), y=jnp.asarray(0.0),
                  vx=jnp.asarray(5.0), vy=jnp.asarray(0.0),
                  yaw=jnp.asarray(0.0))
    objs = TrackedObjects(
        x=jnp.asarray([70.0, 30.0, 60.0, 55.0]),
        y=jnp.asarray([0.0, 0.0, 3.5, 0.0]),
        vx=jnp.asarray([8.0, 4.0, 6.0, 7.0]),
        vy=jnp.zeros((4,)),
        yaw=jnp.zeros((4,)),
        valid=jnp.asarray([True, True, True, True]),
    )
    mmap, model, behaviors = update_map_state(smap, ego, objs)
    # nearest front in lane 0 is the 55 m object (rel s = 5)
    assert bool(mmap.front.exists[0])
    assert float(mmap.front.s[0]) == pytest.approx(5.0, abs=1e-4)
    assert float(mmap.front.vs[0]) == pytest.approx(7.0, abs=1e-5)
    # rear in lane 0 is the 30 m object (rel s = -20)
    assert bool(mmap.rear.exists[0])
    assert float(mmap.rear.s[0]) == pytest.approx(-20.0, abs=1e-4)
    # lane 1 front is the 60 m object
    assert bool(mmap.front.exists[1])
    assert float(mmap.front.s[1]) == pytest.approx(10.0, abs=1e-4)
    # straight drivers follow their lane
    assert np.all(np.asarray(behaviors) == 0)


def test_behavior_lane_change_detection():
    smap = straight_map()
    ego = EgoPose(x=jnp.asarray(50.0), y=jnp.asarray(0.0),
                  vx=jnp.asarray(5.0), vy=jnp.asarray(0.0),
                  yaw=jnp.asarray(0.0))
    objs = TrackedObjects(
        x=jnp.asarray([60.0, 65.0]), y=jnp.asarray([0.0, 0.0]),
        vx=jnp.asarray([5.0, 5.0]), vy=jnp.asarray([1.5, -1.5]),
        yaw=jnp.asarray([0.5, -0.5]),   # > 0.2 rad from lane direction
        valid=jnp.asarray([True, True]))
    _, _, behaviors = update_map_state(smap, ego, objs)
    assert int(behaviors[0]) == 1   # MOVING_LEFT
    assert int(behaviors[1]) == 2   # MOVING_RIGHT


def test_path_buffer_window_advances():
    n = 200
    route = jnp.stack([jnp.linspace(0, 199.0, n), jnp.zeros((n,))], axis=1)
    st = path_buffer_init()
    st, seg, valid, junction = path_buffer_update(
        st, route, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(5.0))
    assert int(st.cursor) == 0
    assert float(seg[0, 0]) == 0.0
    assert not bool(junction)

    st, seg, valid, junction = path_buffer_update(
        st, route, jnp.asarray(50.0), jnp.asarray(0.0), jnp.asarray(5.0))
    assert int(st.cursor) == 45          # nearest 50 - 5 remained points
    assert float(seg[0, 0]) == pytest.approx(45.0)
    assert bool(valid.all())

    # near the route end: junction fallback + rerouting when stopped
    st, seg, valid, junction = path_buffer_update(
        st, route, jnp.asarray(195.0), jnp.asarray(0.0), jnp.asarray(0.1))
    assert bool(junction)
    assert bool(st.rerouting)
    assert not bool(valid.all())


def test_path_buffer_cursor_monotone():
    n = 100
    route = jnp.stack([jnp.linspace(0, 99.0, n), jnp.zeros((n,))], axis=1)
    st = path_buffer_init()
    st, *_ = path_buffer_update(st, route, jnp.asarray(50.0),
                                jnp.asarray(0.0), jnp.asarray(5.0))
    c = int(st.cursor)
    # ego appears to jump backwards — the buffer must not rewind
    st, *_ = path_buffer_update(st, route, jnp.asarray(10.0),
                                jnp.asarray(0.0), jnp.asarray(5.0))
    assert int(st.cursor) == c


def test_dynamic_boundary_obstacle_shadows_static():
    # square static area around the ego, one obstacle to the east
    theta = jnp.linspace(-jnp.pi, jnp.pi, 400, endpoint=False)
    poly = jnp.stack([20.0 * jnp.cos(theta), 20.0 * jnp.sin(theta)], axis=1)
    b = dynamic_boundary(
        jnp.asarray(0.0), jnp.asarray(0.0), poly,
        obs_x=jnp.asarray([8.0]), obs_y=jnp.asarray([0.0]),
        obs_vx=jnp.asarray([3.0]), obs_vy=jnp.asarray([0.0]),
        obs_yaw=jnp.asarray([0.0]), obs_valid=jnp.asarray([True]),
        num_bins=128)
    east = 64  # bin of angle ~0
    # obstacle front edge at x≈5.75 shadows the static circle at 20
    assert float(b.dist[east]) < 7.0
    assert float(b.vx[east]) == pytest.approx(3.0)
    # north is still the static boundary with zero velocity
    north = 96
    assert float(b.dist[north]) == pytest.approx(20.0, abs=0.5)
    assert float(b.vx[north]) == 0.0


def test_traffic_light_red_stops_lane_stack():
    """A RED light detection must flow cognition -> MultiLaneState ->
    IDM and stop the target lane (the path the reference wires through
    driving_space_constructor.py:1179-1213 + longitudinal.py:102-113);
    GREEN must leave the lane speed untouched."""
    from dcarl_tpu.cognition.locator import (LightSignal,
                                             TrafficLightDetection)
    from dcarl_tpu.planning.idm import longitudinal_speed

    smap = straight_map()
    # ego mid-lane 0 driving toward the lane end, ~90 m in (10 m to go)
    ego = EgoPose(x=jnp.asarray(90.0), y=jnp.asarray(0.0),
                  vx=jnp.asarray(8.0), vy=jnp.asarray(0.0),
                  yaw=jnp.asarray(0.0))

    def lights(sig):
        return TrafficLightDetection(
            signal=jnp.asarray([sig, 0, 0, 0], jnp.int32),
            valid=jnp.asarray([True, False, False, False]))

    mmap_red, _, _ = update_map_state(smap, ego, no_objects(),
                                      lights=lights(LightSignal.RED.value))
    assert bool(mmap_red.traffic_light_stop.all())  # 1 light -> all lanes
    np.testing.assert_allclose(np.asarray(mmap_red.stop_distance),
                               10.0, atol=0.5)
    v_red = longitudinal_speed(mmap_red, jnp.asarray(0),
                               traffic_light=True)
    assert float(v_red) == 0.0  # stop line inside the braking envelope

    mmap_green, _, _ = update_map_state(
        smap, ego, no_objects(), lights=lights(LightSignal.GREEN.value))
    assert not bool(mmap_green.traffic_light_stop.any())
    v_green = longitudinal_speed(mmap_green, jnp.asarray(0),
                                 traffic_light=True)
    assert float(v_green) > 5.0

    # no detections -> no standing red (reference early-return)
    mmap_none, _, _ = update_map_state(smap, ego, no_objects())
    assert not bool(mmap_none.traffic_light_stop.any())


def test_traffic_light_per_lane_and_mismatch_cases():
    """The three reference cases of locate_traffic_light_in_lanes:
    per-lane mapping when counts match, all-red unless any green when
    they don't."""
    from dcarl_tpu.cognition.locator import (LightSignal, StopState,
                                             TrafficLightDetection,
                                             locate_traffic_lights_in_lanes)

    R, Y, G = (LightSignal.RED.value, LightSignal.YELLOW.value,
               LightSignal.GREEN.value)

    # exactly L=2 lights -> light i states lane i
    det = TrafficLightDetection(
        signal=jnp.asarray([R, G, 0, 0], jnp.int32),
        valid=jnp.asarray([True, True, False, False]))
    st = np.asarray(locate_traffic_lights_in_lanes(det, 2))
    assert st.tolist() == [StopState.STOP.value, StopState.THRU.value]

    # yellow -> YIELD
    det_y = TrafficLightDetection(
        signal=jnp.asarray([Y, 0, 0, 0], jnp.int32),
        valid=jnp.asarray([True, False, False, False]))
    st_y = np.asarray(locate_traffic_lights_in_lanes(det_y, 2))
    assert st_y.tolist() == [StopState.YIELD.value] * 2

    # 3 lights over 2 lanes, none green -> all STOP
    det3 = TrafficLightDetection(
        signal=jnp.asarray([R, R, Y, 0], jnp.int32),
        valid=jnp.asarray([True, True, True, False]))
    st3 = np.asarray(locate_traffic_lights_in_lanes(det3, 2))
    assert st3.tolist() == [StopState.STOP.value] * 2

    # 3 lights over 2 lanes, one green -> all THRU
    det3g = TrafficLightDetection(
        signal=jnp.asarray([R, G, R, 0], jnp.int32),
        valid=jnp.asarray([True, True, True, False]))
    st3g = np.asarray(locate_traffic_lights_in_lanes(det3g, 2))
    assert st3g.tolist() == [StopState.THRU.value] * 2


def test_stop_sign_stops_its_lane_only():
    """Round-4: detected STOP signs locate to their nearest lane and
    stop it (the implementation behind the reference's
    locate_stop_sign_in_lanes stub, driving_space_constructor.py:
    1214-1219); other lanes keep flowing."""
    from dcarl_tpu.cognition.locator import RoadSignDetection, SignKind
    from dcarl_tpu.planning.idm import longitudinal_speed

    smap = straight_map()
    ego = EgoPose(x=jnp.asarray(90.0), y=jnp.asarray(0.0),
                  vx=jnp.asarray(8.0), vy=jnp.asarray(0.0),
                  yaw=jnp.asarray(0.0))
    # stop sign 1 m to the side of lane 0's end; nothing near lane 1
    signs = RoadSignDetection(
        kind=jnp.asarray([SignKind.STOP.value, 0, 0], jnp.int32),
        value=jnp.zeros((3,)),
        x=jnp.asarray([98.0, 0.0, 0.0]),
        y=jnp.asarray([-1.0, 0.0, 0.0]),
        valid=jnp.asarray([True, False, False]))

    mmap, _, _ = update_map_state(smap, ego, no_objects(), signs=signs)
    assert bool(mmap.traffic_light_stop[0])
    assert not bool(mmap.traffic_light_stop[1])
    v0 = longitudinal_speed(mmap, jnp.asarray(0), traffic_light=True)
    v1 = longitudinal_speed(mmap, jnp.asarray(1), traffic_light=True)
    assert float(v0) == 0.0       # stop line 10 m ahead on lane 0
    assert float(v1) > 5.0        # lane 1 unaffected

    # too-far sign attaches to no lane
    far = signs._replace(y=jnp.asarray([-50.0, 0.0, 0.0]))
    mmap_far, _, _ = update_map_state(smap, ego, no_objects(), signs=far)
    assert not bool(mmap_far.traffic_light_stop.any())


def test_speed_limit_sign_caps_lane():
    """Round-4: detected speed-limit boards override the map limit for
    their nearest lane only, taking the minimum (replaces the
    reference's hardcoded 40 km/h, driving_space_constructor.py:
    1220-1229)."""
    from dcarl_tpu.cognition.locator import RoadSignDetection, SignKind

    smap = straight_map()                      # map limit 15 m/s
    ego = EgoPose(x=jnp.asarray(50.0), y=jnp.asarray(0.0),
                  vx=jnp.asarray(8.0), vy=jnp.asarray(0.0),
                  yaw=jnp.asarray(0.0))
    signs = RoadSignDetection(
        kind=jnp.asarray([SignKind.SPEED_LIMIT.value,
                          SignKind.SPEED_LIMIT.value, 0], jnp.int32),
        value=jnp.asarray([8.0, 20.0, 0.0]),
        x=jnp.asarray([60.0, 60.0, 0.0]),
        y=jnp.asarray([0.5, 3.0, 0.0]),        # lane 0 and lane 1
        valid=jnp.asarray([True, True, False]))

    mmap, _, _ = update_map_state(smap, ego, no_objects(), signs=signs)
    np.testing.assert_allclose(np.asarray(mmap.speed_limit),
                               [8.0, 15.0])   # min(15, 8) / min(15, 20)
