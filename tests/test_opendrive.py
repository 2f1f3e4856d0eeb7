"""OpenDrive hdmap provider tests (the LocalMap equivalent,
reference local_map.py:24-260 — which requires sumolib/netconvert and
ships untested; these pin the documented update protocol on a synthetic
two-road-and-junction network)."""

import numpy as np
import jax.numpy as jnp

from dcarl_tpu.cognition.locator import (EgoPose, MapModel, TrackedObjects,
                                         update_map_state)
from dcarl_tpu.navigation.opendrive import LocalHdMap, parse_opendrive

XODR = """<?xml version="1.0"?>
<OpenDRIVE>
  <road id="1" length="100" junction="-1">
    <link><successor elementType="junction" elementId="10"/></link>
    <planView>
      <geometry s="0" x="0" y="0" hdg="0" length="100"/>
    </planView>
    <lanes><laneSection s="0">
      <right>
        <lane id="-1" type="driving"><width sOffset="0" a="3.5"/></lane>
        <lane id="-2" type="driving"><width sOffset="0" a="3.5"/></lane>
      </right>
    </laneSection></lanes>
    <type s="0" type="town"><speed max="54" unit="km/h"/></type>
  </road>
  <road id="5" length="10" junction="10">
    <link><successor elementType="road" elementId="2"/></link>
    <planView>
      <geometry s="0" x="100" y="0" hdg="0" length="10"/>
    </planView>
    <lanes><laneSection s="0">
      <right><lane id="-1" type="driving"><width sOffset="0" a="3.5"/></lane></right>
    </laneSection></lanes>
  </road>
  <road id="2" length="100" junction="-1">
    <link><predecessor elementType="junction" elementId="10"/></link>
    <planView>
      <geometry s="0" x="110" y="0" hdg="0" length="100"/>
    </planView>
    <lanes><laneSection s="0">
      <right><lane id="-1" type="driving"><width sOffset="0" a="3.5"/></lane></right>
      <left><lane id="1" type="driving"><width sOffset="0" a="3.5"/></lane></left>
    </laneSection></lanes>
  </road>
  <junction id="10">
    <connection id="0" incomingRoad="1" connectingRoad="5">
      <laneLink from="-1" to="-1"/>
    </connection>
  </junction>
</OpenDRIVE>
"""


def make_map(**kw):
    return LocalHdMap(XODR, route=["1", "2"], **kw)


def test_parse_roads_and_lanes():
    roads, junctions = parse_opendrive(XODR)
    assert set(roads) == {"1", "5", "2"}
    r1 = roads["1"]
    assert len(r1.lane_lines) == 2
    # rightmost lane first (calibrate_lane_index): lane -2 at y=-5.25
    np.testing.assert_allclose(r1.lane_lines[0][:, 1], -5.25, atol=1e-6)
    np.testing.assert_allclose(r1.lane_lines[1][:, 1], -1.75, atol=1e-6)
    assert r1.lane_ids == [-2, -1]
    assert abs(r1.speed_limit - 15.0) < 1e-6  # 54 km/h
    assert "10" in junctions
    # left lanes sample opposite the reference direction
    r2 = roads["2"]
    left_line = r2.lane_lines[r2.lane_ids.index(1)]
    assert left_line[0, 0] > left_line[-1, 0]


def test_locate_excludes_junction_roads():
    m = make_map()
    rid, li, d = m.locate(50.0, -1.75)
    assert (rid, li) == ("1", 1) and d < 0.1
    rid0, li0, _ = m.locate(50.0, -5.25)
    assert (rid0, li0) == ("1", 0)
    # inside the junction road 5's span: excluded -> None
    assert m.locate(105.0, -1.75) is None


def test_update_protocol_edge_change_and_junction():
    m = make_map()
    # first pose on road 1 -> mode 1 (edge change) -> map published
    smap = m.update(20.0, -1.75)
    assert smap is not None
    assert smap.lanes.shape[0] == 2
    assert bool(smap.stop_thru.all())          # road 1 ends in a junction
    assert int(smap.target_lane_index) == 1    # lane -1 continues route
    np.testing.assert_allclose(float(smap.speed_limit[0]), 15.0, atol=1e-6)

    # same edge, mid-road -> no update
    assert m.update(50.0, -1.75) is None
    # near the section end -> mode 3 republish
    assert m.update(95.0, -1.75) is not None
    # junction gap -> mode 2, no lane map (locator flips to JUNCTION)
    assert m.update(105.0, -1.75) is None and m.in_junction
    # emerging on road 2 -> edge change again
    smap2 = m.update(150.0, -1.75)
    assert smap2 is not None and smap2.lanes.shape[0] == 2
    assert not bool(smap2.stop_thru.any())     # road 2 has no successor


def test_cognition_consumes_hdmap_window():
    m = make_map()
    smap = m.update(20.0, -1.75)
    K = 4
    no_obj = TrackedObjects(x=jnp.full((K,), 1e4), y=jnp.zeros(K),
                            vx=jnp.zeros(K), vy=jnp.zeros(K),
                            yaw=jnp.zeros(K), valid=jnp.zeros(K, bool))
    ego = EgoPose(x=jnp.asarray(20.0), y=jnp.asarray(-1.75),
                  vx=jnp.asarray(8.0), vy=jnp.asarray(0.0),
                  yaw=jnp.asarray(0.0))
    mmap, model, _ = update_map_state(smap, ego, no_obj)
    assert int(model) == MapModel.MULTILANE.value
    assert abs(float(mmap.ego_lane_index) - 1.0) < 1e-3

    # approaching the lane end of a THRU lane -> junction hand-off
    ego_end = EgoPose(x=jnp.asarray(95.0), y=jnp.asarray(-1.75),
                      vx=jnp.asarray(8.0), vy=jnp.asarray(0.0),
                      yaw=jnp.asarray(0.0))
    _, model_end, _ = update_map_state(smap, ego_end, no_obj)
    assert int(model_end) == MapModel.JUNCTION.value
