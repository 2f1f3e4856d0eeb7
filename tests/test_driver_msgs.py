"""Driver protocol layer: CAN codec round-trips, GPCHC parsing, radar
ingestion (reference pack: software/src/driver/messages/*)."""

import math

import numpy as np
import pytest

from dcarl_tpu.driver import (AutoCtlReq, AutoState, AutoStateEx, EPSStatus,
                              ESCStatus, GpChc, RadarObs, decode_frame,
                              encode_frame, geodetic_to_enu, gpchc_sentence,
                              parse_gpchc, pose_from_inspva,
                              radar_to_tracked_arrays)
from dcarl_tpu.driver.messages import InsPva


@pytest.mark.parametrize("msg", [
    AutoCtlReq(AutoMode=1, VoiceAlarm=2, TarSpeedReq=35.5, EPSAngleReq=-123.4,
               TurnLight=1),
    AutoState(EPBState=1, GearState=4, BrkPedal=0, AccPedal=37),
    AutoStateEx(StateTurningLight=2, CurDriveMode=1, StateBraking=1),
    EPSStatus(AngleSpd=-55.3, Angle=470.1, StrngWhlTorq=1.25),
    ESCStatus(RRWheelSpd=33.33, LFWheelSpd=34.01, RFWheelSpd=0.0,
              LRWheelSpd=120.55),
])
def test_can_roundtrip(msg):
    can_id, payload = encode_frame(msg)
    assert len(payload) == 8
    back = decode_frame(can_id, payload, stamp=1.5)
    assert type(back) is type(msg)
    for field in msg.__dataclass_fields__:
        if field == "header":
            continue
        a, b = getattr(msg, field), getattr(back, field)
        if isinstance(a, int):
            assert a == b, field
        else:
            assert abs(a - b) <= 0.05, field   # quantization steps
    assert back.header.stamp == 1.5


def test_can_unknown_id():
    with pytest.raises(KeyError):
        decode_frame(0x999, b"\x00" * 8)


def test_gpchc_roundtrip_and_checksum():
    m = GpChc(gps_week=2200, gps_time=345678.25, heading=92.5, pitch=1.25,
              roll=-0.75, latitude=39.99900111, longitude=116.32645222,
              altitude=43.3, ve=1.5, vn=-0.25, vu=0.01, speed=1.52,
              nsv1=18, nsv2=17, status=42)
    s = gpchc_sentence(m)
    assert s.startswith("$GPCHC,") and "*" in s
    back = parse_gpchc(s, stamp=2.0)
    assert back.gps_week == 2200
    assert back.heading == pytest.approx(92.5)
    assert back.latitude == pytest.approx(39.99900111)
    assert back.status == 42
    # corrupt checksum rejected
    bad = s[:-2] + ("00" if s[-2:] != "00" else "11")
    with pytest.raises(ValueError):
        parse_gpchc(bad)


def test_geodetic_to_enu_small_offsets():
    lat0, lon0, h0 = 40.0, 116.3, 50.0
    # ~111 m per 0.001 deg latitude at this latitude
    e, n, u = geodetic_to_enu(lat0 + 0.001, lon0, h0, lat0, lon0, h0)
    assert abs(e) < 0.5 and n == pytest.approx(111.0, rel=0.01)
    e, n, u = geodetic_to_enu(lat0, lon0 + 0.001, h0, lat0, lon0, h0)
    assert e == pytest.approx(111.3 * math.cos(math.radians(lat0)), rel=0.01)
    e, n, u = geodetic_to_enu(lat0, lon0, h0 + 5.0, lat0, lon0, h0)
    assert u == pytest.approx(5.0, abs=1e-3)


def test_pose_from_inspva_heading_conversion():
    origin = (40.0, 116.3, 50.0)
    # azimuth 0 = due north (left-handed) -> ENU yaw pi/2
    m = InsPva(latitude=40.0, longitude=116.3, height=50.0,
               north_velocity=2.0, east_velocity=1.0, azimuth=0.0)
    p = pose_from_inspva(m, origin)
    assert p["yaw"] == pytest.approx(math.pi / 2)
    assert p["vx"] == 1.0 and p["vy"] == 2.0
    # azimuth 90 = due east -> yaw 0
    m.azimuth = 90.0
    assert pose_from_inspva(m, origin)["yaw"] == pytest.approx(0.0)


def test_radar_ingestion_filters_and_sorts():
    objs = [
        RadarObs(obstacle_id=1, longitude_dist=20.0, lateral_dist=0.0,
                 longitude_vel=-3.0, probexist=0.9, dynprop=0),
        RadarObs(obstacle_id=2, longitude_dist=5.0, lateral_dist=2.0,
                 longitude_vel=0.0, probexist=0.8, dynprop=1),  # stationary
        RadarObs(obstacle_id=3, longitude_dist=10.0, lateral_dist=-1.0,
                 probexist=0.2, dynprop=0),                     # low prob
    ]
    rows, valid = radar_to_tracked_arrays(objs, max_slots=4)
    assert valid.sum() == 2            # low-prob dropped
    assert rows[0][0] == pytest.approx(5.0)   # nearest first
    assert rows[1][0] == pytest.approx(20.0)

    rows, valid = radar_to_tracked_arrays(objs, max_slots=4,
                                          drop_stationary=True)
    assert valid.sum() == 1
    assert rows[0][0] == pytest.approx(20.0)

    # sensor extrinsics: radar mounted 1 m forward, rotated 90 deg left
    rows, valid = radar_to_tracked_arrays(
        [RadarObs(longitude_dist=2.0, probexist=1.0)], max_slots=1,
        sensor_pose=(1.0, 0.0, math.pi / 2))
    np.testing.assert_allclose(rows[0][:2], [1.0, 2.0], atol=1e-12)
