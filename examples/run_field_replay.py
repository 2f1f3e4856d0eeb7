"""Field-log replay through the decision stack — the rosbag-replay demo.

The reference's field demo replays recorded rosbags through the ROS
planning stack and inspects trajectories in rviz (README.md:236-242).
Here the same drive is replayed natively: the Scenario text logs
(Field_testing/Scenario{1,2,3}/) are parsed, the ego's own driven path
becomes the reference lane (the PathBuffer role), every surrounding
object of every tick is Frenet-projected onto it, a ``MultiLaneState``
is built per tick — and then the ENTIRE drive's decisions (IDM speed,
LaneUtility lateral rule, RLS 20-D state wrap) are computed in ONE
vmapped jit over all ticks at once, instead of 5 Hz message passing.

Outputs a summary plus (with --plot) the trajectory/decision figures
and a marker JSON for external rendering.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from dcarl_tpu.ops import geometry as geo
from dcarl_tpu.planning import idm, lane_utility as LU
from dcarl_tpu.planning.decision import wrap_state
from dcarl_tpu.planning.multilane import LaneVehicle, MultiLaneState
from dcarl_tpu.utils import field_analysis as fa

DEFAULT_SCENARIO = "/root/reference/Field_testing/Scenario1"
MAX_OBJ = 8          # nearest objects per tick fed to the locator
LANE_WIDTH = 3.5


def build_frames(scenario_dir: str, stride: int = 4):
    """Parse logs -> fixed-shape per-tick arrays (host side)."""
    a = fa.analyze_scenario(scenario_dir)
    traffic = a["channels"]["traffic"]
    surround = a["channels"]["surrounding_obj"]

    ego_t = traffic[::stride, 0]
    ego_xy = traffic[::stride, 3:5]
    # ego speed from finite differences of the pose track
    dt = np.maximum(np.diff(ego_t, prepend=ego_t[0] - 0.1), 1e-3)
    ego_v = np.hypot(*np.diff(ego_xy, axis=0, prepend=ego_xy[:1]).T) / dt

    # reference lane = the densified driven path (PathBuffer role)
    path = geo.dense_polyline2d_np(ego_xy, resolution=1.0)

    # bucket surrounding detections to the nearest ego tick
    idx = np.searchsorted(ego_t, surround[:, 0])
    idx = np.clip(idx, 0, len(ego_t) - 1)
    T = len(ego_t)
    obj_xy = np.zeros((T, MAX_OBJ, 2))
    obj_v = np.zeros((T, MAX_OBJ, 2))
    obj_valid = np.zeros((T, MAX_OBJ), bool)
    fill = np.zeros(T, int)
    for row, k in zip(surround, idx):
        j = fill[k]
        if j < MAX_OBJ:
            obj_xy[k, j] = row[1:3]
            obj_v[k, j] = row[3:5] if row.shape[0] >= 5 else 0.0
            obj_valid[k, j] = True
            fill[k] = j + 1
    return dict(t=ego_t, ego_xy=ego_xy, ego_v=ego_v, path=path,
                obj_xy=obj_xy, obj_v=obj_v, obj_valid=obj_valid,
                summary={k: v for k, v in a.items() if k != "channels"})


def decide_all(frames):
    """One jitted vmap over every tick of the drive."""
    path = jnp.asarray(frames["path"], jnp.float32)

    def one_tick(ego_xy, ego_v, obj_xy, obj_v, obj_valid):
        ego_f = geo.cartesian_to_frenet(ego_xy[0], ego_xy[1],
                                        0.0, 0.0, 0.0, path)

        def project(p, v, valid):
            f = geo.cartesian_to_frenet(p[0], p[1], v[0], v[1], 0.0, path)
            return f.s, f.d, jnp.hypot(v[0], v[1]), valid

        s, d, vs, valid = jax.vmap(project)(
            obj_xy, obj_v, obj_valid)
        rel_s = s - ego_f.s
        lane_idx = jnp.clip(d / LANE_WIDTH + 0.5, -0.49, 1.49)

        # per-lane nearest front/rear (locate_objects semantics, inline
        # because the log has no true lane map — single+shoulder lanes)
        L = 2
        lanes = jnp.arange(L, dtype=jnp.float32)
        member = (jnp.abs(lane_idx[:, None] - lanes[None, :]) <= 0.5) \
            & valid[:, None]
        front_key = jnp.where(member & (rel_s[:, None] > 0),
                              rel_s[:, None], jnp.inf)
        fi = jnp.argmin(front_key, axis=0)
        f_exists = jnp.isfinite(jnp.min(front_key, axis=0))
        rear_key = jnp.where(member & (rel_s[:, None] <= 0),
                             rel_s[:, None], -jnp.inf)
        ri = jnp.argmax(rear_key, axis=0)
        r_exists = jnp.max(rear_key, axis=0) > -jnp.inf

        front = LaneVehicle(
            exists=f_exists,
            s=jnp.where(f_exists, rel_s[fi], 50.0),
            d=jnp.where(f_exists, lane_idx[fi], lanes),
            vs=jnp.where(f_exists, vs[fi], 20.0),
            vd=jnp.zeros((L,)))
        rear = LaneVehicle(
            exists=r_exists,
            s=jnp.where(r_exists, rel_s[ri], -50.0),
            d=jnp.where(r_exists, lane_idx[ri], lanes),
            vs=jnp.where(r_exists, vs[ri], 0.0),
            vd=jnp.zeros((L,)))
        mmap = MultiLaneState(
            ego_lane_index=jnp.clip(ego_f.d / LANE_WIDTH + 0.5, 0.0, 1.0),
            ego_speed=ego_v,
            ego_vd=jnp.zeros(()),
            front=front, rear=rear,
            speed_limit=jnp.full((L,), 12.0),
            distance_to_junction=jnp.float32(200.0),
            target_lane_index=jnp.float32(0.0),
            traffic_light_stop=jnp.zeros((L,), bool),
            stop_distance=jnp.full((L,), 200.0))

        lane, speed = LU.lateral_decision(mmap)
        idm_speed = idm.longitudinal_speed(mmap, lane)
        state20 = wrap_state(mmap)
        return lane, speed, idm_speed, state20

    fn = jax.jit(jax.vmap(one_tick))
    return fn(jnp.asarray(frames["ego_xy"], jnp.float32),
              jnp.asarray(frames["ego_v"], jnp.float32),
              jnp.asarray(frames["obj_xy"], jnp.float32),
              jnp.asarray(frames["obj_v"], jnp.float32),
              jnp.asarray(frames["obj_valid"]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenario", default=DEFAULT_SCENARIO)
    ap.add_argument("--stride", type=int, default=4)
    ap.add_argument("--plot", action="store_true")
    args = ap.parse_args()
    if not os.path.isdir(args.scenario):
        print(f"scenario dir {args.scenario} not found"); return

    frames = build_frames(args.scenario, args.stride)
    print("scenario summary:", {k: (round(v, 2) if isinstance(v, float)
                                    else v)
                                for k, v in frames["summary"].items()})
    import time
    t0 = time.perf_counter()
    lane, speed, idm_speed, state20 = jax.block_until_ready(
        decide_all(frames))
    dt = time.perf_counter() - t0
    T = len(frames["t"])
    print(f"replayed {T} decision ticks in {dt:.2f}s "
          f"({T/dt:,.0f} ticks/s incl. compile; reference stack: 5 Hz)")
    lane = np.asarray(lane); speed = np.asarray(speed)
    print(f"lateral decisions: lane0={np.mean(np.round(lane)==0):.1%} "
          f"lane1={np.mean(np.round(lane)==1):.1%}; "
          f"target speed mean={speed.mean():.2f} m/s "
          f"idm mean={np.asarray(idm_speed).mean():.2f} m/s")
    assert np.isfinite(np.asarray(state20)).all()

    if args.plot:
        from dcarl_tpu.utils import visualize as viz
        markers = viz.lane_markers([frames["path"]])
        ov = frames["obj_xy"][frames["obj_valid"]]
        markers += [{"type": "centroid", "uid": i, "point": p.tolist(),
                     "color": (0.9, 0.4, 0.1)} for i, p in enumerate(ov[::20])]
        out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "field_replay")
        viz.save_markers(out + ".json", markers)
        viz.render(markers, out_path=out + ".png", title="field replay")
        print("wrote", out + ".png", "and", out + ".json")


if __name__ == "__main__":
    main()
