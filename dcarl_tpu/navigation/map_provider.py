"""Static map provider — recorded loops windowed around the ego.

TPU-native re-design of ``NativeMap``
(software/src/navigation/map_provider/sumo/src/.../native_map.py:16-148):
the reference keeps two recorded loop polylines (inner/outer_loop.dat)
and, per pose update, rotates each circular lane to start at the point
farthest from the ego so the ego sits mid-polyline.  Here the rotation
becomes a fixed-size modular window gather around the nearest vertex —
static shapes, one gather, jit/vmap-friendly — and the produced
:class:`~dcarl_tpu.cognition.locator.StaticLocalMap` feeds the cognition
layer directly (instead of a ROS ``Map`` msg).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from dcarl_tpu.cognition.locator import StaticLocalMap


class LoopMap(NamedTuple):
    """The full recorded map: L closed-loop lanes resampled to a common
    vertex count (outermost lane first — NativeMap lane order,
    native_map.py:35-36)."""

    loops: jax.Array         # [L, N, 2]
    speed_limit: jax.Array   # [L] m/s
    target_lane_index: int = 0


def _resample_closed(points: np.ndarray, n: int) -> np.ndarray:
    """Arc-length resample of a closed polyline to n vertices (host)."""
    pts = np.asarray(points, np.float64)
    closed = np.vstack([pts, pts[:1]])
    seg = np.linalg.norm(np.diff(closed, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    total = s[-1]
    si = np.linspace(0.0, total, n, endpoint=False)
    x = np.interp(si, s, closed[:, 0])
    y = np.interp(si, s, closed[:, 1])
    return np.stack([x, y], axis=1)


def load_loop_map(paths: Sequence[str], n_points: int = 4096,
                  speed_limit: float = 15.0) -> LoopMap:
    """Load recorded loops (the inner/outer_loop.dat format: CSV x,y
    rows — native_map.py:32-36).  Outer (first path) = lane 0."""
    loops = [_resample_closed(np.loadtxt(p, delimiter=","), n_points)
             for p in paths]
    return LoopMap(loops=jnp.asarray(np.stack(loops), jnp.float32),
                   speed_limit=jnp.full((len(loops),), speed_limit))


def synthetic_loop_map(n_lanes: int = 2, n_points: int = 1024,
                       radius: float = 200.0, lane_sep: float = 3.5,
                       speed_limit: float = 15.0) -> LoopMap:
    """A synthetic oval track standing in for the proprietary recorded
    loops (the .dat files describe a closed test track)."""
    theta = np.linspace(0.0, 2.0 * np.pi, n_points, endpoint=False)
    loops = []
    for i in range(n_lanes):
        r = radius - i * lane_sep  # lane 0 outermost
        loops.append(np.stack([r * np.cos(theta), r * np.sin(theta)],
                              axis=1))
    return LoopMap(loops=jnp.asarray(np.stack(loops), jnp.float32),
                   speed_limit=jnp.full((n_lanes,), speed_limit))


def window_static_map(lmap: LoopMap, ego_x, ego_y,
                      window: int = 256, back_fraction: float = 0.25
                      ) -> StaticLocalMap:
    """Build the local static map around the ego: per lane, gather a
    ``window``-vertex stretch of the closed loop starting
    ``back_fraction`` of the window behind the nearest vertex
    (the fixed-shape form of rebuild_lane's rotate-at-farthest-point,
    native_map.py:83-109)."""
    loops = lmap.loops
    L, N = loops.shape[0], loops.shape[1]
    ego = jnp.stack([jnp.asarray(ego_x, loops.dtype),
                     jnp.asarray(ego_y, loops.dtype)])

    d2 = jnp.sum((loops - ego) ** 2, axis=-1)          # [L, N]
    nearest = jnp.argmin(d2, axis=-1)                   # [L]
    start = nearest - int(window * back_fraction)
    idx = (start[:, None] + jnp.arange(window)[None, :]) % N   # [L, W]
    lanes = jnp.take_along_axis(loops, idx[:, :, None], axis=1)  # [L, W, 2]

    nxt = jnp.take_along_axis(loops, ((idx + 1) % N)[:, :, None], axis=1)
    tangents = jnp.arctan2(nxt[..., 1] - lanes[..., 1],
                           nxt[..., 0] - lanes[..., 0])

    return StaticLocalMap(
        lanes=lanes,
        tangents=tangents,
        speed_limit=lmap.speed_limit,
        stop_thru=jnp.zeros((L,), bool),   # closed loop: no junction end
        target_lane_index=jnp.asarray(lmap.target_lane_index),
    )


def reference_loop_paths() -> Optional[Sequence[str]]:
    """Locations of the reference's recorded loops when available
    (ZZZ_ROOT layout, native_map.py:32-34); None otherwise."""
    root = os.environ.get("ZZZ_ROOT")
    if not root:
        return None
    base = os.path.join(root, "zzz/src/navigation/data")
    paths = [os.path.join(base, "outer_loop.dat"),
             os.path.join(base, "inner_loop.dat")]
    return paths if all(os.path.exists(p) for p in paths) else None
