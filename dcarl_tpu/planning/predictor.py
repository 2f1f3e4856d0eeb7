"""Constant-velocity obstacle prediction + trajectory collision check.

Re-design of the reference's ``predict`` class
(Data_From_Carla/Agent/zzz/predict.py): each obstacle is rolled out at
constant velocity over the planning horizon, offset forward/backward by
``move_gap`` along its heading (two circles per vehicle), and a
candidate path collides if any of its sampled points (stride 2,
starting at index 2 — predict.py:52-59) comes within ``check_radius``
of a predicted point at the same time index.

Tensorized: [K obstacles, T steps] rollouts against [P paths, T points]
in one broadcast reduction — per-path boolean masks instead of the
reference's early-return loops, so all candidates of all envs batch.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from dcarl_tpu.config import WerlingConfig


class PredictedObstacles(NamedTuple):
    x: jax.Array      # [K, 2, T] front/back circle centers
    y: jax.Array      # [K, 2, T]
    valid: jax.Array  # [K] obstacle exists (for padded slots)


def predict_obstacles(
    obstacles: jax.Array,
    valid: jax.Array,
    cfg: WerlingConfig = WerlingConfig(),
) -> PredictedObstacles:
    """``obstacles``: [K, 5] rows (x, y, vx, vy, yaw).  Rollout at dt
    over the horizon arange(0, maxt, dt) (predict.py:87-110)."""
    n_t = int(cfg.max_t / cfg.dt)  # arange(0, MAXT, DT)
    t = jnp.arange(n_t, dtype=obstacles.dtype) * cfg.dt
    x0, y0 = obstacles[:, 0:1], obstacles[:, 1:2]
    vx, vy = obstacles[:, 2:3], obstacles[:, 3:4]
    yaw = obstacles[:, 4:5]
    xt = x0 + t[None, :] * vx
    yt = y0 + t[None, :] * vy
    gap_x = jnp.cos(yaw) * cfg.move_gap
    gap_y = jnp.sin(yaw) * cfg.move_gap
    x = jnp.stack([xt + gap_x, xt - gap_x], axis=1)
    y = jnp.stack([yt + gap_y, yt - gap_y], axis=1)
    return PredictedObstacles(x=x, y=y, valid=valid)


def check_collision_free(
    path_x: jax.Array,
    path_y: jax.Array,
    pred: PredictedObstacles,
    cfg: WerlingConfig = WerlingConfig(),
) -> jax.Array:
    """[..., T] candidate path points -> [...] boolean, True when the
    path clears every predicted circle (the reference's
    ``check_collision`` returns True for "safe" — predict.py:21-60).

    Checked indices follow the reference exactly: t = 2, 4, ... up to
    ``min(len(fp.x), len(path.t)) - 2`` with stride 2.
    """
    n_path_t = path_x.shape[-1]
    n_pred_t = pred.x.shape[-1]
    len_predict = min(n_path_t - 1, n_pred_t - 1)
    idx = jnp.arange(2, len_predict, 2)

    px = path_x[..., idx]                      # [..., S]
    py = path_y[..., idx]
    ox = pred.x[..., idx]                      # [K, 2, S]
    oy = pred.y[..., idx]

    # broadcast: [..., 1, 1, S] vs [K, 2, S]
    d2 = (ox - px[..., None, None, :]) ** 2 + (oy - py[..., None, None, :]) ** 2
    hit = d2 <= cfg.robot_radius ** 2
    hit = hit & pred.valid[:, None, None]
    return ~jnp.any(hit, axis=(-3, -2, -1))
