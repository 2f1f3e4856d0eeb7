"""Throttle/brake calibration — vectorized acceleration-table builder.

Re-design of the reference's CARLA calibration tool
(Simulation_testing/.../Planning_library/calibration.py:20-170), which
drives a real CARLA vehicle over a (velocity x throttle) and
(velocity x brake) grid one cell at a time and writes
``acc_table.txt`` / ``dec_table.txt``.

TPU shape: the entire grid is ONE vmapped rollout of the env's
longitudinal dynamics — every (v0, command) cell is an independent lane
of a ``[n_v * n_cmd]`` batch, measured in a single jit instead of hours
of serial CARLA episodes.  The resulting tables serve the same role as
the reference's: a feedforward inverse map ``(v, desired accel) ->
command`` for the longitudinal controller.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EnvConfig


class CalibrationTable(NamedTuple):
    """Measured accelerations on a (speed x command) grid.

    ``acc[i, j]`` is the realised dv/dt starting from ``speeds[i]``
    under constant command ``commands[j]`` (throttle in [0,1] for the
    acc table, brake in [0,1] for the dec table, matching the
    reference's two-file layout calibration.py:60-66, 135-141).
    """
    speeds: jax.Array     # [n_v]
    commands: jax.Array   # [n_cmd]
    acc: jax.Array        # [n_v, n_cmd]


def _longitudinal_accel(v, cmd, cfg: EnvConfig):
    """The env's longitudinal model (driving_env._step_ego): throttle/
    brake split plus speed-proportional drag."""
    throttle = jnp.maximum(0.0, cmd)
    brake = jnp.maximum(0.0, -cmd)
    return throttle * cfg.max_accel - brake * cfg.max_brake - 0.05 * v


def measure_table(cfg: EnvConfig = EnvConfig(),
                  speeds=None, commands=None, settle_steps: int = 4,
                  brake: bool = False) -> CalibrationTable:
    """Measure dv/dt for every grid cell in one jitted batch.

    Mirrors the reference's measurement protocol (hold the command for a
    few ticks from a prepared speed, record achieved acceleration,
    calibration.py:40-58) with the serial episode loop replaced by a
    ``vmap`` over the flattened grid and a ``lax.scan`` over ticks.
    """
    if speeds is None:
        speeds = jnp.arange(0.0, 20.5, 2.5)
    if commands is None:
        commands = jnp.arange(0.0, 1.01, 0.1)
    speeds = jnp.asarray(speeds, jnp.float32)
    commands = jnp.asarray(commands, jnp.float32)
    sign = -1.0 if brake else 1.0

    v0, cmd = jnp.meshgrid(speeds, commands, indexing="ij")
    v0 = v0.reshape(-1)
    cmd = sign * cmd.reshape(-1)

    def tick(v, _):
        a = _longitudinal_accel(v, cmd, cfg)
        return jnp.clip(v + a * cfg.dt, 0.0, 60.0), None

    @jax.jit
    def run(v0):
        v_end, _ = jax.lax.scan(tick, v0, None, length=settle_steps)
        return (v_end - v0) / (settle_steps * cfg.dt)

    acc = run(v0).reshape(len(speeds), len(commands))
    return CalibrationTable(speeds=speeds, commands=commands, acc=acc)


def save_tables(acc_table: CalibrationTable, dec_table: CalibrationTable,
                acc_path: str = "acc_table.txt",
                dec_path: str = "dec_table.txt") -> None:
    """Write the reference's two-text-file format (rows = speeds,
    columns = commands; calibration.py:60-66)."""
    np.savetxt(acc_path, np.asarray(acc_table.acc), fmt="%.6f")
    np.savetxt(dec_path, np.asarray(dec_table.acc), fmt="%.6f")


def load_table(path: str, speeds, commands) -> CalibrationTable:
    acc = jnp.asarray(np.loadtxt(path), jnp.float32)
    return CalibrationTable(speeds=jnp.asarray(speeds, jnp.float32),
                            commands=jnp.asarray(commands, jnp.float32),
                            acc=acc)


def feedforward_command(table: CalibrationTable, v, desired_accel):
    """Invert the table: smallest command achieving >= desired accel at
    speed v (batched, jit-safe).  This is the consumer role the
    reference's tables play in its controller; monotonicity in the
    command axis makes searchsorted-per-row exact."""
    v = jnp.asarray(v)
    desired_accel = jnp.asarray(desired_accel)
    iv = jnp.clip(jnp.searchsorted(table.speeds, v), 0,
                  table.speeds.shape[0] - 1)
    row = table.acc[iv]                                     # [..., n_cmd]
    # first j with row[j] >= desired: rows are monotone in command
    ok = row >= desired_accel[..., None]
    j = jnp.argmax(ok, axis=-1)
    any_ok = jnp.any(ok, axis=-1)
    j = jnp.where(any_ok, j, table.commands.shape[0] - 1)
    return table.commands[j]
