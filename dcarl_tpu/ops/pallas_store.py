"""Pallas TPU kernel for fused box-query moment reduction.

The confidence store's hot operation: for Q query points against an
N-row dataset, count containing boxes and reduce value moments —
the replacement for the reference's per-query R-tree walks
(deepq/RLS.py:161-181), which at 64k envs x 8 candidate actions would be
half a million pointer-chasing tree queries per decision tick.

Kernel shape: the containment mask is built dimension-by-dimension on
the VPU over [QT, NT] tiles (dataset laid out [D, N] so the long axis
is lane-aligned), then count/sum/sumsq reduce along N with the
accumulator carried in VMEM across the N-tile grid axis.  HBM traffic
is one pass over the dataset per Q-tile; the dataset tile is reused for
all 3 moments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, keys_ref, vals_ref, valid_ref, w_ref, out_ref, *, dim: int):
    j = pl.program_id(1)

    qt = q_ref.shape[1]
    nt = keys_ref.shape[1]
    # Boolean AND chain (one cmp + one and per dim) — cheaper on the
    # VPU than the float multiply chain (cmp + convert + mul), and the
    # whole mask stays in 1-bit vector registers until the reductions.
    mask_b = jnp.ones((qt, nt), dtype=jnp.bool_)
    for d in range(dim):  # static unroll over key dimensions
        diff = q_ref[d, :][:, None] - keys_ref[d, :][None, :]
        mask_b = mask_b & (jnp.abs(diff) <= w_ref[d, 0])
    mask_b = mask_b & (valid_ref[0, :][None, :] != 0.0)

    v = vals_ref[0, :]
    mask = mask_b.astype(jnp.float32)
    cnt = jnp.sum(mask, axis=1)
    s = jnp.sum(jnp.where(mask_b, v[None, :], 0.0), axis=1)
    ss = jnp.sum(jnp.where(mask_b, (v * v)[None, :], 0.0), axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[0, :] = cnt
        out_ref[1, :] = s
        out_ref[2, :] = ss

    @pl.when(j != 0)
    def _():
        out_ref[0, :] = out_ref[0, :] + cnt
        out_ref[1, :] = out_ref[1, :] + s
        out_ref[2, :] = out_ref[2, :] + ss


@functools.partial(jax.jit, static_argnames=("q_tile", "n_tile", "interpret"))
def box_query_moments_pallas(
    keys: jax.Array,         # [N, D]
    values: jax.Array,       # [N]
    valid: jax.Array,        # [N] bool
    queries: jax.Array,      # [Q, D]
    half_widths: jax.Array,  # [D]
    q_tile: int = 128,
    n_tile: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """[Q, 3] moments (count, sum, sumsq) of values whose stored boxes
    [key - w, key + w] contain each query point."""
    n, d = keys.shape
    q = queries.shape[0]

    n_pad = _round_up(max(n, n_tile), n_tile)
    q_pad = _round_up(max(q, q_tile), q_tile)

    keys_t = jnp.zeros((d, n_pad), jnp.float32).at[:, :n].set(
        keys.astype(jnp.float32).T)
    vals = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        values.astype(jnp.float32))
    valid_f = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        valid.astype(jnp.float32))
    # pad queries with +inf so padded rows match nothing
    q_t = jnp.full((d, q_pad), jnp.inf, jnp.float32).at[:, :q].set(
        queries.astype(jnp.float32).T)
    w = half_widths.astype(jnp.float32).reshape(d, 1)

    grid = (q_pad // q_tile, n_pad // n_tile)

    out = pl.pallas_call(
        functools.partial(_kernel, dim=d),
        out_shape=jax.ShapeDtypeStruct((3, q_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((d, q_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, q_tile), lambda i, j: (0, i),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * q_pad * n_pad * (d + 3),
            bytes_accessed=(d + 3) * n_pad * 4 * (q_pad // q_tile)
            + 3 * q_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_t, keys_t, vals, valid_f, w)

    return out[:, :q].T
