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


# Finite padding sentinel: far outside any real key range, but small
# enough that squared scaled distances stay finite in f32 (no inf-inf
# NaNs in the prefilter).
_PAD = 1.0e9


def _sorted_kernel(qs_ref, q_ref, ks_ref, keys_ref, vals_ref, valid_ref,
                   w_ref, iw_ref, w0_ref, out_ref, *, dim: int):
    """Band + distance pruned tile.

    Three pruning levels, all exact (they only skip work that provably
    produces no matches):

    1. *Band*: rows and queries arrive sorted by the most selective key
       dimension, so each tile covers a contiguous band of it; skip the
       tile when the bands cannot intersect.  Padding/invalid rows carry
       sort key ``_PAD`` and sort to the end, so queries against a
       mostly-empty store cost only the valid prefix.
    2. *Distance prefilter (MXU)*: containment implies the w-scaled
       squared distance is <= dim, and that distance is one [QT, D] x
       [D, NT] matmul — cheap on the MXU.  A rounding-safe margin keeps
       it conservative.
    3. Only when some pair in the tile passes the prefilter does the
       exact per-dimension VPU chain (the expensive part, ~4*dim ops per
       pair) run.
    """
    j = pl.program_id(1)
    qt = q_ref.shape[1]
    nt = keys_ref.shape[1]

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    w0 = w0_ref[0]
    # Sorted ascending => band ends are the tile's first/last elements.
    q_lo, q_hi = qs_ref[0, 0], qs_ref[0, qt - 1]
    k_lo, k_hi = ks_ref[0, 0], ks_ref[0, nt - 1]
    overlap = (k_lo - w0 <= q_hi) & (k_hi + w0 >= q_lo)

    @pl.when(overlap)
    def _():
        # MXU prefilter: d2[q, n] = sum_d ((q_d - k_d) / w_d)^2.
        qs = q_ref[:] * iw_ref[:]          # [D, QT] scaled queries
        ks = keys_ref[:] * iw_ref[:]       # [D, NT] scaled keys
        qn = jnp.sum(qs * qs, axis=0)      # [QT]
        kn = jnp.sum(ks * ks, axis=0)      # [NT]
        dots = jax.lax.dot_general(
            qs, ks, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [QT, NT]
        d2 = qn[:, None] - 2.0 * dots + kn[None, :]
        # Containment => d2 <= dim exactly; pad with a margin covering
        # f32 matmul/cancellation error (proportional to the magnitudes
        # that cancel).
        thresh = dim + 1.0 + 1e-5 * (qn[:, None] + kn[None, :])
        cand = d2 <= thresh

        @pl.when(jnp.any(cand))
        def _():
            mask_b = jnp.ones((qt, nt), dtype=jnp.bool_)
            for d in range(dim):  # static unroll over key dimensions
                diff = q_ref[d, :][:, None] - keys_ref[d, :][None, :]
                mask_b = mask_b & (jnp.abs(diff) <= w_ref[d, 0])
            mask_b = mask_b & (valid_ref[0, :][None, :] != 0.0)

            v = vals_ref[0, :]
            mask = mask_b.astype(jnp.float32)
            out_ref[0, :] = out_ref[0, :] + jnp.sum(mask, axis=1)
            out_ref[1, :] = out_ref[1, :] + jnp.sum(
                jnp.where(mask_b, v[None, :], 0.0), axis=1)
            out_ref[2, :] = out_ref[2, :] + jnp.sum(
                jnp.where(mask_b, (v * v)[None, :], 0.0), axis=1)


@functools.partial(jax.jit, static_argnames=("q_tile", "n_tile", "interpret"))
def box_query_moments_sorted(
    keys: jax.Array,         # [N, D]
    values: jax.Array,       # [N]
    valid: jax.Array,        # [N] bool
    queries: jax.Array,      # [Q, D]
    half_widths: jax.Array,  # [D]
    q_tile: int = 128,
    n_tile: int = 2048,
    interpret: bool = False,
) -> jax.Array:
    """[Q, 3] moments — identical results to
    :func:`box_query_moments_pallas` (moments are order-invariant), but
    with sorted-band + MXU-distance pruning: rows and queries are sorted
    along the most selective key dimension (largest spread / half_width,
    measured from the data), tile pairs whose 1-D bands cannot intersect
    skip all mask work, and surviving tiles run the exact per-dim chain
    only if the matmul distance prefilter finds a candidate pair.
    Replaces the R-tree's spatial pruning (RLS.py:161-163) with a
    shape-static, vector-friendly equivalent."""
    n, d = keys.shape
    q = queries.shape[0]
    keys = keys.astype(jnp.float32)
    values = values.astype(jnp.float32)
    queries = queries.astype(jnp.float32)
    w = half_widths.astype(jnp.float32)

    # Most selective dimension: spread (mean |x - mean|) over half-width.
    vf = valid.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(vf), 1.0)
    mean_d = (vf @ keys) / cnt
    spread = (vf @ jnp.abs(keys - mean_d)) / cnt
    sdim = jnp.argmax(spread / jnp.maximum(w, 1e-9))
    w0 = jnp.take(w, sdim)

    # Sort store rows by the sort dim; invalid rows to the end (_PAD).
    sk = jnp.where(valid, jnp.take(keys, sdim, axis=1), _PAD)
    order = jnp.argsort(sk)
    keys_s = jnp.take(keys, order, axis=0)
    vals_s = jnp.take(values, order)
    valid_s = jnp.take(valid, order)
    sk_s = jnp.take(sk, order)

    qk = jnp.take(queries, sdim, axis=1)
    qorder = jnp.argsort(qk)
    queries_s = jnp.take(queries, qorder, axis=0)
    qk_s = jnp.take(qk, qorder)

    n_pad = _round_up(max(n, n_tile), n_tile)
    q_pad = _round_up(max(q, q_tile), q_tile)

    keys_t = jnp.full((d, n_pad), _PAD, jnp.float32).at[:, :n].set(keys_s.T)
    vals_p = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(vals_s)
    valid_f = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        valid_s.astype(jnp.float32))
    ks_p = jnp.full((1, n_pad), _PAD, jnp.float32).at[0, :n].set(sk_s)
    q_t = jnp.full((d, q_pad), _PAD, jnp.float32).at[:, :q].set(queries_s.T)
    qs_p = jnp.full((1, q_pad), _PAD, jnp.float32).at[0, :q].set(qk_s)
    w_col = w.reshape(d, 1)
    iw_col = (1.0 / jnp.maximum(w, 1e-9)).reshape(d, 1)
    w0_arr = w0.reshape(1)

    grid = (q_pad // q_tile, n_pad // n_tile)

    out = pl.pallas_call(
        functools.partial(_sorted_kernel, dim=d),
        out_shape=jax.ShapeDtypeStruct((3, q_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, q_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(qs_p, q_t, ks_p, keys_t, vals_p, valid_f, w_col, iw_col, w0_arr)

    # Un-sort the query axis.
    inv = jnp.argsort(qorder)
    return out[:, :q].T[inv]


@functools.partial(jax.jit, static_argnames=("q_tile", "n_tile", "interpret",
                                             "action_dim", "band_dim"))
def box_query_moments_grouped(
    keys: jax.Array,         # [N, D]
    values: jax.Array,       # [N]
    valid: jax.Array,        # [N] bool
    queries: jax.Array,      # [A, Qa, D] — grouped by the action column
    half_widths: jax.Array,  # [D]
    q_tile: int = 512,
    n_tile: int = 1024,
    interpret: bool = False,
    action_dim: int = -1,
    band_dim: "int | None" = 1,
) -> jax.Array:
    """[A, Qa, 3] moments for action-grouped query batches.

    The integrated trainer / gated driver query EVERY action for every
    env (candidate_keys), so the query batch arrives pre-grouped as
    [A, Qa, D].  Band order comes from a COMPOSITE key
    ``action * C + key[band_dim]`` (C spans the band_dim range, so
    different actions can never band-overlap): tiles prune on action
    match AND band_dim proximity at once — strictly stronger than the
    single data-chosen dimension of :func:`box_query_moments_sorted` —
    while the query side needs only ONE [Qa] argsort along band_dim
    (shared by all A groups; every group holds the same envs), instead
    of the full [A*Qa] argsort + [Q, D] gathers of the flat path.
    ``band_dim=None`` falls back to action-only banding.  band_dim
    defaults to 1 = ego y, the driving state's most-traversed axis.
    """
    a, qa, d = queries.shape
    n = keys.shape[0]
    keys = keys.astype(jnp.float32)
    values = values.astype(jnp.float32)
    queries = queries.astype(jnp.float32)
    w = half_widths.astype(jnp.float32)
    sdim = action_dim % d

    if band_dim is None:
        w0 = w[sdim]
        row_band = keys[:, sdim]
        q_band = queries.reshape(a * qa, d)[:, sdim]
        qorder = None
    else:
        w0 = w[band_dim]
        bvals = keys[:, band_dim]
        qb = queries[0, :, band_dim]               # same envs in every group
        # Exclude sentinel rows (dense-block writes stamp invalid rows
        # with SENTINEL_KEY == _PAD) from the span: their |band| ~ 1e9
        # would blow up c until the f32 composite key quantizes band to
        # steps >> w0 and the tile pruning drops true matches.
        real = valid & (jnp.abs(bvals) < _PAD / 2)
        span = jnp.maximum(
            jnp.max(jnp.abs(bvals), initial=0.0, where=real),
            jnp.max(jnp.abs(qb))) + w0 + 1.0
        c = 4.0 * span
        row_band = keys[:, sdim] * c + bvals
        qorder = jnp.argsort(qb)
        queries = jnp.take(queries, qorder, axis=1)
        q_band = (queries[:, :, sdim] * c
                  + queries[:, :, band_dim]).reshape(a * qa)
        # Composite keys reach ~A*c; pad the kernel's band-overlap test
        # by their f32 rounding (2^-23 relative) so quantization can
        # only loosen pruning, never drop a boundary match.  The exact
        # per-dimension containment mask keeps results exact.
        w0 = w0 + 32.0 * c * 1.2e-7

    # rows: sort by the composite band key, invalid rows to the end
    sk = jnp.where(valid, row_band, _PAD)
    order = jnp.argsort(sk)
    keys_s = jnp.take(keys, order, axis=0)
    vals_s = jnp.take(values, order)
    valid_s = jnp.take(valid, order)
    sk_s = jnp.take(sk, order)

    flat_q = queries.reshape(a * qa, d)          # action-major == sorted
    qk = q_band
    q = a * qa

    n_pad = _round_up(max(n, n_tile), n_tile)
    q_pad = _round_up(max(q, q_tile), q_tile)

    keys_t = jnp.full((d, n_pad), _PAD, jnp.float32).at[:, :n].set(keys_s.T)
    vals_p = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(vals_s)
    valid_f = jnp.zeros((1, n_pad), jnp.float32).at[0, :n].set(
        valid_s.astype(jnp.float32))
    ks_p = jnp.full((1, n_pad), _PAD, jnp.float32).at[0, :n].set(sk_s)
    q_t = jnp.full((d, q_pad), _PAD, jnp.float32).at[:, :q].set(flat_q.T)
    qs_p = jnp.full((1, q_pad), _PAD, jnp.float32).at[0, :q].set(qk)
    w_col = w.reshape(d, 1)
    iw_col = (1.0 / jnp.maximum(w, 1e-9)).reshape(d, 1)
    w0_arr = w0.reshape(1)

    grid = (q_pad // q_tile, n_pad // n_tile)
    out = pl.pallas_call(
        functools.partial(_sorted_kernel, dim=d),
        out_shape=jax.ShapeDtypeStruct((3, q_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, q_tile), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(qs_p, q_t, ks_p, keys_t, vals_p, valid_f, w_col, iw_col, w0_arr)

    res = out[:, :q].T.reshape(a, qa, 3)
    if qorder is not None:
        res = jnp.take(res, jnp.argsort(qorder), axis=1)
    return res


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
