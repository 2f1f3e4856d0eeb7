"""Confidence-bound estimation — the algorithmic core of DCARL.

DCARL trusts a learned action over the rule action only where collected
data proves, with confidence, that it outperforms the rule.  Per
(state, action) cell it maintains value samples and computes:

* an optimistic *upper* Hoeffding bound for the rule action,
* pessimistic *lower* / *CI-lower* bounds for every other action,

then selects ``argmax`` over the bounds ("TSRL value").  Semantics follow
the reference demos (Simulation_testing/Simulation_1/test_DCARL.py:10-28
estimators; :73-102 stream loop) re-designed as a ``lax.scan`` over the
sample stream with all state in fixed-shape arrays — no Python lists, so
the whole 20k-step demo compiles to a single XLA program and thousands of
independent streams batch with ``vmap``.

Two table representations are provided:

``GoldenTable``
    Keeps every sample in a per-cell ring buffer and recomputes two-pass
    mean/std per step exactly like the reference's
    ``np.mean``/``np.std`` over Python-list buckets.  float64; used for
    golden-fidelity reproduction of Simulation_1/2.

``RunningTable``
    O(1)-memory per cell (count/sum/sum-of-squares); the scalable form
    used by the batched production path and the sharded store.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.config import ConfidenceConfig


# ---------------------------------------------------------------------------
# Bound functions (vectorized; operate on sufficient statistics)
# ---------------------------------------------------------------------------


def hoeffding_margin(n: jax.Array, alpha: float, scale: float) -> jax.Array:
    """scale * sqrt(log(1/alpha) / (2 n)) — Hoeffding deviation for a
    value supported on an interval of width ``scale``."""
    log_term = math.log(1.0 / alpha)
    return scale * jnp.sqrt(log_term / 2.0 / n)


def upper_bound(mean, n, cfg: ConfidenceConfig = ConfidenceConfig()):
    """Optimistic bound, capped at the value-support maximum.

    Reference: Simulation_1/test_DCARL.py:10-12.
    """
    return jnp.minimum(cfg.value_max, mean + hoeffding_margin(n, cfg.alpha, cfg.scale))


def lower_bound(mean, n, cfg: ConfidenceConfig = ConfidenceConfig()):
    """Pessimistic Hoeffding bound. Reference: test_DCARL.py:14-16."""
    return mean - hoeffding_margin(n, cfg.alpha, cfg.scale)


def ci_lower_bound(dsum, sigma, n, cfg: ConfidenceConfig = ConfidenceConfig()):
    """Empirical-Bernstein-style lower bound.

    Follows the reference's arithmetic term-for-term
    (test_DCARL.py:18-24):
        dsum/n/(n+1) - 4*sigma/(n+1) + dsum/(n+1) - scale*sqrt(log(1/a)/2/(n+1))
    """
    log_term = math.log(1.0 / cfg.alpha)
    return (
        dsum / n / (n + 1.0)
        - 4.0 * sigma / (n + 1.0)
        + dsum / (n + 1.0)
        - cfg.scale * jnp.sqrt(log_term / 2.0 / (n + 1.0))
    )


def mean_value(mean, cfg: ConfidenceConfig = ConfidenceConfig()):
    """Capped empirical mean. Reference: test_DCARL.py:26-28."""
    return jnp.minimum(cfg.value_max, mean)


def tsrl_bound(mean, dsum, sigma, n, action_is_rule, cfg: ConfidenceConfig):
    """The TSRL confidence value for one cell given its statistics:
    upper bound for the rule action, min(lower, CI-lower) otherwise
    (reference stream loop test_DCARL.py:86-90)."""
    ub = upper_bound(mean, n, cfg)
    lb = jnp.minimum(lower_bound(mean, n, cfg), ci_lower_bound(dsum, sigma, n, cfg))
    return jnp.where(action_is_rule, ub, lb)


# ---------------------------------------------------------------------------
# Golden table: exact per-step recomputation over sample buffers
# ---------------------------------------------------------------------------


class GoldenTable(NamedTuple):
    """Full-sample confidence table for bit-faithful demo reproduction."""

    values: jax.Array            # [S, A, CAP] f64 sample buffers
    counts: jax.Array            # [S, A] i32 samples per cell
    tsrl: jax.Array              # [S, A] f64 confidence values
    seen: jax.Array              # [S] i32 per-state stream counter
    activation_step: jax.Array   # [S] i32, -1 until first non-rule argmax
    activation_value: jax.Array  # [S] f64 (reference keeps this at -1)


def golden_init(
    state_num: int,
    action_num: int,
    capacity: int,
    cfg: ConfidenceConfig = ConfidenceConfig(),
) -> GoldenTable:
    """Initial table: rule action optimistic (+100), others -50
    (reference init test_DCARL.py:47-53)."""
    tsrl = jnp.full((state_num, action_num), cfg.other_prior, dtype=jnp.float64)
    tsrl = tsrl.at[:, cfg.rule_action].set(cfg.rule_prior)
    return GoldenTable(
        values=jnp.zeros((state_num, action_num, capacity), dtype=jnp.float64),
        counts=jnp.zeros((state_num, action_num), dtype=jnp.int32),
        tsrl=tsrl,
        seen=jnp.zeros((state_num,), dtype=jnp.int32),
        activation_step=jnp.full((state_num,), -1, dtype=jnp.int32),
        activation_value=jnp.full((state_num,), -1.0, dtype=jnp.float64),
    )


class StepOutput(NamedTuple):
    state_idx: jax.Array      # i32
    step_value: jax.Array     # f64 max TSRL value at the visited state
    tsrl_action: jax.Array    # i32 argmax action at the visited state
    true_value: jax.Array     # f64 ground-truth value of selected action
    overall_value: jax.Array  # f64 Sim-2 improvement accounting


def _masked_moments(buffer: jax.Array, n: jax.Array):
    """Two-pass mean/std over the first ``n`` entries of ``buffer``,
    matching ``np.mean``/``np.std`` over a bucket of length n."""
    cap = buffer.shape[-1]
    mask = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).squeeze(-1) < n
    nf = n.astype(buffer.dtype)
    dsum = jnp.sum(jnp.where(mask, buffer, 0.0))
    mean = dsum / nf
    sq = jnp.where(mask, (buffer - mean) ** 2, 0.0)
    sigma = jnp.sqrt(jnp.sum(sq) / nf)
    return mean, dsum, sigma


def golden_update(
    table: GoldenTable,
    state_idx: jax.Array,
    action: jax.Array,
    value: jax.Array,
    true_action_values: jax.Array,
    cfg: ConfidenceConfig = ConfidenceConfig(),
) -> Tuple[GoldenTable, StepOutput]:
    """Ingest one (state, action, value) tuple, update the visited cell's
    confidence value, and select the TSRL action for the visited state.

    Faithful to the reference stream-loop body (test_DCARL.py:73-105):
    append to bucket, recompute the bound once the bucket exceeds
    ``n_thres``, then argmax over all actions of the visited state.
    """
    state_idx = state_idx.astype(jnp.int32)
    action = action.astype(jnp.int32)
    c = table.counts[state_idx, action]
    values = table.values.at[state_idx, action, c].set(value)
    n = c + 1
    counts = table.counts.at[state_idx, action].set(n)

    mean, dsum, sigma = _masked_moments(values[state_idx, action], n)
    bound = tsrl_bound(mean, dsum, sigma, n.astype(values.dtype),
                       action == cfg.rule_action, cfg)
    new_cell = jnp.where(n > cfg.n_thres, bound, table.tsrl[state_idx, action])
    tsrl = table.tsrl.at[state_idx, action].set(new_cell)

    row = tsrl[state_idx]
    step_value = jnp.max(row)
    tsrl_action = jnp.argmax(row).astype(jnp.int32)  # first-max, like np.argmax
    true_value = true_action_values[state_idx, tsrl_action]

    seen = table.seen.at[state_idx].add(1)
    activated_now = (table.activation_step[state_idx] == -1) & (
        tsrl_action != cfg.rule_action
    )
    activation_step = table.activation_step.at[state_idx].set(
        jnp.where(activated_now, seen[state_idx], table.activation_step[state_idx])
    )

    # Sim-2 overall-value accounting (Simulation_2/test_DCARL.py:99-105).
    # activation_value is never assigned in the reference, so it stays -1.
    active = activation_step != -1
    overall = jnp.sum(
        jnp.where(active, jnp.max(tsrl, axis=1) - table.activation_value * 0.9, 0.0)
    )

    new_table = GoldenTable(values, counts, tsrl, seen, activation_step,
                            table.activation_value)
    out = StepOutput(state_idx, step_value, tsrl_action, true_value, overall)
    return new_table, out


def golden_run(
    data: jax.Array,
    true_action_values: jax.Array,
    action_num: Optional[int] = None,
    capacity: Optional[int] = None,
    cfg: ConfidenceConfig = ConfidenceConfig(),
) -> Tuple[GoldenTable, StepOutput]:
    """Run the full demo stream as one ``lax.scan``.

    ``data`` is the bundled [N, 4] array of rows
    [state_idx, state_scalar, action_idx, sampled_value] and
    ``true_action_values`` the [S, A_true] ground truth.  Returns the
    final table and per-step outputs stacked over the stream.
    """
    state_num = true_action_values.shape[0]
    if action_num is None:
        action_num = true_action_values.shape[1]
    if capacity is None:
        raise ValueError("capacity must be provided (max per-cell bucket size)")

    data = jnp.asarray(data, dtype=jnp.float64)
    tav = jnp.asarray(true_action_values, dtype=jnp.float64)
    table = golden_init(state_num, action_num, capacity, cfg)

    def step(tab, row):
        return golden_update(tab, row[0].astype(jnp.int32),
                             row[2].astype(jnp.int32), row[3], tav, cfg)

    return jax.lax.scan(step, table, data)


def required_capacity(data, state_num: int, action_num: int) -> int:
    """Host-side helper: the max per-(state, action) bucket size in a
    dataset, rounded up to a multiple of 8 for TPU-friendly tiling."""
    import numpy as np

    arr = np.asarray(data)
    idx = arr[:, 0].astype(np.int64)
    act = arr[:, 2].astype(np.int64)
    flat = idx * action_num + act
    counts = np.bincount(flat, minlength=state_num * action_num)
    cap = int(counts.max())
    return (cap + 7) // 8 * 8


# ---------------------------------------------------------------------------
# Running table: O(1)-memory sufficient statistics (production path)
# ---------------------------------------------------------------------------


class RunningTable(NamedTuple):
    """Per-cell running (count, sum, sum-of-squares) — the scalable
    representation.  Mean/variance are recovered in closed form; for the
    demo datasets its decisions match ``GoldenTable`` (see tests)."""

    count: jax.Array  # [..., S, A]
    total: jax.Array  # [..., S, A]
    sumsq: jax.Array  # [..., S, A]
    tsrl: jax.Array   # [..., S, A]


def running_init(
    shape: Tuple[int, ...],
    cfg: ConfidenceConfig = ConfidenceConfig(),
    dtype=jnp.float32,
) -> RunningTable:
    """``shape`` = (..., state_num, action_num)."""
    tsrl = jnp.full(shape, cfg.other_prior, dtype=dtype)
    tsrl = tsrl.at[..., cfg.rule_action].set(cfg.rule_prior)
    return RunningTable(
        count=jnp.zeros(shape, dtype=jnp.int32),
        total=jnp.zeros(shape, dtype=dtype),
        sumsq=jnp.zeros(shape, dtype=dtype),
        tsrl=tsrl,
    )


def running_update(
    table: RunningTable,
    state_idx: jax.Array,
    action: jax.Array,
    value: jax.Array,
    cfg: ConfidenceConfig = ConfidenceConfig(),
) -> RunningTable:
    """Scatter-add one sample and refresh the visited cell's bound."""
    state_idx = state_idx.astype(jnp.int32)
    action = action.astype(jnp.int32)
    count = table.count.at[state_idx, action].add(1)
    total = table.total.at[state_idx, action].add(value)
    sumsq = table.sumsq.at[state_idx, action].add(value * value)

    n = count[state_idx, action]
    nf = n.astype(table.total.dtype)
    dsum = total[state_idx, action]
    mean = dsum / nf
    var = jnp.maximum(sumsq[state_idx, action] / nf - mean * mean, 0.0)
    sigma = jnp.sqrt(var)
    bound = tsrl_bound(mean, dsum, sigma, nf, action == cfg.rule_action, cfg)
    cell = jnp.where(n > cfg.n_thres, bound, table.tsrl[state_idx, action])
    tsrl = table.tsrl.at[state_idx, action].set(cell)
    return RunningTable(count, total, sumsq, tsrl)


def running_update_batch(
    table: RunningTable,
    state_idx: jax.Array,
    action: jax.Array,
    value: jax.Array,
    cfg: ConfidenceConfig = ConfidenceConfig(),
) -> RunningTable:
    """Ingest a whole batch of samples at once (order-free variant).

    Scatter-adds all samples, then recomputes bounds for *every* cell in
    one vectorized pass — the form used by the high-throughput fleet
    path, where per-sample sequential bound refresh is unnecessary.
    """
    state_idx = state_idx.astype(jnp.int32)
    action = action.astype(jnp.int32)
    dtype = table.total.dtype
    value = value.astype(dtype)

    count = table.count.at[state_idx, action].add(1)
    total = table.total.at[state_idx, action].add(value)
    sumsq = table.sumsq.at[state_idx, action].add(value * value)
    tsrl = refresh_all_bounds(
        RunningTable(count, total, sumsq, table.tsrl), cfg
    )
    return RunningTable(count, total, sumsq, tsrl)


def refresh_all_bounds(
    table: RunningTable, cfg: ConfidenceConfig = ConfidenceConfig()
) -> jax.Array:
    """Vectorized bound recomputation for every cell; cells at or below
    ``n_thres`` keep their prior/previous value."""
    dtype = table.total.dtype
    nf = jnp.maximum(table.count, 1).astype(dtype)
    mean = table.total / nf
    var = jnp.maximum(table.sumsq / nf - mean * mean, 0.0)
    sigma = jnp.sqrt(var)
    action_num = table.tsrl.shape[-1]
    is_rule = (
        jax.lax.broadcasted_iota(jnp.int32, (1, action_num), 1)
        == cfg.rule_action
    )
    is_rule = jnp.broadcast_to(is_rule, table.tsrl.shape)
    bound = tsrl_bound(mean, table.total, sigma, nf, is_rule, cfg)
    return jnp.where(table.count > cfg.n_thres, bound, table.tsrl)


def select_actions(tsrl: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """argmax/max over the action axis — the TSRL policy."""
    return jnp.argmax(tsrl, axis=-1).astype(jnp.int32), jnp.max(tsrl, axis=-1)
