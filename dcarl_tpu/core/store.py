"""Continuous-state confidence store — the R-tree replacement.

The reference's on-vehicle RLS keeps every visited (state, action) as a
box in a libspatialindex R-tree with per-dimension half-widths and
answers two queries per candidate action per decision tick
(deepq/RLS.py:161-181):

* visited_times: how many stored boxes contain the query point,
* mean/var of the stored values among those matches.

A pointer-chasing spatial tree is the wrong shape for TPU.  Here the
dataset is a fixed-capacity structure-of-arrays; a box query is a
*masked matmul*: build the [Q, N] containment mask on the VPU, then
reduce (count, sum(v), sum(v^2)) as one [Q, N] x [N, 3] contraction on
the MXU.  Batched queries for thousands of envs are one kernel; shards
of the dataset across devices combine with ``psum`` of the partial
moments (see :mod:`dcarl_tpu.parallel`).

Semantics parity: containment is ``all(|key_d - q_d| <= w_d)`` — a
point query intersecting stored boxes ``[key - w, key + w]`` exactly as
``rtree.Index.intersection`` with the reference's ``visited_state_dist``
half-widths (RLS.py:68, :195-196).  Variance is the population variance
(``np.var``), and empty matches report mean/var/sigma = -1
(RLS.py:168-169).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from dcarl_tpu.config import StoreConfig

# Half-widths of the 21-D (20-D obs + action) query box, from
# deepq/RLS.py:68.  Action half-width 0.1 => action matches exactly.
FIELD_HALF_WIDTHS = (
    1.0, 0.3, 2.0, 50.0,
    10.0, 0.3, 2.0, 50.0,
    10.0, 0.3, 2.0, 50.0,
    10.0, 0.3, 2.0, 50.0,
    10.0, 0.3, 2.0, 50.0,
    0.1,
)

# Half-widths of the 13-D lane_models variant (12-D obs + action),
# lane_models/src/deepq/RLS.py:53.
LANE_HALF_WIDTHS = (
    2.0, 5.0, 10.0, 1.0, 6.0, 10.0, 1.0, 6.0, 10.0, 6.0, 10.0, 6.0,
    0.1,
)


class ConfidenceStore(NamedTuple):
    """Fixed-capacity {key, action, value} dataset (SoA layout)."""

    keys: jax.Array     # [N, D] state||action keys
    actions: jax.Array  # [N] recorded action (visited_state_value[:, 0])
    values: jax.Array   # [N] recorded return (visited_state_value[:, 1])
    size: jax.Array     # i32 valid rows (== min(total, N))
    head: jax.Array     # i32 next write slot (ring overwrite when full)


def store_init(capacity: int, key_dim: int, dtype=jnp.float32) -> ConfidenceStore:
    return ConfidenceStore(
        keys=jnp.zeros((capacity, key_dim), dtype),
        actions=jnp.zeros((capacity,), dtype),
        values=jnp.zeros((capacity,), dtype),
        size=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
    )


def store_insert(
    store: ConfidenceStore,
    keys: jax.Array,     # [M, D]
    actions: jax.Array,  # [M]
    values: jax.Array,   # [M]
    mask: jax.Array,     # [M] bool — which rows are real
    policy: str = "ring",
) -> ConfidenceStore:
    """Masked batched append with an explicit full-store policy.

    The reference's dataset grows without bound (append-only text +
    R-tree insert, RLS.py:185-215, reloaded forever at RLS.py:34-76 —
    that unbounded persistence IS "continuous improvement").  A fixed-
    shape device store cannot grow, so the capacity contract is split:

    * **on device** — ``policy="ring"`` (default) overwrites the oldest
      evidence once full (recent data wins; statistics stay fresh);
      ``policy="reject"`` drops *new* rows once full (the frozen
      append-only prefix, matching the reference's dataset order).
      Either way ``size`` saturates at capacity, never silently grows.
    * **off device** — the full history is preserved by spooling rows
      out before they can be overwritten:
      :class:`dcarl_tpu.utils.checkpoint.StoreSpooler` appends each
      snapshot's new rows to the reference's text format, under the
      documented requirement that snapshots happen at least once per
      ``capacity`` inserts.

    ``tests/test_store_rls.py`` fills stores past capacity under both
    policies (single-device and sharded) and pins these semantics.
    """
    if policy not in ("ring", "reject"):
        raise ValueError(f"unknown store policy {policy!r}")
    capacity = store.keys.shape[0]
    keys = keys.astype(store.keys.dtype)
    actions = actions.astype(store.actions.dtype)
    values = values.astype(store.values.dtype)
    if policy == "reject":
        m0 = mask.astype(jnp.int32)
        offs0 = jnp.cumsum(m0) - m0
        mask = mask & (store.size + offs0 < capacity)
    m = mask.astype(jnp.int32)
    offsets = jnp.cumsum(m) - m  # position among the valid rows
    if keys.shape[0] > capacity:
        # One batch can lap the ring: drop all but the newest `capacity`
        # valid rows so duplicate slots (whose scatter winner is
        # unspecified) cannot occur — ring semantics stay "newest wins".
        n_valid = jnp.sum(m)
        mask = mask & (offsets >= n_valid - capacity)
        m = mask.astype(jnp.int32)
        offsets = jnp.cumsum(m) - m
    slots = (store.head + offsets) % capacity
    # invalid rows write to their own current content (no-op scatter)
    safe_slots = jnp.where(mask, slots, capacity)  # OOB drops in scatter

    keys_new = store.keys.at[safe_slots].set(keys, mode="drop")
    actions_new = store.actions.at[safe_slots].set(actions, mode="drop")
    values_new = store.values.at[safe_slots].set(values, mode="drop")
    # keep i32 under jax_enable_x64 (sum() promotes) so scan carries match
    n_added = jnp.sum(m).astype(jnp.int32)
    return ConfidenceStore(
        keys=keys_new,
        actions=actions_new,
        values=values_new,
        size=jnp.minimum(store.size + n_added, capacity).astype(jnp.int32),
        head=((store.head + n_added) % capacity).astype(jnp.int32),
    )


# Key sentinel for dense block writes: far outside any real state, so
# sentinel rows match no query box (and sort to the end of the Pallas
# band order — same value as pallas_store._PAD).
SENTINEL_KEY = 1.0e9


def store_insert_dense_block(
    store: ConfidenceStore,
    keys: jax.Array,     # [M, D] — M static, capacity % M == 0
    actions: jax.Array,  # [M]
    values: jax.Array,   # [M]
    mask: jax.Array,     # [M] bool
) -> ConfidenceStore:
    """Fixed-size block append: one contiguous DMA instead of a scatter.

    A masked ring scatter pays per-row index processing for every row
    PROCESSED; at trainer scale (tens of thousands of mostly-valid rows
    per step) the scatter dominates the write path.  This variant
    writes the whole block contiguously at ``head`` and stamps invalid
    rows with :data:`SENTINEL_KEY` keys — they occupy capacity (bounded
    by the caller's invalid fraction) but can never match a query box,
    so every moment/statistics result is identical to the masked
    scatter's.  Requires ``capacity % M == 0`` with ``head`` aligned
    (every insert through this path keeps it aligned), so the block
    never wraps mid-write."""
    capacity = store.keys.shape[0]
    m = keys.shape[0]
    if capacity % m != 0:
        raise ValueError(f"capacity {capacity} must be a multiple of the "
                         f"block size {m} for dense block writes")
    keys_w = jnp.where(mask[:, None], keys.astype(store.keys.dtype),
                       jnp.asarray(SENTINEL_KEY, store.keys.dtype))
    zero = jnp.zeros((), store.values.dtype)
    actions_w = jnp.where(mask, actions.astype(store.actions.dtype), zero)
    values_w = jnp.where(mask, values.astype(store.values.dtype), zero)
    head = store.head.astype(jnp.int32)
    z = jnp.zeros((), jnp.int32)
    return ConfidenceStore(
        keys=jax.lax.dynamic_update_slice(store.keys, keys_w, (head, z)),
        actions=jax.lax.dynamic_update_slice(store.actions, actions_w,
                                             (head,)),
        values=jax.lax.dynamic_update_slice(store.values, values_w, (head,)),
        size=jnp.minimum(store.size + m, capacity).astype(jnp.int32),
        head=((head + m) % capacity).astype(jnp.int32),
    )


class QueryStats(NamedTuple):
    count: jax.Array  # [Q] i32 visited times
    mean: jax.Array   # [Q] (-1 where count == 0)
    var: jax.Array    # [Q] (-1 where count == 0)
    sigma: jax.Array  # [Q] (-1 where count == 0)


def _raw_moments(
    keys: jax.Array, values: jax.Array, valid: jax.Array,
    queries: jax.Array, half_widths: jax.Array,
) -> jax.Array:
    """[Q, 3] partial moments (count, sum, sumsq) of values whose keys
    contain each query.  The mask-matmul core shared by the XLA path and
    the sharded reduction."""
    inside = jnp.abs(keys[None, :, :] - queries[:, None, :]) <= half_widths
    mask = (jnp.all(inside, axis=-1) & valid[None, :]).astype(values.dtype)
    feats = jnp.stack(
        [jnp.ones_like(values), values, values * values], axis=1)  # [N, 3]
    # HIGHEST: the TPU MXU's default precision truncates f32 operands
    # to bf16.  The mask is 0/1 (exact either way) but the value/value²
    # columns are not — and this function is the exactness ORACLE the
    # Pallas kernels are parity-tested against, so it must match the
    # f64 ground truth to f32 accuracy, not bf16.
    return jax.lax.dot_general(
        mask, feats, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def moments_to_stats(moments: jax.Array) -> QueryStats:
    """Finish (count, sum, sumsq) -> (count, mean, var, sigma) with the
    reference's empty-match sentinel of -1 (RLS.py:168-169)."""
    count = moments[:, 0]
    nf = jnp.maximum(count, 1.0)
    mean = moments[:, 1] / nf
    var = jnp.maximum(moments[:, 2] / nf - mean * mean, 0.0)
    empty = count == 0
    return QueryStats(
        count=count.astype(jnp.int32),
        mean=jnp.where(empty, -1.0, mean),
        var=jnp.where(empty, -1.0, var),
        sigma=jnp.where(empty, -1.0, jnp.sqrt(var)),
    )


def box_query_stats(
    store: ConfidenceStore,
    queries: jax.Array,             # [Q, D]
    half_widths: jax.Array,         # [D]
    use_pallas: Optional[bool] = None,
) -> QueryStats:
    """Visited-times + value statistics for a batch of query points
    (_calculate_visited_times / _calculate_statistics_index,
    RLS.py:161-181)."""
    capacity = store.keys.shape[0]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0).squeeze(-1)
        < store.size
    )
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from dcarl_tpu.ops.pallas_store import box_query_moments_sorted

        moments = box_query_moments_sorted(
            store.keys, store.values, valid, queries, half_widths)
    else:
        moments = _raw_moments(store.keys, store.values, valid, queries,
                               half_widths)
    return moments_to_stats(moments)


def active_region_mask(
    keys,                       # [N, D] host-side key array (numpy ok)
    half_widths,                # [D]
    region_dims,                # tuple of dim indices defining the region
    center,                     # [len(region_dims)]
    radius,                     # [len(region_dims)]
):
    """[N] bool — rows that can affect ANY query inside the operating
    region ``|q[dim] - center] <= radius`` (per region dim).

    The vehicle-life working-set contract: the FULL history lives off
    device (the C++ grid-hash :class:`~dcarl_tpu.utils.native.
    HostBoxStore`, or the spooled text history of
    :class:`~dcarl_tpu.utils.checkpoint.StoreSpooler`) and grows
    without bound (RLS.py:185-215); the device store holds only the
    rows this mask selects for the fleet's current operating region.
    A row can match a query only if ``|key_d - q_d| <= w_d``, so any
    row with ``|key_d - center_d| > radius_d + w_d`` on some region
    dim matches NO in-region query — dropping it is exact, which
    ``tests/test_store_rls.py`` pins: in-region queries against the
    cached subset equal queries against the full store, bitwise.
    Re-center (host-side, asynchronously) when the fleet approaches
    the region edge; queries stay exact as long as they remain inside
    the region the current cache was built for."""
    import numpy as np

    keys = np.asarray(keys)
    half_widths = np.asarray(half_widths)
    mask = np.ones(keys.shape[0], bool)
    for i, dim in enumerate(region_dims):
        reach = float(radius[i]) + float(half_widths[dim])
        mask &= np.abs(keys[:, dim] - float(center[i])) <= reach
    return mask
