"""Vehicle-life working set: an unbounded host history served through a
bounded device cache with asynchronous re-centering.

The reference's deployment store grows for the vehicle's whole life
(append-only text + R-tree, deepq/RLS.py:185-215, reloaded forever at
:34-76) while serving every decision tick.  A device store cannot do
both: round 4 measured the gated fleet collapsing 522k -> 35k
env-steps/s when the device store grew 262k -> 4M rows
(STORE_SCALE_r04.json).  The answer, closed here end-to-end:

* the FULL history lives host-side (numpy arrays + the spooled
  reference text format), unbounded;
* the device carries only the rows that can affect queries in the
  fleet's current operating region
  (:func:`dcarl_tpu.core.store.active_region_mask` — exact: a dropped
  row can match NO in-region query), compacted to a fixed cache shape;
* as the fleet drifts along its route the host re-centers the region
  ASYNCHRONOUSLY — the next cache is masked/gathered/uploaded on a
  worker thread while the device drives the current chunk — and the
  loop swaps caches at a chunk boundary.

Frame model: the driving scenario is translation-invariant, so a fleet
operating at world position X runs the ONE compiled local-frame driver
while its store queries address the world-frame history at
``local_obs + offset(X)`` (the gated driver's ``with_query_offset``
input).  The history spans many world positions (the life's route);
``offset`` drifts continuously; x-coordinate dims {0, 5, 10, 15} of
the 20-D observation carry the shift.

Exactness contract, asserted at checkpoints DURING the run (see
:func:`run_vehicle_life`):

1. match COUNTS from the full history, the region-masked history, and
   the compacted serving cache are bit-identical on device (integer
   counts are exact under any f32 summation order) — no in-region
   evidence is ever lost by masking or compaction;
2. an f64 host oracle over the full history equals the same oracle
   over the region rows bitwise — the value statistics are identical
   in exact arithmetic;
3. device f32 moments of all three agree to reduction-order tolerance
   (<= 1e-5 relative), and the full-vs-masked same-shape comparison is
   additionally recorded (and in practice holds) BITWISE — excluded
   rows contribute exact zeros in identical positions.
"""

from __future__ import annotations

import threading
import time
from typing import Dict, List, Optional, Tuple

import numpy as np

# observation dims that carry the world-frame x shift:
# [ego, walker, obj1, obj2] blocks of [x, y, vx, vy, yaw]
X_DIMS = (0, 5, 10, 15)


def offset_vector(dx: float, state_dim: int = 20) -> np.ndarray:
    """[state_dim] query-offset vector for a world-frame shift of dx."""
    off = np.zeros(state_dim, np.float32)
    for d in X_DIMS:
        off[d] = np.float32(dx)
    return off


def shift_keys(keys: np.ndarray, dx: float) -> np.ndarray:
    """World-frame copy of local-frame [N, D] store keys (action column
    last, untouched)."""
    out = keys.astype(np.float32).copy()
    for d in X_DIMS:
        out[:, d] = (out[:, d].astype(np.float64) + dx).astype(np.float32)
    return out


# ---------------------------------------------------------------------------
# History: collect once in the local frame, lay out along the route
# ---------------------------------------------------------------------------


def collect_local_records(n_envs: int, n_steps: int, seed: int = 7,
                          env_cfg=None, max_rows: Optional[int] = None
                          ) -> Tuple[np.ndarray, np.ndarray]:
    """Real collection-stack records in the local frame: run the
    lane-major value collector (the dqn_value_collect.py loop) and keep
    the {recorded_state, used_action, episode_return} row of every
    completed triggered episode — exactly the reference's collected
    dataset semantics (dqn_value_collect.py:128-145).

    Returns (keys [K, 21], values [K]).
    """
    import jax
    import jax.numpy as jnp

    from dcarl_tpu.config import EnvConfig
    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.planning.fast_rollout import make_collector_fast

    env_cfg = env_cfg or EnvConfig()
    sc = t_intersection(env_cfg)
    init_fn, run_fn = make_collector_fast(sc, env_cfg)
    keys = jax.random.split(jax.random.PRNGKey(seed), n_envs)
    carry = init_fn(keys)
    sk = jax.random.split(jax.random.PRNGKey(seed + 1), n_steps)
    _, recs = run_fn(carry, sk)

    @jax.jit
    def extract(recs):
        done = recs.done.reshape(-1)
        # a triggered episode locked a real state (ego y < trigger_y)
        states = recs.recorded_state.transpose(0, 2, 1).reshape(
            -1, recs.recorded_state.shape[1])
        triggered = states[:, 1] != 0.0
        ok = done & triggered
        k = jnp.concatenate(
            [states, recs.used_action.reshape(-1, 1).astype(states.dtype)],
            axis=1)
        v = recs.episode_return.reshape(-1)
        return ok, k, v

    ok, k, v = extract(recs)
    ok = np.asarray(ok)
    k = np.asarray(k)[ok]
    v = np.asarray(v)[ok]
    if max_rows is not None:
        k, v = k[:max_rows], v[:max_rows]
    return k.astype(np.float32), v.astype(np.float32)


def build_life_history(local_keys: np.ndarray, local_values: np.ndarray,
                       offsets: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
    """World-frame history: the local dataset laid out at every route
    position (translation invariance makes each shifted copy exactly
    what a fleet operating there records).  Returns
    (keys [K*M, 21], values [K*M]) in route order."""
    ks, vs = [], []
    for dx in offsets:
        ks.append(shift_keys(local_keys, float(dx)))
        vs.append(local_values)
    return np.concatenate(ks), np.concatenate(vs)


# ---------------------------------------------------------------------------
# Region cache + async re-centering
# ---------------------------------------------------------------------------


class RegionCache:
    """A fixed-capacity device cache of the history rows reachable from
    queries inside |q_x - center| <= radius (exact: active_region_mask
    on the ego-x dim)."""

    def __init__(self, history_keys: np.ndarray, history_values: np.ndarray,
                 half_widths: np.ndarray, capacity: int):
        self.hk = history_keys
        self.hv = history_values
        self.w = np.asarray(half_widths, np.float32)
        self.capacity = capacity

    def region_mask(self, center: float, radius: float) -> np.ndarray:
        from dcarl_tpu.core.store import active_region_mask

        return active_region_mask(self.hk, self.w, (0,), (center,),
                                  (radius,))

    def build(self, center: float, radius: float):
        """(keys [C, D], values [C], valid [C], n_rows, mask_idx) —
        numpy, ready for device_put.  Raises if the region outgrows the
        cache (the radius/capacity contract)."""
        mask = self.region_mask(center, radius)
        idx = np.nonzero(mask)[0]
        n = len(idx)
        if n > self.capacity:
            raise ValueError(
                f"region at center {center} holds {n} rows > cache "
                f"capacity {self.capacity}; shrink the radius or grow "
                "the cache")
        d = self.hk.shape[1]
        keys = np.full((self.capacity, d), 1.0e9, np.float32)
        vals = np.zeros((self.capacity,), np.float32)
        keys[:n] = self.hk[idx]
        vals[:n] = self.hv[idx]
        valid = np.zeros((self.capacity,), bool)
        valid[:n] = True
        return keys, vals, valid, n, idx


class AsyncRecenter:
    """One worker thread preparing the next cache while the device
    drives the current chunk.  ``request`` is non-blocking; ``ready``
    returns the freshly uploaded device arrays when done."""

    def __init__(self, cache: RegionCache, device_put):
        self.cache = cache
        self.device_put = device_put
        self._lock = threading.Lock()
        self._result = None
        self._busy = False
        self._prep_seconds = 0.0

    def request(self, center: float, radius: float) -> bool:
        with self._lock:
            if self._busy:
                return False
            self._busy = True
        t = threading.Thread(target=self._work, args=(center, radius),
                             daemon=True)
        t.start()
        return True

    def _work(self, center, radius):
        t0 = time.perf_counter()
        keys, vals, valid, n, _ = self.cache.build(center, radius)
        dev = self.device_put(keys, vals, valid)
        dt = time.perf_counter() - t0
        with self._lock:
            self._result = (dev, n, center, dt)
            self._busy = False
            self._prep_seconds += dt

    def ready(self):
        with self._lock:
            r, self._result = self._result, None
            return r


# ---------------------------------------------------------------------------
# The life run
# ---------------------------------------------------------------------------


def _f64_oracle(keys: np.ndarray, values: np.ndarray, queries: np.ndarray,
                w: np.ndarray, num_actions: int) -> np.ndarray:
    """[Q, A, 3] f64 moments over rows in ORIGINAL order — exact
    arithmetic reference (deterministic: same row set + order -> same
    bits).  Prunes per query by exact dim-0 containment (pure algebra,
    independent of the region machinery under test)."""
    out = np.zeros((len(queries), num_actions, 3), np.float64)
    k0 = keys[:, 0]
    for qi, q in enumerate(queries):
        cand = np.nonzero(np.abs(k0 - q[0]) <= w[0])[0]
        if len(cand) == 0:
            continue
        kk = keys[cand]
        inside = np.all(np.abs(kk[:, :-1] - q[None, :]) <= w[None, :-1],
                        axis=1)
        rows = cand[inside]
        for a in range(num_actions):
            m = np.abs(keys[rows, -1] - a) <= w[-1]
            v = values[rows][m].astype(np.float64)
            out[qi, a] = [len(v), v.sum(), (v * v).sum()]
    return out


def run_vehicle_life(
    n_envs: int = 65536,
    chunk_steps: int = 50,
    n_chunks: int = 120,
    local_rows: int = 30000,
    n_offsets: int = 150,
    offset_spacing: float = 8.0,
    cache_capacity: int = 1 << 18,
    region_radius: float = 25.0,
    recenter_margin: float = 10.0,
    drift_per_chunk: float = 2.0,
    checkpoints: int = 3,
    checkpoint_queries: int = 256,
    collect_envs: int = 4096,
    collect_steps: int = 2048,
    use_pallas: Optional[bool] = None,
    seed: int = 0,
    history: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    spool_dir: Optional[str] = None,
    store_cfg=None,
) -> Dict:
    """Drive the gated fleet for a vehicle-life segment: the history
    (``local_rows * n_offsets`` world-frame rows) lives host-side, the
    device serves from a region cache, the offset drifts
    ``drift_per_chunk`` per chunk, and the host re-centers
    asynchronously.  Returns the artifact dict (WORKINGSET_r05.json)."""
    import jax
    import jax.numpy as jnp

    from dcarl_tpu.config import EnvConfig, driving_store_config
    from dcarl_tpu.env import driving_env as de
    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.planning import fast_rollout as FR

    env_cfg = EnvConfig()
    # The history stores WHOLE-EPISODE returns (the collection stack's
    # value semantics), so the gate constants must live on the
    # episode-return scale: rule-near-optimal means its episodes
    # average near the max achievable return, not near the max
    # per-step reward.  value_mode='episode' with W ~ episode length
    # rescales exactly that way.
    scfg = store_cfg or driving_store_config(
        value_mode="episode", gamma=1.0, n_step_window=250)
    w = np.asarray(scfg.half_widths, np.float32)
    num_actions = env_cfg.action_dim

    # --- history: collect once locally, lay out along the route
    if history is None:
        lk, lv = collect_local_records(collect_envs, collect_steps,
                                       seed=seed + 7, env_cfg=env_cfg,
                                       max_rows=local_rows)
    else:
        lk, lv = history
    offsets = np.arange(n_offsets, dtype=np.float64) * offset_spacing
    hk, hv = build_life_history(lk, lv, offsets)
    n_hist = len(hk)

    if spool_dir is not None:
        # the unbounded append-only persistence of the reference
        # (RLS.py:185-215): the whole life history in text form
        from dcarl_tpu.utils.checkpoint import StoreSpooler
        import os

        os.makedirs(spool_dir, exist_ok=True)
        sp = StoreSpooler(os.path.join(spool_dir, "visited_state.txt"),
                          os.path.join(spool_dir, "visited_value.txt"))
        from dcarl_tpu.core.store import ConfidenceStore

        sp.spool(ConfidenceStore(keys=hk, actions=hk[:, -1], values=hv,
                                 size=np.int32(n_hist),
                                 head=np.int32(0)), n_inserted=n_hist)

    # --- driver (ONE compiled program for the whole life)
    sc = t_intersection(env_cfg)
    init_fn, run_fn = FR.make_gated_driver_fast(
        sc, env_cfg, store_cfg=scfg, use_pallas=use_pallas,
        with_query_offset=True)
    in_idx = de.in_state_indices(sc)

    @jax.jit
    def obs_of(carry):
        return FR._obs_ori_soa(carry, in_idx)

    @jax.jit
    def act_frac(gate):
        # on-device reduction: downloading the full [S, B] gate array
        # every chunk costs more tunnel time than the chunk's compute
        return jnp.mean((gate != 0).astype(jnp.float32))

    def device_put3(keys, vals, valid):
        return (jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(valid))

    cache = RegionCache(hk, hv, w, cache_capacity)
    recenter = AsyncRecenter(cache, device_put3)

    # local ego-x span -> region center tracks offset + mid-span
    x_mid = float(np.median(lk[:, 0]))
    center = 0.0 + x_mid
    keys0, vals0, valid0, cache_rows, _ = cache.build(center, region_radius)
    dev_keys, dev_vals, dev_valid = device_put3(keys0, vals0, valid0)
    # full history on device ONCE, for checkpoint audits only (the
    # serving path never touches it)
    full_keys_dev = None
    full_vals_dev = None

    keys = jax.random.split(jax.random.PRNGKey(seed), n_envs)
    carry = init_fn(keys)

    # warmup compile (excluded from the sustained-rate clock)
    off0 = jnp.asarray(offset_vector(0.0, env_cfg.state_dim))
    sk = jax.random.split(jax.random.PRNGKey(seed + 1), chunk_steps)
    carry_w, out_w = run_fn(carry, sk, dev_keys, dev_vals, dev_valid, off0)
    jax.block_until_ready(out_w[0])

    ckpt_every = max(1, n_chunks // max(checkpoints, 1))
    ckpt_results: List[Dict] = []
    timeline = []
    recenters = 0
    pending = False
    offset_now = 0.0

    # all step keys up front: per-chunk PRNG calls would each pay the
    # host->device dispatch latency
    all_sk = jax.random.split(jax.random.PRNGKey(seed + 2),
                              n_chunks * chunk_steps
                              ).reshape(n_chunks, chunk_steps, 2)
    jax.block_until_ready(all_sk)

    t_run0 = time.perf_counter()
    for ci in range(n_chunks):
        off = jnp.asarray(offset_vector(offset_now, env_cfg.state_dim))
        sk = all_sk[ci]
        carry, out = run_fn(carry, sk, dev_keys, dev_vals, dev_valid, off)
        # block on ONE scalar (the recenter thread overlaps the device
        # execution window; a full gate download would swamp the
        # host link)
        frac = float(act_frac(out[5]))
        timeline.append({
            "chunk": ci,
            "offset": offset_now,
            "cache_rows": int(cache_rows),
            "activation_fraction": frac,
        })

        # swap in a finished re-center
        r = recenter.ready()
        if r is not None:
            (dev_keys, dev_vals, dev_valid), cache_rows, center, _ = r
            recenters += 1
            pending = False

        # drift; request a re-center before the fleet reaches the edge
        offset_now += drift_per_chunk
        fleet_center = offset_now + x_mid
        if not pending and abs(fleet_center - center) > recenter_margin:
            pending = recenter.request(fleet_center, region_radius)

        if (ci + 1) % ckpt_every == 0 and len(ckpt_results) < checkpoints:
            if full_keys_dev is None:
                full_keys_dev = jnp.asarray(hk)
                full_vals_dev = jnp.asarray(hv)
            ckpt_results.append(_checkpoint(
                hk, hv, full_keys_dev, full_vals_dev, w, num_actions,
                obs_of(carry), offset_now, dev_keys, dev_vals, dev_valid,
                center, region_radius, cache, checkpoint_queries,
                use_pallas))
    t_run = time.perf_counter() - t_run0

    steps_total = n_chunks * chunk_steps * n_envs
    # checkpoint verification is instrumentation, not serving
    t_ckpt = sum(c["seconds"] for c in ckpt_results)
    sustained = steps_total / (t_run - t_ckpt)

    return {
        "history_rows": int(n_hist),
        "local_rows": int(len(lk)),
        "n_offsets": int(n_offsets),
        "offset_spacing": offset_spacing,
        "route_length_m": float(offsets[-1]),
        "cache_capacity": int(cache_capacity),
        "region_radius": region_radius,
        "n_envs": n_envs,
        "chunk_steps": chunk_steps,
        "n_chunks": n_chunks,
        "env_steps_total": int(steps_total),
        "wall_seconds": t_run,
        "checkpoint_seconds": t_ckpt,
        "sustained_env_steps_per_s": sustained,
        "recenters": recenters,
        "recenter_prep_seconds_total": recenter._prep_seconds,
        "activation_fraction_mean": float(np.mean(
            [t["activation_fraction"] for t in timeline])),
        "checkpoints": ckpt_results,
        "timeline": timeline,
    }


def _checkpoint(hk, hv, full_keys, full_vals, w, num_actions, obs,
                offset_now, dev_keys, dev_vals, dev_valid, center, radius,
                cache: RegionCache, n_queries: int, use_pallas) -> Dict:
    """The exactness audit (docstring contract items 1-3) against the
    LIVE fleet's current query batch."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    obs = np.asarray(obs)                                  # [20, B]
    q_local = obs.T[: n_queries // 2].astype(np.float32)
    q_world = q_local + offset_vector(offset_now, obs.shape[0])[None, :]
    # only in-region queries are covered by the exactness contract;
    # the margin logic must have kept the fleet inside
    in_region = np.abs(q_world[:, 0] - center) <= radius
    assert in_region.all(), (
        f"fleet escaped the region before re-centering: "
        f"|{q_world[:, 0].min()}..{q_world[:, 0].max()} - {center}| vs "
        f"{radius} — shrink drift_per_chunk or recenter_margin")
    # ...plus probes AT in-region evidence rows: the live fleet only
    # crosses the recorded trigger band a few steps per episode, so
    # fleet queries alone can legitimately match nothing at a given
    # instant; row-centered probes guarantee every audit also exercises
    # real multi-row aggregation.
    mask_probe = cache.region_mask(center, radius)
    rows_in = np.nonzero(mask_probe)[0]
    if len(rows_in):
        take = rows_in[:: max(1, len(rows_in) // max(n_queries // 2, 1))]
        take = take[: n_queries // 2]
        probes = hk[take, :-1].astype(np.float32)
        guard = np.abs(probes[:, 0] - center) <= radius
        q_world = np.concatenate([q_world, probes[guard]])

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    def device_moments(keys, vals, valid):
        if use_pallas:
            from dcarl_tpu.ops.pallas_store import box_query_moments_peraction

            return np.asarray(box_query_moments_peraction(
                keys, vals, valid, jnp.asarray(q_world),
                jnp.asarray(w), num_actions=num_actions))
        from dcarl_tpu.core.rls import candidate_keys
        from dcarl_tpu.core.store import _raw_moments

        qk = candidate_keys(jnp.asarray(q_world), num_actions)
        return np.asarray(_raw_moments(
            keys, vals, valid, qk.reshape(-1, qk.shape[-1]),
            jnp.asarray(w))).reshape(len(q_world), num_actions, 3)

    # X: the full history (device-resident for audits only)
    x = device_moments(full_keys, full_vals,
                       jnp.ones((len(hk),), bool))
    # Y: same shape, region rows valid only — mask exactness on device
    mask = cache.region_mask(center, radius)
    y = device_moments(full_keys, full_vals, jnp.asarray(mask))
    # Z: the compacted serving cache (exactly what served the fleet)
    z = device_moments(dev_keys, dev_vals, dev_valid)

    counts_xy = bool((x[:, :, 0] == y[:, :, 0]).all())
    counts_xz = bool((x[:, :, 0] == z[:, :, 0]).all())
    bitwise_xy = bool((x == y).all())
    rel = lambda a, b: float(np.max(np.abs(a - b)
                                    / np.maximum(np.abs(b), 1.0)))
    # exact-arithmetic oracle: full rows vs region rows, f64, original
    # row order -> identical bits iff the region mask loses nothing
    o_full = _f64_oracle(hk, hv, q_world, w, num_actions)
    o_region = _f64_oracle(hk[mask], hv[mask], q_world, w, num_actions)
    f64_bitwise = bool((o_full == o_region).all())

    res = {
        "offset": offset_now,
        "n_queries": int(len(q_world)),
        "matched_counts_total": int(x[:, :, 0].sum()),
        "counts_exact_full_vs_masked": counts_xy,
        "counts_exact_full_vs_cache": counts_xz,
        "device_bitwise_full_vs_masked": bitwise_xy,
        "f64_oracle_bitwise_full_vs_region": f64_bitwise,
        "max_rel_moment_diff_cache_vs_full": rel(z, x),
        "max_rel_moment_diff_device_vs_f64": rel(
            x.astype(np.float64), o_full),
        "seconds": 0.0,
    }
    assert counts_xy and counts_xz, res
    assert f64_bitwise, res
    assert res["max_rel_moment_diff_cache_vs_full"] < 1e-5, res
    res["seconds"] = time.perf_counter() - t0
    return res
