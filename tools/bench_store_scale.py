"""Vehicle-life store scale: query throughput vs row count, on TPU.

NOTE: rows here are synthetic corridor noise (almost no true matches),
which is the WORST case for the per-action deployment kernel (it has
no distance prefilter to skip work on never-matching data; on the
realistic rollout-recorded store that bench.py uses, the gated driver
is ~7x faster than these numbers).  The point of this sweep is the
SCALING LAW — cost linear in rows — and the oracle parity at every
size, both of which hold regardless of match density.

The reference store grows for a vehicle's lifetime (append-only text +
R-tree, RLS.py:185-215); its O(log N + K) tree queries degrade
gracefully, and the TPU replacement must show ITS scaling law past the
comfortable 262k rows the round-3 bench stopped at.  This sweeps the
action-grouped query kernel and the full gated deployment driver from
256k to 8M rows, asserting real-hardware parity against the XLA
reduction at every size (including the 1M+ sizes — the committed
correctness-at-scale evidence), and writes STORE_SCALE_r05.json.
The gated sweep runs at the flagship 64k-env fleet config (matching
bench.py) so its absolute numbers compose with BENCH.

Run: python tools/bench_store_scale.py            (on the bench TPU)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def corridor_store(rng, rows, d, n_actions=11):
    import numpy as np

    s = np.zeros((rows, d), np.float32)
    s[:, 0] = rng.normal(242.0, 1.0, rows)
    s[:, 1] = rng.uniform(70.0, 112.0, rows)
    s[:, 2] = rng.normal(0.0, 2.0, rows)
    s[:, 3] = rng.normal(-5.0, 3.0, rows)
    s[:, 4] = rng.normal(-1.57, 0.2, rows)
    s[:, 5:-1] = rng.normal(0.0, 8.0, (rows, d - 6))
    s[:, -1] = rng.integers(0, n_actions, rows)
    return s


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/dcarl_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from dcarl_tpu.config import DRIVING_HALF_WIDTHS, EnvConfig, \
        driving_store_config
    from dcarl_tpu.core.store import _raw_moments
    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.ops.pallas_store import box_query_moments_grouped
    from dcarl_tpu.planning.fast_rollout import make_gated_driver_fast

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu  # CPU smoke runs the kernels in interpret mode
    d, A, B = 21, 11, 16384
    sizes = ([1 << 18, 1 << 20, 1 << 21, 1 << 22, 1 << 23] if on_tpu
             else [1 << 12, 1 << 13])
    gated_sizes = ([1 << 18, 1 << 20, 1 << 22] if on_tpu else [1 << 12])
    if not on_tpu:
        B = 256

    rng = np.random.default_rng(0)
    hw = jnp.asarray(DRIVING_HALF_WIDTHS, jnp.float32)
    obs = corridor_store(rng, B, d)[:, :-1]
    qg = jnp.asarray(np.concatenate([
        np.broadcast_to(obs[None], (A, B, d - 1)),
        np.broadcast_to(np.arange(A, dtype=np.float32)[:, None, None],
                        (A, B, 1))], axis=-1))

    results = {"backend": jax.default_backend(), "kernel": [], "gated": []}

    for rows in sizes:
        s_np = corridor_store(rng, rows, d)
        skeys = jnp.asarray(s_np)
        vals = jnp.asarray(rng.normal(1.5, 0.5, rows), jnp.float32)
        valid = jnp.ones((rows,), bool)

        # correctness at scale: hardware kernel vs XLA reduction on a
        # query slice (every size, incl. the multi-million-row ones);
        # the reduction runs in row chunks to bound its [Q, N] mask
        flat_q = qg[:, :4].reshape(-1, d)
        ref = np.zeros((flat_q.shape[0], 3), np.float32)
        cs = 1 << 16   # bounds the oracle's [Q, chunk, D] broadcast
        raw_j = jax.jit(_raw_moments)
        for c0 in range(0, rows, cs):
            c1 = min(c0 + cs, rows)
            ref += np.asarray(raw_j(
                skeys[c0:c1], vals[c0:c1], valid[c0:c1], flat_q, hw))
        got = np.asarray(box_query_moments_grouped(
            skeys, vals, valid, qg[:, :4], hw, interpret=interp))
        np.testing.assert_allclose(got, ref.reshape(A, 4, 3),
                                   rtol=1e-4, atol=1e-3)

        f = jax.jit(lambda k, v, m, q, w: jnp.sum(
            box_query_moments_grouped(k, v, m, q, w, interpret=interp)))
        f(skeys, vals, valid, qg, hw).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            f(skeys, vals, valid, qg, hw).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        results["kernel"].append({
            "rows": rows,
            "queries": A * B,
            "ms": round(best * 1e3, 2),
            "queries_per_s": round(A * B / best, 1),
            "parity_checked": True,
        })
        print(f"kernel rows={rows:>8}: {best * 1e3:8.2f} ms "
              f"({A * B / best / 1e6:.2f} M queries/s)", flush=True)
        del skeys, vals

    # full gated deployment driver vs store size
    scfg = driving_store_config()
    env_cfg = EnvConfig()
    sc = t_intersection(env_cfg)
    init_fn, run_fn = make_gated_driver_fast(sc, env_cfg, store_cfg=scfg,
                                             use_pallas=on_tpu)
    # flagship fleet config (bench.py's gated 64k envs) so the sweep's
    # absolute numbers are directly comparable to BENCH's gated rate
    g_batch, g_steps = (65536, 20) if on_tpu else (64, 5)
    keys = jax.random.split(jax.random.PRNGKey(0), g_batch)
    for rows in gated_sizes:
        s_np = corridor_store(rng, rows, d)
        skeys = jnp.asarray(s_np)
        vals = jnp.asarray(rng.normal(1.5, 0.5, rows), jnp.float32)
        valid = jnp.ones((rows,), bool)
        carry = init_fn(keys)
        sk = jax.random.split(jax.random.PRNGKey(1), g_steps)
        carry, out = run_fn(carry, sk, skeys, vals, valid)
        jax.block_until_ready(out[0])
        best = float("inf")
        for i in range(3):
            sk = jax.random.split(jax.random.PRNGKey(2 + i), g_steps)
            t0 = time.perf_counter()
            carry, out = run_fn(carry, sk, skeys, vals, valid)
            jax.block_until_ready(out[0])
            best = min(best, time.perf_counter() - t0)
        rate = g_batch * g_steps / best
        results["gated"].append({
            "rows": rows,
            "envs": g_batch,
            "env_steps_per_s": round(rate, 1),
        })
        print(f"gated  rows={rows:>8}: {rate / 1e3:8.1f} k env-steps/s "
              f"at {g_batch} envs", flush=True)
        del skeys, vals

    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "STORE_SCALE_r05.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
