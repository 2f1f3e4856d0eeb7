"""Weak-scaling harness: env-steps/s of the lane-major rule driver at
1 device vs N devices on one mesh (BASELINE.json's "1 -> N-host scaling
efficiency" evidence).

The driver is collective-free data parallelism (shard_rule_driver), so
on real TPU meshes the expected efficiency is ~1.0 — the harness exists
to *measure* that, and on the CPU backend to verify the sharded program
produces the same results as the single-device one.

Usage:
  python examples/bench_scaling.py                 # all local devices
  python examples/bench_scaling.py --devices 8 --batch-per-device 512
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python examples/bench_scaling.py             # virtual 8-dev mesh
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def measure(n_devices: int, batch_per_device: int, steps: int,
            repeats: int = 3) -> float:
    import jax

    from dcarl_tpu.env.scenario import t_intersection
    from dcarl_tpu.parallel.mesh import make_mesh
    from dcarl_tpu.planning.fast_rollout import (make_rule_driver_fast,
                                                 shard_rule_driver)

    devices = jax.devices()[:n_devices]
    assert len(devices) == n_devices, (
        f"need {n_devices} devices, have {len(devices)}")
    mesh = make_mesh("env", devices)
    sc = t_intersection()
    init_fn, run_fn = make_rule_driver_fast(sc)
    init_s, run_s = shard_rule_driver(init_fn, run_fn, mesh, "env")

    batch = n_devices * batch_per_device
    keys = jax.random.split(jax.random.PRNGKey(0), batch)
    carry = init_s(keys)
    step_keys = jax.random.split(jax.random.PRNGKey(1), steps)
    carry, out = run_s(carry, step_keys)   # compile + warmup
    jax.block_until_ready(out[0])

    best = float("inf")
    for i in range(repeats):
        sk = jax.random.split(jax.random.PRNGKey(2 + i), steps)
        t0 = time.perf_counter()
        carry, out = run_s(carry, sk)
        jax.block_until_ready(out[0])
        best = min(best, time.perf_counter() - t0)
    return batch * steps / best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=0,
                   help="mesh size (0 = all local devices)")
    p.add_argument("--batch-per-device", type=int, default=0,
                   help="envs per device (0 = backend default)")
    p.add_argument("--steps", type=int, default=0)
    args = p.parse_args()

    import jax

    # honor JAX_PLATFORMS even when a sitecustomize pre-registered a
    # TPU backend (same pattern as tests/conftest.py)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        jax.config.update("jax_platforms", plat)

    n = args.devices or len(jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    bpd = args.batch_per_device or (32768 if on_tpu else 64)
    steps = args.steps or (300 if on_tpu else 30)

    rate_1 = measure(1, bpd, steps)
    rate_n = measure(n, bpd, steps) if n > 1 else rate_1
    eff = rate_n / (n * rate_1) if n > 1 else 1.0
    print(json.dumps({
        "metric": "weak-scaling efficiency (rule driver)",
        "devices": n,
        "batch_per_device": bpd,
        "steps_per_s_1dev": round(rate_1, 1),
        "steps_per_s_ndev": round(rate_n, 1),
        "efficiency": round(eff, 4),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
