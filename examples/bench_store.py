"""Microbenchmark: confidence-store box-query kernels on the live chip.

Compares the brute-force Pallas kernel, the sorted-band-pruned kernel,
and the XLA mask-matmul fallback across store sizes, and verifies the
kernels agree on-device.  Usage: python examples/bench_store.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dcarl_tpu.core.store import FIELD_HALF_WIDTHS, _raw_moments
from dcarl_tpu.ops.pallas_store import (box_query_moments_pallas,
                                        box_query_moments_sorted)


def timeit(fn, *args, repeats=3, inner=64):
    """The remote-tunnel launch floor is ~25 ms; perturb the queries by
    the carry so the scan body cannot be hoisted, and use enough inner
    iterations that kernel time dominates the launch."""

    @jax.jit
    def run(keys, values, valid, queries, w):
        def body(c, _):
            out = fn(keys, values, valid, queries + c, w)
            return c + jnp.sum(out) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=inner)
        return c

    run(*args).block_until_ready()
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(*args).block_until_ready()
        best = min(best, time.perf_counter() - t0)
    return best / inner


def main():
    rng = np.random.default_rng(0)
    d = len(FIELD_HALF_WIDTHS)
    w = jnp.asarray(FIELD_HALF_WIDTHS, jnp.float32)
    n_queries = 4096
    queries = jnp.asarray(rng.normal(0, 5, (n_queries, d)), jnp.float32)
    queries = queries.at[:, -1].set(
        jnp.asarray(rng.integers(0, 8, n_queries), jnp.float32))

    for n_rows in (1 << 16, 1 << 17):
        keys = jnp.asarray(rng.normal(0, 5, (n_rows, d)), jnp.float32)
        keys = keys.at[:, -1].set(
            jnp.asarray(rng.integers(0, 8, n_rows), jnp.float32))
        values = jnp.asarray(rng.normal(0, 1, n_rows), jnp.float32)
        valid = jnp.ones((n_rows,), bool)

        ref = _raw_moments(keys, values, valid, queries[:256], w)
        got = box_query_moments_sorted(keys, values, valid, queries, w)[:256]
        err = float(jnp.max(jnp.abs(ref - got)))
        assert err < 1e-2, f"sorted kernel mismatch: {err}"

        t_brute = timeit(box_query_moments_pallas, keys, values, valid,
                         queries, w)
        t_sorted = timeit(box_query_moments_sorted, keys, values, valid,
                          queries, w)
        t_xla = timeit(_raw_moments, keys, values, valid, queries, w)
        print(f"N={n_rows}: brute {n_queries/t_brute:,.0f} q/s | "
              f"sorted {n_queries/t_sorted:,.0f} q/s | "
              f"xla {n_queries/t_xla:,.0f} q/s "
              f"(speedup sorted/brute {t_brute/t_sorted:.2f}x)")

        # half-empty store: pruning should skip the invalid tail
        valid_half = jnp.arange(n_rows) < (n_rows // 8)
        t_sorted_h = timeit(box_query_moments_sorted, keys, values,
                            valid_half, queries, w)
        print(f"  1/8-full store: sorted {n_queries/t_sorted_h:,.0f} q/s")


if __name__ == "__main__":
    main()
