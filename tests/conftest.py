"""Test configuration.

Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
exercised without TPU hardware (mirrors the reference's strategy of
testing MPI/Subproc parallelism single-node — SURVEY.md §4).  Must set
the XLA flags before jax initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may pin a TPU backend
prev = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in prev:
    os.environ["XLA_FLAGS"] = (
        prev + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session may pre-register a TPU backend (sitecustomize) that wins
# over the env var; the config update reliably selects CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound on CPU, and
# repeated runs (driver, CI) hit identical HLO — cache across processes.
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/dcarl_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
except Exception:
    pass  # older jax without these flags

import pytest  # noqa: E402


def pytest_addoption(parser):
    parser.addoption(
        "--expensive", action="store_true", default=False,
        help="run expensive tests (long streams, big batches)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--expensive"):
        return
    skip = pytest.mark.skip(reason="needs --expensive option")
    for item in items:
        if "expensive" in item.keywords:
            item.add_marker(skip)
