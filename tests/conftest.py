"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and overrides
JAX_PLATFORMS, so the platform must be forced through jax.config here (before
any backend is initialized). Hardware-independent tests (sharding included)
run on xla_force_host_platform_device_count=8; real-TPU benchmarking happens
in bench.py, not the test suite.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: full-codec XLA compiles take ~1-2 min on CPU
jax.config.update("jax_compilation_cache_dir", "/root/repo/.cache/jax")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: `pytest tests/` runs the fast gate; slow-marked
    modules run when targeted explicitly, via -m, or LC3TPU_FULL_TESTS=1."""
    if config.option.markexpr or os.environ.get("LC3TPU_FULL_TESTS"):
        return
    if any(a.endswith(".py") or "::" in a for a in config.args):
        return  # a file/test was named explicitly: run exactly what was asked
    skip = pytest.mark.skip(
        reason="slow tier: run with -m slow or LC3TPU_FULL_TESTS=1")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)
