"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Hardware-independent tests (sharding included) run on
xla_force_host_platform_device_count=8; real-TPU benchmarking happens in
bench.py, not the test suite.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
# f64 available for table-precision checks; codec path itself is f32.
os.environ.setdefault("JAX_ENABLE_X64", "0")
