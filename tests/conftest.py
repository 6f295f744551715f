"""Test configuration: force CPU JAX with 8 virtual devices.

Real-TPU access in this environment goes through a tunnel with very high
device->host transfer latency, so correctness tests run on the CPU backend;
multi-chip sharding tests use 8 virtual CPU devices
(xla_force_host_platform_device_count).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
