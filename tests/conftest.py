"""Test configuration: force CPU JAX with 8 virtual devices.

The sandbox registers an `axon` PJRT plugin at interpreter start
(sitecustomize) and force-sets jax_platforms="axon,cpu", routing all JAX
dispatch through a high-latency TPU tunnel.  Correctness tests must run on
the CPU backend, so we override the platform selection *after* plugin
registration, before any backend is initialized.  Multi-chip sharding
tests use 8 virtual CPU devices (xla_force_host_platform_device_count).
"""

import os

# Weakened Merkle/FS hasher for test speed: 8 Poseidon rounds instead of
# 27 (the reference's own ZKL_POSEIDON_HASHER_ROUNDS env,
# poseidon/hasher.rs:236).  Prove and verify read the same env, so every
# roundtrip/tamper/byte-equality test is self-consistent; the in-circuit
# 27-round Poseidon AIR is unaffected.  test_poseidon keeps a
# default-rounds prove/verify roundtrip for coverage.
os.environ.setdefault("ZKL_POSEIDON_HASHER_ROUNDS", "8")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: no-op on the CPU backend by default
# (jaxlib 0.9.0's XLA:CPU executable serialization crashes on several
# of this project's programs — see utils/jitcache.py).  Re-enable on a
# healthy jaxlib with ZKL_JIT_CACHE_CPU=1 to cut repeat runs of the
# staged-prover tests from ~20 min to seconds.
from zklisp_tpu.utils import jitcache  # noqa: E402

jitcache.enable()
