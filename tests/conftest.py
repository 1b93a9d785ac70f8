"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count per the JAX multi-host testing
recipe.  Note: this environment pre-imports jax bound to the 'axon' TPU
tunnel, so the JAX_PLATFORMS env var is ineffective — the platform must
be forced through jax.config.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# METABULI_TEST_TPU=1 leaves the real TPU backend in place so the golden
# suites can run against the chip (bench.py's full-matrix TPU golden job,
# VERDICT r4 missing #2).  Mesh/sharding tests need the 8 virtual CPU
# devices and are not part of that job.
if os.environ.get("METABULI_TEST_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
