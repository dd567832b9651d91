"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count=8`` per the standard JAX recipe.
Must run before jax is imported anywhere.

Note: the axon TPU plugin registers itself regardless of ``JAX_PLATFORMS``,
so we additionally pin ``jax_default_device`` to CPU after import -- tests
must be host-runnable (the driver benches on the real chip separately).
"""

import os

# Unconditional: the agent environment exports JAX_PLATFORMS=axon, and a
# setdefault would leave tests initializing the (possibly unreachable)
# TPU client.  Tests are host-only by contract -- EXCEPT under
# PIET_TESTS_TPU=1, the escape hatch for running the hardware
# bit-exactness suite (tests/test_tpu_exact.py) against an attached chip.
_ON_CHIP = os.environ.get("PIET_TESTS_TPU") == "1"
if not _ON_CHIP:
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if not _ON_CHIP and "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon register (sitecustomize, runs before this file) sets the
# jax_platforms CONFIG value, which outranks the env var -- force it
# back, or the first backend lookup blocks initializing the TPU client.
if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
