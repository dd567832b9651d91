"""Test configuration: run JAX on CPU with a virtual 8-device mesh.

Multi-chip hardware is not available in CI; sharding tests use
``xla_force_host_platform_device_count=8`` per the standard JAX recipe.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
