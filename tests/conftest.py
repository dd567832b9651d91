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

if _ON_CHIP:
    # Hardware runs reuse the repo's persistent compile cache (bench.py
    # populates it): the one-jit renderer costs 450-500 s to compile cold
    # through the tunnel, and the exactness suite compiles five of them.
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))

import jax  # noqa: E402
import pytest  # noqa: E402

# The axon register (sitecustomize, runs before this file) sets the
# jax_platforms CONFIG value, which outranks the env var -- force it
# back, or the first backend lookup blocks initializing the TPU client.
if not _ON_CHIP:
    jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])


# ---------------------------------------------------------------------------
# Test tiers.  ``pytest -m smoke`` must deliver a signal in < 5 minutes on a
# CPU host (the full suite is XLA-compile-bound at ~25 min): every pure unit
# module plus ONE small pipeline config per feature.  ``pytest -m full``
# runs the complement; no marker filter runs everything.

#: Whole modules cheap enough (and unit-y enough) to always smoke.
_SMOKE_MODULES = {
    "test_layout.py", "test_scene.py", "test_geometry.py",
    "test_svg_full.py", "test_native.py", "test_sort.py", "test_keyed.py",
    "test_gatherm.py", "test_evenodd.py", "test_api.py", "test_clips.py",
    "test_fine.py",
}

#: Hand-picked pipeline representatives (one small config per feature).
_SMOKE_TESTS = (
    "test_renderer.py::test_render_matches_golden[tiger_1x]",
    "test_coarse.py::test_coarse_matches_cpu_tiler[tiger_1x_tpu_tiles]",
    "test_group_clips.py::test_nested_clips_and_layer_device_matches_oracle",
    "test_gradients.py::test_render_matches_oracle_xla",
    "test_combined_fills.py::test_coarse_commands_match_oracle",
    "test_parallel.py::test_sharded_matches_golden_cardioid",
    "test_capacity.py::test_fitted_render_matches",
    "test_pairing.py::test_pairing_preserves_command_sequence[tiger_1x-compact]",
    "test_expand.py::test_basic_expansion",
)


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        node = item.nodeid.split("/")[-1]
        if mod in _SMOKE_MODULES or node in _SMOKE_TESTS:
            item.add_marker(pytest.mark.smoke)
        else:
            item.add_marker(pytest.mark.full)
