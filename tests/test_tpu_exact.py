"""Real-TPU bit-exactness: the Pallas fine kernel vs the CPU oracle.

Mosaic's f32 mul/add are exactly rounded at every tile shape (measured,
tools/mosaic_numerics_probe.py); device sqrt/div are NOT IEEE (<= 2 ulp
off RN on ~1/3 of inputs), so the resolve paths use ieee_sqrt and the
mul/add-only polynomial sRGB encode (ops/cmd_math.py precision policy).
With those structural, the production kernel must reproduce the numpy
oracle bit-for-bit.

Skipped when no TPU is attached (CI runs on CPU; the interpreter-mode
variant with its documented FMA tolerance lives in test_fine.py).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


def _tpu_available() -> bool:
    # The attached chip may come through a plugin backend (axon) whose
    # platform registration differs between jax versions: probe the
    # default backend and the full device list, not only the "tpu"
    # backend name (round-2 post-mortem: jax.devices("tpu") returned
    # empty under one plugin registration and the whole suite silently
    # skipped while the same chip compiled fine).
    try:
        if jax.default_backend() == "tpu":
            return True
        return any(d.platform == "tpu" for d in jax.devices())
    except RuntimeError:
        return False


pytestmark = pytest.mark.skipif(not _tpu_available(),
                                reason="no TPU attached")


def _tpu_device():
    try:
        return jax.devices("tpu")[0]
    except RuntimeError:
        return next(d for d in jax.devices() if d.platform == "tpu")


def test_fine_kernel_bit_exact_on_tpu():
    from piet_tpu.config import RenderConfig
    from piet_tpu.ops.fine import fine_rasterize
    from piet_tpu.raster.cpu_fine import cpu_render_ptcl
    from piet_tpu.raster.cpu_tiler import cpu_tile_scene
    from piet_tpu.scene.svg import make_tiger

    cfg = RenderConfig(width=224, height=224, tile_height=16, tile_width=128,
                       cmd_capacity=2688)
    scene = make_tiger(scale=1.0)
    ptcl = cpu_tile_scene(scene, cfg)
    gold = cpu_render_ptcl(ptcl, cfg)
    tpu = _tpu_device()
    with jax.default_device(tpu):
        img_u32 = fine_rasterize(
            ptcl.counts.reshape(cfg.tiles_y, cfg.tiles_x), ptcl.tags,
            ptcl.args.reshape(ptcl.n_tiles, -1), tile_h=cfg.tile_height,
            tile_w=cfg.tile_width, cmd_capacity=cfg.cmd_capacity)
    img = (np.ascontiguousarray(np.asarray(img_u32)).view(np.uint8)
           .reshape(cfg.padded_height, cfg.padded_width, 4))
    img = img[:cfg.height, :cfg.width]
    solid2d = ptcl.solid.reshape(cfg.tiles_y, cfg.tiles_x)
    bail_px = np.repeat(np.repeat(solid2d != 0, cfg.tile_height, 0),
                        cfg.tile_width, 1)[:cfg.height, :cfg.width]
    np.testing.assert_array_equal(img[~bail_px], gold[~bail_px])


def test_full_renderer_bit_exact_on_tpu():
    """The production pipeline (entry-stream coarse + Pallas fine + fused
    present) end to end."""
    import numpy as np

    from piet_tpu.config import RenderConfig
    from piet_tpu.raster.cpu_fine import cpu_render_scene
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.renderer.renderer import Renderer
    from piet_tpu.scene.svg import make_tiger

    scene = make_tiger(scale=1.0)
    cfg = fit_capacities(scene, RenderConfig(
        width=224, height=224, tile_height=16, tile_width=128,
        cmd_capacity=2688), bucket=True)
    with jax.default_device(_tpu_device()):
        img = Renderer(cfg, fine_impl="pallas").render(scene)
    gold = cpu_render_scene(scene, cfg)
    np.testing.assert_array_equal(img, gold)


def test_full_renderer_bit_exact_on_tpu_32row_tiles():
    """PRODUCTION tile geometry (32x128): STRICT equality, restored.

    cmd_capacity sizes the ORACLE's per-tile lists (the entry stream has
    no per-tile capacity); 32-row tiles hold ~2x the commands, so it must
    be large enough that the oracle itself does not truncate.

    History: round 4 measured 3/262144 channel values one code off here
    and pinned an interim <=1-code contract -- the residual was the fill/
    line coverage DIVISIONS' <= 2 ulp non-IEEE device rounding.  Round 5
    removed every division from the per-pixel fine math (the per-segment
    m/K/inv_denom constants ride the wire through the deterministic
    div_det selection; ops/cmd_math.py module doc), so the device is
    bit-identical to the oracle at every tile geometry by construction
    and this test is back to assert_array_equal."""
    import numpy as np

    from piet_tpu.config import RenderConfig
    from piet_tpu.raster.cpu_fine import cpu_render_scene
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.renderer.renderer import Renderer
    from piet_tpu.scene.svg import make_tiger

    scene = make_tiger(scale=1.2)
    cfg = fit_capacities(scene, RenderConfig(
        width=256, height=256, tile_height=32, tile_width=128,
        cmd_capacity=4096), bucket=True)
    with jax.default_device(_tpu_device()):
        img = Renderer(cfg, fine_impl="pallas").render(scene)
    gold = cpu_render_scene(scene, cfg)
    np.testing.assert_array_equal(img, gold)


def test_clip_layer_scene_exact_on_tpu():
    """Arbitrary-path clips + opacity layers through the production
    entry-stream kernel on hardware (16-row tiles: bit-exact contract)."""
    import math

    import numpy as np

    from piet_tpu.config import RenderConfig
    from piet_tpu.raster.cpu_fine import cpu_render_scene
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.renderer.renderer import Renderer
    from piet_tpu.scene.scene import SceneBuilder

    b = SceneBuilder()
    star = []
    for k in range(10):
        ang = -math.pi / 2 + k * math.pi / 5
        r = 100 if k % 2 == 0 else 40
        star.append((127.5 + r * math.cos(ang), 128 + r * math.sin(ang)))
    b.clip_path(star)
    b.fill([(1, 1), (255, 1), (255, 255), (1, 255)], 0x2040C0FF)
    for i in range(8):
        b.stroke_line((1, i * 32), (256, i * 32 + 30), 3.0, 0xFF8000FF)
    b.push_layer(0.5)
    b.circle(128, 128, 60)
    b.pop()
    b.pop()
    scene = b.build()
    # FITTED capacities (production contract, Renderer.for_scene): the
    # former deliberately-loose caps (hits 1<<17 etc.) compiled a 2^18
    # bitonic sort -- 12-49 MINUTES per test on the TPU toolchain.  The
    # round-4 suite validated those loose configs once
    # (tools/onchip_r4.log); loose-capacity dead-slot logic stays covered
    # by the engine test below and the CPU suites (tests/test_coarse.py).
    cfg = fit_capacities(scene, RenderConfig(
        width=256, height=256, tile_height=16, tile_width=128,
        cmd_capacity=1024), bucket=True)
    with jax.default_device(_tpu_device()):
        img = Renderer(cfg, fine_impl="pallas").render(scene)
    gold = cpu_render_scene(scene, cfg)
    np.testing.assert_array_equal(img, gold)


def test_gradient_scene_exact_on_tpu():
    """Gradient brushes (2-stop extension) through the production
    entry-stream kernel on hardware (16-row tiles: bit-exact contract,
    incl. the word-8 payload aliasing and pairing coexistence)."""
    import numpy as np

    from piet_tpu.config import RenderConfig
    from piet_tpu.raster.cpu_fine import cpu_render_scene
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.renderer.renderer import Renderer
    from piet_tpu.scene.fixtures import make_gradient_demo

    scene = make_gradient_demo(256)
    # Fitted capacities: see test_clip_layer_scene_exact_on_tpu.
    cfg = fit_capacities(scene, RenderConfig(
        width=256, height=256, tile_height=16, tile_width=128,
        cmd_capacity=256), bucket=True)
    with jax.default_device(_tpu_device()):
        img = Renderer(cfg, fine_impl="pallas").render(scene)
    gold = cpu_render_scene(scene, cfg)
    np.testing.assert_array_equal(img, gold)


def test_engine_path_bit_identical_on_tpu():
    """Every SUPPORTED Pallas MXU engine set (the "pallas" default =
    expansion + keyed sums, incl. pairing compaction) vs the XLA path ON
    HARDWARE: the interpret-mode equality (tests/test_coarse.py)
    re-pinned where the real MXU bf16-quarter transport runs.

    The expand+gatherm combination is NOT in the supported surface: it
    deterministically corrupts a downstream XLA scatter in the same
    executable (round-4 bisect, tools/eng_bisect_probe.py /
    eng_array_probe.py -- bit-identical materialized inputs, wrong sums;
    survives synchronous DMA and input barriers).  engine_set() rejects
    it loudly (pinned below), so no silently-wrong configuration
    remains."""
    import numpy as np
    import pytest as _pytest

    from piet_tpu.config import RenderConfig
    from piet_tpu.ops.coarse import coarse_rasterize, engine_set
    from piet_tpu.renderer.renderer import prepare_scene
    from piet_tpu.scene.svg import make_tiger

    with _pytest.raises(ValueError, match="expand\\+gatherm"):
        engine_set("pallas:expand,gatherm")
    assert "gatherm" not in engine_set("pallas")[0]

    # Deliberately LOOSE caps (dead-slot logic on hardware) but sized so
    # the bitonic sort pads to 2^16, not 2^18: the old max_hits=1<<17
    # compiled a 2^18 network -- ~40 min per engine variant, the
    # round-4/5 suite's wall-clock bomb (ops/sort.py::PALLAS_SORT_MAX
    # rationale).  Live counts for this scene are ~4x smaller than these.
    cfg = RenderConfig(width=224, height=224, tile_height=16,
                       tile_width=128, cmd_capacity=2688, max_items=512,
                       max_points=1 << 15, max_segments=1 << 15,
                       max_hits=1 << 15, max_candidates=1 << 14,
                       max_deltas=1 << 15)
    scene = make_tiger(scale=1.0)
    kw = dict(tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
              tile_w=cfg.tile_width, tile_h=cfg.tile_height,
              cmd_capacity=cfg.cmd_capacity, max_segments=cfg.max_segments,
              max_hits=cfg.max_hits, max_candidates=cfg.max_candidates,
              max_deltas=cfg.max_deltas, output="entries",
              sort_impl="pallas")
    with jax.default_device(_tpu_device()):
        dev = prepare_scene(scene, cfg)
        ref = jax.jit(lambda d: coarse_rasterize(
            d, expand_impl="xla", **kw)[:-1])(dev)
        eng = jax.jit(lambda d: coarse_rasterize(
            d, expand_impl="pallas", **kw)[:-1])(dev)
    for a, b in zip(jax.tree.leaves(ref), jax.tree.leaves(eng)):
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_array_equal(
            a.view(np.uint32) if a.dtype.kind == "f" else a,
            b.view(np.uint32) if b.dtype.kind == "f" else b)
