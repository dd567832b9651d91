"""Native (C++) component parity tests.

The cc/ library must agree with the Python implementations:
* scene encoding: byte-identical wire output (encoder + SVG + flattener)
* flattening: bit-identical f64 points
* golden rasterizer: pixel-identical images (both are -ffp-contract=off f32)
"""

import numpy as np
import pytest

from piet_tpu import native
from piet_tpu.config import RenderConfig
from piet_tpu.geometry import flatten_cubics_batch
from piet_tpu.raster import cpu_render_scene
from piet_tpu.scene import encode_scene, make_cardioid, make_path_test
from piet_tpu.scene.svg import TIGER_PATH, load_svg_scene

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")

TIGER_SVG = open(TIGER_PATH).read()


def test_version():
    assert b"piet-cc" in native.load().pm_version()


def test_flatten_cubics_bit_identical():
    rng = np.random.default_rng(42)
    cubics = rng.uniform(-100, 1700, (64, 4, 2))
    pts_py, counts_py = flatten_cubics_batch(cubics, 1e-3)
    pts_cc, counts_cc = native.flatten_cubics(cubics, 1e-3)
    np.testing.assert_array_equal(counts_py, counts_cc)
    np.testing.assert_array_equal(pts_py, pts_cc)


def test_tiger_scene_byte_identical():
    from piet_tpu.scene import make_tiger
    for scale in (2.56, 8.0):
        wire_cc = native.init_scene_from_svg(TIGER_SVG, scale)
        wire_py = encode_scene(make_tiger(scale=scale))
        assert wire_cc == wire_py


def test_golden_rasterizer_pixel_identical():
    cfg = RenderConfig(width=256, height=256, tile_height=16, tile_width=128,
                       cmd_capacity=512)
    wire = native.init_scene_from_svg(TIGER_SVG, 1.28)
    img_cc, overflow = native.render_golden(wire, 256, 256,
                                            tile_w=128, tile_h=16,
                                            cmd_capacity=512)
    from piet_tpu.scene import decode_scene
    img_py = cpu_render_scene(decode_scene(wire), cfg)
    np.testing.assert_array_equal(img_cc, img_py)


def test_golden_rasterizer_reference_tile_geometry():
    """16x16 tiles -- the reference's exact tiling (PietShaderTypes.h:17)."""
    cfg = RenderConfig(width=128, height=128, tile_height=16, tile_width=16,
                       cmd_capacity=256)
    scene = make_path_test()
    wire = encode_scene(scene)
    img_cc, _ = native.render_golden(wire, 128, 128, tile_w=16, tile_h=16,
                                     cmd_capacity=256)
    img_py = cpu_render_scene(scene, cfg)
    np.testing.assert_array_equal(img_cc, img_py)


def test_native_animated_frame_bit_identical():
    """The C++ per-frame fixture builder (cc/src/fixtures.cc) emits the
    exact SoA arrays of the Python builder, across frame times."""
    from piet_tpu.scene.fixtures import (make_animated_frame,
                                         make_animated_frame_native)
    for t in (0.0, 0.37, 12.25):
        a = make_animated_frame(t)
        b = make_animated_frame_native(t)
        for f in ("tags", "colors", "widths", "bboxes", "pt_offset",
                  "n_pts", "points", "flags", "clips"):
            np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                          err_msg=f"t={t} field={f}")


def test_golden_extension_scene_pixel_identical():
    """The C++ golden consumes EVERY scene the renderer accepts: extension
    items (rect clips, clipped lines via the LineExt wire variant, path
    clip groups, opacity layers, 2-stop gradients, combined multi-subpath
    fills, even-odd) round-trip through the wire format and render
    pixel-identically to the Python oracle."""
    import math

    from piet_tpu.scene import decode_scene
    from piet_tpu.scene.scene import (LinearGradient, RadialGradient,
                                      SceneBuilder)

    b = SceneBuilder()
    star = []
    for k in range(10):
        ang = -math.pi / 2 + k * math.pi / 5
        r = 100 if k % 2 == 0 else 40
        star.append((127.5 + r * math.cos(ang), 128 + r * math.sin(ang)))
    b.clip_path(star)
    b.fill([(1, 1), (255, 1), (255, 255), (1, 255)], 0x2040C0FF)
    b.push_layer(0.5)
    b.circle(128, 128, 60)
    b.pop()
    b.pop()
    b.set_clip(16.0, 16.0, 240.0, 120.0)
    b.stroke_line((1, 10), (255, 100), 5.0, 0xFF8000FF)
    b.fill([(30, 130), (220, 140), (120, 250)], 0x00AA44FF, even_odd=True)
    b.polyline([(10, 200), (80, 240), (150, 200)], 0xAA00AAFF, 3.0)
    b.circle(200, 200, 30)
    b.clear_clip()
    b.fill([(140, 10), (250, 10), (250, 90)],
           LinearGradient((140, 10), (250, 90), 0xFF0000FF, 0x0000FFFF))
    b.fill([(10, 120), (90, 120), (50, 60)],
           RadialGradient((50, 100), 40.0, 0xFFFFFFFF, 0x103060FF))
    b.fill_path([[(160, 120), (250, 120), (250, 210), (160, 210)],
                 [(180, 140), (180, 190), (230, 190), (230, 140)]],
                0x664422FF, combined=True)
    scene = b.build()

    wire = encode_scene(scene)
    scene2 = decode_scene(wire)
    for f in ("tags", "colors", "widths", "bboxes", "pt_offset", "n_pts",
              "points", "flags", "clips", "grads"):
        np.testing.assert_array_equal(getattr(scene, f), getattr(scene2, f),
                                      err_msg=f"field {f}")

    cfg = RenderConfig(width=256, height=256, tile_height=16, tile_width=128,
                       cmd_capacity=1024)
    img_cc, overflow = native.render_golden(wire, 256, 256, tile_w=128,
                                            tile_h=16, cmd_capacity=1024)
    assert overflow == 0
    img_py = cpu_render_scene(scene, cfg)
    np.testing.assert_array_equal(img_cc, img_py)
