"""Clip rectangles (piet clip extension).

The reference has no clip support at all (the north star names piet's
clips); piet-tpu implements antialiased per-item axis-aligned clip rects,
applied at draw time from command words 8-11.  The NO_CLIP default makes
the coverage multiply an exact *1.0, so unclipped scenes are unchanged
bit for bit (all pre-existing suites double as the no-clip regression).
"""

import numpy as np

from piet_tpu.config import RenderConfig
from piet_tpu.raster.cpu_fine import cpu_render_scene
from piet_tpu.renderer.capacity import fit_capacities
from piet_tpu.renderer.renderer import Renderer
from piet_tpu.scene.fixtures import make_clipped_demo
from piet_tpu.scene.scene import Scene, SceneBuilder


def _render_pair(scene, w=256, h=256):
    cfg = fit_capacities(scene, RenderConfig(width=w, height=h,
                                             tile_height=16, tile_width=16))
    img = Renderer(cfg, fine_impl="xla").render(scene)
    gold = cpu_render_scene(scene, cfg)
    return img, gold


def test_clipped_demo_device_vs_oracle():
    img, gold = _render_pair(make_clipped_demo())
    diff = np.abs(img.astype(np.int32) - gold.astype(np.int32))
    assert diff.max() <= 2, f"maxdiff {diff.max()}"


def test_clip_semantics():
    """Pixels outside the clip stay background; inside render normally."""
    b = SceneBuilder()
    b.begin_group(1)
    b.set_clip(64.0, 64.0, 128.0, 128.0)
    b.fill([(0.0, 0.0), (256.0, 0.0), (256.0, 256.0), (0.0, 256.0)],
           0xFF0000FF)
    b.end_group()
    _, gold = _render_pair(b.build())
    assert (gold[32, 32][:3] == 255).all()          # outside: white bg
    assert gold[96, 96][0] > 200 and gold[96, 96][1] < 80   # inside: red
    assert (gold[200, 200][:3] == 255).all()        # outside again


def test_clipped_opaque_fill_does_not_bail():
    """An opaque whole-tile fill WITH a clip must not trigger the solid
    bail (the clip may not cover the tile) -- checked against the oracle
    on a scene where the fill covers many tiles but the clip is small."""
    b = SceneBuilder()
    b.begin_group(2)
    b.set_clip(30.0, 30.0, 90.0, 90.0)
    b.fill([(0.0, 0.0), (256.0, 0.0), (256.0, 256.0), (0.0, 256.0)],
           0x2255AAFF)
    b.clear_clip()
    b.stroke_line((10.0, 200.0), (250.0, 210.0), 2.0, 0x000000FF)
    b.end_group()
    img, gold = _render_pair(b.build())
    diff = np.abs(img.astype(np.int32) - gold.astype(np.int32))
    assert diff.max() <= 2


def test_clips_npz_roundtrip(tmp_path):
    scene = make_clipped_demo()
    p = str(tmp_path / "s.npz")
    scene.save(p)
    back = Scene.load(p)
    np.testing.assert_array_equal(back.clips, scene.clips)
