"""Multi-subpath combined fills (the hole extension: CMD_WIND +
FLAG_FILL_CONT/FLAG_FILL_FINAL).

The reference encodes one independent Fill per subpath
(src/lib.rs:342-347) and so cannot represent holes; combined fills
accumulate winding across subpaths before one resolve.  Contract: device
PTCL matches the oracle tiler command-for-command, and images match the
numpy oracle on both device paths.
"""

import numpy as np
import pytest

from piet_tpu.config import RenderConfig
from piet_tpu.raster.cpu_fine import cpu_render_scene
from piet_tpu.raster.cpu_tiler import cpu_tile_scene
from piet_tpu.raster.ptcl import CMD_WIND
from piet_tpu.renderer.renderer import Renderer
from piet_tpu.scene.scene import RadialGradient, SceneBuilder

CFG = dict(width=256, height=256, tile_height=16, tile_width=128,
           cmd_capacity=256)


def _cfg():
    return RenderConfig(**CFG)


def _rect(x0, y0, x1, y1, ccw=False):
    pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1)]
    return pts[::-1] if ccw else pts


def _donut_evenodd():
    b = SceneBuilder()
    b.fill_path([_rect(8.5, 8.5, 247.5, 247.5),
                 _rect(80.5, 80.5, 175.5, 175.5)],
                0x2040C0FF, even_odd=True, combined=True)
    return b.build()


def _donut_nonzero():
    # Hole via reversed winding direction under the nonzero rule.
    b = SceneBuilder()
    b.fill_path([_rect(8.5, 8.5, 247.5, 247.5),
                 _rect(80.5, 80.5, 175.5, 175.5, ccw=True)],
                0x2040C0FF, combined=True)
    return b.build()


def _check_scene(scene, cfg=None):
    cfg = cfg or _cfg()
    gold = cpu_render_scene(scene, cfg)
    img_x = Renderer(cfg, fine_impl="xla").render(scene)
    np.testing.assert_array_equal(img_x, gold)
    img_p = Renderer(cfg, fine_impl="pallas", interpret=True).render(scene)
    np.testing.assert_array_equal(img_p, gold)
    return gold


@pytest.mark.parametrize("make", [_donut_evenodd, _donut_nonzero],
                         ids=["evenodd", "nonzero_reversed"])
def test_donut_hole_renders(make):
    scene = make()
    img = _check_scene(scene)
    assert (img[128, 128][:3] == [255, 255, 255]).all()   # hole is empty
    assert (img[40, 128][:3] != [255, 255, 255]).any()    # ring filled
    # The oracle PTCL must actually carry winding commands.
    gold = cpu_tile_scene(scene, _cfg())
    assert (gold.tags == CMD_WIND).sum() > 0


def test_coarse_commands_match_oracle():
    from tests.test_coarse import assert_ptcl_equal, run_coarse
    for scene in (_donut_evenodd(), _donut_nonzero(), _protruding(),
                  _grad_donut()):
        cfg = RenderConfig(max_items=64, max_points=1024,
                           max_segments=1024, max_hits=1 << 13,
                           max_candidates=1 << 10, max_deltas=1 << 10,
                           **CFG)
        gold = cpu_tile_scene(scene, cfg)
        out = run_coarse(scene, cfg)
        assert_ptcl_equal(out, gold, cfg)


def _protruding():
    """A CONT sibling protruding past the final subpath's own bbox: the
    final item's UNION bbox must still resolve those tiles (else their
    winding leaks into later draws)."""
    b = SceneBuilder()
    # Final subpath is the SMALL rect; CONT sibling is the big one.
    b.fill_path([_rect(8.5, 8.5, 247.5, 247.5),
                 _rect(40.5, 40.5, 90.5, 90.5, ccw=True)][::-1],
                0x20C040FF, combined=True)
    # A later plain fill over the whole canvas must be unaffected by any
    # leaked winding.
    b.fill(_rect(100.5, 180.5, 200.5, 240.5), 0xFF0000FF)
    return b.build()


def test_protruding_cont_sibling_resolves():
    img = _check_scene(_protruding())
    # Inside big rect, outside small rect: filled (wound once by CONT).
    assert (img[220, 30][:3] != [255, 255, 255]).any()
    # Inside both: hole.
    assert (img[64, 64][:3] == [255, 255, 255]).all()
    # The later red fill renders pure red (no winding leak).
    assert (img[210, 150][:3] == [255, 0, 0]).all()


def _grad_donut():
    # Gradient brushes use nonzero winding, so the hole is a REVERSED
    # (ccw) inner subpath.
    b = SceneBuilder()
    b.fill_path([_rect(8.5, 8.5, 247.5, 247.5),
                 _rect(80.5, 80.5, 175.5, 175.5, ccw=True)],
                RadialGradient((128.0, 128.0), 160.0,
                               0xFFE000FF, 0x0030A0FF),
                combined=True)
    return b.build()


def test_gradient_donut():
    img = _check_scene(_grad_donut())
    assert (img[128, 128][:3] == [255, 255, 255]).all()   # hole
    assert (img[20, 128][:3] != [255, 255, 255]).any()    # gradient ring


def test_bail_interaction():
    """An opaque solid drawn OVER a combined fill still bails the tile
    (the WIND/Fill commands beneath are dropped by the cursor reset), and
    a combined fill drawn over an opaque solid composites correctly."""
    b = SceneBuilder()
    b.fill_path([_rect(8.5, 8.5, 247.5, 247.5),
                 _rect(80.5, 80.5, 175.5, 175.5)],
                0x2040C0FF, even_odd=True, combined=True)
    # Opaque full-cover rect on top: every interior tile bails to it.
    b.fill(_rect(-1.0, -1.0, 257.0, 257.0), 0x10FF20FF)
    img = _check_scene(b.build())
    assert (img[128, 128][:3] == [16, 255, 32]).all()
    cfg = _cfg()
    gold = cpu_tile_scene(b.build(), cfg)
    assert (gold.solid != 0).all()  # every tile bails to the solid

    b2 = SceneBuilder()
    b2.fill(_rect(-1.0, -1.0, 257.0, 257.0), 0x000000FF)
    b2.fill_path([_rect(8.5, 8.5, 247.5, 247.5),
                  _rect(80.5, 80.5, 175.5, 175.5)],
                 0xFFFFFFFF, even_odd=True, combined=True)
    img2 = _check_scene(b2.build())
    assert (img2[128, 128][:3] == [0, 0, 0]).all()        # hole shows black
    assert (img2[40, 128][:3] == [255, 255, 255]).all()   # ring white


def test_wire_codec_roundtrips_combined():
    # Round 3 gave extension items wire-format layouts (layout/modules.py);
    # combined multi-subpath fills now round-trip (full coverage in
    # tests/test_scene.py::test_group_and_gradient_items_roundtrip).
    from piet_tpu.scene.wire import decode_scene, encode_scene
    scene = _donut_evenodd()
    back = decode_scene(encode_scene(scene))
    np.testing.assert_array_equal(scene.tags, back.tags)
    np.testing.assert_array_equal(scene.points, back.points)
    np.testing.assert_array_equal(scene.flags, back.flags)


def test_single_subpath_combined_is_plain_fill():
    b = SceneBuilder()
    b.fill_path([_rect(8.5, 8.5, 100.5, 100.5)], 0x2040C0FF, combined=True)
    scene = b.build()
    assert scene.n_items == 1 and int(scene.flags[0]) == 0
