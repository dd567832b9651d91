"""Even-odd fill rule (piet FillRule::EvenOdd extension).

The reference renders nonzero winding only and carries even-odd as a
comment formula (PietRender.metal:543); piet-tpu implements both rules
end to end.  Checks: device vs CPU oracle agreement, and the semantic
difference itself (self-intersecting star: nonzero is solid, even-odd has
a hollow center).
"""

import numpy as np

from piet_tpu.config import RenderConfig
from piet_tpu.raster.cpu_fine import cpu_render_scene
from piet_tpu.renderer.capacity import fit_capacities
from piet_tpu.renderer.renderer import Renderer
from piet_tpu.scene.fixtures import make_star_evenodd
from piet_tpu.scene.scene import FLAG_EVEN_ODD
from piet_tpu.scene.svg import load_svg_scene


def test_star_device_vs_oracle():
    scene = make_star_evenodd()
    assert scene.flags.tolist() == [0, FLAG_EVEN_ODD]
    cfg = fit_capacities(scene, RenderConfig(width=256, height=256,
                                             tile_height=16, tile_width=16))
    img = Renderer(cfg, fine_impl="xla").render(scene)
    gold = cpu_render_scene(scene, cfg)
    diff = np.abs(img.astype(np.int32) - gold.astype(np.int32))
    assert diff.max() <= 2

    # Semantics: star centers -- nonzero solid, even-odd hollow (white).
    nz_center = gold[128, 72]     # first star, cx = 0.28 * 256
    eo_center = gold[128, 184]    # second star, cx = 0.72 * 256
    assert nz_center[0] > 150 and nz_center[2] < 100   # red-ish fill
    assert (eo_center[:3] > 240).all()                 # hollow: background


def test_svg_fill_rule_attribute():
    svg = """<svg><g>
      <path d="M 50 10 L 90 90 L 10 40 L 90 40 L 10 90 Z"
            fill="#08c" fill-rule="evenodd"/>
      <path d="M 50 10 L 90 90 L 10 40 L 90 40 L 10 90 Z" fill="#c80"/>
    </g></svg>"""
    scene = load_svg_scene(svg)
    assert scene.flags[0] == FLAG_EVEN_ODD
    assert scene.flags[1] == 0


def test_flags_npz_roundtrip(tmp_path):
    from piet_tpu.scene.scene import Scene
    scene = make_star_evenodd()
    p = str(tmp_path / "s.npz")
    scene.save(p)
    back = Scene.load(p)
    np.testing.assert_array_equal(back.flags, scene.flags)
