"""General SVG loader (scene/svg_full.py -- the beyond-reference parser).

Checks run through the CPU oracle rasterizer (no jit): the loader's
output is a plain Scene, and device-vs-oracle equality is covered by the
renderer/fuzz suites; here we pin PARSING semantics -- transforms,
inheritance, opacity layers, shapes, colors, gradients.
"""

import numpy as np
import pytest

from piet_tpu.config import RenderConfig
from piet_tpu.geometry import Affine
from piet_tpu.raster.cpu_fine import cpu_render_scene
from piet_tpu.scene.svg_full import (load_svg_document, parse_color_full,
                                     parse_transform)

CFG = RenderConfig(width=128, height=128, tile_height=16, tile_width=128,
                   cmd_capacity=128)


def _render(svg: str) -> np.ndarray:
    return cpu_render_scene(load_svg_document(svg), CFG)


def test_parse_transform_composition():
    t = parse_transform("translate(10, 20) scale(2)")
    assert t.apply((1.0, 1.0)) == (12.0, 22.0)
    m = parse_transform("matrix(1 0 0 1 5 6)")
    assert m.apply((0.0, 0.0)) == (5.0, 6.0)
    r = parse_transform("rotate(90)")
    x, y = r.apply((1.0, 0.0))
    assert abs(x) < 1e-9 and abs(y - 1.0) < 1e-9
    rc = parse_transform("rotate(180, 10, 10)")
    x, y = rc.apply((0.0, 0.0))
    assert abs(x - 20.0) < 1e-9 and abs(y - 20.0) < 1e-9


def test_parse_color_forms():
    assert parse_color_full("#fff") == 0xFFFFFFFF
    assert parse_color_full("#102030") == 0x102030FF
    assert parse_color_full("rgb(255, 0, 0)") == 0xFF0000FF
    assert parse_color_full("rgb(100%, 0%, 0%)") == 0xFF0000FF
    assert parse_color_full("navy") == 0x000080FF
    assert parse_color_full("none") is None
    with pytest.raises(ValueError):
        parse_color_full("color-out-of-space")


def test_rect_fill_default_black_and_none():
    img = _render("""
      <svg viewBox="0 0 128 128">
        <rect x="8.5" y="8.5" width="40" height="40"/>
        <rect x="70.5" y="70.5" width="40" height="40" fill="none"/>
      </svg>""")
    assert (img[28, 28][:3] == [0, 0, 0]).all()        # default fill
    assert (img[90, 90][:3] == [255, 255, 255]).all()  # none skipped


def test_group_inheritance_and_transform():
    img = _render("""
      <svg viewBox="0 0 128 128">
        <g fill="#f00" transform="translate(64, 0)">
          <rect x="0.5" y="8.5" width="30" height="30"/>
        </g>
      </svg>""")
    assert (img[20, 70][:3] == [255, 0, 0]).all()      # translated + red
    assert (img[20, 20][:3] == [255, 255, 255]).all()  # origin empty


def test_style_attribute_overrides():
    img = _render("""
      <svg viewBox="0 0 128 128">
        <rect x="8.5" y="8.5" width="40" height="40" fill="#f00"
              style="fill: #0000ff"/>
      </svg>""")
    assert (img[28, 28][:3] == [0, 0, 255]).all()


def test_group_opacity_layer():
    img = _render("""
      <svg viewBox="0 0 128 128">
        <g opacity="0.5">
          <rect x="8.5" y="8.5" width="100" height="100" fill="#000"/>
        </g>
      </svg>""")
    px = img[60, 60][:3].astype(int)
    # 50% black over white in LINEAR space -> sRGB code ~188.
    assert abs(int(px[0]) - 188) <= 2 and (px == px[0]).all()


def test_circle_polygon_line_shapes():
    img = _render("""
      <svg viewBox="0 0 128 128">
        <circle cx="32" cy="32" r="20" fill="lime"/>
        <polygon points="70,70 120,70 95,120" fill="rgb(0,0,255)"/>
        <line x1="8" y1="120" x2="60" y2="120" stroke="#f00"
              stroke-width="6"/>
      </svg>""")
    assert (img[32, 32][:3] == [0, 255, 0]).all()
    assert (img[80, 95][:3] == [0, 0, 255]).all()
    assert (img[120, 30][:3] == [255, 0, 0]).all()


def test_evenodd_fill_rule():
    img = _render("""
      <svg viewBox="0 0 128 128">
        <path fill-rule="evenodd" fill="#000"
              d="M 8.5 8.5 H 119.5 V 119.5 H 8.5 Z
                 M 40.5 40.5 H 87.5 V 87.5 H 40.5 Z"/>
      </svg>""")
    assert (img[20, 20][:3] == [0, 0, 0]).all()        # outer ring filled
    assert (img[64, 64][:3] == [255, 255, 255]).all()  # hole


def test_linear_gradient_url():
    img = _render("""
      <svg viewBox="0 0 128 128">
        <defs>
          <linearGradient id="sky" x1="0" y1="0" x2="0" y2="1">
            <stop offset="0" stop-color="#000"/>
            <stop offset="1" stop-color="#fff"/>
          </linearGradient>
        </defs>
        <rect x="-1" y="-1" width="130" height="130" fill="url(#sky)"/>
      </svg>""")
    col = img[:, 64, 0].astype(int)
    # objectBoundingBox units resolve against the rect's bbox (-1..129),
    # so the visible ramp starts slightly above pure black.
    assert col[0] <= 30 and col[-1] >= 240
    assert (np.diff(col) >= 0).all()


def test_radial_gradient_url_userspace():
    img = _render("""
      <svg viewBox="0 0 128 128">
        <defs>
          <radialGradient id="dot" gradientUnits="userSpaceOnUse"
                          cx="64" cy="64" r="60">
            <stop offset="0" stop-color="#fff"/>
            <stop offset="1" stop-color="#000"/>
          </radialGradient>
        </defs>
        <rect x="-1" y="-1" width="130" height="130" fill="url(#dot)"/>
      </svg>""")
    assert img[64, 64, 0] >= 249          # center = stop 0
    assert img[64, 8, 0] < 80             # near the rim = dark
    assert img[2, 2, 0] <= img[64, 40, 0]  # radially darker outward


def test_scale_and_viewbox_origin():
    scene = load_svg_document("""
      <svg viewBox="10 10 100 100">
        <rect x="10.5" y="10.5" width="20" height="20" fill="#f00"/>
      </svg>""", target_width=200)
    img = cpu_render_scene(scene, RenderConfig(
        width=128, height=128, tile_height=16, tile_width=128,
        cmd_capacity=128))
    # viewBox origin (10,10) -> (0,0), scale 2x: rect covers ~(1..41)^2.
    assert (img[20, 20][:3] == [255, 0, 0]).all()
    assert (img[60, 60][:3] == [255, 255, 255]).all()


def test_stroke_width_scales_with_transform():
    scene = load_svg_document("""
      <svg viewBox="0 0 128 128">
        <g transform="scale(4)">
          <line x1="4" y1="8" x2="28" y2="8" stroke="#000"
                stroke-width="2"/>
        </g>
      </svg>""")
    assert float(scene.widths[0]) == pytest.approx(8.0)


def test_tiger_loads_through_full_parser():
    """The tiger renders through the general parser too (sanity: the
    document uses only the subset both parsers support -- note the
    reference-faithful parser stays the PARITY surface; colors differ
    where the tiger hits the reference's magenta-fallback quirk)."""
    from piet_tpu.scene.svg import TIGER_PATH
    from piet_tpu.scene.svg_full import load_svg_file
    scene = load_svg_file(TIGER_PATH, scale=1.0)
    assert scene.n_items > 200
    assert scene.points.shape[0] > 5000
