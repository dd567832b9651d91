"""Viewport resize without recompile (renderer/resize.py).

The reference treats resize as a runtime event that reuses compiled
pipelines (TestApp/PietRenderer.m:105-146); ResizableRenderer must (a)
render multiple viewports from ONE compiled executable and (b) produce
pixels bit-identical to a dedicated per-viewport Renderer.
"""

import numpy as np
import pytest

from piet_tpu.config import RenderConfig
from piet_tpu.renderer.renderer import Renderer
from piet_tpu.renderer.resize import ResizableRenderer
from piet_tpu.scene.svg import make_tiger


@pytest.fixture(scope="module")
def tiger():
    return make_tiger(scale=1.0)


CAPS = dict(max_items=512, max_points=1 << 15, max_segments=1 << 15,
            max_hits=1 << 17, max_candidates=1 << 14, max_deltas=1 << 15,
            cmd_capacity=2688)


def test_resize_zero_recompiles_and_exact(tiger):
    rr = ResizableRenderer(
        RenderConfig(width=384, height=384, tile_height=16, tile_width=128,
                     **CAPS),
        fine_impl="xla")
    img_a = rr.render(tiger, 256, 224)
    assert rr.n_compiles() == 1
    img_b = rr.render(tiger, 384, 384)
    assert rr.n_compiles() == 1, "resize must not recompile"
    img_c = rr.render(tiger, 128, 320)
    assert rr.n_compiles() == 1, "resize must not recompile"

    # Bit-identical to dedicated per-viewport renderers.
    for img, (w, h) in ((img_a, (256, 224)), (img_b, (384, 384)),
                        (img_c, (128, 320))):
        assert img.shape == (h, w, 4)
        ded = Renderer(
            RenderConfig(width=w, height=h, tile_height=16, tile_width=128,
                         **CAPS),
            fine_impl="xla").render(tiger)
        np.testing.assert_array_equal(img, ded)


def test_resize_bounds(tiger):
    rr = ResizableRenderer(
        RenderConfig(width=256, height=256, tile_height=16, tile_width=128,
                     **CAPS),
        fine_impl="xla")
    with pytest.raises(ValueError):
        rr.render(tiger, 4096, 64)
    with pytest.raises(ValueError):
        rr.render(tiger, 0, 64)


def test_for_scene_fits(tiger):
    rr = ResizableRenderer.for_scene(tiger, 256, 256, fine_impl="xla",
                                     tile_height=16, tile_width=128)
    img = rr.render(tiger, 200, 200)
    assert img.shape == (200, 200, 4)
