"""Capacity fitting: host-side record counts must match the device's
diagnostics exactly (same f32 count arithmetic as ops/coarse.py)."""

import numpy as np
import pytest

from piet_tpu.config import RenderConfig
from piet_tpu.ops.coarse import coarse_rasterize
from piet_tpu.renderer.capacity import count_records, fit_capacities
from piet_tpu.renderer.renderer import Renderer, prepare_scene
from piet_tpu.scene.fixtures import (make_cardioid, make_circles_rects,
                                     make_path_test)
from piet_tpu.scene.svg import make_tiger

SCENES = [
    ("path_test", make_path_test, (320, 832)),
    ("cardioid", lambda: make_cardioid(center=(256.0, 256.0), r=200.0),
     (512, 512)),
    ("circles_rects", lambda: make_circles_rects(80, 80, size=512),
     (512, 512)),
    ("tiger_1x", lambda: make_tiger(scale=1.0), (224, 224)),
]


@pytest.mark.parametrize("name,make,wh", SCENES, ids=[s[0] for s in SCENES])
def test_counts_match_device_diag(name, make, wh):
    scene = make()
    base = RenderConfig(width=wh[0], height=wh[1], tile_height=16,
                        tile_width=16, cmd_capacity=768,
                        max_items=1 << 10, max_points=1 << 15,
                        max_segments=1 << 15, max_hits=1 << 18,
                        max_candidates=1 << 15, max_deltas=1 << 14)
    n_segs, n_hits, n_cand, n_deltas, cmds_ub = count_records(scene, base)
    dev = prepare_scene(scene, base)
    out = coarse_rasterize(
        dev, tiles_x=base.tiles_x, tiles_y=base.tiles_y,
        tile_w=base.tile_width, tile_h=base.tile_height,
        cmd_capacity=base.cmd_capacity, max_segments=base.max_segments,
        max_hits=base.max_hits, max_candidates=base.max_candidates,
        max_deltas=base.max_deltas)
    assert int(out.diag["n_segments"]) == n_segs
    assert int(out.diag["n_hits"]) == n_hits
    assert int(out.diag["n_candidates"]) == n_cand
    assert int(out.diag["n_deltas"]) == n_deltas
    assert cmds_ub >= int(np.asarray(out.counts).max())


def test_fitted_render_matches(tmp_path):
    """A fitted config renders identically and reports no overflow."""
    import numpy as np
    from piet_tpu.raster.cpu_fine import cpu_render_scene
    scene = make_cardioid(center=(256.0, 256.0), r=200.0)
    base = RenderConfig(width=512, height=512, tile_height=16, tile_width=16,
                        cmd_capacity=128)
    cfg = fit_capacities(scene, base)
    img = Renderer(cfg, fine_impl="xla").render(scene)
    gold = cpu_render_scene(scene, base)
    diff = np.abs(img.astype(np.int32) - gold.astype(np.int32))
    assert diff.max() <= 2
    # bucketed variant has headroom
    cfgb = fit_capacities(scene, base, bucket=True)
    assert cfgb.max_hits >= cfg.max_hits
