"""Property/fuzz testing: random scenes, device vs oracle.

Randomized mixes of all four item kinds -- including degenerate shapes
(zero-length segments, axis-aligned edges, offscreen and sub-pixel
geometry) -- checked two ways per seed:

* the coarse pass's PTCL must equal the CPU golden tiler command-for-
  command (bitwise, including bail/overflow metadata),
* the full rendered image must match the golden image within the
  documented XLA:CPU FMA tolerance.

The axis-aligned glyph bug (near-vertical-edge coverage instability,
fixed by the wide degenerate-column guard) is exactly the class of defect
this hunts.
"""

import numpy as np
import pytest

from piet_tpu.config import RenderConfig
from piet_tpu.ops.coarse import coarse_rasterize
from piet_tpu.raster.cpu_fine import cpu_render_scene
from piet_tpu.raster.cpu_tiler import cpu_tile_scene
from piet_tpu.raster.ptcl import ARG_WORDS
from piet_tpu.renderer.capacity import fit_capacities
from piet_tpu.renderer.renderer import Renderer, prepare_scene
from piet_tpu.scene.scene import SceneBuilder

SIZE = 256


def random_scene(seed: int):
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    b.begin_group()
    for _ in range(int(rng.integers(5, 40))):
        kind = int(rng.integers(0, 5))
        color = (int(rng.integers(0, 1 << 24)) << 8) | int(
            rng.integers(0, 256))
        if kind == 0:
            b.circle(float(rng.uniform(-20, SIZE + 20)),
                     float(rng.uniform(-20, SIZE + 20)),
                     float(rng.uniform(0.1, 60)))
        elif kind == 1:
            p0 = rng.uniform(-20, SIZE + 20, 2)
            # sometimes degenerate (zero-length) or axis-aligned
            p1 = p0 if rng.random() < 0.1 else p0 + rng.uniform(-80, 80, 2)
            if rng.random() < 0.3:
                p1[int(rng.integers(0, 2))] = p0[int(rng.integers(0, 2))]
            b.stroke_line(tuple(p0), tuple(p1),
                          float(rng.uniform(0.0, 12)), color)
        else:
            n = int(rng.integers(3, 12))
            if rng.random() < 0.4:
                # axis-aligned rectangle-ish polygon (glyph-bug class)
                x0, y0 = rng.uniform(0, SIZE, 2)
                w, h = rng.uniform(0.01, 60, 2)
                pts = [(x0, y0), (x0 + w, y0), (x0 + w, y0 + h),
                       (x0, y0 + h)][:max(3, n % 5)]
            else:
                pts = [tuple(p) for p in rng.uniform(-20, SIZE + 20, (n, 2))]
            if kind == 2:
                b.fill([(float(x), float(y)) for x, y in pts], color)
            else:
                b.polyline([(float(x), float(y)) for x, y in pts],
                           color, float(rng.uniform(0.0, 8)))
    b.end_group()
    return b.build()


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_device_vs_oracle(seed):
    scene = random_scene(seed)
    cfg = fit_capacities(
        scene, RenderConfig(width=SIZE, height=SIZE, tile_height=16,
                            tile_width=16))
    # coarse: command-for-command
    dev = prepare_scene(scene, cfg)
    out = coarse_rasterize(
        dev, tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
        tile_w=cfg.tile_width, tile_h=cfg.tile_height,
        cmd_capacity=cfg.cmd_capacity, max_segments=cfg.max_segments,
        max_hits=cfg.max_hits, max_candidates=cfg.max_candidates,
        max_deltas=cfg.max_deltas)
    gold = cpu_tile_scene(scene, cfg)
    np.testing.assert_array_equal(np.asarray(out.counts), gold.counts)
    np.testing.assert_array_equal(np.asarray(out.solid), gold.solid)
    np.testing.assert_array_equal(np.asarray(out.overflow), gold.overflow)
    tags = np.asarray(out.tags)
    args = np.asarray(out.args).reshape(-1, cfg.cmd_capacity, ARG_WORDS)
    for t in range(gold.n_tiles):
        n = int(gold.counts[t])
        np.testing.assert_array_equal(tags[t, :n], gold.tags[t, :n],
                                      err_msg=f"seed {seed} tile {t}")
        np.testing.assert_array_equal(args[t, :n], gold.args[t, :n],
                                      err_msg=f"seed {seed} tile {t}")
    # image: within the documented FMA tolerance
    img = Renderer(cfg, fine_impl="xla").render(scene)
    gimg = cpu_render_scene(scene, cfg)
    diff = np.abs(img.astype(np.int32) - gimg.astype(np.int32))
    assert diff.max() <= 2, f"seed {seed}: maxdiff {diff.max()}"
    assert (diff.max(-1) > 0).mean() < 1e-3, f"seed {seed}"
