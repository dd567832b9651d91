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


def random_scene(seed: int, groups: bool = False):
    """``groups``: also fuzz arbitrary-path clip / opacity-layer groups
    (the extension commands) with random nesting."""
    rng = np.random.default_rng(seed)
    b = SceneBuilder()
    b.begin_group()
    depth = 0
    for _ in range(int(rng.integers(5, 40))):
        if groups:
            roll = rng.random()
            if roll < 0.12 and depth < 3:
                n = int(rng.integers(3, 9))
                pts = [tuple(map(float, p))
                       for p in rng.uniform(-20, SIZE + 20, (n, 2))]
                b.clip_path(pts, even_odd=bool(rng.random() < 0.3))
                depth += 1
            elif roll < 0.2 and depth < 3:
                b.push_layer(float(rng.uniform(0.0, 1.0)))
                depth += 1
            elif roll < 0.3 and depth > 0:
                b.pop()
                depth -= 1
        kind = int(rng.integers(0, 5))
        clipped = rng.random() < 0.2
        if clipped:
            cx0, cy0 = rng.uniform(-10, SIZE, 2)
            b.set_clip(float(cx0), float(cy0),
                       float(cx0 + rng.uniform(1, SIZE / 2)),
                       float(cy0 + rng.uniform(1, SIZE / 2)))
        else:
            b.clear_clip()
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
                if rng.random() < 0.2:
                    # Combined multi-subpath fill fuzz (hole extension):
                    # 2-3 random subpaths, mixed winding directions,
                    # sometimes even-odd, sometimes far-protruding
                    # siblings (the union-bbox edge case).
                    subs = []
                    for _ in range(int(rng.integers(2, 4))):
                        m = int(rng.integers(3, 8))
                        sp = [tuple(map(float, p)) for p in
                              rng.uniform(-20, SIZE + 20, (m, 2))]
                        if rng.random() < 0.5:
                            sp = sp[::-1]
                        subs.append(sp)
                    b.fill_path(subs, color,
                                even_odd=bool(rng.random() < 0.4),
                                combined=True)
                    continue
                brush = color
                if not clipped and rng.random() < 0.35:
                    # Gradient brush fuzz (extension): random 2-stop
                    # linear/radial, incl. degenerate axes/radii.
                    from piet_tpu.scene.scene import (LinearGradient,
                                                      RadialGradient)
                    c1 = (int(rng.integers(0, 1 << 24)) << 8) | int(
                        rng.integers(0, 256))
                    if rng.random() < 0.5:
                        p0 = tuple(map(float, rng.uniform(-20, SIZE, 2)))
                        p1 = (p0 if rng.random() < 0.1 else
                              tuple(map(float, rng.uniform(-20, SIZE, 2))))
                        brush = LinearGradient(p0, p1, color, c1)
                    else:
                        brush = RadialGradient(
                            tuple(map(float, rng.uniform(0, SIZE, 2))),
                            float(rng.uniform(0.0, SIZE * 0.6)), color, c1)
                b.fill([(float(x), float(y)) for x, y in pts], brush)
            else:
                b.polyline([(float(x), float(y)) for x, y in pts],
                           color, float(rng.uniform(0.0, 8)))
    if groups:
        while depth > 0:
            b.pop()
            depth -= 1
    b.end_group()
    return b.build()


# One shared generous config for most seeds (one XLA compile for the
# whole sweep); the first three seeds exercise exact-fitted configs.
SHARED_CFG = RenderConfig(width=SIZE, height=SIZE, tile_height=16,
                          tile_width=16, cmd_capacity=1024,
                          max_items=128, max_points=1 << 12,
                          max_segments=1 << 12, max_hits=1 << 15,
                          max_candidates=1 << 13, max_deltas=1 << 11)


@pytest.mark.parametrize("seed", range(12))
def test_fuzz_device_vs_oracle(seed):
    scene = random_scene(seed)
    if seed < 3:
        cfg = fit_capacities(
            scene, RenderConfig(width=SIZE, height=SIZE, tile_height=16,
                                tile_width=16))
    else:
        cfg = SHARED_CFG
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


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_clip_groups(seed):
    """Random arbitrary-path clip / opacity-layer groups (extension):
    coarse command equality AND image agreement vs the oracle."""
    scene = random_scene(200 + seed, groups=True)
    cfg = SHARED_CFG
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
    tags = np.asarray(out.tags)
    args = np.asarray(out.args).reshape(-1, cfg.cmd_capacity, ARG_WORDS)
    for t in range(gold.n_tiles):
        n = int(gold.counts[t])
        np.testing.assert_array_equal(tags[t, :n], gold.tags[t, :n],
                                      err_msg=f"seed {seed} tile {t}")
        np.testing.assert_array_equal(args[t, :n], gold.args[t, :n],
                                      err_msg=f"seed {seed} tile {t}")
    img = Renderer(cfg, fine_impl="xla").render(scene)
    gimg = cpu_render_scene(scene, cfg)
    diff = np.abs(img.astype(np.int32) - gimg.astype(np.int32))
    assert diff.max() <= 2, f"seed {seed}: maxdiff {diff.max()}"
    assert (diff.max(-1) > 0).mean() < 1e-3, f"seed {seed}"


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_tall_tiles(seed):
    """Same property at the production 32x128 tile geometry."""
    scene = random_scene(100 + seed)
    cfg = fit_capacities(
        scene, RenderConfig(width=SIZE, height=SIZE, tile_height=32,
                            tile_width=128))
    img = Renderer(cfg, fine_impl="xla").render(scene)
    gimg = cpu_render_scene(scene, cfg)
    diff = np.abs(img.astype(np.int32) - gimg.astype(np.int32))
    assert diff.max() <= 2, f"seed {seed}: maxdiff {diff.max()}"


def test_degenerate_items():
    """Deterministic degenerate shapes: zero-width/zero-length strokes,
    zero-radius circles, sub-minimal fills, fully offscreen items."""
    b = SceneBuilder()
    b.begin_group()
    b.circle(50.0, 50.0, 0.0)                      # zero radius
    b.stroke_line((80.0, 80.0), (80.0, 80.0), 0.0, 0x112233FF)  # point, w=0
    b.stroke_line((10.0, 90.0), (90.0, 90.0), 0.0, 0x00FF00FF)  # zero width
    b.fill([(20.0, 20.0), (40.0, 20.0)], 0xFF0000FF)            # 2-pt fill
    b.fill([(30.0, 30.0), (30.0, 60.0), (30.0, 60.0)], 0x0000FFFF)  # zero area
    b.circle(-500.0, -500.0, 10.0)                 # fully offscreen
    b.polyline([(200.0, 10.0), (200.0, 120.0)], 0xAA00AAFF, 3.0)
    b.end_group()
    scene = b.build()
    cfg = fit_capacities(
        scene, RenderConfig(width=256, height=128, tile_height=16,
                            tile_width=16))
    img = Renderer(cfg, fine_impl="xla").render(scene)
    gimg = cpu_render_scene(scene, cfg)
    diff = np.abs(img.astype(np.int32) - gimg.astype(np.int32))
    assert diff.max() <= 2


def test_fuzz_sharded():
    """One fuzz scene through the row-sharded multi-chip path."""
    import jax

    from piet_tpu.parallel import ShardedRenderer
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual cpu devices")
    mesh = jax.sharding.Mesh(np.array(devs[:8]), ("y",))
    scene = random_scene(7)
    cfg = fit_capacities(
        scene, RenderConfig(width=SIZE, height=SIZE, tile_height=16,
                            tile_width=16))
    img = ShardedRenderer(cfg, mesh, fine_impl="xla").render(scene)
    gimg = cpu_render_scene(scene, cfg)
    diff = np.abs(img.astype(np.int32) - gimg.astype(np.int32))
    assert diff.max() <= 2
