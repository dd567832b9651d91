"""Localize the 1-px gradient exactness divergence (round-3 finding).

Renders the gradient demo on the chip, diffs vs the numpy oracle,
prints the differing pixel(s), channel values, owning tile, and the
tile's entry tags -- then re-renders single-item subsets (linear only /
radial only) to attribute the divergence to one resolve path.

Usage: python tools/grad_exact_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import numpy as np
import jax

from piet_tpu.config import RenderConfig
from piet_tpu.raster.cpu_fine import cpu_render_scene
from piet_tpu.renderer.renderer import Renderer
from piet_tpu.scene.fixtures import make_gradient_demo

CFG = dict(width=256, height=256, tile_height=16, tile_width=128,
           cmd_capacity=256, max_items=512, max_points=1 << 15,
           max_segments=1 << 15, max_hits=1 << 17,
           max_candidates=1 << 14, max_deltas=1 << 15)


def diff_scene(scene, tag):
    cfg = RenderConfig(**CFG)
    img = np.asarray(Renderer(cfg, fine_impl="pallas").render(scene))
    gold = cpu_render_scene(scene, cfg)
    d = img.astype(int) - gold.astype(int)
    bad = np.argwhere(d.any(axis=-1))
    print(f"[{tag}] mismatched px: {len(bad)}", flush=True)
    for y, x in bad[:8]:
        print(f"  px ({y},{x}) tile ({y // 16},{x // 128}) "
              f"dev={img[y, x].tolist()} gold={gold[y, x].tolist()}",
              flush=True)
    return len(bad)


def _subset(which, s=256.0):
    import math as _m

    from piet_tpu.scene.scene import (LinearGradient, RadialGradient,
                                      SceneBuilder)
    b = SceneBuilder()
    if which == "linear":
        b.fill([(-1.0, -1.0), (s + 1.0, -1.0), (s + 1.0, s + 1.0),
                (-1.0, s + 1.0)],
               LinearGradient((0.0, 0.0), (0.0, s), 0x1030A0FF, 0xF0D080FF))
    elif which == "radial":
        k = 40
        disk = [(s * 0.32 + s * 0.26 * _m.cos(2 * _m.pi * i / k),
                 s * 0.62 + s * 0.26 * _m.sin(2 * _m.pi * i / k))
                for i in range(k)]
        b.fill(disk, RadialGradient((s * 0.28, s * 0.56), s * 0.3,
                                    0xFFF0C0FF, 0xC03000FF))
    return b.build()


def main():
    scene = make_gradient_demo(256)
    print("items:", scene.n_items, "tags:", scene.tags[:scene.n_items],
          flush=True)
    n = diff_scene(scene, "full demo")
    if n:
        diff_scene(_subset("linear"), "linear sky only")
        diff_scene(_subset("radial"), "radial disk only")


if __name__ == "__main__":
    main()
