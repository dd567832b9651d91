"""Diff the device entry stream vs the CPU tiler for the gradient demo's
divergent tile (round-3: px (115,64), tile ty=7 tx=0, 1 blue code off).

The fine kernel is bit-exact at 16-row tiles, so a 1-px image divergence
means the tile's COMMANDS differ between the device coarse pass and the
CPU oracle tiler -- this probe fetches both and prints them word by word
(f32 bits) so the diverging operand is identified, not guessed.

Usage: python tools/grad_tile_probe.py [ty tx]
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
from piet_tpu.layout.entry_stream import (ENTRY_WORDS, W_META, W_S0_ARG,
                                          W_S0_TAG, W_S1_ARG, W_S1_TAG)
from piet_tpu.ops.coarse import coarse_rasterize
from piet_tpu.raster.cpu_tiler import cpu_tile_scene
from piet_tpu.renderer.renderer import hitfuse_choice, prepare_scene
from piet_tpu.scene.fixtures import make_gradient_demo

CFG = dict(width=256, height=256, tile_height=16, tile_width=128,
           cmd_capacity=256, max_items=512, max_points=1 << 15,
           max_segments=1 << 15, max_hits=1 << 17,
           max_candidates=1 << 14, max_deltas=1 << 15)


def main():
    ty, tx = (int(sys.argv[1]), int(sys.argv[2])) if len(sys.argv) > 2 \
        else (7, 0)
    cfg = RenderConfig(**CFG)
    scene = make_gradient_demo(256)
    dev = prepare_scene(scene, cfg)
    kw = dict(tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
              tile_w=cfg.tile_width, tile_h=cfg.tile_height,
              cmd_capacity=cfg.cmd_capacity, max_segments=cfg.max_segments,
              max_hits=cfg.max_hits, max_candidates=cfg.max_candidates,
              max_deltas=cfg.max_deltas, output="entries",
              # XLA sort: bit-identical stream (both sorts are stable) at
              # a fraction of the compile time -- the pallas bitonic at
              # this config's 2^18 record capacity compiles for ~30 min.
              sort_impl="xla",
              hitfuse=hitfuse_choice(cfg, "pallas", False))
    out = jax.jit(lambda d: coarse_rasterize(d, **kw)[:-1])(dev)
    stream, first, n_entries, counts, solid = [np.asarray(x) for x in out]
    t = ty * cfg.tiles_x + tx
    # stream is (E/128, 16, 128): entry e = [chunk e//128, :, e%128].
    fe, ne = int(first[t]), int(n_entries[t])
    print(f"tile ({ty},{tx}) t={t}: first={fe} n={ne} "
          f"solid={solid[t]:#x}", flush=True)
    ew = np.stack([stream[(fe + i) // 128, :, (fe + i) % 128]
                   for i in range(ne)])
    for i, row in enumerate(ew):
        u = row.view(np.uint32)
        print(f"  e{i:02d} tag0={row[W_S0_TAG]:.0f} "
              f"tag1={row[W_S1_TAG]:.0f} meta={row[W_META]:.0f} "
              f"w=({' '.join(f'{w:08x}' for w in u)})", flush=True)

    ptcl = cpu_tile_scene(scene, cfg)
    cnt = int(ptcl.counts[t])
    print(f"oracle tile t={t}: {cnt} commands", flush=True)
    for j in range(cnt):
        tag = int(ptcl.tags[t, j])
        args = ptcl.args[t, j].view(np.uint32)
        print(f"  c{j:02d} tag={tag} "
              f"args=({' '.join(f'{a:08x}' for a in args)})", flush=True)


if __name__ == "__main__":
    main()
