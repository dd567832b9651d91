"""Array-level bisect of the expand+gatherm hardware interaction bug.

Round-4 pair bisect (tools/eng_bisect_probe.py): every single engine and
two of three pairs are bit-identical to the XLA path on hardware, but
expand+gatherm together produce a different stream (cand_emit collapses
to ~0).  f32 probe SUMS proved too weak to localize (reduction-order
noise on big arrays), so this probe captures the RAW stage arrays
(coarse_rasterize(with_probes="arrays")) and reports the first array
that differs, with sample indices.

Usage: python tools/eng_array_probe.py [implA implB]
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
from piet_tpu.ops.coarse import coarse_rasterize
from piet_tpu.renderer.renderer import prepare_scene
from piet_tpu.scene.svg import make_tiger

CFG = RenderConfig(width=224, height=224, tile_height=16,
                   tile_width=128, cmd_capacity=2688, max_items=512,
                   max_points=1 << 15, max_segments=1 << 15,
                   max_hits=1 << 17, max_candidates=1 << 14,
                   max_deltas=1 << 15)


def main():
    impl_a = sys.argv[1] if len(sys.argv) > 1 else "xla"
    impl_b = sys.argv[2] if len(sys.argv) > 2 else "pallas:expand,gatherm"
    cfg = CFG
    scene = make_tiger(scale=1.0)
    kw = dict(tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
              tile_w=cfg.tile_width, tile_h=cfg.tile_height,
              cmd_capacity=cfg.cmd_capacity, max_segments=cfg.max_segments,
              max_hits=cfg.max_hits, max_candidates=cfg.max_candidates,
              max_deltas=cfg.max_deltas, output="entries",
              sort_impl="xla", with_probes="arrays")
    dev = prepare_scene(scene, cfg)

    outs = {}
    for impl in (impl_a, impl_b):
        out = jax.jit(lambda d, i=impl: coarse_rasterize(
            d, expand_impl=i, **kw))(dev)
        probes = {k: np.asarray(v) for k, v in out[-1]["probes"].items()}
        outs[impl] = probes
        print(f"[{impl}] captured {len(probes)} stage arrays", flush=True)

    pa, pb = outs[impl_a], outs[impl_b]
    for k in pa:
        a, b = pa[k], pb.get(k)
        if b is None:
            continue
        av = a.view(np.uint32) if a.dtype.kind == "f" else a
        bv = b.view(np.uint32) if b.dtype.kind == "f" else b
        n = int((av != bv).sum())
        print(f"{k:24s} shape={a.shape} mismatched={n}", flush=True)
        if n:
            idx = np.argwhere((av != bv).reshape(av.shape))[:6]
            for ix in idx:
                t = tuple(int(i) for i in ix)
                print(f"    at {t}: {impl_a}={av[t]:#x} {impl_b}={bv[t]:#x}",
                      flush=True)
            break


if __name__ == "__main__":
    main()
