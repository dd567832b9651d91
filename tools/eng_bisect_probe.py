"""Bisect the round-3 engine-vs-XLA hardware divergence (loose caps).

test_engine_path_bit_identical_on_tpu fails at the 224x224 tiger config
with loose capacities: 4.79% of stream words differ between
expand_impl="xla" and "pallas" ON HARDWARE, while the same comparison is
bit-identical in interpret mode (chipless repro, round 4).  This probe
runs the coarse pipeline per engine SUBSET with per-stage probe sums and
reports (a) which single engine flips the stream, (b) the first probe
stage whose checksum diverges from the XLA path.

Usage: python tools/eng_bisect_probe.py
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
IMPLS = ["xla", "pallas:expand", "pallas:keyed", "pallas:gatherm", "pallas"]


def main():
    cfg = CFG
    scene = make_tiger(scale=1.0)
    kw = dict(tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
              tile_w=cfg.tile_width, tile_h=cfg.tile_height,
              cmd_capacity=cfg.cmd_capacity, max_segments=cfg.max_segments,
              max_hits=cfg.max_hits, max_candidates=cfg.max_candidates,
              max_deltas=cfg.max_deltas, output="entries",
              sort_impl="pallas", with_probes=True)
    dev = prepare_scene(scene, cfg)

    results = {}
    for impl in IMPLS:
        out = jax.jit(lambda d, i=impl: coarse_rasterize(
            d, expand_impl=i, **kw))(dev)
        diag = out[-1]
        probes = {k: float(v) for k, v in diag["probes"].items()}
        leaves = [np.asarray(x) for x in jax.tree.leaves(out[:-1])]
        results[impl] = (probes, leaves)
        print(f"[{impl}] done", flush=True)

    ref_probes, ref_leaves = results["xla"]
    for impl in IMPLS[1:]:
        probes, leaves = results[impl]
        bad_stage = None
        for k, v in ref_probes.items():
            if k in probes and probes[k] != v:
                bad_stage = k
                break
        nbad = [int((a.view(np.uint32) if a.dtype.kind == "f" else a)
                    .__ne__(b.view(np.uint32) if b.dtype.kind == "f"
                            else b).sum())
                for a, b in zip(ref_leaves, leaves)]
        print(f"[{impl}] first-div-stage={bad_stage} "
              f"leaf-mismatches={nbad}", flush=True)
        if bad_stage is not None:
            print(f"    probe[{bad_stage}] xla={ref_probes[bad_stage]!r} "
                  f"{impl}={probes[bad_stage]!r}", flush=True)


if __name__ == "__main__":
    main()
