#!/usr/bin/env python
"""Benchmark: every BASELINE.md config, ms/frame on one chip.

Prints one JSON line per secondary config, then the HEADLINE line last:
  {"metric": "tiger_4k_ms_per_frame", "value": <ms>, "unit": "ms/frame",
   "vs_baseline": <2.0 / ms>, ..., "configs": {<name>: <ms>, ...}}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against the driver's north-star target of 2 ms/frame at 4K on one
TPU chip: > 1.0 means the target is beaten.

Methodology: the scene is encoded and staged to the device once (the
reference likewise encodes only on resize, PietRenderer.m:105-146, and
re-renders every frame); the timed region is the full device render step
(coarse binning + fine raster + present composite in one jit).  Frames are
timed PIPELINED -- dispatch ``FRAMES`` steps, then synchronize with a
1-element device-to-host fetch (device FIFO order guarantees every step
ran; ``block_until_ready`` does NOT reliably block through the axon
tunnel).  The fetch itself costs one host<->chip round trip (~tens of ms
through the tunnel); an idle-queue fetch is timed immediately after each
sample and subtracted.  Reported value is the median of ``SAMPLES``
such samples.  A persistent compilation cache under .jax_cache/ keeps
repeat runs fast.
"""

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(
                          os.path.abspath(__file__)), ".jax_cache"))

import numpy as np  # noqa: E402

FRAMES = 20
SAMPLES = 3
TARGET_MS = 2.0


def _time_renderer(renderer, dev) -> float:
    """Median pipelined ms/frame over SAMPLES samples of FRAMES frames."""
    import jax  # noqa: F401

    img, _ = renderer._render(dev)
    np.asarray(img[0, 0])  # warm (compile already done by caller)
    samples = []
    for _ in range(SAMPLES):
        t0 = time.perf_counter()
        for _ in range(FRAMES):
            img, _ = renderer._render(dev)
        np.asarray(img[0, 0])
        t1 = time.perf_counter()
        np.asarray(img[0, 0])  # idle-queue fetch: pure sync cost
        t2 = time.perf_counter()
        samples.append(((t1 - t0) - (t2 - t1)) * 1e3 / FRAMES)
    return float(np.median(samples))


def _bench_config(name, scene, width, height):
    from piet_tpu.config import RenderConfig
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.renderer.renderer import Renderer, prepare_scene

    cfg = fit_capacities(scene, RenderConfig(
        width=width, height=height, tile_height=32, tile_width=128,
        cmd_capacity=1024))
    renderer = Renderer(cfg)
    renderer.render_u32(scene)  # compile + capacity check via stats
    dev = prepare_scene(scene, cfg)
    ms = _time_renderer(renderer, dev)
    stats = renderer.last_stats or {}
    return ms, cfg, stats


def _roofline_split(scene, cfg, stats, total_ms):
    """Measured coarse/fine stage split + model floors for the headline.

    Times the coarse pass alone and the fine kernel alone (pipelined,
    same methodology as the frame timing) and feeds the frame's record
    counts to the roofline model (piet_tpu/roofline.py)."""
    import jax

    from piet_tpu.ops.coarse import coarse_rasterize
    from piet_tpu.ops.fine import fine_rasterize_entries
    from piet_tpu.renderer.renderer import (_solid_to_present_u32,
                                            expand_choice, hitfuse_choice,
                                            prepare_scene)
    from piet_tpu.ops.pairing import pair_mode_from_env
    from piet_tpu.roofline import frame_roofline

    dev = prepare_scene(scene, cfg)
    kw = dict(tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
              tile_w=cfg.tile_width, tile_h=cfg.tile_height,
              cmd_capacity=cfg.cmd_capacity, max_segments=cfg.max_segments,
              max_hits=cfg.max_hits, max_candidates=cfg.max_candidates,
              max_deltas=cfg.max_deltas, output="entries",
              sort_impl="pallas",
              expand_impl=expand_choice(cfg, "pallas", False),
              hitfuse=hitfuse_choice(cfg, "pallas", False),
              pair=pair_mode_from_env())

    @jax.jit
    def coarse_fn(d):
        return coarse_rasterize(d, **kw)[:-1]

    def _time(fn, args):
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        np.asarray(leaf[(0,) * leaf.ndim])  # warm
        samples = []
        for _ in range(SAMPLES):
            t0 = time.perf_counter()
            for _ in range(FRAMES):
                out = fn(*args)
            leaf = jax.tree.leaves(out)[0]
            np.asarray(leaf[(0,) * leaf.ndim])
            t1 = time.perf_counter()
            np.asarray(leaf[(0,) * leaf.ndim])
            t2 = time.perf_counter()
            samples.append(((t1 - t0) - (t2 - t1)) * 1e3 / FRAMES)
        return float(np.median(samples))

    coarse_ms = _time(coarse_fn, (dev,))
    ce = jax.block_until_ready(coarse_fn(dev))
    stream, first, n_entries, _, solid = ce
    solid_u32 = jax.block_until_ready(_solid_to_present_u32(solid))

    def fine_fn(f, n, s, st):
        return fine_rasterize_entries(
            f, n, s, st, 0, tile_h=cfg.tile_height, tile_w=cfg.tile_width,
            tiles_x=cfg.tiles_x, paired=kw["pair"] != "off",
            runs=(kw["pair"] == "off"
                  and os.environ.get("PIET_RUNS", "1") == "1"))

    fine_ms = _time(fine_fn, (first, n_entries, solid_u32, stream))
    return frame_roofline(stats, cfg, coarse_ms, fine_ms, total_ms)


def main() -> int:
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from piet_tpu.scene import fixtures
    from piet_tpu.scene.svg import make_tiger

    backend = jax.default_backend()
    on_tpu = backend == "tpu"

    if on_tpu:
        # All five BASELINE.md benchmark rows (viewports per BASELINE.md).
        configs = [
            ("tiger_8x", lambda: make_tiger(scale=8.0), 1664, 1664),
            ("circles_rects_1k",
             lambda: fixtures.get_scene("circles_rects"), 1024, 1024),
            ("beziers_10k",
             lambda: fixtures.get_scene("beziers_10k"), 1024, 1024),
            ("glyph_page_5k",
             lambda: fixtures.get_scene("glyph_page"), 1024, 1024),
            ("animated_clips",
             lambda: fixtures.get_scene("animated"), 1024, 1024),
        ]
        headline = ("tiger_4k", lambda: make_tiger(scale=19.2), 3840, 2160)
    else:
        # CPU fallback so the bench always reports; not the headline config.
        configs = []
        headline = ("tiger_512_cpu_fallback",
                    lambda: make_tiger(scale=2.56), 512, 512)

    results = {}
    for name, make, w, h in configs:
        try:
            ms, _, _ = _bench_config(name, make(), w, h)
            results[name] = round(ms, 3)
            print(json.dumps({"config": name, "ms_per_frame": round(ms, 3),
                              "viewport": f"{w}x{h}"}), flush=True)
        except Exception as e:  # keep the headline alive no matter what
            results[name] = None
            print(json.dumps({"config": name, "error": str(e)[:200]}),
                  flush=True)

    name, make, w, h = headline
    ms, cfg, stats = _bench_config(name, make(), w, h)
    mpix_s = (w * h) / (ms * 1e-3) / 1e6
    segs_s = float(np.asarray(stats.get("n_segments", 0)).sum()) / (ms * 1e-3)

    # Roofline (piet_tpu/roofline.py): per-stage speed-of-light floors
    # from the frame's record counts vs v5e HBM/VPU peaks, plus measured
    # coarse/fine split for pct_of_roofline (two extra jits, cached).
    roofline = None
    if on_tpu:
        try:
            roofline = _roofline_split(make(), cfg, stats, ms)
        except Exception as e:
            roofline = {"error": str(e)[:200]}
    out = {
        "metric": ("tiger_4k_ms_per_frame" if on_tpu
                   else "tiger_512_ms_per_frame_cpu_fallback"),
        "value": round(ms, 3),
        "unit": "ms/frame",
        "vs_baseline": round(TARGET_MS / ms, 4),
        "backend": backend,
        "viewport": f"{w}x{h}",
        "frames": FRAMES,
        "samples": SAMPLES,
        "timing": "pipelined, fetch-synced, sync-cost subtracted, median",
        "fill_mpix_per_s": round(mpix_s, 1),
        "segments_binned_per_s": round(segs_s, 0),
        "n_segments": int(np.asarray(stats.get("n_segments", 0)).sum()),
        "max_tile_cmds": int(np.asarray(stats.get("max_tile_cmds", 0)).max()),
        "configs": results,
    }
    if roofline is not None:
        out["roofline"] = roofline
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
