#!/usr/bin/env python
"""AOT-precompile ONE bench config into the persistent compilation cache.

The 4K renderer takes 450-500 s to compile on first touch; libtpu is
installed locally, so the executable can be built AGAINST AN ABSTRACT
v5e TOPOLOGY without the chip (the verify-skill recipe) -- and the
persistent cache entry it writes is keyed by HLO + compile options +
backend version, which the real chip run then hits.  Run while the TPU
tunnel is down; bench.py / tools/time_config.py pick the entries up.

Usage (one process per config -- PIET_* env is read at trace time):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      TPU_ACCELERATOR_TYPE=v5litepod-1 TPU_WORKER_HOSTNAMES=localhost \
      TPU_SKIP_MDS_QUERY=1 [PIET_EXPAND_IMPL=pallas] [PIET_PAIR=0] \
      python tools/precompile_cache.py <config>
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _exactness_cfg(name):
    """The EXACT configs of tests/test_tpu_exact.py (keep in lockstep:
    a cache hit needs the identical HLO).  Returns (scene, cfg,
    kind) with kind in {"render", "fine", "engine"}."""
    import math

    from piet_tpu.config import RenderConfig
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.scene.fixtures import make_gradient_demo
    from piet_tpu.scene.scene import SceneBuilder
    from piet_tpu.scene.svg import make_tiger

    if name == "exact_fine":
        cfg = RenderConfig(width=224, height=224, tile_height=16,
                           tile_width=128, cmd_capacity=2688)
        return make_tiger(scale=1.0), cfg, "fine"
    if name == "exact_full":
        scene = make_tiger(scale=1.0)
        return scene, fit_capacities(scene, RenderConfig(
            width=224, height=224, tile_height=16, tile_width=128,
            cmd_capacity=2688), bucket=True), "render"
    if name == "exact_32row":
        scene = make_tiger(scale=1.2)
        return scene, fit_capacities(scene, RenderConfig(
            width=256, height=256, tile_height=32, tile_width=128,
            cmd_capacity=4096), bucket=True), "render"
    if name == "exact_clip":
        b = SceneBuilder()
        star = []
        for k in range(10):
            ang = -math.pi / 2 + k * math.pi / 5
            r = 100 if k % 2 == 0 else 40
            star.append((127.5 + r * math.cos(ang),
                         128 + r * math.sin(ang)))
        b.clip_path(star)
        b.fill([(1, 1), (255, 1), (255, 255), (1, 255)], 0x2040C0FF)
        for i in range(8):
            b.stroke_line((1, i * 32), (256, i * 32 + 30), 3.0, 0xFF8000FF)
        b.push_layer(0.5)
        b.circle(128, 128, 60)
        b.pop()
        b.pop()
        scene = b.build()
        return scene, fit_capacities(scene, RenderConfig(
            width=256, height=256, tile_height=16, tile_width=128,
            cmd_capacity=1024), bucket=True), "render"
    if name == "exact_grad":
        scene = make_gradient_demo(256)
        return scene, fit_capacities(scene, RenderConfig(
            width=256, height=256, tile_height=16, tile_width=128,
            cmd_capacity=256), bucket=True), "render"
    if name == "exact_engine":
        cfg = RenderConfig(width=224, height=224, tile_height=16,
                           tile_width=128, cmd_capacity=2688, max_items=512,
                           max_points=1 << 15, max_segments=1 << 15,
                           max_hits=1 << 15, max_candidates=1 << 14,
                           max_deltas=1 << 15)
        return make_tiger(scale=1.0), cfg, "engine"
    raise KeyError(name)


#: All exactness-suite entries (``precompile_cache.py exactness`` primes
#: the whole on-chip suite -- VERDICT r4 item 8: the suite's wall time
#: was compile-dominated, up to 49 min per cold test).
EXACTNESS = ("exact_fine", "exact_full", "exact_32row", "exact_clip",
             "exact_grad", "exact_engine")


def _compile_one(name, sh) -> None:
    from piet_tpu.config import RenderConfig
    from piet_tpu.renderer.capacity import fit_capacities
    from piet_tpu.renderer.renderer import (DeviceScene, make_render_fn,
                                            prepare_scene)
    from piet_tpu.scene import fixtures
    from piet_tpu.scene.svg import make_tiger

    configs = {
        "tiger_4k": (lambda: make_tiger(scale=19.2), 3840, 2160),
        "tiger_8x": (lambda: make_tiger(scale=8.0), 1664, 1664),
        "circles_rects_1k":
            (lambda: fixtures.get_scene("circles_rects"), 1024, 1024),
        "beziers_10k":
            (lambda: fixtures.get_scene("beziers_10k"), 1024, 1024),
        "glyph_page_5k":
            (lambda: fixtures.get_scene("glyph_page"), 1024, 1024),
        "animated_clips":
            (lambda: fixtures.get_scene("animated"), 1024, 1024),
    }
    t0 = time.time()
    if name in configs:
        make, w, h = configs[name]
        scene = make()
        cfg = fit_capacities(scene, RenderConfig(
            width=w, height=h, tile_height=32, tile_width=128,
            cmd_capacity=1024))
        kind = "render"
    else:
        scene, cfg, kind = _exactness_cfg(name)

    def abs_of(x):
        return jax.ShapeDtypeStruct(jax.numpy.shape(x),
                                    jax.numpy.result_type(x), sharding=sh)

    if kind == "render":
        dev = prepare_scene(scene, cfg)
        abs_scene = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
            dev)
        # fine_impl pinned to what _resolve_fine_impl gives ON the chip
        # ("auto" would resolve to "xla" here, where the backend is cpu).
        fn = make_render_fn(cfg, fine_impl="pallas")
        fn.lower(abs_scene).compile()
    elif kind == "fine":
        import functools

        import jax.numpy as jnp

        from piet_tpu.ops.fine import fine_rasterize
        from piet_tpu.raster.ptcl import ARG_WORDS
        T = cfg.tiles_y * cfg.tiles_x
        fn = jax.jit(functools.partial(
            fine_rasterize, tile_h=cfg.tile_height, tile_w=cfg.tile_width,
            cmd_capacity=cfg.cmd_capacity))
        fn.lower(
            jax.ShapeDtypeStruct((cfg.tiles_y, cfg.tiles_x), jnp.int32,
                                 sharding=sh),
            jax.ShapeDtypeStruct((T, cfg.cmd_capacity), jnp.int32,
                                 sharding=sh),
            jax.ShapeDtypeStruct((T, cfg.cmd_capacity * ARG_WORDS),
                                 jnp.float32, sharding=sh)).compile()
    else:  # engine: both coarse jits of test_engine_path_bit_identical
        from piet_tpu.ops.coarse import coarse_rasterize
        from piet_tpu.renderer.renderer import prepare_scene as prep
        dev = prep(scene, cfg)
        abs_scene = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
            dev)
        kw = dict(tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y,
                  tile_w=cfg.tile_width, tile_h=cfg.tile_height,
                  cmd_capacity=cfg.cmd_capacity,
                  max_segments=cfg.max_segments, max_hits=cfg.max_hits,
                  max_candidates=cfg.max_candidates,
                  max_deltas=cfg.max_deltas, output="entries",
                  sort_impl="pallas")
        for impl in ("xla", "pallas"):
            jax.jit(lambda d, i=impl: coarse_rasterize(
                d, expand_impl=i, **kw)[:-1]).lower(abs_scene).compile()
    print(f"PRECOMPILED {name} env="
          f"{ {k: v for k, v in os.environ.items() if k.startswith('PIET_')} }"
          f" in {time.time() - t0:.0f}s", flush=True)


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "tiger_4k"

    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = SingleDeviceSharding(topo.devices[0])
    names = EXACTNESS if name == "exactness" else (name,)
    for n in names:
        _compile_one(n, sh)
    return 0


if __name__ == "__main__":
    sys.exit(main())
