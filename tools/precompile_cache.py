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


def main() -> int:
    name = sys.argv[1] if len(sys.argv) > 1 else "tiger_4k"

    from jax.experimental import topologies
    from jax.sharding import SingleDeviceSharding

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
    make, w, h = configs[name]
    scene = make()
    cfg = fit_capacities(scene, RenderConfig(
        width=w, height=h, tile_height=32, tile_width=128,
        cmd_capacity=1024))
    dev = prepare_scene(scene, cfg)

    topo = topologies.get_topology_desc(platform="tpu",
                                        topology_name="v5e:2x2")
    sh = SingleDeviceSharding(topo.devices[0])
    abs_scene = DeviceScene(*(
        jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh) for x in dev))

    # fine_impl pinned to what _resolve_fine_impl gives ON the chip
    # ("auto" would resolve to "xla" here, where the backend is cpu).
    fn = make_render_fn(cfg, fine_impl="pallas")
    t0 = time.time()
    fn.lower(abs_scene).compile()
    print(f"PRECOMPILED {name} env="
          f"{ {k: v for k, v in os.environ.items() if k.startswith('PIET_')} }"
          f" in {time.time() - t0:.0f}s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
