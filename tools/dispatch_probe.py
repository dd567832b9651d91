"""Dispatch-floor attribution probe (round 5, VERDICT r4 item 3).

The round-4 profiler isolated a ~0.84 ms/step cost that every dispatch
pays on this host/tunnel (piet_tpu/profiling.py ``dispatch_floor`` row:
a near-empty jit over the production DeviceScene inputs, timed
pipelined).  This probe decomposes WHERE it accrues by timing null jits
that vary one axis at a time:

  null_12leaf   the profiler's floor fn: d.tags[0] over the full
                12-leaf DeviceScene (per-argument marshaling cost x12)
  null_1small   one (128,) i32 input -> its first element
  null_1big     one packed staging buffer (renderer.pack_scene size)
  null_0in      zero-input jit returning a constant
  out_12        1 small input -> 12 small outputs (per-output cost)
  out_1         1 small input -> 1 small output
  donated       null_1big with the buffer donated (aliasing path)
  render        the production render step (image + stats dict)
  render_img    render returning ONLY the image (fewer output buffers)
  chain4/chain16  4/16 frames per dispatch via lax.map over a stacked
                scene -- the amortization ceiling for animation loops

Usage (on the TPU host):  python tools/dispatch_probe.py [--reps 40]
Prints one JSON line per experiment.
"""

from __future__ import annotations

import argparse
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from piet_tpu.config import RenderConfig                     # noqa: E402
from piet_tpu.profiling import _time_pipelined               # noqa: E402
from piet_tpu.renderer.capacity import fit_capacities        # noqa: E402
from piet_tpu.renderer.renderer import (make_render_fn,      # noqa: E402
                                        pack_scene, prepare_scene,
                                        render_slab, stack_scenes)
from piet_tpu.scene.svg import make_tiger                    # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=40)
    ap.add_argument("--width", type=int, default=3840)
    ap.add_argument("--height", type=int, default=2160)
    ap.add_argument("--scale", type=float, default=19.2)
    ap.add_argument("--skip-render", action="store_true",
                    help="only the null-jit family (fast)")
    args = ap.parse_args()

    scene = make_tiger(scale=args.scale)
    cfg = fit_capacities(scene, RenderConfig(
        width=args.width, height=args.height))
    dev = prepare_scene(scene, cfg)
    packed = jnp.asarray(pack_scene(scene, cfg))
    small = jnp.arange(128, dtype=jnp.int32)

    results = {}

    def run(name, fn, *xs, reps=None):
        ms = _time_pipelined(fn, xs, reps or args.reps)
        results[name] = round(ms, 4)
        print(json.dumps({"probe": name, "ms_per_step": round(ms, 4)}),
              flush=True)

    run("null_12leaf", jax.jit(lambda d: d.tags[0]), dev)
    run("null_1small", jax.jit(lambda x: x[0]), small)
    run("null_1big", jax.jit(lambda x: x[0]), packed)
    run("null_0in", jax.jit(lambda: jnp.int32(7)))
    run("out_1", jax.jit(lambda x: x + 1), small)
    run("out_12", jax.jit(lambda x: tuple(x + i for i in range(12))), small)
    # The first probe round measured returning a () SCALAR at ~0.86
    # ms/step vs ~0.2 for a (128,) vector from the same input -- the
    # floor looked like a 0-d-output artifact of the tunneled backend.
    # Differential: same math, output rank 0 vs rank 1.
    run("out_0d", jax.jit(lambda x: (x + 1)[0]), small)
    run("out_1d1", jax.jit(lambda x: (x + 1)[:1]), small)
    run("out_12x0d", jax.jit(
        lambda x: tuple((x + i)[0] for i in range(12))), small)

    if args.skip_render:
        print(json.dumps(results), flush=True)
        return

    render = make_render_fn(cfg)
    run("render", lambda d: render(d)[0], dev)

    @jax.jit
    def render_img(d):
        img, _ = render_slab(d, cfg, tiles_y=cfg.tiles_y, row0=0,
                             fine_impl="pallas")
        return img[:cfg.height, :cfg.width]
    run("render_img", render_img, dev)

    for k in (4, 16):
        stacked = stack_scenes([scene] * k, cfg)

        @jax.jit
        def render_k(ds):
            def one(d):
                img, _ = render_slab(d, cfg, tiles_y=cfg.tiles_y, row0=0,
                                     fine_impl="pallas")
                return img[0, 0]
            return jax.lax.map(one, ds)

        ms = _time_pipelined(render_k, (stacked,), max(args.reps // k, 3))
        results[f"chain{k}_per_frame"] = round(ms / k, 4)
        print(json.dumps({"probe": f"chain{k}_per_frame",
                          "ms_per_step": round(ms / k, 4)}), flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
