#!/bin/bash
# Round-2 on-chip measurement sweep (run when the TPU tunnel is up).
#
# One pass over everything that landed while the tunnel was down:
#   1. hardware bit-exactness (tests/test_tpu_exact.py),
#   2. engine-path equality on chip (XLA vs Pallas coarse engines),
#   3. A/B timings: entry pairing x expansion/gather engines on the
#      headline config, then the winning setting on every BASELINE row,
#   4. per-stage profile before/after.
#
# Each timing runs in its own process (the renderer reads PIET_* env at
# trace time).  Results append to tools/onchip_r2.log.
set -u
cd "$(dirname "$0")/.."
LOG=tools/onchip_r2.log
stamp() { date +%H:%M:%S; }
say() { echo "[$(stamp)] $*" | tee -a "$LOG"; }

say "=== on-chip round-2 sweep start ==="

say "--- 1. hardware bit-exactness"
timeout 3000 env PIET_TESTS_TPU=1 \
  python -m pytest tests/test_tpu_exact.py -q 2>&1 | tail -3 | tee -a "$LOG"

say "--- 2. engine equality on chip (coarse xla vs pallas, 4K tiger)"
timeout 3000 python - <<'PY' 2>&1 | tail -4 | tee -a "$LOG"
import numpy as np, jax
from piet_tpu.config import RenderConfig
from piet_tpu.renderer.capacity import fit_capacities
from piet_tpu.renderer.renderer import prepare_scene
from piet_tpu.ops.coarse import coarse_rasterize
from piet_tpu.scene.svg import make_tiger
scene = make_tiger(scale=19.2)
cfg = fit_capacities(scene, RenderConfig(width=3840, height=2160,
                                         tile_height=32, tile_width=128,
                                         cmd_capacity=1024))
dev = prepare_scene(scene, cfg)
kw = dict(tiles_x=cfg.tiles_x, tiles_y=cfg.tiles_y, tile_w=cfg.tile_width,
          tile_h=cfg.tile_height, cmd_capacity=cfg.cmd_capacity,
          max_segments=cfg.max_segments, max_hits=cfg.max_hits,
          max_candidates=cfg.max_candidates, max_deltas=cfg.max_deltas,
          output="entries", sort_impl="pallas")
a = jax.jit(lambda d: coarse_rasterize(d, expand_impl="xla", **kw)[:-1])(dev)
b = jax.jit(lambda d: coarse_rasterize(d, expand_impl="pallas", **kw)[:-1])(dev)
def bits(x):
    x = np.asarray(x)
    return x.view(np.uint32) if x.dtype == np.float32 else x
# Bitwise equality: the f32 entry stream carries bitcast-int payload
# words whose bit patterns can be NaN (NaN != NaN under array_equal).
ok = all(np.array_equal(bits(x), bits(y))
         for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))
print("engines bit-identical on chip:", ok)
PY

say "--- 3. A/B: pairing x engines on tiger_4k"
for pair in 1 0; do
  for eng in xla pallas; do
    say "PIET_PAIR=$pair PIET_EXPAND_IMPL=$eng tiger_4k:"
    timeout 3000 env PIET_PAIR=$pair PIET_EXPAND_IMPL=$eng \
      python tools/time_config.py tiger_4k 2>&1 | tail -1 | tee -a "$LOG"
  done
done

say "--- 4. all configs at defaults (pair=1, engines per current default)"
for cfgname in tiger_4k tiger_8x circles_rects_1k beziers_10k glyph_page_5k animated_clips; do
  timeout 3000 python tools/time_config.py "$cfgname" 2>&1 | tail -1 | tee -a "$LOG"
done

say "--- 5. all configs with Pallas engines"
for cfgname in tiger_4k tiger_8x circles_rects_1k beziers_10k glyph_page_5k animated_clips; do
  timeout 3000 env PIET_EXPAND_IMPL=pallas python tools/time_config.py "$cfgname" 2>&1 | tail -1 | tee -a "$LOG"
done

say "--- 6. per-stage profile (tiger_4k), xla vs pallas engines"
timeout 3000 python -m piet_tpu profile --scene tiger --scale 19.2 \
  --width 3840 --height 2160 2>&1 | tail -30 | tee -a "$LOG" || true
timeout 3000 env PIET_EXPAND_IMPL=pallas python -m piet_tpu profile \
  --scene tiger --scale 19.2 --width 3840 --height 2160 2>&1 | tail -30 | tee -a "$LOG" || true

say "=== sweep done ==="
