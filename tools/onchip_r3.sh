#!/bin/bash
# Round-3 on-chip measurement sweep (run when the TPU tunnel is up and the
# exactness suite has finished -- it shares the one chip).
#
#   1. A/B: fine-kernel run dispatch (PIET_RUNS) on every BASELINE config,
#   2. engine-path bitwise equality probe + bisect input (expansion only
#      vs keyed vs gatherm -- see step 2b),
#   3. all configs at defaults -> BENCH numbers,
#   4. per-stage profile at tiger_4k (current, post run-dispatch).
#
# Each timing runs in its own process (the renderer reads PIET_* env at
# trace time).  Results append to tools/onchip_r3.log.
set -u
cd "$(dirname "$0")/.."
LOG=tools/onchip_r3.log
stamp() { date +%H:%M:%S; }
say() { echo "[$(stamp)] $*" | tee -a "$LOG"; }

say "=== on-chip round-3 sweep start ==="

say "--- 1. A/B run dispatch (PIET_RUNS) on tiger_4k + beziers_10k"
for runs in 1 0; do
  for cfgname in tiger_4k beziers_10k; do
    say "PIET_RUNS=$runs $cfgname:"
    timeout 3000 env PIET_RUNS=$runs \
      python tools/time_config.py "$cfgname" 2>&1 | tail -1 | tee -a "$LOG"
  done
done

say "--- 2. engine equality on chip (coarse xla vs pallas, 4K tiger)"
timeout 3000 python tools/engine_probe.py 2>&1 | tail -8 | tee -a "$LOG"

say "--- 3. all configs at defaults"
for cfgname in tiger_4k tiger_8x circles_rects_1k beziers_10k glyph_page_5k animated_clips; do
  timeout 3000 python tools/time_config.py "$cfgname" 2>&1 | tail -1 | tee -a "$LOG"
done

say "--- 4. per-stage profile (tiger_4k, current defaults)"
timeout 3000 python -m piet_tpu profile --scene tiger --scale 19.2 \
  --width 3840 --height 2160 2>&1 | tail -30 | tee -a "$LOG" || true

say "=== sweep done ==="
