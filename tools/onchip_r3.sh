#!/bin/bash
# Round-3 on-chip measurement sweep (run when the TPU tunnel is up and the
# exactness suite has finished -- it shares the one chip).
#
#   0. division-lowering probe (gates the fused hit kernel's t_edge),
#   1. A/B: fused hit kernel (PIET_HITFUSE) x run dispatch (PIET_RUNS)
#      on tiger_4k + beziers_10k,
#   2. engine equality bisect (tools/engine_probe.py),
#   3. all configs at defaults -> BENCH numbers,
#   4. per-stage profile at tiger_4k (current defaults).
#
# Each timing runs in its own process (the renderer reads PIET_* env at
# trace time).  Results append to tools/onchip_r3.log.
set -u
cd "$(dirname "$0")/.."
LOG=tools/onchip_r3.log
stamp() { date +%H:%M:%S; }
say() { echo "[$(stamp)] $*" | tee -a "$LOG"; }

say "=== on-chip round-3 sweep start ==="

say "--- 0. f32 division lowering: Mosaic vs XLA:TPU vs numpy"
timeout 1200 python tools/div_probe.py 2>&1 | tail -3 | tee -a "$LOG"

say "--- 1. A/B: PIET_HITFUSE / PIET_RUNS on tiger_4k + beziers_10k"
# 3 settings, not the full 2x2 (compiles are ~450 s each on this 1-CPU
# host): defaults (fuse+runs), fuse off, runs off.
for ab in "1 1" "0 1" "1 0"; do
  set -- $ab
  for cfgname in tiger_4k beziers_10k; do
    say "PIET_HITFUSE=$1 PIET_RUNS=$2 $cfgname:"
    timeout 3000 env PIET_HITFUSE=$1 PIET_RUNS=$2 \
      python tools/time_config.py "$cfgname" 2>&1 | tail -1 | tee -a "$LOG"
  done
done

say "--- 2. engine equality bisect (coarse xla vs pallas engines)"
timeout 6000 python tools/engine_probe.py 2>&1 | tail -12 | tee -a "$LOG"

say "--- 3. all configs at defaults"
for cfgname in tiger_4k tiger_8x circles_rects_1k beziers_10k glyph_page_5k animated_clips; do
  timeout 3000 python tools/time_config.py "$cfgname" 2>&1 | tail -1 | tee -a "$LOG"
done

say "--- 4. per-stage profile (tiger_4k, current defaults)"
timeout 3000 python -m piet_tpu profile --scene tiger --scale 19.2 \
  --width 3840 --height 2160 2>&1 | tail -30 | tee -a "$LOG" || true

say "--- 5. half/bf16 state experiment (VERDICT round-2 missing #3)"
timeout 1800 python tools/half_experiment.py 2>&1 | tail -8 | tee -a "$LOG" || true

say "=== sweep done ==="
