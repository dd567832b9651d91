#!/bin/bash
# Round-3d on-chip chain: coarse-side experiments after the fine-kernel
# residency work.  The deltas chain is now the coarse pass's only user
# of the XLA scatter expansions (cands+hits ride the fused kernels), so
# the round-2 "engines lose end-to-end" verdict needs re-measuring
# per-engine in the round-3 pipeline:
#   1. beziers_10k per-stage profile (the coarse-bound config; the fixed
#      profiler now times the production runs-on fine kernel)
#   2. tiger_4k + beziers_10k under PIET_EXPAND_IMPL subsets
#   3. animated_clips under PIET_HITFUSE=0 (r2->r3 regression probe)
# Runs under setsid; waits for the r3c chain to release the chip.
set -u
cd "$(dirname "$0")/.."
LOG=tools/onchip_r3.log
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export PYTHONUNBUFFERED=1
stamp() { date +%H:%M:%S; }
say() { echo "[$(stamp)] $*" >> "$LOG"; }
ckpt() {
  git add "$LOG" 2>/dev/null
  git commit -m "$1" --only "$LOG" >/dev/null 2>&1 || true
}

# Wait (up to 4 h) for the r3c chain's done marker in the log.
for _ in $(seq 1 480); do
  grep -q "round-3c chain done" "$LOG" && break
  sleep 30
done

say "=== round-3d chain: coarse engine/hitfuse experiments ==="

say "--- 1. beziers_10k per-stage profile (fixed fine probe)"
timeout 2700 python -m piet_tpu profile --scene beziers_10k \
  --width 1024 --height 1024 >> "$LOG" 2>&1 \
  || say "beziers profile FAILED/TIMEOUT"
ckpt "On-chip r3d: beziers per-stage profile"

say "--- 2. engine A/B on the deltas chain (the last XLA scatters)"
for impl in "pallas:keyed" "pallas:expand" "pallas:expand,keyed" "pallas"; do
  for c in tiger_4k beziers_10k; do
    say "PIET_EXPAND_IMPL=$impl $c:"
    timeout 2700 env PIET_EXPAND_IMPL="$impl" \
      python tools/time_config.py "$c" >> "$LOG" 2>&1 \
      || say "$impl $c FAILED/TIMEOUT"
  done
done
ckpt "On-chip r3d: engine A/B"

say "--- 3. animated_clips hitfuse A/B (r2->r3 regression probe)"
timeout 2700 env PIET_HITFUSE=0 python tools/time_config.py animated_clips \
  >> "$LOG" 2>&1 || say "animated hitfuse=0 FAILED/TIMEOUT"
say "=== round-3d chain done ==="
ckpt "On-chip r3d: hitfuse A/B + chain done"
