#!/bin/bash
# Round-4 on-chip chain:
#   1. hardware exactness suite (re-pin after the tpb fine-kernel change)
#   2. fine-kernel TPB A/B (multi-tile grid blocks vs tpb=1)
#   3. expand-engine A/B (single engine, proven bit-identical on chip)
#   4. per-stage profiles with the new sub-probes + monotone profiler
#      (beziers_10k + tiger_4k)
#   5. animated device-side animation wall fps (VERDICT item 6)
#   6. full bench.py (roofline split + BENCH numbers at new defaults)
set -u
cd "$(dirname "$0")/.."
LOG=tools/onchip_r4.log
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export PYTHONUNBUFFERED=1
stamp() { date +%H:%M:%S; }
say() { echo "[$(stamp)] $*" >> "$LOG"; }
ckpt() {
  git add "$LOG" 2>/dev/null
  git commit -m "$1" --only "$LOG" >/dev/null 2>&1 || true
}

say "=== round-4 chain ==="
say "--- 1. hardware exactness suite"
for t in test_fine_kernel_bit_exact_on_tpu \
         test_full_renderer_bit_exact_on_tpu \
         test_full_renderer_bit_exact_on_tpu_32row_tiles \
         test_clip_layer_scene_exact_on_tpu \
         test_gradient_scene_exact_on_tpu \
         test_engine_path_bit_identical_on_tpu; do
  timeout 2400 env PIET_TESTS_TPU=1 \
    python -m pytest "tests/test_tpu_exact.py::$t" -q \
    >> "$LOG" 2>&1 || say "exactness $t FAILED/TIMEOUT"
done
ckpt "On-chip r4: exactness suite"

say "--- 2. fine TPB A/B"
for cfgname in tiger_4k beziers_10k tiger_8x animated_clips; do
  for tpbv in 1 auto; do
    say "PIET_FINE_TPB=$tpbv $cfgname:"
    timeout 2700 env PIET_FINE_TPB="$tpbv" \
      python tools/time_config.py "$cfgname" >> "$LOG" 2>&1 \
      || say "tpb=$tpbv $cfgname FAILED/TIMEOUT"
  done
done
ckpt "On-chip r4: TPB A/B"

say "--- 3. expand-engine A/B (single engine)"
for cfgname in tiger_4k beziers_10k; do
  say "PIET_EXPAND_IMPL=pallas:expand $cfgname:"
  timeout 2700 env PIET_EXPAND_IMPL="pallas:expand" \
    python tools/time_config.py "$cfgname" >> "$LOG" 2>&1 \
    || say "expand $cfgname FAILED/TIMEOUT"
done
ckpt "On-chip r4: expand A/B"

say "--- 4. per-stage profiles (sub-probes, monotone)"
timeout 3600 python -m piet_tpu profile --scene beziers_10k \
  --width 1024 --height 1024 >> "$LOG" 2>&1 || say "beziers profile FAILED"
timeout 3600 python -m piet_tpu profile --scene tiger --scale 19.2 \
  --width 3840 --height 2160 >> "$LOG" 2>&1 || say "tiger profile FAILED"
ckpt "On-chip r4: per-stage profiles"

say "--- 5. animated device-anim wall fps"
timeout 1800 python -m piet_tpu animate --scene animated --frames 120 \
  --width 1024 --height 1024 --outdir /tmp/r4_frames \
  >> "$LOG" 2>&1 || say "animate FAILED"
ckpt "On-chip r4: device-anim fps"

say "--- 6. full bench (roofline)"
timeout 5400 python bench.py >> "$LOG" 2>&1 || say "bench FAILED"
ckpt "On-chip r4: bench + roofline"
say "=== round-4 chain done ==="
