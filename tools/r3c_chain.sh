#!/bin/bash
# Round-3c on-chip chain: measure the restructured fine kernel
# (window-free full-tile updates + in-place per-class resolves), then
# re-run the hardware exactness suite against it, then the full sweep.
#
#   1. tiger_4k + beziers_10k at the new defaults (the two A/B configs)
#   2. fine_entry_bench: per-class ns/entry + ns/tile decomposition
#   3. per-stage profile at 4K
#   4. hardware exactness suite -- one pytest PER TEST with its own
#      timeout, so a slow compile cannot take the rest down (the
#      round-3 "test 4 hang" post-mortem; the compile bomb itself is
#      fixed -- explicit capacities + ops/sort.py guard)
#   5. full 6-config sweep (BENCH_r03-ready numbers)
#
# Runs under setsid; commits logs after each step.
set -u
cd "$(dirname "$0")/.."
LOG=tools/onchip_r3.log
EXLOG=tools/onchip_r3_exact.log
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=1
export PYTHONUNBUFFERED=1
stamp() { date +%H:%M:%S; }
say() { echo "[$(stamp)] $*" >> "$LOG"; }
ckpt() {
  git add "$LOG" "$EXLOG" 2>/dev/null
  git commit -m "$1" --only "$LOG" "$EXLOG" >/dev/null 2>&1 || true
}

say "=== round-3c chain: window-free + in-place-resolve fine kernel ==="

say "--- 1. tiger_4k + beziers_10k at new defaults"
for c in tiger_4k beziers_10k; do
  timeout 2700 python tools/time_config.py "$c" >> "$LOG" 2>&1 \
    || say "$c FAILED/TIMEOUT"
done
ckpt "On-chip r3c: A/B configs at new fine kernel"

say "--- 2. fine_entry_bench decomposition (runs on, then off)"
timeout 2700 python tools/fine_entry_bench.py >> "$LOG" 2>&1 \
  || say "fine_entry_bench FAILED/TIMEOUT"
timeout 2700 env PIET_RUNS=0 python tools/fine_entry_bench.py \
  >> "$LOG" 2>&1 || say "fine_entry_bench PIET_RUNS=0 FAILED/TIMEOUT"
ckpt "On-chip r3c: fine-kernel cost decomposition"

say "--- 3. per-stage profile (tiger_4k)"
timeout 2700 python -m piet_tpu profile --scene tiger --scale 19.2 \
  --width 3840 --height 2160 >> "$LOG" 2>&1 || say "profile FAILED/TIMEOUT"
ckpt "On-chip r3c: per-stage profile"

say "--- 4. hardware exactness suite (per-test invocations)"
echo "=== round-3c on-chip exactness $(date '+%F %T') ===" >> "$EXLOG"
for t in test_fine_kernel_bit_exact_on_tpu \
         test_full_renderer_bit_exact_on_tpu \
         test_full_renderer_bit_exact_on_tpu_32row_tiles \
         test_clip_layer_scene_exact_on_tpu \
         test_gradient_scene_exact_on_tpu \
         test_engine_path_bit_identical_on_tpu; do
  timeout 2700 env PIET_TESTS_TPU=1 python -m pytest \
    "tests/test_tpu_exact.py::$t" -v -p no:cacheprovider >> "$EXLOG" 2>&1 \
    || say "exactness $t FAILED/TIMEOUT"
done
ckpt "On-chip r3c: hardware exactness suite"

say "--- 5. full sweep at defaults"
timeout 2700 python bench.py >> "$LOG" 2>&1 || say "bench FAILED/TIMEOUT"
say "=== round-3c chain done ==="
ckpt "On-chip r3c: full sweep + chain done"
