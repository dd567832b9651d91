#!/bin/bash
# Round-4 exactness follow-up: waits for the main chain (tools/r4_chain.sh)
# to finish, then runs the hardware exactness suite with PIET_TESTS_TPU=1
# (the chain's first attempt ran without it and every test silently
# skipped -- conftest pins tests to CPU unless that escape hatch is set).
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

# Wait (up to 4 h) for the main chain to finish.
for _ in $(seq 1 480); do
  tail -5 "$LOG" | grep -q 'round-4 chain done' && break
  sleep 30
done

say "--- exactness suite (PIET_TESTS_TPU=1, re-run)"
for t in test_fine_kernel_bit_exact_on_tpu \
         test_full_renderer_bit_exact_on_tpu \
         test_full_renderer_bit_exact_on_tpu_32row_tiles \
         test_clip_layer_scene_exact_on_tpu \
         test_gradient_scene_exact_on_tpu \
         test_engine_path_bit_identical_on_tpu; do
  say "exactness $t:"
  timeout 3600 env PIET_TESTS_TPU=1 \
    python -m pytest "tests/test_tpu_exact.py::$t" -q \
    >> "$LOG" 2>&1 || say "exactness $t FAILED/TIMEOUT"
  ckpt "On-chip r4: exactness $t"
done
say "=== round-4 exactness follow-up done ==="
ckpt "On-chip r4: exactness suite done"
