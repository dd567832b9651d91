#!/bin/bash
# Round-3 follow-up chain: finish the three on-chip steps the first chain
# lost (see tools/onchip_r3.log):
#   1. the hardware bit-exactness suite -- the round-3 run died mid-test-4
#      (its launcher session exited and took the pytest job with it), so
#      tools/onchip_r3_exact.log is truncated at 3/6 PASSED.  Re-run to a
#      complete 6/6 log (round-2 VERDICT item 1).
#   2. engine equality bisect -- crashed on a sys.path bug (tools/ was
#      sys.path[0], piet_tpu unimportable in the child); fixed.
#   3. half/bf16 experiment -- Mosaic refused the bf16 vector compare;
#      the compare now runs in f32 in both dtypes.
# Runs under setsid so session death can't kill it; commits after each
# step.
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

say "=== round-3b chain: redo exactness + engine probe + half ==="

echo "=== round-3b on-chip exactness re-run $(date '+%F %T') ===" >> "$EXLOG"
timeout 9000 env PIET_TESTS_TPU=1 python -m pytest tests/test_tpu_exact.py \
  -v -p no:cacheprovider >> "$EXLOG" 2>&1 \
  || say "exactness suite FAILED/TIMEOUT (see $EXLOG)"
ckpt "On-chip r3b: complete hardware exactness log"

say "--- engine equality bisect (retry, sys.path fixed)"
timeout 7200 python tools/engine_probe.py >> "$LOG" 2>&1 \
  || say "engine_probe FAILED/TIMEOUT"
ckpt "On-chip r3b: engine bisect"

say "--- half/bf16 state experiment (retry, f32 compare)"
timeout 1800 python tools/half_experiment.py >> "$LOG" 2>&1 \
  || say "half_experiment FAILED/TIMEOUT"
say "=== round-3b chain done ==="
ckpt "On-chip r3b: half experiment + chain done"
