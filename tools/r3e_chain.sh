#!/bin/bash
# Round-3e on-chip chain (r3d trimmed: the 4K engine A/B compiles were
# not worth the chip hours -- engines target record-scatter stages that
# scale with record count, so beziers_10k is the binding config):
#   1. engine A/B on beziers_10k only (deltas chain = the last XLA
#      scatters; keyed also covers the delta ksum)
#   2. animated_clips under PIET_HITFUSE=0 (r2->r3 regression probe)
#   3. gradient exactness probe (localize the 1-px divergence)
# Waits for the beziers per-stage profile child (r3d step 1) to finish.
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

# Wait (up to 1 h) for the beziers profile's JSON line in the log.
for _ in $(seq 1 120); do
  tail -40 "$LOG" | grep -q '"end_to_end"' && break
  sleep 30
done
ckpt "On-chip r3e: beziers per-stage profile"

say "=== round-3e chain: trimmed engine A/B + probes ==="
say "--- 1. engine A/B on beziers_10k (deltas scatters)"
for impl in "pallas:keyed" "pallas:expand" "pallas:expand,keyed"; do
  say "PIET_EXPAND_IMPL=$impl beziers_10k:"
  timeout 2700 env PIET_EXPAND_IMPL="$impl" \
    python tools/time_config.py beziers_10k >> "$LOG" 2>&1 \
    || say "$impl beziers FAILED/TIMEOUT"
done
ckpt "On-chip r3e: engine A/B (beziers)"

say "--- 2. animated_clips hitfuse A/B"
timeout 2700 env PIET_HITFUSE=0 python tools/time_config.py animated_clips \
  >> "$LOG" 2>&1 || say "animated hitfuse=0 FAILED/TIMEOUT"
ckpt "On-chip r3e: animated hitfuse A/B"

say "--- 3. gradient exactness probe"
timeout 2700 python tools/grad_exact_probe.py >> "$LOG" 2>&1 \
  || say "grad probe FAILED/TIMEOUT"
say "=== round-3e chain done ==="
ckpt "On-chip r3e: gradient probe + chain done"
