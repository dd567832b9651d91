#!/bin/bash
# Round-4b: post-exactness measurements on the NEW code (searchsorted
# expansion, pair-row endpoint gather, auto expand engine, tpb fine
# kernel, dispatch-floor profiler):
#   1. per-stage profiles (tiger_4k + beziers_10k) -- attribution for the
#      next optimization step (is cand_expand real compute?)
#   2. pairing A/B (entries halve; fine per-entry cost changed since the
#      round-2 "pairing loses" verdict)
#   3. animated_clips tpb=1 datum (crashed in the main chain)
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

# Wait (up to 6 h) for the exactness follow-up to finish.
for _ in $(seq 1 720); do
  tail -8 "$LOG" | grep -q 'round-4 exactness follow-up done' && break
  sleep 30
done

say "=== round-4b: post-exactness measurements ==="
say "--- 1. per-stage profiles (new code + dispatch floor)"
timeout 3600 python -m piet_tpu profile --scene tiger --scale 19.2 \
  --width 3840 --height 2160 >> "$LOG" 2>&1 || say "tiger profile FAILED"
ckpt "On-chip r4b: tiger profile (new code)"
timeout 3600 python -m piet_tpu profile --scene beziers_10k \
  --width 1024 --height 1024 >> "$LOG" 2>&1 || say "beziers profile FAILED"
ckpt "On-chip r4b: beziers profile (new code)"

say "--- 2. pairing A/B"
for cfgname in tiger_4k beziers_10k; do
  say "PIET_PAIR=1 $cfgname:"
  timeout 2700 env PIET_PAIR=1 \
    python tools/time_config.py "$cfgname" >> "$LOG" 2>&1 \
    || say "pair $cfgname FAILED/TIMEOUT"
done
ckpt "On-chip r4b: pairing A/B"

say "--- 3. animated tpb=1 datum"
timeout 1800 env PIET_FINE_TPB=1 \
  python tools/time_config.py animated_clips >> "$LOG" 2>&1 \
  || say "animated tpb=1 FAILED/TIMEOUT"
say "=== round-4b done ==="
ckpt "On-chip r4b: done"
