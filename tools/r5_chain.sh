#!/bin/bash
# Round-5 measurement chain: bench + profile + dispatch probe + on-chip
# exactness, serialized (never run kernels concurrently on the chip --
# a crashing kernel poisons the device context) and HARDENED (VERDICT r4
# item 7): every step retries with backoff on failure/timeout, so a
# transient FAILED_PRECONDITION or tunnel blip no longer leaves holes in
# the round's evidence.  Log: tools/onchip_r5.log.
set -u
cd "$(dirname "$0")/.."
LOG=tools/onchip_r5.log
stamp() { date +"[%H:%M:%S]"; }

run_step() {
  # run_step <name> <timeout_s> <cmd...>
  local name="$1" tmo="$2"; shift 2
  local attempt rc
  for attempt in 1 2 3; do
    echo "$(stamp) --- $name (attempt $attempt)" | tee -a "$LOG"
    timeout "$tmo" "$@" >>"$LOG" 2>&1
    rc=$?
    if [ $rc -eq 0 ]; then
      echo "$(stamp) $name OK" | tee -a "$LOG"
      return 0
    fi
    echo "$(stamp) $name FAILED rc=$rc; backing off 60s" | tee -a "$LOG"
    sleep 60
  done
  echo "$(stamp) $name GAVE UP after 3 attempts" | tee -a "$LOG"
  return 1
}

PHASE="${1:-all}"
echo "$(stamp) ===== round-5 chain start (phase=$PHASE) =====" | tee -a "$LOG"

if [ "$PHASE" = "perf" ] || [ "$PHASE" = "all" ]; then
run_step bench 3600 python bench.py
run_step profile_4k 2400 python -m piet_tpu profile \
  --width 3840 --height 2160 --scale 19.2 --frames 40
run_step dispatch_probe 2400 python tools/dispatch_probe.py --reps 40
run_step beziers_profile 2400 python -m piet_tpu profile \
  --scene beziers_10k --width 1024 --height 1024 --frames 40
run_step animated_profile 2400 python -m piet_tpu profile \
  --scene animated --width 1024 --height 1024 --frames 40
fi

if [ "$PHASE" = "exact" ] || [ "$PHASE" = "all" ]; then
# On-chip exactness suite (strict; PIET_TESTS_TPU=1 or everything
# silently skips).  Reuses the persistent compile cache -- prime it
# first without the chip: tools/precompile_cache.py exactness.
run_step exactness 10800 env PIET_TESTS_TPU=1 \
  python -m pytest tests/test_tpu_exact.py -q -p no:cacheprovider
fi

echo "$(stamp) ===== round-5 chain done =====" | tee -a "$LOG"
