#!/bin/bash
# Round-5 part 2: 0-d-fix bench + engine A/Bs + on-chip exactness.
# Serialized (single libtpu user at a time); retry/backoff per step.
set -u
cd "$(dirname "$0")/.."
LOG=tools/onchip_r5.log
stamp() { date +"[%H:%M:%S]"; }

run_step() {
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

echo "$(stamp) ===== round-5b chain start =====" | tee -a "$LOG"

# Headline with the 0-d stats fix (cache primed for all but beziers).
run_step bench_0dfix 5400 python bench.py

# Engine A/Bs (each variant compiles cold once; PIET_EXPAND_IMPL is read
# at trace time by expand_choice).
run_step ab_4k_keyed 1800 env PIET_EXPAND_IMPL=pallas:keyed \
  python tools/time_config.py tiger_4k
run_step ab_4k_gatherm 1800 env PIET_EXPAND_IMPL=pallas:gatherm \
  python tools/time_config.py tiger_4k
run_step ab_4k_keyed_gatherm 1800 env PIET_EXPAND_IMPL=pallas:keyed,gatherm \
  python tools/time_config.py tiger_4k
run_step ab_bez_expand_keyed 3600 env PIET_EXPAND_IMPL=pallas \
  python tools/time_config.py beziers_10k
run_step ab_anim_keyed 1800 env PIET_EXPAND_IMPL=pallas:keyed \
  python tools/time_config.py animated_clips

# On-chip exactness suite (strict; compile cache primed).
run_step exactness 7200 env PIET_TESTS_TPU=1 \
  python -m pytest tests/test_tpu_exact.py -q -p no:cacheprovider

echo "$(stamp) ===== round-5b chain done =====" | tee -a "$LOG"
