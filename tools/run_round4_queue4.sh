#!/bin/bash
# Round-4 on-chip queue, take 4: only ONE of {x8 +stab fine-tune, rescaling
# campaign} fits behind the finished x8 NLL run before the 15:56 hard end.
# The rescaling pillar has ZERO runtime training evidence (VERDICT r3 missing
# item #3) while x8 already has its trained NLL campaign + eval, so rescaling
# goes first; x8 +stab runs only with leftover time.  Waits for the queue3
# eval stage (pid passed as $1) before claiming the chip.
set -u
cd /root/repo
STATUS=/tmp/r4_queue_status
echo "=== queue4 $(date +%H:%M:%S) ===" >> $STATUS

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "$(date +%H:%M:%S) waiting for pid $WAIT_PID (x8_nll_eval2)" >> $STATUS
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 10; done
  echo "$(date +%H:%M:%S) pid $WAIT_PID exited" >> $STATUS
fi

HARD_END=$(date -d "15:56" +%s)

stage() { # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  local now rem
  now=$(date +%s); rem=$(( HARD_END - now ))
  if [ "$rem" -lt 240 ]; then
    echo "$(date +%H:%M:%S) SKIP  $name (hard end)" >> $STATUS
    return 99
  fi
  [ "$t" -gt "$rem" ] && t=$rem
  echo "$(date +%H:%M:%S) START $name (budget ${t}s)" >> $STATUS
  timeout "$t" "$@" > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  echo "$(date +%H:%M:%S) DONE  $name rc=$rc" >> $STATUS
  return $rc
}

# 1. rescaling campaign from scratch (1000 steps; SIGTERM at budget saves latest)
stage resc 2100 python -m hcflow_tpu.cli.train --opt configs/train_rescaling_x4_onchip.yml
stage resc_eval 900 python -m hcflow_tpu.cli.test --opt configs/test_rescaling_x4_onchip.yml

# 2. x8 +stab fine-tune only if real time remains (compile alone needs ~10 min)
stage x8_stab 2700 python -m hcflow_tpu.cli.train --opt configs/train_faces_x8_plus_stab_onchip.yml
stage x8_stab_eval 900 python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_stab_onchip.yml

echo "$(date +%H:%M:%S) QUEUE4 COMPLETE" >> $STATUS
