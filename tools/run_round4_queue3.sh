#!/bin/bash
# Round-4 on-chip queue, take 3: queue2's 15:40 deadline could not fit the
# x8 +stab AND rescaling campaigns behind the (slow-compiling) x8 NLL run, so
# its driver was detached and this queue takes over when the running x8_nll
# training process exits.  Budgets were re-cut: stab/rescaling niter trimmed to
# 1000 in their configs, evals read latest_G.ckpt (written by both the natural
# and the SIGTERM-preemption exits), and every stage has a hard timeout so the
# chip is free before the driver's end-of-round bench (~16:00).
set -u
cd /root/repo
STATUS=/tmp/r4_queue_status
echo "=== queue3 $(date +%H:%M:%S) ===" >> $STATUS

WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "$(date +%H:%M:%S) waiting for pid $WAIT_PID (x8_nll)" >> $STATUS
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

# 1. eval grid for the finished x8 NLL checkpoint (TPU evals measured ~7 min)
stage x8_nll_eval2 900 python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_nll_onchip.yml

# 2. x8 +stab fine-tune (1000 steps; SIGTERM at budget still saves latest)
stage x8_stab 2700 python -m hcflow_tpu.cli.train --opt configs/train_faces_x8_plus_stab_onchip.yml
stage x8_stab_eval 900 python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_stab_onchip.yml

# 3. rescaling campaign from scratch (1000 steps) + reference eval protocol
stage resc 2100 python -m hcflow_tpu.cli.train --opt configs/train_rescaling_x4_onchip.yml
stage resc_eval 900 python -m hcflow_tpu.cli.test --opt configs/test_rescaling_x4_onchip.yml

# 4. opportunistic: serving-reverse profile for the perf push (only if time)
stage profile 1200 python tools/profile_reverse.py

echo "$(date +%H:%M:%S) QUEUE3 COMPLETE" >> $STATUS
