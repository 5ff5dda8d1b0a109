#!/bin/bash
# Round-4 on-chip queue: fire the moment the TPU tunnel is back.
# ONE TPU job at a time (NOTES.md: concurrent jobs contend badly on the single
# chip); every stage is timeout-bounded and logs to /tmp/r4_*.log so the queue
# survives a driver-session restart.  Stages keep going on failure (a later
# stage may still succeed), recording per-stage rc in /tmp/r4_queue_status.
set -u
cd /root/repo
STATUS=/tmp/r4_queue_status
: > $STATUS

# Hard deadline (epoch seconds): no stage may hold the chip past this point —
# the driver's end-of-round bench.py/dryrun must find the TPU claim free.
# Default 15:30 today; override via R4_DEADLINE.
DEADLINE=${R4_DEADLINE:-$(date -d "15:30" +%s)}

stage() { # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  local now rem
  now=$(date +%s); rem=$(( DEADLINE - now ))
  if [ "$rem" -lt 300 ]; then
    echo "$(date +%H:%M:%S) SKIP  $name (deadline)" >> $STATUS
    return 99
  fi
  [ "$t" -gt "$rem" ] && t=$rem
  echo "$(date +%H:%M:%S) START $name (budget ${t}s)" >> $STATUS
  timeout "$t" "$@" > "/tmp/r4_${name}.log" 2>&1
  local rc=$?
  echo "$(date +%H:%M:%S) DONE  $name rc=$rc" >> $STATUS
  return $rc
}

# 0. bench validation: confirm the round-3 fori-all number on silicon
stage bench 2400 python bench.py
cp /tmp/r4_bench.log /tmp/bench_r4_check.json 2>/dev/null

train_stage() { # name timeout_s config — retry once after a device failure
  local name=$1 t=$2 cfg=$3
  stage "$name" "$t" python -m hcflow_tpu.cli.train --opt "$cfg"
  local rc=$?
  if [ $rc -ne 0 ] && [ $rc -ne 99 ]; then
    # rc=75 is the CLI's explicit EX_TEMPFAIL (device failure, checkpoint
    # saved); timeouts/crashes also auto-resume.  Re-probe readiness first.
    echo "$(date +%H:%M:%S) RETRY $name after rc=$rc" >> $STATUS
    timeout 2400 bash -c 'until python tools/tpu_ready.py 90 | grep -q READY; do sleep 300; done'
    stage "${name}_retry" "$t" python -m hcflow_tpu.cli.train --opt "$cfg"
  fi
}

# 1. x8 NLL campaign (4000 steps, ~1h)
train_stage x8_nll 14400 configs/train_faces_x8_nll_onchip.yml

# 2. x8 NLL eval grid
stage x8_nll_eval 5400 python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_nll_onchip.yml

# 3. x8 +stab fine-tune (2000 steps)
train_stage x8_stab 14400 configs/train_faces_x8_plus_stab_onchip.yml

# 4. x8 stab eval grid
stage x8_stab_eval 5400 python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_stab_onchip.yml

# 5. rescaling campaign (4000 steps)
train_stage resc 14400 configs/train_rescaling_x4_onchip.yml

# 6. rescaling eval (reference protocol: fake-LR fidelity + HR reconstruction)
stage resc_eval 3600 python -m hcflow_tpu.cli.test --opt configs/test_rescaling_x4_onchip.yml

# 7. serving-reverse segment profile for the perf push
stage profile 3600 python tools/profile_reverse.py

# 8. RRDB kernel variant sweep (per-source grid split + mm chunk sizes)
stage rdb_sweep 5400 bash tools/sweep_rdb_kernel.sh /tmp/rdb_sweep.jsonl

echo "$(date +%H:%M:%S) QUEUE COMPLETE" >> $STATUS
