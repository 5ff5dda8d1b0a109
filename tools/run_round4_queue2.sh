#!/bin/bash
# Round-4 on-chip queue, take 2: the first launch burned the x8 slots on the
# missing regenerated pklv4 sets (datasets/ is gitignored and was reset between
# rounds — regenerate BEFORE launching; see the config headers).  bench.py was
# already driver-style-verified this round (10.472 MP/s fori-all, /tmp/r4_bench.log)
# so this queue goes straight to the trained campaigns.
set -u
cd /root/repo
STATUS=/tmp/r4_queue_status
echo "=== queue2 $(date +%H:%M:%S) ===" >> $STATUS

DEADLINE=${R4_DEADLINE:-$(date -d "15:40" +%s)}

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

# 1-2. x8 NLL campaign (4000 steps) + eval grid
stage x8_nll 9000 python -m hcflow_tpu.cli.train --opt configs/train_faces_x8_nll_onchip.yml
stage x8_nll_eval 3600 python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_nll_onchip.yml

# 3-4. x8 +stab fine-tune (2000 steps) + eval grid
stage x8_stab 5400 python -m hcflow_tpu.cli.train --opt configs/train_faces_x8_plus_stab_onchip.yml
stage x8_stab_eval 3600 python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_stab_onchip.yml

# 5-6. rescaling campaign (4000 steps) + reference eval protocol
stage resc 7200 python -m hcflow_tpu.cli.train --opt configs/train_rescaling_x4_onchip.yml
stage resc_eval 3600 python -m hcflow_tpu.cli.test --opt configs/test_rescaling_x4_onchip.yml

# 7. serving-reverse segment profile for the perf push
stage profile 3600 python tools/profile_reverse.py

# 8. RRDB kernel variant sweep
stage rdb_sweep 5400 bash tools/sweep_rdb_kernel.sh /tmp/rdb_sweep.jsonl

echo "$(date +%H:%M:%S) QUEUE2 COMPLETE" >> $STATUS
