#!/bin/bash
# Round-5 master supervisor.  Replaces x8_campaign_chain2.sh + run_round5_queue.sh
# after the multi-hour tunnel outage exhausted their short retry horizons.
#
# Strategy (one TPU job at a time — NOTES host/claim gotchas):
#   0. Poll the backend with a LONG horizon (tools/tpu_ready.py, bounded probes).
#   A. Fast, high-value measurements first so the round has perf numbers even if
#      the chip dies again: bench baseline repro, resident-trunk bench
#      (HCFLOW_RDB_TRUNK=1 — decides the bench.py default), rescaling serving
#      bench (VERDICT r4 #2/#3).
#   B. x8 campaign (VERDICT r4 #1): resume NLL 2000->4000 (auto-resume), eval,
#      +stab fine-tune 2000 iters, eval.  Train stages get TERM-based timeouts
#      (the trainer saves state + exits cleanly on SIGTERM) with >=35 min slack
#      for recoverable mid-run tunnel stalls (NOTES round-4).
#   C. Rescaling scaling curve (VERDICT r4 #7) with whatever budget remains.
#
# All stage transitions re-probe readiness; every result lands in /tmp/r5_*.
set -u
cd /root/repo

NOW=$(date +%s)
# ABS_END must land comfortably BEFORE the driver's end-of-round bench: a
# training process still holding the single TPU claim would block the driver's
# bench.py (futex wait) and blank BENCH_r05.  Default 4.5 h.
ABS_END=$(( NOW + ${SUP_WINDOW_S:-16200} ))
POLL_END=$(( ABS_END - 3600 ))                # stop waiting for a dead backend 1 h before

log() { echo "[sup $(date -u +%H:%M:%S)] $*"; }
left() { echo $(( ABS_END - $(date +%s) )); }

wait_ready() {
  # Poll until READY or POLL_END.  Probe is bounded and never SIGTERMs a
  # device op mid-compile (tools/tpu_ready.py).
  while [ "$(date +%s)" -lt "$POLL_END" ]; do
    if timeout 300 python tools/tpu_ready.py 180 > /tmp/sup_ready.out 2>&1; then
      log "backend READY"
      return 0
    fi
    tail -1 /tmp/sup_ready.out
    sleep 240
  done
  log "backend never came back within poll window"
  return 1
}

run_stage() {
  # run_stage <name> <timeout_s> <cmd...>
  # The effective timeout is capped so NO stage can run past ABS_END-1500s:
  # the chip must be free well before the driver's end-of-round bench.
  local name=$1 budget=$2; shift 2
  local cap=$(( $(left) - 1500 ))
  if [ "$cap" -lt $(( budget / 2 )) ]; then
    log "SKIP $name (cap ${cap}s < half of wanted ${budget}s)"
    return 99
  fi
  [ "$budget" -gt "$cap" ] && budget=$cap
  log "stage $name (budget ${budget}s, $(left)s left)"
  timeout -s TERM --kill-after=600 "$budget" "$@" \
    > "/tmp/r5_${name}.log" 2>&1
  local rc=$?
  log "stage $name rc=$rc"
  return $rc
}

wait_ready || { log "giving up: no backend"; exit 75; }

# --- Stage A: serving measurements (fast; decide resident-trunk default) ---
run_stage bench_base 1800 python bench.py
cp /tmp/r5_bench_base.log /tmp/r5_bench_base.json 2>/dev/null
run_stage bench_trunk 1800 env HCFLOW_RDB_TRUNK=1 python bench.py
cp /tmp/r5_bench_trunk.log /tmp/r5_bench_trunk.json 2>/dev/null
run_stage bench_rescaling 1800 python tools/bench_rescaling.py
cp /tmp/r5_bench_rescaling.log /tmp/r5_bench_rescaling.json 2>/dev/null
# A/B: fused Affine3shift/DenseBlock main-chain kernel (HCFLOW_CHAIN3S=1,
# AOT-probed with XLA fallback; bench_rescaling itself also falls back)
run_stage bench_rescaling3s 1800 env HCFLOW_CHAIN3S=1 python tools/bench_rescaling.py
cp /tmp/r5_bench_rescaling3s.log /tmp/r5_bench_rescaling3s.json 2>/dev/null
touch /tmp/r5_benches.done

# --- Stage B: x8 campaign (VERDICT #1) ---
wait_ready || exit 75
run_stage x8_nll 7200 python -m hcflow_tpu.cli.train --opt configs/train_faces_x8_nll_onchip.yml
# Proceed to +stab from the NEWEST NLL ckpt (>=3000) even if the NLL stage was
# cut at its budget before 4000 — the +stab fine-tune is the flagship
# deliverable (VERDICT r4 #1); a 3000/3500-iter NLL base beats no stab at all.
NEWEST=$(ls experiments/faces_x8_nll/models/*_G.ckpt 2>/dev/null \
         | sed 's#.*/##; s/_G.ckpt//' | grep -v latest | sort -n | tail -1)
if [ -n "${NEWEST:-}" ] && [ "$NEWEST" -ge 3000 ]; then
  NLL_EVAL_OPT=configs/test_faces_x8_nll_onchip.yml
  STAB_OPT=configs/train_faces_x8_plus_stab_onchip.yml
  if [ "$NEWEST" != 4000 ]; then
    sed "s#models/4000_G.ckpt#models/${NEWEST}_G.ckpt#" "$NLL_EVAL_OPT" > /tmp/x8_nll_eval_opt.yml
    sed "s#models/4000_G.ckpt#models/${NEWEST}_G.ckpt#" "$STAB_OPT" > /tmp/x8_stab_opt.yml
    NLL_EVAL_OPT=/tmp/x8_nll_eval_opt.yml
    STAB_OPT=/tmp/x8_stab_opt.yml
    log "x8 NLL stopped at $NEWEST; substituting into eval + stab configs"
  fi
  run_stage x8_nll_eval 1800 python -m hcflow_tpu.cli.test --opt "$NLL_EVAL_OPT"
  wait_ready || exit 75
  run_stage x8_stab 7200 python -m hcflow_tpu.cli.train --opt "$STAB_OPT"
  run_stage x8_stab_eval 1800 python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_stab_onchip.yml
  touch /tmp/r5_x8.done
else
  log "x8 NLL has no ckpt >= 3000 (newest: ${NEWEST:-none}); skipping stab"
fi

# --- Stage C: rescaling scaling curve (VERDICT #7) ---
wait_ready || exit 75
CURVE_LEFT=$(left)
if [ "$CURVE_LEFT" -gt 5400 ]; then
  # leave ~35 min for the per-checkpoint heat-sweep evals inside the chain
  run_stage curve $(( CURVE_LEFT - 600 )) bash tools/rescaling_curve_chain.sh $(( CURVE_LEFT - 2700 ))
else
  log "SKIP curve (${CURVE_LEFT}s left)"
fi

touch /tmp/r5_supervisor.done
log "DONE"
