#!/bin/bash
# Round-5 measurement queue: runs after the x8 campaign chain (chain2) finishes
# or dies.  One TPU job at a time (NOTES gotcha), so this strictly serializes:
#   1. bench.py baseline reproduction (per-RRDB fori-all path)
#   2. bench.py with HCFLOW_RDB_TRUNK=1 (resident-trunk kernel, VERDICT r4 #2)
#   3. tools/bench_rescaling.py (rescaling serving number, VERDICT r4 #3)
# Results land in /tmp/r5_bench_*.json; the builder session folds them into
# BENCHMARKS.md and decides whether resident-trunk becomes the bench default.
set -u
cd /root/repo

CHAIN_PID=$(cat /tmp/x8_chain2.pid 2>/dev/null || echo "")
echo "[q5] waiting for campaign chain (pid ${CHAIN_PID:-none}) to finish"
while [ -n "$CHAIN_PID" ] && kill -0 "$CHAIN_PID" 2>/dev/null \
      && [ ! -e /tmp/x8_chain2.done ]; do
  sleep 60
done
echo "[q5] chain done/dead at $(date -u +%H:%M:%S); checking backend"

if ! timeout 300 python tools/tpu_ready.py 180 > /tmp/q5_ready.out 2>&1; then
  echo "[q5] backend not ready; one 10-min retry"
  sleep 600
  if ! timeout 300 python tools/tpu_ready.py 180 > /tmp/q5_ready.out 2>&1; then
    echo "[q5] backend still down; giving up" >&2
    exit 75
  fi
fi

echo "[q5] stage 1: baseline bench"
timeout 1800 python bench.py > /tmp/r5_bench_base.json 2> /tmp/r5_bench_base.err
echo "[q5] rc=$? $(cat /tmp/r5_bench_base.json)"

echo "[q5] stage 2: resident-trunk bench"
HCFLOW_RDB_TRUNK=1 timeout 1800 python bench.py \
  > /tmp/r5_bench_trunk.json 2> /tmp/r5_bench_trunk.err
echo "[q5] rc=$? $(cat /tmp/r5_bench_trunk.json)"

echo "[q5] stage 3: rescaling serving bench"
timeout 1800 python tools/bench_rescaling.py \
  > /tmp/r5_bench_rescaling.json 2> /tmp/r5_bench_rescaling.err
echo "[q5] rc=$? $(cat /tmp/r5_bench_rescaling.json)"

touch /tmp/r5_queue.done
echo "[q5] DONE"
