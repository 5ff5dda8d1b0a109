#!/bin/bash
# On-chip RRDB-kernel variant sweep for the round-4 perf push (NOTES roadmap #3).
# Each variant runs bench.py in a fresh subprocess (the kernel env knobs are
# read at import time).  ONE at a time; bounded; logs one JSON line per variant.
# Usage: bash tools/sweep_rdb_kernel.sh [outfile]
set -u
cd /root/repo
OUT=${1:-/tmp/rdb_sweep.jsonl}
: > "$OUT"

run() { # label env...
  local label=$1; shift
  echo "== $label ($(date +%H:%M:%S))" >&2
  local line
  line=$(env "$@" timeout 2400 python bench.py 2>/tmp/rdb_sweep_last.err | tail -1)
  echo "{\"variant\": \"$label\", \"bench\": ${line:-null}}" >> "$OUT"
  tail -3 /tmp/rdb_sweep_last.err >&2 || true
}

run baseline-rdb-mm32 HCFLOW_RDB_SPLIT=rdb
run src-mm32          HCFLOW_RDB_SPLIT=src
run src-mm64          HCFLOW_RDB_SPLIT=src HCFLOW_RDB_MM=64
run src-mm16          HCFLOW_RDB_SPLIT=src HCFLOW_RDB_MM=16
run rdb-mm64          HCFLOW_RDB_SPLIT=rdb HCFLOW_RDB_MM=64
run src-mm128         HCFLOW_RDB_SPLIT=src HCFLOW_RDB_MM=128
run c1stack           HCFLOW_CHAIN_C1STACK=1
run c1stack-src       HCFLOW_CHAIN_C1STACK=1 HCFLOW_RDB_SPLIT=src
cat "$OUT"
