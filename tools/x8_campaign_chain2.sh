#!/bin/bash
# Round-5 x8 campaign chain, take 2: the first NLL run stalled at iter ~2850
# when its tunnel connection died (no TCP socket left; futex-wait >85 min —
# NOTES round-4 stalls recovered in ~34 min, this one is a dead connection).
# This script: kill the stuck run, wait for the backend to come back (bounded
# polling with tools/tpu_ready.py), resume NLL from the iter-2000 checkpoint,
# then run the original eval -> +stab -> eval chain.
set -u
cd /root/repo

NLL_PID=$(cat /tmp/x8_nll.pid 2>/dev/null || echo "")
if [ -n "$NLL_PID" ] && kill -0 "$NLL_PID" 2>/dev/null; then
  echo "[chain2] SIGTERM stuck NLL run (pid $NLL_PID)"
  kill -TERM "$NLL_PID" 2>/dev/null
  for i in $(seq 1 12); do
    kill -0 "$NLL_PID" 2>/dev/null || break
    sleep 10
  done
  if kill -0 "$NLL_PID" 2>/dev/null; then
    echo "[chain2] still alive after 120s (device call blocked); SIGKILL"
    kill -KILL "$NLL_PID" 2>/dev/null
    sleep 5
  fi
fi

echo "[chain2] waiting for TPU backend (poll every 5 min, up to 3 h)"
READY=0
for i in $(seq 1 36); do
  if timeout 300 python tools/tpu_ready.py 180 > /tmp/tpu_ready.out 2>&1; then
    READY=1
    break
  fi
  cat /tmp/tpu_ready.out | tail -1
  sleep 240
done
if [ "$READY" != "1" ]; then
  echo "[chain2] backend never came back; giving up" >&2
  exit 75
fi
echo "[chain2] backend READY; resuming NLL training (auto-resume from newest state)"

python -m hcflow_tpu.cli.train --opt configs/train_faces_x8_nll_onchip.yml \
  > /tmp/x8_nll2.log 2>&1
echo "[chain2] NLL rc=$?"

if [ ! -e experiments/faces_x8_nll/models/4000_G.ckpt ]; then
  echo "[chain2] NLL checkpoint missing - aborting chain" >&2
  exit 75
fi

echo "[chain2] evaluating NLL checkpoint"
python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_nll_onchip.yml \
  > /tmp/x8_nll_eval.log 2>&1
echo "[chain2] NLL eval rc=$?"

echo "[chain2] starting +stab fine-tune"
python -m hcflow_tpu.cli.train --opt configs/train_faces_x8_plus_stab_onchip.yml \
  > /tmp/x8_stab.log 2>&1
echo "[chain2] +stab rc=$?"

echo "[chain2] evaluating +stab checkpoint"
python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_stab_onchip.yml \
  > /tmp/x8_stab_eval.log 2>&1
echo "[chain2] stab eval rc=$?"

touch /tmp/x8_chain2.done
echo "[chain2] DONE"
