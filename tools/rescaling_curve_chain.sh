#!/bin/bash
# Round-5 rescaling scaling-curve campaign (VERDICT r4 #7).
# Usage: rescaling_curve_chain.sh [train_budget_seconds]
# Trains configs/train_rescaling_x4_curve_onchip.yml (niter 4000, ckpt every
# 500) under a wall-clock bound — SIGTERM makes the trainer save state and stop
# cleanly (cli/train.py signal handler) — then runs the heat-sweep eval
# (heats 0.0/0.5/1.0) on every saved checkpoint, giving the HR-reconstruction
# scaling curve.  One TPU job at a time: run only when the chip is free.
set -u
cd /root/repo
BUDGET=${1:-3600}

echo "[curve] training (budget ${BUDGET}s)"
timeout -s TERM --kill-after=600 "$BUDGET" \
  python -m hcflow_tpu.cli.train --opt configs/train_rescaling_x4_curve_onchip.yml \
  > /tmp/rescale_curve_train.log 2>&1
echo "[curve] train rc=$?"

for ck in experiments/rescaling_x4_curve/models/*_G.ckpt; do
  it=$(basename "$ck" | sed 's/_G.ckpt//')
  case "$it" in latest) continue ;; esac
  sed "s#__CKPT__#$ck#" configs/test_rescaling_x4_curve_onchip.yml \
    > /tmp/curve_eval_${it}.yml
  echo "[curve] eval iter $it"
  timeout 1800 python -m hcflow_tpu.cli.test --opt /tmp/curve_eval_${it}.yml \
    > /tmp/rescale_curve_eval_${it}.log 2>&1
  echo "[curve] eval $it rc=$?"
done

touch /tmp/rescale_curve.done
echo "[curve] DONE"
