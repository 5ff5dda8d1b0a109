#!/bin/bash
# Round-5 x8 campaign chain: waits for the running NLL pretrain (pid in
# /tmp/x8_nll.pid), then evals the NLL checkpoint, runs the +stab fine-tune
# (the staged recipe from VERDICT r4 #1), and evals the result.  One TPU job
# at a time throughout (the axon tunnel serializes claims).
set -u
cd /root/repo

NLL_PID=$(cat /tmp/x8_nll.pid)
while kill -0 "$NLL_PID" 2>/dev/null; do sleep 30; done
echo "[chain] NLL pretrain process exited"

if [ ! -e experiments/faces_x8_nll/models/4000_G.ckpt ]; then
  echo "[chain] NLL checkpoint missing — aborting chain" >&2
  exit 75
fi

echo "[chain] evaluating NLL checkpoint"
python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_nll_onchip.yml \
  > /tmp/x8_nll_eval.log 2>&1
echo "[chain] NLL eval rc=$?"

echo "[chain] starting +stab fine-tune"
python -m hcflow_tpu.cli.train --opt configs/train_faces_x8_plus_stab_onchip.yml \
  > /tmp/x8_stab.log 2>&1
echo "[chain] +stab rc=$?"

echo "[chain] evaluating +stab checkpoint"
python -m hcflow_tpu.cli.test --opt configs/test_faces_x8_stab_onchip.yml \
  > /tmp/x8_stab_eval.log 2>&1
echo "[chain] stab eval rc=$?"

touch /tmp/x8_chain.done
