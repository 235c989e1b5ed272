#!/bin/bash
# Waits for the running pretrain (chain1's trainer) to finish, exports the
# final checkpoint, then starts chain2 (chip) + the scratch KF curve (CPU).
set -u
cd /root/repo
TRAINER_PID=${1:?usage: r5_watch1.sh TRAINER_PID}

while kill -0 "$TRAINER_PID" 2>/dev/null; do sleep 30; done
echo "[pretrain finished] $(date)"

python -m phyloformer_tpu.io.cli export runs/scratch_r5/checkpoints_scratch_r5 \
  artifacts/pf_scratch_r5.ckpt
echo "[export done] rc=$? $(date)"

env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
  nohup nice -n 10 python tools/eval_curve.py runs/scratch_r5/checkpoints_scratch_r5 \
    --out docs/scratch_r5_kf_curve.jsonl > data/scratch_r5_curve.log 2>&1 &
echo "[scratch curve on CPU, pid $!] $(date)"

bash tools/r5_chain2.sh artifacts/pf_scratch_r5.ckpt
