#!/bin/bash
# Round-5 chip chain 1: 80-step probe -> pretrain +20k steps from the round-4
# scratch checkpoint -> KF-on-testdata curve over the run's checkpoints.
# Recipe: docs/performance.md "Round 4: corpus-scale training".
set -u
cd /root/repo

echo "[wait-corpus] $(date)"
while [ ! -f data/corpus_r5/packed_all/manifest.json ]; do sleep 60; done
echo "[corpus ready] $(date)"

COMMON="--packed-data data/corpus_r5/packed_all --packed-val-fraction 0.02
  --loss mae --batch-size 8 --max-batch-tokens 2000000
  --matmul-precision default --base-model artifacts/pf_scratch_r4.ckpt"

echo "[probe 80 steps] $(date)"
timeout 2400 python -m phyloformer_tpu.train.cli $COMMON \
  --learning-rate 1e-4 --warmup-steps 40 --max-steps 80 \
  --check-val-every 100000 --log-every 20 \
  --output-dir runs/probe_r5 --run-name probe --seed 777
rc=$?
if [ $rc -ne 0 ]; then echo "PROBE FAILED rc=$rc $(date)"; exit 1; fi

echo "[pretrain 20k] $(date)"
timeout 12000 python -m phyloformer_tpu.train.cli $COMMON \
  --learning-rate 1e-4 --warmup-steps 1500 --max-steps 20000 \
  --check-val-every 2000 --no-improvement-stop 100 --log-every 200 \
  --output-dir runs/scratch_r5 --run-name scratch_r5 --seed 778
echo "[pretrain done] rc=$? $(date)"

echo "[eval curve] $(date)"
timeout 3600 python tools/eval_curve.py runs/scratch_r5/checkpoints_scratch_r5 \
  --out docs/scratch_r5_kf_curve.jsonl
echo "[chain1 done] rc=$? $(date)"
